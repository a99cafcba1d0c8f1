package graft

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** The `CensusPipeline`-equivalent facade (SURVEY §3, §7.1 module 7).
  *
  * Ingest is driver-side and pre-Spark (the reference's HTTP layer,
  * `src/api_client.py` — zero-egress here, so payloads arrive as in-memory
  * rows or landed files); everything after the payload is a single lazy
  * Catalyst plan: schema-ify -> rename -> try_cast -> derive key.
  */
object Pipeline {
  /** Curated variable groups (reference `src/census_pipeline.py:48-69`). */
  val DemographicVars: Map[String, String] = Map(
    "B01003_001E" -> "total_population", "B02001_002E" -> "white_pop",
    "B02001_003E" -> "black_pop", "B03003_003E" -> "hispanic_pop")
  val EconomicVars: Map[String, String] = Map(
    "B19013_001E" -> "median_household_income", "B17001_002E" -> "poverty_count",
    "B23025_004E" -> "employed", "B23025_005E" -> "unemployed",
    "B23025_003E" -> "labor_force")
  val HousingVars: Map[String, String] = Map(
    "B25077_001E" -> "median_home_value", "B25064_001E" -> "median_gross_rent",
    "B25003_002E" -> "owner_occupied", "B25003_003E" -> "renter_occupied")

  /** P5 — margin-of-error expansion: for each estimate code `*E` add the
    * `E->M` code named `<name>_moe` (reference `src/census_pipeline.py:141-148`).
    * Name-level manipulation only — runs on the driver before the plan. */
  def withMoe(varDict: Map[String, String]): Map[String, String] =
    varDict ++ varDict.collect {
      // only genuine estimate codes (e.g. B01003_001E) — a bare endsWith("E")
      // would also mangle non-variable columns like NAME
      case (code, name) if code.matches("^[A-Z]\\w*_\\d+E$") =>
        (code.dropRight(1) + "M") -> s"${name}_moe"
    }

  /** S5 — API response (list-of-lists, header row first) -> DataFrame with
    * friendly names and numeric coercion (reference
    * `src/census_pipeline.py:343-365`). Non-variable columns (geography ids)
    * stay string; requested variables get try_cast -> double (invalid ->
    * NULL, pandas errors="coerce"). */
  def parseApiResponse(spark: SparkSession, response: Seq[Seq[String]],
                       varDict: Map[String, String]): DataFrame = {
    require(response.nonEmpty, "empty API response")
    val header = response.head
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    val rows = response.tail.map(org.apache.spark.sql.Row.fromSeq(_))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq), schema)
    val projected = header.map { c =>
      val name = varDict.getOrElse(c, c)
      if (varDict.contains(c)) expr(s"try_cast(`$c` AS DOUBLE)").as(name)
      else col(c).as(name)
    }
    df.select(projected: _*)
  }

  /** E1 hookup — append a GEOID built from whichever geography columns the
    * payload carries (reference `src/census_pipeline.py:367-378`). */
  def withGeoid(df: DataFrame): DataFrame = {
    val geoCols = Seq("state", "county", "tract", "block group")
      .filter(df.columns.contains)
    if (geoCols.isEmpty) df
    else df.withColumn("GEOID", GeoidOps.buildGeoid(geoCols.map(col): _*))
  }

  /** U1/X1 — batch union with per-source failure tolerance: the reference
    * logs-and-drops failed states (`src/census_pipeline.py:309-316`); a Spark
    * job is atomic, so tolerance lives here in the driver-side loop, before
    * the union enters the plan. pd.concat aligns by name and null-fills ->
    * unionByName(allowMissingColumns=true), never positional union. */
  def batchUnion(sources: Seq[() => DataFrame]): DataFrame = {
    val ok = sources.flatMap { thunk =>
      try Some(thunk()) catch {
        case e: Exception =>
          System.err.println(s"[pipeline] batch source dropped: ${e.getMessage}")
          None
      }
    }
    require(ok.nonEmpty, "all batch sources failed")
    ok.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** J1 — boundary join: keep every data row, attach geometry-or-null
    * (reference right-merge, `src/census_pipeline.py:266-274`). Boundary
    * tables are small (state/county scale) -> broadcast; data side never
    * shuffles. Geometry travels as opaque WKT string (SURVEY §7.3). */
  def joinBoundaries(data: DataFrame, boundaries: DataFrame,
                     key: String = "GEOID"): DataFrame =
    broadcast(boundaries).join(data, Seq(key), "right")

  /** S9/S10/S14 — format dispatch (reference `src/exporters.py:29-63`).
    * CSV drops the geometry column first (`src/exporters.py:65-69`); geo
    * formats require a geometry column and are exported as WKT-bearing
    * parquet/json (GDAL conversion is out-of-band, SURVEY §7.3); unknown
    * format -> IllegalArgumentException (reference ValueError). */
  def export(df: DataFrame, path: String, format: String): Unit = {
    def requireGeometry(): Unit = require(df.columns.contains("geometry"),
      s"$format export requires a geometry column")
    format.toLowerCase match {
      case "csv" =>
        val noGeom = if (df.columns.contains("geometry")) df.drop("geometry") else df
        noGeom.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
      case "parquet" =>
        df.write.mode(SaveMode.Overwrite).parquet(path)
      case "geojson" =>
        requireGeometry(); df.write.mode(SaveMode.Overwrite).json(path)
      case "geopackage" | "shapefile" =>
        requireGeometry()
        if (format.toLowerCase == "shapefile")
          System.err.println("[pipeline] shapefile: column names >10 chars will be truncated by GDAL")
        df.write.mode(SaveMode.Overwrite).parquet(path) // WKT parquet staging for GDAL
      case other =>
        throw new IllegalArgumentException(s"unsupported export format: $other")
    }
  }

  /** S7 — variable metadata lookup (reference `src/census_pipeline.py:409-423`):
    * one variable's label/concept/predicateType as a 1-row DataFrame.
    * Driver-side fetch through the pluggable catalog transport
    * ([[graft.sources.VariableCatalog]] — zero-egress here; production swaps
    * the registry lookup for the HTTP GET of `.../variables/{code}.json`).
    * Unknown code -> IllegalArgumentException (the reference surfaces the
    * 404 via raise_for_status). */
  def variableMetadata(spark: SparkSession, code: String,
                       dataset: String = "acs5_2022"): DataFrame = {
    import spark.implicits._
    val hit = graft.sources.VariableCatalog.entries(dataset)
      .find(_.variable == code)
      .getOrElse(throw new IllegalArgumentException(
        s"unknown variable: $code (dataset $dataset)"))
    Seq(hit).toDF()
  }

  /** S8 — variable catalog search (reference `src/census_pipeline.py:426-457`):
    * case-insensitive keyword containment on label OR concept. The catalog
    * arrives as a DataFrame (registry, file, any source), so the same filter
    * shape runs on any landed table — oracle-gated as q59. */
  def searchVariables(catalog: DataFrame, keyword: String): DataFrame = {
    val kw = keyword.toLowerCase
    catalog
      .filter(lower(col("label")).contains(kw) || lower(col("concept")).contains(kw))
      .select("variable", "label", "concept")
  }

  /** [[searchVariables]] over a registered catalog dataset — the
    * reference's exact call shape (`search_variables(keyword, year)`). */
  def searchVariables(spark: SparkSession, keyword: String,
                      dataset: String): DataFrame =
    searchVariables(graft.sources.VariableCatalog.catalogDf(spark, dataset), keyword)

  /** S16 — raw SQL passthrough (reference `src/exporters.py:197-204`): a
    * driver-side JDBC statement, deliberately NOT a Spark op — DDL/DML
    * against the warehouse (create index, grant, vacuum) has no distributed
    * component. Connection-per-call like the reference's engine.connect(). */
  def executeSql(url: String, sql: String,
                 props: java.util.Properties = new java.util.Properties): Unit = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      try st.execute(sql) finally st.close()
    } finally conn.close()
  }

  /** S15 — PostGIS/JDBC sink: if_exists ∈ {fail,replace,append} -> SaveMode
    * (reference `src/exporters.py:120-195`). Returns the configured writer so
    * callers supply url/table (no live DB in this environment). */
  def jdbcWriter(df: DataFrame, ifExists: String = "fail") = {
    val mode = ifExists match {
      case "fail"    => SaveMode.ErrorIfExists
      case "replace" => SaveMode.Overwrite
      case "append"  => SaveMode.Append
      case other     => throw new IllegalArgumentException(
        s"unknown if_exists '$other'; expected fail/replace/append")
    }
    df.write.format("jdbc").mode(mode)
  }
}
