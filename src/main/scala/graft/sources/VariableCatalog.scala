package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Variable-catalog transport for S7/S8 (reference
  * `src/census_pipeline.py:409-457`): the reference fetches
  * `.../variables/{code}.json` (one variable's metadata) and
  * `.../variables.json` (the full catalog) over HTTP.
  *
  * Same pluggable-transport pattern as [[CensusPayloads]]: this environment
  * is zero-egress, so catalogs register in-memory keyed by dataset id
  * (e.g. "acs5_2022"); a production deployment replaces the registry lookup
  * in [[entries]] with the HTTP GET against
  * `${CensusApi.BaseUrl}/{year}/acs/acs5/variables[.json|/{code}.json]`.
  * Everything downstream (the 1-row metadata frame, the keyword search
  * filter) is unchanged either way.
  */
object VariableCatalog {
  /** One catalog row — the fields the reference extracts from the JSON
    * (`census_pipeline.py:418,451-455`). */
  case class VariableInfo(variable: String, label: String,
                          concept: String, predicateType: String)

  private val reg =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[VariableInfo]]()

  def register(dataset: String, entries: Seq[VariableInfo]): Unit =
    reg.put(dataset, entries)

  /** All catalog entries for a dataset; unregistered id -> error (the
    * reference's raise_for_status on a bad URL). */
  def entries(dataset: String): Seq[VariableInfo] = {
    val v = reg.get(dataset)
    require(v != null, s"unknown variable catalog: $dataset (register it first)")
    v
  }

  /** The catalog as a DataFrame — the landing step that turns the
    * reference's JSON dict-of-dicts into a relational table (S8's scan). */
  def catalogDf(spark: SparkSession, dataset: String): DataFrame = {
    import spark.implicits._
    entries(dataset).toDF()
  }
}
