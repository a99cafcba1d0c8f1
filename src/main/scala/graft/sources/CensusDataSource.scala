package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector for the Census-API source family (SURVEY §2.1
  * S1–S4): `spark.read.format("graft.sources.CensusDataSource")
  * .option("payload", id).load()`.
  *
  * Planning mirrors the reference's per-state fan-out
  * (`src/census_pipeline.py:279-322`): ONE input partition per state, so
  * the "fetches" run in parallel across executor slots — the thread-pool
  * becomes the task scheduler. All columns land as strings (the API's
  * contract); numeric coercion stays a downstream projection
  * (`Pipeline.parseApiResponse` semantics).
  *
  * Transport is pluggable through [[CensusPayloads]]: this environment is
  * zero-egress, so tests register in-memory payloads; a production
  * deployment replaces the registry lookup in [[CensusPartitionReader]]
  * with an HTTP GET wrapped by [[CensusApi.withRetry]] (the executable
  * retry/backoff/rate-limit policy), keeping every planning/partitioning
  * piece unchanged. */
class CensusDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CensusPayloads.schema(options.get("payload"))
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new CensusTable(properties.get("payload"), schema)
}

class CensusTable(payloadId: String, tschema: StructType) extends Table with SupportsRead {
  override def name(): String = s"census($payloadId)"
  override def schema(): StructType = tschema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = tschema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        CensusPayloads.states(payloadId).sorted
          .map(s => CensusStatePartition(payloadId, s): InputPartition).toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new CensusReaderFactory(tschema.fields.length)
    }
}

/** One partition = one state's fetch (the unit of retry and parallelism). */
case class CensusStatePartition(payloadId: String, state: String) extends InputPartition

class CensusReaderFactory(nCols: Int) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CensusStatePartition]
    new CensusPartitionReader(p.payloadId, p.state, nCols)
  }
}

class CensusPartitionReader(payloadId: String, state: String, nCols: Int)
    extends PartitionReader[InternalRow] {
  // production: HTTP GET happens here, on the executor, per state
  private val it = CensusPayloads.rows(payloadId, state).iterator
  private var current: Seq[String] = _
  override def next(): Boolean = { val h = it.hasNext; if (h) current = it.next(); h }
  override def get(): InternalRow =
    InternalRow.fromSeq(current.take(nCols).map(v =>
      if (v == null) null else UTF8String.fromString(v)))
  override def close(): Unit = ()
}

/** In-JVM payload registry — the test transport. Keyed by payload id;
  * holds the header (schema) and per-state rows. */
object CensusPayloads {
  private val reg = new java.util.concurrent.ConcurrentHashMap[
    String, (Seq[String], Map[String, Seq[Seq[String]]])]()

  def register(id: String, header: Seq[String],
               rowsByState: Map[String, Seq[Seq[String]]]): Unit =
    reg.put(id, (header, rowsByState))

  def schema(id: String): StructType = {
    val (header, _) = lookup(id)
    StructType(header.map(StructField(_, StringType, nullable = true)))
  }
  def states(id: String): Seq[String] = lookup(id)._2.keys.toSeq
  def rows(id: String, state: String): Seq[Seq[String]] =
    lookup(id)._2.getOrElse(state, Seq.empty)

  private def lookup(id: String) = {
    require(id != null, "census source requires .option(\"payload\", <id>)")
    val v = reg.get(id)
    require(v != null, s"unknown census payload id: $id (register it first)")
    v
  }
}
