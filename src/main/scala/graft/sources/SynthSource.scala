package graft.sources

import java.util

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A complete DataSource V2 connector for a deterministic synthetic
  * corpus — the library's "read from an internal format" template, and
  * the piece that demonstrates the full connector surface the built-in
  * formats hide: [[TableProvider]] → [[ScanBuilder]] with COLUMN
  * PRUNING ([[SupportsPushDownRequiredColumns]]) and FILTER PUSHDOWN
  * ([[SupportsPushDownFilters]]) → range-partition planning →
  * per-partition [[PartitionReader]]s emitting [[InternalRow]]s.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.GraftSynthSource")
  *     .option("rows", "100000").option("parts", "8").load()
  * }}}
  *
  * Rows are a pure function of `id` (the Knuth/MurmurX multiplicative
  * mixes the library already uses engine-neutrally), so a DuckDB oracle
  * reproduces the scan with `generate_series` — a CUSTOM connector
  * whose queries stay hash-checkable. Schema:
  *   - `id`     BIGINT  0 ≤ id < rows
  *   - `bucket` INT     ((id·2654435761) mod 2³¹) mod 100
  *   - `val`    DOUBLE  ((id·1540483477) mod 2³¹) / 2³¹  (exact IEEE
  *                      division — both engines produce the same bits)
  *   - `tok`    STRING  't' ∥ (id mod 97)
  *
  * Scale design: each of `parts` input partitions owns one contiguous
  * id range and generates ONLY the requested columns (pruning reaches
  * the generator — an unread column costs nothing, the DSv2 analogue of
  * parquet's ReadSchema). Pushed id-range filters narrow each
  * partition's range AT PLANNING TIME; a partition whose range empties
  * is dropped before a task ever launches — the connector-level
  * equivalent of partition pruning, asserted in PlanSpec via the scan
  * description and the task count. Pushed filters are also RETAINED as
  * post-scan filters (pushFilters returns every filter), so pruning is
  * a pure optimization that can never change results.
  */
class GraftSynthSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftSynthSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SynthTable(
      properties.getOrDefault("rows", "100000").toLong,
      properties.getOrDefault("parts", "8").toInt,
      properties.getOrDefault("layout", "range") == "mod")
}

object GraftSynthSource {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("val", DoubleType, nullable = false),
    StructField("tok", StringType, nullable = false),
    StructField("part", IntegerType, nullable = false)))

  private val M31 = 2147483648L

  def bucketOf(id: Long): Int = (((id * 2654435761L) % M31) % 100L).toInt
  def valOf(id: Long): Double = ((id * 1540483477L) % M31).toDouble / M31
  def tokOf(id: Long): String = "t" + (id % 97L)
}

private[sources] class SynthTable(rows: Long, parts: Int, mod: Boolean)
    extends Table with SupportsRead {
  override def name(): String = s"graft_synth($rows)"
  override def schema(): StructType = GraftSynthSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new SynthScanBuilder(rows, parts, mod)
}

private[sources] class SynthScanBuilder(rows: Long, parts: Int, mod: Boolean)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var required: StructType = GraftSynthSource.Schema
  private var lo: Long = 0L
  private var hi: Long = rows // exclusive

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[sources.Filter])
      : Array[sources.Filter] = {
    filters.foreach {
      case sources.GreaterThan("id", v: Long) => lo = math.max(lo, v + 1)
      case sources.GreaterThanOrEqual("id", v: Long) =>
        lo = math.max(lo, v)
      case sources.LessThan("id", v: Long) => hi = math.min(hi, v)
      case sources.LessThanOrEqual("id", v: Long) => hi = math.min(hi, v + 1)
      case sources.EqualTo("id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case _ => () // unsupported shapes: range stays, Spark re-evaluates
    }
    // every filter is retained post-scan: pruning is an optimization,
    // never the correctness path
    filters
  }

  override def pushedFilters(): Array[sources.Filter] = Array.empty

  override def build(): Scan = new SynthScan(required, lo, hi, parts, mod)
}

/** Package-visible so PlanSpec can assert planning-time range
  * narrowing. */
private[graft] case class SynthRange(lo: Long, hi: Long)
    extends InputPartition

/** `layout=mod` partition: the ids ≡ `p` (mod `parts`) within
  * [lo, hi). [[HasPartitionKey]] is the storage-partitioning contract:
  * every row this partition emits has `part` = p, and declaring the key
  * lets Catalyst treat the scan's layout as a
  * [[org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning]].
  */
private[graft] case class SynthModPart(p: Int, parts: Int, lo: Long,
    hi: Long) extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(p)
}

private[sources] class SynthScan(required: StructType, lo: Long, hi: Long,
    parts: Int, mod: Boolean) extends Scan with Batch
    with SupportsReportPartitioning {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_synth range=[$lo,$hi) layout=${if (mod) "mod" else "range"} " +
      s"cols=${required.fieldNames.mkString(",")}"

  /** The connector-declared layout. `layout=mod` reports each input
    * partition as one `part` key group, so any clustering requirement
    * on `part` (a groupBy, a storage-partitioned join side) is already
    * satisfied AT THE SCAN and Catalyst plans NO exchange — the DSv2
    * spelling of "the data is already where the operator needs it",
    * which at 100 TB deletes the largest shuffle a per-shard aggregate
    * would otherwise pay. Requires
    * spark.sql.sources.v2.bucketing.enabled (set by the library's
    * session builders); PlanSpec asserts the shuffle-free plan. The
    * range layout stays honest: UnknownPartitioning, every downstream
    * clustering pays its exchange. */
  override def outputPartitioning(): partitioning.Partitioning =
    if (mod)
      new partitioning.KeyGroupedPartitioning(
        Array(org.apache.spark.sql.connector.expressions.Expressions
          .identity("part")),
        planInputPartitions().length)
    else new partitioning.UnknownPartitioning(parts)

  override def planInputPartitions(): Array[InputPartition] = {
    if (hi <= lo) return Array.empty
    if (mod) {
      // one partition per residue class that intersects the id range
      return (0 until parts).filter { p =>
        val first = lo + ((p - lo % parts + parts) % parts)
        first < hi
      }.map(p => SynthModPart(p, parts, lo, hi): InputPartition).toArray
    }
    val n = hi - lo
    val per = math.max(1L, (n + parts - 1) / parts)
    val out = ArrayBuffer.empty[InputPartition]
    var s = lo
    while (s < hi) {
      out += SynthRange(s, math.min(s + per, hi))
      s += per
    }
    out.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required.fieldNames, parts)
}

/** Serialized to executors; generates only the planned columns. */
private[sources] class SynthReaderFactory(cols: Array[String], parts: Int)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = partition match {
    case r: SynthRange => reader(r.lo - 1, r.hi, 1L)
    case m: SynthModPart =>
      val first = m.lo + ((m.p - m.lo % m.parts + m.parts) % m.parts)
      reader(first - m.parts, m.hi, m.parts.toLong)
  }

  private def reader(start: Long, hi: Long, step: Long)
      : PartitionReader[InternalRow] = new PartitionReader[InternalRow] {
    private var id = start
    override def next(): Boolean = { id += step; id < hi }
    override def get(): InternalRow =
      InternalRow.fromSeq(cols.toSeq.map {
        case "id" => id
        case "bucket" => GraftSynthSource.bucketOf(id)
        case "val" => GraftSynthSource.valOf(id)
        case "tok" => UTF8String.fromString(GraftSynthSource.tokOf(id))
        case "part" => (id % parts).toInt
      })
    override def close(): Unit = ()
  }
}
