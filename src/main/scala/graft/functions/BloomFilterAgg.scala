package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bloom filter as a native Catalyst aggregate: an `M`-bit array (packed
  * into `M/64` longs) folded over a string column in ONE pass, `K` bit
  * positions per value. Bit arrays merge by OR, so the buffer is
  * associative/commutative and Spark runs it partial/final with map-side
  * combine — the same mergeable-sketch property as [[CountMinAgg]].
  *
  * This is THE membership primitive for incremental dedup at 100 TB:
  * build the filter over the existing corpus's content hashes (M/8 bytes
  * of state per partition, merged to one array), broadcast it, and
  * pre-filter the incoming batch — only the bloom-positive sliver (true
  * duplicates + the ~(1-e^(-Kn/M))^K false-positive rate) ever reaches
  * the exact anti-join, so the 100 TB corpus is never re-shuffled against
  * the delta. No false negatives: a clean bloom miss IS a verdict.
  *
  * Spark ships `DataFrameStatFunctions.bloomFilter`, but its bit layout
  * hashes with Spark-internal Murmur3 — unverifiable cross-engine. This
  * aggregate reuses the library's engine-neutral UTF-8 byte fold
  * ([[CountMinAgg.baseHash]]) and Knuth row-hash family, so a DuckDB
  * oracle replays the exact bit array and the membership verdicts are
  * hash-checkable, not rows-only.
  */
case class BloomFilterAgg(
    child: Expression,
    k: Int = BloomFilterAgg.K,
    m: Int = BloomFilterAgg.M,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {
  import BloomFilterAgg.position

  require(m >= 64 && (m & (m - 1)) == 0, s"m must be a power of two: $m")
  private def words: Int = m / 64

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bloom_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val base = CountMinAgg.baseHash(
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
      var r = 0
      while (r < k) {
        val pos = position(base, r, m)
        buf(pos >>> 6) |= 1L << (pos & 63)
        r += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(words)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

object BloomFilterAgg {
  /** Filter size in bits (64 words). At the fixtures' corpus size
    * (~400 docs) the expected FP rate is (1-e^(-3·400/4096))^3 ≈ 1.6% —
    * small but non-zero, so the query demonstrably exercises the
    * false-positive path. At 100 TB you size M per partition-merged
    * filter (e.g. 2^33 bits = 1 GiB for ~1e9 keys at 1% FP). */
  val M = 4096
  val WORDS: Int = M / 64
  /** Hash count: k = 3 (near-optimal for M/n ≈ 10 would be 7; 3 keeps
    * the oracle join compact and the FP envelope analyzable). */
  val K = 3

  /** Bit position r of a base hash — same Knuth family as
    * [[CountMinAgg.rowIndex]], modulo the filter size (default [[M]]).
    * base < 2^20 keeps the product under 2^53. */
  def position(base: Long, r: Int, m: Int = M): Int =
    (((base * (2654435761L + r)) >> 16) % m).toInt

  /** Aggregate Column: M-bit bloom filter (as M/64 longs) over a string
    * column, bit positions from [[CountMinAgg.baseHash]]. */
  def bloom_agg(c: Column): Column =
    Bridge.column(BloomFilterAgg(Bridge.expression(c)).toAggregateExpression())

  /** Corpus-sized variant: `m` must be a power of two, derived from the
    * key count (≈ 8 bits/key keeps FP under ~1% at k = 3) — the fixed
    * default saturates past ~1k keys, which is exactly the failure the
    * lshBits/ivfCells rule exists to prevent. */
  def bloom_agg(c: Column, m: Int): Column =
    Bridge.column(BloomFilterAgg(Bridge.expression(c), m = m)
      .toAggregateExpression())

  /** k=1 variant: the bit array IS a linear-counting sketch (Whang et
    * al. 1990) — with n keys in M bits, E[set bits] = M(1-e^(-n/M)), so
    * n̂ = -M·ln(empty/M). Used by q_agg_distinct_lc as the
    * oracle-checkable counterpart of HLL cardinality estimation. */
  def lc_agg(c: Column): Column =
    Bridge.column(BloomFilterAgg(Bridge.expression(c), k = 1)
      .toAggregateExpression())
}
