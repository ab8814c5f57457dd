package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-Min sketch as a native Catalyst aggregate: a `DEPTH`×`WIDTH`
  * counter matrix folded over a string column in ONE pass. Counters add
  * elementwise, so the buffer merges associatively and Spark runs it
  * partial/final with map-side combine — the mergeable-sketch property
  * that makes frequency estimation viable at 100 TB (every executor
  * sketches its split; the driver-bound state is DEPTH·WIDTH longs, not
  * a token dictionary).
  *
  * Estimates are upper bounds: est(t) = min over rows r of
  * counter[r][h_r(t)] ≥ true count, with overestimate bounded by
  * 2·N/WIDTH per row pair. The hash is deliberately engine-neutral —
  * base = fold over UTF-8 BYTES of (h·31 + byte) mod 2^20, then
  * h_r = ((base · (2654435761 + r)) >> 16) mod WIDTH. The byte alphabet
  * matches [[NeutralHash40]] and the compiled lookup fold
  * ([[CmsBaseHash]]), so update and query agree for ANY input — the
  * upper-bound invariant holds beyond ASCII (ExpressionsSpec exercises
  * non-ASCII tokens). The DuckDB twin in
  * TextAnalysis.q_text_heavy_hitters_approx folds codepoints, which
  * equals the byte fold exactly on the ASCII fixtures (asserted in
  * OperatorsSpec).
  */
case class CountMinAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {
  import CountMinAgg.{DEPTH, WIDTH, rowIndex}

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "count_min_agg"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](DEPTH * WIDTH)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val base = CountMinAgg.baseHash(
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
      var r = 0
      while (r < DEPTH) { buf(r * WIDTH + rowIndex(base, r)) += 1L; r += 1 }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
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
    Array.fill(DEPTH * WIDTH)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

object CountMinAgg {
  val DEPTH = 4
  val WIDTH = 256

  /** Base hash: (h·31 + byte) fold over UTF-8 bytes, mod 2^20. ONE
    * definition shared by the aggregate's update and the compiled lookup
    * expression [[CmsBaseHash]] — the update/query hash alphabets can
    * never drift apart. */
  def baseHash(bytes: Array[Byte]): Long = {
    var base = 0L
    var i = 0
    while (i < bytes.length) {
      base = (base * 31 + (bytes(i) & 0xFF)) % 1048576
      i += 1
    }
    base
  }

  /** Row-r bucket of a base hash (base < 2^20, so the multiply stays
    * far under 2^63). Same Knuth constant as the rest of the library. */
  def rowIndex(base: Long, r: Int): Int =
    (((base * (2654435761L + r)) >> 16) % WIDTH).toInt

  /** Aggregate Column: DEPTH×WIDTH Count-Min counters over a string col. */
  def count_min_agg(c: Column): Column =
    Bridge.column(CountMinAgg(Bridge.expression(c)).toAggregateExpression())

  /** Lookup-side base hash of a string column — same UTF-8 byte fold the
    * aggregate's update runs, as a compiled expression (the SQL-HOF
    * spelling folded ascii() codepoints of split chars, which diverges
    * from the byte fold on any non-ASCII token). */
  def cms_base(c: Column): Column =
    Bridge.column(CmsBaseHash(Bridge.expression(c)))
}

/** Compiled CMS base-hash fold (see [[CountMinAgg.baseHash]]).
  * CodegenFallback: one virtual call per row, O(bytes) loop inside is
  * JIT'd — same justification as NeutralHash40. */
case class CmsBaseHash(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_base"

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(CountMinAgg.baseHash(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
