package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** K-Minimum-Values distinct-count sketch (Bar-Yossef et al. 2002;
  * Beyer et al. 2007's unbiased KMV estimator) as a native Catalyst
  * aggregate: keep the K smallest DISTINCT hash values seen. Buffers
  * union-and-truncate, so the sketch merges associatively and Spark
  * runs it partial/final with map-side combine — each executor holds at
  * most K longs per group, and the estimate
  *   n̂ = (K−1) · H / h(K)     (H = hash-domain size, h(K) = K-th min)
  * falls out of the order statistics of uniform hashes. Unlike HLL++
  * (whose sketch internals are engine-private, hence its rows-only
  * check), KMV over the engine-neutral 40-bit fold is REPLAYABLE: the
  * K-th smallest distinct hash is plain SQL in any engine, so the whole
  * estimate oracle-checks exactly — the property the r4 verdict asked
  * approximate aggregates to have wherever expressible.
  *
  * Input is a pre-hashed LONG column (compose with [[NeutralHash40]]),
  * keeping the sketch agnostic of the value alphabet. Evaluates to the
  * ascending array of kept hashes (size ≤ K); the estimate is a
  * built-in expression over it — `size(kmv)` when the buffer never
  * filled (sketch is exact below K) else `(K−1)·2^40 div kmv[K]`.
  */
case class KmvAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {
  import KmvAgg.K

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_agg"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < K) { buf.add(h); () }
    else if (h < buf.last()) {
      if (buf.add(h)) { buf.remove(buf.last()); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) insert(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val out = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { out.add(bb.getLong()); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

object KmvAgg {
  /** Sketch size: 64 longs/group ≈ ±12% relative error (1/√(K−2));
    * production tunes K up, the plan is unchanged. */
  val K = 64

  /** Aggregate Column: ascending K-minimum distinct hashes of a
    * pre-hashed long column. */
  def kmv_agg(c: Column): Column =
    Bridge.column(KmvAgg(Bridge.expression(c)).toAggregateExpression())
}
