package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash as a native Catalyst aggregate (`TypedImperativeAggregate`):
  * folds a column of 64-bit feature hashes into a 64-bit SimHash
  * signature in ONE pass — the buffer is the 64 bit-vote counters, which
  * combine associatively (vector add), so Spark runs it partial/final
  * with map-side combine like any built-in aggregate.
  *
  * This replaces the 64-separate-`sum()` formulation: one buffer update
  * per row instead of 64 aggregate expressions, ~64× less agg-buffer
  * traffic, and the natural template for any sketch aggregate (HLL,
  * CPC, Bloom) this engine might add.
  */
case class SimHashAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_agg"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < 64) {
        buf(i) += ((((h >>> i) & 1L).toInt) << 1) - 1 // +1 for bit, -1 else
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var r = 0L
    var i = 0
    while (i < 64) { if (buf(i) > 0) r |= 1L << i; i += 1 }
    java.lang.Long.valueOf(r)
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(o: Int): SimHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

object SimHashAgg {
  /** Aggregate Column: 64-bit SimHash of a LongType feature-hash column. */
  def simhash_agg(c: Column): Column =
    Bridge.column(SimHashAgg(Bridge.expression(c)).toAggregateExpression())
}
