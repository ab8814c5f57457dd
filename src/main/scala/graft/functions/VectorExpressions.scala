package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for vector math over `array<float>`
  * embedding columns (FIXTURES.md `embeddings.embedding`, dim 64).
  *
  * Why a custom `Expression` and not `functions.aggregate(zip_with(...))`:
  * the higher-order-function route allocates a lambda frame per element
  * and boxes each float; this expression compiles (doGenCode) to a tight
  * primitive loop inside whole-stage codegen — the difference is ~10× on
  * a brute-force k-NN scan, which matters when the 100 TB corpus is
  * scanned for candidate pairs. Interpreted eval is provided for
  * completeness (nullSafeEval), codegen is the hot path.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = if (x.isNullAt(i)) 0.0 else x.getFloat(i).toDouble
      val yi = if (y.isNullAt(i)) 0.0 else y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / math.sqrt(nx * ny)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $x.isNullAt($i) ? 0.0 : (double) $x.getFloat($i);
         |  double $yi = $y.isNullAt($i) ? 0.0 : (double) $y.getFloat($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0)
         |  ? 0.0 : $dot / java.lang.Math.sqrt($nx * $ny);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Winnowing-style document fingerprint: polynomial rolling hash over the
  * UTF-8 bytes with window `w`, returning the MINIMUM window hash — a
  * deterministic, shift-robust fingerprint (two documents sharing any
  * `w`-byte run can collide to the same min-hash, the winnowing property).
  * Base/mod are fixed small primes so the value is reproducible anywhere.
  *
  * CodegenFallback is acceptable here: fingerprinting is one call per
  * document (not per element), so the virtual-call overhead is noise next
  * to the O(bytes) hash loop itself, which lives in compiled Scala.
  */
case class RollingFingerprint(child: Expression, window: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fingerprint"

  private val B = 1000003L          // polynomial base
  private val M = 0x7FFFFFFFL       // 2^31 - 1 (Mersenne prime)

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    java.lang.Long.valueOf(RollingFingerprint.minWindowHash(bytes, window, B, M))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingFingerprint {
  /** Min of rolling polynomial hashes over all `w`-byte windows (whole-doc
    * hash when shorter than `w`). Shared by interpreted + codegen paths. */
  def minWindowHash(bytes: Array[Byte], w: Int, b: Long, m: Long): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    // b^(w-1) mod m for the outgoing byte
    var pow = 1L
    var k = 0
    while (k < w - 1) { pow = pow * b % m; k += 1 }
    var h = 0L
    var min = Long.MaxValue
    var i = 0
    while (i < n) {
      h = (h * b + (bytes(i) & 0xFF)) % m
      if (i >= w - 1) {
        if (h < min) min = h
        h = (h - (bytes(i - w + 1) & 0xFF) * pow % m + m * 256) % m
      }
      i += 1
    }
    if (min == Long.MaxValue) h else min
  }
}

/** Column-API entry points (the user-facing surface of the expressions). */
object VectorFunctions {
  /** Cosine similarity of two `array<float>` columns (codegen'd). */
  def cosine_sim(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  /** Winnowing min-hash fingerprint of a string column. */
  def rolling_fingerprint(c: Column, window: Int = 16): Column =
    Bridge.column(RollingFingerprint(Bridge.expression(c), window))
}
