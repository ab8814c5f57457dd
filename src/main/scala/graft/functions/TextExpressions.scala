package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.BinaryExpression
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Rebuilds a document from its token array after excising the tokens at
  * `positions` (0-based, sorted ascending, distinct), returning the
  * survivors joined by single spaces.
  *
  * Why an expression and not `concat_ws(' ', filter(toks, (t, i) -> NOT
  * array_contains(ps, i)))`: the HOF spelling pays an O(|positions|)
  * membership scan PER TOKEN — O(n·p) per document, pathological for a
  * heavily-deduplicated doc carrying thousands of removed span positions.
  * Both inputs arrive sorted (token order / sort_array), so this is one
  * two-pointer merge: O(n + p), and the bytes are joined UTF8String-level
  * with no per-token java.lang.String decode.
  *
  * CodegenFallback is acceptable here: one virtual call per DOCUMENT (not
  * per element), and the merge loop inside runs as JIT'd primitive code —
  * same justification as [[RollingFingerprint]].
  */
case class RemoveTokensAt(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "remove_tokens_at"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType,
      right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(IntegerType | LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (array<string>, array<int|bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  private lazy val posIsLong: Boolean = right.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def nullSafeEval(toks: Any, pos: Any): Any = {
    val w = toks.asInstanceOf[ArrayData]
    val ps = pos.asInstanceOf[ArrayData]
    val n = w.numElements()
    val m = ps.numElements()
    def posAt(j: Int): Long =
      if (ps.isNullAt(j)) Long.MinValue // sorts first, matches no index
      else if (posIsLong) ps.getLong(j) else ps.getInt(j).toLong
    val kept = new java.util.ArrayList[UTF8String](n)
    var i = 0
    var j = 0
    while (i < n) {
      while (j < m && posAt(j) < i) j += 1
      if (j < m && posAt(j) == i) j += 1 // excised position
      else if (!w.isNullAt(i)) kept.add(w.getUTF8String(i))
      i += 1
    }
    UTF8String.concatWs(RemoveTokensAt.Space,
      kept.toArray(new Array[UTF8String](kept.size())): _*)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object RemoveTokensAt {
  private val Space = UTF8String.fromString(" ")
}

object TextFunctions {
  /** Tokens minus the (sorted) excised positions, space-joined — the
    * O(n + p) merge-scan rebuild for span-level dedup. */
  def remove_tokens_at(toks: Column, positions: Column): Column =
    Bridge.column(RemoveTokensAt(Bridge.expression(toks),
      Bridge.expression(positions)))
}
