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

/** Content-defined chunking of a space-tokenized document in ONE compiled
  * pass: cut after token i+2 wherever the 40-bit trigram-shingle hash
  * ending there is ≡ 0 (mod 8) (i ≤ n−3 keeps the tail non-empty; docs
  * under 4 tokens are one whole-text chunk), then emit each chunk as one
  * packed long `n_tok · 2^40 + hash40(chunk)` — the winnow encoding,
  * safe while chunks stay under 2^23 tokens.
  *
  * Why an expression and not the array-HOF spelling (filter cuts →
  * starts/ends → zip_with(slice)): the HOF pipeline runs interpreted,
  * and CollapseProject inlines the upstream `split`/`transform` aliases
  * into EVERY per-element lambda that references them — each cut-filter
  * element re-derived the whole trigram-hash array and each trigram
  * re-split the document, compounding to minutes of CPU per 5,000 docs
  * (measured: the sf0.1 parity sweep's q_dedup_cdc stage burned 560 s
  * where this loop takes well under a second). One virtual call per
  * document; the byte loop inside is JIT'd — same justification as
  * [[RollingFingerprint]].
  *
  * Hash and chunk semantics replay in plain SQL (the q_dedup_cdc oracle):
  * tokens are split on single spaces with empties kept (Spark `split` /
  * DuckDB `string_split` agree), trigram and chunk hashes are the
  * engine-neutral [[NeutralHash40]] fold over "w1 w2 w3" / the
  * space-rejoined chunk.
  */
case class CdcChunkCodes(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cdc_chunk_codes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs string, got ${other.simpleString}")
  }

  private def h40(s: String): Long = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 1000003L + (bytes(i) & 0xFF)) & 0xFFFFFFFFFFL
      i += 1
    }
    h
  }

  override def nullSafeEval(v: Any): Any = {
    val text = v.asInstanceOf[UTF8String].toString
    val w = text.split(" ", -1)
    val n = w.length
    val enc = 1099511627776L // 2^40
    if (n < 4) {
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array(n.toLong * enc + h40(text)))
    } else {
      // 1-based trigram hash h(i) ends at token i+2; cut after it when
      // h(i) % 8 == 0 and a non-empty tail remains (i <= n-3)
      val cuts = new scala.collection.mutable.ArrayBuffer[Int]()
      var i = 1
      while (i <= n - 3) {
        if (h40(s"${w(i - 1)} ${w(i)} ${w(i + 1)}") % 8 == 0) cuts += i
        i += 1
      }
      val starts = 1 +: cuts.map(_ + 3)
      val ends = cuts.map(_ + 2) :+ n
      val out = new Array[Long](starts.length)
      var j = 0
      while (j < starts.length) {
        val a = starts(j)
        val b = ends(j)
        out(j) = (b - a + 1).toLong * enc +
          h40(w.slice(a - 1, b).mkString(" "))
        j += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFunctions {
  /** Tokens minus the (sorted) excised positions, space-joined — the
    * O(n + p) merge-scan rebuild for span-level dedup. */
  def remove_tokens_at(toks: Column, positions: Column): Column =
    Bridge.column(RemoveTokensAt(Bridge.expression(toks),
      Bridge.expression(positions)))

  /** Packed (n_tok · 2^40 + hash40) codes of a document's
    * content-defined chunks — one compiled pass per document. */
  def cdc_chunk_codes(text: Column): Column =
    Bridge.column(CdcChunkCodes(Bridge.expression(text)))
}
