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

/** Per-pattern substring-occurrence counts over a fixed pattern list in
  * ONE Aho–Corasick pass: `counts[i]` = number of END POSITIONS in the
  * document where `patterns(i)` matches (every occurrence, overlapping
  * included — the automaton's natural semantics, and the one a SQL
  * position scan `substr(text, i, len(p)) = p` replays exactly).
  *
  * Why an expression and not k `instr`/`LIKE` probes: the naive plan is
  * O(k · |text|) scans per document — at a 10k-entry production blocklist
  * over 100 TB that is 10,000 full-text passes per row. The automaton
  * reads each byte ONCE regardless of k (goto/fail links precomputed;
  * the dictionary-suffix closure is folded into per-node output lists at
  * build time), so cost is O(|text| + matches). The automaton builds
  * lazily once per executor JVM from the pattern list captured in the
  * plan — k·avg_len trie nodes of driver→executor traffic, not data.
  *
  * Matching is UTF-8 byte-level (exact for any pattern; fixture patterns
  * are ASCII so the oracle's character positions coincide with byte
  * positions). CodegenFallback: one virtual call per document, the byte
  * loop inside is JIT'd — the [[CdcChunkCodes]] justification.
  */
case class MultiPatternCounts(child: Expression, patterns: Seq[String])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {

  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "multi_pattern_counts needs a non-empty list of non-empty patterns")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "multi_pattern_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs string, got ${other.simpleString}")
  }

  @transient private lazy val ac = AhoCorasick.cached(patterns)

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    new org.apache.spark.sql.catalyst.util.GenericArrayData(ac.countAll(bytes))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AhoCorasick {
  /** Executor-JVM-wide automaton cache, keyed by the pattern list. A
    * deserialized expression copy lands in EVERY task; without this the
    * goto table (≈ 256 ints per trie node — 70 MB at a 4k-phrase list)
    * was rebuilt and held per task, and the probe measured the result:
    * 32 concurrent rebuilds turned the O(bytes) scan into a GC-bound
    * 60 s at k = 4096. One table per JVM is the design claim; this is
    * what delivers it. Unevicted by design — entries are bounded by the
    * number of DISTINCT pattern lists the session ever runs. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Seq[String], AhoCorasick]()

  def cached(patterns: Seq[String]): AhoCorasick =
    cache.computeIfAbsent(patterns, p => new AhoCorasick(p.toArray))
}

/** Classic Aho–Corasick automaton over the byte alphabet: flat goto table
  * (`next`, 256 ints per node), failure links resolved into the goto
  * table during the BFS, and each node carrying the FULL
  * dictionary-suffix output list (so the scan never walks fail chains).
  * Node count ≤ 1 + Σ|pattern bytes| — a 10k-word blocklist is ~100k
  * nodes ≈ 100 MB of int table per executor, built once.
  */
private[functions] final class AhoCorasick(patterns: Array[String]) {
  private val next = scala.collection.mutable.ArrayBuffer(
    Array.fill(256)(-1))
  private val out = scala.collection.mutable.ArrayBuffer(List.empty[Int])

  for ((p, id) <- patterns.zipWithIndex) {
    var s = 0
    for (b <- p.getBytes(java.nio.charset.StandardCharsets.UTF_8)) {
      val c = b & 0xFF
      if (next(s)(c) == -1) {
        next(s)(c) = next.length
        next += Array.fill(256)(-1)
        out += Nil
      }
      s = next(s)(c)
    }
    out(s) = id :: out(s)
  }

  private val fail = new Array[Int](next.length)
  locally {
    val q = scala.collection.mutable.Queue.empty[Int]
    var c = 0
    while (c < 256) {
      val t = next(0)(c)
      if (t == -1) next(0)(c) = 0 else { fail(t) = 0; q += t }
      c += 1
    }
    while (q.nonEmpty) {
      val s = q.dequeue()
      out(s) = out(s) ::: out(fail(s)) // dictionary-suffix closure
      var c = 0
      while (c < 256) {
        val t = next(s)(c)
        if (t == -1) next(s)(c) = next(fail(s))(c)
        else { fail(t) = next(fail(s))(c); q += t }
        c += 1
      }
    }
  }

  // scan-time shape: arrays, no per-byte allocation
  private val gotoTab: Array[Array[Int]] = next.toArray
  private val outTab: Array[Array[Int]] = out.map(_.toArray).toArray

  /** Occurrence count per pattern id over one document's bytes. */
  def countAll(bytes: Array[Byte]): Array[Long] = {
    val counts = new Array[Long](patterns.length)
    var s = 0
    var i = 0
    while (i < bytes.length) {
      s = gotoTab(s)(bytes(i) & 0xFF)
      val hits = outTab(s)
      var j = 0
      while (j < hits.length) { counts(hits(j)) += 1L; j += 1 }
      i += 1
    }
    counts
  }
}

/** Jaro-Winkler similarity of two string columns, bit-identical to the
  * DuckDB oracle's `jaro_winkler_similarity` (vendored rapidfuzz): the
  * classic one-pass window match (window ⌊max(l1,l2)/2⌋−1, leftmost
  * unconsumed match wins), half the out-of-order matched positions as
  * transpositions, jaro = (m/l1 + m/l2 + (m−t)/m)/3 in exactly that
  * association order, and the Winkler boost sim + p·0.1·(1−sim) for the
  * ≤4-byte common prefix only when jaro > 0.7 — each IEEE op is
  * correctly rounded, so mirroring the operand ORDER reproduces DuckDB's
  * doubles bit-for-bit (verified against 30k fuzzed pairs plus the
  * canonical MARTHA/DIXON/DWAYNE vectors). Matching is on UTF-8 BYTES,
  * not code points — that is also what DuckDB compares, so the two
  * engines agree on non-ASCII too (both treating a multi-byte rune as
  * its bytes). Empty-vs-anything is 0.0 (DuckDB's convention, NOT the
  * textbook 1.0 for two empties).
  *
  * CodegenFallback like the other per-document kernels: one virtual call
  * per candidate PAIR; the O(l1·w) window loop inside is primitive
  * arrays, JIT'd.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (string, string), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.sim(a.asInstanceOf[UTF8String].getBytes,
      b.asInstanceOf[UTF8String].getBytes)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  def sim(s1: Array[Byte], s2: Array[Byte]): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val w = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2, i + w + 1)
      var j = math.max(0, i - w)
      while (j < hi && !m1(i)) {
        if (!m2(j) && s1(i) == s2(j)) { m2(j) = true; m1(i) = true; m += 1 }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var j2 = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(j2)) j2 += 1
        if (s1(i) != s2(j2)) t += 1
        j2 += 1
      }
      i += 1
    }
    t /= 2
    var sim =
      (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (sim > 0.7) {
      val pm = math.min(math.min(l1, l2), 4)
      var p = 0
      while (p < pm && s1(p) == s2(p)) p += 1
      sim = sim + p.toDouble * 0.1 * (1.0 - sim)
    }
    sim
  }
}

/** Unrestricted Damerau-Levenshtein distance of two string columns —
  * the transposition-aware edit distance (Lowrance-Wagner DP with the
  * last-occurrence table, NOT the restricted OSA variant: "ca"→"abc"
  * is 2 here, 3 under OSA), matching DuckDB's `damerau_levenshtein`
  * exactly (20k-pair fuzz). Integer-valued, so oracle parity is exact
  * by construction — no float spelling to mirror. Spark ships plain
  * `levenshtein` (used by q_dedup_editdist's banded verify) but has no
  * transposition-aware distance; adjacent-swap typos are the dominant
  * human error class, which is why linkage stacks score with it.
  * Byte-level like [[JaroWinkler]], matching DuckDB's byte semantics.
  * O(l1·l2) time, O(l1·l2) ints — candidate-pair-stage only, same
  * CodegenFallback justification as the other pair kernels.
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "damerau_levenshtein"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (string, string), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.dist(a.asInstanceOf[UTF8String].getBytes,
      b.asInstanceOf[UTF8String].getBytes)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {
  def dist(s1: Array[Byte], s2: Array[Byte]): Long = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0) return l2.toLong
    if (l2 == 0) return l1.toLong
    val inf = l1 + l2
    val w = l2 + 2
    val d = new Array[Int]((l1 + 2) * w) // d(i)(j) = d(i * w + j)
    d(0) = inf
    var i = 0
    while (i <= l1) { d((i + 1) * w) = inf; d((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= l2) { d(j + 1) = inf; d(w + j + 1) = j; j += 1 }
    val da = new Array[Int](256) // last row where byte occurred in s1
    i = 1
    while (i <= l1) {
      var db = 0
      j = 1
      while (j <= l2) {
        val k = da(s2(j - 1) & 0xff)
        val l = db
        val cost = if (s1(i - 1) == s2(j - 1)) { db = j; 0 } else 1
        val sub = d(i * w + j) + cost
        val ins = d((i + 1) * w + j) + 1
        val del = d(i * w + j + 1) + 1
        val swap = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        d((i + 1) * w + j + 1) =
          math.min(math.min(sub, ins), math.min(del, swap))
        j += 1
      }
      da(s1(i - 1) & 0xff) = i
      i += 1
    }
    d((l1 + 1) * w + l2 + 1).toLong
  }
}

/** Unicode NFC normalization (UAX #15 canonical composition) of a string
  * column — the first step of web-corpus text hygiene: the same visible
  * text arrives from crawls both composed ("é" U+00E9) and decomposed
  * ("e"+U+0301), and every downstream exact-match operator (hash dedup,
  * shingles, blocklists, tokenizers) treats those as different bytes
  * unless a normalization pass runs first.
  *
  * Spark ships no normalization function, so this wraps
  * `java.text.Normalizer` (the JDK's ICU-equivalent UAX #15
  * implementation; DuckDB's `nfc_normalize` — utf8proc — implements the
  * same algorithm, which is what makes the oracle exact). Fast path:
  * `isNormalized` is a scan with NO allocation, and real corpus text is
  * overwhelmingly already-NFC, so the common case returns the input
  * UTF8String untouched. CodegenFallback: one virtual call per document,
  * same justification as [[CdcChunkCodes]].
  */
case class NfcNormalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs string, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val u = v.asInstanceOf[UTF8String]
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
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

  /** Per-pattern occurrence counts from ONE Aho–Corasick pass — the
    * O(|text| + hits) blocklist scan that replaces k LIKE probes. */
  def multi_pattern_counts(text: Column, patterns: Seq[String]): Column =
    Bridge.column(MultiPatternCounts(Bridge.expression(text), patterns))

  /** Jaro-Winkler similarity, bit-identical to DuckDB's
    * `jaro_winkler_similarity`. */
  def jaro_winkler(a: Column, b: Column): Column =
    Bridge.column(JaroWinkler(Bridge.expression(a), Bridge.expression(b)))

  /** Unrestricted Damerau-Levenshtein distance (DuckDB-exact). */
  def damerau_levenshtein(a: Column, b: Column): Column =
    Bridge.column(DamerauLevenshtein(Bridge.expression(a),
      Bridge.expression(b)))

  /** Unicode NFC normalization (UAX #15), DuckDB `nfc_normalize`-exact. */
  def nfc_normalize(text: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(text)))
}
