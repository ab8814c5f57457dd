package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent in-memory replay of the unigram-LM trainer: the whole
  * seed → 3×(E,M) loop re-implemented in plain Scala collections (no
  * Spark expressions), compared piece-for-piece against the library's
  * distributed result — so the Spark plan AND the DuckDB oracle (which
  * mirrors the plan) are both anchored to a third, dumber
  * implementation of the spec.
  */
class UnigramLmSpec extends AnyFunSuite {
  import SparkTestSession._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private val MaxPiece = 4
  private val SeedK = 40
  private val Rounds = 3

  /** (word -> count) from the fixture corpus, in memory. */
  private lazy val wordCounts: Map[String, Long] =
    graft.sources.Tables.documents(spark, sf)
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, o) => (w, o.length.toLong) }

  private def comps(n: Int): Seq[List[Int]] =
    if (n == 0) Seq(Nil)
    else (1 to math.min(MaxPiece, n)).flatMap(k => comps(n - k).map(k :: _))

  private def costs(vocab: Map[String, Long]): Map[String, Long] = {
    val total = vocab.values.sum.toDouble
    vocab.map { case (p, f) =>
      (p, math.floor(-math.log(f.toDouble / total) * 1e4).toLong) }
  }

  /** Reference E-step: enumerate every composition, keep vocab-valid
    * segmentations, min by the same "cost₈|seg" string. */
  private def bestSeg(w: String, cost: Map[String, Long]): Seq[String] = {
    val cands = comps(w.length).flatMap { parts =>
      val pieces = parts.scanLeft(0)(_ + _).zip(parts).map {
        case (off, len) => w.substring(off, off + len) }
      if (pieces.forall(cost.contains))
        Some((pieces.map(cost).sum, pieces))
      else None
    }
    assert(cands.nonEmpty, s"no valid segmentation for '$w'")
    cands.minBy { case (c, ps) =>
      f"$c%08d|${ps.mkString("~")}" }._2
  }

  private lazy val referenceVocab: Map[String, Long] = {
    val chars = wordCounts.toSeq
      .flatMap { case (w, n) => w.map(c => (c.toString, n)) }
      .groupBy(_._1).map { case (c, o) => (c, o.map(_._2).sum) }
    val subs = wordCounts.toSeq.flatMap { case (w, n) =>
      for {
        l <- 2 to MaxPiece
        i <- 0 to w.length - l
      } yield (w.substring(i, i + l), n)
    }.groupBy(_._1).map { case (p, o) => (p, o.map(_._2).sum) }
      .filter(_._2 >= 2).toSeq
      .sortBy { case (p, f) => (-f, p) }.take(SeedK)
    var vocab: Map[String, Long] = chars ++ subs
    for (_ <- 1 to Rounds) {
      val c = costs(vocab)
      val usage = wordCounts.toSeq
        .flatMap { case (w, n) => bestSeg(w, c).map(p => (p, n)) }
        .groupBy(_._1).map { case (p, o) => (p, o.map(_._2).sum) }
      vocab = chars.map { case (ch, _) =>
          (ch, math.max(usage.getOrElse(ch, 0L), 1L)) } ++
        usage.filter(_._1.length >= 2)
    }
    vocab
  }

  test("trained piece table equals the in-memory EM replay") {
    val got = q("q_text_unigram_lm").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == referenceVocab)
    // the trainer must actually LEARN multi-char pieces, not
    // degenerate to a char model
    assert(got.keys.count(_.length >= 2) >= 5,
      s"vocabulary degenerated: ${got.keys.toSeq.sorted}")
  }

  test("piece costs are the floor-quantized -ln of the replayed freqs") {
    val expected = costs(referenceVocab)
    val got = q("q_text_unigram_lm").collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    assert(got == expected)
  }

  test("id sequences decode back to the original text") {
    val vocab = q("q_text_unigram_lm").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val idToPiece = vocab.sortBy { case (p, f) => (-f, p) }.zipWithIndex
      .map { case ((p, _), i) => ((i + 1).toLong, p) }.toMap
    val texts = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val ids = q("q_text_unigram_ids").collect()
    assert(ids.length == texts.size)
    ids.take(25).foreach { r =>
      val decoded = r.getString(2).split("-")
        .map(s => idToPiece(s.toLong)).mkString
      val original = texts(r.getLong(0)).replace(" ", "")
      assert(decoded == original, s"doc ${r.getLong(0)} round-trip failed")
      assert(r.getLong(1) == r.getString(2).split("-").length.toLong)
    }
  }

  test("wordpiece greedy encode matches the in-memory longest-match replay") {
    val vocab = referenceVocab.keySet
    def greedy(w: String): Seq[String] = {
      val out = Seq.newBuilder[String]
      var pos = 0
      while (pos < w.length) {
        val piece = (MaxPiece to 1 by -1).iterator
          .map(l => w.substring(pos, math.min(pos + l, w.length)))
          .find(vocab.contains)
          .getOrElse(fail(s"no vocab piece at $pos of '$w'"))
        out += piece
        pos += piece.length
      }
      out.result()
    }
    val ids = referenceVocab.toSeq
      .sortBy { case (p, f) => (-f, p) }.zipWithIndex
      .map { case ((p, _), i) => (p, (i + 1).toLong) }.toMap
    val texts = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val got = q("q_text_wordpiece").collect()
    assert(got.length == texts.size)
    got.take(25).foreach { r =>
      val words = texts(r.getLong(0)).split(" ").filter(_.nonEmpty)
      val expIds = words.flatMap(greedy).map(ids)
      assert(r.getString(2) == expIds.mkString("-"),
        s"doc ${r.getLong(0)} greedy ids")
      assert(r.getLong(1) == expIds.length.toLong)
    }
    // greedy must be a DIFFERENT policy than the Viterbi encode on this
    // corpus, or the query demonstrates nothing
    val viterbi = q("q_text_unigram_ids").collect()
      .map(r => (r.getLong(0), r.getString(2))).toMap
    val differing = got.count(r => viterbi(r.getLong(0)) != r.getString(2))
    assert(differing > 0, "greedy and Viterbi encodes are identical")
  }

  test("driver-side state is bounded by SeedK + alphabet") {
    val vocab = graft.operators.UnigramLm.train(spark, sf)
    assert(vocab.size <= SeedK + 26,
      s"vocabulary ${vocab.size} exceeds the bounded-memo contract")
  }

  test("over-long words are skipped and counted, not fatal") {
    import spark.implicits._
    val dir = s"${sys.props("java.io.tmpdir")}/graft_unigram_longword"
    // 'z' appears ONLY inside the 15-char word — if the skip leaks, the
    // alphabet (which is never pruned) would betray it
    Seq(
      (0L, "alpha beta gamma alpha beta", "en", "src1"),
      (1L, "zzzzzzzzzzzzzzz beta gamma delta epsilon", "en", "src1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val st = graft.operators.UnigramLm.stats(spark, dir)
    assert(st.skippedTypes == 1L && st.skippedTokens == 1L,
      s"expected exactly the 15-char word skipped: $st")
    assert(st.vocab.forall(p => !p._1.contains("z")),
      s"skipped word leaked into the vocabulary: ${st.vocab}")
    // the encode passes drop the skipped word but keep the document
    val ids = SparkEntry.queries("q_text_unigram_ids")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(ids.length == 2, "both docs must still be emitted")
    val vocabIds = st.vocab.sortBy { case (p, f) => (-f, p) }.zipWithIndex
      .map { case ((p, _), i) => ((i + 1).toLong, p) }.toMap
    val doc1 = ids.toMap.apply(1L).split("-")
      .map(s => vocabIds(s.toLong)).mkString
    assert(doc1 == "betagammadeltaepsilon",
      s"doc 1 should encode only its in-bound words: $doc1")
  }

  test("vocab pieces with SQL metacharacters survive the greedy encode") {
    import spark.implicits._
    val dir = s"${sys.props("java.io.tmpdir")}/graft_unigram_quotes"
    // words containing a single quote and a backslash: both end up in
    // the trained alphabet, so the wordpiece map literal must escape
    // them or expr() parsing breaks (ADVICE r9)
    Seq(
      (0L, raw"it's can't it's a\b won't", "en", "src1"),
      (1L, raw"it's a\b a\b can't quote", "en", "src1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q_text_wordpiece")(spark, dir).collect()
    assert(rows.length == 2, "both docs must encode")
    assert(rows.forall(_.getLong(1) > 0), "every doc gets some pieces")
    // round-trip through the id table proves the lookups matched the
    // REAL pieces, not a mangled escape
    val st = graft.operators.UnigramLm.stats(spark, dir)
    val vocabIds = st.vocab.sortBy { case (p, f) => (-f, p) }.zipWithIndex
      .map { case ((p, _), i) => ((i + 1).toLong, p) }.toMap
    rows.foreach { r =>
      val decoded = r.getString(2).split("-")
        .map(s => vocabIds(s.toLong)).mkString
      val doc = if (r.getLong(0) == 0L) raw"it'scan'tit'sa\bwon't"
                else raw"it'sa\ba\bcan'tquote"
      assert(decoded == doc, s"doc ${r.getLong(0)} round-trip: $decoded")
    }
  }
}
