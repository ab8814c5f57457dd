package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q_contamination_semantic — eval-set leakage in PARAPHRASED form.
  *
  * The planted-leak test is the reason this operator exists: a corpus
  * document that is a high-cosine but zero-shingle-overlap rewrite of an
  * eval document is provably invisible to the shingle-exact
  * q_contamination (n_shared = 0 < 5) and must surface through the
  * embedding path. The fixture-side test pins the SRP candidate stage
  * to an exact bipartite rescore: every emitted pair must carry the
  * decimal-exact cosine the brute-force join computes, and never a pair
  * below the threshold.
  */
class ContaminationSemanticSpec extends AnyFunSuite {
  import SparkTestSession._

  private def q(n: String) = SparkEntry.queries(n)(spark, sf)

  test("semantic pairs are an exact-rescored subset of the bipartite join") {
    import graft.functions.VectorFunctions.decimal_dot
    val e = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"),
        decimal_dot(col("embedding").cast("array<double>"),
          col("embedding").cast("array<double>")).cast("double").as("nsq"))
    val exact = e.where(col("label") =!= 0).as("a")
      .crossJoin(e.where(col("label") === 0).as("b"))
      .select(col("a.vec_id").as("corpus_id"), col("b.vec_id").as("eval_id"),
        (decimal_dot(col("a.v"), col("b.v")).cast("double") /
          sqrt(col("a.nsq") * col("b.nsq"))).as("cos"))
      .where(col("cos") > 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val got = q("q_contamination_semantic").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.nonEmpty, "banding should surface at least some pairs")
    got.foreach { case (pair, cos) =>
      assert(exact.get(pair).contains(cos),
        s"$pair not in (or differs from) the exact bipartite baseline")
    }
  }

  test("corpus-side SRP cells stay 2x under the hot-cell fence") {
    import graft.functions.VectorFunctions.srp_band_keys
    // ADVICE r10: q_contamination_semantic fences only the CORPUS side
    // (label != 0) while its oracle carries no cap, so oracle equality
    // needs the fence provably inactive on THAT subset. The full-table
    // assertion in OperatorsSpec dominates this one (dropping rows can
    // only shrink a cell), but the subset margin is asserted explicitly
    // so a future per-label fixture skew fails HERE, named, not as a
    // confusing oracle hash mismatch. Same (Bands, Bits) = (64, 12) as
    // the query; same 2x margin as the q_dedup_embedding_lsh check.
    val maxCell = graft.sources.Tables.embeddings(spark, sf)
      .where(col("label") =!= 0)
      .select(posexplode(srp_band_keys(
        col("embedding").cast("array<double>"), 64, 12)))
      .groupBy(col("pos"), col("col")).count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    assert(maxCell * 2 <= graft.operators.Dedup.MaxSrpBucket,
      s"corpus-side max SRP cell $maxCell too close to the " +
        s"${graft.operators.Dedup.MaxSrpBucket} fence")
  }

  test("contamination spans match a first-principles token-level replay") {
    // brute-force ground truth in plain Scala: a corpus token position
    // q is contaminated iff SOME 8-window covering it appears verbatim
    // in some eval doc; spans are maximal runs of contaminated
    // positions. Asserting against this (not the window/interval-union
    // spelling) proves the tiling argument end to end.
    val ml = graft.operators.SubstringDedup.MinLen
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ")))
    val evalGrams = docs.filter(_._2 == "src0").flatMap { case (_, _, w) =>
      w.sliding(ml).filter(_.length == ml).map(_.mkString(" "))
    }.toSet
    val expected = docs.filter(_._2 != "src0").map { case (id, _, w) =>
      val hit = Array.fill(w.length)(false)
      if (w.length >= ml)
        (0 to w.length - ml).foreach { i =>
          if (evalGrams(w.slice(i, i + ml).mkString(" ")))
            (i until i + ml).foreach(hit(_) = true)
        }
      // maximal runs of contaminated positions
      val spans = scala.collection.mutable.ArrayBuffer.empty[Int]
      var run = 0
      hit.foreach { h =>
        if (h) run += 1
        else if (run > 0) { spans += run; run = 0 }
      }
      if (run > 0) spans += run
      id -> ((spans.size.toLong, spans.sum.toLong,
        if (spans.isEmpty) 0L else spans.max.toLong))
    }.toMap
    val got = SparkEntry.queries("q_contamination_spans")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, v) =>
      assert(v == expected(id), s"doc $id: got $v expected ${expected(id)}")
    }
    assert(expected.values.exists(_._1 > 0),
      "fixture should contain at least one contaminated doc")
  }

  test("abutting disjoint eval-gram matches merge into one maximal run") {
    // ADVICE r11: two 8-token eval matches hitting a corpus doc at p and
    // p+8 — with NO straddling hit — cover positions p..p+15 with no
    // gap. Maximal-run semantics (the streaming gate, the brute-force
    // replay above) say ONE span of 16; the old strict interval union
    // (new span when s0 > rm) said two spans of 8. The sf fixtures
    // never contain this shape, so it is planted here explicitly.
    import spark.implicits._
    val ml = graft.operators.SubstringDedup.MinLen
    val dir = s"${sys.props("java.io.tmpdir")}/graft_contam_abut"
    val aG = (0 until ml).map(i => s"a$i")   // eval gram A, exactly 8 tokens
    val bG = (0 until ml).map(i => s"b$i")   // eval gram B, exactly 8 tokens
    // corpus doc: filler, then A immediately followed by B, then filler.
    // Straddling windows mix a*/b*/f* tokens and exist in no eval doc.
    val corpusTxt = (Seq("f0", "f1") ++ aG ++ bG ++ Seq("f2", "f3"))
      .mkString(" ")
    val docs = Seq(
      (0L, aG.mkString(" "), "en", "src0"),
      (1L, bG.mkString(" "), "en", "src0"),
      (2L, corpusTxt, "en", "src1"),
      (3L, (0 until ml).map(i => s"c$i").mkString(" "), "en", "src2"))
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q_contamination_spans")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(2L) == ((1L, 16L, 16L)),
      s"abutting hits must merge into one 16-token run, got ${got(2L)}")
    assert(got(3L) == ((0L, 0L, 0L)), "clean doc must stay zero")
  }

  test("a paraphrased leak invisible to shingles surfaces semantically") {
    import spark.implicits._
    val dir = s"${sys.props("java.io.tmpdir")}/graft_contam_plant"
    // 20 distinct words; the paraphrase REVERSES them, so the two texts
    // share zero trigram shingles but (by construction below) nearly
    // identical embeddings — the high-cosine / low-Jaccard regime
    val words = (0 until 20).map(i => s"w$i")
    val evalTxt = words.mkString(" ")
    val paraTxt = words.reverse.mkString(" ")
    val fillers = (2 until 12).map(i =>
      (i.toLong, (0 until 8).map(j => s"f${i}x$j").mkString(" "),
        "en", s"src${1 + i % 3}"))
    val docs = Seq(
      (0L, evalTxt, "en", "src0"),
      (1L, paraTxt, "en", "src1")) ++ fillers
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val base = Array.tabulate(64)(j => math.sin(j + 1.0).toFloat)
    val para = base.clone(); para(0) = para(0) + 0.01f
    val vecs = Seq((0L, base.toSeq, 0), (1L, para.toSeq, 1)) ++
      (2 until 12).map { i =>
        // one-hot fillers on distinct dims: pairwise orthogonal, and
        // cos vs the planted pair ≤ 1/||base|| ≈ 0.18 < the 0.35 τ
        val v = Array.fill(64)(0.0f); v((i * 5) % 64) = 1.0f
        (i.toLong, v.toSeq, 1 + i % 4)
      }
    vecs.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")

    // the shingle check provably misses the paraphrase...
    val shingle = SparkEntry.queries("q_contamination")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!shingle.contains((1L, 0L)),
      "reversed word order must defeat the trigram-shingle check")
    // ...and the semantic check catches it, with near-unit cosine
    val sem = SparkEntry.queries("q_contamination_semantic")(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val hit = sem.find(_._1 == ((1L, 0L)))
    assert(hit.isDefined, s"planted paraphrase pair not found in $sem")
    assert(hit.get._2 > 0.99, s"planted pair cosine ${hit.get._2}")
    // no filler sneaks in
    assert(sem.forall(_._1 == ((1L, 0L))), s"unexpected pairs: $sem")
  }
}
