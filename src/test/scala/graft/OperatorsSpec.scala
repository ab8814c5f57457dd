package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OperatorsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("minhash-LSH near-dup equals exact ngram-jaccard ground truth") {
    val exact = q("q_dedup_ngram_jaccard")
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = q("q_dedup_minhash_lsh")
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    assert(lsh == exact)
  }

  test("containment flags subset duplication both ways, bounded by 1") {
    val rows = q("q_dedup_containment").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty, "fixture plants exact dups ⇒ containment 1.0")
    assert(rows.forall { case (a, b, cq) =>
      a != b && cq > 800000L && cq <= 1000000L })
    // identical-shingle pairs (Jaccard exactly 1 — exact doubles, n/n)
    // must contain each other perfectly, in both directions; sf0.001
    // plants none, so the check is data-driven rather than assumed
    val full = rows.filter(_._3 == 1000000L).map(t => (t._1, t._2)).toSet
    val j1 = q("q_dedup_ngram_jaccard").collect()
      .filter(_.getDouble(2) == 1.0).map(r => (r.getLong(0), r.getLong(1)))
    j1.foreach { case (a, b) =>
      assert(full.contains((a, b)) && full.contains((b, a)),
        s"identical-shingle pair ($a,$b) must contain both ways")
    }
    // containment ≥ Jaccard for every symmetric near-dup pair (algebra:
    // inter/min(na,nb) ≥ inter/(na+nb-inter)) — the asymmetric score
    // can only widen the net, never narrow it
    val cmap = rows.map(t => ((t._1, t._2), t._3)).toMap
    q("q_dedup_ngram_jaccard").collect()
      .filter(_.getDouble(2) > 0.81)
      .foreach { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        assert(cmap.contains((a, b)) || cmap.contains((b, a)),
          s"jaccard>0.81 pair ($a,$b) missing from containment")
      }
  }

  test("SRP bucket-size cap is provably inactive at fixture scale") {
    import graft.functions.VectorFunctions.srp_band_keys
    // the q_dedup_embedding_lsh skew bound drops (band,bucket) cells
    // above MaxSrpBucket; the oracle carries no cap, so oracle equality
    // requires the cap to never fire on fixture data — assert a 2×
    // margin (measured max: 98 at sf0.1, 31 at sf0.01)
    val maxCell = graft.sources.Tables.embeddings(spark, sf)
      .select(posexplode(srp_band_keys(
        col("embedding").cast("array<double>"), 64, 12)))
      .groupBy(col("pos"), col("col")).count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    assert(maxCell * 2 <= graft.operators.Dedup.MaxSrpBucket,
      s"max SRP cell $maxCell too close to cap ${graft.operators.Dedup.MaxSrpBucket}")
  }

  test("the df-cap guard fires loudly when a stop shingle crosses the cap") {
    import spark.implicits._
    val dir = s"${sys.props("java.io.tmpdir")}/graft_dfcap_guard"
    // 70 docs sharing one trigram (df 70 > ShingleDfCap 64) — exactly
    // the corpus where the capped pair join would silently diverge from
    // the uncapped oracle replay; the guard must turn that into a named
    // precondition failure, not a hash mismatch
    (0 until 70).map(i =>
        (i.toLong, s"common stop phrase tail$i x$i y$i", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalArgumentException] {
      SparkEntry.queries("q_dedup_ngram_jaccard")(spark, dir)
    }
    assert(e.getMessage.contains("df cap is ACTIVE"),
      s"unexpected message: ${e.getMessage}")
    // the production default (guard off — ADVICE r11): the capped join
    // both constructs and runs (the fence itself stays active). Restore
    // the test session's explicit opt-in afterwards — unset would fall
    // back to the off DEFAULT, silently disarming every later suite.
    spark.conf.set("spark.graft.dedup.dfCapGuard", "off")
    try assert(
      SparkEntry.queries("q_dedup_ngram_jaccard")(spark, dir).count() >= 0)
    finally spark.conf.set("spark.graft.dedup.dfCapGuard", "on")
  }

  test("exact dedup keeps every distinct text exactly once") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val distinctTexts = docs.select("text").distinct().count()
    assert(q("q_dedup_exact").count() == distinctTexts)
  }

  test("simhash pairs all satisfy the hamming bound") {
    val rows = q("q_dedup_simhash").collect()
    assert(rows.forall(_.getInt(2) <= 7))
  }

  test("fixture text is pure ASCII (byte-fold vs codepoint-fold oracle equivalence)") {
    // several oracles (CMS base hash, NeutralHash40/simhash, rolling
    // fingerprint, multimodal ORD probes) replay Spark's UTF-8 BYTE folds
    // with DuckDB codepoint folds; those coincide exactly when every char
    // is ASCII. This makes that standing assumption a checked invariant
    // instead of a comment.
    val nonAscii = graft.sources.Tables.documents(spark, sf)
      .where(not(col("text").rlike("^[\\x00-\\x7F]*$")))
      .count()
    assert(nonAscii == 0L, s"$nonAscii documents contain non-ASCII text")
  }

  test("simhash finds the planted near-dup pairs") {
    val exact = q("q_dedup_ngram_jaccard")
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = q("q_dedup_simhash")
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // near-identical token sets ⇒ near-identical simhash; expect high recall
    val recall = exact.count(sim.contains).toDouble / math.max(exact.size, 1)
    assert(recall >= 0.8, s"simhash recall $recall too low (found ${sim.size})")
  }

  test("cluster resolution: keepers are cluster minima, members map to them") {
    val rows = q("q_dedup_clusters").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.length == 500)
    assert(rows.forall { case (id, keep, isK) => (id == keep) == isK })
    assert(rows.forall { case (id, keep, _) => keep <= id })
    // every pair from the exact ground truth lands in one cluster
    val comp = rows.map(r => r._1 -> r._2).toMap
    q("q_dedup_ngram_jaccard").collect().foreach { r =>
      assert(comp(r.getLong(0)) == comp(r.getLong(1)),
        s"pair ${r.getLong(0)},${r.getLong(1)} split across clusters")
    }
  }

  test("incremental cluster merge equals from-scratch labels, non-trivially") {
    val inc = q("q_dedup_clusters_incremental").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getBoolean(3)))
    val scratch = q("q_dedup_clusters").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(inc.length == scratch.size)
    inc.foreach { case (id, keep, isK, _) =>
      assert(keep == scratch(id), s"doc $id: incremental label drifted")
      assert((id == keep) == isK)
    }
    // the merge must be NON-TRIVIAL: some delta doc joins an existing
    // component (its canonical is an old doc), or the test proves
    // nothing about the contraction path
    assert(inc.exists { case (_, keep, _, isNew) =>
      isNew && inc.exists(r => r._1 == keep && !r._4) },
      "no delta doc merged into an existing component — vacuous split")
    assert(inc.exists(_._4) && inc.exists(!_._4),
      "both eras must be populated")
  }

  test("large-star/small-star CC labels equal pointer-jumping CC labels") {
    import spark.implicits._
    import graft.operators.Dedup
    def labelsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // fixture near-dup pair graph
    val pairs = Dedup.ngramJaccardPairsRaw(spark, sf)
      .select(col("doc_a"), col("doc_b")).cache()
    val edges = pairs.unionAll(
      pairs.select(col("doc_b"), col("doc_a"))).toDF("src", "dst")
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("doc_id").as("lbl"))
    val (lp, _) = Dedup.connectedComponents(docs, edges)
    val (ls, _) = Dedup.connectedComponentsStars(docs, edges)
    assert(labelsOf(lp) == labelsOf(ls))
    pairs.unpersist()
    // synthetic worst cases: a 64-node chain (long diameter), a star
    // with a high-id center, an isolated node, two components
    val chain = (0L until 63L).map(i => (i, i + 1))
    val star = (100L to 110L).map(i => (150L, i))
    val syn = (chain ++ star).toDF("src", "dst")
    val synEdges = syn.unionAll(syn.select(col("dst"), col("src")))
      .toDF("src", "dst")
    val synDocs = (((0L to 63L) ++ (100L to 110L)) :+ 150L :+ 999L)
      .toDF("doc_id").withColumn("lbl", col("doc_id"))
    val (sp, _) = Dedup.connectedComponents(synDocs, synEdges)
    val (ss, ssRounds) = Dedup.connectedComponentsStars(synDocs, synEdges)
    val expect = (0L to 63L).map(_ -> 0L) ++
      ((100L to 110L).map(_ -> 100L) :+ (150L -> 100L)) :+ (999L -> 999L)
    assert(labelsOf(sp) == expect.toSet)
    assert(labelsOf(ss) == expect.toSet)
    // star contraction must beat O(diameter): the 64-chain collapses in
    // O(log^2 n) alternations, far under the 63 hops propagation needs
    assert(ssRounds <= 10, s"star contraction took $ssRounds rounds")
  }

  test("label propagation converges early and labels components correctly") {
    import spark.implicits._
    // two chains and an isolated node: diameter 3 ⇒ min-label needs 3
    // propagation rounds + 1 confirming round, far under the safety cap
    val docs = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L)
      .toDF("doc_id").select(col("doc_id"), col("doc_id").as("lbl"))
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
    val edges = (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
    val (labels, rounds) = graft.operators.Dedup.connectedComponents(docs, edges)
    assert(rounds <= 5, s"expected early convergence, ran $rounds rounds")
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("LSH embedding near-dup is an exact-rescored subset of the baseline") {
    val exact = q("q_dedup_embedding").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = q("q_dedup_embedding_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(lsh.nonEmpty, "banding should surface at least some pairs")
    lsh.foreach { case (pair, cos) =>
      assert(exact.get(pair).contains(cos),
        s"$pair not in (or differs from) the exact baseline")
    }
  }

  test("cosine top-k returns k=5 ranked neighbors per query") {
    val rows = q("q_sim_cosine_topk").collect()
    assert(rows.length == 15) // 3 queries × 5
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.values.foreach { rs =>
      val cs = rs.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b },
        "cos must be non-increasing in rank")
    }
  }

  test("ANN (LSH and IVF) neighbors are a subset of the corpus, ranked") {
    for (name <- Seq("q_sim_ann_lsh", "q_sim_ann_ivf", "q_sim_ann_multiprobe",
        "q_sim_ann_ivfpq")) {
      val rows = q(name).collect()
      assert(rows.nonEmpty, s"$name returned no neighbors — vacuous buckets")
      assert(rows.forall(_.getLong(1) >= 3), s"$name returned a query as neighbor")
      assert(rows.groupBy(_.getLong(0)).values.forall(_.length <= 5))
    }
  }

  test("IVF-PQ rescore stage reports exact (not approximate) distances") {
    import graft.functions.VectorFunctions.decimal_sqdist
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
    val reported = q("q_sim_ann_ivfpq").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val pairs = reported.keys.toSeq
    val exact = vecs.as("a").join(vecs.as("b"),
        col("a.vec_id") < 3 && col("b.vec_id") >= 3)
      .select(col("a.vec_id").as("q"), col("b.vec_id").as("n"),
        decimal_sqdist(col("a.v"), col("b.v")).cast("double").as("d"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    pairs.foreach { p =>
      assert(reported(p) == exact(p),
        s"pair $p: stage-3 must emit the full-precision distance")
    }
  }

  test("lshBits keeps expected bucket population near target at every scale") {
    import graft.operators.Similarity.lshBits
    // 500 vectors / target 8 → 62 cells → 5 bits (2^5=32 ≤ 62 < 2^6)
    assert(lshBits(500, 8) == 5)
    // sf0.1's 2000 vectors adapt upward: 250 cells → 7 bits
    assert(lshBits(2000, 8) == 7)
    // degenerate corpora never produce a 0-bit (single-bucket-only) key…
    assert(lshBits(1, 8) == 1)
    assert(lshBits(0, 8) == 1)
    // …and planet-scale corpora clamp at 30 bits (the int bucket domain)
    assert(lshBits(1000000000000L, 8) == 30)
    // expected population = n / 2^bits stays within [target, 2*target)
    for (n <- Seq(100L, 1000L, 50000L, 2000000L); t <- Seq(8L, 16L, 32L)) {
      val pop = n.toDouble / (1L << lshBits(n, t))
      assert(pop >= t / 2.0 && pop < 2.0 * t,
        s"n=$n target=$t bits=${lshBits(n, t)} pop=$pop drifted")
    }
  }

  test("ivfCells is the exact integer sqrt, clamped below at 2") {
    import graft.operators.Similarity.ivfCells
    // exact at perfect squares and their neighbors (the FP-drift trap)
    assert(ivfCells(500) == 22)   // sf0.01's 500 vectors → 22 cells
    assert(ivfCells(484) == 22)
    assert(ivfCells(483) == 21)
    assert(ivfCells(2000) == 44)  // sf0.1 adapts upward
    assert(ivfCells(0) == 2 && ivfCells(1) == 2 && ivfCells(4) == 2)
    assert(ivfCells(1000000000000L) == 1000000)
    // k ∝ √n ⇒ per-cell population n/k ≈ √n: total within-cell pair
    // work k·(n/k)² = n^1.5, not n² — the SemDeDup scale contract
    for (n <- Seq(100L, 10000L, 1000000L)) {
      val k = ivfCells(n)
      assert(math.abs(n.toDouble / k - math.sqrt(n.toDouble)) <
        math.sqrt(n.toDouble) * 0.1)
    }
  }

  test("multiprobe ANN recall is at least single-probe recall vs exact top-k") {
    def hits(name: String) = q(name).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = hits("q_sim_cosine_topk")   // brute-force ground truth
    val single = hits("q_sim_ann_lsh")
    val multi = hits("q_sim_ann_multiprobe")
    // Non-vacuity first: the r7 regression slipped through because this
    // comparison held trivially at 0 >= 0 when 16-bit buckets over 500
    // vectors isolated every vector (spark_rows = 0). With corpus-derived
    // widths (lshBits), every arm must produce candidates AND recall the
    // exact answer at better than zero — never again compare two empties.
    assert(exact.nonEmpty, "exact top-k ground truth is empty")
    assert(single.nonEmpty, "single-probe ANN returned no candidates")
    assert(multi.nonEmpty, "multiprobe ANN returned no candidates")
    val rs = (single & exact).size.toDouble / exact.size
    val rm = (multi & exact).size.toDouble / exact.size
    assert(rm > 0.0, s"multiprobe recall is zero against ${exact.size} exact")
    assert(rm >= rs, s"multiprobe recall $rm < single-probe recall $rs")
    // the bits+1-bucket probe set strictly contains the single probe, so
    // per query the kept top-5's WORST cosine can only improve
    def worst(name: String) = q(name).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getDouble(2)).min).toMap
    val ws = worst("q_sim_ann_lsh")
    val wm = worst("q_sim_ann_multiprobe")
    ws.foreach { case (qid, w) =>
      assert(wm.getOrElse(qid, Double.MinValue) >= w - 1e-12,
        s"query $qid: multiprobe worst ${wm.get(qid)} < single worst $w")
    }
  }

  test("PQ ANN: 8-code ADC ranking is valid, non-negative, and deterministic") {
    val rows = q("q_sim_ann_pq").collect()
    assert(rows.length == 15) // 3 queries × 5
    assert(rows.forall(_.getLong(1) >= 3), "returned a query as neighbor")
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      val ds = rs.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(ds.forall(_ >= 0.0), "squared distance must be non-negative")
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b },
        "adist must be non-decreasing in rank")
    }
    // the codebook trajectory is deterministic — a re-run is bit-identical
    val again = q("q_sim_ann_pq").collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("text stats/quality/tokens cover every document") {
    val n = graft.sources.Tables.documents(spark, sf).count()
    assert(q("q_text_stats").count() == n)
    assert(q("q_text_tokens").count() == n)
    val quality = q("q_text_quality").collect()
    assert(quality.length == n)
    assert(quality.forall { r =>
      val s = r.getDouble(1); s >= 0.0 && s <= 1.0
    })
  }

  test("char entropy matches an independent in-memory reimplementation") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = q("q_text_entropy").collect()
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val (id, n, simpson, ent) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val cnts = ('a' to 'z').map(c => docs(id).count(_ == c).toLong)
      assert(n == cnts.sum)
      assert(simpson == cnts.map(c => c * (c - 1)).sum)
      // identical quantization arithmetic, so equality is exact
      val expected = cnts.filter(_ > 0).map { c =>
        math.floor(-((c.toDouble / n.toDouble) *
          math.log(c.toDouble / n.toDouble)) * 1e9).toLong
      }.sum
      assert(ent == expected, s"doc $id entropy $ent != $expected")
      // Shannon bound: 0 ≤ H ≤ ln 26
      assert(ent >= 0 && ent <= math.ceil(math.log(26.0) * 1e9).toLong)
    }
  }

  test("DSIR selection is enriched toward the en target distribution") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val corpusEnFrac = docs.where(col("lang") === "en").count().toDouble /
      docs.count()
    val sel = q("q_curation_dsir").collect()
    assert(sel.length == 200)
    assert(sel.map(_.getLong(0)).distinct.length == 200)
    val selEnFrac = sel.count(_.getString(1) == "en").toDouble / sel.length
    // importance resampling toward p_target must over-represent en
    assert(selEnFrac > corpusEnFrac,
      s"selected en frac $selEnFrac should exceed corpus $corpusEnFrac")
    // independent in-memory reimplementation: same hashed buckets,
    // Laplace smoothing, and 1e6-floor log-ratio weights ⇒ the selected
    // id set and every score must match exactly
    val all = docs.select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def bucket(t: String): Int = (t.head.toInt * 31 + t.length) % 64
    val nR = Array.fill(64)(0L); val nT = Array.fill(64)(0L)
    all.foreach { case (_, lang, text) =>
      text.split(' ').foreach { t =>
        val b = bucket(t); nR(b) += 1; if (lang == "en") nT(b) += 1
      }
    }
    val (totR, totT) = (nR.sum, nT.sum)
    val lw = Array.tabulate(64) { b =>
      math.floor(math.log(((nT(b) + 1).toDouble * (totR + 64).toDouble) /
        ((nR(b) + 1).toDouble * (totT + 64).toDouble)) * 1e6).toLong
    }
    val expected = all.map { case (id, _, text) =>
      id -> text.split(' ').map(t => lw(bucket(t))).sum
    }.sortBy { case (id, sc) => (-sc, id) }.take(200).toMap
    assert(sel.map(_.getLong(0)).toSet == expected.keySet)
    sel.foreach(r => assert(r.getLong(2) == expected(r.getLong(0))))
  }

  test("MMR selection matches an independent in-memory greedy") {
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      // decimal-exact dot, mirroring DecimalDotProduct
      var acc = java.math.BigDecimal.ZERO
      for (i <- a.indices)
        acc = acc.add(java.math.BigDecimal.valueOf(a(i) * b(i))
          .setScale(12, java.math.RoundingMode.HALF_UP))
      acc.doubleValue()
    }
    val (qid, qv) = vecs.head
    val cand = vecs.tail.map { case (id, v) =>
      (id, v, dot(v, v),
        math.floor(dot(v, qv) / math.sqrt(dot(v, v) * dot(qv, qv)) * 1e6)
          .toLong)
    }
    var sel = Vector.empty[(Long, Array[Double], Double, Long)]
    for (_ <- 1 to 10) {
      val pick = cand.filter(c => !sel.exists(_._1 == c._1)).map {
        case (id, v, nsq, rel) =>
          val ms = if (sel.isEmpty) 0L
            else sel.map(s0 => math.floor(
              dot(v, s0._2) / math.sqrt(nsq * s0._3) * 1e6).toLong).max
          (id, v, nsq, rel, ms, 7L * rel - 3L * ms)
      }.minBy(c => (-c._6, c._1))
      sel :+= ((pick._1, pick._2, pick._3, pick._6))
    }
    val rows = q("q_sim_mmr").collect()
    assert(rows.length == 10)
    rows.zip(sel).foreach { case (r, s0) =>
      assert(r.getLong(1) == s0._1, s"rank ${r.getLong(0)} pick")
      assert(r.getLong(4) == s0._4, s"rank ${r.getLong(0)} score")
    }
    // diversity must bite: some rank's pick differs from pure top-rel
    val topRel = cand.sortBy(c => (-c._4, c._1)).take(10).map(_._1).toSet
    assert(sel.map(_._1).toSet != topRel,
      "MMR must diverge from relevance-only top-k on the fixture")
  }

  test("whitening matches an independent in-memory reimplementation") {
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val xq = vecs.map { case (id, v) =>
      id -> v.map(x => math.floor(x * 1e6).toLong)
    }
    val n = xq.size.toLong
    val m = Array.tabulate(64)(j => xq.values.map(_(j)).sum.toDouble / n)
    val sd = Array.tabulate(64) { j =>
      val s2 = xq.values.map(v => v(j) * v(j)).sum
      val va = s2.toDouble / n - m(j) * m(j)
      if (va > 0) math.sqrt(va) else 0.0
    }
    val rows = q("q_embed_whiten").collect()
    assert(rows.length == n)
    rows.foreach { r =>
      val id = r.getLong(0)
      val t = Array.tabulate(64) { j =>
        if (sd(j) > 0)
          math.floor(((xq(id)(j).toDouble - m(j)) / sd(j)) * 1e6).toLong
        else 0L
      }
      assert(r.getLong(1) == t.sum, s"vec $id digest")
      assert(r.getLong(2) == t.map(c => c * c).sum, s"vec $id sqsum")
    }
    // standardized components should straddle zero corpus-wide
    assert(rows.exists(_.getLong(1) < 0) && rows.exists(_.getLong(1) > 0))
  }

  test("power-iteration PC1 matches an independent in-memory reimplementation") {
    val xq = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Double](1).toArray.map(x => math.floor(x * 1e6).toLong))
      .toMap
    val g = Array.ofDim[Long](64, 64)
    for (v <- xq.values; j <- 0 until 64; k <- 0 until 64)
      g(j)(k) += v(j) * v(k)
    def dec(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(12, java.math.RoundingMode.HALF_UP)
    var vv = Array.fill(64)(0.125)
    var lastRq = Double.MinValue
    for (_ <- 1 to 3) {
      val w = Array.tabulate(64) { j =>
        (0 until 64).map(k => dec(g(j)(k).toDouble / 1e12 * vv(k)))
          .reduce(_.add(_)).doubleValue()
      }
      // Rayleigh quotient v·Gv = v·w must be non-decreasing: each power
      // round moves v toward the dominant eigenvector, never away
      val rq = (0 until 64).map(j => vv(j) * w(j)).sum
      assert(rq >= lastRq - 1e-9, s"power iteration regressed: $rq < $lastRq")
      lastRq = rq
      val nrm = math.sqrt(w.map(x => dec(x * x)).reduce(_.add(_)).doubleValue())
      vv = w.map(_ / nrm)
    }
    val rows = q("q_embed_pca_power").collect()
    assert(rows.length == xq.size)
    rows.foreach { r =>
      val want = math.floor(
        xq(r.getLong(0)).map(_.toDouble).zip(vv)
          .map { case (x, c) => dec(x * c) }
          .reduce(_.add(_)).doubleValue()).toLong
      assert(r.getLong(1) == want, s"vec ${r.getLong(0)} pc1")
    }
    // the principal direction must carry real variance: projections differ
    assert(rows.map(_.getLong(1)).distinct.length > 1)
  }

  test("centroid-distance outlier gate matches an in-memory reimplementation") {
    val xq = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Double](1).toArray.map(x => math.floor(x * 1e6).toLong))
      .toMap
    def dec(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(12, java.math.RoundingMode.HALF_UP)
    val n = xq.size
    val m = Array.tabulate(64)(j =>
      xq.values.map(_(j)).sum.toDouble / n.toDouble)
    val dist = xq.map { case (id, v) =>
      id -> ((0 until 64).map { j =>
        val t = v(j).toDouble - m(j); dec(t * t)
      }.reduce(_.add(_)).doubleValue() / 1e12)
    }
    val mu = dist.values.map(dec).reduce(_.add(_)).doubleValue() / n
    val s2 = dist.values.map(x => dec(x * x)).reduce(_.add(_))
      .doubleValue() / n
    val thr = mu + 2.0 * math.sqrt(math.max(s2 - mu * mu, 0.0))
    val rows = q("q_embed_outliers").collect()
    assert(rows.length == n)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == math.floor(dist(id) * 1e6).toLong, s"vec $id")
      assert(r.getBoolean(2) == (dist(id) > thr), s"vec $id flag")
    }
    // the gate must bite, and only on the tail
    val flagged = rows.filter(_.getBoolean(2))
    assert(flagged.nonEmpty, "fixture tail must contain outliers")
    assert(flagged.length * 10 < n, "2σ gate must not flag the bulk")
    val minFlagged = flagged.map(_.getLong(1)).min
    assert(rows.filterNot(_.getBoolean(2)).forall(_.getLong(1) <= minFlagged))
  }

  test("integer pagerank matches an independent in-memory reimplementation") {
    val pairs = q("q_dedup_ngram_jaccard").select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = pairs ++ pairs.map(p => (p._2, p._1)) // symmetrize
    val nodes = graft.sources.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val base = 1000000000L / nodes.length
    val tele = 15L * base / 100L
    var r = nodes.map(_ -> base).toMap
    for (_ <- 1 to 5) {
      val mass = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / deg(src) }.sum
      }
      r = nodes.map(v => v -> (tele + 85L * mass.getOrElse(v, 0L) / 100L)).toMap
    }
    val rows = q("q_graph_pagerank").collect()
    assert(rows.length == nodes.length)
    rows.foreach { row =>
      val (id, rank, dg) = (row.getLong(0), row.getLong(1), row.getLong(2))
      assert(rank == r(id), s"doc $id rank $rank != ${r(id)}")
      assert(dg == deg.getOrElse(id, 0L))
    }
    // connected docs accumulate mass above the teleport floor
    assert(rows.exists(row => row.getLong(2) > 0 && row.getLong(1) > tele))
  }

  test("winnowing selection matches an in-memory reimplementation") {
    def fold(s: String): Long = {
      var h = 0L
      s.getBytes("UTF-8").foreach(b => h = (h * 1000003L + (b & 0xFF)) & 0xFFFFFFFFFFL)
      h
    }
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expected = docs.map { case (id, text) =>
      val w = text.split(" ")
      val sh = if (w.length >= 3)
        (0 until w.length - 2).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}")
      else Seq(w.mkString(" "))
      val h = sh.map(fold)
      val fps = if (h.length >= 4)
        (0 to h.length - 4).map { j =>
          val win = h.slice(j, j + 4)
          val m = win.min
          (j + win.lastIndexOf(m) + 1L, m) // 1-based rightmost argmin
        }.distinct
      else Seq((h.lastIndexOf(h.min) + 1L, h.min))
      id -> fps.sortBy(_._1)
    }.toMap
    val rows = q("q_text_winnow").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (k, v) =>
        k -> v.map(t => (t._2, t._3)).toSeq.sortBy(_._1) }
    assert(rows.keySet == expected.keySet)
    rows.foreach { case (id, fps) => assert(fps == expected(id), s"doc $id") }
    // the winnowing coverage guarantee: selected positions are never
    // more than w apart, so no w-window lacks a fingerprint
    rows.foreach { case (id, fps) =>
      fps.map(_._1).sliding(2).foreach {
        case Seq(a, b) => assert(b - a <= 4, s"doc $id gap $a->$b")
        case _ =>
      }
    }
  }

  test("triangle counts match a brute-force in-memory enumeration") {
    val pairs = q("q_dedup_ngram_jaccard").select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val triPerNode = scala.collection.mutable.Map.empty[Long, Long]
    for ((a, b) <- pairs; c <- adj(a) intersect adj(b); if b < c) {
      // (a,b) canonical a<b; c > b > a ⇒ each triangle enumerated once
      Seq(a, b, c).foreach(v =>
        triPerNode(v) = triPerNode.getOrElse(v, 0L) + 1L)
    }
    val rows = q("q_graph_triangles").collect()
    assert(rows.length ==
      graft.sources.Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val (id, deg, tri, lcc) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(deg == adj.get(id).map(_.size.toLong).getOrElse(0L))
      assert(tri == triPerNode.getOrElse(id, 0L), s"doc $id tri")
      val want = if (deg >= 2) 2000000L * tri / (deg * (deg - 1)) else 0L
      assert(lcc == want, s"doc $id lcc")
    }
    // non-vacuous: the planted near-dup families close real triangles
    assert(rows.exists(_.getLong(2) > 0), "fixture must contain triangles")
  }

  test("dedup report cross-foots with the cluster labels and the corpus") {
    val n = graft.sources.Tables.documents(spark, sf).count()
    val rows = q("q_dedup_report").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.forall { case (sz, k, d) => d == sz * k })
    assert(rows.map(_._3).sum == n, "every doc lands in exactly one cluster")
    // independent derivation from the clusters query
    val sizes = q("q_dedup_clusters").collect()
      .groupBy(_.getLong(1)).map(_._2.length.toLong)
    val expected = sizes.groupBy(identity).map { case (sz, g) =>
      sz -> g.size.toLong }
    assert(rows.map(t => t._1 -> t._2).toMap == expected)
    assert(rows.exists(_._1 > 1), "fixture plants near-dups ⇒ a >1 cluster")
  }

  test("split assignment covers each language exactly and is hash-stable") {
    val rows = q("q_split_assign").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val perLang = graft.sources.Tables.documents(spark, sf)
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (lang, ss) =>
      assert(ss.map(_._3).sum == perLang(lang), s"$lang split must cover")
      assert(ss.map(_._2).toSet.subsetOf(Set("train", "valid", "test")))
    }
    val train = rows.filter(_._2 == "train").map(_._3).sum.toDouble
    val total = rows.map(_._3).sum.toDouble
    assert(train / total > 0.9, "train must dominate at 980 permille")
  }

  test("ccnet terciles are balanced per language and conserve scored docs") {
    val rows = q("q_mix_ccnet").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val scored = q("q_text_lm_score").count()
    assert(rows.map(_._3).sum == scored, "every scored doc lands in a bucket")
    rows.groupBy(_._1).foreach { case (lang, bs) =>
      assert(bs.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L),
        s"$lang must have exactly terciles 1..3")
      val sizes = bs.map(_._3)
      assert(sizes.max - sizes.min <= 1, s"$lang terciles unbalanced: $sizes")
    }
  }

  test("language-id predicts a known language for every document") {
    val langs = graft.sources.Tables.documents(spark, sf)
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    val rows = q("q_text_langid").collect()
    assert(rows.length == 500)
    assert(rows.forall(r => langs.contains(r.getString(2))))
  }

  test("multimodal decode produces valid stub metadata for every doc") {
    val rows = q("q_multimodal_decode").collect()
    assert(rows.length == 500)
    assert(rows.forall { r =>
      val w = r.getInt(2); val h = r.getInt(3); val f = r.getInt(4)
      w >= 64 && w < 256 && h >= 64 && h < 256 && f >= 1 && f <= 30
    })
  }

  test("hash sampling is deterministic and within binomial bounds") {
    val a = q("q_sample_hash").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2)))
    val b = q("q_sample_hash").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(a.sameElements(b), "hash sampling must be run-invariant")
    // en keeps ~10%, the rest ~5%; allow generous binomial slack
    a.foreach { case (lang, total, sampled) =>
      val p = if (lang == "en") 0.10 else 0.05
      val tol = 4 * math.sqrt(total * p * (1 - p)) + 1
      assert(math.abs(sampled - total * p) <= tol,
        s"$lang sampled $sampled of $total, expected ~${total * p}")
    }
  }

  test("token packing conserves docs and fills shards in order") {
    val docs = graft.sources.Tables.documents(spark, sf).count()
    val rows = q("q_pack_tokens").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._3).sum == docs, "every doc lands in exactly one bin")
    // bins are consecutive from 0 within each language
    rows.groupBy(_._1).foreach { case (lang, bins) =>
      val ids = bins.map(_._2).sorted
      assert(ids.head == 0 && ids.last == ids.length - 1,
        s"$lang bins not consecutive: ${ids.mkString(",")}")
      // every bin except possibly the last holds ≥ capacity tokens once
      // its straddling doc is counted — cheap sanity: non-final bins are
      // not near-empty
      assert(bins.filter(_._2 < ids.last).forall(_._4 >= 2048 / 2))
    }
  }

  test("pii scrub finds exactly the injected redactions") {
    val rows = q("q_pii_scrub").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(rows.length == 500)
    rows.foreach { case (id, emails, phones) =>
      if (id % 3 == 0) assert(emails >= 1, s"doc $id: injected email missed")
      if (id % 3 == 1) assert(phones >= 1, s"doc $id: injected phone missed")
      if (id % 3 == 2) assert(emails == 0 && phones == 0,
        s"doc $id: phantom PII in clean doc")
    }
  }

  test("repetition ratio is consistent with its own counts") {
    val rows = q("q_text_repetition").collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val n = r.getInt(1); val u = r.getInt(2); val ratio = r.getDouble(3)
      assert(u <= n && n > 0)
      assert(math.abs(ratio - (1.0 - u.toDouble / n)) < 1e-12)
    }
  }

  test("canonical selection keeps exactly one best doc per cluster") {
    val rows = q("q_dedup_canonical").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rows.length == 500)
    val byCluster = rows.groupBy(_._2)
    byCluster.values.foreach { ms =>
      val canon = ms.filter(_._5)
      assert(canon.length == 1, "exactly one canonical per cluster")
      // canonical is max-quality (ties to smallest id), all members agree
      val best = ms.minBy(m => (-m._3, m._1))
      assert(canon.head._1 == best._1)
      assert(ms.forall(_._4 == best._1))
    }
  }

  test("contamination pairs always cross the corpus/eval boundary") {
    val src = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    q("q_contamination").collect().foreach { r =>
      assert(src(r.getLong(0)) != "src0", "corpus side must not be eval")
      assert(src(r.getLong(1)) == "src0", "eval side must be src0")
      assert(r.getLong(2) >= 5)
    }
  }

  test("tfidf returns ranked positive-score terms per document") {
    val rows = q("q_text_tfidf").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { ts =>
      assert(ts.length <= 3)
      val byRank = ts.sortBy(_._2)
      assert(byRank.map(_._2).toSeq == (1 to ts.length))
      val scores = byRank.map(_._5)
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      assert(scores.forall(_ > 0.0))
    }
  }

  test("heavy hitters are the exact global top-20, sorted") {
    val rows = q("q_text_heavy_hitters").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 20)
    val ns = rows.map(_._2)
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    assert(rows.forall { case (_, n, nd) => nd <= n && nd >= 1 })
  }

  test("dup-span fractions are consistent and catch the planted dups") {
    val rows = q("q_text_dup_spans").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length == 500)
    rows.foreach { case (_, n, dup, frac) =>
      assert(dup <= n)
      assert(math.abs(frac - dup.toDouble / n) < 1e-12)
    }
    // exact-duplicate texts exist in the fixture ⇒ their spans all repeat
    assert(rows.exists(_._4 == 1.0), "expected fully-duplicated documents")
  }

  test("despanning matches an independent in-memory reimplementation") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val rows = q("q_text_despanned").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(rows.length == docs.size)
    // ground truth, recomputed from scratch on the driver: positional
    // 8-grams, corpus-wide min-doc_id ownership, covered-position union
    val spans = docs.toSeq.flatMap { case (id, text) =>
      val w = text.split(" ")
      if (w.length >= 8)
        (0 to w.length - 8).map(i => (id, i, w.slice(i, i + 8).mkString(" ")))
      else Nil
    }
    val owner = spans.groupBy(_._3).map { case (sp, g) => sp -> g.map(_._1).min }
    val rmPos = spans.filter { case (id, _, sp) => id > owner(sp) }
      .groupBy(_._1).map { case (id, g) =>
        id -> g.flatMap { case (_, p, _) => p to p + 7 }.toSet }
    rows.foreach { case (id, clean, nRemoved) =>
      val rm = rmPos.getOrElse(id, Set.empty[Int])
      val expected = docs(id).split(" ").zipWithIndex
        .collect { case (t, i) if !rm(i) => t }.mkString(" ")
      assert(clean == expected, s"doc $id reconstruction")
      assert(nRemoved == rm.size, s"doc $id removal count")
    }
    assert(rows.exists(_._3 > 0), "fixture should contain cross-doc dup spans")
    assert(rows.exists(_._3 == 0), "expected untouched documents")
  }

  test("pipeline observe() telemetry matches independent stage counts") {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    val acc = scala.collection.concurrent.TrieMap[String, Long]()
    val l = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        qe.observedMetrics.foreach { case (n, r) => acc.put(n, r.getLong(0)) }
      override def onFailure(f: String, qe: QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      // construction fires the checkpoint-stage observations (funnel,
      // exact); count() fires the final-plan ones (canonical, capped)
      val out = q("q_pipeline_e2e").count()
      val deadline = System.currentTimeMillis() + 10000
      while (acc.size < 4 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(acc.keySet == Set("e2e_funnel", "e2e_exact", "e2e_canonical",
        "e2e_capped"), s"missing observations: $acc")
      // funnel gate respelled independently of e2eExact's projection
      val funnel = graft.sources.Tables.documents(spark, sf)
        .select(split(col("text"), " ").as("t"))
        .where("size(t) >= 30 AND size(array_distinct(t)) / size(t) > 0.45" +
          " AND (array_contains(t, 'a') OR array_contains(t, 'the'))")
        .count()
      assert(acc("e2e_funnel") == funnel, "funnel survivor count")
      assert(acc("e2e_exact") <= acc("e2e_funnel"))
      assert(acc("e2e_canonical") <= acc("e2e_exact"))
      assert(acc("e2e_capped") <= acc("e2e_canonical"))
      assert(acc("e2e_capped") == out, "capped count must equal output rows")
    } finally spark.listenerManager.unregister(l)
  }

  test("BPE merge table is well-formed and encode counts are consistent") {
    val merges = q("q_text_bpe_merges").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.length == graft.operators.Bpe.Rounds)
    // well-formed: each side is a single char or an earlier merge's
    // output — the property that makes one rank-ordered application
    // pass equal canonical lowest-rank-first BPE encoding
    val known = scala.collection.mutable.Set[String]()
    merges.sortBy(_._1).foreach { case (rank, lhs, rhs, cnt) =>
      assert(lhs.length == 1 || known(lhs), s"rank $rank lhs $lhs unformed")
      assert(rhs.length == 1 || known(rhs), s"rank $rank rhs $rhs unformed")
      assert(cnt > 0)
      known += lhs + rhs
    }
    // counts are rank-monotone ONLY per recount epoch, but multi-char
    // merges must exist: rounds compound (real BPE, not bigram gluing)
    assert(merges.exists(m => m._2.length > 1 || m._3.length > 1),
      "expected at least one merge consuming an earlier merge's output")
    // every doc's subword count lies in [n_words, n_chars]
    val sub = q("q_text_bpe").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val chars = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    sub.foreach { case (id, nWords, nSub) =>
      val nChars = chars(id).count(_ != ' ')
      assert(nSub >= nWords && nSub <= nChars,
        s"doc $id: $nSub subwords vs $nWords words / $nChars chars")
    }
  }

  test("BPE training stops early when a corpus exhausts adjacent pairs") {
    import spark.implicits._
    val dir = s"${sys.props("java.io.tmpdir")}/graft_bpe_tiny"
    Seq((1L, "a b c"), (2L, "b c a")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val (seqs, merges) = graft.operators.Bpe.train(spark, dir)
    assert(merges.isEmpty, "single-char words leave no adjacent pairs")
    // the encode surface still works: every word is its one char
    val ns = seqs.selectExpr("w",
      "(length(seq) - length(replace(seq, '~', ''))) div 2 - 1 AS n").collect()
    assert(ns.nonEmpty && ns.forall(_.getAs[Number]("n").longValue == 1L))
  }

  test("BPE training is memoized per (session, dataset)") {
    val (_, m1) = graft.operators.Bpe.train(spark, sf)
    val (_, m2) = graft.operators.Bpe.train(spark, sf)
    assert(m1 eq m2, "second train() must hit the memo, not retrain")
  }

  test("BPE token-id sequences decode back to the original corpus") {
    // rebuild the vocab exactly as the query defines it: merge products
    // by first rank, then alphabet chars lexicographically
    val merges = q("q_text_bpe_merges").collect()
      .sortBy(_.getInt(0)).map(r => r.getString(1) + r.getString(2))
    val prods = merges.distinct
    val texts = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val alphabet = texts.values.flatMap(_.split(" ")).flatMap(_.toCharArray)
      .toSeq.distinct.sorted.map(_.toString)
    val idToTok = (prods ++ alphabet).zipWithIndex
      .map { case (t, i) => ((i + 1).toLong, t) }.toMap
    val rows = q("q_text_bpe_ids").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.length == texts.size)
    val nSub = q("q_text_bpe").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    rows.foreach { case (docId, nIds, idsStr) =>
      val ids = idsStr.split("-").map(_.toLong)
      assert(ids.length == nIds, s"doc $docId id count vs n_ids")
      assert(nIds == nSub(docId), s"doc $docId n_ids vs q_text_bpe count")
      val decoded = ids.map(idToTok).mkString
      assert(decoded == texts(docId).replace(" ", ""),
        s"doc $docId decode round-trip failed")
    }
  }

  test("BPE fertility covers every language and cross-foots with bpe_stats") {
    val rows = q("q_text_bpe_fertility").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val langs = graft.sources.Tables.documents(spark, sf)
      .select(col("lang")).distinct().collect().map(_.getString(0)).toSet
    assert(rows.map(_._1).toSet == langs, "one row per corpus language")
    // per-doc stats summed over the corpus must equal the per-lang sums
    val stats = q("q_text_bpe_stats").collect()
    assert(rows.map(_._3).sum == stats.map(_.getLong(1)).sum, "word total")
    assert(rows.map(_._4).sum == stats.map(_.getLong(5)).sum, "subword total")
    rows.foreach { case (lang, nDocs, nWords, nSub, nChars, fertQ, tpmQ) =>
      assert(nDocs > 0 && nWords >= nDocs, s"$lang doc/word counts")
      // a word is >= 1 subword; a subword is >= 1 char
      assert(fertQ >= 10000L, s"$lang fertility < 1 subword/word")
      assert(nSub <= nChars, s"$lang more subwords than characters")
      assert(tpmQ >= 0 && tpmQ <= 1000000L, s"$lang tokens/char out of range")
    }
  }

  test("int8 quantization error stays within the half-step bound") {
    val rows = q("q_embed_quantize").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.length == graft.sources.Tables.embeddings(spark, sf).count())
    rows.foreach { case (id, scaleQ, _, sqsum, errQ) =>
      assert(scaleQ > 0, s"vec $id degenerate scale")
      assert(sqsum > 0)
      // total |err| ≤ dim × scale/2 ⇒ err_q ≤ 32 × scale_q (+1e-9 slack)
      assert(errQ <= 32 * scaleQ + 1, s"vec $id reconstruction error too big")
    }
  }

  test("knn join returns ≤3 ranked neighbors per vector, never itself") {
    val rows = q("q_sim_knn_join").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(rows.nonEmpty, "corpus-derived buckets should pair up some vectors")
    assert(rows.forall { case (a, b, _, _) => a != b })
    rows.groupBy(_._1).values.foreach { ns =>
      assert(ns.length <= 3)
      val byRank = ns.sortBy(_._4)
      assert(byRank.map(_._4).toSeq == (1 to ns.length))
      val cs = byRank.map(_._3)
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("blob dedup conserves the corpus and keeps minimal ids") {
    val rows = q("q_multimodal_dedup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docs = graft.sources.Tables.documents(spark, sf)
    assert(rows.map(_._2).sum == docs.count())
    // one group per distinct blob (sf0.001 has no exact dups; sf0.01+ do)
    assert(rows.length == docs.select("text").distinct().count())
  }

  test("edit-distance dedup finds the planted near-dups, zero dist means equal") {
    val exact = q("q_dedup_ngram_jaccard")
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = q("q_dedup_editdist").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2), r.getDouble(3)))
    val pairs = rows.map(_._1).toSet
    // token-level near-dups (J > 0.5) are character-level near-dups too
    val recall = exact.count(pairs.contains).toDouble / math.max(exact.size, 1)
    assert(recall >= 0.8, s"edit-distance recall $recall too low")
    assert(rows.forall { case ((a, b), dist, sim) =>
      a < b && dist >= 0 && sim >= 0.75 })
  }

  test("chunking tiles every document with stride-16 windows of ≤32 tokens") {
    val perDoc = q("q_text_chunk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
      .groupBy(_._1)
    val nWords = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("nw"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(perDoc.keySet == nWords.keySet)
    for ((id, chunks) <- perDoc) {
      val n = nWords(id)
      assert(chunks.length == (n + 15) / 16) // ceil(n / stride) starts
      assert(chunks.map(_._2).sorted.toSeq == (0 until chunks.length))
      assert(chunks.forall { case (_, _, c, nt) =>
        nt <= 32 && c.split(" ").length == nt })
      // consecutive chunks overlap by half a window: total tokens add up
      assert(chunks.map(_._4).sum ==
        (0 until n by 16).map(s => math.min(32, n - s)).sum)
    }
  }

  test("JL projection preserves norms in expectation (E[‖Pv‖²] = 16‖v‖²)") {
    val norms = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), aggregate(col("embedding").cast("array<double>"),
        lit(0.0), (a, x) => a + x * x).as("nsq"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ratios = q("q_embed_project").collect().map { r =>
      val psq = (1 to 16).map(i => r.getLong(i) / 1e6)
        .map(p => p * p).sum
      psq / (16.0 * norms(r.getLong(0)))
    }.sorted
    val median = ratios(ratios.length / 2)
    assert(median > 0.5 && median < 2.0,
      s"median projected/original norm ratio $median outside JL envelope")
  }

  test("maxsim scores are bounded by n_q (cosine <= 1) and positive-normed") {
    val rows = q("q_sim_maxsim").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (score, nq) = (r.getLong(1), r.getLong(2))
      assert(score <= nq * 1000000L, s"maxsim $score exceeds $nq vectors * 1e6")
      assert(score >= -nq * 1000000L)
    }
  }

  test("LM scores are negative log-probs with one bigram per adjacent pair") {
    import graft.sources.Tables
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), (size(split(col("text"), " ")) - 1).as("exp"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    q("q_text_lm_score").collect().foreach { r =>
      val (id, n, score) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(n == toks(id).toLong, s"doc $id bigram count $n != ${toks(id)}")
      assert(score < 0L, s"doc $id log-prob sum must be negative, got $score")
    }
  }

  test("temperature sampling fills each language budget exactly") {
    val rows = q("q_sample_temperature").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
    val byLang = rows.groupBy(_._2)
    for ((lang, sel) <- byLang) {
      val target = sel.head._4
      assert(sel.length == target, s"$lang: ${sel.length} picked != $target")
      assert(sel.map(_._3).sorted.toSeq == (1 to target.toInt))
    }
    // budgets are ∝ √n, so they sum to ≤ the global budget (floor each)
    assert(byLang.values.map(_.head._4).sum <= 200)
    // flattening: no language exceeds twice the uniform share
    val langs = byLang.size
    assert(byLang.values.forall(_.head._4 <= 2 * 200 / langs))
  }

  test("flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("2-core equals in-memory peel-to-fixpoint over the exact pair graph") {
    val pairs = q("q_dedup_ngram_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var edges = (pairs ++ pairs.map(p => (p._2, p._1))).toSet
    var rounds = 0
    var changed = true
    while (changed) {
      val deg = edges.groupBy(_._1).map { case (k, v) => (k, v.size) }
      val keep = deg.filter(_._2 >= 2).keySet
      val next = edges.filter(e => keep(e._1) && keep(e._2))
      changed = next != edges
      if (changed) rounds += 1
      edges = next
    }
    // the published result is the TRUE 2-core only if the fixed unroll
    // budget reaches the fixpoint — this is the guard the VERDICT-r7
    // vacuity lesson demands
    assert(rounds <= graft.operators.Dedup.PeelRounds,
      s"peel needs $rounds rounds, budget ${graft.operators.Dedup.PeelRounds}")
    val expDeg = edges.groupBy(_._1).map { case (k, v) => (k, v.size.toLong) }
    val got = q("q_graph_kcore").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (id, in2, cd) =>
      assert(cd == expDeg.getOrElse(id, 0L), s"doc $id core_deg")
      assert(in2 == (if (expDeg.contains(id)) 1L else 0L), s"doc $id in_2core")
    }
    assert(got.exists(_._2 == 1L), "fixture 2-core must be non-empty")
    assert(got.exists(_._2 == 0L), "peel must remove something")
  }

  test("CDC chunking equals in-memory reimplementation; exact dups cover 100%") {
    def h40(s0: String): Long =
      s0.getBytes("UTF-8").foldLeft(0L)((h, b) =>
        (h * 1000003L + (b & 0xFF)) & 0xFFFFFFFFFFL)
    def chunks(text: String): Seq[String] = {
      val w = text.split(" ")
      val n = w.length
      if (n < 4) Seq(text)
      else {
        val h = (0 until n - 2).map(i => h40(s"${w(i)} ${w(i + 1)} ${w(i + 2)}"))
        val cuts = (1 to n - 3).filter(i => h(i - 1) % 8 == 0)
        val starts = 1 +: cuts.map(_ + 3)
        val ends = cuts.map(_ + 2) :+ n
        starts.zip(ends).map { case (a, b) => w.slice(a - 1, b).mkString(" ") }
      }
    }
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val perDoc = docs.map { case (id, t) => (id, chunks(t).map(h40)) }
    val nd = perDoc.flatMap { case (id, cs) => cs.distinct.map(c => (c, id)) }
      .groupBy(_._1).map { case (c, xs) => (c, xs.map(_._2).distinct.size) }
    val exp = perDoc.map { case (id, cs) =>
      val toks = docs.find(_._1 == id).get._2.split(" ").length
      // chunk token counts re-derived from the chunk strings, like the query
      val sizes = chunks(docs.find(_._1 == id).get._2).map(_.split(" ").length)
      val dupTok = chunks(docs.find(_._1 == id).get._2).zip(sizes)
        .filter { case (c, _) => nd(h40(c)) >= 2 }.map(_._2).sum
      (id, cs.size.toLong, cs.count(c => nd(c) >= 2).toLong,
        1000000L * dupTok / sizes.sum)
    }.sortBy(_._1)
    val got = q("q_dedup_cdc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == exp.toSeq)
    // non-vacuity: the planted near-dups share enough runs that some doc
    // is FULLY covered by cross-doc duplicate chunks
    assert(got.exists(_._4 == 1000000L), "no fully-duplicated doc found")
    assert(got.exists(_._4 == 0L), "every doc duplicated — fixture broken")
    // identical texts chunk identically ⇒ any exact-dup doc must be 100%
    // covered (sf0.001 plants none; the check is data-driven)
    val dupTexts = docs.groupBy(_._2).filter(_._2.length >= 2)
      .values.flatten.map(_._1).toSet
    got.filter(r => dupTexts(r._1)).foreach { r =>
      assert(r._4 == 1000000L, s"exact-dup doc ${r._1} ratio ${r._4}")
    }
  }

  test("Kneser-Ney table equals in-memory reimplementation, mass bounded") {
    val texts = graft.sources.Tables.documents(spark, sf)
      .select(col("text")).collect().map(_.getString(0))
    val bigrams = texts.flatMap { t =>
      val w = t.split(" "); if (w.length < 2) Nil
      else (0 until w.length - 1).map(i => (w(i), w(i + 1)))
    }
    val c12 = bigrams.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val nf = c12.keys.groupBy(_._1).map { case (k, v) => (k, v.size.toLong) }
    val c1 = c12.groupBy(_._1._1).map { case (k, v) => (k, v.values.sum) }
    val np = c12.keys.groupBy(_._2).map { case (k, v) => (k, v.size.toLong) }
    val nb = c12.size.toLong
    val exp = c12.map { case ((w1, w2), c) =>
      val num = math.max(4 * c - 3, 0L) * nb + 3 * nf(w1) * np(w2)
      ((w1, w2), (c, 1000000L * num / (4 * c1(w1) * nb)))
    }
    val got = q("q_text_lm_kn").collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.size == exp.size)
    exp.foreach { case (k, v) => assert(got(k) == v, s"bigram $k") }
    // discount accounting: for every context, the direct (discounted)
    // mass over observed continuations is exactly (4·c1 − 3·nf)/(4·c1)
    // — i.e. Σ max(4c−3,0) = 4·c1 − 3·nf (every observed c ≥ 1)
    c1.keys.foreach { w1 =>
      val direct = c12.collect { case ((a, _), c) if a == w1 =>
        math.max(4 * c - 3, 0L) }.sum
      assert(direct == 4 * c1(w1) - 3 * nf(w1), s"context $w1")
    }
  }

  test("RRF fuses two full top-20 permutations and recomputes exactly") {
    val rows = q("q_sim_hybrid_rrf").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._2).filter(_ > 0).sorted.toSeq == (1L to 20L),
      "lexical arm must contribute a full rank permutation")
    assert(rows.map(_._3).filter(_ > 0).sorted.toSeq == (1L to 20L),
      "dense arm must contribute a full rank permutation")
    rows.foreach { case (id, lr, dr, s0) =>
      val e0 = (if (lr > 0) 1000000L / (60 + lr) else 0L) +
        (if (dr > 0) 1000000L / (60 + dr) else 0L)
      assert(s0 == e0, s"doc $id fused score")
    }
    assert(rows.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
      "published order must be fused-score descending")
    // dense arm against an independent decimal-exact cosine recompute
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def decdot(a: Array[Double], b: Array[Double]): BigDecimal =
      a.zip(b).map { case (x, y) =>
        BigDecimal(x * y).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }.sum
    val qv = emb.find(_._1 == 0L).get._2
    val ranked = emb.filter(_._1 >= 1L)
      .map { case (id, v) =>
        // mirror exactCos's op order: decimal dots cast to double, THEN
        // double multiply / sqrt / divide
        (id, decdot(qv, v).toDouble /
          math.sqrt(decdot(qv, qv).toDouble * decdot(v, v).toDouble))
      }
      .sortBy { case (id, c) => (-c, id) }.take(20).map(_._1)
    val gotDense = rows.filter(_._3 > 0).sortBy(_._3).map(_._1)
    assert(gotDense.toSeq == ranked.toSeq, "dense top-20 disagrees")
  }

  test("KMV estimate equals in-memory order statistic and lands near exact") {
    def h40(s0: String): Long =
      s0.getBytes("UTF-8").foldLeft(0L)((h, b) =>
        (h * 1000003L + (b & 0xFF)) & 0xFFFFFFFFFFL)
    val k = graft.functions.KmvAgg.K
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySource = docs.groupBy(_._1).map { case (src, ds) =>
      val hs = ds.flatMap { case (_, t) =>
        val w = t.split(" ")
        if (w.length >= 3) (0 until w.length - 2)
          .map(i => h40(s"${w(i)} ${w(i + 1)} ${w(i + 2)}"))
        else Seq(h40(t))
      }.distinct.sorted
      val est = if (hs.length < k) hs.length.toLong
        else (k - 1).toLong * 1099511627776L / hs(k - 1)
      (src, (hs.length.toLong, est))
    }
    val got = q("q_agg_distinct_kmv").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got.size == bySource.size)
    bySource.foreach { case (src, v) => assert(got(src) == v, s"source $src") }
    // the sketch must actually be estimating (buffer full), and the
    // estimate must land within the K=64 error envelope (≈±12% stddev;
    // 50% is a generous 4σ fixture bound)
    assert(bySource.values.exists(_._1 >= k), "no source filled the sketch")
    bySource.values.filter(_._1 >= k).foreach { case (exact, est) =>
      assert(math.abs(est - exact).toDouble / exact < 0.5,
        s"estimate $est vs exact $exact out of envelope")
    }
  }

  test("funnel steps equal in-memory sequential scan; all stages populated") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("m")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val exp = ev.map(_._1).distinct.sorted.map { u =>
      val mine = ev.filter(_._1 == u)
      def firstAfter(tpe: String, after: Long): Option[Long] = {
        val c = mine.filter(e => e._2 == tpe && e._3 > after).map(_._3)
        if (c.isEmpty) None else Some(c.min)
      }
      val t1 = firstAfter("view", Long.MinValue)
      val t2 = t1.flatMap(firstAfter("click", _))
      val t3 = t2.flatMap(firstAfter("purchase", _))
      (u, t1.getOrElse(0L), t2.getOrElse(0L), t3.getOrElse(0L),
        if (t3.isDefined) 3L else if (t2.isDefined) 2L
        else if (t1.isDefined) 1L else 0L)
    }
    val got = q("q_event_funnel").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == exp.toSeq)
    assert(got.exists(_._5 == 3L), "fixture should convert some user fully")
    // sf0.001's 15 users all convert (66 events each); the step ordering
    // invariant is the meaningful guard: times strictly increase along
    // the funnel wherever the next step was reached
    got.foreach { case (u, t1, t2, t3, _) =>
      if (t2 > 0) assert(t2 > t1, s"user $u: click not after view")
      if (t3 > 0) assert(t3 > t2, s"user $u: purchase not after click")
    }
  }

  test("PMI collocations equal in-memory reimplementation, both signs present") {
    val texts = graft.sources.Tables.documents(spark, sf)
      .select(col("text")).collect().map(_.getString(0))
    val toks = texts.flatMap(_.split(" "))
    val uni = toks.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val nTok = toks.length.toLong
    val bigrams = texts.flatMap { t =>
      val w = t.split(" "); if (w.length < 2) Nil
      else (0 until w.length - 1).map(i => (w(i), w(i + 1)))
    }
    val c12 = bigrams.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val nBi = bigrams.length.toLong
    val exp = c12.filter(_._2 >= 5).map { case ((w1, w2), c) =>
      val pmi = math.floor(math.log(
        (c.toDouble * nTok.toDouble * nTok.toDouble) /
          (uni(w1).toDouble * uni(w2).toDouble * nBi.toDouble)) * 1e4).toLong
      ((w1, w2), (c, pmi))
    }
    val got = q("q_text_collocations").collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
    assert(got.length == exp.size)
    got.foreach { case (k, v) => assert(exp(k) == v, s"bigram $k") }
    // fixture must exercise both tails: attracted pairs (pmi > 0) and
    // repelled pairs (pmi < 0) — all-one-sign means the signal is dead
    assert(got.exists(_._2._2 > 0L), "no positive-PMI collocation")
    assert(got.exists(_._2._2 < 0L), "no negative-PMI pair")
    // published order is pmi desc with (w1, w2) tiebreak
    val keys = got.map { case ((w1, w2), (_, p)) => (-p, w1, w2) }
    assert(keys.sameElements(keys.sorted), "ordering violated")
  }

  test("weighted sample equals in-memory A-ES keys; both factors matter") {
    def h40(s0: String): Long =
      s0.getBytes("UTF-8").foldLeft(0L)((h, b) =>
        (h * 1000003L + (b & 0xFF)) & 0xFFFFFFFFFFL)
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val keyed = docs.map { case (id, t) =>
      val quality = t.split(" ").distinct.length.toLong
      val key = math.floor(math.log(
        (h40(id.toString).toDouble + 1.0) / 1099511627776.0) * 1e4 /
        quality.toDouble).toLong
      (id, quality, key)
    }
    val exp = keyed.sortBy { case (id, _, k) => (-k, id) }.take(200)
      .zipWithIndex.map { case ((id, qual, k), i) => (i + 1L, id, qual, k) }
    val got = q("q_sample_weighted").collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == exp.toSeq)
    // the draw must reflect BOTH weight and hash: it differs from a pure
    // quality top-200 and from a pure hash top-200
    val byQuality = keyed.sortBy(d => (-d._2, d._1)).take(200).map(_._1).toSet
    val byHash = keyed.sortBy(d => (-h40(d._1.toString), d._1)).take(200)
      .map(_._1).toSet
    val sel = got.map(_._2).toSet
    assert(sel != byQuality, "sample degenerated to top-k by weight")
    assert(sel != byHash, "sample degenerated to unweighted hash sample")
  }

  test("KMV Jaccard equals in-memory bottom-k estimator, lands near exact") {
    def h40(s0: String): Long =
      s0.getBytes("UTF-8").foldLeft(0L)((h, b) =>
        (h * 1000003L + (b & 0xFF)) & 0xFFFFFFFFFFL)
    val k = graft.functions.KmvAgg.K
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    def shingles(t: String): Seq[String] = {
      val w = t.split(" ")
      if (w.length >= 3) (0 until w.length - 2)
        .map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}")
      else Seq(t)
    }
    val sets = docs.groupBy(_._1).map { case (src, ds) =>
      (src, ds.flatMap(d => shingles(d._2)).toSet)
    }
    val sketches = sets.map { case (src, sh) =>
      (src, sh.map(h40).toSeq.distinct.sorted.take(k))
    }
    val exp = (for {
      (sa, setA) <- sets; (sb, setB) <- sets if sa < sb
    } yield {
      val inter = (setA & setB).size.toLong
      val exact = 1000000L * inter / (setA.size + setB.size - inter)
      val (ka, kb) = (sketches(sa), sketches(sb))
      val union = (ka ++ kb).distinct.sorted
      val bk = union.take(k)
      val ei = bk.count(v => ka.contains(v) && kb.contains(v)).toLong
      val est = 1000000L * ei / math.min(k, union.size)
      ((sa, sb), (exact, est))
    }).toMap
    val got = q("q_agg_kmv_jaccard").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3))))
    assert(got.length == exp.size)
    got.foreach { case (kk, v) => assert(exp(kk) == v, s"pair $kk") }
    // estimator quality: within a generous 4σ-ish envelope of exact for
    // every pair (K=64 → stderr ≾ 0.06 at these J levels), and not
    // degenerate (some nonzero estimates)
    got.foreach { case (kk, (exact, est)) =>
      assert(math.abs(exact - est) < 150000L, s"pair $kk: $exact vs $est")
    }
    assert(got.exists(_._2._2 > 0L), "all estimates zero — sketch dead")
  }

  test("retention equals in-memory cohort replay; day-0 is always 1000 pm") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), to_date(col("ts")).as("day"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDate(2).toLocalDate))
    val cohort = ev.filter(_._2 == "signup").groupBy(_._1)
      .map { case (u, xs) => (u, xs.map(_._3).min(Ordering.by((d:
        java.time.LocalDate) => d.toEpochDay))) }
    val act = ev.map(e => (e._1, e._3)).distinct
    val csize = cohort.values.groupBy(identity).map { case (d, v) =>
      (d, v.size.toLong) }
    val exp = act.flatMap { case (u, day) =>
      cohort.get(u).filter(c => !day.isBefore(c))
        .map(c => ((c, day.toEpochDay - c.toEpochDay), u))
    }.groupBy(_._1).map { case ((c, ds), v) =>
      val n = v.map(_._2).distinct.size.toLong
      ((c.toString, ds), (n, csize(c), 1000L * n / csize(c)))
    }
    val got = q("q_event_retention").collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4))))
    assert(got.length == exp.size)
    got.foreach { case (kk, v) => assert(exp(kk) == v, s"cell $kk") }
    // day-0 is definitionally full retention: the signup day is active
    got.filter(_._1._2 == 0L).foreach { case (kk, (_, _, pm)) =>
      assert(pm == 1000L, s"cohort ${kk._1} day-0 at $pm‰")
    }
    assert(got.map(_._1._1).distinct.length > 1, "need multiple cohorts")
  }

  test("DQ report equals hand-recomputed checks; verdicts are mixed") {
    val got = q("q_dq_constraints").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    assert(got.size == 7)
    val ords = graft.sources.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.time.LocalDateTime](2)))
    val custKeys = graft.sources.Tables.customer(spark, sf)
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    val fkBad = ords.count(o => !custKeys(o._2)).toLong
    assert(got("orders_custkey_fk") == ((fkBad, ords.length.toLong, fkBad == 0)))
    val pkDup = (ords.length - ords.map(_._1).distinct.length).toLong
    assert(got("orders_pk_unique") ==
      ((pkDup, ords.length.toLong, pkDup == 0)))
    val lo = java.time.LocalDateTime.parse("1995-01-01T00:00:00")
    val hi = java.time.LocalDateTime.parse("2000-12-31T00:00:00")
    val dateBad = ords.count(o =>
      o._3.isBefore(lo) || o._3.isAfter(hi)).toLong
    assert(got("orders_date_window") ==
      ((dateBad, ords.length.toLong, dateBad == 0)))
    // the fixture genuinely violates the date window and passes the
    // rest — the report must exercise BOTH verdicts
    assert(!got("orders_date_window")._3, "expected a failing check")
    assert(got.values.count(_._3) == 6, "expected six passing checks")
    // every violation count is bounded by its checked count
    got.values.foreach { case (v, n, _) => assert(v >= 0 && v <= n) }
  }

  test("EWMA equals in-memory fold and stays inside the running envelope") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")),
        floor(col("value") * lit(1e6)).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val exp = ev.groupBy(_._1).toSeq.flatMap { case (uid, xs) =>
      var y = 0L
      var first = true
      xs.sortBy(x => (x._3, x._2)).map { case (_, eid, m, v) =>
        y = if (first) { first = false; v } else (3 * y + v) / 4
        (uid, eid, m, v, y)
      }
    }.sortBy(r => (r._1, r._3, r._2))
    val got = q("q_timeseries_ewma").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == exp)
    // convexity: each smoothed value lies within the running min/max of
    // the values seen so far (integer floor can dip at most 1 below)
    got.groupBy(_._1).values.foreach { xs =>
      var lo = Long.MaxValue
      var hi = Long.MinValue
      xs.sortBy(x => (x._3, x._2)).foreach { case (_, _, _, v, y) =>
        lo = math.min(lo, v); hi = math.max(hi, v)
        assert(y >= lo - 1 && y <= hi, s"ewma $y outside [$lo,$hi]")
      }
    }
  }

  test("Holt level/trend equals the in-memory truncating-div fold") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")),
        floor(col("value") * lit(1e6)).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val exp = ev.groupBy(_._1).toSeq.flatMap { case (uid, xs) =>
      var l = 0L
      var b = 0L
      var first = true
      xs.sortBy(x => (x._3, x._2)).map { case (_, eid, m, v) =>
        if (first) { first = false; l = v; b = 0L }
        else {
          val l2 = (v + 3L * (l + b)) / 4L
          b = ((l2 - l) + 3L * b) / 4L
          l = l2
        }
        (uid, eid, m, v, l, b)
      }
    }.sortBy(r => (r._1, r._3, r._2))
    val got = q("q_timeseries_holt").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == exp)
    // the trend must go negative somewhere on real data, or the
    // negative-division agreement this operator pins (Scala / and
    // DuckDB // both truncate toward zero) was never exercised
    assert(got.exists(_._6 < 0L), "no negative trend — sign path idle")
    // first event per user: level = value, trend = 0
    got.groupBy(_._1).values.foreach { xs =>
      val h = xs.minBy(x => (x._3, x._2))
      assert(h._5 == h._4 && h._6 == 0L)
    }
  }

  test("CUSUM alarms equal the in-memory accumulate/alarm/reset fold") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")),
        floor(col("value") * lit(1e6)).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val exp = ev.groupBy(_._1).map { case (uid, xs) =>
      val vs = xs.sortBy(x => (x._3, x._2)).map(_._4)
      val n = vs.length.toLong
      val tgt = vs.sum / n
      var sAcc = 0L
      var alarms = 0L
      var mx = 0L
      vs.foreach { v =>
        val s1 = math.max(0L, sAcc + v - tgt - tgt / 10L)
        mx = math.max(mx, s1)
        if (s1 > 4L * tgt) { alarms += 1; sAcc = 0L } else sAcc = s1
      }
      (uid, (n, tgt, alarms, mx))
    }
    val got = q("q_drift_cusum").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))))
    assert(got.length == exp.size)
    got.foreach { case (uid, row) =>
      assert(row == exp(uid), s"user $uid cusum state") }
    // the detector must fire on this fixture, and max_s must dominate
    // the alarm threshold exactly when an alarm fired
    assert(got.exists(_._2._3 > 0L), "no CUSUM alarms — detector idle")
    got.foreach { case (uid, (_, tgt, alarms, mx)) =>
      if (alarms > 0) assert(mx > 4L * tgt, s"user $uid alarm without peak")
      else assert(mx <= 4L * tgt, s"user $uid peak without alarm")
    }
  }

  test("TPC-H analogues return ranked, region-consistent rows") {
    val q3 = q("q_tpch_q3").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(q3.length == 10)
    assert(q3.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
      "Q3 must rank by revenue descending")
    val q5 = q("q_tpch_q5").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(q5.nonEmpty && q5.forall(_._2 > 0))
    // every reported nation must actually sit in the filtered region
    val afr = graft.sources.Tables.nation(spark, sf)
      .join(graft.sources.Tables.region(spark, sf)
        .where(col("r_name") === "AFRICA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_name")).collect().map(_.getString(0)).toSet
    q5.foreach { case (n, _) => assert(afr(n), s"nation $n not in AFRICA") }
  }

  test("water-filling spends the budget up to integer slack, never over") {
    val rows = q("q_mix_waterfill").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val totalAvail = rows.map(_._2).sum
    val budget = totalAvail * 3 / 5
    val spent = rows.map(_._3).sum
    assert(spent <= budget, "allocation must never exceed the budget")
    assert(budget - spent < rows.length.toLong,
      "unspent slack must stay below one token per domain")
    rows.foreach { case (src, avail, alloc, ratePm) =>
      assert(alloc <= avail, s"$src allocated more than available")
      assert(ratePm == 1000L * alloc / avail)
    }
    // capped domains all sit at one common threshold (water level)
    val capped = rows.filter(t => t._3 < t._2).map(_._3).distinct
    assert(capped.length <= 1,
      s"all capped domains share one threshold, got $capped")
    // at a 60% budget some domain must actually be capped
    assert(rows.exists(t => t._3 < t._2), "no domain saturated the level")
  }

  test("prefix-filter join equals brute-force shingle-set Jaccard >= 1/2") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val w = r.getString(1).split(" ", -1)
        val sh =
          if (w.length >= 3) w.sliding(3).map(_.mkString(" ")).toSet
          else Set(w.mkString(" "))
        r.getLong(0) -> sh
      }
    val expected = (for {
      (a, ta) <- docs; (b, tb) <- docs if a < b
      inter = (ta & tb).size
      if 3L * inter >= ta.size + tb.size
    } yield (a, b, inter.toLong, ta.size.toLong, tb.size.toLong)).toSet
    val got = q("q_dedup_prefix_filter").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    assert(got.nonEmpty, "prefix filter must not be vacuous on the fixture")
  }

  test("robust scaling equals an in-memory quartile reimplementation") {
    val rows = q("q_text_robust_scale").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 500)
    // exact-percentile with linear interpolation, the definition both
    // engines implement: h = (n-1)p, lo + (hi-lo)·frac
    def pct(sorted: Array[Long], p: Double): Double = {
      val h = (sorted.length - 1) * p
      val lo = sorted(h.toInt)
      val hi = sorted(math.ceil(h).toInt)
      lo + (hi - lo) * (h - h.toInt)
    }
    rows.groupBy(_._2).foreach { case (src, ds) =>
      val sorted = ds.map(_._3).sorted
      val (q1, med, q3) =
        (pct(sorted, 0.25), pct(sorted, 0.5), pct(sorted, 0.75))
      ds.foreach { case (id, _, nTok, rzPm) =>
        val expected =
          if (q3 > q1) math.floor(1000.0 * (nTok - med) / (q3 - q1)).toLong
          else 0L
        assert(rzPm == expected, s"$src doc $id: $rzPm != $expected")
      }
    }
  }

  test("calibration bins equal an in-memory replay; both polarities hit") {
    val rows = graft.sources.Tables.documents(spark, sf)
      .select(col("text")).collect().map { r =>
        val w = r.getString(0).split(" ", -1)
        val score = w.map { t =>
          val a = if (t.isEmpty) 0L else t.charAt(0).toLong
          ((((a * 31 + t.length) % 64 + 1) * 2654435761L) >> 16) % 2001 - 1000
        }.sum
        val pos = w.distinct.length.toDouble / w.length.toDouble > 0.45
        (math.max(-5L, math.min(5L, Math.floorDiv(score, 200L))), pos)
      }
    val expected = rows.groupBy(_._1).map { case (b, ds) =>
      val nPos = ds.count(_._2).toLong
      (b, ds.length.toLong, nPos, 1000L * nPos / ds.length)
    }.toSet
    val got = q("q_audit_calibration").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    assert(got.exists(_._1 < 0) && got.exists(_._1 > 0),
      "scores must populate both polarities")
  }

  test("split JS divergence equals an in-memory replay and is near zero") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def hb(id: Long): Long = {
      val v = (((id % 1048576) * 2654435761L) >> 16) % 1000
      if (v < 0) v + 1000 else v
    }
    val toks = docs.filter(d => hb(d._1) < 990).flatMap { case (id, t) =>
      t.split(" ", -1).map(w => (w, hb(id) < 980))
    }
    val cnt = toks.groupBy(_._1).view.mapValues { ws =>
      (ws.count(_._2).toLong, ws.count(!_._2).toLong)
    }.toMap
    val np = cnt.values.map(_._1).sum
    val nq = cnt.values.map(_._2).sum
    def q6(x: Double): Long = math.floor(math.log(x) * 1e6).toLong
    var (jsA, jsB) = (0L, 0L)
    cnt.values.foreach { case (cp, cq) =>
      val mix = (cp * nq + cq * np).toDouble
      if (cp > 0) jsA += cp * (q6(2.0 * cp * nq) - q6(mix))
      if (cq > 0) jsB += cq * (q6(2.0 * cq * np) - q6(mix))
    }
    val r = q("q_split_divergence").head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((np, nq, jsA, jsB)), s"got $r expected ($np,$nq,$jsA,$jsB)")
    // a hash split of one word soup should be nearly balanced: JS in
    // nats = jsA/(2·np·1e6) + jsB/(2·nq·1e6), bounded by ln 2
    val js = jsA.toDouble / (2e6 * np) + jsB.toDouble / (2e6 * nq)
    assert(js >= -1e-6 && js < 0.1, s"suspicious divergence $js")
  }

  test("per-group sample keeps exactly the k hash-smallest of each source") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def hs(id: Long): Long = (((id % 1048576) * 2654435761L) >> 16) % 1048576
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      ds.map(d => (src, d._1, hs(d._1)))
        .sortBy(t => (t._3, t._2)).take(5)
    }.toSet
    val got = q("q_sample_per_group").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    got.groupBy(_._1).foreach { case (src, s) =>
      assert(s.size == 5, s"$src: exactly 5 rows")
    }
  }

  test("bloom novelty lower-bounds exact novelty, within the FP envelope") {
    val exact = q("q_curation_novelty").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val bloom = q("q_curation_novelty_bloom").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(bloom.length == exact.size, "same candidate coverage")
    bloom.foreach { case (id, nSh, nb) =>
      val (eSh, eNov) = exact(id)
      assert(nSh == eSh, s"doc $id shingle count")
      // a bloom miss is a certain novelty: never OVER-counts
      assert(nb <= eNov, s"doc $id: bloom $nb exceeds exact $eNov")
    }
    val (sumB, sumE) = (bloom.map(_._3).sum, exact.values.map(_._2).sum)
    assert(sumE > 0 && sumB * 10 >= sumE * 9,
      s"aggregate bloom novelty $sumB under 90% of exact $sumE — " +
        "filter undersized or saturated")
  }

  test("in-batch negatives equal an in-memory replay; exclusion fires") {
    val ids = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val nd = q("q_dedup_ngram_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def batch(id: Long): Long = (((id % 1048576) * 2654435761L) >> 16) % 4
    val byBatch = ids.groupBy(batch)
    val expected = byBatch.map { case (bk, ds) =>
      val cand = for (a <- ds; b <- ds if a < b) yield (a, b)
      val (dup, kept) = cand.partition(nd.contains)
      (bk, ds.length.toLong, kept.length.toLong, dup.length.toLong,
        kept.map { case (a, b) => a * 100003L + b }.sum)
    }.toSet
    val got = q("q_sample_negatives").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(2)} extra=${(got -- expected).take(2)}")
    assert(got.map(_._4).sum > 0,
      "the near-dup exclusion must fire on the fixture (else vacuous)")
    assert(got.forall(_._3 > 0), "every batch yields negative pairs")
  }

  test("cluster-keyed split never straddles a near-dup pair; doc-keyed does") {
    val asg = q("q_split_leakage").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val pairs = q("q_dedup_ngram_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(asg.size.toLong == nDocs, "every document is assigned")
    assert(asg.values.map(_._2).toSet == Set("train", "valid", "test"),
      "all three splits are populated")
    // THE property: both endpoints of every near-dup pair share a split
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(asg(a)._2 == asg(b)._2, s"pair ($a,$b) straddles splits")
      assert(asg(a)._1 == asg(b)._1, "near-dup pair in different clusters")
    }
    // split is a pure function of the cluster canonical
    asg.values.groupBy(_._1).foreach { case (k, vs) =>
      assert(vs.map(_._2).toSet.size == 1, s"cluster $k split-inconsistent")
    }
    // the contrast: the SAME hash applied to doc_id (q_split_assign's
    // shape at 80/10/10) leaks eval data through near-dup twins
    def docSplit(id: Long): Int = {
      val hb = (((id % 1048576) * 2654435761L) >> 16) % 1000
      if (hb < 800) 0 else if (hb < 900) 1 else 2
    }
    assert(pairs.exists { case (a, b) => docSplit(a) != docSplit(b) },
      "fixture must demonstrate the doc-keyed straddle the operator fixes")
  }

  test("zipf slope equals an in-memory integer OLS over quantized logs") {
    val toks = graft.sources.Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).split(" ", -1).map(r.getString(0) -> _))
    val bySource = toks.groupBy(_._1)
    val rows = q("q_text_zipf").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows.keySet == bySource.keySet)
    bySource.foreach { case (src, ws) =>
      val cnt = ws.groupBy(_._2).view.mapValues(_.length.toLong).toSeq
        .sortBy { case (w, c) => (-c, w) }
      val qs = cnt.zipWithIndex.map { case ((_, c), i) =>
        (math.floor(math.log((i + 1).toDouble) * 1000).toLong,
          math.floor(math.log(c.toDouble) * 1000).toLong)
      }
      val n = qs.length.toLong
      val (sx, sy) = (qs.map(_._1).sum, qs.map(_._2).sum)
      val sxx = qs.map(p => p._1 * p._1).sum
      val sxy = qs.map(p => p._1 * p._2).sum
      val num = 1000L * (n * sxy - sx * sy)
      val den = n * sxx - sx * sx
      val slope = Math.floorDiv(num, den)
      val (nTypes, nTok, slopePm) = rows(src)
      assert(nTypes == n && nTok == ws.length.toLong)
      assert(slopePm == slope, s"$src: $slopePm != $slope")
      assert(slopePm < 0, "rank-frequency slope must be negative")
    }
  }

  test("novelty equals an in-memory reference-set diff, both tails present") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def sh(t: String): Set[String] = {
      val w = t.split(" ", -1)
      if (w.length >= 3) w.sliding(3).map(_.mkString(" ")).toSet
      else Set(w.mkString(" "))
    }
    val ref = docs.filter(_._2 == "src0").flatMap(d => sh(d._3)).toSet
    val expected = docs.filter(_._2 != "src0").map { case (id, _, t) =>
      val ss = sh(t)
      val nov = ss.count(!ref.contains(_)).toLong
      (id, ss.size.toLong, nov, 1000L * nov / ss.size)
    }.toSet
    val got = q("q_curation_novelty").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    assert(got.exists(_._3 > 0), "some document must carry novel shingles")
    assert(got.exists(r => r._3 < r._2),
      "some document must overlap the reference")
  }

  test("blocklist counts equal an in-memory position scan; non-vacuous") {
    val pats = graft.operators.TextAnalysis.BlocklistPatterns
    val texts = graft.sources.Tables.documents(spark, sf)
      .select(col("text")).collect().map(_.getString(0))
    // independent reimplementation: count ALL match positions
    // (overlapping included) by direct scan, not via the automaton
    val expected = pats.map { p =>
      var docs = 0L
      var hits = 0L
      texts.foreach { t =>
        var i = t.indexOf(p)
        var h = 0L
        while (i >= 0) { h += 1; i = t.indexOf(p, i + 1) }
        if (h > 0) docs += 1
        hits += h
      }
      (p, docs, hits)
    }.sortBy(_._1)
    val got = q("q_text_blocklist").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected, s"got=$got expected=$expected")
    assert(got.forall(_._3 > 0),
      "every blocklist pattern must match at least once on the fixture")
  }

  test("overlapping and nested patterns count per the automaton semantics") {
    import graft.functions.TextFunctions.multi_pattern_counts
    import spark.implicits._
    // "aa" in "aaaa" matches at 3 end positions (overlap); "ab" nests
    // inside "aab"; dictionary-suffix closure must credit both when
    // "aab" ends ("ab" ends at the same byte)
    val df = Seq("aaaa", "xaabx").toDF("text")
    val rows = df.select(
        multi_pattern_counts(col("text"), Seq("aa", "ab", "aab")).as("c"))
      .collect().map(_.getSeq[Long](0))
    assert(rows(0) == Seq(3L, 0L, 0L), s"got ${rows(0)}")
    assert(rows(1) == Seq(1L, 1L, 1L), s"got ${rows(1)}")
  }

  test("sanitize fixes exactly the injected taint classes, non-vacuously") {
    val rows = q("q_text_sanitize")
      .select("kind", "changed", "len_dirty", "len_clean", "clean")
      .collect()
    assert(rows.length >= 4)
    rows.foreach { r =>
      val (kind, changed) = (r.getLong(0), r.getLong(1))
      val (ld, lc, clean) = (r.getLong(2), r.getLong(3), r.getString(4))
      kind match {
        case 0 => // combining mark composes: 1 char shorter, é present
          assert(changed == 1L && lc == ld - 1 &&
            clean.contains("caf\u00E9"))
        case 1 => // ZWSP + BOM stripped: 2 chars shorter
          assert(changed == 1L && lc == ld - 2 && clean.endsWith("zerowidthmark"))
        case 2 => // BEL + VT stripped: 2 chars shorter
          assert(changed == 1L && lc == ld - 2 && clean.endsWith("ctrlbellvt"))
        case _ => // clean ASCII passes through untouched
          assert(changed == 0L && lc == ld)
      }
      assert(!clean.exists(c => Character.getType(c) == Character.FORMAT ||
        (Character.isISOControl(c) && c != '\n' && c != '\t')),
        s"residual invisible char in: $clean")
    }
  }

  test("nfc_normalize is the JDK NFC and keeps already-normalized input") {
    import graft.functions.TextFunctions.nfc_normalize
    import spark.implicits._
    val cases = Seq(
      "cafe\u0301",   // e + combining acute -> \u00E9
      "A\u030AB",     // A + combining ring -> \u00C5
      "\u00C5",       // already composed stays
      "plain ascii")
    val got = cases.toDF("t").select(nfc_normalize(col("t")))
      .collect().map(_.getString(0))
    val want = cases.map(java.text.Normalizer.normalize(_,
      java.text.Normalizer.Form.NFC))
    assert(got.toSeq == want)
    assert(got(0) == "caf\u00E9" && got(1) == "\u00C5B")
  }

  test("incremental stats merge equals the one-scan recompute in-engine") {
    val merged = q("q_agg_incremental").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val direct = graft.sources.Tables.documents(spark, sf)
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("s"),
        sum(col("n") * col("n")).as("q"))
      .withColumn("m", expr("(1000000 * s) div n_docs"))
      .orderBy(col("source")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(merged == direct)
    assert(merged.map(_._2).sum ==
      graft.sources.Tables.documents(spark, sf).count())
  }

  test("length-sorted batching strictly beats arrival order on padding") {
    val byStrat = q("q_pack_padding").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val langs = byStrat.keys.map(_._2).toSet
    assert(langs.size >= 2, "fixture should have multiple languages")
    langs.foreach { l =>
      val (abat, adoc, atok, apad) = byStrat(("arrival", l))
      val (bbat, bdoc, btok, bpad) = byStrat(("length", l))
      // same docs, same batches, same real tokens — only padding moves
      assert(abat == bbat && adoc == bdoc && atok == btok)
      assert(bpad < apad,
        s"length-sorted should waste less: lang=$l $bpad vs $apad")
      assert(apad >= 0 && bpad >= 0)
    }
  }

  test("RAKE top-20 equals an in-memory reimplementation end to end") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1).split(" ").toSeq))
    // corpus-derived stoplist: 10 most frequent (count desc, token asc)
    val stops = docs.flatMap(_._2).groupBy(identity).view
      .mapValues(_.size).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(10).map(_._1).toSet
    // islands of non-stop tokens, capped at 4 members
    val phrases = docs.flatMap { case (_, toks) =>
      val runs = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
      var cur = scala.collection.mutable.ArrayBuffer.empty[String]
      toks.foreach { t =>
        if (stops(t)) { if (cur.nonEmpty) runs += cur.toSeq; cur.clear() }
        else cur += t
      }
      if (cur.nonEmpty) runs += cur.toSeq
      runs.toSeq
    }.filter(_.size <= 4)
    val freq = phrases.flatten.groupBy(identity).view.mapValues(_.size.toLong)
    val degree = phrases.flatMap(p => p.map(_ -> p.size.toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
    def score(p: Seq[String]): Long =
      p.map(w => 1000L * degree(w) / freq(w)).sum
    val expected = phrases.groupBy(_.mkString(" ")).map { case (s, occ) =>
      (s, occ.head.size.toLong, occ.size.toLong, score(occ.head))
    }.toSeq.sortBy { case (s, _, _, sc) => (-sc, s) }.take(20)
    val got = q("q_text_rake").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected, s"first diff: ${
      got.zip(expected).find(p => p._1 != p._2)}")
    assert(got.exists(_._2 > 1), "multi-token phrases must surface")
    assert(phrases.nonEmpty && stops.size == 10)
  }

  test("MIPS top-5 equals in-memory; augmented-cosine order = ip order") {
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def ip(a: Array[Double], b: Array[Double]): BigDecimal =
      a.zip(b).map { case (x, y) =>
        BigDecimal(x * y).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }.sum
    val corpus = vecs.filter(_._1 >= 3)
    val m2 = corpus.values.map(v => ip(v, v).toDouble).max
    val got = q("q_sim_mips").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
    assert(got.length == 15)
    (0L until 3L).foreach { qid =>
      val qv = vecs(qid)
      val ranked = corpus.toSeq
        .map { case (id, v) => (id, ip(qv, v)) }
        .sortBy { case (id, s) => (-s, id) }
      val expTop = ranked.take(5).map(_._1)
      val gotTop = got.filter(_._1 == qid).sortBy(_._5).map(_._2).toSeq
      assert(gotTop == expTop, s"query $qid top-5 mismatch")
    }
    // the augmentation certificate: aug_resid_q = M²_q − ‖x‖²_q is the
    // squared augmented dimension — nonnegative everywhere, and the
    // augmented vectors all have squared norm M² exactly (‖x‖² +
    // resid), which is WHY cosine order against the zero-extended
    // query equals inner-product order (the denominator ‖q‖·M is
    // constant per query — algebraic, no float comparison needed)
    val m2q = math.floor(m2 * 1e6).toLong
    got.foreach { case (_, id, _, resid, _) =>
      val n2q = math.floor(ip(vecs(id), vecs(id)).toDouble * 1e6).toLong
      assert(resid == m2q - n2q && resid >= 0, s"residual of vec $id")
    }
    assert(got.map(_._4).distinct.length > 1,
      "corpus norms vary — MIPS is not cosine on this fixture")
  }

  test("BFS distances equal an in-memory BFS over the chunk-share graph") {
    val got = q("q_graph_bfs").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // rebuild the capped chunk-share graph from the same compiled kernel
    import graft.functions.TextFunctions.cdc_chunk_codes
    val posting = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(cdc_chunk_codes(col("text"))).as("code"))
      .select(col("doc_id"), expr("code % 1099511627776").as("h"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byChunk = posting.groupBy(_._2)
      .filter { case (_, ds) => ds.length >= 2 && ds.length <= 16 }
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    byChunk.values.foreach { ds =>
      val ids = ds.map(_._1)
      for (a <- ids; b <- ids if a != b) adj(a) = adj(a) + b
    }
    val seeds = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0))
      .filter(_ % 50 == 0)
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds.toSet
    for (round <- 1 to 6 if frontier.nonEmpty) {
      val fresh = frontier.flatMap(adj) -- dist.keySet
      dist = dist ++ fresh.map(_ -> round.toLong)
      frontier = fresh
    }
    assert(got == dist, "frontier BFS must equal the in-memory walk")
    // non-vacuity: the fixture graph genuinely chains past hop 1, so
    // every round of the frontier loop does real work
    assert(got.values.exists(_ >= 2L),
      "chunk-share graph must reach depth >= 2 — seed choice vacuous")
    assert(got.size > seeds.length, "BFS must reach beyond the seed set")
  }

  test("index probe equals a corpus-scan AND query, non-vacuously") {
    val got = q("q_text_index_query").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // in-memory: tokenize, pick the 3 rarest terms, intersect
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSeq))
    val df = docs.flatMap { case (_, ts) => ts.distinct }
      .groupBy(identity).map { case (t, o) => (t, o.length) }
    val floor = math.max(5, df.values.max / 100)
    val terms = df.toSeq.filter(_._2 >= floor)
      .sortBy { case (t, n) => (n, t) }.take(3).map(_._1)
    val expected = docs.flatMap { case (id, ts) =>
      val hits = ts.filter(terms.contains)
      if (terms.forall(ts.contains)) Some(id -> hits.length.toLong)
      else None
    }.toMap
    assert(got == expected, "index answer must equal the scan answer")
    assert(got.nonEmpty, "conjunctive query must match some docs")
    assert(got.size < docs.length,
      "rarest-term conjunction must be selective")
  }

  test("ACF equals an in-memory replay; lag-0 identity holds") {
    val daily = graft.sources.Tables.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .orderBy(col("day")).collect().map(_.getLong(1))
    val n = daily.length
    val s0 = daily.sum
    val y = daily.map(x => n * x - s0)
    val den = y.map(v => v * v).sum
    def floorDiv(a: Long, b: Long): Long = Math.floorDiv(a, b)
    val expected = (1 to 7).map { k =>
      val num = (0 until n - k).map(t => y(t) * y(t + k)).sum
      (k.toLong, (n - k).toLong, floorDiv(1000L * num, den))
    }
    val got = q("q_timeseries_acf").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected, "ACF must equal the in-memory series replay")
    // normalization sanity: |acf| ≤ 1000 at every lag (Cauchy–Schwarz
    // on the shared-denominator estimator)
    assert(got.forall(t => t._3.abs <= 1000))
    assert(got.map(_._3).distinct.length > 1,
      "a flat ACF across all lags would be a degenerate series")
  }

  test("key-grouped layout returns the same rows as the range layout") {
    // layout is an ACCESS PATH: same (rows, parts) must yield identical
    // data whether partitions are contiguous ranges or mod-residue
    // classes (and the part column is consistent with id in both)
    def load(layout: String) =
      spark.read.format("graft.sources.GraftSynthSource")
        .option("rows", "5000").option("parts", "8")
        .option("layout", layout).load()
        .select("id", "bucket", "tok", "part")
    val range = load("range").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    val mod = load("mod").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    assert(range.sortBy(_._1).toSeq == mod.sortBy(_._1).toSeq)
    assert(mod.length == 5000)
    assert(mod.forall { case (id, _, _, p) => p == (id % 8).toInt })
  }

  test("grid spatial join equals the quadratic scan, each pair once") {
    val ids = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey")).collect().map(_.getLong(0))
    val pts = ids.map { k =>
      (k, ((k * 2654435761L) % 2147483648L) % 1000,
        ((k * 1540483477L) % 2147483648L) % 1000)
    }
    val expected = (for {
      a <- pts; b <- pts
      if a._1 < b._1
      d = math.max(math.abs(a._2 - b._2), math.abs(a._3 - b._3))
      if d <= 25
    } yield (a._1, b._1, d)).sortBy(t => (t._1, t._2)).toSeq
    val got = q("q_join_spatial").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected, "grid-pruned pairs must equal brute force")
    assert(got.nonEmpty, "fixture plane must contain close pairs")
    // exactly-once: no pair may surface via two probe offsets
    assert(got.map(t => (t._1, t._2)).distinct.length == got.length)
  }

  test("bootstrap CI equals an in-memory Poisson-weight replay") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"),
        floor(col("value") * lit(1e6)).cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def w(id: Long, r: Int): Long = {
      val u = ((id * 2654435761L + r * 1540483477L) % 2147483648L) % 1000
      if (u < 368) 0 else if (u < 736) 1 else if (u < 920) 2
      else if (u < 981) 3 else if (u < 996) 4 else 5
    }
    val expected = ev.groupBy(_._1).toSeq.map { case (tpe, es) =>
      val n = es.length.toLong
      val mean = es.map(_._3).sum / n
      val ms = (0 until 32).map { r =>
        val (sw, swv) = es.foldLeft((0L, 0L)) { case ((a, b), e) =>
          val k = w(e._2, r); (a + k, b + k * e._3)
        }
        swv / sw
      }.sorted
      (tpe, n, mean, ms(1), ms(30))
    }.sortBy(_._1)
    val got = q("q_audit_bootstrap").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected, "CI must equal the in-memory replay")
    got.foreach { case (tpe, _, mean, lo, hi) =>
      assert(lo < hi, s"$tpe: degenerate interval")
      assert(lo <= mean && mean <= hi,
        s"$tpe: point estimate outside its own ~94% interval")
    }
  }

  test("TextRank equals an in-memory weighted PageRank replay") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("text")).collect().map(_.getString(0).split(" ").toSeq)
    val pairs = docs.flatMap { ts =>
      ts.sliding(2).filter(_.length == 2).map(p => (p(0), p(1))) ++
        ts.sliding(3).filter(_.length == 3).map(p => (p(0), p(2)))
    }.filter(p => p._1 != p._2)
      .map(p => if (p._1 < p._2) p else p.swap)
    val cw = pairs.groupBy(identity).map { case (p, o) =>
      (p._1, p._2, o.length.toLong) }
    val edges = cw.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
    val strength = edges.groupBy(_._1)
      .map { case (a, es) => (a, es.map(_._3).sum) }
    val vocab = docs.flatten.distinct.sorted
    val base = 1000000000L / vocab.length
    val tele = 15L * base / 100L
    var r = vocab.map(_ -> base).toMap
    for (_ <- 1 to 5) {
      val mass = edges.groupBy(_._2).map { case (dst, es) =>
        (dst, es.map { case (src, _, w) => r(src) * w / strength(src) }.sum)
      }
      r = vocab.map(t => t -> (tele + 85L * mass.getOrElse(t, 0L) / 100L))
        .toMap
    }
    val expected = vocab
      .map(t => (t, r(t), strength.getOrElse(t, 0L)))
      .sortBy { case (t, rk, _) => (-rk, t) }.take(10).toSeq
    val got = q("q_text_textrank").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSeq
    assert(got == expected, "top-10 must equal the in-memory replay")
    assert(got.map(_._2).distinct.length > 1,
      "a flat rank vector would make centrality vacuous")
  }

  test("event trigram mining equals an in-memory sequential count") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val tri = ev.groupBy(_._1).toSeq.flatMap { case (uid, es) =>
      val types = es.sortBy(e => (e._2, e._3)).map(_._4)
      types.sliding(3).filter(_.length == 3)
        .map(w => (uid, w.mkString(">"))).toSeq
    }
    val expected = tri.groupBy(_._2).map { case (s, o) =>
      (s, o.length.toLong, o.map(_._1).distinct.length.toLong)
    }.toSeq
      .sortBy { case (s, n, sup) => (-sup, -n, s) }.take(20)
    val got = q("q_event_seqmine").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected, "top-20 trigrams must match the replay")
    assert(got.exists(_._1.split(">").distinct.length > 1),
      "mixed-type sequences must surface")
  }
}
