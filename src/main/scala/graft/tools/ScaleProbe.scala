package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Scale-stress probe: measures, instead of arguing, how the flagship
  * curation pipeline and its hardest operators behave ABOVE fixture
  * scale — the analogue of the reference's whole reason to exist
  * (measure the I/O story, /root/reference/main.cc:107-113, 327-335),
  * pointed at our own 100 TB design claims.
  *
  * A deterministic corpus amplifier (pure Spark generation, no RNG, no
  * new fixtures) expands the sf0.1 documents table ×F with CONTROLLED
  * duplicate structure, keyed by base doc_id % 10:
  *   - fam 0: every replica keeps the base text verbatim → exact-dup
  *     clusters of size F (exercises the exact-dedup window);
  *   - fam 1: replicas 0-4 append a one-token suffix → near-dup
  *     CLIQUES of size min(F, 5) (bounded so candidate-pair volume
  *     stays O(F·docs), not O(F²·docs));
  *   - fam 2: replaced by synthetic CHAIN docs — replica r's text is a
  *     41-token sliding window (stride 10) over a per-base token
  *     stream, so consecutive replicas share 29 of ~40 trigram
  *     shingles (J ≈ 0.57 > 0.5) and skip-replicas share 19 (J ≈ 0.31
  *     < 0.5): a near-dup CHAIN of length F per base doc, the
  *     diameter-F component shape web-scale pair graphs exhibit;
  *   - fams 3-9: every 3rd token is tagged with the replica id, so
  *     replicas share no shingle → unique documents (volume filler).
  * Every document carries a "the" stopword and ≥30 distinct-enough
  * tokens where its family requires surviving the quality funnel.
  *
  * Probe sections (each emits one JSON line; all lines also land in
  * target/scale.json):
  *   1. pipeline  — q_pipeline_e2e end-to-end at ×1/×10/×100: wall,
  *     shuffle read/write bytes, spill, peak task memory, output rows;
  *   2. cc_corpus — both CC variants over the amplified corpus's real
  *     candidate-pair graph; label histograms asserted identical;
  *   3. cc_chain  — both CC variants over synthetic chain graphs
  *     (100k nodes; chain length 100 vs 10k) — the diameter-dominated
  *     regime SURVEY §2b predicts large/small-star wins;
  *   4. topk      — TopKPerGroupExec vs the window fallback over the
  *     amplified corpus at high group cardinality (budget path live).
  *
  * Usage: `sbt "runMain graft.tools.ScaleProbe [maxFactor]"` (default
  * 100; pass 10 for a quick pass). SPARK_DRIVER_MEM=24g recommended
  * for ×100.
  */
object ScaleProbe {

  /** Aggregates per-stage executor metrics between resets — the
    * shuffle/spill evidence the wall clock alone doesn't carry. */
  final class StageAgg extends SparkListener {
    val shufWrite = new AtomicLong
    val shufRead = new AtomicLong
    val spill = new AtomicLong
    val peakMem = new AtomicLong
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val m = e.stageInfo.taskMetrics
      if (m != null) {
        shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
        peakMem.getAndUpdate(p => math.max(p, m.peakExecutionMemory))
      }
    }
    def reset(): Unit = {
      shufWrite.set(0); shufRead.set(0); spill.set(0); peakMem.set(0)
    }
  }

  private val lines = Seq.newBuilder[String]

  private def emit(line: String): Unit = {
    println(line)
    lines += line
  }

  /** Time `body`, then snapshot the stage aggregator (bus drained
    * first so late stage-completed events are counted). */
  private def measured[A](s: SparkSession, agg: StageAgg)(body: => A)
      : (A, Double, Long, Long, Long, Long) = {
    org.apache.spark.sql.graftbridge.Bridge.waitListenerBus(s, 10000)
    agg.reset()
    val t0 = System.nanoTime()
    val a = body
    val dt = (System.nanoTime() - t0) / 1e9
    org.apache.spark.sql.graftbridge.Bridge.waitListenerBus(s, 10000)
    (a, dt, agg.shufWrite.get, agg.shufRead.get, agg.spill.get,
      agg.peakMem.get)
  }

  /** The deterministic ×`factor` amplifier. Returns the corpus dir. */
  private[graft] def amplify(s: SparkSession, d: String, factor: Int,
      outBase: String): String = {
    val out = s"$outBase/x$factor"
    val marker = new org.apache.hadoop.fs.Path(
      s"$out/documents.parquet/_SUCCESS")
    if (marker.getFileSystem(s.sparkContext.hadoopConfiguration)
        .exists(marker)) return out
    val reps = s.range(factor).select(col("id").as("r"))
    val base = Tables.documents(s, d)
    val fam = pmod(col("doc_id"), lit(10L))
    val regular = base.where(fam =!= 2).crossJoin(reps)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("text2",
        when(fam === 0, col("text"))
          .when(fam === 1 && col("r") < 5,
            concat(col("text"), lit(" v"), col("r")))
          .otherwise(expr(
            "array_join(transform(toks, (t, i) -> " +
              "IF(i % 3 = 0, concat('r', CAST(r AS STRING), '_', t), t))," +
              " ' ')")))
      .select((col("doc_id") * factor + col("r")).as("doc_id"),
        col("text2").as("text"), col("lang"), col("source"),
        length(col("text2")).cast("long").as("n_chars"))
    val chains = base.where(fam === 2)
      .select(col("doc_id"), col("lang"), col("source"))
      .crossJoin(reps)
      .withColumn("text", expr(
        "concat('the ', array_join(transform(" +
          "sequence(r * 10, r * 10 + 40), " +
          "i -> concat('t', CAST(doc_id AS STRING), 'x'," +
          " CAST(i AS STRING))), ' '))"))
      .select((col("doc_id") * factor + col("r")).as("doc_id"),
        col("text"), col("lang"), col("source"),
        length(col("text")).cast("long").as("n_chars"))
    regular.unionByName(chains)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    out
  }

  /** Deterministic ×`factor` EMBEDDING amplifier, keyed by vec_id % 10:
    * fam 0 → every replica keeps the base vector verbatim (exact-dup
    * clusters of size F, cos = 1); fam 1, r < 5 → one coordinate scaled
    * 1.05 (near-dup cliques, cos ≈ 0.9988 — above any SRP band's miss
    * probability at the probed bit widths); everything else → per-replica
    * deterministic sign flips (xxhash64 of (new_id, dim)), pairwise
    * ~orthogonal unique vectors. No RNG: reruns produce byte-identical
    * corpora.
    *
    * The flip hash must NOT be the Knuth bit-16 family: that is the SRP
    * hyperplane family itself (SrpBandKeys.weight is bit16((p·64+j)·c),
    * and a flip pattern keyed bit16((nid·64+j)·c) IS plane nid's weight
    * row), so flipped vectors self-interfere with the LSH — measured at
    * ×100: 5,000-vector band cells, 55k vectors over the bucket cap in
    * all 64 bands, 70 planted clusters invisible. An independent hash
    * family restores the isotropy the unique fill is supposed to have —
    * the same independence requirement any production pipeline has
    * between its sharding hash and its LSH hash. */
  private[graft] def amplifyEmbeddings(s: SparkSession, d: String,
      factor: Int, outBase: String): String = {
    val out = s"$outBase/emb_x$factor"
    val marker = new org.apache.hadoop.fs.Path(
      s"$out/embeddings.parquet/_SUCCESS")
    if (marker.getFileSystem(s.sparkContext.hadoopConfiguration)
        .exists(marker)) return out
    val reps = s.range(factor).select(col("id").as("r"))
    val fam = pmod(col("vec_id"), lit(10L))
    Tables.embeddings(s, d).crossJoin(reps)
      .withColumn("nid", col("vec_id") * factor + col("r"))
      .withColumn("v2",
        when(fam === 0, col("embedding"))
          .when(fam === 1 && col("r") < 5, expr(
            "transform(embedding, (x, i) -> " +
              "IF(i = CAST(r % 64 AS INT), x * CAST(1.05 AS FLOAT), x))"))
          .otherwise(expr(
            "transform(embedding, (x, i) -> " +
              "IF(pmod(xxhash64(nid * 64 + i), 2) = 0, x, -x))")))
      .select(col("nid").as("vec_id"), col("v2").as("embedding"),
        col("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    out
  }

  /** Deterministic ×`factor` EVENTS amplifier: event and user ids shift
    * by replica (nid = id·F + r), timestamps and everything else kept
    * verbatim — models USER-dimension growth at a constant time span,
    * the streaming scale axis: per-key state (dedup rows in the
    * watermark, per-user/session state, join buffers) must grow
    * linearly in F while the watermark frontier and window count stay
    * fixed. Raw read/write (no Tables.events ts cast) so the parquet
    * stays TIMESTAMP_NTZ and the stream schema applies unchanged. */
  private[graft] def amplifyEvents(s: SparkSession, d: String,
      factor: Int, outBase: String): String = {
    val out = s"$outBase/ev_x$factor"
    val marker = new org.apache.hadoop.fs.Path(
      s"$out/events.parquet/_SUCCESS")
    if (marker.getFileSystem(s.sparkContext.hadoopConfiguration)
        .exists(marker)) return out
    val reps = s.range(factor).select(col("id").as("r"))
    s.read.parquet(s"$d/events.parquet").crossJoin(reps)
      .select((col("event_id") * factor + col("r")).as("event_id"),
        col("ts"),
        (col("user_id") * factor + col("r")).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    out
  }

  /** Cluster-size histogram of a label table — the structural
    * fingerprint both CC variants must agree on. */
  private def histogram(labels: DataFrame): Seq[(Long, Long)] =
    labels.groupBy(col("lbl")).count()
      .groupBy(col("count").as("size")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).toSeq

  def main(args: Array[String]): Unit = {
    val maxFactor = args.headOption.map(_.toInt).getOrElse(100)
    val factors = Seq(1, 10, 100).filter(_ <= maxFactor)
    // optional 2nd arg: comma-list of sections to run (default all) —
    // lets a dev re-measure one axis without the full ~30 min sweep
    val sections = args.drop(1).headOption
      .map(_.split(",").toSet)
      .getOrElse(Set("pipeline", "pipeline_v2", "cc_corpus", "cc_chain", "topk",
        "lsh", "semantic", "recall", "graph", "triangles", "cdc", "kcore",
        "prefix", "blocklist", "novelty", "linkage", "stream", "codec",
        "kgrouped", "invidx", "substring", "unigram", "vocab", "ann_inc",
        "drift_recall", "despan_key", "stream_gates"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outBase = s"${sys.props("java.io.tmpdir")}/graft_scale"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // amplified corpora deliberately push stop-shingles past the df
      // cap (the fence under test); the oracle-equality guard is an
      // oracle-context contract, not a probe one — see
      // Dedup.assertDfCapInactive
      .config("spark.graft.dedup.dfCapGuard", "off")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val agg = new StageAgg
    spark.sparkContext.addSparkListener(agg)

    // ---- 1. pipeline at each factor --------------------------------
    if (sections("pipeline")) factors.foreach { f =>
      val dir = if (f == 1) sfDir else amplify(spark, sfDir, f, outBase)
      val nDocs = Tables.documents(spark, dir).count()
      val pipe = graft.SparkEntry.queries("q_pipeline_e2e")
      val (rows, wall, sw, sr, sp, pk) = measured(spark, agg) {
        pipe(spark, dir).queryExecution.toRdd.count()
      }
      emit(s"""{"probe":"pipeline","factor":$f,"docs":$nDocs,""" +
        s""""wall_s":${f"$wall%.2f"},"rows_out":$rows,""" +
        s""""shuffle_write_mb":${sw / 1048576},""" +
        s""""shuffle_read_mb":${sr / 1048576},"spill_mb":${sp / 1048576},""" +
        s""""peak_task_mem_mb":${pk / 1048576}}""")
      spark.catalog.clearCache()
    }

    // ---- 1b. pipeline v2 (with the substring-despan stage) ----------
    // The Lee-et-al. order at scale: v2 adds the ownership window +
    // rebuild + re-shingling over the exact survivors, and re-mines
    // near-dup pairs from the CLEANED text. The amplified corpus is the
    // stress: fam-0 replica cliques collapse in the exact stage, fam-2
    // chains carry heavy cross-doc spans into the despan stage.
    if (sections("pipeline_v2")) factors.foreach { f =>
      val dir = if (f == 1) sfDir else amplify(spark, sfDir, f, outBase)
      val nDocs = Tables.documents(spark, dir).count()
      val pipe = graft.SparkEntry.queries("q_pipeline_e2e_v2")
      val (rows, wall, sw, sr, sp, pk) = measured(spark, agg) {
        pipe(spark, dir).queryExecution.toRdd.count()
      }
      emit(s"""{"probe":"pipeline_v2","factor":$f,"docs":$nDocs,""" +
        s""""wall_s":${f"$wall%.2f"},"rows_out":$rows,""" +
        s""""shuffle_write_mb":${sw / 1048576},""" +
        s""""shuffle_read_mb":${sr / 1048576},"spill_mb":${sp / 1048576},""" +
        s""""peak_task_mem_mb":${pk / 1048576}}""")
      spark.catalog.clearCache()
    }

    // ---- 2. both CC variants on the corpus pair graph --------------
    if (sections("cc_corpus")) factors.foreach { f =>
      val dir = if (f == 1) sfDir else amplify(spark, sfDir, f, outBase)
      val docs = graft.operators.Dedup.e2eExact(spark, dir)
        .select(col("doc_id"), col("doc_id").as("lbl"))
      val pairs = graft.operators.Dedup.e2eCandidates(spark, dir)
        .select(col("doc_a"), col("doc_b")).cache()
      val nPairs = pairs.count()
      val edges = pairs.unionAll(
          pairs.select(col("doc_b"), col("doc_a")))
        .toDF("src", "dst")
      val ((lblJump, rJump), wJump, swJ, srJ, _, _) =
        measured(spark, agg) {
          val (l, r) = graft.operators.Dedup.connectedComponents(docs, edges)
          (l.localCheckpoint(), r)
        }
      val hJump = histogram(lblJump)
      val ((lblStar, rStar), wStar, swS, srS, _, _) =
        measured(spark, agg) {
          val (l, r) =
            graft.operators.Dedup.connectedComponentsStars(docs, edges)
          (l.localCheckpoint(), r)
        }
      val hStar = histogram(lblStar)
      require(hJump == hStar,
        s"CC variants disagree at x$f: $hJump vs $hStar")
      emit(s"""{"probe":"cc_corpus","factor":$f,"pairs":$nPairs,""" +
        s""""jump":{"rounds":$rJump,"wall_s":${f"$wJump%.2f"},""" +
        s""""shuffle_mb":${(swJ + srJ) / 1048576}},""" +
        s""""stars":{"rounds":$rStar,"wall_s":${f"$wStar%.2f"},""" +
        s""""shuffle_mb":${(swS + srS) / 1048576}},""" +
        s""""clusters_agree":true}""")
      pairs.unpersist()
      spark.catalog.clearCache()
    }

    // ---- 3. synthetic chain graphs: diameter-dominated CC ----------
    if (sections("cc_chain"))
    Seq((100000L, 100L), (100000L, 10000L)).foreach { case (n, len) =>
      val ids = spark.range(n)
      val fwd = ids
        .where(pmod(col("id"), lit(len)) =!= (len - 1) && col("id") + 1 < n)
        .select(col("id").as("src"), (col("id") + 1).as("dst"))
      val edges = fwd.unionAll(fwd.select(col("dst"), col("src")))
        .toDF("src", "dst").localCheckpoint()
      val docs = ids.select(col("id").as("doc_id"), col("id").as("lbl"))
      val expected = n / len
      val ((cJump, rJump), wJump, _, _, _, _) = measured(spark, agg) {
        val (l, r) = graft.operators.Dedup.connectedComponents(docs, edges)
        (l.select(col("lbl")).distinct().count(), r)
      }
      // record the stars edge-survivor curve: the shrinking shuffle
      // volume per round is the operator's at-scale argument, whether
      // or not wall time wins at local job-overhead scale
      val starEdges = Seq.newBuilder[Long]
      val ((cStar, rStar), wStar, _, _, _, _) = measured(spark, agg) {
        val (l, r) = graft.operators.Dedup.connectedComponentsStars(
          docs, edges, onRound = (_, m) => starEdges += m)
        (l.select(col("lbl")).distinct().count(), r)
      }
      require(cJump == expected && cStar == expected,
        s"chain CC wrong: $cJump/$cStar vs $expected components")
      emit(s"""{"probe":"cc_chain","nodes":$n,"chain_len":$len,""" +
        s""""components":$expected,""" +
        s""""jump":{"rounds":$rJump,"wall_s":${f"$wJump%.2f"}},""" +
        s""""stars":{"rounds":$rStar,"wall_s":${f"$wStar%.2f"},""" +
        s""""edges_per_round":${starEdges.result().mkString("[", ",", "]")}}}""")
      spark.catalog.clearCache()
    }

    // ---- 4. grouped top-k: heap exec vs window fallback ------------
    // groups sized so each holds ~100 rows (the regime the heap targets:
    // per-group sort depth >> k); min-of-2 per mode so first-run JIT
    // doesn't masquerade as plan cost
    if (sections("topk")) factors.filter(_ > 1).foreach { f =>
      val dir = amplify(spark, sfDir, f, outBase)
      val nGroups = 50L * f
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("n_chars"))
        .withColumn("g", pmod(xxhash64(col("doc_id")), lit(nGroups)))
      def run(): Long = graft.plans.TopK
        .topKPerGroup(docs, Seq("g"), "n_chars", "doc_id", 3)
        .queryExecution.toRdd.count()
      def minOf2(body: => Long): (Long, Double) = {
        val (r1, w1, _, _, _, _) = measured(spark, agg)(body)
        val (r2, w2, _, _, _, _) = measured(spark, agg)(body)
        require(r1 == r2); (r1, math.min(w1, w2))
      }
      val (rowsHeap, wHeap) = minOf2(run())
      spark.conf.set(graft.plans.TopK.FallbackConfKey, "window")
      val (rowsWin, wWin) =
        try minOf2(run())
        finally spark.conf.unset(graft.plans.TopK.FallbackConfKey)
      require(rowsHeap == rowsWin,
        s"topk modes disagree: $rowsHeap vs $rowsWin rows")
      emit(s"""{"probe":"topk","factor":$f,"groups":$nGroups,""" +
        s""""rows":$rowsHeap,"heap_wall_s":${f"$wHeap%.2f"},""" +
        s""""window_wall_s":${f"$wWin%.2f"}}""")
      spark.catalog.clearCache()
    }

    // ---- 5. embedding family: SRP-LSH near-dup at scaled bit width -
    // The fixture query pins 64 bands × 12 bits statically (right for
    // 2k vectors); the at-scale lever is BITS ∝ log2(n) so per-band
    // cell sizes stay O(1). Planted recall is an exact assertion: at
    // cos ≥ 0.9988 every planted pair survives every probed width
    // (miss prob < 1e-40), and the unique fill can't cross the 0.95
    // rescore bar — so found == planted, by count.
    {
      import graft.functions.VectorFunctions.{cosine_sim, srp_band_keys}
      val baseE = Tables.embeddings(spark, sfDir)
      val nFam0 = baseE.where(pmod(col("vec_id"), lit(10L)) === 0).count()
      val nFam1 = baseE.where(pmod(col("vec_id"), lit(10L)) === 1).count()
      if (sections("lsh")) factors.foreach { f =>
        val dir =
          if (f == 1) sfDir else amplifyEmbeddings(spark, sfDir, f, outBase)
        val e = Tables.embeddings(spark, dir)
          .select(col("vec_id"),
            col("embedding").cast("array<double>").as("v"))
        val nVec = e.count()
        val bits = if (f >= 100) 16 else if (f >= 10) 14 else 12
        val ((nCand, nPairs), wall, sw, sr, _, _) = measured(spark, agg) {
          val bk = e.select(col("vec_id"),
              posexplode(srp_band_keys(col("v"), 64, bits)))
            .select(col("vec_id"),
              struct(col("pos"), col("col")).as("bk"))
          val hot = bk.groupBy(col("bk")).agg(count(lit(1)).as("c"))
            .where(col("c") > 512).select(col("bk"))
          val cold = bk.join(hot, Seq("bk"), "left_anti")
          val dcand = cold.as("a").join(cold.as("b"),
              col("a.bk") === col("b.bk") &&
                col("a.vec_id") < col("b.vec_id"))
            .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
            .distinct().cache()
          val c = dcand.count()
          val p = dcand
            .join(e.select(col("vec_id").as("va"), col("v").as("xa")), "va")
            .join(e.select(col("vec_id").as("vb"), col("v").as("xb")), "vb")
            .where(cosine_sim(col("xa"), col("xb")) > 0.95)
            .count()
          dcand.unpersist()
          (c, p)
        }
        def c2(m: Long): Long = m * (m - 1) / 2
        val planted = nFam0 * c2(f) + nFam1 * c2(math.min(f, 5))
        // >= not ==: the engineered guarantee is that every PLANTED
        // pair is found; the unique fill may in principle contribute a
        // genuine high-cosine tail of its own (it did under the
        // correlated flip hash — see amplifyEmbeddings), reported as
        // extra_pairs rather than failed on.
        require(nPairs >= planted,
          s"LSH found $nPairs near-dup pairs at x$f, planted $planted")
        emit(s"""{"probe":"lsh_embed","factor":$f,"vectors":$nVec,""" +
          s""""bits":$bits,"candidates":$nCand,"found_pairs":$nPairs,""" +
          s""""planted_pairs":$planted,""" +
          s""""extra_pairs":${nPairs - planted},""" +
          s""""wall_s":${f"$wall%.2f"},""" +
          s""""shuffle_mb":${(sw + sr) / 1048576}}""")
        spark.catalog.clearCache()
      }

      // ---- 6. semantic dedup with k ∝ n (constant cell size) -------
      // SemDeDup's scale contract: cells stay ~constant-sized because
      // the cluster count grows with the corpus, so the within-cell
      // pair volume is linear in n. Seeds are stride-chosen (every
      // nVec/k-th vector) — deterministic, no training loop needed to
      // measure the shape. Exact-dup clusters (identical vectors score
      // identically, ties → lowest cent_id) land whole in one cell, so
      // each must lose F-1 members: a hard lower bound on `removed`.
      if (sections("semantic")) factors.foreach { f =>
        val dir =
          if (f == 1) sfDir else amplifyEmbeddings(spark, sfDir, f, outBase)
        val e = Tables.embeddings(spark, dir)
          .select(col("vec_id"),
            col("embedding").cast("array<double>").as("v"))
        val nVec = e.count()
        val k = 8 * f
        val stride = math.max(1L, nVec / k)
        val (removed, wall, sw, sr, _, _) = measured(spark, agg) {
          val cents = e
            .where(pmod(col("vec_id"), lit(stride)) === 0 &&
              col("vec_id") < stride * k)
            .select(col("vec_id").as("cent_id"), col("v").as("cv"))
          val assigned = e.join(broadcast(cents))
            .select(col("vec_id"), col("v"), col("cent_id"),
              cosine_sim(col("v"), col("cv")).as("sim"))
            .withColumn("rn", row_number().over(
              org.apache.spark.sql.expressions.Window
                .partitionBy(col("vec_id"))
                .orderBy(col("sim").desc, col("cent_id"))))
            .where(col("rn") === 1)
            .select(col("vec_id"), col("v"), col("cent_id").as("cell"))
          val a = assigned.select(col("cell"), col("vec_id").as("va"),
            col("v").as("xa"))
          val b = assigned.select(col("cell"), col("vec_id").as("vb"),
            col("v").as("xb"))
          a.join(b, Seq("cell")).where(col("va") < col("vb"))
            .where(cosine_sim(col("xa"), col("xb")) > 0.95)
            .select(col("vb")).distinct().count()
        }
        val nFam0Clusters = nFam0 * (f - 1)
        require(removed >= nFam0Clusters,
          s"semantic dedup removed $removed at x$f; " +
            s"exact-dup clusters alone require $nFam0Clusters")
        emit(s"""{"probe":"semantic_dedup","factor":$f,""" +
          s""""vectors":$nVec,"k":$k,"removed":$removed,""" +
          s""""exact_dup_floor":$nFam0Clusters,""" +
          s""""wall_s":${f"$wall%.2f"},""" +
          s""""shuffle_mb":${(sw + sr) / 1048576}}""")
        spark.catalog.clearCache()

        // The REAL operator (ivfAssigned: k = ⌊√n⌋ from ivfCells, two
        // decimal-exact Lloyd rounds) driven at ×1/×10. Not at ×100:
        // the operator's per-pair decimal arithmetic exists for
        // bit-exact oracle replay — a production deployment swaps
        // decimal_dot for the double cosine measured by the stride
        // probe above, which IS the ×100 shape evidence.
        if (f <= 10) {
          val (outRows, wallQ, swQ, srQ, _, _) = measured(spark, agg) {
            graft.SparkEntry.queries("q_dedup_semantic")(spark, dir)
              .queryExecution.toRdd.count()
          }
          emit(s"""{"probe":"semantic_dedup_operator","factor":$f,""" +
            s""""vectors":$nVec,"k":${
              graft.operators.Similarity.ivfCells(nVec)},""" +
            s""""rows_out":$outRows,"wall_s":${f"$wallQ%.2f"},""" +
            s""""shuffle_mb":${(swQ + srQ) / 1048576}}""")
          spark.catalog.clearCache()
        }
      }

      // ---- 7. ANN recall@5 vs exact, at fixture and ×10 ------------
      // Closes the loop on the corpus-derived bucket widths (lshBits /
      // ivfCells): non-emptiness alone doesn't prove the recalibrated
      // bits BUY anything — this measures recall of each approximate
      // variant against q_sim_cosine_topk's exact top-5 on the same
      // corpus dir, exactly as the library queries run (each derives
      // its own width from COUNT(*)). ×100 is excluded: brute-force
      // exact ground truth is the quadratic the ANN variants exist to
      // avoid, and ×1/×10 already spans a 10× corpus-size decade.
      if (sections("recall")) factors.filter(_ <= 10).foreach { f =>
        val dir =
          if (f == 1) sfDir else amplifyEmbeddings(spark, sfDir, f, outBase)
        def pairs(name: String): (Set[(Long, Long)], Double) = {
          val t0 = System.nanoTime()
          val got = graft.SparkEntry.queries(name)(spark, dir).collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
          spark.catalog.clearCache()
          (got, (System.nanoTime() - t0) / 1e9)
        }
        val (exact, wallExact) = pairs("q_sim_cosine_topk")
        require(exact.nonEmpty, s"exact top-k empty at x$f")
        for (name <- Seq("q_sim_ann_lsh", "q_sim_ann_multiprobe",
            "q_sim_ann_ivf", "q_sim_ann_ivfpq")) {
          val (got, wall) = pairs(name)
          val recall = (got & exact).size.toDouble / exact.size
          emit(s"""{"probe":"ann_recall","factor":$f,"query":"$name",""" +
            s""""exact_pairs":${exact.size},"ann_pairs":${got.size},""" +
            s""""recall_at_5":${f"$recall%.3f"},""" +
            s""""wall_s":${f"$wall%.2f"},""" +
            s""""exact_wall_s":${f"$wallExact%.2f"}}""")
        }
      }
    }

    // ---- 12. prefix-filter exact set-sim join vs the df-capped
    // inverted index — two exact strategies, one corpus. Wall should
    // track pair volume (the amplifier bounds near-dup cliques at 5 and
    // chains are linear in F, so pair volume is O(F·docs)); the
    // containment check proves the prefix filter's completeness bound
    // empirically: every J > 0.5 pair the inverted index finds must
    // also be a prefix-filter pair (whose τ test is the inclusive
    // 3·inter ≥ sa + sb). ×100 included (round 9): the open question
    // was whether prefix-filter candidate growth turns super-linear
    // past the planted-structure scale — measured, not argued.
    if (sections("prefix")) factors.foreach { f =>
      val dir = if (f == 1) sfDir else amplify(spark, sfDir, f, outBase)
      val nDocs = Tables.documents(spark, dir).count()
      val q = graft.SparkEntry.queries("q_dedup_prefix_filter")
      // min-of-2 per strategy (the topk-probe convention): the first
      // measured query in a cold JVM otherwise pays all the JIT
      def minOf2(body: => Set[(Long, Long)])
          : (Set[(Long, Long)], Double, Long, Long, Long) = {
        val runs = Seq.fill(2) {
          val r = measured(spark, agg)(body)
          spark.catalog.clearCache()
          r
        }
        val best = runs.minBy(_._2)
        (best._1, best._2, best._3, best._4, best._5)
      }
      val (pref, wPref, swP, srP, spP) = minOf2 {
        q(spark, dir).select(col("doc_a"), col("doc_b")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      val (inv, wInv, swI, srI, _) = minOf2 {
        graft.operators.Dedup.ngramJaccardPairsRaw(spark, dir)
          .select(col("doc_a"), col("doc_b")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      require((inv -- pref).isEmpty,
        s"prefix filter dropped ${(inv -- pref).size} true pairs at x$f")
      emit(s"""{"probe":"prefix_filter","factor":$f,"docs":$nDocs,""" +
        s""""prefix":{"pairs":${pref.size},"wall_s":${f"$wPref%.2f"},""" +
        s""""shuffle_mb":${(swP + srP) / 1048576},""" +
        s""""spill_mb":${spP / 1048576}},""" +
        s""""inverted":{"pairs":${inv.size},"wall_s":${f"$wInv%.2f"},""" +
        s""""shuffle_mb":${(swI + srI) / 1048576}},""" +
        s""""contains_all_strict_pairs":true}""")
    }

    // ---- linkage: blocked Jaro-Winkler at growing corpus scale ------
    // The blocking claim made measurable: the candidate stage is an
    // equi-join on the (first two tokens) key, so wall must track the
    // Σ per-block C(n,2) candidate volume — not docs² — and the max
    // block size is the skew exposure. Under the amplifier, only fam-0
    // exact replicas share a block across replicas (every other family
    // rewrites its opening tokens), so candidate volume grows
    // ~linearly·F² ONLY inside those bounded families while the block
    // count grows linearly — the probe records both so the relation is
    // data, not argument.
    if (sections("linkage")) factors.foreach { f =>
      val dir = if (f == 1) sfDir else amplify(spark, sfDir, f, outBase)
      val nDocs = Tables.documents(spark, dir).count()
      val prof = Tables.documents(spark, dir)
        .select(concat(expr("element_at(split(text, ' '), 1)"), lit(" "),
          expr("element_at(split(text, ' '), 2)")).as("blk"))
        .groupBy(col("blk")).count()
        .agg(count(lit(1)).as("blocks"), max(col("count")).as("max_blk"),
          sum(expr("count * (count - 1) div 2")).as("cand"))
        .collect()(0)
      val q = graft.SparkEntry.queries("q_dedup_jarowinkler")
      val runs = Seq.fill(2)(measured(spark, agg) { q(spark, dir).count() })
      val (matches, w, sw, sr, sp, _) = runs.minBy(_._2)
      emit(s"""{"probe":"linkage","factor":$f,"docs":$nDocs,""" +
        s""""blocks":${prof.getLong(0)},"max_block":${prof.getLong(1)},""" +
        s""""cand_pairs":${prof.getLong(2)},"matches":$matches,""" +
        s""""wall_s":${f"$w%.2f"},"shuffle_mb":${(sw + sr) / 1048576},""" +
        s""""spill_mb":${sp / 1048576}}""")
    }

    // ---- substring: suffix-array dedup at growing corpus scale ------
    // The round-9 family's scale claims made measurable: suffix count
    // is bounded by token count (one truncated suffix per position,
    // never whole-document fan-out), the 8-gram bucket skew is what
    // the bucket-local window sort pays for, and wall must track
    // suffix volume — never docs². Under the amplifier, fam-0 exact
    // replicas duplicate whole documents (max bucket ∝ F, the planted
    // duplication factor) while fams 3-9 rewrite every 3rd token so
    // their suffixes stay unique — dup coverage rises with F, bucket
    // skew stays O(F), and the probe records both so the relation is
    // data, not argument.
    if (sections("substring")) factors.foreach { f =>
      val dir = if (f == 1) sfDir else amplify(spark, sfDir, f, outBase)
      val nDocs = Tables.documents(spark, dir).count()
      val prof = Tables.documents(spark, dir)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .where(size(col("w")) >= 8)
        .select(explode(expr(
          "transform(sequence(1, size(w) - 7)," +
            " p -> concat_ws(' ', slice(w, p, 8)))")).as("gram"))
        .groupBy(col("gram")).count()
        .agg(count(lit(1)).as("grams"), max(col("count")).as("max_bucket"),
          sum(col("count")).as("suffixes"),
          sum(when(col("count") >= 2, col("count")).otherwise(0L))
            .as("dup_suffixes"))
        .collect()(0)
      val q = graft.SparkEntry.queries("q_dedup_substring")
      val runs = Seq.fill(2) {
        val r = measured(spark, agg) {
          q(spark, dir)
            .agg(sum((col("n_spans") > 0).cast("long")).as("docs_with_dups"),
              sum(col("dup_tokens")).as("dup_tokens"))
            .collect()(0)
        }
        spark.catalog.clearCache()
        r
      }
      val (row, w, sw, sr, sp, _) = runs.minBy(_._2)
      emit(s"""{"probe":"substring","factor":$f,"docs":$nDocs,""" +
        s""""suffixes":${prof.getLong(2)},"grams":${prof.getLong(0)},""" +
        s""""max_bucket":${prof.getLong(1)},""" +
        s""""dup_suffixes":${prof.getLong(3)},""" +
        s""""docs_with_dups":${row.getLong(0)},""" +
        s""""dup_tokens":${row.getLong(1)},""" +
        s""""wall_s":${f"$w%.2f"},"shuffle_mb":${(sw + sr) / 1048576},""" +
        s""""spill_mb":${sp / 1048576}}""")
      // the REBUILD stage on the same corpus: ownership window + the
      // 8-position explode + per-doc RemoveTokensAt — the fam-0 replica
      // cliques make virtually every window of a replica doc a repeat,
      // so the marked-position volume is the worst case the interval
      // machinery can see at each factor
      val qr = graft.SparkEntry.queries("q_dedup_substring_rebuild")
      val runs2 = Seq.fill(2) {
        val r = measured(spark, agg) {
          qr(spark, dir)
            .agg(sum((col("n_removed") > 0).cast("long")).as("docs_touched"),
              sum(col("n_removed")).as("removed_tokens"))
            .collect()(0)
        }
        spark.catalog.clearCache()
        r
      }
      val (row2, w2, sw2, sr2, sp2, _) = runs2.minBy(_._2)
      emit(s"""{"probe":"substring_rebuild","factor":$f,"docs":$nDocs,""" +
        s""""docs_touched":${row2.getLong(0)},""" +
        s""""removed_tokens":${row2.getLong(1)},""" +
        s""""wall_s":${f"$w2%.2f"},""" +
        s""""shuffle_mb":${(sw2 + sr2) / 1048576},""" +
        s""""spill_mb":${sp2 / 1048576}}""")
    }

    // ---- ann_inc: delta-fold cost vs full index build ----------------
    // The incremental-ANN claim made measurable: folding a delta batch
    // into the stored IVF index costs ONE broadcast-assignment job over
    // the delta, independent of the stored corpus — vs the full build's
    // two Lloyd rounds over everything. Both paths run on the amplified
    // embeddings (fam-0 exact cliques, fam-1 near-dups, isotropic fill);
    // recorded per factor: centroid-training wall (the stored-index
    // build), the delta-only assignment wall, the full one-shot
    // assignment wall (what a naive nightly rebuild would pay for
    // assignment alone), and the row split.
    if (sections("ann_inc")) factors.foreach { f =>
      val dir = if (f == 1) sfDir
        else amplifyEmbeddings(spark, sfDir, f, outBase)
      val nVec = Tables.embeddings(spark, dir).count()
      val t0 = System.nanoTime()
      val (stored, delta, oneShot, cents, cut) =
        graft.operators.Similarity.annIncrementalParts(spark, dir)
      val trainWall = (System.nanoTime() - t0) / 1e9
      val (deltaRows, wDelta, swD, srD, spD, _) =
        measured(spark, agg) { delta.count() }
      val (storedRows, wStored, _, _, _, _) =
        measured(spark, agg) { stored.count() }
      val (_, wFull, _, _, _, _) =
        measured(spark, agg) { oneShot.count() }
      emit(s"""{"probe":"ann_inc","factor":$f,"vectors":$nVec,""" +
        s""""cut":$cut,"cells":${cents.size},""" +
        s""""train_wall_s":${f"$trainWall%.2f"},""" +
        s""""delta_rows":$deltaRows,"stored_rows":$storedRows,""" +
        s""""delta_assign_wall_s":${f"$wDelta%.2f"},""" +
        s""""stored_assign_wall_s":${f"$wStored%.2f"},""" +
        s""""full_assign_wall_s":${f"$wFull%.2f"},""" +
        s""""delta_shuffle_kb":${(swD + srD) / 1024},""" +
        s""""spill_mb":${spD / 1048576}}""")
      spark.catalog.clearCache()
    }

    // ---- despan_key: the ownership-sort key, text vs hashed, PAIRED.
    // SCALE §20/§24 named "hash the gram to fixed width" as the v2
    // despan scale knob; round 11 shipped it (two engine-neutral 40-bit
    // folds — 16 fixed key bytes — replacing the ~50-byte 8-gram text
    // through the position exchange). Cross-session end-to-end pipeline
    // walls can't isolate the knob (host co-tenancy moved v1 and v2 in
    // OPPOSITE directions between rounds), so this section measures the
    // ownership STAGE alone, both variants interleaved A/B/A/B in one
    // session on the same amplified corpus: the full positional 8-gram
    // explode, the gram-keyed (resp. hash-keyed) ownership window, and
    // the per-doc removal aggregate, reduced to one count. Reported per
    // variant: min wall of 2 reps and the exchanged bytes — the key
    // width shows up directly in shuffle volume.
    if (sections("despan_key")) factors.filter(_ > 1).foreach { f =>
      import graft.functions.VectorFunctions.{neutral_hash40, neutral_hash40b}
      import org.apache.spark.sql.expressions.Window
      val dir = amplify(spark, sfDir, f, outBase)
      val ml = graft.operators.SubstringDedup.MinLen
      val pos0 = Tables.documents(spark, dir)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .where(size(col("w")) >= ml)
        .select(col("doc_id"), explode(expr(
          s"""transform(sequence(1, size(w) - ${ml - 1}), p -> struct(
             |  p AS p, concat_ws(' ', slice(w, p, $ml)) AS gram))"""
            .stripMargin)).as("x"))
        .select(col("doc_id"), col("x.p").as("p"), col("x.gram").as("gram"))
      val nPos = pos0.count()
      def run(tag: String, pos: DataFrame, keys: Seq[String]): Unit = {
        val (marked, wall, sw, sr, sp, _) = measured(spark, agg) {
          pos.withColumn("rn", row_number().over(
              Window.partitionBy(keys.map(col): _*)
                .orderBy(col("doc_id"), col("p"))))
            .where(col("rn") > 1)
            .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
            .agg(sum(col("n"))).head.getLong(0)
        }
        emit(s"""{"probe":"despan_key","factor":$f,"variant":"$tag",""" +
          s""""positions":$nPos,"marked":$marked,""" +
          s""""wall_s":${f"$wall%.2f"},""" +
          s""""shuffle_write_mb":${sw / 1048576},""" +
          s""""shuffle_read_mb":${sr / 1048576},"spill_mb":${sp / 1048576}}""")
      }
      val hashed = pos0.select(col("doc_id"), col("p"),
        neutral_hash40(col("gram")).as("h1"),
        neutral_hash40b(col("gram")).as("h2"))
      (1 to 2).foreach { _ =>
        run("text", pos0, Seq("gram"))
        run("hash", hashed, Seq("h1", "h2"))
      }
    }

    // ---- drift_recall: the retrain threshold as a MEASURED operating
    // point (r10 verdict item 4). q_sim_ann_drift emits a PSI but
    // nothing showed what a high-PSI delta DOES to the index — this
    // section plants deltas at increasing manifold shift and measures,
    // per shift level, the PSI alongside the probe-side consequences.
    // Setup: stored corpus = 40k deterministic isotropic-ish vectors
    // (sin pseudo-noise, energy spread over all 64 dims); the shifted
    // manifold concentrates its energy in dims 0-7 (a "new data source"
    // whose embeddings live elsewhere); a delta of 10k vectors mixes
    // the two at shift α ∈ {0, ¼, ½, ¾, 1}. Centroids train on the
    // STORED side only (ONCE — exactly the incremental-maintenance
    // regime the signal governs), each delta folds in as assignment,
    // and 20 delta-side queries probe their home cell. Reported per α:
    // the drift PSI (the q_sim_ann_drift kernel verbatim), single-probe
    // recall@5 vs exact over the merged corpus, the average fraction of
    // the index a probe must scan, and the delta's worst cell
    // concentration. The production reading: PSI tracks probe-cost
    // blow-up — a concentrated delta crams into few cells, so the
    // probed cell approaches delta-sized and per-query scan cost
    // approaches |delta|/|index| — which turns "retrain at PSI ≥ τ"
    // into a measured scan-cost budget rather than a convention.
    if (sections("drift_recall")) {
      import graft.functions.VectorFunctions.decimal_dot
      import graft.operators.Similarity
      import org.apache.spark.sql.expressions.Window
      val nStored = 40000L
      val nDelta = 10000L
      val baseGen = "sin(CAST(id * 64 + j AS DOUBLE))"
      val shiftGen = "(CASE WHEN j < 8 THEN 4.0 + sin(CAST(id * 64 + j " +
        "AS DOUBLE)) ELSE 0.05 * sin(CAST(id * 64 + j AS DOUBLE)) END)"
      def withNorm(df: org.apache.spark.sql.DataFrame) = df
        .withColumn("nsq", decimal_dot(col("v"), col("v")).cast("double"))
      val stored = withNorm(spark.range(nStored)
        .select(col("id").as("vec_id"),
          expr(s"transform(sequence(0, 63), j -> $baseGen)").as("v")))
        .cache()
      val k = Similarity.ivfCells(nStored)
      val stride = math.max(1L, nStored / k)
      val cents = Similarity.lloyd(spark, stored, k, stride)
      import spark.implicits._
      val centDf = cents.toDF("cent_id", "cv")
      val storedA = Similarity.nearestCents(stored, centDf)
        .select(col("vec_id"), col("v"), col("nsq"),
          col("cent_id").as("cell")).cache()
      Seq(0.0, 0.25, 0.375, 0.5, 0.625, 0.75, 1.0).foreach { a =>
        val delta = withNorm(spark.range(nDelta)
          .select((col("id") + nStored).as("vec_id"),
            expr(s"transform(sequence(0, 63), j -> " +
              s"(1.0 - $a) * $baseGen + $a * $shiftGen)").as("v")))
        val deltaA = Similarity.nearestCents(delta, centDf)
          .select(col("vec_id"), col("v"), col("nsq"),
            col("cent_id").as("cell")).cache()
        // PSI — the q_sim_ann_drift spelling (Laplace over the occupied
        // spine), summed to the one scalar the monitor thresholds
        val cs = storedA.groupBy(col("cell")).agg(count(lit(1)).as("c_s"))
        val cd = deltaA.groupBy(col("cell")).agg(count(lit(1)).as("c_d"))
        val cells = cs.join(cd, Seq("cell"), "full")
          .select(coalesce(col("c_s"), lit(0L)).as("c_s"),
            coalesce(col("c_d"), lit(0L)).as("c_d"))
        val tot = cells.agg(sum(col("c_s")).as("n_s"),
          sum(col("c_d")).as("n_d"), count(lit(1)).as("kk"))
        val pd = (col("c_d") + 1).cast("double") /
          (col("n_d") + col("kk")).cast("double")
        val ps = (col("c_s") + 1).cast("double") /
          (col("n_s") + col("kk")).cast("double")
        val psi = cells.crossJoin(broadcast(tot))
          .select(((pd - ps) * log(pd / ps)).as("t"))
          .agg(sum(col("t"))).head.getDouble(0)
        val merged = storedA.unionAll(deltaA).cache()
        val nTotal = nStored + nDelta
        val q = deltaA.where((col("vec_id") - nStored) %
            (nDelta / 20) === 0)
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("nsq").as("qnsq"), col("cell").as("qcell"))
        def top5(cand: org.apache.spark.sql.DataFrame) = cand
          .where(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            (decimal_dot(col("qv"), col("v")).cast("double") /
              sqrt(col("qnsq") * col("nsq"))).as("cos"))
          .withColumn("rn", row_number().over(Window
            .partitionBy(col("query_id"))
            .orderBy(col("cos").desc, col("neighbor_id"))))
          .where(col("rn") <= 5)
          .select(col("query_id"), col("neighbor_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))
          .groupBy(_._1).map { case (qq, xs) => qq -> xs.map(_._2).toSet }
        val (exact, wExact) = {
          val t0 = System.nanoTime()
          val r = top5(merged.crossJoin(broadcast(q)))
          (r, (System.nanoTime() - t0) / 1e9)
        }
        val (probed, wProbe) = {
          val t0 = System.nanoTime()
          val r = top5(merged.join(broadcast(q),
            col("cell") === col("qcell")))
          (r, (System.nanoTime() - t0) / 1e9)
        }
        val recall = exact.keys.toSeq.map { qq =>
          (probed.getOrElse(qq, Set.empty[Long]) & exact(qq)).size / 5.0
        }.sum / exact.size
        val sizes = merged.groupBy(col("cell")).agg(count(lit(1)).as("n"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val probeFrac = q.select(col("qcell")).collect()
          .map(r => sizes(r.getLong(0)).toDouble / nTotal)
        val maxDeltaFrac = deltaA.groupBy(col("cell"))
          .agg(count(lit(1)).as("n")).agg(max(col("n")))
          .head.getLong(0).toDouble / nDelta
        // RETRAIN EXECUTION (r12 verdict item 6): the monitor's firing
        // verdict triggers a maintenance action — retrain centroids on
        // stored+delta (the q_sim_ann_retrain operator) and re-assign.
        // Execute it at every drift point and measure what it buys:
        // recall@5 of the same single-probe queries under the
        // RETRAINED index, and the probe cost it restores.
        val kR = Similarity.ivfCells(nTotal)
        val base = merged.select(col("vec_id"), col("v"), col("nsq"))
        val centsR = Similarity.lloyd(spark, base, kR,
          math.max(1L, nTotal / kR))
        val mergedR = Similarity.nearestCents(base,
            centsR.toDF("cent_id", "cv"))
          .select(col("vec_id"), col("v"), col("nsq"),
            col("cent_id").as("cell")).cache()
        // materialize the retrained assignment BEFORE timing the probe,
        // so probe_wall_retrained_s is the steady-state query cost (the
        // index build is the retrain's one-time price, not the probe's)
        mergedR.count()
        val qR = mergedR.where(col("vec_id") >= nStored &&
            (col("vec_id") - nStored) % (nDelta / 20) === 0)
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("nsq").as("qnsq"), col("cell").as("qcell"))
        val (probedR, wProbeR) = {
          val t0 = System.nanoTime()
          val r = top5(mergedR.join(broadcast(qR),
            col("cell") === col("qcell")))
          (r, (System.nanoTime() - t0) / 1e9)
        }
        val recallR = exact.keys.toSeq.map { qq =>
          (probedR.getOrElse(qq, Set.empty[Long]) & exact(qq)).size / 5.0
        }.sum / exact.size
        val sizesR = mergedR.groupBy(col("cell"))
          .agg(count(lit(1)).as("n"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val probeFracR = qR.select(col("qcell")).collect()
          .map(r => sizesR(r.getLong(0)).toDouble / nTotal)
        emit(s"""{"probe":"drift_recall","shift":$a,"cells":$k,""" +
          s""""psi":${f"$psi%.4f"},"recall5_ivf":${f"$recall%.3f"},""" +
          s""""avg_probe_frac":${f"${probeFrac.sum / probeFrac.length}%.4f"},""" +
          s""""max_probe_frac":${f"${probeFrac.max}%.4f"},""" +
          s""""max_delta_cell_frac":${f"$maxDeltaFrac%.3f"},""" +
          s""""exact_wall_s":${f"$wExact%.2f"},""" +
          s""""probe_wall_s":${f"$wProbe%.2f"},""" +
          s""""recall5_retrained":${f"$recallR%.3f"},""" +
          s""""avg_probe_frac_retrained":${
            f"${probeFracR.sum / probeFracR.length}%.4f"},""" +
          s""""probe_wall_retrained_s":${f"$wProbeR%.2f"}}""")
        mergedR.unpersist(); merged.unpersist(); deltaA.unpersist()
      }
      stored.unpersist(); storedA.unpersist()
      spark.catalog.clearCache()
    }

    // ---- unigram: tokenizer-training cost vs corpus volume ----------
    // The unigram trainer's scale claim made measurable: EM cost rides
    // the VOCABULARY projection (distinct words × candidate
    // segmentations), not the corpus. The corpus here is replicated
    // VERBATIM ×F (new doc_ids, texts unchanged) — the tagged
    // amplifier would both widen words past the composition bound and
    // change the vocabulary, which is exactly what this experiment
    // must hold fixed — so the distinct-word table is identical at
    // every factor and only the word-counting shuffle grows. Reported:
    // cold train wall (the memo key is the dataset dir, so rep 1 is a
    // true cold run) and the memoized re-query wall (the amortized
    // per-consumer cost the other tokenizer queries pay).
    if (sections("unigram")) factors.foreach { f =>
      val dir = if (f == 1) sfDir else {
        val out = s"$outBase/rep_x$f"
        val marker = new org.apache.hadoop.fs.Path(
          s"$out/documents.parquet/_SUCCESS")
        if (!marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .exists(marker)) {
          val reps = spark.range(f).select(col("id").as("r"))
          Tables.documents(spark, sfDir).crossJoin(reps)
            .select((col("doc_id") * f + col("r")).as("doc_id"),
              col("text"), col("lang"), col("source"), col("n_chars"))
            .repartition(32)
            .write.mode("overwrite").parquet(s"$out/documents.parquet")
        }
        out
      }
      val prof = Tables.documents(spark, dir)
        .select(explode(split(col("text"), " ")).as("w"))
        .where(col("w") =!= "")
        .agg(count(lit(1)).as("toks"), countDistinct(col("w")).as("words"))
        .collect()(0)
      val q = graft.SparkEntry.queries("q_text_unigram_lm")
      val (rows, wCold, sw, sr, sp, _) = measured(spark, agg) {
        q(spark, dir).queryExecution.toRdd.count()
      }
      val (_, wMemo, _, _, _, _) = measured(spark, agg) {
        q(spark, dir).queryExecution.toRdd.count()
      }
      emit(s"""{"probe":"unigram","factor":$f,"tokens":${prof.getLong(0)},""" +
        s""""distinct_words":${prof.getLong(1)},"vocab_rows":$rows,""" +
        s""""train_wall_s":${f"$wCold%.2f"},""" +
        s""""memo_wall_s":${f"$wMemo%.2f"},""" +
        s""""shuffle_mb":${(sw + sr) / 1048576},""" +
        s""""spill_mb":${sp / 1048576}}""")
    }

    // ---- vocab: tokenizer-training cost vs VOCABULARY size ----------
    // The unigram probe above replicates the corpus VERBATIM, which
    // pins distinct words at the fixture's 31 types — the one term the
    // EM cost claim (O(|vocab| · segmentations · rounds) on the
    // distinct-word projection) depends on was never grown (r9 verdict
    // item 1). This section synthesizes corpora whose VOCABULARY is the
    // scale axis: n hash-distinct 7-char words (within MaxWordLen — the
    // tagged amplifier's 10-char tokens violate the composition bound,
    // which is why the verbatim probe ducked this), packed 100 words
    // per document, each type occurring once. Measured per |vocab|:
    // the seed stage (substring explode → TakeOrdered(SeedK)), the EM
    // rounds (the enumerate-and-min segmentation join), the max
    // usage-map rows returned to the driver (the claim: bounded at
    // alphabet + SeedK regardless of |vocab|), and the BPE trainer's
    // 20-round wall on the same corpus for the family comparison.
    if (sections("vocab")) {
      val targets = Seq(10000, 100000) ++
        (if (maxFactor >= 100) Seq(1000000) else Nil)
      targets.foreach { n =>
        val dir = s"$outBase/vocab_$n"
        val marker = new org.apache.hadoop.fs.Path(
          s"$dir/documents.parquet/_SUCCESS")
        if (!marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .exists(marker)) {
          // word(id) = 5 base-26 digits of id (distinctness) + 2 of a
          // multiplicative hash (so prefixes don't dominate the seed
          // stats); deterministic, RNG-free, 7 chars < MaxWordLen
          val digits = (4 to 0 by -1).map(j =>
            s"chr(97 + (id div ${Seq.fill(j)(26L).product}) % 26)")
            .mkString(", ")
          spark.range(n)
            .withColumn("h", pmod(col("id") * 2654435761L, lit(676L)))
            .select((col("id") / 100).cast("long").as("doc_id"),
              pmod(col("id"), lit(100L)).cast("int").as("i"),
              expr(s"concat($digits, chr(97 + (h div 26) % 26), " +
                "chr(97 + h % 26))").as("w"))
            .groupBy(col("doc_id"))
            .agg(expr("array_join(transform(array_sort(" +
              "collect_list(struct(i, w))), x -> x.w), ' ')").as("text"))
            .select(col("doc_id"), col("text"), lit("en").as("lang"),
              lit("synth").as("source"),
              length(col("text")).cast("long").as("n_chars"))
            .repartition(32)
            .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        }
        val prof = Tables.documents(spark, dir)
          .select(explode(split(col("text"), " ")).as("w"))
          .where(col("w") =!= "")
          .agg(count(lit(1)).as("toks"), countDistinct(col("w")).as("words"))
          .collect()(0)
        val t0 = System.nanoTime()
        val st = graft.operators.UnigramLm.stats(spark, dir)
        val trainWall = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        val t1 = System.nanoTime()
        val (_, merges) = graft.operators.Bpe.train(spark, dir)
        val bpeWall = (System.nanoTime() - t1) / 1e9
        spark.catalog.clearCache()
        emit(s"""{"probe":"unigram_vocab","types":$n,""" +
          s""""distinct_words":${prof.getLong(1)},""" +
          s""""tokens":${prof.getLong(0)},""" +
          s""""train_wall_s":${f"$trainWall%.2f"},""" +
          s""""seed_wall_s":${f"${st.seedWallS}%.2f"},""" +
          s""""em_wall_s":${f"${st.emWallS}%.2f"},""" +
          s""""usage_rows_max":${st.usageRowsMax},""" +
          s""""vocab_rows":${st.vocab.size},""" +
          s""""skipped_types":${st.skippedTypes},""" +
          s""""bpe_rounds":${merges.length},""" +
          s""""bpe_wall_s":${f"$bpeWall%.2f"}}""")
      }
    }

    // ---- stream: stateful streaming state vs event volume -----------
    // The batch probes measure shuffle; streaming's scale axis is STATE.
    // Three representative stateful plans at ×1/×10 event volume (users
    // scale, time span fixed): watermark dedup (state rows track events
    // inside the watermark — the linear-growth worst case), tumbling
    // window aggregation (state rows track windows×types — must stay
    // FLAT as volume grows; if it doesn't, the key design is wrong),
    // and the stream-stream join (buffers both sides within their
    // watermarks). Recorded per run: end-state rows, state memory,
    // summed commit time, micro-batches, wall, input rows/s — the
    // numbers that decide provider choice and partition sizing at a
    // real deployment's volume.
    if (sections("stream")) {
      val picks = Seq(
        ("q_stream_tumbling", "tumbling"),
        ("q_stream_dedup_watermark", "dedupw"),
        ("q_stream_join", "sjoin"))
      val stateAgg =
        new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()
      val lst = new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryStartedEvent): Unit = ()
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryProgressEvent): Unit = {
          val p = e.progress
          val ops = p.stateOperators
          if (p.name != null && ops != null && ops.nonEmpty) {
            val cur = stateAgg.computeIfAbsent(p.name.takeWhile(_ != '_'),
              _ => Array(0L, 0L, 0L, 0L))
            cur.synchronized {
              // PEAK rows, not the last snapshot: the final batch's
              // watermark purge zeroes dedup state, and capacity
              // planning cares about the high-water mark
              cur(0) = math.max(cur(0), ops.map(_.numRowsTotal).sum)
              cur(1) = math.max(cur(1), ops.map(_.memoryUsedBytes).sum)
              cur(2) += ops.map(_.commitTimeMs).sum
              cur(3) += 1L
            }
          }
        }
      }
      spark.streams.addListener(lst)
      factors.filter(_ <= 10).foreach { f =>
        val dir = if (f == 1) sfDir else amplifyEvents(spark, sfDir, f, outBase)
        val nEv = spark.read.parquet(s"$dir/events.parquet").count()
        picks.foreach { case (qn, prefix) =>
          stateAgg.clear()
          val q = graft.SparkEntry.queries(qn)
          val (rows, w, sw, sr, sp, _) =
            measured(spark, agg) { q(spark, dir).count() }
          org.apache.spark.sql.graftbridge.Bridge.waitListenerBus(spark, 10000)
          val st = Option(stateAgg.get(prefix)).getOrElse(Array(0L, 0L, 0L, 0L))
          emit(s"""{"probe":"stream","factor":$f,"query":"$qn",""" +
            s""""events":$nEv,"out_rows":$rows,"wall_s":${f"$w%.2f"},""" +
            s""""rows_per_s":${(nEv / w).toLong},"state_rows":${st(0)},""" +
            s""""state_mem_mb":${st(1) / 1048576},"commit_ms":${st(2)},""" +
            s""""batches":${st(3)},"shuffle_mb":${(sw + sr) / 1048576},""" +
            s""""spill_mb":${sp / 1048576}}""")
        }
      }
      spark.streams.removeListener(lst)
    }

    // ---- stream_gates: the r11 ingest gates on an amplified corpus --
    // The document-stream counterparts of the `stream` section above:
    // the cluster-membership gate, the span-decontamination gate, and
    // the tokenizer-drift monitor ride a DOCUMENTS drop zone, so their
    // scale axis is the amplified corpus (fam replica cliques stress
    // the stored posting list and the eval gram set), not the events
    // table. Recorded per factor: wall, end state rows/bytes (complete
    // mode ⇒ state is the gate's output table — per-arrival rows for
    // the cluster gate, per-doc position sets for the decontamination
    // gate, k language rows for the drift monitor), commit time, and
    // shuffle volume.
    if (sections("stream_gates")) {
      val picks = Seq(
        ("q_stream_clusters", "sclus"),
        ("q_stream_contamination", "scont"),
        ("q_stream_tokenizer_drift", "stok"),
        // the composed gate: the amplifier's fam-0 cliques replicate
        // with IDENTICAL text, so the admit-after-exact-dedup claim is
        // directly measurable — out_rows = distinct texts < docs, and
        // the cluster probe never sees a second clique member
        ("q_stream_pipeline_v2", "spv2"),
        // the published (update-mode keyed-upsert) gates: price the
        // production sink at scale — the gate plan plus four
        // touched-bucket parquet rewrites; share sclus's zone and
        // same-mode index memo, so run 1 builds nothing
        ("q_stream_cluster_publish", "scpub"),
        ("q_stream_pipeline_publish", "spv2pub"))
      val stateAgg =
        new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()
      val lst = new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryStartedEvent): Unit = ()
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryProgressEvent): Unit = {
          val p = e.progress
          val ops = p.stateOperators
          if (p.name != null && ops != null && ops.nonEmpty) {
            val cur = stateAgg.computeIfAbsent(p.name.takeWhile(_ != '_'),
              _ => Array(0L, 0L, 0L, 0L))
            cur.synchronized {
              cur(0) = math.max(cur(0), ops.map(_.numRowsTotal).sum)
              cur(1) = math.max(cur(1), ops.map(_.memoryUsedBytes).sum)
              cur(2) += ops.map(_.commitTimeMs).sum
              cur(3) += 1L
            }
          }
        }
      }
      spark.streams.addListener(lst)
      val modeKey = "spark.graft.cluster.docarray"
      factors.foreach { f =>
        val dir = if (f == 1) sfDir else amplify(spark, sfDir, f, outBase)
        val nDocs = Tables.documents(spark, dir).count()
        // the two cluster-probing gates run in BOTH doc-array join
        // modes (broadcast = default, bucketed = the corpus-scale
        // fallback — SCALE.md §28 is the measured comparison); the
        // gram-set gates don't touch the doc-array table. At ×100 only
        // the cluster gates run: they are the scale question (stored
        // index 80× the ×1 corpus); the gram gates' ×10 rows already
        // extrapolate linearly.
        val clusterGates = Set("sclus", "spv2", "scpub", "spv2pub")
        val publishGates = Set("scpub", "spv2pub")
        // each leg: (query, prefix, docarray mode, publish buckets,
        // zone slices). slices = drop-zone file count = trigger count;
        // 4 is the fixture default where EVERY trigger touches every
        // bucket (pure-overhead regime for fine bucketing). The
        // pruning-WIN legs raise slices so a trigger's keys land in a
        // SUBSET of the buckets — the regime the keyed-upsert sink
        // exists for (r14 verdict missing #1): scanned ≪ touched-table,
        // rewrite cost ∝ touched-partition bytes. Per-upsert
        // bytes_rewritten/bytes_new receipts ride the emitted row.
        val gateRuns = picks
          .filter { case (_, p) => f < 100 || clusterGates(p) }
          .flatMap { case (qn, p) =>
            val base = if (clusterGates(p))
              Seq((qn, p, "broadcast", 8L, 4), (qn, p, "bucketed", 8L, 4))
            else Seq((qn, p, "broadcast", 8L, 4))
            // bucket-count pricing of the keyed-upsert sink (r13
            // verdict "what's wrong" #1): same gate and mode, finer
            // published table — one row per bucket setting at ×10
            val extra = if (publishGates(p) && f == 10)
              Seq((qn, p, "broadcast", 64L, 4), (qn, p, "broadcast", 256L, 4))
            else Nil
            // pruning-WIN regime (scpub only — the sink is the probe
            // subject; spv2pub shares its mechanics verbatim): ×10 at
            // 64 slices ⇒ ~1/64 of the arrivals per trigger, buckets
            // swept coarse→fine so the same narrow triggers price the
            // whole-table rewrite vs the pruned one; ×100 at 256
            // slices carries the winning setting to corpus scale
            val win = if (p == "scpub" && f == 10)
              Seq((qn, p, "broadcast", 8L, 64), (qn, p, "broadcast", 256L, 64),
                (qn, p, "broadcast", 1024L, 64))
            else if (p == "scpub" && f == 100)
              Seq((qn, p, "broadcast", 8L, 256),
                (qn, p, "broadcast", 1024L, 256))
            else Nil
            base ++ extra ++ win }
        // one-off doc-array table size row per factor: the thing the
        // broadcast ceiling is ABOUT (row bytes ≈ 8·|shingles| + key)
        locally {
          import graft.operators.Dedup
          val all = spark.read.parquet(s"$dir/documents.parquet")
          val cut = all.agg((max(col("doc_id")) * 4).as("m"))
            .head.getLong(0) / 5
          val r = Dedup.withShingles(spark, dir)
            .where(col("doc_id") < cut)
            .agg(count(lit(1)), coalesce(sum(size(col("sh"))), lit(0L)))
            .head
          emit(s"""{"probe":"stream_gates","factor":$f,""" +
            s""""docarray_rows":${r.getLong(0)},""" +
            s""""docarray_mb":${(r.getLong(1) * 8 + r.getLong(0) * 16) /
              1048576}}""")
        }
        gateRuns.foreach { case (qn, prefix, mode, buckets, slices) =>
          // run 1 = COLD for whatever this (gate, mode) still has to
          // build; run 2 = WARM (all memos hit) — the warm row is the
          // gate's steady-state per-trigger cost. Sharing makes run-1
          // labels differ per row (ADVICE r12): each gate stages its
          // own drop zone once per factor EXCEPT spv2/the publish
          // variants, which inherit sclus's (same zone name); the
          // posting/doc-array index builds once per (factor, MODE) and
          // all four cluster gates share the memo entry. `builds`
          // names what run 1 actually pays (on a warm /tmp even
          // "zone" is already staged — upper bound).
          val builds =
            (if ((mode == "broadcast" &&
                 !Set("spv2", "scpub", "spv2pub")(prefix)) ||
                 slices != 4) // a fresh slice count stages its own zone
               Seq("zone") else Nil) ++
            (if (prefix == "sclus") Seq("index") else Nil)
          spark.conf.set(modeKey, mode)
          spark.conf.set("spark.graft.publish.buckets", buckets.toString)
          spark.conf.set("spark.graft.cluster.zoneSlices", slices.toString)
          try (1 to 2).foreach { run =>
            stateAgg.clear()
            val q = graft.SparkEntry.queries(qn)
            val (rows, w, sw, sr, sp, _) =
              measured(spark, agg) { q(spark, dir).count() }
            org.apache.spark.sql.graftbridge.Bridge
              .waitListenerBus(spark, 10000)
            val st = Option(stateAgg.get(prefix))
              .getOrElse(Array(0L, 0L, 0L, 0L))
            val b = if (run == 1) builds.mkString("+") else ""
            // publish sinks: per-invocation upsert telemetry — touched
            // buckets vs partition dirs actually scanned across the
            // upsert triggers (the plan-pruning receipt at this
            // bucket count)
            val pubStats = graft.streaming.EventStreams.publishScanStats
              .get(prefix).filter(_ => publishGates(prefix))
              .map { sc =>
                s""""buckets":$buckets,"slices":$slices,""" +
                s""""touched":${sc.map(_._1).sum},""" +
                s""""scanned":${sc.map(_._3).sum},""" +
                s""""bytes_rewritten":${sc.map(_._4).sum},""" +
                s""""bytes_new":${sc.map(_._5).sum},"""
              }.getOrElse("")
            emit(s"""{"probe":"stream_gates","factor":$f,"query":"$qn",""" +
              s""""mode":"$mode","run":$run,"builds":"$b",$pubStats""" +
              s""""docs":$nDocs,"out_rows":$rows,"wall_s":${f"$w%.2f"},""" +
              s""""state_rows":${st(0)},""" +
              s""""state_mem_mb":${st(1) / 1048576},"commit_ms":${st(2)},""" +
              s""""batches":${st(3)},"shuffle_mb":${(sw + sr) / 1048576},""" +
              s""""spill_mb":${sp / 1048576}}""")
            spark.catalog.clearCache()
          } finally {
            spark.conf.unset(modeKey)
            spark.conf.unset("spark.graft.publish.buckets")
            spark.conf.unset("spark.graft.cluster.zoneSlices")
          }
        }
      }
      spark.streams.removeListener(lst)
    }

    // ---- codec: storage-codec cost curve on the real corpus ---------
    // At 100 TB the parquet compression codec is a standing
    // CPU-vs-bytes trade paid on EVERY write and EVERY scan; measure it
    // on the ×10 amplified corpus (full-text column dominates) instead
    // of quoting folklore. Read leg forces full text decode
    // (sum(length(text))); min-of-2 per leg.
    if (sections("codec")) {
      val dir = amplify(spark, sfDir, 10, outBase)
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      Seq("none", "snappy", "lz4", "zstd", "gzip").foreach { c =>
        val out = s"$outBase/codec_$c"
        val wWall = Seq.fill(2)(measured(spark, agg) {
          docs.write.mode("overwrite").option("compression", c).parquet(out)
        }._2).min
        val p = new org.apache.hadoop.fs.Path(out)
        val bytes = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .getContentSummary(p).getLength
        val rWall = Seq.fill(2)(measured(spark, agg) {
          spark.read.parquet(out)
            .agg(sum(length(col("text")))).collect()
        }._2).min
        emit(s"""{"probe":"codec","codec":"$c","mb":${bytes / 1048576},""" +
          s""""write_s":${f"$wWall%.2f"},"read_s":${f"$rWall%.2f"}}""")
      }
    }

    // ---- blocklist: automaton vs k-scan at growing pattern counts --
    // The q_text_blocklist claim made measurable: the Aho–Corasick pass
    // reads each byte once regardless of pattern count, while the naive
    // per-pattern spelling (length-minus-replace — the cheapest k-scan
    // Spark can run without the automaton) pays one full-text pass PER
    // pattern. Patterns are two-word phrases built deterministically
    // from the corpus vocabulary (bounded driver traffic), k ∈
    // {8, 64, 512}, over the ×10 amplified corpus. Totals from both
    // arms are emitted as the cross-check (word phrases cannot
    // self-overlap, so occurrence conventions agree).
    if (sections("blocklist")) {
      val dir = if (maxFactor >= 10) amplify(spark, sfDir, 10, outBase)
        else sfDir
      val nDocs = Tables.documents(spark, dir).count()
      val vocab = Tables.documents(spark, dir)
        .select(explode(split(col("text"), " ")).as("w"))
        .where(length(col("w")) >= 3)
        .distinct().orderBy(col("w")).limit(40)
        .collect().map(_.getString(0)) // ≤ 40 rows: bounded by design
      Seq(8, 64, 512, 4096).foreach { k =>
        // +1 offset keeps adjacent words distinct (a doubled-word phrase
        // like "agg agg" self-overlaps in "agg agg agg", where AC counts
        // every end position but replace() consumes greedily). Above the
        // ~1.6k distinct-pair ceiling of a 40-word vocabulary the
        // patterns become word triples.
        val pats = (0 until k).map { i =>
          val n = vocab.length
          val a = vocab(i % n)
          val b = vocab((i / n + i + 1) % n)
          if (k <= 1000) s"$a $b"
          else {
            // last word must differ from the first: "x y x" self-overlaps
            val c0 = (i / 1600 + i * 7 + 3) % n
            s"$a $b ${vocab(if (c0 == i % n) (c0 + 1) % n else c0)}"
          }
        }.distinct
        // Both arms produce the identical per-pattern counts array; the
        // TIMED leg forces it through a codegen'd xxhash64-of-array sum
        // (O(k) per row at ~ns/element — any k-row reduction would bury
        // the scans being compared: a posexplode+sum reduction alone
        // cost 7-9 s at k = 512, and an interpreted aggregate() HOF
        // 25.6M lambda frames). The arms differ ONLY in how counts
        // derive: one automaton pass vs one replace() full-text scan
        // per pattern. Equal hash sums prove the arrays identical
        // element-for-element; hit totals come from one untimed pass.
        // (A k-term reduce(_ + _) chain was worse still: the left-
        // nested Column tree overflows the analyzer stack at k = 512 —
        // the flat-expression naive spelling can't even ANALYZE at
        // production blocklist sizes.)
        import graft.functions.TextFunctions.multi_pattern_counts
        val acCounts = multi_pattern_counts(col("text"), pats)
        val naiveCounts = transform(array(pats.map(lit): _*),
          p => ((length(col("text")) -
            length(replace(col("text"), p, lit("")))) / length(p))
            .cast("long"))
        def forced(counts: org.apache.spark.sql.Column): Long =
          Tables.documents(spark, dir)
            .select(xxhash64(counts).as("h"))
            .agg(expr("bit_xor(h)")).head.getLong(0) // full-range hashes
                                                     // overflow an ANSI sum
        val (acHash, wAc, _, _, _, _) =
          measured(spark, agg) { forced(acCounts) }
        val (nvHash, wNv, _, _, _, _) =
          measured(spark, agg) { forced(naiveCounts) }
        val acTotal = Tables.documents(spark, dir).select(acCounts.as("c"))
          .select(posexplode(col("c")).as(Seq("pid", "h")))
          .agg(sum(col("h"))).head.getLong(0)
        emit(s"""{"probe":"blocklist","factor":10,"docs":$nDocs,""" +
          s""""k":${pats.length},"ac_wall_s":${f"$wAc%.2f"},""" +
          s""""naive_wall_s":${f"$wNv%.2f"},"hits":$acTotal,""" +
          s""""arms_identical":${acHash == nvHash}}""")
      }
    }

    // ---- novelty: exact anti-join vs corpus-sized bloom probe ------
    // The q_curation_novelty / q_curation_novelty_bloom swap, measured:
    // same per-doc novelty scoring, the exact arm shuffling candidate
    // shingles against the reference set, the bloom arm probing a
    // broadcast filter map-side. Alongside wall time the probe records
    // shuffle volume — the quantity that actually separates the plans
    // at 1000 executors — and the aggregate undercount the FP envelope
    // costs the bloom arm.
    if (sections("novelty")) factors.filter(_ <= 10).foreach { f =>
      val dir = if (f == 1) sfDir else amplify(spark, sfDir, f, outBase)
      val nDocs = Tables.documents(spark, dir).count()
      val qe = graft.SparkEntry.queries("q_curation_novelty")
      val qb = graft.SparkEntry.queries("q_curation_novelty_bloom")
      // min-of-2 per arm (the prefix-probe convention): the first
      // measured query in a cold JVM otherwise pays all the JIT
      def minOf2(body: => Long): (Long, Double, Long, Long) = {
        val runs = Seq.fill(2)(measured(spark, agg)(body))
        val best = runs.minBy(_._2)
        (best._1, best._2, best._3, best._4)
      }
      val (exTot, wEx, swE, srE) = minOf2 {
        qe(spark, dir).agg(sum(col("n_novel"))).head.getLong(0)
      }
      val (blTot, wBl, swB, srB) = minOf2 {
        qb(spark, dir).agg(sum(col("n_novel_bloom"))).head.getLong(0)
      }
      emit(s"""{"probe":"novelty","factor":$f,"docs":$nDocs,""" +
        s""""exact":{"wall_s":${f"$wEx%.2f"},"novel":$exTot,""" +
        s""""shuffle_mb":${(swE + srE) / 1048576}},""" +
        s""""bloom":{"wall_s":${f"$wBl%.2f"},"novel":$blTot,""" +
        s""""shuffle_mb":${(swB + srB) / 1048576}},""" +
        s""""bloom_undercount_pm":${
          if (exTot > 0) 1000 * (exTot - blTot) / exTot else 0}}""")
    }

    // ---- 8. integer PageRank over the amplified near-dup graph -----
    // The 5-round join loop's cost model: pair-pipeline once, then per
    // round one (edges ⋈ ranks) shuffle — wall should track the pair
    // graph's size, not the round count × corpus. ×100 excluded for the
    // same reason as cc_corpus: the fam-1/fam-2 clique/chain structure
    // already peaks at ×10 pair volume per base doc.
    if (sections("graph")) factors.filter(_ <= 10).foreach { f =>
      val dir = if (f == 1) sfDir else amplify(spark, sfDir, f, outBase)
      val nDocs = Tables.documents(spark, dir).count()
      val q = graft.SparkEntry.queries("q_graph_pagerank")
      val (rows, wall, sw, sr, sp, _) = measured(spark, agg) {
        q(spark, dir).queryExecution.toRdd.count()
      }
      emit(s"""{"probe":"graph_pagerank","factor":$f,"docs":$nDocs,""" +
        s""""wall_s":${f"$wall%.2f"},"rows_out":$rows,""" +
        s""""shuffle_write_mb":${sw / 1048576},""" +
        s""""shuffle_read_mb":${sr / 1048576},"spill_mb":${sp / 1048576}}""")
      spark.catalog.clearCache()
    }

    // ---- 9. triangle counting over the amplified near-dup graph ----
    // The wedge self-join is the quadratic risk; degree orientation
    // bounds it by the LOW endpoint's degree, so wall should track the
    // pair graph like pagerank does — not the square of the densest
    // clique's degree. Same ×10 cap as the other pair-graph probes.
    if (sections("triangles")) factors.filter(_ <= 10).foreach { f =>
      val dir = if (f == 1) sfDir else amplify(spark, sfDir, f, outBase)
      val nDocs = Tables.documents(spark, dir).count()
      val q = graft.SparkEntry.queries("q_graph_triangles")
      val (rows, wall, sw, sr, sp, _) = measured(spark, agg) {
        q(spark, dir).queryExecution.toRdd.count()
      }
      emit(s"""{"probe":"graph_triangles","factor":$f,"docs":$nDocs,""" +
        s""""wall_s":${f"$wall%.2f"},"rows_out":$rows,""" +
        s""""shuffle_write_mb":${sw / 1048576},""" +
        s""""shuffle_read_mb":${sr / 1048576},"spill_mb":${sp / 1048576}}""")
      spark.catalog.clearCache()
    }

    // ---- 10. CDC chunk dedup over the amplified corpus -------------
    // Chunking is a compiled map stage, so wall should scale with the
    // corpus like the e2e pipeline; the amplifier's fam-0 exact
    // replicas must come out 100% duplicate-covered (identical text ⇒
    // identical chunks ⇒ dup_ratio 1e6) — the semantic check at scale.
    if (sections("cdc")) factors.filter(_ <= 10).foreach { f =>
      val dir = if (f == 1) sfDir else amplify(spark, sfDir, f, outBase)
      val nDocs = Tables.documents(spark, dir).count()
      val q = graft.SparkEntry.queries("q_dedup_cdc")
      val (rows, wall, sw, sr, sp, _) = measured(spark, agg) {
        q(spark, dir).queryExecution.toRdd.count()
      }
      val fullCov = q(spark, dir)
        .where(col("dup_ratio_q") === 1000000L).count()
      emit(s"""{"probe":"cdc","factor":$f,"docs":$nDocs,""" +
        s""""wall_s":${f"$wall%.2f"},"rows_out":$rows,""" +
        s""""fully_covered":$fullCov,""" +
        s""""shuffle_write_mb":${sw / 1048576},""" +
        s""""shuffle_read_mb":${sr / 1048576},"spill_mb":${sp / 1048576}}""")
      spark.catalog.clearCache()
    }

    // ---- 11. 2-core peel depth over the amplified pair graph -------
    // The published q_graph_kcore unrolls a FIXED 6 rounds (oracle
    // replayability); this probe peels to FIXPOINT and reports the
    // rounds actually needed — the scale knob check. The amplifier's
    // fam-2 chains have length F, and a 2-core peel erodes a chain
    // from both ends (⌈F/2⌉ rounds), so rounds_to_fixpoint ≈ F/2 at
    // ×10 documents exactly how PeelRounds must scale with the
    // longest chain overhang, while per-round work SHRINKS with the
    // surviving edge list.
    if (sections("kcore")) factors.filter(_ <= 10).foreach { f =>
      val dir = if (f == 1) sfDir else amplify(spark, sfDir, f, outBase)
      val pairs = graft.operators.Dedup.ngramJaccardPairsRaw(spark, dir)
        .select(col("doc_a"), col("doc_b")).cache()
      val nPairs = pairs.count()
      val edges0 = pairs.unionAll(
        pairs.select(col("doc_b"), col("doc_a"))).toDF("src", "dst")
      val (stats, wall, sw, sr, _, _) = measured(spark, agg) {
        var alive = edges0.localCheckpoint()
        var n = alive.count()
        var rounds = 0
        var done = false
        while (!done) {
          val keep = alive.groupBy(col("src"))
            .agg(count(lit(1)).as("deg")).where(col("deg") >= 2)
            .select(col("src"))
          val next = alive
            .join(keep, Seq("src"), "semi")
            .join(keep.withColumnRenamed("src", "dst"), Seq("dst"), "semi")
            .select(col("src"), col("dst"))
            .localCheckpoint()
          val m = next.count()
          if (m == n) done = true else { rounds += 1; n = m; alive = next }
        }
        (rounds, n)
      }
      pairs.unpersist()
      emit(s"""{"probe":"kcore","factor":$f,"pairs":$nPairs,""" +
        s""""rounds_to_fixpoint":${stats._1},""" +
        s""""core_edges":${stats._2},"wall_s":${f"$wall%.2f"},""" +
        s""""shuffle_mb":${(sw + sr) / 1048576}}""")
      spark.catalog.clearCache()
    }

    // ---- 18. storage-partitioned aggregation: the shuffle that -----
    // costs zero bytes. A HIGH-CARDINALITY rollup — groupBy(part, sub)
    // with sub = id % 100k, then a per-part digest — over the DSv2
    // connector at 1M/10M/100M rows, once per layout. High cardinality
    // is the honest case: with few groups, map-side partial aggregation
    // collapses the exchange to ~nothing regardless of layout (the
    // elision then saves a stage, not bytes); with groups ∝ data,
    // partial aggs DON'T collapse, so layout=range shuffles ~the whole
    // dataset while layout=mod (KeyGroupedPartitioning honored at the
    // scan) still moves ZERO bytes — the column being claimed.
    if (sections("kgrouped")) {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      Seq(1000000L, 10000000L, 100000000L).foreach { rows =>
        def rollup(layout: String) = spark.read
          .format("graft.sources.GraftSynthSource")
          .option("rows", rows.toString).option("parts", cpus)
          .option("layout", layout).load()
          .groupBy(col("part"), (col("id") % 100000L).as("sub"))
          .agg(count(lit(1)).as("n"),
            sum(col("bucket").cast("long")).as("sb"))
          .groupBy(col("part"))
          .agg(count(lit(1)).as("n_sub"), sum(col("sb")).as("sb"))
        val (gMod, wMod, swM, srM, _, _) = measured(spark, agg) {
          rollup("mod").queryExecution.toRdd.count()
        }
        val (gRange, wRange, swR, srR, _, _) = measured(spark, agg) {
          rollup("range").queryExecution.toRdd.count()
        }
        require(gMod == gRange, s"layouts disagree: $gMod vs $gRange")
        emit(s"""{"probe":"kgrouped","rows":$rows,"groups":$gMod,""" +
          s""""mod":{"wall_s":${f"$wMod%.2f"},""" +
          s""""shuffle_kb":${(swM + srM) / 1024}},""" +
          s""""range":{"wall_s":${f"$wRange%.2f"},""" +
          s""""shuffle_kb":${(swR + srR) / 1024}}}""")
      }
    }

    // ---- 19. inverted-index probe cost vs corpus size --------------
    // The q_text_index_query claim: answering a conjunctive query costs
    // Σ df of the query terms (posting rows), NOT a corpus scan. The
    // amplifier grows the corpus ×10 (and its tag-token vocabulary with
    // it); the probe's wall and shuffle should track the 3 rarest
    // terms' posting mass, not the ×10 corpus. Build cost (one-time,
    // linear) reported alongside for honesty.
    if (sections("invidx")) factors.filter(_ <= 10).foreach { f =>
      val dir = if (f == 1) sfDir else amplify(spark, sfDir, f, outBase)
      val nDocs = Tables.documents(spark, dir).count()
      val (_, wBuild, _, _, _, _) = measured(spark, agg) {
        graft.operators.TextAnalysis.invertedIndexPath(spark, dir)
      }
      val ((hits, postings), wProbe, sw, sr, _, _) = measured(spark, agg) {
        val (probe, toks, _) =
          graft.operators.TextAnalysis.invertedProbe(spark, dir)
        val p = probe.cache()
        val rows = p.count()
        val h = p.groupBy(col("doc_id"))
          .agg(countDistinct(col("tok")).as("nt"))
          .where(col("nt") === toks.length).count()
        p.unpersist()
        (h, rows)
      }
      emit(s"""{"probe":"invidx","factor":$f,"docs":$nDocs,""" +
        s""""build_wall_s":${f"$wBuild%.2f"},""" +
        s""""posting_rows_read":$postings,"matching_docs":$hits,""" +
        s""""probe_wall_s":${f"$wProbe%.2f"},""" +
        s""""probe_shuffle_kb":${(sw + sr) / 1024}}""")
      spark.catalog.clearCache()
    }

    val out = java.nio.file.Paths.get("target/scale.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      (lines.result().mkString("\n") + "\n").getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    spark.stop()
  }
}
