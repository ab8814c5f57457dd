package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev-only r15 optimization probe: time the sub-stages of the heaviest
  * library constructions with the noop sink (guide §1.4), so the round's
  * changes target measured cost, not guesses. Bench-shaped session.
  * Usage: runMain graft.tools.OptProbe <probe...>  (default: all)
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.warehouse.dir", "/root/repo/target/warehouse")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.dedup.dfCapGuard", "on")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = spark
    val which = args.toSet

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def time(label: String)(body: => Unit): Unit = {
      s.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      body
      println(f"[opt] $label%-42s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      s.sparkContext.setJobDescription(null)
    }

    def cleanup(): Unit = {
      s.catalog.clearCache()
      s.catalog.listTables().collect().filter(_.isTemporary)
        .foreach(t => s.catalog.dropTempView(t.name))
      s.streams.resetTerminated()
    }

    def runQ(name: String): Unit = {
      val df = graft.SparkEntry.queries(name)(s, d)
      df.queryExecution.toRdd.count(): Unit
    }

    // ---- stage probes ---------------------------------------------

    if (which.isEmpty || which("shingles")) {
      for (r <- 1 to 2) {
        time(s"withShingles noop (rep $r)") {
          noop(graft.operators.Dedup.withShingles(s, d))
        }
        cleanup()
      }
    }

    if (which.isEmpty || which("e2e")) {
      for (r <- 1 to 2) {
        time(s"e2eExact noop (rep $r)") {
          noop(graft.operators.Dedup.e2eExact(s, d))
        }
        time(s"e2eCandidates noop (rep $r, warm cache)") {
          noop(graft.operators.Dedup.e2eCandidates(s, d))
        }
        time(s"q_pipeline_e2e full (rep $r)") { runQ("q_pipeline_e2e") }
        cleanup()
      }
    }

    if (which.isEmpty || which("v2")) {
      // q_pipeline_e2e_v2 stage replica (timing only — the declared
      // query is untouched; this mirrors its body stage by stage)
      import org.apache.spark.sql.expressions.Window
      import graft.functions.VectorFunctions.{neutral_hash40, neutral_hash40b}
      import graft.operators.{Dedup, SubstringDedup}
      val ml = SubstringDedup.MinLen
      for (r <- 1 to 2) {
        val surv = Dedup.e2eExact(s, d)
          .select(col("doc_id"), col("source"), col("lang"),
            split(col("text"), " ").as("w"))
        val pos = surv.where(size(col("w")) >= ml)
          .select(col("doc_id"), explode(expr(
            s"""transform(sequence(1, size(w) - ${ml - 1}), p -> struct(
               |  p AS p, concat_ws(' ', slice(w, p, $ml)) AS gram))"""
              .stripMargin)).as("x"))
          .select(col("doc_id"), col("x.p").as("p"),
            neutral_hash40(col("x.gram")).as("h1"),
            neutral_hash40b(col("x.gram")).as("h2"))
        time(s"v2 pos explode+hash noop (rep $r)") { noop(pos) }
        val rm = pos
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("h1"), col("h2"))
              .orderBy(col("doc_id"), col("p"))))
          .where(col("rn") > 1)
          .select(col("doc_id"),
            explode(sequence(col("p"), col("p") + lit(ml - 1))).as("q"))
          .groupBy(col("doc_id"))
          .agg(sort_array(collect_set(col("q"))).as("ps"))
        time(s"v2 rm ownership noop (rep $r)") { noop(rm) }
        val clean = surv.join(rm, Seq("doc_id"), "left")
          .select(col("doc_id"), col("source"), col("lang"),
            coalesce(size(col("ps")), lit(0)).cast("long").as("n_rm"),
            when(col("ps").isNull, concat_ws(" ", col("w")))
              .otherwise(graft.functions.TextFunctions.remove_tokens_at(
                col("w"), expr("transform(ps, x -> x - 1)"))).as("ct"))
          .select(col("doc_id"), col("source"), col("lang"), col("n_rm"),
            split(col("ct"), " ").as("toks"))
          .where(size(col("toks")) >= 30)
        time(s"v2 clean rebuild noop (rep $r)") { noop(clean) }
        val g2 = clean.select(col("doc_id"), expr(Dedup.ShingleExpr).as("sh"))
        time(s"v2 dfCapGuard (rep $r)") {
          Dedup.assertDfCapInactive(s, s"$d#e2e_v2_clean", g2)
        }
        time(s"q_pipeline_e2e_v2 full (rep $r)") { runQ("q_pipeline_e2e_v2") }
        cleanup()
      }
    }

    if (which.isEmpty || which("prefix")) {
      for (r <- 1 to 3) {
        time(s"q_dedup_prefix_filter full (rep $r)") {
          runQ("q_dedup_prefix_filter")
        }
        cleanup()
      }
    }

    if (which.isEmpty || which("sim")) {
      for (r <- 1 to 3) {
        time(s"q_sim_ann_retrain full (rep $r)") { runQ("q_sim_ann_retrain") }
        time(s"q_sim_ann_drift full (rep $r)") { runQ("q_sim_ann_drift") }
        time(s"q_sim_ann_ivf full (rep $r)") { runQ("q_sim_ann_ivf") }
        cleanup()
      }
      // how much of an assignment pass is the decimal dot?
      import graft.functions.VectorFunctions.decimal_dot
      val e = graft.sources.Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .localCheckpoint()
      val cents = e.limit(44)
        .select(col("vec_id").as("cent_id"), col("v").as("cv"))
        .localCheckpoint()
      for (r <- 1 to 2) {
        time(s"n x k decimal_dot cross (rep $r)") {
          noop(e.join(broadcast(cents))
            .select(col("vec_id"), col("cent_id"),
              decimal_dot(col("v"), col("cv")).cast("double").as("dp")))
        }
        time(s"n x k double dot cross (rep $r)") {
          noop(e.join(broadcast(cents))
            .select(col("vec_id"), col("cent_id"),
              expr("aggregate(zip_with(v, cv, (x, y) -> x * y), " +
                "cast(0.0 as double), (a, x) -> a + x)").as("dp")))
        }
      }
    }

    if (which.isEmpty || which("streamstatic")) {
      // the pipeline-v2 static sides, per invocation (per bench rep)
      import graft.operators.{Dedup, SubstringDedup}
      import graft.functions.VectorFunctions.{neutral_hash40, neutral_hash40b}
      val ml = SubstringDedup.MinLen
      val all = s.read.parquet(s"$d/documents.parquet")
      val gramOnly = expr(
        s"""CASE WHEN size(toks) >= $ml THEN
           |  transform(sequence(1, size(toks) - ${ml - 1}),
           |    i -> concat_ws(' ', slice(toks, i, $ml)))
           |ELSE array(array_join(toks, ' ')) END""".stripMargin)
      val cut = all.agg((max(col("doc_id")) * 4).as("m")).head.getLong(0) / 5
      for (r <- 1 to 2) {
        val evalG = all.where(col("source") === "src0")
          .select(split(col("text"), " ").as("w"))
          .where(size(col("w")) >= ml)
          .select(explode(expr(
            s"""transform(sequence(1, size(w) - ${ml - 1}),
               |  p -> concat_ws(' ', slice(w, p, $ml)))""".stripMargin))
            .as("gram"))
          .select(neutral_hash40(col("gram")).as("gh1"),
            neutral_hash40b(col("gram")).as("gh2"))
          .distinct().withColumn("ehit", lit(1))
        time(s"spv2 evalG checkpoint (rep $r)") { evalG.localCheckpoint(): Unit }
        val dupGStr = all.where(col("doc_id") < cut)
          .select(split(col("text"), " ").as("toks"))
          .select(explode(gramOnly).as("gram")).distinct()
          .select(neutral_hash40(col("gram")).as("gh1"),
            neutral_hash40b(col("gram")).as("gh2"))
          .withColumn("dhit", lit(1))
        time(s"spv2 dupG distinct-on-STRING cp (rep $r)") {
          dupGStr.localCheckpoint(): Unit
        }
        val dupGHash = all.where(col("doc_id") < cut)
          .select(split(col("text"), " ").as("toks"))
          .select(explode(gramOnly).as("gram"))
          .select(neutral_hash40(col("gram")).as("gh1"),
            neutral_hash40b(col("gram")).as("gh2"))
          .distinct()
          .withColumn("dhit", lit(1))
        time(s"spv2 dupG distinct-on-HASH cp (rep $r)") {
          dupGHash.localCheckpoint(): Unit
        }
        cleanup()
      }
    }

    if (which.isEmpty || which("selfjoin")) {
      // A/B in ONE JVM: q_dedup_prefix_filter's pref/docArr subtrees are
      // in the plan twice (both sides of the candidate self-join).
      // Does AQE stage reuse already dedupe them, or does an explicit
      // materialization win?
      import org.apache.spark.sql.expressions.Window
      import graft.operators.Dedup
      def prefixFilter(mat: Boolean): DataFrame = {
        val t = Dedup.withShingles(s, d)
          .select(col("doc_id"), explode(col("sh")).as("tok"))
        val dfreq = t.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        val wDoc = Window.partitionBy(col("doc_id"))
        val pref0 = t.join(dfreq, "tok")
          .withColumn("sz", count(lit(1)).over(wDoc).cast("long"))
          .withColumn("rn", row_number().over(
            wDoc.orderBy(col("df"), col("tok"))))
          .where(col("rn") <= expr("sz div 2 + 1"))
          .where(col("df") >= 2)
          .select(col("doc_id"), col("sz"), col("tok"))
        val pref = if (mat) pref0.localCheckpoint() else pref0
        val cand = pref.select(col("tok"), col("doc_id").as("doc_a"),
            col("sz").as("sa"))
          .join(pref.select(col("tok"), col("doc_id").as("doc_b"),
            col("sz").as("sb")), "tok")
          .where(col("doc_a") < col("doc_b") &&
            col("sb") <= col("sa") * 2 && col("sa") <= col("sb") * 2)
          .select(col("doc_a"), col("doc_b"), col("sa"), col("sb"))
          .distinct()
        val docArr0 = t.groupBy(col("doc_id"))
          .agg(collect_list(col("tok")).as("toks"))
        val docArr = if (mat) docArr0.localCheckpoint() else docArr0
        cand
          .join(docArr.select(col("doc_id").as("doc_a"),
            col("toks").as("ta")), "doc_a")
          .join(docArr.select(col("doc_id").as("doc_b"),
            col("toks").as("tb")), "doc_b")
          .withColumn("inter",
            size(array_intersect(col("ta"), col("tb"))).cast("long"))
          .where(lit(3) * col("inter") >= col("sa") + col("sb"))
          .select(col("doc_a"), col("doc_b"), col("inter"), col("sa"),
            col("sb"),
            expr("(1000 * inter) div (sa + sb - inter)").as("jac_pm"))
          .orderBy(col("doc_a"), col("doc_b"))
      }
      def jaccardPairs(mat: Boolean): DataFrame = {
        val g = Dedup.withShingles(s, d)
        val ex = g.select(col("doc_id"), explode(col("sh")).as("shingle"))
        val rare = ex.groupBy(col("shingle"))
          .agg(count(lit(1)).as("df"))
          .where(col("df") <= Dedup.ShingleDfCap)
          .select(col("shingle"))
        val exRare0 = ex.join(rare, Seq("shingle"))
        val exRare = if (mat) exRare0.localCheckpoint() else exRare0
        val sizes = exRare.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        val inter = exRare.as("a").join(exRare.as("b"),
            col("a.shingle") === col("b.shingle") &&
              col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .agg(count(lit(1)).as("inter"))
        inter
          .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
          .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
          .select(col("doc_a"), col("doc_b"),
            (col("inter") / (col("sa.n") + col("sb.n") - col("inter")))
              .as("jaccard"))
          .where(col("jaccard") > 0.5)
          .orderBy(col("doc_a"), col("doc_b"))
      }
      for (r <- 1 to 3) {
        time(s"prefix_filter AS-IS (rep $r)") { noop(prefixFilter(false)) }
        cleanup()
        time(s"prefix_filter MATERIALIZED (rep $r)") {
          noop(prefixFilter(true))
        }
        cleanup()
        time(s"jaccard pairs AS-IS (rep $r)") { noop(jaccardPairs(false)) }
        cleanup()
        time(s"jaccard pairs MATERIALIZED (rep $r)") {
          noop(jaccardPairs(true))
        }
        cleanup()
      }
    }

    // ---- r16 same-JVM A/B legs ------------------------------------

    if (which("gates16") || which("gates16x")) {
      // postings layout (per-trigger index re-shuffle vs h-partitioned
      // checkpoint + shuffled-hash probe) × publish write clustering.
      // Each (query, variant) leg min-of-3; rep 1 of a variant pays its
      // memo-miss index build, so compare MINs. Interleaved A/B/A/B so
      // host drift hits both variants alike.
      val gateQs =
        if (which("gates16x")) // cw isolation: only the publish pair
          Seq("q_stream_cluster_publish", "q_stream_pipeline_publish")
        else Seq("q_stream_clusters", "q_stream_pipeline_v2",
          "q_stream_cluster_publish", "q_stream_pipeline_publish")
      s.conf.set("spark.graft.publish.receipts", "off")
      val combos =
        if (which("gates16x"))
          Seq(("partitioned", "off"), ("partitioned", "on")) // isolate cw
        else Seq(("plain", "off"), ("partitioned", "on"))
      for (r <- 1 to 3; q <- gateQs;
           (lay, cw) <- combos) {
        s.conf.set("spark.graft.cluster.postings", lay)
        s.conf.set("spark.graft.publish.clusteredWrite", cw)
        time(s"$q [$lay/cw=$cw] (rep $r)") { runQ(q) }
        cleanup()
      }
      s.conf.unset("spark.graft.cluster.postings")
      s.conf.unset("spark.graft.publish.clusteredWrite")
    }

    if (which("graph16")) {
      // pagerank/kcore round checkpoints: eager (one job per round) vs
      // lazy (rounds fold into the consuming job) — replicas, the
      // declared queries are untouched by this probe
      import graft.operators.Dedup
      val pairs = Dedup.ngramJaccardPairsMemo(s, d)
      val edges = pairs.unionAll(
        pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
        .toDF("src", "dst")
      def kcoreLike(eager: Boolean): DataFrame = {
        var alive = edges.localCheckpoint()
        for (_ <- 1 to Dedup.PeelRounds) {
          val keep = alive.groupBy(col("src"))
            .agg(count(lit(1)).as("deg"))
            .where(col("deg") >= 2)
            .select(col("src"))
          alive = alive
            .join(keep, Seq("src"), "semi")
            .join(keep.withColumnRenamed("src", "dst"), Seq("dst"), "semi")
            .select(col("src"), col("dst"))
            .localCheckpoint(eager = eager)
        }
        val coreDeg = alive.groupBy(col("src"))
          .agg(count(lit(1)).as("core_deg"))
        val docs = graft.sources.Tables.documents(s, d).select(col("doc_id"))
        docs.join(coreDeg, docs("doc_id") === coreDeg("src"), "left")
          .select(col("doc_id"),
            when(col("core_deg").isNull, 0L).otherwise(1L).as("in_2core"),
            coalesce(col("core_deg"), lit(0L)).as("core_deg"))
          .orderBy(col("doc_id"))
      }
      def pagerankLike(eager: Boolean): DataFrame = {
        val g = edges.join(
            edges.groupBy(col("src")).agg(count(lit(1)).as("deg")), "src")
          .localCheckpoint()
        val nodes = graft.sources.Tables.documents(s, d)
          .select(col("doc_id")).localCheckpoint()
        val n = nodes.count()
        val base = 1000000000L / n
        val tele = 15L * base / 100L
        var ranks = nodes.select(col("doc_id"), lit(base).as("r"))
          .localCheckpoint()
        for (_ <- 1 to 5) {
          val mass = g
            .join(ranks.withColumnRenamed("doc_id", "src"), "src")
            .select(col("dst"), expr("r div deg").as("c"))
            .groupBy(col("dst")).agg(sum(col("c")).as("m"))
          ranks = nodes.join(mass, nodes("doc_id") === mass("dst"), "left")
            .select(col("doc_id"),
              expr(s"$tele + (85 * coalesce(m, 0L)) div 100").as("r"))
            .localCheckpoint(eager = eager)
        }
        val deg = g.select(col("src"), col("deg")).distinct()
        ranks
          .join(deg, ranks("doc_id") === deg("src"), "left")
          .select(col("doc_id"), col("r").as("rank_nn"),
            coalesce(col("deg"), lit(0L)).as("deg"))
          .orderBy(col("doc_id"))
      }
      for (r <- 1 to 3) {
        time(s"kcore EAGER rounds (rep $r)") { noop(kcoreLike(true)) }
        time(s"kcore LAZY rounds (rep $r)") { noop(kcoreLike(false)) }
        time(s"pagerank EAGER rounds (rep $r)") { noop(pagerankLike(true)) }
        time(s"pagerank LAZY rounds (rep $r)") { noop(pagerankLike(false)) }
      }
    }

    if (which("ckpt16")) {
      // diagnosis: does a repartition(col).localCheckpoint() carry its
      // hash partitioning into a downstream join (no exchange on the
      // checkpointed side)? Try with AQE on (session default) and off
      // during the checkpoint build.
      def leg(tag: String, aqe: String): Unit = {
        s.conf.set("spark.sql.adaptive.enabled", aqe)
        val base = s.range(0, 100000).selectExpr("id % 1000 AS k", "id AS v")
        val ck = base.repartition(col("k")).localCheckpoint()
        s.conf.set("spark.sql.adaptive.enabled", "true")
        println(s"[ckpt16/$tag] ckpt partitions=${ck.rdd.getNumPartitions}")
        val probe = s.range(0, 1000).selectExpr("id AS k", "id AS w")
        val j = probe.join(ck.hint("shuffle_hash"), Seq("k"), "left")
        val plan = j.queryExecution.executedPlan.toString
        val exch = plan.linesIterator.count(_.contains("Exchange"))
        println(s"[ckpt16/$tag] join exchanges=$exch")
        plan.linesIterator.filter(l => l.contains("Exchange") ||
          l.contains("Join") || l.contains("Scan ExistingRDD"))
          .foreach(l => println(s"[ckpt16/$tag]   ${l.trim.take(120)}"))
      }
      leg("aqe-on-build", "true")
      leg("aqe-off-build", "false")
    }

    if (which("prefix16")) {
      // does materializing the exploded token table t (3 consumers:
      // dfreq, pref join, docArr) win on top of r15's pref/docArr
      // checkpoints?
      import org.apache.spark.sql.expressions.Window
      import graft.operators.Dedup
      def prefixT(tMat: Boolean): DataFrame = {
        val t0 = Dedup.withShingles(s, d)
          .select(col("doc_id"), explode(col("sh")).as("tok"))
        val t = if (tMat) t0.localCheckpoint() else t0
        val dfreq = t.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        val wDoc = Window.partitionBy(col("doc_id"))
        val pref = t.join(dfreq, "tok")
          .withColumn("sz", count(lit(1)).over(wDoc).cast("long"))
          .withColumn("rn", row_number().over(
            wDoc.orderBy(col("df"), col("tok"))))
          .where(col("rn") <= expr("sz div 2 + 1"))
          .where(col("df") >= 2)
          .select(col("doc_id"), col("sz"), col("tok"))
          .localCheckpoint()
        val cand = pref.select(col("tok"), col("doc_id").as("doc_a"),
            col("sz").as("sa"))
          .join(pref.select(col("tok"), col("doc_id").as("doc_b"),
            col("sz").as("sb")), "tok")
          .where(col("doc_a") < col("doc_b") &&
            col("sb") <= col("sa") * 2 && col("sa") <= col("sb") * 2)
          .select(col("doc_a"), col("doc_b"), col("sa"), col("sb"))
          .distinct()
        val docArr = t.groupBy(col("doc_id"))
          .agg(collect_list(col("tok")).as("toks"))
          .localCheckpoint()
        cand
          .join(docArr.select(col("doc_id").as("doc_a"),
            col("toks").as("ta")), "doc_a")
          .join(docArr.select(col("doc_id").as("doc_b"),
            col("toks").as("tb")), "doc_b")
          .withColumn("inter",
            size(array_intersect(col("ta"), col("tb"))).cast("long"))
          .where(lit(3) * col("inter") >= col("sa") + col("sb"))
          .select(col("doc_a"), col("doc_b"), col("inter"), col("sa"),
            col("sb"),
            expr("(1000 * inter) div (sa + sb - inter)").as("jac_pm"))
          .orderBy(col("doc_a"), col("doc_b"))
      }
      for (r <- 1 to 3) {
        time(s"prefix t AS-IS (rep $r)") { noop(prefixT(false)) }
        cleanup()
        time(s"prefix t MATERIALIZED (rep $r)") { noop(prefixT(true)) }
        cleanup()
      }
    }

    if (which("v2ab16")) {
      // q_pipeline_e2e_v2 with the clean checkpoint now in the query —
      // time the declared query as-is (min-of-3); compare with the r16
      // baseline bench numbers
      for (r <- 1 to 3) {
        time(s"q_pipeline_e2e_v2 full (rep $r)") { runQ("q_pipeline_e2e_v2") }
        cleanup()
      }
    }

    if (which.isEmpty || which("streams")) {
      for (r <- 1 to 2) {
        for (q <- Seq("q_stream_clusters", "q_stream_pipeline_v2",
            "q_stream_cluster_publish", "q_stream_pipeline_publish",
            "q_stream_full_join", "q_stream_foreach_batch")) {
          time(s"$q full (rep $r)") { runQ(q) }
          cleanup()
        }
      }
    }

    spark.stop()
  }
}
