package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only probe for the r10 q_pipeline_e2e regression (3.91 → 4.76 s,
  * flat across reps and reproducible across runs — VERDICT "What's
  * wrong" #1): a paired A/B/A in ONE JVM under the exact bench
  * environment (local[32], shuffle=32, per-rep clearCache). Phase A
  * measures e2e at steady state; each suspect phase then runs one
  * candidate polluter 3× (the new-in-r10 queries that precede e2e
  * alphabetically, so they are the only new code that CAN have polluted
  * its in-suite reps); the following e2e phase re-measures. If a
  * polluter is real, the post-phase medians jump by the in-suite delta
  * (~0.85 s); if every phase matches phase A, the pollution hypothesis
  * is dead and the regression is host-generation drift.
  *
  * Usage: RegressionProbe [reps=6] — env SPARK_GRAFT_SF_DIR for scale.
  */
object RegressionProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(6)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.catalog.listTables().collect()
        .filter(_.isTemporary)
        .foreach(t => spark.catalog.dropTempView(t.name))
      spark.streams.resetTerminated()
    }
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, d).queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      cleanup()
      dt
    }
    def phase(tag: String, name: String, n: Int): Unit = {
      val ts = Seq.fill(n)(once(name))
      println(f"[probe] $tag $name reps=${ts.map(t => f"$t%.2f").mkString(",")}" +
        f" min=${ts.min}%.3f median=${ts.sorted.apply(ts.size / 2)}%.3f")
    }

    phase("A:baseline", "q_pipeline_e2e", reps + 2) // +2 JIT warmup
    phase("B:polluter", "q_contamination_semantic", 3)
    phase("C:after-contam", "q_pipeline_e2e", reps)
    phase("D:polluter", "q_dedup_substring_rebuild", 3)
    phase("E:after-rebuild", "q_pipeline_e2e", reps)
    phase("F:polluter", "q_dedup_substring", 3)
    phase("G:after-substr", "q_pipeline_e2e", reps)
    // storage snapshot: what survived every cleanup
    val rdds = spark.sparkContext.getPersistentRDDs
    println(s"[probe] persistent RDDs after final cleanup: ${rdds.size}")
    rdds.take(10).foreach { case (id, r) =>
      println(s"[probe]   rdd $id ${r.getStorageLevel.description} " +
        s"${r.name}") }
    spark.stop()
  }
}
