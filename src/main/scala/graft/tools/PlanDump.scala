package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: write the `explain("formatted")` output of named library
  * queries to files (plans/<round>/<query>_<tag>.txt) — the judge-facing
  * before/after plan artifacts for optimization rounds. Uses the same
  * session shape as Bench (local[$SPARK_GRAFT_CPUS], shuffle.partitions =
  * cpus, AQE on) so the captured initial plans match what the bench runs.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <tag> <query...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = java.nio.file.Paths.get(args(0))
    val tag = args(1)
    val names = args.drop(2)
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
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, d)
      // QueryExecution.explainString is what Dataset.explain("formatted")
      // prints; capture it instead of stdout-redirecting the console.
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        outDir.resolve(s"${q}_$tag.txt"), txt.getBytes("UTF-8"))
      println(s"wrote ${outDir.resolve(s"${q}_$tag.txt")}")
      // streaming queries: the interesting plan is the per-TRIGGER
      // micro-batch plan (constructing the df above already ran the
      // stream to completion), captured by the runToMemory /
      // publishKeyedUpsert census hook — append it when present
      graft.streaming.EventStreams.sinkToQuery.collectFirst {
        case (prefix, name) if name == q &&
            graft.streaming.EventStreams.lastPlans.contains(prefix) =>
          graft.streaming.EventStreams.lastPlans(prefix)
      }.foreach { p =>
        java.nio.file.Files.write(
          outDir.resolve(s"${q}_microbatch_$tag.txt"),
          p.toString.getBytes("UTF-8"))
        println(s"wrote ${outDir.resolve(s"${q}_microbatch_$tag.txt")}")
      }
      // drop per-query temp state like Bench's cleanup does
      spark.catalog.clearCache()
      spark.catalog.listTables().collect().filter(_.isTemporary)
        .foreach(t => spark.catalog.dropTempView(t.name))
      spark.streams.resetTerminated()
    }
    spark.stop()
  }
}
