package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only probe: is the e2e shared projection cache picked up? */
object E2eProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cand = graft.operators.Dedup.e2eCandidates(spark, d)
    val p = cand.queryExecution.executedPlan.toString
    println(s"[probe] InMemoryTableScan lines: " +
      p.linesIterator.count(_.contains("InMemoryTableScan")))
    println(s"[probe] InMemoryRelation lines: " +
      p.linesIterator.count(_.contains("InMemoryRelation")))
    println(s"[probe] FileScan-documents lines: " +
      p.linesIterator.count(l => l.contains("FileScan") &&
        l.contains("documents.parquet")))
    println(p.linesIterator.take(40).mkString("\n"))
    spark.stop()
  }
}
