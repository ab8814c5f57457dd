package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: print the formatted physical plan of named library queries. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { q =>
      println(s"==== $q ====")
      println(graft.SparkEntry.queries(q)(spark, d).queryExecution.executedPlan
        .toString.linesIterator.take(60).mkString("\n"))
    }
    spark.stop()
  }
}
