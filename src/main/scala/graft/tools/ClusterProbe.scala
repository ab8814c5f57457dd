package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe: times the phases of q_dedup_clusters separately. */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (rep <- 1 to 3) {
      println(s"[probe] === rep $rep ===")
      val pairs = graft.operators.Dedup
        .ngramJaccardPairsRaw(spark, d).select(col("doc_a"), col("doc_b"))
        .cache()
      t("pairs materialize")(pairs.count())
      val edges = pairs.unionAll(
        pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
        .toDF("src", "dst")
      val docs = graft.sources.Tables.documents(spark, d)
        .select(col("doc_id"), col("doc_id").as("lbl"))
      val (labels, rounds) = t("cc loop") {
        graft.operators.Dedup.connectedComponents(docs, edges)
      }
      println(s"[probe] rounds=$rounds")
      t("final sort+count")(labels.orderBy(col("doc_id"))
        .queryExecution.toRdd.count())
      val (labels2, rounds2) = t("cc stars loop") {
        graft.operators.Dedup.connectedComponentsStars(docs, edges)
      }
      println(s"[probe] stars rounds=$rounds2")
      t("stars final sort+count")(labels2.orderBy(col("doc_id"))
        .queryExecution.toRdd.count())
      pairs.unpersist()
      // NOTE: no clearCache between reps — mimics Bench's 3 reps of one
      // query, where the shingle cache should carry across reps
    }
    spark.stop()
  }
}
