package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe: which knob set makes OptimizeSkewedJoin fire on the
  * fixture-scale skewed join. */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val variants = Seq(
      "base" -> Seq.empty[(String, String)],
      "nocoalesce" -> Seq(
        "spark.sql.adaptive.coalescePartitions.enabled" -> "false"),
      "tiny" -> Seq(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1024",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1024"),
      "tiny+nocoalesce" -> Seq(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1024",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1024",
        "spark.sql.adaptive.coalescePartitions.enabled" -> "false"))

    for ((tag, extra) <- variants) {
      val knobs = graft.queries.Extended.SkewKnobs ++ extra
      graft.queries.Extended.withConf(spark, knobs) {
        val df = graft.queries.Extended.skewedJoin(spark, d)
        df.queryExecution.toRdd.count()
        val p = df.queryExecution.executedPlan.toString
        val mark = p.contains("skew=true") || p.contains("isSkewJoin=true") ||
          p.contains("skewed")
        println(s"[probe] $tag -> skew=$mark")
        if (tag == "base") {
          import org.apache.spark.sql.execution.SparkPlan
          import org.apache.spark.sql.execution.adaptive._
          def stages(pl: SparkPlan): Seq[ShuffleQueryStageExec] = pl match {
            case a: AdaptiveSparkPlanExec => stages(a.executedPlan)
            case s: ShuffleQueryStageExec => s +: stages(s.plan)
            case q: QueryStageExec => stages(q.plan)
            case other => other.children.flatMap(stages)
          }
          stages(df.queryExecution.executedPlan).foreach { st =>
            println(s"[probe] stage ${st.id} origin=${st.shuffle.shuffleOrigin} " +
              s"sizes=${st.mapStats.map(_.bytesByPartitionId.mkString(",")).getOrElse("none")}")
          }
        }
      }
    }
    spark.stop()
  }
}
