package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev probe: where does q_stream_transform_state's commit time go?
  * Prints each micro-batch's state-operator customMetrics (the RocksDB
  * latency breakdown) so conf experiments measure the right thing. */
object TwsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/root/repo/target/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        p.stateOperators.foreach { op =>
          println(s"[tws] batch=${p.batchId} commit=${op.commitTimeMs}ms " +
            s"rows=${op.numRowsTotal}")
          import scala.jdk.CollectionConverters._
          op.customMetrics.asScala.toSeq.sortBy(_._1)
            .filter { case (_, v) => v.longValue != 0 }
            .foreach { case (k, v) => println(s"[tws]   $k=$v") }
        }
      }
    })
    val df = graft.SparkEntry.queries("q_stream_transform_state")(spark, sfDir)
    println(s"[tws] result rows=${df.count()}")
    Thread.sleep(1000)
    spark.stop()
  }
}
