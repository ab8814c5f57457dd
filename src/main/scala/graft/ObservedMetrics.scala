package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Accumulates `observe()` metrics across a session's executions.
  *
  * Pipeline queries embed CollectMetrics counters in the jobs that do
  * the work (see q_pipeline_e2e) — the Spark-idiomatic analogue of the
  * reference harness's embedded I/O accounting
  * (/root/reference/main.cc:327-335). The counters fire in two places:
  * observations BELOW an eager localCheckpoint surface when the
  * checkpoint materializes (a `withAction` execution → this listener);
  * observations in the FINAL plan surface on the query's own action
  * (harvested synchronously via [[harvestFrom]], since Bench drives
  * plans through `toRdd.count()`, which bypasses listener dispatch).
  * Drains merge both sources.
  */
final class ObservedMetrics extends QueryExecutionListener {
  private val acc = new ConcurrentHashMap[String, String]()

  private def jsonCell(v: Any): String = v match {
    case null => "null"
    case n @ (_: Long | _: Int | _: Double | _: Float | _: Short | _: Byte) =>
      n.toString
    case b: Boolean => b.toString
    case other =>
      "\"" + other.toString.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
  }

  private def harvest(qe: QueryExecution): Unit =
    qe.observedMetrics.foreach { case (name, row) =>
      val kv = row.schema.fieldNames.zip(row.toSeq)
        .map { case (k, v) => s""""$k":${jsonCell(v)}""" }
        .mkString("{", ",", "}")
      acc.put(name, kv)
    }

  override def onSuccess(funcName: String, qe: QueryExecution,
      durationNs: Long): Unit = harvest(qe)
  override def onFailure(funcName: String, qe: QueryExecution,
      exception: Exception): Unit = ()

  /** Synchronous harvest of a finished DataFrame's final-plan metrics. */
  def harvestFrom(df: DataFrame): Unit = harvest(df.queryExecution)

  def nonEmpty: Boolean = !acc.isEmpty

  /** Snapshot-and-clear, rendered as one JSON object string. */
  def drainJson(): String = {
    import scala.jdk.CollectionConverters._
    val m = acc.asScala.toSeq.sortBy(_._1)
    acc.clear()
    m.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
  }
}
