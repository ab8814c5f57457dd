package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Descending, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.Bridge

/** Grouped top-k as a first-class operator: logical node → planner
  * strategy → bounded-heap physical node, registered through
  * `spark.experimental.extraStrategies` — the (c)-path extension tier
  * (SURVEY §2 "custom operators"), used where composing built-ins
  * genuinely can't express the EXECUTION we need:
  *
  * the only built-in spelling of "top k rows per group" is
  * `row_number().over(Window.partitionBy(g).orderBy(s)) <= k`, whose
  * physical plan SORTS EVERY GROUP COMPLETELY (WindowExec requires
  * [g, s]-sorted input) and ranks every row just to discard all but k.
  * At 100 TB that is a full shuffle + full sort of the corpus for a
  * k·|groups|-row answer. [[TopKPerGroupExec]] declares only
  * `ClusteredDistribution(group)` (hash shuffle, NO sort) and streams
  * each partition once through per-group k-bounded heaps: O(k·groups)
  * memory, O(n·log k) comparisons, no sort buffer, no rank column —
  * the grouped analogue of what TakeOrderedAndProject does globally.
  *
  * Semantics: keep each group's k best rows by (score DESC, tie ASC) —
  * the total tiebreak makes the kept SET deterministic, so the
  * operator oracle-checks exactly (q_topk_custom) against the window
  * spelling it replaces. Output order within/across groups is
  * unspecified (heap + hash-map iteration); callers sort, as after any
  * shuffle.
  */
case class TopKPerGroupNode(child: LogicalPlan, groupCols: Seq[Attribute],
    scoreCol: Attribute, tieCol: Attribute, k: Int) extends UnaryNode {
  require(k >= 1, "k must be >= 1")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan)
      : TopKPerGroupNode = copy(child = c)
}

/** Plans [[TopKPerGroupNode]] → [[TopKPerGroupExec]]. Injected per
  * session (idempotently) by [[TopK.topKPerGroup]]; equally registrable
  * via `SparkSessionExtensions.injectPlannerStrategy`. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(child, g, s, t, k) =>
      TopKPerGroupExec(planLater(child), g, s, t, k) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(child: SparkPlan, groupCols: Seq[Attribute],
    scoreCol: Attribute, tieCol: Attribute, k: Int) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  /** Hash-cluster groups — EnsureRequirements inserts the Exchange; we
    * deliberately do NOT require any ordering (that's the point). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupCols) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val out = child.output
    val numK = k
    val gCols = groupCols
    val order = Seq(SortOrder(scoreCol, Descending),
      SortOrder(tieCol, Ascending))
    // flat JVM-overhead estimates: HashMap entry + PriorityQueue header
    // per group; object header + array slot per retained row (locals so
    // the task closure captures two longs, not the plan node)
    val groupOverhead = 128L
    val rowOverhead = 40L
    child.execute().mapPartitions { iter =>
      val budget = java.lang.Long.parseLong(
        org.apache.spark.sql.internal.SQLConf.get.getConfString(
          TopK.BudgetConfKey, TopK.DefaultBudgetBytes.toString))
      val keyProj = UnsafeProjection.create(gCols, out)
      // compare(a, b) < 0 ⇔ a is better; the max-heap's head is then
      // the WORST kept row — the eviction candidate
      val ord = GenerateOrdering.generate(
        order.map(BindReferences.bindReference(_, out)))
      val heaps =
        mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      // Memory accounting: the heap map holds O(k·groups) row copies,
      // and unlike WindowExec there is no spill path — a partition
      // whose group cardinality outgrows the executor would OOM where
      // the window spelling degrades to disk. Track retained bytes
      // (key + row payloads + flat per-entry overhead) and FAIL FAST
      // with the remediation in the message once the per-partition
      // budget is exceeded; this operator's contract is "k·groups fits
      // in memory" (the regime where skipping the sort is the win).
      var used = 0L
      def sizeOf(r: InternalRow): Long = r match {
        case u: UnsafeRow => u.getSizeInBytes.toLong + rowOverhead
        case _ => 64L
      }
      def checkBudget(): Unit =
        if (used > budget) throw new IllegalStateException(
          s"TopKPerGroup retained ~$used bytes (> budget $budget) in one " +
            s"partition: ${heaps.size} groups x k=$numK kept rows. Either " +
            s"raise ${TopK.BudgetConfKey}, repartition into more " +
            "partitions, or use the window spelling (row_number over " +
            "partitionBy), which sorts but spills.")
      iter.foreach { row =>
        val key = keyProj(row) // reused buffer — copy only on first sight
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = new mutable.PriorityQueue[InternalRow]()(ord)
            val kc = key.copy()
            heaps.put(kc, h)
            used += kc.getSizeInBytes.toLong + groupOverhead
            h
        }
        if (heap.size < numK) {
          val c = row.copy()
          heap.enqueue(c)
          used += sizeOf(c)
          checkBudget()
        } else if (ord.compare(row, heap.head) < 0) {
          used -= sizeOf(heap.dequeue())
          val c = row.copy()
          heap.enqueue(c)
          used += sizeOf(c)
          checkBudget()
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
  }

  override protected def withNewChildInternal(c: SparkPlan)
      : TopKPerGroupExec = copy(child = c)
}

/** User-facing API. */
object TopK {
  /** Per-partition retained-bytes budget for [[TopKPerGroupExec]]'s
    * heap map (see the accounting comment in doExecute). Settable as a
    * runtime conf; the 256 MiB default is far under executor memory at
    * the 32-partition local harness scale and proportionally safe on a
    * real cluster's per-core share. */
  val BudgetConfKey = "spark.graft.topk.partitionBudgetBytes"
  val DefaultBudgetBytes: Long = 256L * 1024 * 1024
  /** Top `k` rows per group by (`scoreCol` DESC, `tieCol` ASC). Columns
    * are resolved against `df`'s analyzed plan; the planner strategy is
    * registered on the session on first use. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], scoreCol: String,
      tieCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute =
      analyzed.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in ${analyzed.output.map(_.name).mkString(", ")}"))
    Bridge.ofRows(spark, TopKPerGroupNode(analyzed,
      groupCols.map(attr), attr(scoreCol), attr(tieCol), k))
  }
}
