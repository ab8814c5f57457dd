package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, BindReferences, CurrentRow, Descending, Expression, GreaterThan, GreaterThanOrEqual, IntegerLiteral, LessThan, LessThanOrEqual, NullsFirst, NullsLast, RowFrame, RowNumber, SortOrder, SpecifiedWindowFrame, UnboundedPreceding, UnsafeProjection, UnsafeRow, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, UnaryNode, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.rules.Rule
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
  * (Spark's InferWindowGroupLimit improves that plan by pre-pruning
  * each group to k rows — but the surviving k·|groups| rows still pay
  * a full Sort + WindowExec rank pass.) At 100 TB that is a full
  * shuffle + sort of the corpus for a k·|groups|-row answer.
  * [[TopKPerGroupExec]] declares only `ClusteredDistribution(group)`
  * (hash shuffle, NO sort) and streams each partition once through
  * per-group k-bounded heaps: O(k·groups) memory, O(n·log k)
  * comparisons, no sort buffer, no rank column — the grouped analogue
  * of what TakeOrderedAndProject does globally.
  *
  * Semantics: keep each group's k best rows by (score DESC, tie ASC) —
  * the total tiebreak makes the kept SET deterministic, so the
  * operator oracle-checks exactly (q_topk_custom) against the window
  * spelling it replaces. Output order within/across groups is
  * unspecified (heap + hash-map iteration); callers sort, as after any
  * shuffle.
  *
  * Two extension surfaces reach the operator:
  *  - programmatic: [[TopK.topKPerGroup]];
  *  - SQL: [[TopKSqlRewrite]] recognizes the row_number-filter
  *    spelling in any optimized plan and swaps in the node, so plain
  *    `spark.sql` text gets the heap plan (q_topk_sql, plan-asserted).
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
  * session (idempotently) by [[TopK.register]]; equally registrable
  * via `SparkSessionExtensions.injectPlannerStrategy`. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(child, g, s, t, k) =>
      TopKPerGroupExec(planLater(child), g, s, t, k) :: Nil
    case _ => Nil
  }
}

/** SQL surface: rewrites the canonical window spelling of grouped
  * top-k —
  * {{{
  *   SELECT <cols> FROM (
  *     SELECT *, row_number() OVER (PARTITION BY g
  *                                  ORDER BY s DESC, t) AS rn FROM x)
  *   WHERE rn <= k
  * }}}
  * — into [[TopKPerGroupNode]], provided the rank column itself is
  * filtered away (not projected out) and the ordering matches the
  * operator's (score DESC NULLS LAST, tie ASC NULLS FIRST — the
  * defaults) exactly. Runs in `experimental.extraOptimizations` (after
  * the main optimizer), so it also strips the WindowGroupLimit that
  * InferWindowGroupLimit inserts below the window for the same
  * pattern: that rule prunes each group to k before sorting; this one
  * removes the sort+rank entirely.
  *
  * Inert when [[TopK.FallbackConfKey]] = "window": the point of the
  * fallback is to RUN the window spelling, so the rewrite must not
  * undo it. */
object TopKSqlRewrite extends Rule[LogicalPlan] {

  private def limitOf(cond: Expression, rn: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k))
        if a.semanticEquals(rn) => Some(k)
      case LessThan(a: Attribute, IntegerLiteral(k))
        if a.semanticEquals(rn) => Some(k - 1)
      case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute)
        if a.semanticEquals(rn) => Some(k)
      case GreaterThan(IntegerLiteral(k), a: Attribute)
        if a.semanticEquals(rn) => Some(k - 1)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString(TopK.FallbackConfKey, "exec") == "window") plan
    else plan.transformUp {
      case p @ Project(projectList, Filter(cond, w: Window)) =>
        val swapped = w.windowExpressions match {
          case Seq(a @ Alias(WindowExpression(RowNumber(),
              WindowSpecDefinition(_, _, SpecifiedWindowFrame(
                RowFrame, UnboundedPreceding, CurrentRow))), _)) =>
            val rn = a.toAttribute
            (limitOf(cond, rn), w.orderSpec) match {
              case (Some(k),
                  Seq(SortOrder(score: Attribute, Descending, NullsLast, _),
                      SortOrder(tie: Attribute, Ascending, NullsFirst, _)))
                if k >= 1 &&
                  // grouped top-k only: an EMPTY partition spec is a
                  // GLOBAL top-k — ClusteredDistribution(Nil) is
                  // ill-formed (planner crash), and the single-group
                  // heap would be a one-reducer plan anyway; leave it
                  // to WindowExec / TakeOrdered
                  w.partitionSpec.nonEmpty &&
                  w.partitionSpec.forall(_.isInstanceOf[Attribute]) &&
                  projectList.forall(!_.references.contains(rn)) =>
                // InferWindowGroupLimit may already sit below; the heap
                // node subsumes its pruning — strip it
                val child = w.child match {
                  case wgl: WindowGroupLimit => wgl.child
                  case other => other
                }
                val groups = w.partitionSpec.map(_.asInstanceOf[Attribute])
                val needed = groups :+ score :+ tie
                if (needed.forall(child.outputSet.contains) &&
                    projectList.forall(_.references.subsetOf(child.outputSet)))
                  Some(Project(projectList,
                    TopKPerGroupNode(child, groups, score, tie, k)))
                else None
              case _ => None
            }
          case _ => None
        }
        swapped.getOrElse(p)
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
    // Resolve and validate the budget ON THE DRIVER: an executor-side
    // SQLConf.get only sees session overrides under SQLExecution conf
    // propagation (plans driven via queryExecution.toRdd, as Bench
    // does, would silently fall back to the default), and a malformed
    // value must be one clear driver error, not a failure in every
    // task. The parsed long is what the closure captures.
    val budget = {
      val raw = conf.getConfString(
        TopK.BudgetConfKey, TopK.DefaultBudgetBytes.toString)
      val parsed =
        try java.lang.Long.parseLong(raw.trim)
        catch { case e: NumberFormatException =>
          throw new IllegalArgumentException(
            s"${TopK.BudgetConfKey} must be a long byte count, got '$raw'", e) }
      if (parsed <= 0) throw new IllegalArgumentException(
        s"${TopK.BudgetConfKey} must be positive, got '$raw'")
      parsed
    }
    child.execute().mapPartitions { iter =>
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
            s"partitions, or set ${TopK.FallbackConfKey}=window to plan " +
            "the window spelling (row_number over partitionBy), which " +
            "sorts but spills.")
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

  /** Resilience switch: "exec" (default) plans [[TopKPerGroupExec]],
    * which fails fast past the budget; "window" plans the row_number
    * window spelling instead — a full per-group sort that spills to
    * disk rather than erroring, for pipelines that prefer degraded
    * throughput over a hard stop on a group-cardinality surprise. */
  val FallbackConfKey = "spark.graft.topk.fallback"

  /** Idempotently register the planner strategy and the SQL rewrite
    * rule on `spark` — after this, both the programmatic API and plain
    * SQL text reach [[TopKPerGroupExec]]. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    if (!spark.experimental.extraOptimizations.contains(TopKSqlRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKSqlRewrite
  }

  /** Top `k` rows per group by (`scoreCol` DESC, `tieCol` ASC). Columns
    * are resolved against `df`'s analyzed plan; the planner strategy is
    * registered on the session on first use. Honors
    * [[FallbackConfKey]] = "window". */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], scoreCol: String,
      tieCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    register(spark)
    if (spark.conf.get(FallbackConfKey, "exec") == "window") {
      import org.apache.spark.sql.expressions.{Window => W}
      import org.apache.spark.sql.functions.{col, row_number}
      val w = W.partitionBy(groupCols.map(col): _*)
        .orderBy(col(scoreCol).desc, col(tieCol).asc)
      df.withColumn("__graft_topk_rn", row_number().over(w))
        .where(col("__graft_topk_rn") <= k)
        .drop("__graft_topk_rn")
    } else {
      val analyzed = df.queryExecution.analyzed
      def attr(n: String): Attribute =
        analyzed.output.find(_.name == n).getOrElse(
          throw new IllegalArgumentException(
            s"column $n not in ${analyzed.output.map(_.name).mkString(", ")}"))
      Bridge.ofRows(spark, TopKPerGroupNode(analyzed,
        groupCols.map(attr), attr(scoreCol), attr(tieCol), k))
    }
  }
}
