package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import QueryDefs._

/** Layer-B relational surface (SURVEY.md §2b): the analytical-SQL
  * capabilities the reference delegates to its embedded engine through
  * `con.SendQuery` (/root/reference/main.cc:181-182), re-expressed as
  * declarative Spark DataFrame plans so Catalyst handles pushdown,
  * pruning, join strategy and whole-stage codegen.
  *
  * Every query has a DuckDB oracle twin in [[oracles]] with identical
  * column names and a total ORDER BY (driver hash-compares results).
  * Scale notes are inline per query.
  */
object Relational {

  /** Decimal-exact sum spelled for the DuckDB oracle. */
  private def oSum(x: String) =
    s"CAST(SUM(CAST(($x) AS DECIMAL(30,4))) AS DOUBLE)"
  private def oAvg(x: String) =
    s"CAST(SUM(CAST(($x) AS DECIMAL(30,4))) AS DOUBLE) / COUNT(*)"

  val defs: Map[String, Q] = Map(

    // ---- flagship: the reference's only query shape ------------------
    // SELECT * FROM '<file>' WHERE ke > θ  (main.cc:164-169, 405-406);
    // `l_extendedprice` stands in for `ke` (FIXTURES.md). Filter is pushed
    // to Parquet row-group stats; no shuffle except the final sort (which
    // exists only for the deterministic oracle compare — the reference
    // streams results unsorted).
    "q_flagship_scan" -> ((s, d) => {
      Tables.lineitem(s, d)
        .where(col("l_extendedprice") > lit(95000.0))
        .withColumn("l_shipdate", col("l_shipdate").cast("date"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax"), col("l_returnflag"),
          col("l_linestatus"), col("l_shipdate"))
    }),

    // ---- projection / expressions ------------------------------------
    // Column pruning: only 6 of 11 lineitem columns reach the scan
    // (ReadSchema in explain). Per-row double arithmetic is IEEE-identical
    // across engines, so no rounding needed.
    "q_projection_expr" -> ((s, d) => {
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("net_price"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
          (lit(1.0) + col("l_tax"))).as("charged"),
        concat(col("l_returnflag"), lit("/"), col("l_linestatus"))
          .as("flag_status"),
        (col("l_quantity") * lit(2.0)).as("double_qty"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("net_price"),
          col("charged"), col("flag_status"), col("double_qty"))
    }),

    // ---- filters ------------------------------------------------------
    // Conjunctive predicate + BETWEEN + IN + LIKE + date range. All of it
    // is pushed down (PushedFilters) except LIKE '%..%' which Parquet
    // can't use for row-group skipping; Catalyst still evaluates it
    // codegen'd post-scan.
    "q_filter_predicates" -> ((s, d) => {
      Tables.orders(s, d)
        .where(col("o_orderstatus").isin("F", "O") &&
          col("o_totalprice").between(200000.0, 400000.0) &&
          col("o_orderpriority").like("1%") &&
          col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderdate").cast("date").as("o_date"),
          col("o_orderpriority"))
        .orderBy(col("o_orderkey"))
    }),

    // ---- joins --------------------------------------------------------
    // Broadcast inner join: part (200*sf rows) is broadcast, so the
    // lineitem side never shuffles — the right plan at 100 TB when the
    // dimension fits in spark.sql.autoBroadcastJoinThreshold.
    "q_join_broadcast" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(dsum(col("l_extendedprice")).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("p_brand"))
    }),

    // Shuffle join on the two biggest tables. At scale this is a
    // sort-merge/shuffled-hash join on l_orderkey; AQE picks the
    // strategy. Co-partitioning both sides on the join key (bucketing in
    // a real deployment) would remove the shuffle entirely.
    "q_join_shuffle" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_lines"),
          dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("o_orderstatus"))
    }),

    // Left outer join keeping customers with no orders (null-extension
    // semantics checked against the oracle).
    "q_join_left" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_spent"))
        .orderBy(col("c_custkey"))
    }),

    // Semi/anti joins: EXISTS / NOT EXISTS without materializing the
    // right side's columns — cheaper than inner+distinct at scale.
    "q_join_semi" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
        .where(col("o_totalprice") > 400000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    }),

    "q_join_anti" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
        .orderBy(col("c_custkey"))
    }),

    // Theta/range join (non-equi): parts priced within a band around
    // each supplier's balance percentile — small×small, so Spark's
    // BroadcastNestedLoopJoin is the right physical plan; at scale a
    // range-bucketing prepass would bound the cross product.
    "q_join_range" -> ((s, d) => {
      val sup = Tables.supplier(s, d)
      val p = Tables.part(s, d)
      sup.join(p,
          p("p_retailprice").between(
            sup("s_acctbal") / lit(10.0) - lit(50.0),
            sup("s_acctbal") / lit(10.0) + lit(50.0)))
        .groupBy(col("s_suppkey"), col("s_name"))
        .agg(count(lit(1)).as("n_parts"),
          dsum(col("p_retailprice")).as("sum_price"))
        .orderBy(col("s_suppkey"))
    }),

    // Multiway star join: lineitem → supplier → nation → region, the
    // dimension chain fully broadcast (each hop is tiny); one shuffle
    // total for the final groupBy.
    "q_join_star" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val sup = Tables.supplier(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // Full outer join: keep both null-extension directions — high-balance
    // customers with no orders AND order-placing customers filtered out of
    // the left side. Spark cannot broadcast a full outer join (both sides
    // may need null extension), so this is inherently a two-sided shuffle
    // on the key — the right default at 100 TB; pre-bucketing both sides
    // on custkey is the shuffle-free deployment shape.
    "q_join_full" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .where(col("c_acctbal") > 5000.0)
        .select(col("c_custkey"), col("c_name"))
      val o = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("spent"))
      c.join(o, c("c_custkey") === o("o_custkey"), "full")
        .select(coalesce(c("c_custkey"), o("o_custkey")).as("cust_id"),
          col("c_name"), col("n_orders"), col("spent"))
        .orderBy(col("cust_id"))
    }),

    // Explicit cross join (the deliberate small×small case): every
    // region paired with every nation. The ONLY sound use at scale is
    // tiny×anything (here 5×25); Spark plans BroadcastNestedLoopJoin and
    // rightly demands the explicit crossJoin call so an accidental
    // missing join condition can't silently go quadratic.
    "q_join_cross" -> ((s, d) => {
      Tables.region(s, d).select(col("r_name"))
        .crossJoin(Tables.nation(s, d).select(col("n_name")))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // ---- aggregation ---------------------------------------------------
    // TPC-H Q1 shape: partial aggregation map-side, single shuffle on the
    // (tiny-cardinality) group key. dsum/davg keep double sums
    // order-independent for the oracle hash (QueryDefs).
    // TPC-H Q3 analogue (shipping-priority): the canonical 3-way
    // fact⋈fact⋈dim analytics join — segment-filtered customers prune
    // orders, date predicates prune BOTH fact scans (pushdown asserted
    // in PlanSpec), revenue aggregates per order, top-10 by revenue.
    // Scale shape: the customer keys broadcast; orders⋈lineitem is the
    // one real shuffle (both sides pre-filtered in their scans); the
    // top-10 is a TakeOrdered, never a global sort. Revenue rides dsum
    // (order-free decimal sum) so the double ranking key is
    // bit-identical cross-engine; ties break by order key.
    "q_tpch_q3" -> ((s, d) => {
      val cut = lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))
      val c = Tables.customer(s, d)
        .where(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val o = Tables.orders(s, d).where(col("o_orderdate") < cut)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate"), col("o_orderpriority"))
      val l = Tables.lineitem(s, d).where(col("l_shipdate") > cut)
        .select(col("l_orderkey"), col("l_extendedprice"),
          col("l_discount"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_orderpriority"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"),
          col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q18 analogue (large-volume customers): orders whose total
    // line quantity exceeds 200, with their customer and quantity sum —
    // the classic HAVING-subquery semi-join shape. Scale shape: the
    // qualifying-order set comes from ONE lineitem aggregate (map-side
    // partials; output ∝ qualifying orders, a tiny fraction) and
    // re-enters as a BROADCAST semi join pruning lineitem AND orders
    // before the wide join — the fact table never joins anything it
    // will discard; customer broadcasts as a dim; top-100 is
    // distributed TakeOrdered (o_orderkey tiebreak added to the
    // spec's ordering for hash-determinism).
    "q_tpch_q18" -> ((s, d) => {
      val big = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(dsum(col("l_quantity")).as("oq"))
        .where(col("oq") > 200.0)
        .select(col("l_orderkey").as("big_ok"))
      val l = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity"))
        .join(broadcast(big), col("l_orderkey") === col("big_ok"),
          "left_semi")
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate"), col("o_totalprice"))
        .join(broadcast(big), col("o_orderkey") === col("big_ok"),
          "left_semi")
      val c = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd")
            .as("o_orderdate"),
          col("o_totalprice"))
        .agg(dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderdate"),
          col("o_orderkey"))
        .limit(100)
    }),

    // TPC-H Q5 analogue (local-supplier volume): the 6-table snowflake
    // — region filters nation, nation keys both customer AND supplier
    // (the "local supplier" equality c_nationkey = s_nationkey makes
    // this the classic cyclic-join shape), revenue per nation. Scale
    // shape: region/nation/supplier/customer-keys all broadcast (dims);
    // the only data-sized shuffles are lineitem⋈orders and
    // orders⋈customer on their join keys; the output is |nations| rows.
    "q_tpch_q5" -> ((s, d) => {
      val nat = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)
          .where(col("r_name") === "AFRICA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val c = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"))
      val o = Tables.orders(s, d)
        .where(col("o_orderdate") >=
            lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("o_orderdate") <
            lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
        .select(col("o_orderkey"), col("o_custkey"))
      val sup = Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey"))
      val l = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey") &&
          c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(nat), c("c_nationkey") === nat("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    "q_agg_pricing_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .where(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("2000-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_extendedprice")).as("max_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Exact distinct aggregation (expands to a two-phase plan in Spark).
    "q_agg_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    }),

    // HAVING: post-aggregation filter.
    "q_agg_having" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("spent"))
        .where(col("n_orders") >= 12)
        .orderBy(col("o_custkey"))
    }),

    // ROLLUP / CUBE: hierarchical and full grouping-set expansion;
    // grouping_id() disambiguates NULL-as-subtotal from NULL data.
    "q_agg_rollup" -> ((s, d) => {
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"),
          grouping_id().cast("int").as("gid"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    "q_agg_cube" -> ((s, d) => {
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"),
          grouping_id().cast("int").as("gid"))
        .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    }),

    // GROUPING SETS via SQL (no DataFrame-DSL equivalent in Spark).
    "q_agg_grouping_sets" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql("""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
      """)
    }),

    // Statistical moments (variance / stddev / covariance / correlation)
    // computed from decimal-exact sufficient statistics in ONE pass: n,
    // Σx, Σx², Σy, Σy², Σxy accumulate as decimals (associative →
    // order-independent across partitions, unlike the built-in stddev/
    // corr whose float accumulation is shuffle-order-dependent), then the
    // moments are derived in a fixed sequence of correctly-rounded IEEE
    // double ops both engines evaluate identically. This is also THE
    // distributed shape: six map-side-combined aggregates, one shuffle of
    // (flag, six-decimal) partials, derivation on k final rows.
    "q_agg_stats" -> ((s, d) => {
      val x = col("l_quantity")
      val y = col("l_extendedprice")
      val dec = "decimal(30,4)"
      val g = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(x.cast(dec)).as("sx"), sum((x * x).cast(dec)).as("sxx"),
          sum(y.cast(dec)).as("sy"), sum((y * y).cast(dec)).as("syy"),
          sum((x * y).cast(dec)).as("sxy"))
      def dbl(c: String) = col(c).cast("double")
      val nD = col("n").cast("double")
      val mxx = dbl("sxx") - dbl("sx") * dbl("sx") / nD
      val myy = dbl("syy") - dbl("sy") * dbl("sy") / nD
      val mxy = dbl("sxy") - dbl("sx") * dbl("sy") / nD
      // Outputs are fixed-point-quantized: the sufficient statistics are
      // decimal-exact, but their conversion to double is NOT bit-identical
      // across engines (DuckDB scales an int128 where the JVM rounds a
      // BigDecimal — found as a last-ulp corr mismatch at sf0.001), and
      // the cancellation in sxx - sx²/n amplifies that ulp. Quantizing
      // the derived moments absorbs conversion noise the same way the
      // library quantizes transcendentals.
      g.select(col("l_returnflag"), col("n"),
          floor((mxx / (nD - lit(1.0))) * lit(1e6)).cast("long").as("var_q6"),
          floor(sqrt(mxx / (nD - lit(1.0))) * lit(1e6)).cast("long")
            .as("stddev_q6"),
          floor((mxy / (nD - lit(1.0))) * lit(1e6)).cast("long").as("covar_q6"),
          floor((mxy / sqrt(mxx * myy)) * lit(1e9)).cast("long").as("corr_q9"))
        .orderBy(col("l_returnflag"))
    }),

    // ---- window functions ---------------------------------------------
    // Ranking family over a deterministic (unique-key) order.
    "q_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"))
        .where(col("rn") <= 20)
        .orderBy(col("o_orderstatus"), col("rn"))
    }),

    // Frame aggregates + lag/lead. The frame sum goes through an exact
    // decimal so segment-tree vs running-sum evaluation order can't
    // change the hash. Partitioned by o_custkey (high cardinality): a
    // window over a 3-value column would serialize into 3 tasks at scale.
    "q_window_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      val wf = w.rowsBetween(-2, 0)
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          sum(col("o_totalprice").cast("decimal(30,4)")).over(wf)
            .cast("double").as("moving_sum3"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          first(col("o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, 0))
            .as("first_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // ---- sort / limit / top-k -----------------------------------------
    // Total order + LIMIT compiles to TakeOrderedAndProject: each
    // partition keeps only its local top-k, then the driver merges k*P
    // rows — no full sort at scale.
    "q_sort_topk" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)
    }),

    // ---- set operations -------------------------------------------------
    "q_set_union_all" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .select(col("c_nationkey").as("nationkey"), lit("customer").as("side"))
      val sup = Tables.supplier(s, d)
        .select(col("s_nationkey").as("nationkey"), lit("supplier").as("side"))
      c.unionAll(sup)
        .groupBy(col("nationkey"), col("side"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("nationkey"), col("side"))
    }),

    "q_set_intersect" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      val sup = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
      c.intersect(sup).orderBy(col("nationkey"))
    }),

    "q_set_except" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      val sup = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
      c.except(sup).orderBy(col("nationkey"))
    }),

    "q_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Multiset (ALL) set-op variants — bag semantics, no dedup pass.
    "q_set_except_all" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      val sup = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
      c.exceptAll(sup).groupBy(col("nationkey"))
        .agg(count(lit(1)).as("n")).orderBy(col("nationkey"))
    }),

    "q_set_intersect_all" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      val sup = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
      c.intersectAll(sup).groupBy(col("nationkey"))
        .agg(count(lit(1)).as("n")).orderBy(col("nationkey"))
    }),

    // Generator / UDTF surface: posexplode (lateral view) over tokens.
    "q_generator" -> ((s, d) => {
      Tables.documents(s, d)
        .where(col("doc_id") < 50)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .toDF("doc_id", "pos", "token")
        .orderBy(col("doc_id"), col("pos"))
    }),

    // Custom UDTF: the native word_ngrams Generator (one Generate
    // operator, no intermediate per-row n-gram array — see
    // graft.functions.WordNgramsGenerator). The built-in-generator twin
    // is q_generator; this row is the (c)-path extension surface.
    "q_udtf_ngrams" -> ((s, d) => {
      import graft.functions.WordNgramsGenerator.word_ngrams
      Tables.documents(s, d)
        .where(col("doc_id") < 30)
        .select(col("doc_id"), word_ngrams(col("text"), 3))
        .orderBy(col("doc_id"), col("pos"))
    }),

    // ---- subqueries / CTE ----------------------------------------------
    // Scalar subquery in a filter; decorrelated by Catalyst. The
    // threshold is decimal-exact so both engines agree on boundary rows.
    "q_subquery_scalar" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql("""
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 1.5 * (
          SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE)
                 / COUNT(*) FROM orders)
        ORDER BY o_orderkey
      """)
    }),

    "q_subquery_in" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql("""
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_nationkey IN (
          SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
        ORDER BY c_custkey
      """)
    }),

    "q_subquery_exists" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql("""
        SELECT c_custkey, c_acctbal
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 450000)
        ORDER BY c_custkey
      """)
    }),

    "q_cte" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql("""
        WITH big_orders AS (
          SELECT o_custkey, COUNT(*) AS n_big
          FROM orders WHERE o_totalprice > 300000
          GROUP BY o_custkey
        )
        SELECT c.c_custkey, c.c_name, b.n_big
        FROM customer c JOIN big_orders b ON c.c_custkey = b.o_custkey
        ORDER BY c.c_custkey
      """)
    }),

    // Recursive CTE (Spark 4): per-seed halving chain walked to the
    // root — each recursion step joins the previous frontier only, so
    // work per round is |frontier|, not |table|, and the engine stops
    // when the frontier empties. The declarative twin of the driver-loop
    // label propagation in q_dedup_clusters; at 100 TB the loop form
    // wins (checkpointing, convergence control), but the surface must
    // exist for queries that are naturally hierarchical.
    "q_recursive_cte" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql("""
        WITH RECURSIVE chain(start_key, k, depth) AS (
          SELECT o_orderkey, o_orderkey, 0
          FROM orders WHERE o_orderkey % 997 = 0
          UNION ALL
          SELECT start_key, k div 2, depth + 1 FROM chain WHERE k > 1
        )
        SELECT start_key, MAX(depth) AS chain_len, SUM(k) AS path_sum
        FROM chain GROUP BY start_key ORDER BY start_key
      """)
    }),

    // VARIANT (Spark 4 semi-structured type): construct JSON once,
    // parse_json into the shredded binary encoding, then extract MANY
    // typed paths with variant_get — no per-field re-parse, which is
    // the at-scale story for telemetry columns (parse on ingest, read
    // fields for free). The oracle checks the round-trip recovers the
    // source values exactly.
    "q_json_variant" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"),
          concat(lit("{\"k\": "), get_json_object(col("props"), "$.k"),
            lit(", \"u\": "), col("user_id"),
            lit(", \"tag\": \""), col("event_type"), lit("\"}")).as("js"))
        .select(col("event_id"), parse_json(col("js")).as("v"))
        .select(col("event_id"),
          expr("variant_get(v, '$.k', 'int')").as("k_val"),
          expr("variant_get(v, '$.u', 'long')").as("u_val"),
          expr("variant_get(v, '$.tag', 'string')").as("tag"))
        .where(col("k_val") % 10 === 0)
        .orderBy(col("event_id"))
    }),

    // ---- scalar function library ----------------------------------------
    "q_string_funcs" -> ((s, d) => {
      Tables.part(s, d).select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        lower(col("p_brand")).as("lbrand"),
        substring(col("p_type"), 1, 3).as("type3"),
        length(col("p_name")).as("name_len"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_extract(col("p_brand"), "#(\\d+)", 1).cast("int").as("brand_num"),
        col("p_name").like("%a%").as("has_a"),
        trim(lit("  pad  ")).as("trimmed"),
        lpad(col("p_brand"), 12, "*").as("padded"))
        .orderBy(col("p_partkey"))
    }),

    "q_date_funcs" -> ((s, d) => {
      Tables.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("q"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        datediff(lit(java.sql.Date.valueOf("2002-01-01")),
          col("o_orderdate").cast("date")).as("days_to_2002"))
        .orderBy(col("o_orderkey"))
    }),

    "q_math_funcs" -> ((s, d) => {
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - lit(0.05)).as("abs_dev"),
        round(col("l_extendedprice"), 0).as("rounded"),
        floor(col("l_quantity")).as("fl"),
        ceil(col("l_quantity")).as("ce"),
        sqrt(col("l_extendedprice")).as("sq"),
        // pow/ln differ from DuckDB's libm by ≤1 ulp; quantize via
        // floor-scaling so the oracle hash is stable.
        floor(pow(col("l_discount"), lit(2.0)) * lit(1e6)).cast("long")
          .as("disc_sq_u"),
        (col("l_orderkey") % lit(7L)).as("mod7"),
        floor(ln(col("l_extendedprice")) * lit(1000.0)).cast("long")
          .as("log_price_m"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("rounded"),
          col("fl"), col("sq"))
    }),

    "q_case_cast" -> ((s, d) => {
      Tables.orders(s, d).select(
        col("o_orderkey"),
        when(col("o_totalprice") > 350000.0, lit("high"))
          .when(col("o_totalprice") > 150000.0, lit("mid"))
          .otherwise(lit("low")).as("bucket"),
        col("o_orderkey").cast("string").as("key_str"),
        floor(col("o_totalprice")).cast("long").as("price_floor"),
        col("o_orderstatus").isNotNull.as("has_status"))
        .orderBy(col("o_orderkey"))
    }),

    // JSON extraction over events.props (schema-on-read semi-structured
    // column, the `from_json`/`get_json_object` row of SURVEY §2b).
    "q_json_extract" -> ((s, d) => {
      Tables.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_val"))
        .where(col("k_val") > 50)
        .orderBy(col("event_id"))
    }),

    // Array/higher-order functions over embeddings (norms computed with
    // an exact decimal fold so element order can't shift the hash).
    "q_array_funcs" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      emb.select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).cast("double").as("first_elem"),
        aggregate(
          // widen float→double before arithmetic: float→decimal rounding
          // differs between engines, double→decimal agrees
          transform(col("embedding").cast("array<double>"),
            x => (x * x).cast("decimal(30,8)")),
          lit(0).cast("decimal(30,8)"),
          (acc, x) => (acc + x).cast("decimal(30,8)")).cast("double")
          .as("norm_sq"))
        .orderBy(col("vec_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_flagship_scan" ->
      """SELECT * REPLACE (CAST(l_shipdate AS DATE) AS l_shipdate)
        |FROM lineitem WHERE l_extendedprice > 95000.0
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |  l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag,
        |  l_linestatus, CAST(l_shipdate AS DATE)""".stripMargin,

    "q_projection_expr" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1.0 - l_discount) AS net_price,
        |  l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charged,
        |  l_returnflag || '/' || l_linestatus AS flag_status,
        |  l_quantity * 2.0 AS double_qty
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, net_price, charged,
        |  flag_status, double_qty""".stripMargin,

    "q_filter_predicates" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  CAST(o_orderdate AS DATE) AS o_date, o_orderpriority
        |FROM orders
        |WHERE o_orderstatus IN ('F','O')
        |  AND o_totalprice BETWEEN 200000.0 AND 400000.0
        |  AND o_orderpriority LIKE '1%'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |ORDER BY o_orderkey""".stripMargin,

    "q_join_broadcast" ->
      s"""SELECT p_brand, ${oSum("l_extendedprice")} AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_join_shuffle" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n_lines,
         |  ${oSum("l_extendedprice")} AS sum_price
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_join_left" ->
      s"""SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
         |  COALESCE(${oSum("o_totalprice")}, 0.0) AS total_spent
         |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders
        |                    WHERE o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name, c_nationkey
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_range" ->
      s"""SELECT s_suppkey, s_name, COUNT(*) AS n_parts,
         |  ${oSum("p_retailprice")} AS sum_price
         |FROM supplier JOIN part
         |  ON p_retailprice BETWEEN s_acctbal / 10.0 - 50.0
         |                       AND s_acctbal / 10.0 + 50.0
         |GROUP BY s_suppkey, s_name ORDER BY s_suppkey""".stripMargin,

    "q_join_star" ->
      s"""SELECT r_name, n_name,
         |  ${oSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q_join_full" ->
      s"""WITH c AS (SELECT c_custkey, c_name FROM customer
         |           WHERE c_acctbal > 5000.0),
         |o AS (SELECT o_custkey, COUNT(*) AS n_orders,
         |        ${oSum("o_totalprice")} AS spent
         |      FROM orders GROUP BY o_custkey)
         |SELECT COALESCE(c.c_custkey, o.o_custkey) AS cust_id,
         |  c.c_name, o.n_orders, o.spent
         |FROM c FULL JOIN o ON c.c_custkey = o.o_custkey
         |ORDER BY cust_id""".stripMargin,

    "q_join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,

    // Same sufficient-statistics derivation, spelled as the identical
    // IEEE double op sequence (decimal sums are exact; every subsequent
    // -, *, /, SQRT is one correctly-rounded double op in both engines).
    "q_agg_stats" ->
      """WITH a AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    SUM(CAST(l_quantity AS DECIMAL(30,4))) AS sx,
        |    SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,4))) AS sxx,
        |    SUM(CAST(l_extendedprice AS DECIMAL(30,4))) AS sy,
        |    SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,4)))
        |      AS syy,
        |    SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(30,4))) AS sxy
        |  FROM lineitem GROUP BY l_returnflag),
        |m AS (
        |  SELECT l_returnflag, n, CAST(n AS DOUBLE) AS nd,
        |    CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS mxx,
        |    CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS myy,
        |    CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS mxy
        |  FROM a)
        |SELECT l_returnflag, n,
        |  CAST(FLOOR(mxx / (nd - 1.0) * 1e6) AS BIGINT) AS var_q6,
        |  CAST(FLOOR(SQRT(mxx / (nd - 1.0)) * 1e6) AS BIGINT) AS stddev_q6,
        |  CAST(FLOOR(mxy / (nd - 1.0) * 1e6) AS BIGINT) AS covar_q6,
        |  CAST(FLOOR(mxy / SQRT(mxx * myy) * 1e9) AS BIGINT) AS corr_q9
        |FROM m ORDER BY l_returnflag""".stripMargin,

    "q_tpch_q3" ->
      s"""SELECT l.l_orderkey,
         |  ${oSum("l.l_extendedprice * (1.0 - l.l_discount)")} AS revenue,
         |  strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
         |  o.o_orderpriority
         |FROM customer c
         |JOIN orders o ON c.c_custkey = o.o_custkey
         |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |WHERE c.c_mktsegment = 'BUILDING'
         |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY l.l_orderkey, strftime(o.o_orderdate, '%Y-%m-%d'),
         |  o.o_orderpriority
         |ORDER BY revenue DESC, l.l_orderkey
         |LIMIT 10""".stripMargin,

    "q_tpch_q18" ->
      s"""WITH big AS (
         |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
         |  HAVING ${oSum("l_quantity")} > 200.0)
         |SELECT c.c_name, c.c_custkey, o.o_orderkey,
         |  strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
         |  o.o_totalprice, ${oSum("l.l_quantity")} AS sum_qty
         |FROM customer c
         |JOIN orders o ON c.c_custkey = o.o_custkey
         |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         |WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
         |GROUP BY c.c_name, c.c_custkey, o.o_orderkey,
         |  strftime(o.o_orderdate, '%Y-%m-%d'), o.o_totalprice
         |ORDER BY o.o_totalprice DESC, o_orderdate, o.o_orderkey
         |LIMIT 100""".stripMargin,

    "q_tpch_q5" ->
      s"""SELECT n.n_name,
         |  ${oSum("l.l_extendedprice * (1.0 - l.l_discount)")} AS revenue
         |FROM customer c
         |JOIN orders o ON c.c_custkey = o.o_custkey
         |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |  AND c.c_nationkey = s.s_nationkey
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |JOIN region r ON n.n_regionkey = r.r_regionkey
         |WHERE r.r_name = 'AFRICA'
         |  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY n.n_name
         |ORDER BY revenue DESC, n.n_name""".stripMargin,

    "q_agg_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${oSum("l_quantity")} AS sum_qty,
         |  ${oSum("l_extendedprice")} AS sum_base_price,
         |  ${oSum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  ${oAvg("l_quantity")} AS avg_qty,
         |  ${oAvg("l_extendedprice")} AS avg_price,
         |  MIN(l_quantity) AS min_qty,
         |  MAX(l_extendedprice) AS max_price,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_agg_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_agg_having" ->
      s"""SELECT o_custkey, COUNT(*) AS n_orders,
         |  ${oSum("o_totalprice")} AS spent
         |FROM orders GROUP BY o_custkey
         |HAVING COUNT(*) >= 12 ORDER BY o_custkey""".stripMargin,

    "q_agg_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         |  ${oSum("l_quantity")} AS qty,
         |  CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY gid, l_returnflag ASC NULLS FIRST,
         |  l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_agg_cube" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         |  ${oSum("o_totalprice")} AS total,
         |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid
         |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         |ORDER BY gid, o_orderstatus ASC NULLS FIRST,
         |  o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q_agg_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         |  ${oSum("l_quantity")} AS qty
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         |ORDER BY l_returnflag ASC NULLS FIRST,
         |  l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_window_rank" ->
      """SELECT * FROM (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice,
        |    ROW_NUMBER() OVER w AS rn,
        |    RANK() OVER w AS rnk,
        |    DENSE_RANK() OVER w AS drnk,
        |    NTILE(4) OVER w AS quartile
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_orderstatus
        |               ORDER BY o_totalprice DESC, o_orderkey)
        |) WHERE rn <= 20 ORDER BY o_orderstatus, rn""".stripMargin,

    "q_window_frame" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderkey
        |     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS moving_sum3,
        |  LAG(o_totalprice, 1) OVER w AS prev_price,
        |  LEAD(o_totalprice, 1) OVER w AS next_price,
        |  FIRST_VALUE(o_totalprice) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS first_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_sort_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,

    "q_set_union_all" ->
      """SELECT nationkey, side, COUNT(*) AS n FROM (
        |  SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
        |) GROUP BY nationkey, side ORDER BY nationkey, side""".stripMargin,

    "q_set_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "q_set_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_set_except_all" ->
      """SELECT nationkey, COUNT(*) AS n FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  EXCEPT ALL
        |  SELECT s_nationkey AS nationkey FROM supplier
        |) GROUP BY nationkey ORDER BY nationkey""".stripMargin,

    "q_set_intersect_all" ->
      """SELECT nationkey, COUNT(*) AS n FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  INTERSECT ALL
        |  SELECT s_nationkey AS nationkey FROM supplier
        |) GROUP BY nationkey ORDER BY nationkey""".stripMargin,

    "q_generator" ->
      """SELECT doc_id, generate_subscripts(w, 1) - 1 AS pos,
        |  UNNEST(w) AS token
        |FROM (SELECT doc_id, string_split(text, ' ') AS w
        |      FROM documents WHERE doc_id < 50)
        |ORDER BY doc_id, pos""".stripMargin,

    // The two UNNESTs zip positionally (same length); the clamped slice
    // w[i:i+2] reproduces the short-text guard (whole text at pos 0).
    "q_udtf_ngrams" ->
      """SELECT doc_id,
        |  UNNEST(generate_series(1, GREATEST(len(w) - 2, 1))) - 1 AS pos,
        |  UNNEST(list_transform(generate_series(1, GREATEST(len(w) - 2, 1)),
        |    i -> array_to_string(w[i:i+2], ' '))) AS ngram
        |FROM (SELECT doc_id, string_split(text, ' ') AS w
        |      FROM documents WHERE doc_id < 30)
        |ORDER BY doc_id, pos""".stripMargin,

    "q_subquery_scalar" ->
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |WHERE o_totalprice > 1.5 * (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE)
        |         / COUNT(*) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    "q_subquery_in" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE c_nationkey IN (
        |  SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
        |ORDER BY c_custkey""".stripMargin,

    "q_subquery_exists" ->
      """SELECT c_custkey, c_acctbal
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,

    "q_cte" ->
      """WITH big_orders AS (
        |  SELECT o_custkey, COUNT(*) AS n_big
        |  FROM orders WHERE o_totalprice > 300000
        |  GROUP BY o_custkey
        |)
        |SELECT c.c_custkey, c.c_name, b.n_big
        |FROM customer c JOIN big_orders b ON c.c_custkey = b.o_custkey
        |ORDER BY c.c_custkey""".stripMargin,

    "q_recursive_cte" ->
      """WITH RECURSIVE chain(start_key, k, depth) AS (
        |  SELECT o_orderkey, o_orderkey, 0
        |  FROM orders WHERE o_orderkey % 997 = 0
        |  UNION ALL
        |  SELECT start_key, k // 2, depth + 1 FROM chain WHERE k > 1
        |)
        |SELECT start_key, MAX(depth) AS chain_len,
        |  CAST(SUM(k) AS BIGINT) AS path_sum
        |FROM chain GROUP BY start_key ORDER BY start_key""".stripMargin,

    // The VARIANT round-trip must recover the source values, so the
    // oracle reads them straight from the columns the JSON was built of.
    "q_json_variant" ->
      """SELECT event_id,
        |  CAST(json_extract(props, '$.k') AS INT) AS k_val,
        |  user_id AS u_val, event_type AS tag
        |FROM events
        |WHERE CAST(json_extract(props, '$.k') AS INT) % 10 = 0
        |ORDER BY event_id""".stripMargin,

    "q_string_funcs" ->
      """SELECT p_partkey,
        |  UPPER(p_name) AS uname,
        |  LOWER(p_brand) AS lbrand,
        |  SUBSTRING(p_type, 1, 3) AS type3,
        |  CAST(LENGTH(p_name) AS INT) AS name_len,
        |  CONCAT_WS('-', p_brand, p_type) AS brand_type,
        |  CAST(REGEXP_EXTRACT(p_brand, '#(\d+)', 1) AS INT) AS brand_num,
        |  p_name LIKE '%a%' AS has_a,
        |  TRIM('  pad  ') AS trimmed,
        |  LPAD(p_brand, 12, '*') AS padded
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(YEAR(o_orderdate) AS INT) AS y,
        |  CAST(MONTH(o_orderdate) AS INT) AS m,
        |  CAST(DAYOFMONTH(o_orderdate) AS INT) AS dom,
        |  CAST(QUARTER(o_orderdate) AS INT) AS q,
        |  CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
        |  CAST(DATE '2002-01-01' - CAST(o_orderdate AS DATE) AS INT)
        |    AS days_to_2002
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  ABS(l_discount - 0.05) AS abs_dev,
        |  ROUND(l_extendedprice, 0) AS rounded,
        |  CAST(FLOOR(l_quantity) AS BIGINT) AS fl,
        |  CAST(CEIL(l_quantity) AS BIGINT) AS ce,
        |  SQRT(l_extendedprice) AS sq,
        |  CAST(FLOOR(POW(l_discount, 2.0) * 1e6) AS BIGINT) AS disc_sq_u,
        |  l_orderkey % 7 AS mod7,
        |  CAST(FLOOR(LN(l_extendedprice) * 1000.0) AS BIGINT) AS log_price_m
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, rounded, fl, sq""".stripMargin,

    "q_case_cast" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 350000.0 THEN 'high'
        |       WHEN o_totalprice > 150000.0 THEN 'mid'
        |       ELSE 'low' END AS bucket,
        |  CAST(o_orderkey AS VARCHAR) AS key_str,
        |  CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
        |  o_orderstatus IS NOT NULL AS has_status
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_json_extract" ->
      """SELECT event_id,
        |  CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT) AS k_val
        |FROM events
        |WHERE CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT) > 50
        |ORDER BY event_id""".stripMargin,

    "q_array_funcs" ->
      """SELECT vec_id,
        |  CAST(LEN(embedding) AS INT) AS dim,
        |  CAST(embedding[1] AS DOUBLE) AS first_elem,
        |  (SELECT CAST(SUM(CAST(x * x AS DECIMAL(30,8))) AS DOUBLE)
        |   FROM UNNEST(CAST(embedding AS DOUBLE[])) AS t(x)) AS norm_sq
        |FROM embeddings ORDER BY vec_id""".stripMargin
  )
}
