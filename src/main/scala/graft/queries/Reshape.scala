package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import QueryDefs._

/** Row/column reshaping and correlation surface: lateral joins, unpivot
  * (wide→long melt), union-by-name schema alignment, navigation window
  * functions, and map-typed column manipulation. These round out the
  * §2b relational families with the shapes analysts reach for when the
  * data's layout — not its content — is the problem.
  */
object Reshape {

  val defs: Map[String, Q] = Map(

    // Correlated LATERAL join: top-2 orders per customer. Catalyst
    // decorrelates the per-row ORDER BY ... LIMIT subquery into a
    // window-rank over a single join (DecorrelateInnerQuery) — the plan
    // has ONE shuffle on the join key, not a subquery-per-row loop, so
    // the same text survives a 1000-executor fan-out.
    "q_join_lateral" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql("""
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                 WHERE o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        WHERE c.c_custkey % 50 = 0
        ORDER BY c.c_custkey, t.o_orderkey
      """)
    }),

    // Unpivot (melt): wide per-flag quantity sums back to long form via
    // the Dataset.unpivot API — a pure projection+generate stage over the
    // 2-row wide aggregate (the expensive part is the upstream groupBy,
    // which shuffles once). COALESCE pins the absent-combination case to
    // 0 so null-retention semantics can't differ across engines.
    "q_unpivot" -> ((s, d) => {
      val wide = Tables.lineitem(s, d)
        .groupBy(col("l_linestatus"))
        .agg(
          coalesce(dsum(when(col("l_returnflag") === "A", col("l_quantity"))),
            lit(0.0)).as("qty_a"),
          coalesce(dsum(when(col("l_returnflag") === "N", col("l_quantity"))),
            lit(0.0)).as("qty_n"),
          coalesce(dsum(when(col("l_returnflag") === "R", col("l_quantity"))),
            lit(0.0)).as("qty_r"))
      wide.unpivot(
          Array(col("l_linestatus")),
          Array(col("qty_a"), col("qty_n"), col("qty_r")),
          "flag_col", "sum_qty")
        .orderBy(col("l_linestatus"), col("flag_col"))
    }),

    // unionByName with allowMissingColumns: schema-evolution append — the
    // second branch arrives with reordered columns and a missing one
    // (filled as NULL by name, never by position). This is how a 100 TB
    // corpus built over months of schema drift unions its generations
    // without silent column transposition.
    "q_union_by_name" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val a = o.where(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_totalprice"), lit("F").as("tag"))
      val b = o.where(col("o_orderstatus") === "O")
        .select(lit("O").as("tag"), col("o_orderkey"))
      a.unionByName(b, allowMissingColumns = true)
        .groupBy(col("tag"))
        .agg(count(lit(1)).as("n"),
          count(col("o_totalprice")).as("n_priced"),
          dsum(coalesce(col("o_totalprice"), lit(0.0))).as("total"))
        .orderBy(col("tag"))
    }),

    // Navigation window functions over a column with genuine NULLs
    // (value nulled deterministically on every third event): running
    // first_value IGNORE NULLS, nth_value, lag with default, lead. The
    // doubles pass through unchanged — no arithmetic — so both engines
    // emit identical bits. Filtered AFTER the windows (QUALIFY in the
    // oracle) so the sample reflects full-partition navigation state.
    "q_window_nav" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          when(col("event_id") % 3 === 0, lit(null).cast("double"))
            .otherwise(col("value")).as("v"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.select(col("event_id"), col("user_id"),
          first(col("v"), ignoreNulls = true).over(run).as("first_v"),
          nth_value(col("v"), 2).over(run).as("second_v"),
          lag(col("v"), 1, -1.0).over(w).as("prev_v"),
          lead(col("v"), 1).over(w).as("next_v"))
        .where(col("event_id") % 17 === 0)
        .orderBy(col("event_id"))
    }),

    // Map-typed columns: per-user event-type histogram built as a real
    // MapType (map_from_entries over one groupBy), rescaled with
    // transform_values, thresholded with map_filter, and exploded back to
    // rows for the comparator. Map ops are per-row expression work — the
    // only shuffles are the two aggregations; the map itself never
    // exceeds #event_types entries, so no row can balloon at scale.
    "q_map_funcs" -> ((s, d) => {
      val counts = Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      counts.groupBy(col("user_id"))
        .agg(map_from_entries(collect_list(struct(col("event_type"), col("n"))))
          .as("m"))
        .select(col("user_id"), size(col("m")).as("n_types"),
          expr("map_filter(transform_values(m, (k, v) -> v * 2)," +
            " (k, v) -> v >= 10)").as("m2"))
        .select(col("user_id"), col("n_types"), explode(col("m2")))
        .withColumnRenamed("key", "event_type")
        .withColumnRenamed("value", "n2")
        .orderBy(col("user_id"), col("event_type"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_join_lateral" ->
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
        |         WHERE o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |WHERE c.c_custkey % 50 = 0
        |ORDER BY c.c_custkey, t.o_orderkey""".stripMargin,

    "q_unpivot" ->
      """WITH w AS (
        |  SELECT l_linestatus,
        |    COALESCE(CAST(SUM(CAST(CASE WHEN l_returnflag = 'A'
        |      THEN l_quantity END AS DECIMAL(30,4))) AS DOUBLE), 0.0) AS qty_a,
        |    COALESCE(CAST(SUM(CAST(CASE WHEN l_returnflag = 'N'
        |      THEN l_quantity END AS DECIMAL(30,4))) AS DOUBLE), 0.0) AS qty_n,
        |    COALESCE(CAST(SUM(CAST(CASE WHEN l_returnflag = 'R'
        |      THEN l_quantity END AS DECIMAL(30,4))) AS DOUBLE), 0.0) AS qty_r
        |  FROM lineitem GROUP BY l_linestatus)
        |SELECT l_linestatus, flag_col, sum_qty FROM (
        |  SELECT l_linestatus, 'qty_a' AS flag_col, qty_a AS sum_qty FROM w
        |  UNION ALL
        |  SELECT l_linestatus, 'qty_n', qty_n FROM w
        |  UNION ALL
        |  SELECT l_linestatus, 'qty_r', qty_r FROM w)
        |ORDER BY l_linestatus, flag_col""".stripMargin,

    "q_union_by_name" ->
      """WITH u AS (
        |  SELECT o_orderkey, o_totalprice, 'F' AS tag
        |  FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT o_orderkey, CAST(NULL AS DOUBLE), 'O'
        |  FROM orders WHERE o_orderstatus = 'O')
        |SELECT tag, COUNT(*) AS n, COUNT(o_totalprice) AS n_priced,
        |  CAST(SUM(CAST(COALESCE(o_totalprice, 0.0) AS DECIMAL(30,4)))
        |    AS DOUBLE) AS total
        |FROM u GROUP BY tag ORDER BY tag""".stripMargin,

    "q_window_nav" ->
      """WITH e AS (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v
        |  FROM events)
        |SELECT event_id, user_id,
        |  FIRST_VALUE(v IGNORE NULLS) OVER run AS first_v,
        |  NTH_VALUE(v, 2) OVER run AS second_v,
        |  LAG(v, 1, -1.0) OVER w AS prev_v,
        |  LEAD(v, 1) OVER w AS next_v
        |FROM e
        |WINDOW
        |  w AS (PARTITION BY user_id ORDER BY ts, event_id),
        |  run AS (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |QUALIFY event_id % 17 = 0
        |ORDER BY event_id""".stripMargin,

    "q_map_funcs" ->
      """WITH c AS (
        |  SELECT user_id, event_type, COUNT(*) AS n
        |  FROM events GROUP BY user_id, event_type),
        |s AS (SELECT user_id, CAST(COUNT(*) AS INT) AS n_types
        |      FROM c GROUP BY user_id)
        |SELECT c.user_id, s.n_types, c.event_type, c.n * 2 AS n2
        |FROM c JOIN s USING (user_id)
        |WHERE c.n * 2 >= 10
        |ORDER BY c.user_id, c.event_type""".stripMargin
  )
}
