package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

class RelationalSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val li = Tables.lineitem(spark, sf).cache()
  private lazy val total = li.count()

  /** Draw n deterministic samples from a scalacheck Gen (fixed seed so
    * CI runs are reproducible). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.iterate(Seed(42L))(_.next)
      .flatMap(s => g.apply(Gen.Parameters.default, s))
      .take(n).toSeq

  test("filter(p) and filter(!p) partition the table (property)") {
    for (θ <- samples(Gen.choose(900.0, 105000.0), 5)) {
      val p = col("l_extendedprice") > θ
      assert(li.where(p).count() + li.where(!p).count() == total)
    }
  }

  test("z-order interleave is a bijection on the 10-bit key pair (property)") {
    import spark.implicits._
    val pairs = samples(Gen.zip(Gen.choose(0L, 1023L), Gen.choose(0L, 1023L)), 64)
    val df = pairs.toDF("za", "zb")
      .withColumn("z", expr(graft.queries.Extended.zInterleaveSpark("za", "zb")))
      .collect()
    df.foreach { r =>
      val (za, zb, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      // decode: odd bit positions hold za, even hold zb
      var (da, db) = (0L, 0L)
      (0 until 10).foreach { i =>
        da |= ((z >> (2 * i + 1)) & 1L) << i
        db |= ((z >> (2 * i)) & 1L) << i
      }
      assert(da == za && db == zb, s"z=$z decoded ($da,$db) != ($za,$zb)")
      assert(z >= 0 && z < (1L << 20))
    }
  }

  test("union-all is additive, intersect bounded by both sides") {
    val c = Tables.customer(spark, sf).select(col("c_nationkey"))
    val s2 = Tables.supplier(spark, sf).select(col("s_nationkey"))
    assert(c.unionAll(s2.toDF("c_nationkey")).count() == c.count() + s2.count())
    val i = SparkEntry.queries("q_set_intersect")(spark, sf).count()
    assert(i <= math.min(c.distinct().count(), s2.distinct().count()))
  }

  test("rollup row count = groups + partial totals + grand total") {
    val groups = li.select("l_returnflag", "l_linestatus").distinct().count()
    val flags = li.select("l_returnflag").distinct().count()
    val got = SparkEntry.queries("q_agg_rollup")(spark, sf).count()
    assert(got == groups + flags + 1)
  }

  test("top-k has exactly k rows in descending order") {
    val rows = SparkEntry.queries("q_sort_topk")(spark, sf).collect()
    assert(rows.length == 25)
    val prices = rows.map(_.getDouble(2))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("dedup is idempotent (property over key subsets)") {
    val cols = Seq("l_returnflag", "l_linestatus", "l_suppkey")
    for (ks <- samples(Gen.someOf(cols).suchThat(_.nonEmpty), 4)) {
      val d1 = li.dropDuplicates(ks.toSeq)
      assert(d1.dropDuplicates(ks.toSeq).count() == d1.count())
    }
  }

  test("every declared oracle key has a query (contract hygiene)") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("full outer join covers both sides exactly once") {
    val c = Tables.customer(spark, sf).where(col("c_acctbal") > 5000.0)
    val custWithOrders = Tables.orders(spark, sf)
      .select(col("o_custkey")).distinct()
    val expected = c.select(col("c_custkey"))
      .union(custWithOrders.toDF("c_custkey")).distinct().count()
    val rows = SparkEntry.queries("q_join_full")(spark, sf)
    assert(rows.count() == expected)
    assert(rows.select("cust_id").distinct().count() == expected)
  }

  test("sufficient-statistics moments match Spark's built-in aggregates") {
    // outputs are fixed-point longs (var/covar at 1e6, corr at 1e9)
    val ours = SparkEntry.queries("q_agg_stats")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(2) / 1e6, r.getLong(4) / 1e6, r.getLong(5) / 1e9)).toMap
    val ref = li.groupBy(col("l_returnflag"))
      .agg(var_samp(col("l_quantity")).as("v"),
        covar_samp(col("l_quantity"), col("l_extendedprice")).as("cv"),
        corr(col("l_quantity"), col("l_extendedprice")).as("cr"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    for ((flag, (v, cv, cr)) <- ours) {
      val (rv, rcv, rcr) = ref(flag)
      assert(math.abs(v - rv) / math.abs(rv) < 1e-7) // 1e-6 fixed-point grid
      assert(math.abs(cv - rcv) / math.abs(rcv) < 1e-6)
      assert(math.abs(cr - rcr) < 1e-6)
    }
  }
}
