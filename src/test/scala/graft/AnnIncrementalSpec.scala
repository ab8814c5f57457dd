package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the incremental-ANN maintenance invariants that the DuckDB
  * oracle (a one-shot recompute) cannot distinguish on its own:
  *
  *  1. the delta batch genuinely lands in EXISTING cells — no delta
  *     vector creates or requires a new centroid (the fold is an
  *     assignment, not a retrain);
  *  2. merge-equals-recompute — the stored-index rows unioned with the
  *     folded delta rows are exactly the rows a single one-shot
  *     assignment of the full corpus to the stored centroids produces
  *     (so the incremental path's oracle hash-match against the
  *     recompute is a real proof, not a coincidence of the fixture);
  *  3. the split is live: both sides non-empty, and at least one delta
  *     vector shares a cell with a stored vector (the merged postings
  *     actually interleave).
  */
class AnnIncrementalSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val parts =
    graft.operators.Similarity.annIncrementalParts(spark, sf)

  test("delta vectors land in existing cells only") {
    val (stored, delta, _, centIds, cut) = parts
    val cents = centIds.toSet
    val deltaCells = delta.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).toSet
    val storedCells = stored.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(deltaCells.nonEmpty && storedCells.nonEmpty)
    assert(deltaCells.subsetOf(cents),
      s"delta cells must be stored centroid ids: ${deltaCells -- cents}")
    assert(storedCells.subsetOf(cents))
    // ids split where claimed
    assert(stored.agg(max(col("vec_id"))).head.getLong(0) < cut)
    assert(delta.agg(min(col("vec_id"))).head.getLong(0) >= cut)
    assert(delta.count() > 0 && stored.count() > 0)
  }

  test("merge equals recompute: stored ∪ delta == one-shot assignment") {
    val (stored, delta, oneShot, _, _) = parts
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("cell")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val merged = rows(stored) ++ rows(delta)
    val once = rows(oneShot)
    assert(merged == once,
      s"incremental fold diverges from the one-shot assignment: " +
        s"only-merged=${(merged -- once).take(5)} " +
        s"only-once=${(once -- merged).take(5)}")
  }

  test("merged postings interleave old and new in shared cells") {
    val (stored, delta, _, _, _) = parts
    val shared = stored.select(col("cell")).distinct()
      .join(delta.select(col("cell")).distinct(), "cell").count()
    assert(shared > 0, "some cell should hold both stored and delta rows")
  }

  test("index-drift monitor equals the in-memory PSI replay") {
    val (stored, delta, _, _, _) = parts
    def counts(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("cell")).count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (cs, cd) = (counts(stored), counts(delta))
    val cells = (cs.keySet ++ cd.keySet).toSeq.sorted
    val (ns, nd, k) = (cs.values.sum, cd.values.sum, cells.size.toLong)
    val expected = cells.map { c =>
      val ps = (cs.getOrElse(c, 0L) + 1).toDouble / (ns + k).toDouble
      val pd = (cd.getOrElse(c, 0L) + 1).toDouble / (nd + k).toDouble
      (c, cs.getOrElse(c, 0L), cd.getOrElse(c, 0L),
        math.floor((pd - ps) * math.log(pd / ps) * 1e9).toLong)
    }
    val got = SparkEntry.queries("q_sim_ann_drift")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    // the monitor must be non-degenerate on the fixture: occupancy
    // proportions differ somewhere, so some term is nonzero
    assert(got.exists(_._4 != 0), "expected a nonzero PSI term")
  }

  test("query output is the merged-index top-5 with delta flags") {
    val got = SparkEntry.queries("q_sim_ann_incremental")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3),
        r.getBoolean(4)))
    // 3 queries × top-5 (a thin home cell may yield fewer, never more)
    assert(got.map(_._1).distinct.sorted.toSeq == Seq(0L, 1L, 2L))
    got.groupBy(_._1).values.foreach { g =>
      assert(g.length >= 1 && g.length <= 5, s"top-k size ${g.length}")
      assert(g.map(_._4).sorted.toSeq == (1 to g.length).toSeq, "ranks")
      // ranks follow descending cosine
      val cs = g.sortBy(_._4).map(_._3)
      assert(cs.zip(cs.drop(1)).forall { case (a, b) => a >= b })
    }
  }

  // The CTE-prefix rename runs over the caller-supplied extra/trainPred
  // text too, so an argument using a vocabulary identifier (e, w,
  // cells, …) must fail LOUDLY instead of emitting silently mangled
  // SQL (ADVICE r13). Current call sites (cutv/cut) must stay clean.
  test("ivfCtesPrefixed rejects vocabulary identifiers in its arguments") {
    import graft.operators.Similarity.ivfCtesPrefixed
    // clean args pass and get a fully prefixed block
    val ok = ivfCtesPrefixed("z",
      "cutv AS (SELECT 1 AS cut),\n", "vec_id < (SELECT cut FROM cutv)")
    assert(ok.contains("zcells") && ok.contains("znv") &&
      !("\\b(cells|nv|nt)\\b".r.findFirstIn(ok).isDefined))
    // a predicate that names the `w` CTE as its own identifier is a bug
    intercept[IllegalArgumentException] {
      ivfCtesPrefixed("z", "", "vec_id IN (SELECT vec_id FROM w)")
    }
    intercept[IllegalArgumentException] {
      ivfCtesPrefixed("z", "cells AS (SELECT 1 AS x),\n", "TRUE")
    }
  }
}
