package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force replay of q_dedup_substring_rebuild straight from its
  * semantic definition — every 8-gram occurrence except the corpus-wide
  * first (lexicographic min by (doc_id, position)) marks its 8 token
  * positions for excision; per doc the marked positions union into
  * maximal spans and the text is rebuilt from the survivors — via
  * in-memory hash maps, with no window functions and no Spark. Equality
  * proves the distributed spelling (gram-bucketed ownership window +
  * interval union + RemoveTokensAt merge) implements the definition
  * exactly, including the fully-excised-document edge.
  */
class SubstringRebuildSpec extends AnyFunSuite {
  import SparkTestSession._

  private val MinLen = 8

  private lazy val docs: Seq[(Long, Array[String])] =
    graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" "))).toSeq

  /** (doc, 1-based removed positions) from first principles. */
  private lazy val expectedRemoved: Map[Long, Seq[Int]] = {
    val occ = docs.flatMap { case (id, w) =>
      (0 to w.length - MinLen).map(i =>
        (w.slice(i, i + MinLen).toSeq, (id, i))) }
    val owner = occ.groupBy(_._1)
      .map { case (g, o) => (g, o.map(_._2).min) }
    val counts = occ.groupBy(_._1).map { case (g, o) => (g, o.length) }
    val removed = occ.collect {
      case (g, (id, i)) if counts(g) >= 2 && owner(g) != ((id, i)) =>
        (id, i)
    }
    docs.map { case (id, _) =>
      val ps = removed.filter(_._1 == id)
        .flatMap { case (_, i) => (i + 1) to (i + MinLen) }
        .distinct.sorted
      (id, ps)
    }.toMap
  }

  private def islands(ps: Seq[Int]): Int =
    if (ps.isEmpty) 0
    else 1 + ps.sliding(2).count {
      case Seq(a, b) => b != a + 1
      case _ => false
    }

  test("rebuild matches the first-occurrence-ownership replay") {
    val got = SparkEntry.queries("q_dedup_substring_rebuild")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.length == docs.length, "one row per document")
    val byId = docs.toMap
    got.foreach { case (id, clean, nRemoved, nSpans) =>
      val ps = expectedRemoved(id)
      assert(nRemoved == ps.length.toLong, s"doc $id removed count")
      assert(nSpans == islands(ps).toLong, s"doc $id span count")
      val keepSet = ps.toSet
      val expClean = byId(id).zipWithIndex
        .collect { case (w, i) if !keepSet.contains(i + 1) => w }
        .mkString(" ")
      assert(clean == expClean, s"doc $id rebuilt text")
    }
    // the fixture must exercise the operator both ways
    assert(got.count(_._3 > 0) >= 10, "fixture should contain removals")
    assert(got.count(_._3 == 0) >= 10, "some docs should pass through")
  }

  test("token conservation and pass-through") {
    val got = SparkEntry.queries("q_dedup_substring_rebuild")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val byId = docs.toMap
    got.foreach { case (id, clean, nRemoved) =>
      val nClean =
        if (clean.isEmpty) 0 else clean.split(" ", -1).length
      // survivors + excised = original token count, even for the
      // fully-excised (empty clean_text) edge
      assert(nClean + nRemoved == byId(id).length.toLong,
        s"doc $id token conservation")
      // untouched docs pass through VERBATIM
      if (nRemoved == 0)
        assert(clean == byId(id).mkString(" "), s"doc $id pass-through")
    }
    // every NON-owner occurrence is fully excised (the owner itself may
    // still lose tokens to a different, overlapping repeat — removal
    // windows compose by union, exactly as in Lee et al.)
    val occ = docs.flatMap { case (id, w) =>
      (0 to w.length - MinLen).map(i =>
        (w.slice(i, i + MinLen).toSeq, (id, i))) }
    val groups = occ.groupBy(_._1).values.filter(_.size >= 2)
    assert(groups.nonEmpty, "fixture should contain duplicated grams")
    groups.foreach { g =>
      val owner = g.map(_._2).min
      g.map(_._2).filter(_ != owner).foreach { case (id, i) =>
        val rm = expectedRemoved(id).toSet
        assert(((i + 1) to (i + MinLen)).forall(rm.contains),
          s"repeat occurrence (doc $id, pos $i) must be excised")
      }
    }
  }
}
