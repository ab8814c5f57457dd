package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force replay of q_dedup_substring straight from the SEMANTIC
  * definition — dup_len(p) = max l in [8, 12] such that the l-gram at p
  * occurs at least twice corpus-wide — via in-memory l-gram count maps,
  * with no suffix sorting and no neighbor-LCP trick. Equality proves
  * the distributed construction (truncated-suffix buckets + sorted-
  * neighbor LCP) implements the definition exactly, including the
  * suffix-array adjacency argument it leans on.
  */
class SubstringDedupSpec extends AnyFunSuite {
  import SparkTestSession._

  private val MinLen = 8
  private val Cap = 12 // MinLen + ExtLen

  private lazy val docs: Seq[(Long, Array[String])] =
    graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" "))).toSeq

  /** Expected per-doc maximal dup spans from first principles. */
  private lazy val expected: Map[Long, Seq[(Int, Int)]] = {
    val counts: Map[Int, Map[Seq[String], Int]] =
      (MinLen to Cap).map { l =>
        l -> docs.flatMap { case (_, w) =>
          (0 to w.length - l).map(i => w.slice(i, i + l).toSeq) }
          .groupBy(identity).map { case (g, o) => (g, o.length) }
      }.toMap
    docs.map { case (id, w) =>
      val windows = (0 to w.length - MinLen).flatMap { i =>
        val dupLen = (MinLen to math.min(Cap, w.length - i)).reverse
          .find(l => counts(l)(w.slice(i, i + l).toSeq) >= 2)
        dupLen.map(l => (i + 1, i + l)) // 1-based inclusive
      }
      // interval union: merge overlapping windows
      val spans = windows.sortBy(x => (x._1, x._2))
        .foldLeft(List.empty[(Int, Int)]) {
          case ((s, e) :: rest, (s2, e2)) if s2 <= e =>
            (s, math.max(e, e2)) :: rest
          case (acc, sp) => sp :: acc
        }.reverse
      (id, spans)
    }.toMap
  }

  test("suffix-bucket construction matches the brute-force definition") {
    val got = SparkEntry.queries("q_dedup_substring")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(got.length == docs.length)
    got.foreach { case (id, nSpans, dupToks, maxSpan, spansStr) =>
      val exp = expected(id)
      assert(nSpans == exp.length.toLong, s"doc $id span count")
      assert(dupToks == exp.map { case (s, e) => e - s + 1 }.sum.toLong,
        s"doc $id dup token total")
      assert(maxSpan ==
        (if (exp.isEmpty) 0L
         else exp.map { case (s, e) => e - s + 1 }.max.toLong),
        s"doc $id max span")
      val expStr = exp.map { case (s, e) => s"$s-$e" }.mkString(",")
      assert(spansStr == expStr, s"doc $id spans")
    }
    // the fixture must exercise the operator: planted near-dups give
    // long shared passages
    assert(got.count(_._2 > 0) >= 10, "fixture should contain dup spans")
    assert(got.exists(_._4 > MinLen.toLong),
      "some span should extend past the minimum length")
  }

  test("every reported span's text really occurs twice in the corpus") {
    val all = docs.flatMap { case (_, w) =>
      (0 until w.length).map(i => w.drop(i).mkString(" ")) }
    val got = SparkEntry.queries("q_dedup_substring")(spark, sf).collect()
      .filter(_.getLong(1) > 0)
    val byId = docs.toMap
    got.take(40).foreach { r =>
      val w = byId(r.getLong(0))
      r.getString(4).split(",").foreach { sp =>
        val Array(s, e) = sp.split("-").map(_.toInt)
        // the first MinLen..Cap tokens of the span must appear at two
        // distinct corpus positions (the span itself plus one more)
        val probe = w.slice(s - 1, s - 1 + math.min(Cap, e - s + 1))
          .mkString(" ")
        val hits = all.count(suf =>
          suf == probe || suf.startsWith(probe + " "))
        assert(hits >= 2, s"span $sp of doc ${r.getLong(0)} not duplicated")
      }
    }
  }
}

/** In-memory replay of q_text_heaps: bigram types enter the vocabulary
  * at their first occurrence's checkpoint bucket, cumulative counts at
  * 20 buckets, integer OLS on floor-quantized logs.
  */
class HeapsSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs: Seq[(Long, Array[String])] =
    graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" "))).toSeq

  test("heaps checkpoint curve equals an in-memory first-occurrence replay") {
    val n = docs.length.toLong
    val bigrams = docs.flatMap { case (id, w) =>
      w.sliding(2).filter(_.length == 2).map(p => (id, p.mkString(" "))) }
    val bkt = (id: Long) => id * 20 / n
    val toksPerB = bigrams.groupBy(x => bkt(x._1))
      .map { case (b, o) => (b, o.size.toLong) }
    val typesPerB = bigrams.groupBy(_._2)
      .map { case (_, o) => bkt(o.map(_._1).min) }
      .groupBy(identity).map { case (b, o) => (b, o.size.toLong) }
    val buckets = toksPerB.keys.toSeq.sorted
    var (ct, cv) = (0L, 0L)
    val expected = buckets.map { b =>
      ct += toksPerB(b); cv += typesPerB.getOrElse(b, 0L)
      (b, ct, cv)
    }
    val xy = expected.map { case (_, t, v) =>
      (math.floor(math.log(t.toDouble) * 1000).toLong,
        math.floor(math.log(v.toDouble) * 1000).toLong) }
    val k = xy.size.toLong
    val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
    val (sxx, sxy) = (xy.map(p => p._1 * p._1).sum,
      xy.map(p => p._1 * p._2).sum)
    val num = 1000L * (k * sxy - sx * sy)
    val den = k * sxx - sx * sx
    val beta = (num - ((num % den + den) % den)) / den
    val got = SparkEntry.queries("q_text_heaps")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(r => (r._1, r._2, r._3)).toSeq == expected)
    assert(got.forall(_._4 == beta))
    // the curve must actually GROW across checkpoints, or the fit is
    // the degenerate unigram case this query exists to avoid
    assert(expected.last._3 > expected.head._3,
      "bigram vocabulary should grow past the first checkpoint")
  }
}

/** In-memory replay of q_text_ql: Dirichlet-smoothed query likelihood,
  * μ = 100, per-term floor-1e4 lns summed as integers — including the
  * smoothing path for documents that lack a query term entirely.
  */
class QueryLikelihoodSpec extends AnyFunSuite {
  import SparkTestSession._

  test("dirichlet query likelihood equals the in-memory replay") {
    val qterms = Seq("scan", "filter", "vector")
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSeq))
    val ctot = docs.map(_._2.length.toLong).sum
    val cf = qterms.map(t =>
      (t, docs.map(_._2.count(_ == t).toLong).sum)).filter(_._2 > 0)
    assert(cf.size == 3, "all query terms should occur in the fixture")
    val expected = docs.map { case (id, w) =>
      val dl = w.length.toLong
      val score = cf.map { case (t, c) =>
        val tf = w.count(_ == t).toLong
        math.floor(math.log(
          (tf.toDouble + 100.0 * c.toDouble / ctot.toDouble) /
            (dl.toDouble + 100.0)) * 1e4).toLong
      }.sum
      (id, score)
    }.toMap
    val got = SparkEntry.queries("q_text_ql")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == docs.length, "one score per document")
    got.foreach { case (id, s) =>
      assert(s == expected(id), s"doc $id query-likelihood score") }
    // smoothing must be live: some scored doc lacks some query term
    assert(docs.exists { case (_, w) => qterms.exists(t => !w.contains(t)) },
      "fixture should exercise the absent-term smoothing path")
  }
}
