package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{RollingFingerprint, VectorFunctions}

class ExpressionsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("cosine_sim matches a hand-computed value (codegen path)") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 0.0f, 2.0f), Array(2.0f, 1.0f, 0.0f)))
      .toDF("a", "b")
    val got = df.select(VectorFunctions.cosine_sim(col("a"), col("b")))
      .head.getDouble(0)
    val expected = 2.0 / (math.sqrt(5.0) * math.sqrt(5.0))
    assert(math.abs(got - expected) < 1e-12)
  }

  test("cosine_sim is 1.0 for identical vectors, 0.0 for zero vectors") {
    import spark.implicits._
    val df = Seq((Array(0.5f, -1.5f), Array(0.5f, -1.5f), Array(0.0f, 0.0f)))
      .toDF("a", "b", "z")
    val r = df.select(
      VectorFunctions.cosine_sim(col("a"), col("b")).as("same"),
      VectorFunctions.cosine_sim(col("a"), col("z")).as("zero")).head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 0.0)
  }

  test("cosine_sim interpreted eval agrees with codegen") {
    // interpreted path: call nullSafeEval directly through the expression
    import org.apache.spark.sql.graftbridge.Bridge
    val e = graft.functions.CosineSimilarity(
      Bridge.expression(lit(1)), Bridge.expression(lit(1)))
    val a = org.apache.spark.sql.catalyst.util.ArrayData
      .toArrayData(Array(1.0f, 2.0f))
    val b = org.apache.spark.sql.catalyst.util.ArrayData
      .toArrayData(Array(2.0f, 4.0f))
    val v = e.nullSafeEval(a, b).asInstanceOf[Double]
    assert(math.abs(v - 1.0) < 1e-12)
  }

  test("rolling_fingerprint is deterministic and content-sensitive") {
    import spark.implicits._
    val df = Seq(("hello world this is a document", 1),
      ("hello world this is a document", 2),
      ("a completely different text body", 3)).toDF("text", "id")
    val fps = df.select(col("id"),
      VectorFunctions.rolling_fingerprint(col("text"), 8).as("fp"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(fps(1) == fps(2), "identical texts must share a fingerprint")
    assert(fps(1) != fps(3), "different texts should differ (whp)")
  }

  test("simhash_agg computes bit votes correctly (hand-checked)") {
    import spark.implicits._
    // hashes 1 (bit0) and 3 (bits 0,1): bit0 votes +2, bit1 votes 0,
    // all higher bits vote -2 => signature = 1
    val v = Seq(1L, 3L).toDF("h")
      .agg(graft.functions.SimHashAgg.simhash_agg(col("h")))
      .head.getLong(0)
    assert(v == 1L)
    // identical hash sets => identical signatures (merge associativity)
    val a = Seq(5L, 9L, 17L).toDF("h").repartition(3)
      .agg(graft.functions.SimHashAgg.simhash_agg(col("h"))).head.getLong(0)
    val b = Seq(17L, 5L, 9L).toDF("h").repartition(1)
      .agg(graft.functions.SimHashAgg.simhash_agg(col("h"))).head.getLong(0)
    assert(a == b)
  }

  test("srp_band_keys packs sign bits MSB-first and matches the SQL-HOF spelling") {
    import spark.implicits._
    val df = Seq((Tuple1(Array.tabulate(64)(j => (j % 5 - 2).toDouble))))
      .map(_._1).toDF("v")
    val got = df.select(VectorFunctions.srp_band_keys(col("v"), 4, 12))
      .head.getSeq[Long](0)
    // reference computation straight from the weight formula
    val expected = (0 until 4).map { b =>
      (0 until 12).foldLeft(0L) { (acc, i) =>
        val p = b * 12 + i
        val dot = (0 until 64).foldLeft(0.0)((s, j) =>
          s + (j % 5 - 2).toDouble * graft.functions.SrpBandKeys.weight(p, j))
        acc * 2 + (if (dot > 0.0) 1L else 0L)
      }
    }
    assert(got == expected)
    // every bucket fits in `bits` bits
    assert(got.forall(k => k >= 0L && k < (1L << 12)))
  }

  test("decimal_dot equals the interpreted decimal-fold spelling") {
    import spark.implicits._
    val a = Array.tabulate(64)(j => math.sin(j + 1) * 3.7)
    val b = Array.tabulate(64)(j => math.cos(j * 2 + 1) * 1.9)
    val df = Seq((a, b)).toDF("a", "b")
    val fast = df.select(VectorFunctions.decimal_dot(col("a"), col("b"))
      .cast("double")).head.getDouble(0)
    val slow = df.select(
      expr("""aggregate(zip_with(a, b, (x, y) -> x * y),
             |  CAST(0 AS DECIMAL(30,12)),
             |  (acc, x) -> CAST(acc + CAST(x AS DECIMAL(30,12))
             |              AS DECIMAL(30,12)))""".stripMargin)
        .cast("double")).head.getDouble(0)
    assert(fast == slow, s"$fast != $slow")
  }

  test("DecimalQuant.unscaled12 fast path equals the valueOf reference") {
    // r15: the kernels' per-element quantization swapped the BigDecimal
    // string round-trip for guarded double rounding — fuzz the
    // equivalence on the regimes that matter plus boundary adversaries.
    import graft.functions.DecimalQuant
    def ref(p: Double): Long = DecimalQuant.exact(p)
    val rnd = new scala.util.Random(42)
    // unit-scale products (the embedding regime), wide magnitudes, and
    // subnormal/tiny values
    val random = Seq.fill(200000)(rnd.nextDouble() * 2 - 1) ++
      Seq.fill(100000)((rnd.nextDouble() * 2 - 1) *
        math.pow(10, rnd.nextInt(20) - 13)) ++
      Seq.fill(1000)(rnd.nextGaussian() * 1e-300)
    // adversarial: exact HALF_UP tie points k + 0.5 (at scale 1e-12),
    // their float neighbours, exact integers, negative zero, and the
    // fast-path cutoff region around 2^50
    val ties = (0 until 2000).flatMap { i =>
      val t = (i.toLong * 7919 + (i % 2)) + 0.5
      val p = t / 1e12
      Seq(p, -p, Math.nextUp(p), Math.nextDown(p))
    }
    val ints = (0 until 1000).flatMap { i =>
      val p = i.toLong * 104729 / 1e12
      Seq(p, -p)
    }
    val cutoff = Seq.tabulate(100)(i =>
      ((1L << 50) - 50 + i).toDouble / 1e12).flatMap(p => Seq(p, -p))
    for (p <- random ++ ties ++ ints ++ cutoff ++ Seq(0.0, -0.0)) {
      assert(DecimalQuant.unscaled12(p) == ref(p),
        s"p=$p (bits ${java.lang.Double.doubleToLongBits(p)})")
    }
  }

  test("decimal_dot overflow fallback equals the interpreted spelling") {
    import spark.implicits._
    // Two distinct overflow routes into the arbitrary-precision
    // fallback: 2900² = 8.41e6 → unscaled 8.41e18 FITS a long, so the
    // SECOND term's Math.addExact overflows mid-accumulation; while
    // 2021000² ≈ 4.08e12 → unscaled 4.08e24 overflows
    // longValueExact on the FIRST term. Both must reproduce the HOF
    // spelling's exact sum.
    for (v <- Seq(2900.0, 2021000.0)) {
      val a = Array.fill(8)(v)
      val df = Seq((a, a)).toDF("a", "b")
      val fast = df.select(VectorFunctions.decimal_dot(col("a"), col("b")))
        .head.getDecimal(0)
      val slow = df.select(
        expr("""aggregate(zip_with(a, b, (x, y) -> x * y),
               |  CAST(0 AS DECIMAL(30,12)),
               |  (acc, x) -> CAST(acc + CAST(x AS DECIMAL(30,12))
               |              AS DECIMAL(30,12)))""".stripMargin))
        .head.getDecimal(0)
      assert(fast == slow, s"v=$v: $fast != $slow")
    }
  }

  test("srp_band_keys and decimal_dot are callable from SQL after registration") {
    graft.functions.GraftFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT srp_band_keys(array(1.0D, -2.0D, 0.5D), 2, 4) AS k,
        |       CAST(decimal_dot(array(1.5D, 2.0D), array(2.0D, 0.25D))
        |            AS DOUBLE) AS d""".stripMargin).head
    assert(r.getSeq[Long](0).length == 2)
    assert(math.abs(r.getDouble(1) - 3.5) < 1e-9)
  }

  test("decimal_sqdist equals the interpreted decimal-fold spelling") {
    import spark.implicits._
    import graft.functions.VectorFunctions.decimal_sqdist
    graft.functions.GraftFunctions.registerAll(spark)
    val df = Seq((Array(1.5, -2.0, 0.25, 1e-7), Array(0.5, 2.0, 0.25, 0.0)))
      .toDF("a", "b")
    val fast = df.select(decimal_sqdist(col("a"), col("b")).cast("double"))
      .head.getDouble(0)
    val slow = df.select(
      expr("""aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)),
             |  CAST(0 AS DECIMAL(30,12)),
             |  (acc, x) -> CAST(acc + CAST(x AS DECIMAL(30,12))
             |              AS DECIMAL(30,12)))""".stripMargin)
        .cast("double")).head.getDouble(0)
    assert(fast == slow, s"$fast != $slow")
    // hand value: 1 + 16 + 0 + round(1e-14 → 0 at scale 12) = 17
    assert(fast == 17.0)
    // and the SQL registration surface
    val viaSql = spark.sql(
      "SELECT CAST(decimal_sqdist(array(3.0D), array(1.0D)) AS DOUBLE)")
      .head.getDouble(0)
    assert(viaSql == 4.0)
  }

  test("gram_matrix_agg equals the brute-force outer-product sum") {
    import spark.implicits._
    // 3 deterministic 64-dim integer rows, partitioned so partial
    // buffers actually merge
    val rows = (0 until 3).map(r =>
      Array.tabulate(64)(j => ((r + 1) * (j % 7) - 3).toLong))
    val got = rows.map(_.toSeq).toDF("xq").repartition(3)
      .agg(VectorFunctions.gram_matrix_agg(col("xq")))
      .collect()(0).getSeq[Long](0)
    val want = Array.ofDim[Long](64, 64)
    for (v <- rows; j <- 0 until 64; k <- 0 until 64)
      want(j)(k) += v(j) * v(k)
    for (j <- 0 until 64; k <- 0 until 64)
      assert(got(j * 64 + k) == want(j)(k), s"cell ($j,$k)")
  }

  test("count-min sketch estimates are upper bounds on exact counts") {
    import spark.implicits._
    import graft.functions.CountMinAgg
    val words = Seq.tabulate(2000)(i => s"w${i % 97}") ++ Seq.fill(500)("hot")
    val df = words.toDF("term")
    val cms = df.agg(CountMinAgg.count_min_agg(col("term")))
      .head.getSeq[Long](0).toArray
    assert(cms.length == CountMinAgg.DEPTH * CountMinAgg.WIDTH)
    // each row of counters sums to the total token count (mass conservation)
    (0 until CountMinAgg.DEPTH).foreach { r =>
      val rowSum = cms.slice(r * CountMinAgg.WIDTH, (r + 1) * CountMinAgg.WIDTH).sum
      assert(rowSum == words.length.toLong, s"row $r mass $rowSum")
    }
    // estimate(t) >= exact(t) for every term, and the hot key is sharp-ish
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (t, n) =>
      val base = CountMinAgg.baseHash(t.getBytes("UTF-8"))
      val est = (0 until CountMinAgg.DEPTH).map(r =>
        cms(r * CountMinAgg.WIDTH + CountMinAgg.rowIndex(base, r))).min
      assert(est >= n, s"$t est $est < exact $n")
    }
  }

  test("count-min upper bound holds for non-ASCII tokens (UTF-8 byte fold)") {
    import spark.implicits._
    import graft.functions.CountMinAgg
    // multi-byte UTF-8: accented latin, CJK, an astral-plane emoji — the
    // update fold and the compiled lookup fold must agree on the BYTES
    // (a codepoint/char fold would read the wrong cell and could report
    // est < exact, violating the CMS contract)
    val words = Seq.fill(7)("café") ++ Seq.fill(5)("日本語") ++
      Seq.fill(3)("naïve") ++ Seq.fill(2)("😀ok") ++
      Seq.tabulate(100)(i => s"w$i")
    val df = words.toDF("term")
    val row = df.agg(CountMinAgg.count_min_agg(col("term")).as("cms"))
    val cms = row.head.getSeq[Long](0).toArray
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (t, n) =>
      val base = CountMinAgg.baseHash(t.getBytes("UTF-8"))
      val est = (0 until CountMinAgg.DEPTH).map(r =>
        cms(r * CountMinAgg.WIDTH + CountMinAgg.rowIndex(base, r))).min
      assert(est >= n, s"$t est $est < exact $n")
    }
    // and the compiled cms_base expression matches the scala fold
    val bases = df.distinct()
      .select(col("term"), CountMinAgg.cms_base(col("term")).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    bases.foreach { case (t, b) =>
      assert(b == CountMinAgg.baseHash(t.getBytes("UTF-8")), t)
    }
  }

  test("word_ngrams generator emits positioned n-grams incl. the short guard") {
    import spark.implicits._
    import graft.functions.WordNgramsGenerator.word_ngrams
    graft.functions.GraftFunctions.registerAll(spark)
    val df = Seq((1L, "a b c d"), (2L, "x y")).toDF("id", "text")
    val rows = df.select(col("id"), word_ngrams(col("text"), 3))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(rows == Set((1L, 0, "a b c"), (1L, 1, "b c d"), (2L, 0, "x y")))
    // LATERAL VIEW / SQL surface, like any built-in generator
    df.createOrReplaceTempView("wn_docs")
    val viaSql = spark.sql(
      """SELECT id, pos, ngram FROM wn_docs
        |LATERAL VIEW word_ngrams(text, 2) AS pos, ngram""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(viaSql == Set((1L, 0, "a b"), (1L, 1, "b c"), (1L, 2, "c d"),
      (2L, 0, "x y")))
  }

  test("bloom filter has no false negatives and merges by OR (incl. non-ASCII)") {
    import spark.implicits._
    import graft.functions.{BloomFilterAgg, CountMinAgg}
    // multi-byte members too: the aggregate's update fold and the probe's
    // cms_base fold share the UTF-8 byte alphabet, so membership holds
    // beyond ASCII by construction — assert it anyway
    val members = Seq.tabulate(300)(i => s"doc-$i") ++
      Seq("café", "日本語", "😀ok")
    val absent = Seq.tabulate(1000)(i => s"other-$i")
    val df = members.toDF("t")
    val bits = df.agg(BloomFilterAgg.bloom_agg(col("t")))
      .head.getSeq[Long](0).toArray
    assert(bits.length == BloomFilterAgg.WORDS)
    def hit(t: String): Boolean = {
      val base = CountMinAgg.baseHash(t.getBytes("UTF-8"))
      (0 until BloomFilterAgg.K).forall { r =>
        val p = BloomFilterAgg.position(base, r)
        (bits(p >>> 6) >>> (p & 63) & 1L) == 1L
      }
    }
    members.foreach(t => assert(hit(t), s"false negative: $t"))
    // FP rate stays in the analytical envelope: ~(1-e^(-Kn/M))^K ≈ 4.4%
    // for n=303; 1000 probes should see far fewer than 10× that
    val fps = absent.count(hit)
    assert(fps < 150, s"implausible FP count $fps/1000")
    // partial/final merge is the bitwise OR of per-partition filters
    val merged = df.repartition(7).agg(BloomFilterAgg.bloom_agg(col("t")))
      .head.getSeq[Long](0).toArray
    assert(merged.sameElements(bits), "merge is not order/partition invariant")
  }

  test("linear-counting estimate tracks true cardinality through collisions") {
    import spark.implicits._
    import graft.functions.BloomFilterAgg
    val n = 900 // load factor ~0.22 on the 4096-bit map — LC sweet spot
    val df = Seq.tabulate(3 * n)(i => s"key-${i % n}").toDF("t")
    val bits = df.repartition(5).agg(BloomFilterAgg.lc_agg(col("t")))
      .head.getSeq[Long](0).toArray
    val set = bits.map(java.lang.Long.bitCount).sum
    assert(set <= n, "k=1: at most one bit per distinct key")
    assert(set < n, "with ~0.22 load some collisions must occur")
    val est = -BloomFilterAgg.M * math.log((BloomFilterAgg.M - set).toDouble /
      BloomFilterAgg.M)
    // LC standard error at this load is well under 2%; allow 5%
    assert(math.abs(est - n) / n < 0.05, s"LC estimate $est vs true $n")
  }

  test("rolling fingerprint min-window-hash handles short inputs") {
    val h = RollingFingerprint.minWindowHash("ab".getBytes, 16, 1000003L,
      0x7FFFFFFFL)
    assert(h >= 0)
    assert(RollingFingerprint.minWindowHash(Array.emptyByteArray, 16,
      1000003L, 0x7FFFFFFFL) == 0L)
  }

  test("remove_tokens_at merge-scan matches the filter+array_contains HOF") {
    import spark.implicits._
    val df = Seq(
      ("a b c d e", Seq(1, 3)),         // interior excisions
      ("a b c", Seq(0, 1, 2)),          // everything removed → empty string
      ("a b c", Seq[Int]()),            // nothing removed
      ("solo", Seq(5, 9)),              // positions past the end are inert
      ("x y z", Seq(0))                 // leading excision: no stray space
    ).toDF("text", "ps")
      .select(split(col("text"), " ").as("w"),
        sort_array(col("ps")).as("ps"))
    val both = df.select(
      graft.functions.TextFunctions.remove_tokens_at(col("w"), col("ps"))
        .as("merged"),
      expr("concat_ws(' ', filter(w, (t, i) -> NOT array_contains(ps, i)))")
        .as("hof")).collect()
    both.foreach(r => assert(r.getString(0) == r.getString(1)))
    assert(both(1).getString(0) == "")
    assert(both(4).getString(0) == "y z")
  }

  test("remove_tokens_at is registered for SQL and accepts bigint positions") {
    graft.functions.GraftFunctions.registerAll(spark)
    val got = spark.sql(
      """SELECT remove_tokens_at(split('p q r s', ' '),
        |         array(CAST(1 AS BIGINT), CAST(2 AS BIGINT)))""".stripMargin)
      .head.getString(0)
    assert(got == "p s")
  }

  test("jaro_winkler reproduces DuckDB's doubles bit-for-bit") {
    import graft.functions.JaroWinkler
    def jw(a: String, b: String): Double =
      JaroWinkler.sim(a.getBytes("UTF-8"), b.getBytes("UTF-8"))
    // expected bit patterns captured from
    // `SELECT jaro_winkler_similarity(a, b)` in DuckDB itself — the
    // contract is BIT equality, not epsilon closeness
    val vectors = Seq(
      ("MARTHA", "MARHTA") -> "0x1.ec16c16c16c17p-1",
      ("DIXON", "DICKSONX") -> "0x1.a06d3a06d3a06p-1",
      ("JELLYFISH", "SMELLYFISH") -> "0x1.cae759203cae8p-1",
      ("DWAYNE", "DUANE") -> "0x1.ae147ae147ae2p-1",
      ("apple banana", "apple bananna") -> "0x1.f81f81f81f820p-1",
      ("abc", "abc") -> "0x1.0p0",
      ("abc", "xyz") -> "0x0.0p0",
      ("a", "") -> "0x0.0p0",
      ("", "") -> "0x0.0p0") // DuckDB: two empties are 0, not 1
    vectors.foreach { case ((a, b), hex) =>
      val got = jw(a, b)
      val want = java.lang.Double.parseDouble(hex)
      assert(java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(want),
        s"jw($a, $b) = $got, want $want")
    }
    // symmetry on asymmetric-length inputs (window is max-based)
    assert(jw("DIXON", "DICKSONX") == jw("DICKSONX", "DIXON"))
    // SQL registration surface
    graft.functions.GraftFunctions.registerAll(spark)
    val viaSql = spark.sql("SELECT jaro_winkler('MARTHA', 'MARHTA')")
      .head.getDouble(0)
    assert(viaSql == jw("MARTHA", "MARHTA"))
  }

  test("damerau_levenshtein is the UNRESTRICTED variant, DuckDB-exact") {
    import graft.functions.DamerauLevenshtein
    def dl(a: String, b: String): Long =
      DamerauLevenshtein.dist(a.getBytes("UTF-8"), b.getBytes("UTF-8"))
    // expected values captured from DuckDB's damerau_levenshtein —
    // "ca"→"abc" = 2 is the discriminator: the restricted OSA variant
    // (which most libraries ship) says 3
    assert(dl("ca", "abc") == 2L, "must be unrestricted, not OSA")
    assert(dl("abcd", "badc") == 2L)
    assert(dl("kitten", "sitting") == 3L)
    assert(dl("ab", "ba") == 1L)
    assert(dl("abc", "acb") == 1L)
    assert(dl("", "") == 0L)
    assert(dl("a", "") == 1L)
    assert(dl("", "abc") == 3L)
    assert(dl("same", "same") == 0L)
    // symmetry + triangle-inequality spot checks
    assert(dl("ca", "abc") == dl("abc", "ca"))
    assert(dl("ca", "abc") <= dl("ca", "b") + dl("b", "abc"))
    // SQL registration surface
    graft.functions.GraftFunctions.registerAll(spark)
    assert(spark.sql("SELECT damerau_levenshtein('ca', 'abc')")
      .head.getLong(0) == 2L)
  }

  test("kmv_agg keeps the K smallest DISTINCT hashes, partition-invariant") {
    import spark.implicits._
    import graft.functions.KmvAgg
    val k = KmvAgg.K
    // 500 values with every value duplicated 3× — dedup is load-bearing
    val vals = (0 until 500).map(i => (i * 2654435761L) % 1099511627776L)
    val df = (vals ++ vals ++ vals).toDF("h")
    val expected = vals.distinct.sorted.take(k)
    val one = df.coalesce(1)
      .agg(KmvAgg.kmv_agg(col("h"))).head.getSeq[Long](0)
    assert(one.toSeq == expected, "single-partition sketch")
    // partial/final merge across 7 partitions must give the identical
    // order statistic (union-truncate associativity)
    val many = df.repartition(7)
      .agg(KmvAgg.kmv_agg(col("h"))).head.getSeq[Long](0)
    assert(many.toSeq == expected, "merged sketch diverged")
    // below-K group stays exact (ascending, no truncation)
    val small = (1L to 10L).toDF("h")
      .agg(KmvAgg.kmv_agg(col("h"))).head.getSeq[Long](0)
    assert(small.toSeq == (1L to 10L))
  }

  test("fold63 packs the two 40-bit folds without signed-long overflow") {
    // the cluster gate's shuffle key (EventStreams.fold63) claims
    // h1·2²³ + (h2 mod 2²³) tops out at exactly Long.MaxValue — wrap
    // would flip signs AND silently diverge from the DuckDB replay
    // (which THROWS on BIGINT overflow instead). Check the BigInt
    // identity and the bounds over random strings plus adversarial
    // high-byte ones that push the byte folds toward their mod-2⁴⁰
    // extremes.
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val strs = (1 to 200).map(_ =>
      rng.alphanumeric.take(1 + rng.nextInt(40)).mkString) ++
      Seq("", "" * 64, "~" * 100, "z" * 39 + " end") ++
      (1 to 50).map(_ => Seq.fill(8)("w" + rng.nextInt(5)).mkString(" "))
    val rows = strs.distinct.toDF("s")
      .select(
        graft.functions.VectorFunctions.neutral_hash40(col("s")).as("h1"),
        graft.functions.VectorFunctions.neutral_hash40b(col("s")).as("h2"),
        graft.streaming.EventStreams.fold63(col("s")).as("f"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (h1, h2, f) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(h1 >= 0 && h1 < (1L << 40) && h2 >= 0 && h2 < (1L << 40))
      val ref = BigInt(h1) * BigInt(1L << 23) + BigInt(h2 % (1L << 23))
      assert(ref <= BigInt(Long.MaxValue), s"pack exceeds Long for $r")
      assert(BigInt(f) == ref, s"fold63 wrapped: $f != $ref")
      assert(f >= 0L)
    }
  }
}
