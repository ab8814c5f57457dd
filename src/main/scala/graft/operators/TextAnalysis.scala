package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.QueryDefs.Q
import graft.sources.Tables
import graft.functions.VectorFunctions.rolling_fingerprint

/** Text-analysis operators over the `documents` fixture: token/length
  * stats, quality scoring, regex tokenization, profile-based language ID,
  * and winnowing fingerprints. All are single-scan + at most one shuffle
  * (the groupBys), so they stream at corpus scale; none collects to the
  * driver.
  */
object TextAnalysis {

  /** Shared CCNet-style statistical LM scorer: an add-1-smoothed bigram
    * LM trained on the corpus itself, Σ log p(wᵢ|wᵢ₋₁) per document,
    * floor-quantized at 1e4 per distinct bigram so the per-doc score is
    * an exact integer sum (see q_text_lm_score's oracle). Factored out
    * because q_text_lm_score publishes it directly and q_mix_ccnet
    * (Curation) buckets corpora by it — ONE derivation, two consumers
    * (the shared-kernel discipline, SURVEY.md). Memoized per
    * (session, dataset) as a localCheckpointed table (per-doc rows —
    * corpus-scale-bounded output, not the bigram blowup) so the two
    * consumers train the LM once per Verify/Bench pass, the BPE/IVF
    * memo pattern. Returns (doc_id, n_bigrams, score_q), unsorted. */
  private val lmMemo = new scala.collection.concurrent.TrieMap[
    (String, String), DataFrame]

  private[operators] def lmDocScores(s: SparkSession, d: String): DataFrame =
    graft.MemoStats.memoized("lm_scores", lmMemo,
      (org.apache.spark.sql.graftbridge.Bridge.sessionUUID(s), d))(
      lmDocScoresImpl(s, d).localCheckpoint())

  // private[graft]: PlanSpec asserts the aggregation shape on THIS plan —
  // the memoized handle above is a checkpoint scan once warm, so its
  // published plan no longer contains the bigram HashAggregates.
  private[graft] def lmDocScoresImpl(s: SparkSession, d: String): DataFrame = {
    val toksD = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val big = toksD.select(col("doc_id"), explode(expr(
        """CASE WHEN size(toks) >= 2 THEN
          |  transform(sequence(1, size(toks) - 1),
          |    i -> named_struct('a', element_at(toks, i),
          |                      'b', element_at(toks, i + 1)))
          |ELSE array() END""".stripMargin)).as("bg"))
      .select(col("doc_id"), col("bg.a").as("a"), col("bg.b").as("b"))
    val c2 = big.groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
    val c1 = big.groupBy(col("a")).agg(count(lit(1)).as("n_a"))
    val vocab = toksD.select(explode(col("toks")).as("t"))
      .agg(countDistinct(col("t")).as("v"))
    big.join(c2, Seq("a", "b")).join(c1, Seq("a"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        floor(log((col("n_ab") + 1).cast("double") /
          (col("n_a") + col("v")).cast("double")) * lit(1e4))
          .cast("long").as("lp_q"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp_q")).as("score_q"))
  }

  /** DuckDB CTE block replaying [[lmDocScores]] — shared verbatim by the
    * q_text_lm_score and q_mix_ccnet oracles so the replica can't drift.
    * Ends with `lm(doc_id, n_bigrams, score_q)`. */
  private[operators] val LmScoreCtes: String =
    """t AS (SELECT doc_id, string_split(text, ' ') AS toks
      |           FROM documents),
      |p0 AS (SELECT doc_id,
      |         UNNEST([struct_pack(a := toks[i], b := toks[i + 1])
      |                 for i in generate_series(1, len(toks) - 1)]) AS bg
      |       FROM t WHERE len(toks) >= 2),
      |p AS (SELECT doc_id, bg.a AS a, bg.b AS b FROM p0),
      |c2 AS (SELECT a, b, COUNT(*) AS n_ab FROM p GROUP BY a, b),
      |c1 AS (SELECT a, COUNT(*) AS n_a FROM p GROUP BY a),
      |v AS (SELECT COUNT(DISTINCT tk) AS v
      |      FROM (SELECT UNNEST(toks) AS tk FROM t)),
      |sc AS (SELECT p.doc_id,
      |         CAST(FLOOR(LN(CAST(c2.n_ab + 1 AS DOUBLE)
      |                       / CAST(c1.n_a + v.v AS DOUBLE)) * 1e4)
      |              AS BIGINT) AS lp_q
      |       FROM p JOIN c2 USING (a, b) JOIN c1 USING (a) CROSS JOIN v),
      |lm AS (SELECT doc_id, COUNT(*) AS n_bigrams,
      |         CAST(SUM(lp_q) AS BIGINT) AS score_q
      |       FROM sc GROUP BY doc_id)""".stripMargin

  /** q_text_bm25's per-(doc, term) scores, unsorted — shared with the
    * hybrid-retrieval fusion (q_sim_hybrid_rrf), whose lexical arm sums
    * these to one BM25 score per document. Query terms are the fixed
    * public set the BM25 oracle spells literally. */
  private[graft] def bm25TermScores(s: SparkSession, d: String): DataFrame = {
    val qterms = Seq("scan", "filter", "vector")
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), size(col("w")).cast("long").as("dl"),
        col("w"))
    val n = docs.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("dlsum"))
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("w")).as("term"))
      .where(col("term").isin(qterms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "term").crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"), col("dl"),
        floor(
          log((col("n_docs").cast("double") - col("df").cast("double") +
                lit(0.5)) / (col("df").cast("double") + lit(0.5)) +
              lit(1.0)) *
          (col("tf").cast("double") * lit(2.2)) /
          (col("tf").cast("double") + lit(1.2) *
            (lit(0.25) + lit(0.75) * col("dl").cast("double") /
              (col("dlsum").cast("double") /
                col("n_docs").cast("double")))) *
          lit(1e4)).cast("long").as("bm25_q"))
  }

  /** The fixed public query-term set the BM25 family scores (sorted —
    * the output tables ORDER BY term). */
  private[graft] val IndexQueryTerms = Seq("filter", "scan", "vector")

  /** One side's contribution to the BM25 index statistics, as (k, cnt,
    * dls) rows: k = a query term (cnt = its document frequency — input
    * is per-doc DISTINCT terms, so COUNT(rows) counts documents) or the
    * '__corpus__' sentinel (cnt = doc count, dls = total token length).
    * ONE aggregation over one explode — deliberately inside the
    * single-aggregation streaming limit, so the ingest twin
    * (q_stream_index_stats) runs this EXACT shape as its complete-mode
    * state: ≤ |query terms| + 1 rows forever. */
  private[graft] def indexDeltaRows(docs: DataFrame): DataFrame =
    docs.select(col("dl"),
        explode(concat(
          filter(array_distinct(col("w")),
            t => IndexQueryTerms.map(q => t === q).reduce(_ || _)),
          array(lit("__corpus__")))).as("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("k") === "__corpus__", col("dl"))
          .otherwise(lit(0L))).as("dls"))

  /** Fold a delta side's (k, cnt, dls) rows onto the STORED side's
    * (doc_id < cut) and emit the merged BM25 index statistics — the
    * retrieval family's incremental-maintenance merge, shared verbatim
    * by the batch fold (q_retrieval_incremental) and the ingest twin
    * (q_stream_index_stats): per query term, stored/delta/merged df,
    * plus the merged corpus size, avgdl (floor-1e4), and the BM25 idf
    * under the MERGED stats (the q_text_bm25 idf spelling, floor-1e4).
    * df/N/Σdl are all sums, so merged ≡ from-scratch is an algebraic
    * identity — and the ORACLE computes the from-scratch side, making
    * the hash match the merge-equals-recompute proof (the
    * q_dedup_clusters_incremental pattern applied to the index). The
    * FULL join keeps terms present in only one side (df 0 on the
    * other); the corpus scalars ride a 1-row broadcast, never a global
    * window. */
  private[graft] def mergedIndexStats(s: SparkSession, d: String,
      cut: Long, deltaRows: DataFrame): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), size(col("w")).cast("long").as("dl"),
        col("w"))
    val storedRows = indexDeltaRows(docs.where(col("doc_id") < cut))
      .select(col("k"), col("cnt").as("cnt_s"), col("dls").as("dls_s"))
    val both = storedRows.join(
        deltaRows.select(col("k"), col("cnt").as("cnt_d"),
          col("dls").as("dls_d")), Seq("k"), "full")
      .select(col("k"),
        coalesce(col("cnt_s"), lit(0L)).as("cnt_s"),
        coalesce(col("cnt_d"), lit(0L)).as("cnt_d"),
        coalesce(col("dls_s"), lit(0L)).as("dls_s"),
        coalesce(col("dls_d"), lit(0L)).as("dls_d"))
      .localCheckpoint() // ≤ |query terms| + 1 rows; two consumers
    val corp = both.where(col("k") === "__corpus__")
      .select((col("cnt_s") + col("cnt_d")).as("n_docs"),
        (col("dls_s") + col("dls_d")).as("dlsum"))
    both.where(col("k") =!= "__corpus__")
      .crossJoin(broadcast(corp))
      .select(col("k").as("term"),
        col("cnt_s").as("df_stored"), col("cnt_d").as("df_delta"),
        (col("cnt_s") + col("cnt_d")).as("df"),
        col("n_docs"),
        floor(col("dlsum").cast("double") * lit(1e4) /
          col("n_docs").cast("double")).cast("long").as("avgdl_q"),
        floor(log((col("n_docs").cast("double") -
            (col("cnt_s") + col("cnt_d")).cast("double") + lit(0.5)) /
          ((col("cnt_s") + col("cnt_d")).cast("double") + lit(0.5)) +
          lit(1.0)) * lit(1e4)).cast("long").as("idf_q"))
      .orderBy(col("term"))
  }

  /** Per-(session, dataset) probe-plan memo for the inverted index:
    * the 3 CHOSEN (term, df, bucket) rows — never the vocabulary. At
    * 100 TB of text the vocabulary (hapaxes, IDs, typos) grows with the
    * corpus, so term selection must stay distributed: the df floor is
    * one scalar aggregate and the 3 rarest qualifying terms are a
    * TakeOrdered(3); driver traffic is 3 rows + 1 scalar regardless of
    * corpus or vocabulary size ([[TextAnalysisSpec]] asserts the memo
    * is exactly 3 rows). */
  private val invIdxStats = new scala.collection.concurrent.TrieMap[
    (String, String), Array[(String, Long, Int)]]

  /** Test-only view of the memo so the spec can assert its row bound. */
  private[graft] def invIdxStatsSizes: Iterable[Int] =
    invIdxStats.values.map(_.length)

  /** Inverted-index layout, written once per (JVM, dataset): postings
    * (term, doc_id, tf) hash-partitioned into 16 term buckets
    * (`partitionBy("bkt")`), so a probe for k terms opens only their
    * buckets' files — partition pruning over the TERM axis, the
    * posting-list access path of every search engine re-expressed as a
    * lake layout. At 100 TB the bucket count scales with vocabulary
    * and the layout is a maintained table; here it's built on demand
    * like the zone-map and DPP layouts. */
  private[graft] def invertedIndexPath(s: SparkSession, d: String): String = {
    val base = s"${sys.props("java.io.tmpdir")}/graft_invidx_${d.replaceAll("[^0-9a-zA-Z]", "_")}"
    val success = new org.apache.hadoop.fs.Path(s"$base/_SUCCESS")
    if (!success.getFileSystem(s.sparkContext.hadoopConfiguration)
        .exists(success))
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("tok"), col("doc_id"))
        .agg(count(lit(1)).as("tf"))
        .withColumn("bkt", pmod(xxhash64(col("tok")), lit(16)).cast("int"))
        .write.partitionBy("bkt").mode("overwrite").parquet(base)
    base
  }

  /** The probe side of [[invertedIndexPath]]: derive the k = 3 rarest
    * QUALIFYING terms from the memoized term-stats table — rarest by
    * (df, term), but only terms with df ≥ max(5, max-df/100), the
    * df floor that keeps the conjunction non-vacuous on corpora whose
    * tail is singleton tokens (typo-like hapaxes: an AND query over
    * three hapaxes matches nothing and demonstrates nothing) — then
    * scan ONLY those terms' buckets (partition filter on bkt, residual
    * `tok IN (...)` pushed into the chosen files). Returns (probe
    * postings, query terms, distinct buckets opened) so PlanSpec can
    * assert the pruning on the same plan the query runs. */
  private[graft] def invertedProbe(s: SparkSession, d: String)
      : (DataFrame, Array[String], Array[Int]) = {
    val base = invertedIndexPath(s, d)
    val terms = graft.MemoStats.memoized("index_probe", invIdxStats,
      (org.apache.spark.sql.graftbridge.Bridge.sessionUUID(s), d)) {
        val stats = s.read.parquet(base)
          .groupBy(col("tok"))
          .agg(count(lit(1)).as("df"), first(col("bkt")).as("bkt"))
        // the df floor is ONE distributed scalar, never a vocab collect
        val maxDf = stats.agg(max(col("df"))).head.getLong(0)
        val floor = math.max(5L, maxDf / 100L)
        stats.where(col("df") >= floor)
          .orderBy(col("df"), col("tok"))
          .limit(3) // TakeOrderedAndProject: 3 rows reach the driver
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
      }
    // the oracle hardcodes HAVING COUNT(DISTINCT tok) = 3: a corpus
    // where fewer than 3 terms clear the floor must fail loudly here,
    // not silently diverge from the replay
    require(terms.length == 3,
      s"inverted-index probe needs 3 floor-clearing terms, got ${terms.length}")
    val toks = terms.map(_._1)
    val bkts = terms.map(_._3).distinct
    val probe = s.read.parquet(base)
      .where(col("bkt").isin(bkts.toIndexedSeq: _*) &&
        col("tok").isin(toks.toIndexedSeq: _*))
    (probe, toks, bkts)
  }

  val defs: Map[String, Q] = Map(

    // TextRank keyword scoring (Mihalcea & Tarau 2004): weighted
    // PageRank over the word CO-OCCURRENCE graph (window 2 — pairs at
    // token distance 1 or 2), the graph-centrality keyword signal that
    // raw frequency (heavy hitters), tf-idf, and RAKE's
    // degree/frequency all approximate — a word ranks high when its
    // NEIGHBORS rank high, recursively. All-integer nano-rank update
    // (tele + (85 · Σ w(b,a)·r(b) div s(b)) div 100, the q_graph_pagerank
    // discipline applied to a weighted graph with strength
    // normalization), so five unrolled rounds replay exactly in SQL.
    // Scale shape: both lead() offsets ride ONE per-doc window pass;
    // the pair aggregate is keyed on a ≤ vocab² domain; the rank loop
    // runs on the vocab-sized edge/strength tables (localCheckpointed
    // once); top-10 is distributed TakeOrdered.
    "q_text_textrank" -> ((s, d) => {
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      val shifted = toks
        .withColumn("b1", lead(col("tok"), 1).over(wDoc))
        .withColumn("b2", lead(col("tok"), 2).over(wDoc))
        // r15: consumed by BOTH branches of the edge union — the
        // posexplode + lead window otherwise runs twice per query
        .localCheckpoint()
      val allp = shifted
        .select(col("tok").as("a"), col("b1").as("b"))
        .where(col("b").isNotNull)
        .unionAll(shifted.select(col("tok").as("a"), col("b2").as("b"))
          .where(col("b").isNotNull))
        .where(col("a") =!= col("b"))
      val cw = allp
        .groupBy(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .agg(count(lit(1)).as("w"))
      val edges = cw.unionAll(
        cw.select(col("b").as("a"), col("a").as("b"), col("w")))
        .toDF("src", "dst", "w")
        .localCheckpoint() // the 5 rank rounds + strength reuse it
      val strength = edges.groupBy(col("src")).agg(sum(col("w")).as("s"))
        .localCheckpoint()
      // same tok multiset as `toks` — read from the checkpointed table
      // so the distinct doesn't re-run the posexplode (r15)
      val vocab = shifted.select(col("tok")).distinct().localCheckpoint()
      val n = vocab.count() // bounded driver scalar (vocab size)
      val base = 1000000000L / n
      val tele = 15L * base / 100L
      var ranks = vocab.select(col("tok"), lit(base).as("r"))
        .localCheckpoint()
      for (_ <- 1 to 5) {
        val mass = edges
          .join(strength, "src")
          .join(ranks.withColumnRenamed("tok", "src"), "src")
          .select(col("dst"), expr("(r * w) div s").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("m"))
        ranks = vocab
          .join(mass, vocab("tok") === mass("dst"), "left")
          .select(col("tok"),
            expr(s"$tele + (85 * coalesce(m, 0L)) div 100").as("r"))
          .localCheckpoint()
      }
      ranks
        .join(strength, ranks("tok") === strength("src"), "left")
        .select(col("tok"), col("r").as("rank_nn"),
          coalesce(col("s"), lit(0L)).as("strength"))
        .orderBy(col("rank_nn").desc, col("tok"))
        .limit(10)
    }),

    // Conjunctive (AND) keyword search answered FROM the inverted
    // index, never the corpus: the 3 rarest terms' posting lists are
    // read via bucket partition pruning ([[invertedProbe]]), and the
    // intersection is one groupBy(doc_id) keeping docs matched by all
    // 3 lists — cost ∝ Σ posting-list length (df), not corpus size,
    // which is the entire point of an inverted index at 100 TB. The
    // published sum_tf is the total query-term mass per matching doc
    // (the trivial tf ranking signal). The oracle replays the SAME
    // rarest-3 term choice from raw text and intersects by brute
    // force — index answer must equal scan answer.
    "q_text_index_query" -> ((s, d) => {
      val (probe, toks, _) = invertedProbe(s, d)
      probe
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("tok")).as("nt"),
          sum(col("tf")).as("sum_tf"))
        .where(col("nt") === toks.length)
        .select(col("doc_id"), col("sum_tf"))
        .orderBy(col("doc_id"))
    }),

    // Per-document surface statistics. avg_word_len derives from the
    // single-spaced layout: chars minus separators over word count.
    "q_text_stats" -> ((s, d) => {
      Tables.documents(s, d).select(
        col("doc_id"), col("lang"), col("source"),
        length(col("text")).as("n_chars_m"),
        size(split(col("text"), " ")).as("n_words"),
        size(array_distinct(split(col("text"), " "))).as("n_distinct"),
        ((length(col("text")) - size(split(col("text"), " ")) + 1)
          .cast("double") / size(split(col("text"), " ")))
          .as("avg_word_len"))
        .orderBy(col("doc_id"))
    }),

    // Quality score: bounded length term + lexical diversity + stopword
    // ratio (the classic C4/Gopher-style heuristics, condensed). Pure
    // per-row double arithmetic — deterministic across engines.
    "q_text_quality" -> ((s, d) => {
      val toks = split(col("text"), " ")
      val nw = size(toks).cast("double")
      val stop = size(filter(toks, t => t === "a" || t === "the"))
        .cast("double")
      val uniq = size(array_distinct(toks)).cast("double")
      Tables.documents(s, d).select(
        col("doc_id"),
        (least(nw / lit(100.0), lit(1.0)) * lit(0.3) +
          (uniq / nw) * lit(0.4) +
          (stop / nw) * lit(0.3)).as("quality"))
        .orderBy(col("doc_id"))
    }),

    // Character-distribution quality signals: Shannon entropy (nats) and
    // the Simpson concentration numerator over the 26 lowercase-letter
    // frequencies. Low entropy / high concentration flags degenerate
    // text (aaaa..., single-char spam) that length- and stopword-based
    // gates miss. Per-letter counts come from the length-minus-replace
    // trick over a 26-element transform — no explode, no shuffle: the
    // whole signal computes inside the scan stage. Entropy terms are
    // per-term 1e9-floor-quantized (the q_text_lm_score pattern) so the
    // per-doc sum is an exact integer both engines agree on bit-for-bit;
    // the Simpson numerator Σc·(c−1) is exact integer arithmetic
    // outright (denominator n·(n−1) is derivable from n_letters, so
    // only integers ship).
    "q_text_entropy" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), expr(
          """transform(sequence(97, 122), c ->
            |  CAST(length(text) - length(replace(text, chr(c), ''))
            |       AS BIGINT))""".stripMargin).as("cnt"))
        .select(col("doc_id"), col("cnt"),
          expr("aggregate(cnt, 0L, (acc, c) -> acc + c)").as("n_letters"))
        .select(col("doc_id"), col("n_letters"),
          expr("aggregate(cnt, 0L, (acc, c) -> acc + c * (c - 1))")
            .as("simpson_num"),
          expr(
            """aggregate(cnt, 0L, (acc, c) -> acc + IF(c > 0,
              |  CAST(FLOOR(-((CAST(c AS DOUBLE) / CAST(n_letters AS DOUBLE))
              |    * LN(CAST(c AS DOUBLE) / CAST(n_letters AS DOUBLE)))
              |    * 1e9) AS BIGINT), 0L))""".stripMargin).as("entropy_nn"))
        .orderBy(col("doc_id"))
    }),

    // Blocklist scan: per-pattern occurrence counts over a fixed phrase
    // blocklist via ONE compiled Aho–Corasick pass per document
    // (MultiPatternCounts), then an 8-key rollup: docs hit + total hits
    // per pattern. The production shape for URL/term blocklist gates —
    // at a 10k-entry list the automaton still reads each byte once,
    // where the k-LIKE spelling pays k full-text scans per row (the
    // oracle IS that naive position-scan spelling, which is the point:
    // same answer, O(k·n) vs O(n)). Patterns include substring-nested
    // pairs ("stream" inside nothing, "hash join" spanning a space) to
    // exercise the dictionary-suffix closure.
    "q_text_blocklist" -> ((s, d) => {
      import graft.functions.TextFunctions.multi_pattern_counts
      val pats = TextAnalysis.BlocklistPatterns
      Tables.documents(s, d)
        .select(col("doc_id"),
          multi_pattern_counts(col("text"), pats).as("cnt"))
        .select(col("doc_id"), posexplode(col("cnt")).as(Seq("pid", "hits")))
        .groupBy(col("pid"))
        .agg(sum((col("hits") > 0).cast("long")).as("n_docs"),
          sum(col("hits")).as("n_hits"))
        .select(
          element_at(array(TextAnalysis.BlocklistPatterns.map(lit): _*),
            col("pid") + 1).as("pattern"),
          col("n_docs"), col("n_hits"))
        .orderBy(col("pattern"))
    }),

    // Zipf rank-frequency slope per source: OLS fit of ln(count) on
    // ln(rank) over the word-frequency table — the corpus-health
    // diagnostic (natural text ≈ −1; the fixture's ~40-word uniform
    // soup fits shallow, which is itself the signal: flat slope = low
    // diversity / synthetic text). Rank ties break on the word so both
    // engines rank identically. Per-term ln values are 1e3-floor-
    // quantized so the FIVE sufficient statistics are exact integer
    // sums (the q_agg_corr shape — OLS on a vocab-sized table after
    // one corpus-scan aggregation); envelope: ~1e5 types keeps
    // n·Σxy under 2^63. The slope itself is integer div, per-mille.
    "q_text_zipf" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val cnt = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
      val ranked = cnt.withColumn("rn", row_number().over(
          Window.partitionBy(col("source"))
            .orderBy(col("c").desc, col("w"))))
        .select(col("source"), col("c"),
          floor(log(col("rn").cast("double")) * 1000).cast("long").as("xq"),
          floor(log(col("c").cast("double")) * 1000).cast("long").as("yq"))
      ranked.groupBy(col("source"))
        .agg(count(lit(1)).as("n_types"),
          sum(col("c")).as("n_tokens"),
          sum(col("xq")).as("sx"), sum(col("yq")).as("sy"),
          sum(col("xq") * col("xq")).as("sxx"),
          sum(col("xq") * col("yq")).as("sxy"))
        .select(col("source"), col("n_types"), col("n_tokens"),
          (lit(1000) * (col("n_types") * col("sxy") - col("sx") * col("sy")))
            .as("num"),
          (col("n_types") * col("sxx") - col("sx") * col("sx")).as("den"))
        // FLOOR division: the numerator is negative (Zipf slopes are),
        // and integer-division conventions can't be trusted across
        // engines (measured round 9: Spark's `div` AND DuckDB's `//`
        // both truncate toward zero, contra this comment's original
        // claim) — so the spelling sidesteps conventions entirely:
        // (num - mod_floor) makes the numerator exactly divisible and
        // the quotient IS the floor under any convention (both
        // engines' % is C-style truncated remainder)
        .select(col("source"), col("n_types"), col("n_tokens"),
          expr("""CASE WHEN den = 0 THEN NULL
                 |ELSE (num - ((num % den + den) % den)) div den
                 |END""".stripMargin).as("slope_pm"))
        .orderBy(col("source"))
    }),

    // Heaps'-law vocabulary-growth fit — q_text_zipf's canonical
    // companion (V ≈ C·N^β): cumulative distinct-type counts at 20
    // corpus checkpoints, then an integer OLS of ln V on ln N. The
    // corpus-health number that sizes tokenizer vocabularies and
    // catches ID/noise pollution (β near 1 = vocabulary growing as
    // fast as the corpus = unbounded junk; natural text β ≈ 0.5;
    // β → 0 = closed vocabulary). Types are word BIGRAMS — on the
    // fixture's closed ~31-word soup the unigram curve saturates in
    // the first bucket (β exactly 0, a degenerate fit), while the
    // bigram space still grows across checkpoints, so the fit
    // machinery is genuinely exercised; on natural text the same query
    // reads as phrase-vocabulary growth. The cumulative-distinct trap
    // is dodged the distributed way: a type's FIRST occurrence (one
    // min() aggregate) pins the checkpoint where it enters the
    // vocabulary, so cumulative V is a cumsum of per-bucket
    // first-occurrence counts — never a per-prefix distinct. Both
    // windows and the OLS run on the 20-row checkpoint table
    // (census-whitelisted: bucket count is a constant, never corpus-
    // sized); the corpus is scanned once. Checkpoint bucketing uses the
    // dense doc_id space ((doc_id·20) div n — the same dense-id
    // convention as the streaming split); x/y ride the zipf discipline
    // (1e3-floor-quantized ln, exact integer sufficient statistics,
    // explicit floor division).
    "q_text_heaps" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val n = Tables.documents(s, d).count() // footer scalar, replayable
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .where(size(col("ws")) >= 2)
        .select(col("doc_id"), explode(expr(
          """transform(sequence(1, size(ws) - 1),
            |  i -> concat(element_at(ws, i), ' ',
            |              element_at(ws, i + 1)))""".stripMargin)).as("w"))
      val tb = tok.select(expr(s"(doc_id * 20) div $n").as("b"))
        .groupBy(col("b")).agg(count(lit(1)).as("toks"))
      val nb = tok.groupBy(col("w")).agg(min(col("doc_id")).as("fd"))
        .select(expr(s"(fd * 20) div $n").as("b"))
        .groupBy(col("b")).agg(count(lit(1)).as("types"))
      val wCum = Window.orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val ck = tb.join(nb, Seq("b"), "left")
        .select(col("b"), col("toks"),
          coalesce(col("types"), lit(0L)).as("types"))
        .select(col("b"),
          sum(col("toks")).over(wCum).as("cum_tokens"),
          sum(col("types")).over(wCum).as("cum_types"))
        .select(col("b"), col("cum_tokens"), col("cum_types"),
          floor(log(col("cum_tokens").cast("double")) * 1000).cast("long")
            .as("xq"),
          floor(log(col("cum_types").cast("double")) * 1000).cast("long")
            .as("yq"))
      val fit = ck.agg(count(lit(1)).as("k"),
          sum(col("xq")).as("sx"), sum(col("yq")).as("sy"),
          sum(col("xq") * col("xq")).as("sxx"),
          sum(col("xq") * col("yq")).as("sxy"))
        .select((lit(1000) * (col("k") * col("sxy") - col("sx") * col("sy")))
            .as("num"),
          (col("k") * col("sxx") - col("sx") * col("sx")).as("den"))
        .select(expr("""CASE WHEN den = 0 THEN NULL
                       |ELSE (num - ((num % den + den) % den)) div den
                       |END""".stripMargin).as("beta_pm"))
      ck.select(col("b").as("bucket"), col("cum_tokens"), col("cum_types"))
        .crossJoin(broadcast(fit))
        .orderBy(col("bucket"))
    }),

    // Tokenization: whitespace count vs a BPE-ish regex ([a-z]+ runs,
    // digit runs, single other glyphs) — the regex subset chosen to
    // behave identically under Java regex and RE2.
    "q_text_tokens" -> ((s, d) => {
      Tables.documents(s, d).select(
        col("doc_id"),
        size(split(col("text"), " ")).as("ws_tokens"),
        expr("size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))")
          .as("re_tokens"),
        size(array_distinct(split(col("text"), " "))).as("distinct_tokens"))
        .orderBy(col("doc_id"))
    }),

    // Profile-based language ID: build a top-10-words-by-frequency
    // profile per labelled language (tie-broken deterministically), score
    // each document by profile-hit ratio, predict the argmax. The n-gram
    // profile method at its word-unigram degenerate point — the fixture's
    // langs share one vocabulary (word soup), so the interesting part is
    // the deterministic pipeline, not the accuracy.
    "q_text_langid" -> ((s, d) => {
      // ONE corpus scan: the exploded token table is cached and every
      // derived relation (profiles, per-doc token counts, the language
      // domain, the true-label join) comes from it — the uncached version
      // re-scanned and re-exploded the corpus three times. The profile is
      // ≤ 10 rows per language → broadcast to the hit join. The harness
      // clears the session cache between queries.
      //
      // Memory envelope at scale: persist() here is MEMORY_AND_DISK (the
      // Dataset default) — (doc_id, lang, token) rows for a 100 TB corpus
      // are far past executor memory, so partitions that don't fit SPILL
      // TO DISK rather than evict-and-recompute (recompute = re-exploding
      // the corpus, the exact cost this cache exists to avoid). If the
      // cluster's disks are the constraint instead, drop the persist and
      // accept the 3 scans — never MEMORY_ONLY here.
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          explode(array_distinct(split(col("text"), " "))).as("w"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val prof = tok.groupBy(col("lang"), col("w")).count()
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("lang"))
            .orderBy(col("count").desc, col("w"))))
        .where(col("rn") <= 10)
        .select(col("lang").as("plang"), col("w"))
      // tokens are already distinct per doc, so count(*) = n_tok; carrying
      // lang here also replaces the final re-scan join for the true label
      val nTok = tok.groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("n_tok"))
      val hits = tok.select(col("doc_id"), col("w"))
        .join(broadcast(prof), Seq("w"))
        .groupBy(col("doc_id"), col("plang"))
        .agg(count(lit(1)).as("nhits"))
      val langs = tok.select(col("lang").as("plang")).distinct()
      val scored = nTok.crossJoin(broadcast(langs))
        .join(hits, Seq("doc_id", "plang"), "left")
        .select(col("doc_id"), col("lang"), col("plang"),
          (coalesce(col("nhits"), lit(0L)).cast("double") /
            col("n_tok")).as("score"))
      scored.withColumn("rn", row_number().over(
          Window.partitionBy(col("doc_id"))
            .orderBy(col("score").desc, col("plang"))))
        .where(col("rn") === 1)
        .select(col("doc_id"), col("lang"), col("plang").as("pred_lang"),
          col("score"))
        .orderBy(col("doc_id"))
    }),

    // Curation funnel: the chained quality gates of a training-data
    // pipeline (length floor → lexical diversity → stopword presence),
    // reported as cumulative survivor counts per language. ONE scan with
    // conditional aggregation — the funnel never materializes
    // intermediate filtered tables or re-reads the corpus per stage.
    "q_text_filter_funnel" -> ((s, d) => {
      val toks = split(col("text"), " ")
      val nw = size(toks).cast("double")
      val uniqRatio = size(array_distinct(toks)).cast("double") / nw
      val hasStop = size(filter(toks, t => t === "a" || t === "the")) > 0
      val s1 = nw >= 30.0
      val s2 = s1 && (uniqRatio > 0.45)
      val s3 = s2 && hasStop
      Tables.documents(s, d)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_total"),
          sum(s1.cast("long")).as("n_len"),
          sum(s2.cast("long")).as("n_diverse"),
          sum(s3.cast("long")).as("n_kept"))
        .orderBy(col("lang"))
    }),

    // Statistical language-model quality scoring (CCNet-style): an
    // add-1-smoothed bigram LM trained on the corpus itself scores each
    // document by Σ log p(w_i | w_{i-1}) — the perplexity-proxy quality
    // gate. Everything is rational (counts, +1, vocab size) except the
    // final ln, which is floor-quantized at 1e4 per DISTINCT bigram
    // before the (integer, order-free) per-doc sum — the q_math_funcs
    // transcendental discipline. Shapes that scale: bigram counts are
    // one groupBy of (a, b) pairs; doc scoring joins (doc_id, a, b)
    // triples — never text — against the count tables; the vocab size
    // is a scalar broadcast.
    "q_text_lm_score" -> ((s, d) => lmDocScores(s, d).orderBy(col("doc_id"))),

    // Repetition quality signal (Gopher/C4-style): the fraction of a
    // document's word trigrams that are duplicates — high values flag
    // boilerplate, spam, and degenerate generations. Single scan, all
    // codegen'd array expressions, no shuffle except the output sort; at
    // corpus scale this is a pure map stage that fuses into whatever
    // scan feeds it.
    "q_text_repetition" -> ((s, d) => {
      val trigrams = expr(
        """CASE WHEN size(toks) >= 3 THEN
          |  transform(sequence(1, size(toks) - 2),
          |    i -> concat_ws(' ', element_at(toks, i),
          |                        element_at(toks, i + 1),
          |                        element_at(toks, i + 2)))
          |ELSE array(array_join(toks, ' ')) END""".stripMargin)
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), trigrams.as("tri"))
        .select(col("doc_id"),
          size(col("tri")).as("n_tri"),
          size(array_distinct(col("tri"))).as("n_tri_uniq"),
          (lit(1.0) - size(array_distinct(col("tri"))).cast("double") /
            size(col("tri")).cast("double")).as("rep_ratio"))
        .orderBy(col("doc_id"))
    }),

    // Winnowing fingerprint (custom expression, rolling 16-byte
    // polynomial min-hash). Oracle-checked: the hash is pure integer
    // arithmetic over fixed public constants (B=1000003, M=2^31-1), so a
    // recursive CTE replays the byte loop exactly — nothing about it is
    // engine-specific.
    "q_text_fingerprint" -> ((s, d) => {
      Tables.documents(s, d).select(
        col("doc_id"),
        rolling_fingerprint(col("text"), 16).as("fp"))
        .orderBy(col("doc_id"))
    }),

    // Unicode hygiene — the pass every web corpus needs BEFORE any
    // exact-match operator: NFC canonical composition (decomposed
    // e+U+0301 and composed é are the same text but different bytes —
    // different hashes, different shingles, different blocklist misses),
    // then strip control characters (except \t \n) and the zero-width
    // family (ZWSP/ZWNJ/ZWJ/BOM — invisible chars that split tokens and
    // defeat dedup). The fixture corpus is clean ASCII, so each doc
    // deterministically injects one taint class by doc_id % 4 (combining
    // mark / zero-width / control / none) — the operator must fix
    // exactly the first three and pass the fourth through unchanged.
    // Everything is per-row expression work inside the scan stage (no
    // shuffle before the presentation sort); normalization is the
    // compiled [[graft.functions.NfcNormalize]] (JDK UAX #15 — Spark has
    // no built-in), whose output DuckDB's utf8proc-backed nfc_normalize
    // reproduces byte-for-byte, making even the STRING column
    // hash-exact across engines.
    "q_text_sanitize" -> ((s, d) => {
      import graft.functions.TextFunctions.nfc_normalize
      // taints are spelled as \u escapes end-to-end (raw combining /
      // zero-width / control bytes in source are invisible to review)
      val frag = substring(col("text"), 1, 32)
      val kind = pmod(col("doc_id"), lit(4)).cast("long")
      val dirty = when(kind === 0, concat(frag, lit(" cafe\u0301")))
        .when(kind === 1, concat(frag, lit(" zero\u200Bwidth\uFEFFmark")))
        .when(kind === 2, concat(frag, lit(" ctrl\u0007bell\u000Bvt")))
        .otherwise(frag)
      val ctrlClass =
        "[\u0000-\u0008\u000B\u000C\u000E-\u001F\u007F]"
      val zwClass = "[\u200B\u200C\u200D\uFEFF]"
      Tables.documents(s, d)
        .select(col("doc_id"), kind.as("kind"), dirty.as("d"))
        .select(col("doc_id"), col("kind"),
          length(col("d")).cast("long").as("len_dirty"),
          regexp_replace(regexp_replace(nfc_normalize(col("d")),
            ctrlClass, ""), zwClass, "").as("clean"),
          col("d"))
        .select(col("doc_id"), col("kind"), col("len_dirty"), col("clean"),
          length(col("clean")).cast("long").as("len_clean"),
          when(col("clean") === col("d"), 0L).otherwise(1L).as("changed"))
        .orderBy(col("doc_id"))
    }),

    // Winnowing fingerprint SETS (Schleimer/Wilkerson/Aiken, the MOSS
    // selection): token-trigram hashes, window w=4, keep the RIGHTMOST
    // minimum per window — the robust selection whose guarantee is
    // that any shared token run of ≥ w+k−1 = 6 tokens between two
    // documents shares at least one selected fingerprint, at an
    // expected density of 2/(w+1) instead of one-hash-per-position.
    // The whole selection is per-row array math (no shuffle before the
    // presentation sort): at 100 TB this is a map stage emitting ~n/2.5
    // (pos, fp) pairs per n-token doc, and the fingerprint inverted
    // index — not the text — is what a plagiarism/overlap service
    // shuffles. Hashes ride the engine-neutral 40-bit fold, so the
    // oracle replays selection byte-for-byte.
    "q_text_winnow" -> ((s, d) => {
      import graft.functions.VectorFunctions.neutral_hash40
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
      val shingles = when(size(col("w")) >= 3,
          transform(sequence(lit(1), size(col("w")) - 2),
            i => concat_ws(" ", element_at(col("w"), i),
              element_at(col("w"), i + 1), element_at(col("w"), i + 2))))
        .otherwise(array(array_join(col("w"), " ")))
      val hashed = toks.select(col("doc_id"),
        transform(shingles, s0 => neutral_hash40(s0)).as("h"))
      // rightmost argmin of window j..j+3 via first position in the
      // reversed slice: pos = j + 5 − position_from_right. The
      // (pos, fp) pair dedups as ONE encoded long (pos·2⁴⁰ + fp — fp
      // is 40 bits by construction; safe while positions < 2²³, i.e.
      // docs under ~8M tokens — chunk first beyond that) because
      // DuckDB's list_distinct can't take struct lists, and the
      // encoding must be the same on both engines for the set to
      // match.
      val enc = lit(1099511627776L)
      val fps = when(size(col("h")) >= 4,
          array_distinct(transform(sequence(lit(0), size(col("h")) - 4),
            j => {
              val win = slice(col("h"), j + 1, lit(4))
              val m = array_min(win)
              (j + lit(5) - array_position(reverse(win), m))
                .cast("long") * enc + m
            })))
        .otherwise(array(
          (size(col("h")) + lit(1) -
            array_position(reverse(col("h")), array_min(col("h"))))
            .cast("long") * enc + array_min(col("h"))))
      hashed.select(col("doc_id"), explode(fps).as("code"))
        .select(col("doc_id"),
          expr("code div 1099511627776").as("pos"),
          expr("code % 1099511627776").as("fp"))
        .orderBy(col("doc_id"), col("pos"))
    }),

    // Context-window chunking: split each document into fixed-width
    // token windows (32 tokens, stride 16 → 50% overlap) — the step that
    // turns a variable-length corpus into training-context-sized pieces.
    // Pure per-row generator work (sequence + posexplode + slice), no
    // shuffle except the output sort: at corpus scale this is a map
    // stage that fuses into the scan, and output rows ≈ 2× token count
    // regardless of document skew (a 1 GB document becomes many rows,
    // never one giant row downstream).
    "q_text_chunk" -> ((s, d) => {
      val width = 32
      val stride = 16
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("toks"),
          posexplode(sequence(lit(1), size(col("toks")), lit(stride))))
        .select(col("doc_id"), col("pos").as("chunk_id"),
          concat_ws(" ", slice(col("toks"), col("col"), lit(width)))
            .as("chunk"),
          least(lit(width), size(col("toks")) - col("col") + 1)
            .as("chunk_tokens"))
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    // TF-IDF keyword extraction: top-3 terms per document. idf is the
    // rational (N - df + 0.5)/(df + 0.5) form (BM25's idf without the
    // log) — every arithmetic step is a single correctly-rounded IEEE
    // double op, so scores are bit-identical across engines with no
    // quantization. Scale shape: tf is ONE (doc_id, term) shuffle with
    // map-side combine; df aggregates the tf table (vocabulary-sized,
    // far smaller than the corpus) and broadcasts back; the top-k window
    // shuffles only (doc_id, term, score) triples.
    "q_text_tfidf" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      val tf = tok.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val n = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(broadcast(df), "term")
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("term"), col("tf"),
          (col("tf").cast("double") *
            ((col("n_docs") - col("df") + lit(0.5)) /
              (col("df") + lit(0.5)))).as("score"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term"))
      scored.withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3)
        .select(col("doc_id"), col("rk"), col("term"), col("tf"), col("score"))
        .orderBy(col("doc_id"), col("rk"))
    }),

    // Okapi BM25 (k1=1.2, b=0.75) for a fixed query-term set — the
    // doc-length-normalized retrieval score TF-IDF lacks, and the one a
    // pipeline reaches for in decontamination-by-retrieval and
    // quality-ranked candidate pools. Scale shape mirrors q_text_tfidf:
    // the term filter applies in the explode's own stage (only matching
    // (doc_id, term) pairs ever shuffle), df and the two corpus scalars
    // are broadcast back, and the score is a map-side expression.
    // Determinism: every constant is a literal spelled identically in
    // both engines (never computed at runtime — 1.2+1 and the literal
    // 2.2 are DIFFERENT doubles), 1-b=0.25 is written as 0.25 (exact in
    // binary), avgdl is a ratio of exact integers, and ln rides the
    // established floor-1e4 quantization (same envelope as
    // q_text_lm_score).
    "q_text_bm25" -> ((s, d) =>
      bm25TermScores(s, d).orderBy(col("doc_id"), col("term"))),

    // INCREMENTAL BM25 index-stats maintenance — the retrieval family's
    // nightly fold (q_agg_incremental's pattern applied to the search
    // index): a production index refresh does not rescan the corpus for
    // df/N/avgdl, it folds the delta segment's statistics onto the
    // stored ones. The corpus splits at the family's max·4/5 cut; the
    // delta's (df, doc-count, length-sum) rows come from ONE
    // aggregation over the new docs and merge onto the stored side's by
    // pure addition — and because the oracle computes the FROM-SCRATCH
    // statistics over the whole corpus, the hash match IS the
    // merge-equals-recompute proof. Emits, per query term: stored /
    // delta / merged df, merged corpus size, merged avgdl, and the
    // BM25 idf the next scoring run would use. The ingest-time twin is
    // q_stream_index_stats (same delta shape as streaming state, same
    // merge, ONE shared oracle).
    "q_retrieval_incremental" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), size(col("w")).cast("long").as("dl"),
          col("w"))
      val cut = docs.agg((max(col("doc_id")) * 4).as("m"))
        .head.getLong(0) / 5
      mergedIndexStats(s, d, cut,
        indexDeltaRows(docs.where(col("doc_id") >= cut)))
    }),

    // Dirichlet-smoothed query likelihood (Zhai & Lafferty 2001) — the
    // third canonical lexical ranker after TF-IDF and BM25, and the one
    // with a probabilistic reading: score(q,d) = Σ_w ln((tf + μ·P(w|C))
    // / (dl + μ)), μ = 100 (sized to the fixture's ~100-token docs so
    // the document signal isn't drowned; the knob is one literal in
    // both engines). Unlike BM25's tf-gated sum, EVERY query term
    // scores every document (smoothing gives absent terms mass from
    // the collection model) — so the plan is docs × |q| via TWO
    // broadcast scalar joins (collection stats) and a LEFT join for
    // tf, never a corpus×vocab fan-out. Per-term lns are floor-1e4
    // quantized then integer-summed (order-free), the established
    // envelope. Query terms that miss the whole corpus drop out of
    // the cf table in BOTH engines identically.
    "q_text_ql" -> ((s, d) => {
      val qterms = Seq("scan", "filter", "vector")
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), size(col("w")).cast("long").as("dl"),
          col("w"))
      val tok = docs
        .select(col("doc_id"), explode(col("w")).as("term"))
      val ctot = tok.agg(count(lit(1)).as("ctot"))
      val tf = tok.where(col("term").isin(qterms: _*))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val cf = tf.groupBy(col("term")).agg(sum(col("tf")).as("cf"))
      docs.select(col("doc_id"), col("dl"))
        .crossJoin(broadcast(cf)).crossJoin(broadcast(ctot))
        .join(tf, Seq("doc_id", "term"), "left")
        .select(col("doc_id"),
          floor(log(
            (coalesce(col("tf"), lit(0L)).cast("double") +
              lit(100.0) * col("cf").cast("double") /
                col("ctot").cast("double")) /
            (col("dl").cast("double") + lit(100.0))) * lit(1e4))
            .cast("long").as("t"))
        .groupBy(col("doc_id")).agg(sum(col("t")).as("ql_q"))
        .orderBy(col("doc_id"))
    }),

    // Per-source distinct-trigram cardinality two ways: exact
    // countDistinct (the baseline) and the K-Minimum-Values sketch
    // (native KmvAgg aggregate, K=64) — the mergeable distinct-count
    // sketch whose estimate is REPLAYABLE in plain SQL, unlike HLL++'s
    // engine-private registers (which is why q_agg_approx is rows-only
    // checked but this one oracle-checks exactly). Distinct trigrams
    // per source is the content-diversity signal a mixing pipeline
    // reads (a source whose trigram cardinality plateaus while its doc
    // count grows is template spam). Scale shape: the sketch is ONE
    // (source → 64 longs) aggregate with map-side partial combine —
    // no distinct-shuffle of the trigram universe, which is exactly
    // what countDistinct must do and the sketch exists to avoid; the
    // exact twin rides along here as the fixture-scale error witness.
    "q_agg_distinct_kmv" -> ((s, d) => {
      import graft.functions.VectorFunctions.neutral_hash40
      import graft.functions.KmvAgg.{kmv_agg, K}
      val tri = Tables.documents(s, d)
        .select(col("source"), split(col("text"), " ").as("w"))
        .select(col("source"), explode(
          when(size(col("w")) >= 3,
            transform(sequence(lit(1), size(col("w")) - 2),
              i => concat_ws(" ", element_at(col("w"), i),
                element_at(col("w"), i + 1), element_at(col("w"), i + 2))))
          .otherwise(array(array_join(col("w"), " ")))).as("sh"))
      tri.groupBy(col("source"))
        .agg(countDistinct(col("sh")).as("exact_distinct"),
          kmv_agg(neutral_hash40(col("sh"))).as("kmv"))
        .select(col("source"), col("exact_distinct"),
          when(size(col("kmv")) < K, size(col("kmv")).cast("long"))
            .otherwise(expr(
              s"(${K - 1} * 1099511627776) div element_at(kmv, $K)"))
            .as("kmv_est"))
        .orderBy(col("source"))
    }),

    // Sketch ALGEBRA on the same KMV signatures: pairwise cross-source
    // content overlap estimated from the 64-hash sketches alone
    // (bottom-k Jaccard: J ≈ |B_k(A∪B) ∩ A ∩ B| / k_eff, the classic
    // min-wise estimator over the k smallest union hashes), with the
    // exact trigram-set Jaccard alongside as the error witness. This is
    // the operation sketches EXIST for at 100 TB: all C(n_sources, 2)
    // overlaps from n_sources × 64 longs — the corpus is touched once
    // to build signatures, never per pair; the pair stage is a k²-row
    // comparison of 64-element arrays. The exact arm rides the
    // inverted shingle index (≤ C(20,2) pair rows per shingle), itself
    // the fixture-scale witness, not the scale path. All-integer
    // estimate ((1e6·est_inter) div k_eff) → exact oracle replay.
    "q_agg_kmv_jaccard" -> ((s, d) => {
      import graft.functions.VectorFunctions.neutral_hash40
      import graft.functions.KmvAgg.{kmv_agg, K}
      val tri = Tables.documents(s, d)
        .select(col("source"), split(col("text"), " ").as("w"))
        .select(col("source"), explode(
          when(size(col("w")) >= 3,
            transform(sequence(lit(1), size(col("w")) - 2),
              i => concat_ws(" ", element_at(col("w"), i),
                element_at(col("w"), i + 1), element_at(col("w"), i + 2))))
          .otherwise(array(array_join(col("w"), " ")))).as("sh"))
      // one trigram explode for both the distinct arm and the sketch
      // arm, and one distinct for its three consumers (sizes + both
      // exact self-join sides) — r15, the Dedup self-join
      // materialization argument applied here
      val triM = tri.localCheckpoint()
      val ds = triM.distinct().localCheckpoint()
      val sizes = ds.groupBy(col("source")).agg(count(lit(1)).as("n"))
      val inter = ds.as("a").join(ds.as("b"),
          col("a.sh") === col("b.sh") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("sa"), col("b.source").as("sb"))
        .agg(count(lit(1)).as("inter"))
      // NOT checkpointed: the one corpus-sized ObjectHashAggregate is
      // the query's plan contract (PlanSpec asserts it); it reads the
      // materialized trigram table, so the re-derivation per self-join
      // side is an agg over a checkpoint scan, not a re-explode
      val sk = triM.groupBy(col("source"))
        .agg(kmv_agg(neutral_hash40(col("sh"))).as("kmv"))
      // deliberate k²-row sketch-pair product: the sketch table is
      // n_sources rows BY DESIGN (that's the whole point of sketching)
      val est = sk.as("x")
        .join(sk.as("y"), col("x.source") < col("y.source"))
        .select(col("x.source").as("sa"), col("y.source").as("sb"),
          col("x.kmv").as("ka"), col("y.kmv").as("kb"))
        .select(col("sa"), col("sb"), col("ka"), col("kb"),
          expr(s"slice(array_sort(array_union(ka, kb)), 1, $K)").as("bk"))
        .select(col("sa"), col("sb"),
          size(col("bk")).as("keff"),
          expr("size(filter(bk, v -> array_contains(ka, v)" +
            " AND array_contains(kb, v)))").as("ei"))
      est
        .join(inter, Seq("sa", "sb"), "left")
        .join(sizes.select(col("source").as("sa"), col("n").as("na")), "sa")
        .join(sizes.select(col("source").as("sb"), col("n").as("nb")), "sb")
        .select(col("sa"), col("sb"),
          expr("(1000000 * coalesce(inter, 0L))" +
            " div (na + nb - coalesce(inter, 0L))").as("exact_j_q"),
          expr("(1000000 * ei) div keff").as("kmv_j_q"))
        .orderBy(col("sa"), col("sb"))
    }),

    // Interpolated Kneser-Ney bigram smoothing (Kneser & Ney 1995; Chen
    // & Goodman 1998's interpolated form) — the LM-data step beyond
    // q_text_lm_score's +1-smoothed bigram model: absolute discount
    // D = 0.75 off every observed bigram count, with the freed mass
    // backed off to the CONTINUATION unigram (how many distinct left
    // contexts a word follows — the "San Francisco" fix: 'Francisco' is
    // frequent but predictable, so its continuation count stays low).
    //   P(w2|w1) = max(c12 − D, 0)/c1 + (D·N1+(w1·)/c1) · N1+(·w2)/NB
    // Everything is integer-exact: with D = 3/4, multiply through by 4
    // and quantize ⌊1e6 · P⌋ as
    //   (1e6 · (max(4·c12 − 3, 0)·NB + 3·nf(w1)·np(w2))) div (4·c1·NB)
    // — one integer division, no float path, bit-identical across
    // engines (magnitudes stay < 2^47 at sf0.1, far inside BIGINT).
    // Scale shape: ONE (w1,w2) shuffle with map-side combine builds the
    // bigram table; nf/c1 and np are vocabulary-sized aggregates OF that
    // table (not corpus re-scans) broadcast back; NB is a scalar
    // cross-join. The emitted table is what a KN-smoothed n-gram scorer
    // consumes; unseen bigrams take the pure backoff term by
    // construction (not emitted — the table is the model, the formula
    // is total).
    "q_text_lm_kn" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
      val bi = toks.where(size(col("w")) >= 2)
        .select(explode(expr(
          """transform(sequence(1, size(w) - 1),
            |  i -> struct(element_at(w, i) AS w1,
            |              element_at(w, i + 1) AS w2))""".stripMargin))
          .as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      val c12 = bi.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("c12"))
      val left = c12.groupBy(col("w1"))
        .agg(count(lit(1)).as("nf"), sum(col("c12")).as("c1"))
      val right = c12.groupBy(col("w2"))
        .agg(count(lit(1)).as("np"))
      val nb = c12.agg(count(lit(1)).as("nb"))
      c12.join(broadcast(left), "w1")
        .join(broadcast(right), "w2")
        .crossJoin(broadcast(nb))
        .select(col("w1"), col("w2"), col("c12"),
          expr("""(1000000 * (greatest(4 * c12 - 3, 0L) * nb
                 |           + 3 * nf * np)) div (4 * c1 * nb)"""
            .stripMargin).as("p_kn_q"))
        .orderBy(col("w1"), col("w2"))
    }),

    // PMI collocation mining (Church & Hanks 1990): rank adjacent word
    // pairs by pointwise mutual information
    //   pmi(w1,w2) = ln( P(w1,w2) / (P(w1)·P(w2)) )
    //              = ln( c12·N·N / (c1·c2·N12) )
    // — the phrase-mining signal that separates true collocations
    // (bigram far above chance) from frequent-but-independent
    // neighbors, which raw bigram counts (q_text_heavy_hitters) and
    // conditional probabilities (q_text_lm_kn) both conflate. The
    // c12 ≥ 5 support floor is the standard guard against PMI's
    // low-count explosion. Determinism: all counts are exact integers
    // whose products stay under 2^53 (exact in doubles), the single
    // division is one correctly-rounded IEEE op, and ln rides the
    // established floor-1e4 quantization envelope (same as BM25 /
    // LM-score). Scale shape: one (w1,w2) shuffle with map-side
    // combine for bigrams, a vocabulary-sized unigram aggregate
    // broadcast back, two scalar totals via broadcast cross-join —
    // the corpus is scanned once per granularity, never joined.
    "q_text_collocations" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
      val uni = toks.select(explode(col("w")).as("t"))
        .groupBy(col("t")).agg(count(lit(1)).as("c"))
      val nTok = uni.agg(sum(col("c")).as("n_tok"))
      val bi = toks.where(size(col("w")) >= 2)
        .select(explode(expr(
          """transform(sequence(1, size(w) - 1),
            |  i -> struct(element_at(w, i) AS w1,
            |              element_at(w, i + 1) AS w2))""".stripMargin))
          .as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      val nBi = bi.agg(sum(col("c12")).as("n_bi"))
      bi.where(col("c12") >= 5)
        .join(broadcast(uni.select(col("t").as("w1"), col("c").as("c1"))),
          "w1")
        .join(broadcast(uni.select(col("t").as("w2"), col("c").as("c2"))),
          "w2")
        .crossJoin(broadcast(nTok)).crossJoin(broadcast(nBi))
        .select(col("w1"), col("w2"), col("c12"),
          floor(log(
            (col("c12").cast("double") * col("n_tok").cast("double") *
              col("n_tok").cast("double")) /
            (col("c1").cast("double") * col("c2").cast("double") *
              col("n_bi").cast("double"))) * lit(1e4))
            .cast("long").as("pmi_q"))
        .orderBy(col("pmi_q").desc, col("w1"), col("w2"))
    }),

    // Global heavy hitters: exact top-20 terms by corpus frequency with
    // per-term document frequency. Both aggregates partial-combine
    // map-side; the final top-k is TakeOrdered-sized (k rows to the
    // driver). At 100 TB the same plan holds — the only full-width
    // shuffle is (term, partial-count) pairs; swap in a count-min/
    // space-saving sketch only if the vocabulary itself outgrows the
    // cluster (billions of distinct terms).
    "q_text_heavy_hitters" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy(col("term"))
        .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("n").desc, col("term"))
        .limit(20)
    }),

    // Approximate heavy hitters via a Count-Min sketch (the native
    // graft.functions.CountMinAgg TypedImperativeAggregate): one pass
    // folds every token into a 4×256 counter matrix that merges
    // elementwise — at 100 TB each executor sketches its split and only
    // 1024 longs travel, vs. the exact path's full term dictionary
    // shuffle. The exact counts computed alongside exist to VERIFY the
    // sketch (est ≥ exact, bounded overestimate); a production pipeline
    // would skip them — that's the point of the sketch. The engine-
    // neutral hash (UTF-8 byte fold mod 2^20, Knuth row mix) lets DuckDB
    // rebuild the identical sketch in SQL, making an approximate
    // operator fully oracle-checked. Update AND lookup use the same
    // compiled byte fold (CountMinAgg.baseHash), so the upper-bound
    // invariant holds for any input, not just ASCII; the DuckDB twin's
    // codepoint fold equals the byte fold on the ASCII fixtures
    // (asserted in OperatorsSpec).
    "q_text_heavy_hitters_approx" -> ((s, d) => {
      import graft.functions.CountMinAgg.{cms_base, count_min_agg}
      val toks = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("term"))
      val sketch = toks.agg(count_min_agg(col("term")).as("cms"))
      val top = toks.groupBy(col("term"))
        .agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("term"))
        .limit(20)
      val est = (0 until 4).map { r =>
        s"element_at(cms, CAST(shiftright(base * ${2654435761L + r}, 16) " +
          s"% 256 + ${r * 256} + 1 AS INT))"
      }.mkString("least(", ", ", ")")
      top.crossJoin(broadcast(sketch))
        .withColumn("base", cms_base(col("term")))
        .withColumn("cms_est", expr(est))
        .select(col("term"), col("n_exact"), col("cms_est"))
        .orderBy(col("n_exact").desc, col("term"))
    }),

    // Cross-document duplicated-passage signal: the fraction of each
    // document's distinct word 8-grams that occur in at least one OTHER
    // document — the span-level dedup metric (C4/RefinedWeb-style
    // repeated-passage hygiene) that pair-level Jaccard doesn't give
    // you. Same inverted-index discipline as the dedup family: spans
    // are hash-grouped once for df, joined back by span, and only
    // (doc_id, span) pairs ever shuffle — never text bodies.
    "q_text_dup_spans" -> ((s, d) => {
      val spans = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), explode(expr(
          """CASE WHEN size(toks) >= 8 THEN
            |  array_distinct(transform(sequence(1, size(toks) - 7),
            |    i -> concat_ws(' ', slice(toks, i, 8))))
            |ELSE array(array_join(toks, ' ')) END""".stripMargin))
          .as("span"))
        // r15: feeds the df aggregate AND the join back — the 8-gram
        // explode otherwise runs twice per query (the Dedup
        // jaccardPairsFrom materialization argument)
        .localCheckpoint()
      val df = spans.groupBy(col("span"))
        .agg(countDistinct(col("doc_id")).as("sdf"))
      spans.join(df, "span")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"),
          sum((col("sdf") >= 2).cast("long")).as("n_dup_spans"))
        .select(col("doc_id"), col("n_spans"), col("n_dup_spans"),
          (col("n_dup_spans").cast("double") / col("n_spans"))
            .as("dup_frac"))
        .orderBy(col("doc_id"))
    }),

    // Duplicated-span REMOVAL — the reconstruction half of
    // q_text_dup_spans (the Lee-et-al.-style substring-level dedup every
    // production corpus gets): positional word 8-grams are owned by the
    // lowest doc_id containing them corpus-wide; every later occurrence
    // marks its 8 token positions for excision, and each doc's text is
    // rebuilt from the surviving tokens. Distribution discipline matches
    // the detection pass: spans hash-group once for ownership, and only
    // (doc_id, position) pairs ever shuffle — the text bodies stay in
    // their scan partitions until the final index-filtered rebuild.
    // Docs under 8 tokens have no spans and pass through unchanged.
    "q_text_despanned" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
      val spans = toks.where(size(col("w")) >= 8)
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(1, size(w) - 7), i -> concat_ws(' ', slice(w, i, 8)))")))
        .toDF("doc_id", "pos", "span")
        // r15: feeds the ownership aggregate AND the join back — one
        // positional explode per query, not two
        .localCheckpoint()
      val owner = spans.groupBy(col("span"))
        .agg(min(col("doc_id")).as("owner_id"))
      val rm = spans.join(owner, "span")
        .where(col("doc_id") > col("owner_id"))
        .select(col("doc_id"),
          explode(sequence(col("pos"), col("pos") + 7)).as("p"))
        .distinct()
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_set(col("p"))).as("ps"))
      toks.join(rm, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("ps").isNull, concat_ws(" ", col("w")))
            // ps is sorted and token indices arrive in order, so the
            // rebuild is one O(n + |ps|) merge scan — not the HOF
            // filter+array_contains spelling, whose O(|ps|)-per-token
            // membership test degrades on heavily-despanned docs
            .otherwise(graft.functions.TextFunctions.remove_tokens_at(
              col("w"), col("ps")))
            .as("clean_text"),
          coalesce(size(col("ps")), lit(0)).as("n_removed"))
        .orderBy(col("doc_id"))
    }),

    // RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    // the maximal stopword-free token runs (gaps-and-islands over token
    // positions — pos minus the per-doc rank of surviving tokens is
    // constant within a run), capped at 4 tokens per standard practice;
    // each member word scores degree/frequency over the candidate-phrase
    // corpus (degree = Σ length of phrases containing the word — its
    // co-occurrence reach; frequency = its occurrence count), and a
    // phrase scores the sum of its members' scores. The stopword list is
    // CORPUS-DERIVED — the 10 most frequent tokens (count desc, token
    // asc) — per the round-8 rule that every data-dependent width
    // derives from the data: a hand-picked list goes stale, and at
    // 100 TB "frequent" is exactly what a stoplist means. The fixture
    // proves the point by inversion: its English function words
    // ('the', 'a') are RARE (~125 occurrences vs ~950 for content
    // tokens), so the derived list correctly keeps them phrase-eligible
    // where a hand-picked English stoplist would silently delete the
    // wrong 10% of this corpus. Per-member
    // scores are (1000·degree) div freq so the phrase score is an exact
    // nonnegative-integer sum. Scale shape: one explode + per-doc
    // windows, vocab-sized stats broadcast back, distributed TakeOrdered
    // top-20; the ONLY global window ranks the vocab-sized (31-row)
    // frequency table (census-whitelisted).
    "q_text_rake" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      val stops = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("c").desc, col("tok"))))
        .where(col("rk") <= 10)
        .select(col("tok"), lit(true).as("is_stop"))
      val content = toks.join(broadcast(stops), Seq("tok"), "left")
        .where(col("is_stop").isNull)
      val phrases = content
        .withColumn("grp", col("pos") - row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
        .groupBy(col("doc_id"), col("grp"))
        .agg(count(lit(1)).as("plen"),
          array_sort(collect_list(struct(col("pos"), col("tok"))))
            .as("mem"))
        .where(col("plen") <= 4)
        // r15: phrases feeds the member explode AND the final score
        // join — as a plan, the explode + stop join + run-length window
        // + collect_list aggregate above ran twice per query
        .localCheckpoint()
      val members = phrases.select(col("doc_id"), col("grp"), col("plen"),
        explode(expr("transform(mem, m -> m.tok)")).as("tok"))
      val wordStats = members.groupBy(col("tok"))
        .agg(count(lit(1)).as("freq"), sum(col("plen")).as("degree"))
      val scored = members.join(broadcast(wordStats), "tok")
        .groupBy(col("doc_id"), col("grp"))
        .agg(sum(expr("(1000 * degree) div freq")).as("score_q"))
      phrases.join(scored, Seq("doc_id", "grp"))
        .select(expr("array_join(transform(mem, m -> m.tok), ' ')")
          .as("phrase"), col("plen"), col("score_q"))
        .groupBy(col("phrase"))
        .agg(max(col("plen")).as("plen"), count(lit(1)).as("n_occ"),
          max(col("score_q")).as("score_q"))
        .orderBy(col("score_q").desc, col("phrase"))
        .limit(20)
    })
  )

  /** The q_text_blocklist pattern list — fixture phrases chosen so every
    * pattern actually matches (non-vacuity asserted in OperatorsSpec) and
    * the set nests ("stream" also occurs inside no other pattern, but
    * multi-word phrases share word prefixes with each other). Shared by
    * the Spark query and its oracle VALUES list. */
  private[graft] val BlocklistPatterns: Seq[String] = Seq(
    "big table", "customer query", "fast merge", "hash join",
    "slow scan", "stream", "the line", "vector")

  val oracles: Map[String, String] = Map(

    // Same window-2 pair construction (two shifted comprehensions),
    // canonical-pair weights, and five unrolled weighted-PageRank
    // rounds replaying the integer update exactly.
    "q_text_textrank" -> {
      val rounds = (1 to 5).map { k =>
        s"""r$k AS MATERIALIZED (SELECT v.tok,
           |  (SELECT tele FROM params)
           |    + (85 * COALESCE(s2.m, 0)) // 100 AS r
           |  FROM vocab v LEFT JOIN (
           |    SELECT e.dst, CAST(SUM((r${k - 1}.r * e.w) // st.s)
           |                       AS BIGINT) AS m
           |    FROM edges e JOIN st USING (src)
           |    JOIN r${k - 1} ON r${k - 1}.tok = e.src
           |    GROUP BY e.dst) s2 ON s2.dst = v.tok)""".stripMargin
      }.mkString(",\n")
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
         |           FROM documents),
         |p1 AS (SELECT UNNEST([{a: w[i], b: w[i+1]}
         |                      for i in generate_series(1, len(w) - 1)],
         |                     recursive := true)
         |       FROM t WHERE len(w) >= 2),
         |p2 AS (SELECT UNNEST([{a: w[i], b: w[i+2]}
         |                      for i in generate_series(1, len(w) - 2)],
         |                     recursive := true)
         |       FROM t WHERE len(w) >= 3),
         |allp AS (SELECT a, b FROM p1 UNION ALL SELECT a, b FROM p2),
         |cw AS (SELECT LEAST(a, b) AS a, GREATEST(a, b) AS b,
         |         CAST(COUNT(*) AS BIGINT) AS w
         |       FROM allp WHERE a <> b GROUP BY 1, 2),
         |edges AS MATERIALIZED (
         |  SELECT a AS src, b AS dst, w FROM cw
         |  UNION ALL SELECT b, a, w FROM cw),
         |st AS MATERIALIZED (
         |  SELECT src, SUM(w) AS s FROM edges GROUP BY src),
         |vocab AS (SELECT DISTINCT UNNEST(string_split(text, ' ')) AS tok
         |          FROM documents),
         |params AS (SELECT 1000000000 // COUNT(*) AS base,
         |             (15 * (1000000000 // COUNT(*))) // 100 AS tele
         |           FROM vocab),
         |r0 AS (SELECT tok, (SELECT base FROM params) AS r FROM vocab),
         |$rounds
         |SELECT v.tok, CAST(r5.r AS BIGINT) AS rank_nn,
         |  CAST(COALESCE(st.s, 0) AS BIGINT) AS strength
         |FROM vocab v JOIN r5 ON r5.tok = v.tok
         |LEFT JOIN st ON st.src = v.tok
         |ORDER BY rank_nn DESC, v.tok LIMIT 10""".stripMargin
    },

    // Brute-force twin: same df floor (max(5, max-df/100)) and
    // rarest-3 derivation (df asc, term asc), intersection by HAVING
    // over the per-(term, doc) postings.
    "q_text_index_query" ->
      """WITH t AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
        |           FROM documents),
        |p AS (SELECT tok, doc_id, COUNT(*) AS tf FROM t GROUP BY 1, 2),
        |d AS (SELECT tok, COUNT(*) AS df FROM p GROUP BY tok),
        |fl AS (SELECT GREATEST(5, MAX(df) // 100) AS f FROM d),
        |q AS (SELECT tok FROM d, fl WHERE df >= f
        |      ORDER BY df ASC, tok ASC LIMIT 3)
        |SELECT p.doc_id, CAST(SUM(p.tf) AS BIGINT) AS sum_tf
        |FROM p JOIN q USING (tok)
        |GROUP BY p.doc_id
        |HAVING COUNT(DISTINCT p.tok) = 3
        |ORDER BY doc_id""".stripMargin,
    // The naive spelling the automaton replaces: for each (doc, pattern),
    // count match END positions by direct position scan — exactly the
    // all-occurrences (overlapping included) semantics of the AC pass.
    "q_text_blocklist" -> {
      val vals = BlocklistPatterns.zipWithIndex
        .map { case (p, i) => s"($i, '$p')" }.mkString(", ")
      s"""WITH pats AS (SELECT * FROM (VALUES $vals) p(pid, p)),
         |m AS (SELECT d.doc_id, pats.p,
         |        CAST(len([i FOR i IN
         |               generate_series(1, len(d.text) - len(pats.p) + 1)
         |             IF substr(d.text, i, len(pats.p)) = pats.p])
         |          AS BIGINT) AS hits
         |      FROM documents d CROSS JOIN pats)
         |SELECT p AS pattern,
         |       CAST(COUNT(*) FILTER (WHERE hits > 0) AS BIGINT) AS n_docs,
         |       CAST(SUM(hits) AS BIGINT) AS n_hits
         |FROM m GROUP BY p ORDER BY p""".stripMargin
    },

    // Same rank construction and 1e3-floor ln quantization; the OLS is
    // pure integer arithmetic on the five sums, so the replay is exact
    // (DuckDB hugeint sums cast back inside BIGINT).
    "q_text_zipf" ->
      """WITH tok AS (SELECT source, UNNEST(string_split(text, ' ')) AS w
        |            FROM documents),
        |cnt AS (SELECT source, w, COUNT(*) AS c
        |        FROM tok GROUP BY source, w),
        |rk AS (SELECT source, c,
        |         CAST(FLOOR(LN(CAST(ROW_NUMBER() OVER (
        |             PARTITION BY source ORDER BY c DESC, w)
        |           AS DOUBLE)) * 1000) AS BIGINT) AS xq,
        |         CAST(FLOOR(LN(CAST(c AS DOUBLE)) * 1000) AS BIGINT) AS yq
        |       FROM cnt),
        |st AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_types,
        |         CAST(SUM(c) AS BIGINT) AS n_tokens,
        |         CAST(SUM(xq) AS BIGINT) AS sx,
        |         CAST(SUM(yq) AS BIGINT) AS sy,
        |         CAST(SUM(xq * xq) AS BIGINT) AS sxx,
        |         CAST(SUM(xq * yq) AS BIGINT) AS sxy
        |       FROM rk GROUP BY source),
        |nd AS (SELECT source, n_types, n_tokens,
        |         1000 * (n_types * sxy - sx * sy) AS num,
        |         n_types * sxx - sx * sx AS den FROM st)
        |SELECT source, n_types, n_tokens,
        |  CASE WHEN den = 0 THEN NULL
        |       ELSE (num - ((num % den + den) % den)) // den
        |  END AS slope_pm
        |FROM nd ORDER BY source""".stripMargin,

    // Heaps replay: identical bigram types, COUNT(*)-derived bucket
    // split, first-occurrence cumsum, 1e3-floor-quantized logs, and
    // the zipf floor-division spelling for the slope.
    "q_text_heaps" ->
      """WITH nd AS (SELECT COUNT(*) AS n FROM documents),
        |tok AS (SELECT doc_id, w FROM (
        |    SELECT doc_id, UNNEST([ws[i] || ' ' || ws[i + 1]
        |        for i in generate_series(1, len(ws) - 1)]) AS w
        |    FROM (SELECT doc_id, string_split(text, ' ') AS ws
        |          FROM documents))),
        |tb AS (SELECT (doc_id * 20) // n AS b, COUNT(*) AS toks
        |  FROM tok CROSS JOIN nd GROUP BY (doc_id * 20) // n),
        |nb AS (SELECT (fd * 20) // n AS b, COUNT(*) AS types
        |  FROM (SELECT w, MIN(doc_id) AS fd FROM tok GROUP BY w)
        |  CROSS JOIN nd
        |  GROUP BY (fd * 20) // n),
        |ck AS (SELECT b,
        |    CAST(SUM(toks) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)
        |         AS BIGINT) AS cum_tokens,
        |    CAST(SUM(types) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)
        |         AS BIGINT) AS cum_types
        |  FROM (SELECT tb.b, tb.toks, COALESCE(nb.types, 0) AS types
        |        FROM tb LEFT JOIN nb ON nb.b = tb.b)),
        |cq AS (SELECT b, cum_tokens, cum_types,
        |    CAST(FLOOR(LN(CAST(cum_tokens AS DOUBLE)) * 1000) AS BIGINT)
        |      AS xq,
        |    CAST(FLOOR(LN(CAST(cum_types AS DOUBLE)) * 1000) AS BIGINT)
        |      AS yq
        |  FROM ck),
        |fit AS (SELECT CAST(CASE WHEN den = 0 THEN NULL
        |      ELSE (num - ((num % den + den) % den)) // den END AS BIGINT)
        |    AS beta_pm
        |  FROM (SELECT
        |      1000 * (COUNT(*) * SUM(xq * yq) - SUM(xq) * SUM(yq)) AS num,
        |      COUNT(*) * SUM(xq * xq) - SUM(xq) * SUM(xq) AS den
        |    FROM cq))
        |SELECT cq.b AS bucket, cum_tokens, cum_types, beta_pm
        |FROM cq CROSS JOIN fit ORDER BY bucket""".stripMargin,

    // Byte-exact replay of RollingFingerprint.minWindowHash (window 16,
    // base 1000003, mod 2147483647): the recursion carries (h, min) per
    // document byte position; 1828017126 = 1000003^15 mod M (the
    // outgoing-byte power), 549755813632 = M*256 (the positivity pad,
    // precomputed — DuckDB folds INT32 literals before widening).
    // Fixture text is ASCII, so ORD(SUBSTRING) = UTF-8 byte, the same
    // equivalence every multimodal oracle uses.
    // Identical trigram construction, 40-bit fold, and rightmost-min
    // selection via first-position-in-reversed-slice; struct list
    // dedup matches array_distinct on (pos, fp).
    "q_text_winnow" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
        |           FROM documents),
        |g AS (SELECT doc_id, CASE WHEN len(w) >= 3 THEN
        |        [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |         for i in generate_series(1, len(w) - 2)]
        |      ELSE [array_to_string(w, ' ')] END AS sh
        |      FROM t),
        |hh AS (SELECT doc_id, list_transform(sh, s ->
        |         list_reduce(list_prepend(CAST(0 AS BIGINT),
        |           list_transform(string_split(s, ''),
        |             c -> CAST(ascii(c) AS BIGINT))),
        |           (h, c) -> (h * 1000003 + c) % 1099511627776)) AS h
        |       FROM g),
        |win AS (SELECT doc_id,
        |    CASE WHEN len(h) >= 4 THEN
        |      list_distinct([
        |        CAST(j + 5 - list_position(list_reverse(h[j+1:j+4]),
        |                                   list_min(h[j+1:j+4]))
        |             AS BIGINT) * 1099511627776 + list_min(h[j+1:j+4])
        |        for j in generate_series(0, len(h) - 4)])
        |    ELSE [CAST(len(h) + 1 -
        |            list_position(list_reverse(h), list_min(h))
        |          AS BIGINT) * 1099511627776 + list_min(h)] END AS fps
        |  FROM hh),
        |u AS (SELECT doc_id, UNNEST(fps) AS code FROM win)
        |SELECT doc_id, CAST(code // 1099511627776 AS BIGINT) AS pos,
        |  CAST(code % 1099511627776 AS BIGINT) AS fp
        |FROM u ORDER BY doc_id, pos""".stripMargin,

    // Taint injection mirrored with chr() (DuckDB has no \u string
    // escapes); nfc_normalize is utf8proc's UAX #15 — same algorithm the
    // Spark expression gets from java.text.Normalizer, so the cleaned
    // STRING column compares hash-exact. RE2 spells codepoint classes
    // \x{...}; the 'g' flag matters (DuckDB replaces first-only by
    // default, Spark replaces all).
    "q_text_sanitize" ->
      """WITH dirty AS (
        |  SELECT doc_id, doc_id % 4 AS kind,
        |    CASE doc_id % 4
        |      WHEN 0 THEN substr(text, 1, 32) || ' cafe' || chr(769)
        |      WHEN 1 THEN substr(text, 1, 32) || ' zero' || chr(8203)
        |                  || 'width' || chr(65279) || 'mark'
        |      WHEN 2 THEN substr(text, 1, 32) || ' ctrl' || chr(7)
        |                  || 'bell' || chr(11) || 'vt'
        |      ELSE substr(text, 1, 32) END AS d
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, kind, d,
        |    regexp_replace(regexp_replace(nfc_normalize(d),
        |      '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
        |      '[\x{200B}\x{200C}\x{200D}\x{FEFF}]', '', 'g') AS clean
        |  FROM dirty)
        |SELECT doc_id, CAST(kind AS BIGINT) AS kind,
        |  CAST(length(d) AS BIGINT) AS len_dirty, clean,
        |  CAST(length(clean) AS BIGINT) AS len_clean,
        |  CASE WHEN clean = d THEN CAST(0 AS BIGINT)
        |       ELSE CAST(1 AS BIGINT) END AS changed
        |FROM c ORDER BY doc_id""".stripMargin,

    "q_text_fingerprint" ->
      """WITH m AS (SELECT doc_id, text,
        |             OCTET_LENGTH(ENCODE(text)) AS n FROM documents),
        |rec AS (
        |  WITH RECURSIVE rr(doc_id, i, h, mn) AS (
        |    SELECT doc_id, 0, CAST(0 AS BIGINT), CAST(NULL AS BIGINT)
        |    FROM m
        |    UNION ALL
        |    SELECT rr.doc_id, rr.i + 1,
        |      CASE WHEN rr.i + 1 >= 16
        |        THEN (((rr.h * 1000003
        |                + ORD(SUBSTRING(m.text, rr.i + 1, 1)))
        |               % 2147483647)
        |              - CAST(ORD(SUBSTRING(m.text, rr.i - 14, 1))
        |                     AS BIGINT) * 1828017126 % 2147483647
        |              + 549755813632) % 2147483647
        |        ELSE (rr.h * 1000003
        |              + ORD(SUBSTRING(m.text, rr.i + 1, 1))) % 2147483647
        |      END,
        |      CASE WHEN rr.i + 1 >= 16
        |        THEN LEAST(COALESCE(rr.mn, 9223372036854775807),
        |               (rr.h * 1000003
        |                + ORD(SUBSTRING(m.text, rr.i + 1, 1))) % 2147483647)
        |        ELSE rr.mn END
        |    FROM rr JOIN m ON m.doc_id = rr.doc_id
        |    WHERE rr.i < m.n)
        |  SELECT doc_id, i, h, mn FROM rr)
        |SELECT r.doc_id, CASE WHEN r.mn IS NULL THEN r.h ELSE r.mn END AS fp
        |FROM rec r JOIN m ON m.doc_id = r.doc_id AND r.i = m.n
        |ORDER BY r.doc_id""".stripMargin,

    "q_text_lm_score" ->
      (s"WITH $LmScoreCtes\n" +
        """SELECT doc_id, n_bigrams, score_q
          |FROM lm ORDER BY doc_id""".stripMargin),

    "q_text_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
        |           FROM documents),
        |g AS (SELECT doc_id, CASE WHEN len(w) >= 3 THEN
        |        [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |         for i in generate_series(1, len(w) - 2)]
        |      ELSE [array_to_string(w, ' ')] END AS tri
        |      FROM t)
        |SELECT doc_id,
        |  CAST(len(tri) AS INT) AS n_tri,
        |  CAST(len(list_distinct(tri)) AS INT) AS n_tri_uniq,
        |  1.0 - CAST(len(list_distinct(tri)) AS DOUBLE)
        |      / CAST(len(tri) AS DOUBLE) AS rep_ratio
        |FROM g ORDER BY doc_id""".stripMargin,

    "q_text_filter_funnel" ->
      """WITH t AS (
        |  SELECT lang,
        |    LEN(string_split(text, ' ')) AS nw,
        |    CAST(LEN(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |      / LEN(string_split(text, ' ')) AS uniq_ratio,
        |    LEN(list_filter(string_split(text, ' '),
        |                    x -> x = 'a' OR x = 'the')) > 0 AS has_stop
        |  FROM documents),
        |f AS (
        |  SELECT lang,
        |    nw >= 30 AS s1,
        |    nw >= 30 AND uniq_ratio > 0.45 AS s2,
        |    nw >= 30 AND uniq_ratio > 0.45 AND has_stop AS s3
        |  FROM t)
        |SELECT lang, COUNT(*) AS n_total,
        |  CAST(SUM(CAST(s1 AS BIGINT)) AS BIGINT) AS n_len,
        |  CAST(SUM(CAST(s2 AS BIGINT)) AS BIGINT) AS n_diverse,
        |  CAST(SUM(CAST(s3 AS BIGINT)) AS BIGINT) AS n_kept
        |FROM f GROUP BY lang ORDER BY lang""".stripMargin,

    "q_text_stats" ->
      """SELECT doc_id, lang, source,
        |  CAST(LENGTH(text) AS INT) AS n_chars_m,
        |  CAST(LEN(string_split(text, ' ')) AS INT) AS n_words,
        |  CAST(LEN(list_distinct(string_split(text, ' '))) AS INT)
        |    AS n_distinct,
        |  CAST(LENGTH(text) - LEN(string_split(text, ' ')) + 1 AS DOUBLE)
        |    / LEN(string_split(text, ' ')) AS avg_word_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_text_quality" ->
      """SELECT doc_id,
        |  LEAST(LEN(string_split(text, ' ')) / 100.0, 1.0) * 0.3 +
        |  (CAST(LEN(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |     / LEN(string_split(text, ' '))) * 0.4 +
        |  (CAST(LEN(list_filter(string_split(text, ' '),
        |                        t -> t = 'a' OR t = 'the')) AS DOUBLE)
        |     / LEN(string_split(text, ' '))) * 0.3 AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_text_tokens" ->
      """SELECT doc_id,
        |  CAST(LEN(string_split(text, ' ')) AS INT) AS ws_tokens,
        |  CAST(LEN(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
        |    AS INT) AS re_tokens,
        |  CAST(LEN(list_distinct(string_split(text, ' '))) AS INT)
        |    AS distinct_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    // DuckDB list slicing clamps at the list end exactly like Spark's
    // slice(arr, start, length); chunk_id replays posexplode's 0-based
    // position as (start - 1) / stride.
    "q_text_chunk" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
        |           FROM documents),
        |c AS (SELECT doc_id, w,
        |        UNNEST(generate_series(1, len(w), 16)) AS s
        |      FROM t)
        |SELECT doc_id, CAST((s - 1) // 16 AS INT) AS chunk_id,
        |  array_to_string(w[s : s + 31], ' ') AS chunk,
        |  CAST(LEAST(32, len(w) - s + 1) AS INT) AS chunk_tokens
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    "q_text_entropy" ->
      """WITH c0 AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(97, 122), c ->
        |      CAST(length(text)
        |           - length(replace(text, chr(CAST(c AS INTEGER)), ''))
        |           AS BIGINT)) AS cnt
        |  FROM documents),
        |n AS (SELECT doc_id, cnt,
        |        CAST(list_sum(cnt) AS BIGINT) AS n_letters FROM c0)
        |SELECT doc_id, n_letters,
        |  CAST(COALESCE(list_sum(list_transform(cnt,
        |    c -> c * (c - 1))), 0) AS BIGINT) AS simpson_num,
        |  CAST(COALESCE(list_sum(list_transform(cnt, c ->
        |    CASE WHEN c > 0 THEN
        |      CAST(FLOOR(-((CAST(c AS DOUBLE) / CAST(n_letters AS DOUBLE))
        |        * LN(CAST(c AS DOUBLE) / CAST(n_letters AS DOUBLE)))
        |        * 1e9) AS BIGINT)
        |    ELSE 0 END)), 0) AS BIGINT) AS entropy_nn
        |FROM n ORDER BY doc_id""".stripMargin,

    "q_text_tfidf" ->
      """WITH tok AS (
        |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf FROM tok
        |  GROUP BY doc_id, term),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |s AS (
        |  SELECT tf.doc_id, tf.term, CAST(tf.tf AS BIGINT) AS tf,
        |    CAST(tf.tf AS DOUBLE) *
        |      ((n.n_docs - df.df + 0.5) / (df.df + 0.5)) AS score
        |  FROM tf JOIN df USING (term) CROSS JOIN n),
        |r AS (
        |  SELECT doc_id, term, tf, score,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |                       ORDER BY score DESC, term) AS rk
        |  FROM s)
        |SELECT doc_id, CAST(rk AS INT) AS rk, term, tf, score FROM r
        |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

    // BM25: arithmetic replayed with every constant a literal and every
    // operand explicitly DOUBLE (DuckDB parses bare 2.2 as DECIMAL, and
    // decimal division rounds differently); ln floor-quantized at 1e4.
    "q_text_bm25" ->
      """WITH dlt AS (
        |  SELECT doc_id,
        |    CAST(LEN(string_split(text, ' ')) AS BIGINT) AS dl
        |  FROM documents),
        |n AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS dlsum
        |      FROM dlt),
        |tok AS (
        |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf FROM tok
        |  WHERE term IN ('scan', 'filter', 'vector')
        |  GROUP BY doc_id, term),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term)
        |SELECT tf.doc_id, tf.term, tf.tf, dlt.dl,
        |  CAST(FLOOR(
        |    LN((CAST(n.n_docs AS DOUBLE) - CAST(df.df AS DOUBLE)
        |          + CAST(0.5 AS DOUBLE))
        |        / (CAST(df.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
        |       + CAST(1.0 AS DOUBLE)) *
        |    (CAST(tf.tf AS DOUBLE) * CAST(2.2 AS DOUBLE)) /
        |    (CAST(tf.tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
        |      (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE)
        |        * CAST(dlt.dl AS DOUBLE)
        |        / (CAST(n.dlsum AS DOUBLE) / CAST(n.n_docs AS DOUBLE)))) *
        |    1e4) AS BIGINT) AS bm25_q
        |FROM tf JOIN dlt USING (doc_id) JOIN df USING (term)
        |CROSS JOIN n
        |ORDER BY tf.doc_id, tf.term""".stripMargin,

    // Incremental index-stats replay — FROM SCRATCH over the whole
    // corpus (split into stored/delta halves at the max·4/5 cut), so
    // the hash match proves the Spark side's stored+delta fold equals
    // a recompute: per-term df counts DISTINCT docs (list_distinct),
    // avgdl floor-1e4 over merged totals, the q_text_bm25 idf spelling.
    // Shared verbatim by q_stream_index_stats (order-free sums ⇒ the
    // streaming trajectory is batching-invariant).
    "q_retrieval_incremental" ->
      """WITH cutv AS (SELECT (MAX(doc_id) * 4) // 5 AS c FROM documents),
        |d AS (SELECT doc_id,
        |    CAST(LEN(string_split(text, ' ')) AS BIGINT) AS dl,
        |    string_split(text, ' ') AS w
        |  FROM documents),
        |n AS (SELECT
        |    CAST(SUM(CASE WHEN doc_id < c THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_s,
        |    CAST(SUM(CASE WHEN doc_id >= c THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_d,
        |    CAST(SUM(CASE WHEN doc_id < c THEN dl ELSE 0 END) AS BIGINT)
        |      AS dls_s,
        |    CAST(SUM(CASE WHEN doc_id >= c THEN dl ELSE 0 END) AS BIGINT)
        |      AS dls_d
        |  FROM d CROSS JOIN cutv),
        |tf AS (SELECT doc_id, term FROM
        |    (SELECT doc_id, UNNEST(list_distinct(w)) AS term FROM d)
        |  WHERE term IN ('scan', 'filter', 'vector')),
        |dfs AS (SELECT term,
        |    CAST(SUM(CASE WHEN doc_id < c THEN 1 ELSE 0 END) AS BIGINT)
        |      AS df_s,
        |    CAST(SUM(CASE WHEN doc_id >= c THEN 1 ELSE 0 END) AS BIGINT)
        |      AS df_d
        |  FROM tf CROSS JOIN cutv GROUP BY term)
        |SELECT term, df_s AS df_stored, df_d AS df_delta,
        |  df_s + df_d AS df,
        |  n.n_s + n.n_d AS n_docs,
        |  CAST(FLOOR(CAST(n.dls_s + n.dls_d AS DOUBLE) * 1e4 /
        |       CAST(n.n_s + n.n_d AS DOUBLE)) AS BIGINT) AS avgdl_q,
        |  CAST(FLOOR(LN((CAST(n.n_s + n.n_d AS DOUBLE)
        |        - CAST(df_s + df_d AS DOUBLE) + 0.5)
        |      / (CAST(df_s + df_d AS DOUBLE) + 0.5) + 1.0) * 1e4)
        |    AS BIGINT) AS idf_q
        |FROM dfs CROSS JOIN n
        |ORDER BY term""".stripMargin,

    // Query-likelihood replay: identical μ = 100 literal, collection
    // stats as scalar cross joins, tf LEFT-joined (absent terms take
    // the pure collection-model mass), per-term floor-1e4 ln summed as
    // exact integers.
    "q_text_ql" ->
      """WITH dlt AS (
        |  SELECT doc_id,
        |    CAST(LEN(string_split(text, ' ')) AS BIGINT) AS dl
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
        |  FROM documents),
        |ct AS (SELECT COUNT(*) AS ctot FROM tok),
        |tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf FROM tok
        |  WHERE term IN ('scan', 'filter', 'vector')
        |  GROUP BY doc_id, term),
        |cf AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS cf
        |       FROM tf GROUP BY term),
        |sc AS (
        |  SELECT dlt.doc_id,
        |    CAST(FLOOR(LN(
        |      (CAST(COALESCE(tf.tf, 0) AS DOUBLE)
        |        + 100.0 * CAST(cf.cf AS DOUBLE) / CAST(ct.ctot AS DOUBLE))
        |      / (CAST(dlt.dl AS DOUBLE) + 100.0)) * 1e4) AS BIGINT) AS t
        |  FROM dlt CROSS JOIN cf CROSS JOIN ct
        |  LEFT JOIN tf ON tf.doc_id = dlt.doc_id AND tf.term = cf.term)
        |SELECT doc_id, CAST(SUM(t) AS BIGINT) AS ql_q
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Sketch rows = the 64 smallest distinct hashes per source; the
    // bottom-k union, membership flags, and both quantized Jaccards
    // replay the Spark arrays row-for-row.
    "q_agg_kmv_jaccard" ->
      """WITH t AS (SELECT source, string_split(text, ' ') AS w
        |           FROM documents),
        |g AS (SELECT source, UNNEST(CASE WHEN len(w) >= 3 THEN
        |        [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |         for i in generate_series(1, len(w) - 2)]
        |      ELSE [array_to_string(w, ' ')] END) AS sh
        |      FROM t),
        |dsh AS (SELECT DISTINCT source, sh FROM g),
        |sizes AS (SELECT source, COUNT(*) AS n FROM dsh GROUP BY source),
        |iex AS (SELECT a.source AS sa, b.source AS sb, COUNT(*) AS inter
        |        FROM dsh a JOIN dsh b
        |          ON a.sh = b.sh AND a.source < b.source
        |        GROUP BY 1, 2),
        |h AS (SELECT DISTINCT source,
        |        list_reduce(list_prepend(CAST(0 AS BIGINT),
        |          list_transform(string_split(sh, ''),
        |            c -> CAST(ascii(c) AS BIGINT))),
        |          (a, c) -> (a * 1000003 + c) % 1099511627776) AS hv
        |      FROM g),
        |r AS (SELECT source, hv,
        |        ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv) AS rn
        |      FROM h),
        |sk AS (SELECT source, hv FROM r WHERE rn <= 64),
        |prs AS (SELECT a.source AS sa, b.source AS sb
        |        FROM sizes a JOIN sizes b ON a.source < b.source),
        |uni AS (SELECT p.sa, p.sb, s.hv,
        |          MAX(CASE WHEN s.source = p.sa THEN 1 ELSE 0 END) AS in_a,
        |          MAX(CASE WHEN s.source = p.sb THEN 1 ELSE 0 END) AS in_b
        |        FROM prs p JOIN sk s ON s.source = p.sa OR s.source = p.sb
        |        GROUP BY 1, 2, 3),
        |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY sa, sb
        |                                    ORDER BY hv) AS urn FROM uni),
        |eb AS (SELECT sa, sb,
        |         CAST(SUM(CASE WHEN urn <= 64 THEN in_a * in_b ELSE 0 END)
        |              AS BIGINT) AS ei,
        |         LEAST(64, COUNT(*)) AS keff
        |       FROM rk GROUP BY sa, sb)
        |SELECT e.sa, e.sb,
        |  CAST((1000000 * COALESCE(i.inter, 0)) //
        |       (za.n + zb.n - COALESCE(i.inter, 0)) AS BIGINT)
        |    AS exact_j_q,
        |  CAST((1000000 * e.ei) // e.keff AS BIGINT) AS kmv_j_q
        |FROM eb e
        |LEFT JOIN iex i ON i.sa = e.sa AND i.sb = e.sb
        |JOIN sizes za ON za.source = e.sa
        |JOIN sizes zb ON zb.source = e.sb
        |ORDER BY e.sa, e.sb""".stripMargin,

    // Same trigram CTE as the dedup family and the identical 40-bit
    // fold; the K-th smallest distinct hash + the integer estimate
    // replay the sketch's evaluation exactly (union-truncate of K-min
    // sets is order-insensitive, so partial/final merge can't diverge
    // from the global order statistic).
    "q_agg_distinct_kmv" ->
      """WITH t AS (SELECT source, string_split(text, ' ') AS w
        |           FROM documents),
        |g AS (SELECT source, UNNEST(CASE WHEN len(w) >= 3 THEN
        |        [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |         for i in generate_series(1, len(w) - 2)]
        |      ELSE [array_to_string(w, ' ')] END) AS sh
        |      FROM t),
        |h AS (SELECT DISTINCT source,
        |        list_reduce(list_prepend(CAST(0 AS BIGINT),
        |          list_transform(string_split(sh, ''),
        |            c -> CAST(ascii(c) AS BIGINT))),
        |          (a, c) -> (a * 1000003 + c) % 1099511627776) AS hv
        |      FROM g),
        |r AS (SELECT source, hv,
        |        ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv) AS rn
        |      FROM h),
        |cnt AS (SELECT source, COUNT(*) AS nd FROM h GROUP BY source),
        |kth AS (SELECT source, hv AS kth FROM r WHERE rn = 64)
        |SELECT c.source, CAST(c.nd AS BIGINT) AS exact_distinct,
        |  CAST(CASE WHEN c.nd < 64 THEN c.nd
        |            ELSE (63 * 1099511627776) // k.kth END AS BIGINT)
        |    AS kmv_est
        |FROM cnt c LEFT JOIN kth k USING (source)
        |ORDER BY c.source""".stripMargin,

    // Same bigram construction as LmScoreCtes; the whole KN formula is
    // one integer expression (D = 3/4 multiplied through by 4), so the
    // replay is exact — DuckDB's hugeint SUM intermediates cast back
    // down well inside BIGINT.
    "q_text_lm_kn" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |p0 AS (SELECT doc_id,
        |         UNNEST([struct_pack(a := toks[i], b := toks[i + 1])
        |                 for i in generate_series(1, len(toks) - 1)]) AS bg
        |       FROM t WHERE len(toks) >= 2),
        |p AS (SELECT bg.a AS w1, bg.b AS w2 FROM p0),
        |c AS (SELECT w1, w2, COUNT(*) AS c12 FROM p GROUP BY w1, w2),
        |f AS (SELECT w1, COUNT(*) AS nf, CAST(SUM(c12) AS BIGINT) AS c1
        |      FROM c GROUP BY w1),
        |pr AS (SELECT w2, COUNT(*) AS np FROM c GROUP BY w2),
        |nbt AS (SELECT COUNT(*) AS nb FROM c)
        |SELECT c.w1, c.w2, c.c12,
        |  CAST((1000000 * (GREATEST(4 * c.c12 - 3, 0) * nbt.nb
        |                   + 3 * f.nf * pr.np))
        |       // (4 * f.c1 * nbt.nb) AS BIGINT) AS p_kn_q
        |FROM c JOIN f USING (w1) JOIN pr USING (w2) CROSS JOIN nbt
        |ORDER BY c.w1, c.w2""".stripMargin,

    // Same bigram/unigram counting; the PMI argument is spelled with the
    // identical product/division order so the double is bit-equal, and
    // LN rides the floor-1e4 envelope.
    "q_text_collocations" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |uni AS (SELECT tk AS t, COUNT(*) AS c FROM
        |          (SELECT UNNEST(toks) AS tk FROM t) GROUP BY tk),
        |ntok AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tok FROM uni),
        |p0 AS (SELECT UNNEST([struct_pack(a := toks[i], b := toks[i + 1])
        |                 for i in generate_series(1, len(toks) - 1)]) AS bg
        |       FROM t WHERE len(toks) >= 2),
        |bi AS (SELECT bg.a AS w1, bg.b AS w2, COUNT(*) AS c12
        |       FROM p0 GROUP BY 1, 2),
        |nbi AS (SELECT CAST(SUM(c12) AS BIGINT) AS n_bi FROM bi)
        |SELECT bi.w1, bi.w2, bi.c12,
        |  CAST(FLOOR(LN(
        |    (CAST(bi.c12 AS DOUBLE) * CAST(ntok.n_tok AS DOUBLE)
        |       * CAST(ntok.n_tok AS DOUBLE)) /
        |    (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)
        |       * CAST(nbi.n_bi AS DOUBLE))) * 1e4) AS BIGINT) AS pmi_q
        |FROM bi
        |JOIN uni u1 ON u1.t = bi.w1
        |JOIN uni u2 ON u2.t = bi.w2
        |CROSS JOIN ntok CROSS JOIN nbi
        |WHERE bi.c12 >= 5
        |ORDER BY pmi_q DESC, bi.w1, bi.w2""".stripMargin,

    "q_text_heavy_hitters" ->
      """SELECT term, COUNT(*) AS n,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
        |      FROM documents)
        |GROUP BY term ORDER BY n DESC, term LIMIT 20""".stripMargin,

    "q_text_heavy_hitters_approx" ->
      """WITH toks AS (SELECT UNNEST(string_split(text, ' ')) AS term
        |              FROM documents),
        |counts AS (SELECT term, COUNT(*) AS n FROM toks GROUP BY term),
        |b AS (SELECT term, list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(term, ''),
        |          c -> CAST(ascii(c) AS BIGINT))),
        |        (h, c) -> (h * 31 + c) % 1048576) AS base
        |      FROM counts),
        |r AS (SELECT UNNEST([0, 1, 2, 3]) AS r),
        |cell AS (SELECT r.r,
        |           ((b.base * (2654435761 + r.r)) >> 16) % 256 AS idx,
        |           CAST(SUM(c.n) AS BIGINT) AS cnt
        |         FROM counts c JOIN b USING (term) CROSS JOIN r
        |         GROUP BY r.r, idx),
        |top AS (SELECT term, n FROM counts ORDER BY n DESC, term LIMIT 20)
        |SELECT t.term, t.n AS n_exact, CAST(MIN(cl.cnt) AS BIGINT) AS cms_est
        |FROM top t JOIN b USING (term)
        |CROSS JOIN r
        |JOIN cell cl ON cl.r = r.r
        |  AND cl.idx = ((b.base * (2654435761 + r.r)) >> 16) % 256
        |GROUP BY t.term, t.n
        |ORDER BY n_exact DESC, term""".stripMargin,

    "q_text_dup_spans" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
        |           FROM documents),
        |g AS (SELECT doc_id, CASE WHEN len(w) >= 8 THEN
        |        list_distinct([array_to_string(w[i:i+7], ' ')
        |                       for i in generate_series(1, len(w) - 7)])
        |      ELSE [array_to_string(w, ' ')] END AS spans
        |      FROM t),
        |sp AS (SELECT doc_id, UNNEST(spans) AS span FROM g),
        |df AS (SELECT span, COUNT(DISTINCT doc_id) AS sdf FROM sp
        |       GROUP BY span)
        |SELECT sp.doc_id, COUNT(*) AS n_spans,
        |  CAST(SUM(CASE WHEN df.sdf >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_spans,
        |  CAST(SUM(CASE WHEN df.sdf >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*) AS dup_frac
        |FROM sp JOIN df USING (span)
        |GROUP BY sp.doc_id ORDER BY sp.doc_id""".stripMargin,

    // Same span index as q_text_dup_spans, then ownership (MIN doc_id
    // per span), covered-position expansion, and an index-filtered list
    // comprehension rebuild. Positions are 0-based in both engines
    // (Spark posexplode / filter-lambda index vs i - 1 here).
    "q_text_despanned" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
        |           FROM documents),
        |sp0 AS (SELECT doc_id,
        |          UNNEST([struct_pack(pos := i - 1,
        |                    span := array_to_string(w[i:i+7], ' '))
        |                  for i in generate_series(1, len(w) - 7)]) AS s
        |        FROM t WHERE len(w) >= 8),
        |sp AS (SELECT doc_id, s.pos AS pos, s.span AS span FROM sp0),
        |own AS (SELECT span, MIN(doc_id) AS owner_id FROM sp
        |        GROUP BY span),
        |rm0 AS (SELECT sp.doc_id,
        |          UNNEST(generate_series(sp.pos, sp.pos + 7)) AS p
        |        FROM sp JOIN own USING (span)
        |        WHERE sp.doc_id > own.owner_id),
        |rml AS (SELECT doc_id, list(DISTINCT p) AS ps FROM rm0
        |        GROUP BY doc_id)
        |SELECT t.doc_id,
        |  CASE WHEN rml.ps IS NULL THEN array_to_string(t.w, ' ')
        |       ELSE COALESCE(array_to_string(
        |         [t.w[i] for i in generate_series(1, len(t.w))
        |          if NOT list_contains(rml.ps, i - 1)], ' '), '')
        |  END AS clean_text,
        |  COALESCE(len(rml.ps), 0) AS n_removed
        |FROM t LEFT JOIN rml USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,

    "q_text_langid" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, UNNEST(list_distinct(string_split(text, ' ')))
        |    AS w
        |  FROM documents),
        |prof AS (
        |  SELECT plang, w FROM (
        |    SELECT lang AS plang, w, COUNT(*) AS cnt,
        |      ROW_NUMBER() OVER (PARTITION BY lang
        |                         ORDER BY COUNT(*) DESC, w) AS rn
        |    FROM tok GROUP BY lang, w)
        |  WHERE rn <= 10),
        |ntok AS (
        |  SELECT doc_id, LEN(list_distinct(string_split(text, ' ')))
        |    AS n_tok
        |  FROM documents),
        |hits AS (
        |  SELECT t.doc_id, p.plang, COUNT(*) AS nhits
        |  FROM (SELECT DISTINCT doc_id, w FROM tok) t
        |  JOIN prof p ON t.w = p.w
        |  GROUP BY t.doc_id, p.plang),
        |langs AS (SELECT DISTINCT lang AS plang FROM documents),
        |scored AS (
        |  SELECT n.doc_id, l.plang,
        |    CAST(COALESCE(h.nhits, 0) AS DOUBLE) / n.n_tok AS score
        |  FROM ntok n CROSS JOIN langs l
        |  LEFT JOIN hits h ON h.doc_id = n.doc_id AND h.plang = l.plang),
        |best AS (
        |  SELECT doc_id, plang, score,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |                       ORDER BY score DESC, plang) AS rn
        |  FROM scored)
        |SELECT b.doc_id, d.lang, b.plang AS pred_lang, b.score
        |FROM best b JOIN documents d ON b.doc_id = d.doc_id
        |WHERE b.rn = 1 ORDER BY b.doc_id""".stripMargin,

    // Same corpus-derived stoplist (count desc, token asc), the same
    // islands grouping (the 0-based/1-based pos offset cancels inside
    // pos − row_number), and the same per-member integer floor-division
    // scores.
    "q_text_rake" ->
      """WITH tk AS (SELECT doc_id, generate_subscripts(w, 1) - 1 AS pos,
        |              UNNEST(w) AS tok
        |            FROM (SELECT doc_id, string_split(text, ' ') AS w
        |                  FROM documents)),
        |vf AS (SELECT tok, COUNT(*) AS c FROM tk GROUP BY tok),
        |st AS (SELECT tok FROM (
        |         SELECT tok, ROW_NUMBER() OVER (ORDER BY c DESC, tok)
        |           AS rk FROM vf)
        |       WHERE rk <= 10),
        |ct AS (SELECT doc_id, pos, tok,
        |         pos - ROW_NUMBER() OVER (PARTITION BY doc_id
        |                                  ORDER BY pos) AS grp
        |       FROM tk WHERE tok NOT IN (SELECT tok FROM st)),
        |ph AS (SELECT doc_id, grp, CAST(COUNT(*) AS BIGINT) AS plen,
        |         STRING_AGG(tok, ' ' ORDER BY pos) AS phrase
        |       FROM ct GROUP BY doc_id, grp
        |       HAVING COUNT(*) <= 4),
        |mem AS (SELECT ct.doc_id, ct.grp, ph.plen, ct.tok
        |        FROM ct JOIN ph USING (doc_id, grp)),
        |ws AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq,
        |         CAST(SUM(plen) AS BIGINT) AS degree
        |       FROM mem GROUP BY tok),
        |sc AS (SELECT m.doc_id, m.grp,
        |         CAST(SUM((1000 * ws.degree) // ws.freq) AS BIGINT)
        |           AS score_q
        |       FROM mem m JOIN ws USING (tok) GROUP BY m.doc_id, m.grp)
        |SELECT ph.phrase, CAST(MAX(ph.plen) AS BIGINT) AS plen,
        |  CAST(COUNT(*) AS BIGINT) AS n_occ,
        |  CAST(MAX(sc.score_q) AS BIGINT) AS score_q
        |FROM ph JOIN sc USING (doc_id, grp)
        |GROUP BY ph.phrase
        |ORDER BY score_q DESC, phrase LIMIT 20""".stripMargin
  )
}
