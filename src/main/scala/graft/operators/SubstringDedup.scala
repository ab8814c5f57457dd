package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.QueryDefs.Q
import graft.sources.Tables

/** Suffix-array exact-substring deduplication (Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better") — the
  * remaining canonical dedup family beyond this library's span removal:
  * q_text_despanned excises FIXED 8-gram spans and q_dedup_cdc catches
  * shifted chunks, but neither reports MAXIMAL duplicated substrings.
  * This operator finds, per document, the maximal token spans (≥
  * [[MinLen]] tokens, maximality resolved up to [[MinLen]]+[[ExtLen]])
  * whose text occurs at least once more anywhere in the corpus.
  *
  * The suffix-array construction, re-expressed for a shuffle engine:
  *  1. every token position emits a TRUNCATED suffix — its [[MinLen]]-
  *     gram (the sort key / bucket) plus the next [[ExtLen]] tokens
  *     (the extension) — so per-position fan-out is bounded at
  *     [[MinLen]]+[[ExtLen]] tokens, never whole-document suffixes;
  *  2. suffixes sharing an exact [[MinLen]]-gram land in one hash
  *     bucket (the groupBy shuffle IS the suffix sort's bucketing: a
  *     position is duplicated at ≥ MinLen iff its bucket holds ≥ 2
  *     members, exactly q_text_dup_spans' df test);
  *  3. WITHIN a bucket, suffixes sort by extension and each compares to
  *     its sorted neighbors only — the suffix-array LCP argument (the
  *     longest common prefix of any pair is realized by an adjacent
  *     pair in sorted order) makes two lag/lead comparisons per
  *     position sufficient for the exact maximal extension, no
  *     all-pairs. Token-level order and string order coincide because
  *     the ' ' joiner sorts below every alphabet char;
  *  4. per document, overlapping duplicated windows [p, p+dup_len)
  *     union into maximal spans (the q_stream_session_dynamic
  *     interval-union discipline: running max + gaps-and-islands).
  *
  * Scale shape: one corpus tokenize, one gram-keyed shuffle whose
  * payload is (doc_id, pos, ≤ ExtLen-token extension) — text bodies
  * never shuffle whole; windows are keyed by gram (bucket-local) and
  * doc_id (document-local), never global; the output is one row per
  * document. The DETECTION query keeps the text gram key (its LCP
  * extension needs the token arrays in-bucket anyway); the REBUILD
  * query and every despan/decontamination consumer shuffle the 80-bit
  * hashed-gram pair instead (r11 — SCALE §25: −45% exchange volume,
  * bit-identical result, both folds oracle-replayed via [[fold40Sql]]).
  */
object SubstringDedup {

  /** Minimum duplicated-substring length, in tokens (matches the
    * q_text_dup_spans / q_text_despanned 8-gram convention). */
  private[graft] val MinLen = 8

  /** Extension tokens carried past the gram — maximality is exact up
    * to MinLen + ExtLen; longer duplicates are still found, reported
    * at the cap (and typically re-merged by the interval union when
    * consecutive positions extend them). */
  private[graft] val ExtLen = 4

  /** Token-level longest common prefix of two extension arrays; 0 when
    * either is NULL (partition edge) or empty. The first-mismatch scan
    * is a bounded ≤ [[ExtLen]]-element HOF, identical in both engines;
    * array_min skips the NULL (= matched) slots. */
  private def lcp(a: String, b: String): String =
    s"""CASE WHEN $b IS NULL OR least(size($a), size($b)) <= 0 THEN 0
       |ELSE coalesce(array_min(filter(transform(
       |    sequence(1, least(size($a), size($b))),
       |    i -> CASE WHEN element_at($a, i) != element_at($b, i)
       |              THEN i - 1 END),
       |  x -> x IS NOT NULL)), least(size($a), size($b))) END""".stripMargin

  /** The sorted-neighbor LCP maximality argument needs token order and
    * string order to coincide, i.e. every token char collates ABOVE the
    * ' ' joiner — assert it with one scalar aggregate (the corpus-min
    * character) instead of assuming it (ADVICE r9), with the same
    * loud-failure contract as the unigram trainer's census. The scan is
    * a full corpus pass for a DATASET-STABLE invariant, so it is
    * memoized per (session, dataset) like the other bounded training
    * scalars (ADVICE r10) — repeat constructions (bench reps, the v2
    * pipeline's despan stage) skip it entirely. */
  private val collationMemo = new scala.collection.concurrent.TrieMap[
    (String, String), Option[String]]

  private[operators] def assertCollationSafe(s: SparkSession, d: String,
      docs: DataFrame): Unit = {
    val mn = graft.MemoStats.memoized("collation_guard", collationMemo,
      (org.apache.spark.sql.graftbridge.Bridge.sessionUUID(s), d)) {
      val r = docs.agg(min(expr(
        "array_min(filter(split(text, ''), c -> c != '' AND c != ' '))")))
        .head()
      if (r.isNullAt(0)) None else Some(r.getString(0))
    }
    require(mn.forall(_ > " "),
      "substring dedup needs token chars above U+0020 (the suffix " +
        s"joiner); corpus min char is ${
          mn.fold("<none>")(c => "U+%04X".format(c.codePointAt(0)))}")
  }

  val defs: Map[String, Q] = Map(

    "q_dedup_substring" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      assertCollationSafe(s, d, docs)
      val sufs = docs
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .where(size(col("w")) >= MinLen)
        .select(col("doc_id"), explode(expr(
          s"""transform(sequence(1, size(w) - ${MinLen - 1}), p -> struct(
             |  p AS p,
             |  concat_ws(' ', slice(w, p, $MinLen)) AS gram,
             |  slice(w, p + $MinLen, $ExtLen) AS ext,
             |  concat_ws(' ', slice(w, p + $MinLen, $ExtLen)) AS ext_s))"""
            .stripMargin)).as("x"))
        .select(col("doc_id"), col("x.p").as("p"), col("x.gram").as("gram"),
          col("x.ext").as("ext"), col("x.ext_s").as("ext_s"))
      // the bucket-local suffix sort: a lone member has no neighbors
      // (both NULL) and is not duplicated; dup_len = MinLen + the max
      // extension shared with a sorted neighbor
      val wOrd = Window.partitionBy(col("gram"))
        .orderBy(col("ext_s"), col("doc_id"), col("p"))
      val spans = sufs
        .withColumn("pext", lag(col("ext"), 1).over(wOrd))
        .withColumn("next_ext", lead(col("ext"), 1).over(wOrd))
        .where(col("pext").isNotNull || col("next_ext").isNotNull)
        .select(col("doc_id"), col("p").as("s0"),
          (col("p") + lit(MinLen - 1) + greatest(
            expr(lcp("ext", "pext")), expr(lcp("ext", "next_ext"))))
            .as("e0"))
      // interval union per document: overlapping windows merge into
      // maximal spans (adjacent-but-disjoint spans stay separate — they
      // are different duplicated substrings)
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("s0"), col("e0"))
      val merged = spans
        .withColumn("rm", max(col("e0"))
          .over(wDoc.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("ng",
          when(col("rm").isNull || col("s0") > col("rm"), 1L).otherwise(0L))
        .withColumn("g", sum(col("ng"))
          .over(wDoc.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("doc_id"), col("g"))
        .agg(min(col("s0")).as("s"), max(col("e0")).as("e"))
      val perDoc = merged.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"),
          sum(col("e") - col("s") + 1).as("dup_tokens"),
          max(col("e") - col("s") + 1).cast("long").as("max_span"),
          expr("array_join(transform(array_sort(collect_list(struct(s, e)))," +
            " x -> concat(cast(x.s as string), '-', cast(x.e as string)))," +
            " ',')").as("spans"))
      docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"),
          coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
          coalesce(col("max_span"), lit(0L)).as("max_span"),
          coalesce(col("spans"), lit("")).as("spans"))
        .orderBy(col("doc_id"))
    }),

    // Span REMOVAL composed onto the suffix machinery above — the
    // production rebuild stage Lee et al. run after detection (r9
    // verdict item 2): every [[MinLen]]-gram occurrence except the
    // corpus-wide FIRST (lexicographic min (doc_id, position) — the
    // occurrence-grain analogue of q_text_despanned's min-doc_id owner,
    // so within-document repeats are excised too) marks its MinLen
    // token positions for removal. A duplicated span of ANY length
    // L ≥ MinLen is covered exactly: all of its L−MinLen+1 window
    // starts are duplicated positions, so the marked windows tile the
    // maximal span — removal needs no LCP extension, only detection
    // does. The per-doc rebuild is q_text_despanned's RemoveTokensAt
    // O(n + p) merge scan; n_spans counts the merged removal islands
    // (the same gaps-and-islands arithmetic as the detection query, as
    // one bounded array fold). Scale shape: ONE gram-keyed shuffle (the
    // ownership window, the same key as detection), then (doc_id,
    // position) pairs only; text bodies stay in their scan partitions
    // until the final index-filtered rebuild (PlanSpec pins ≤2 corpus
    // reads). Docs that own every span they contain pass through
    // verbatim; a doc whose every token is someone else's replica
    // rebuilds to the empty string (the edge both engines hit
    // identically — SubstringRebuildSpec).
    "q_dedup_substring_rebuild" -> ((s, d) => {
      import graft.functions.VectorFunctions.{neutral_hash40, neutral_hash40b}
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
      // The ownership key is the HASHED gram, not the gram text (SCALE
      // §20/§24's named knob, r10 verdict item 3): the ownership window
      // shuffles every token position in the corpus, and an 8-token
      // text key (~50 bytes) made that exchange's sort key dominate the
      // v2 pipeline's ×100 cost. Grams are hashed in the scan stage, so
      // the exchange carries (doc_id, p, h1, h2) — 16 fixed key bytes.
      // Two INDEPENDENT 40-bit folds: one fold's 2^40 envelope yields
      // ~240 expected gram collisions at the ×100 probe's 23M distinct
      // grams (each wrongly despans ≤MinLen tokens of one doc); the
      // 80-bit pair is ~2e-10 — collision-free in any realizable
      // corpus. Both folds replay in DuckDB, so the oracle stays exact.
      val pos = toks.where(size(col("w")) >= MinLen)
        .select(col("doc_id"), explode(expr(
          s"""transform(sequence(1, size(w) - ${MinLen - 1}), p -> struct(
             |  p AS p, concat_ws(' ', slice(w, p, $MinLen)) AS gram))"""
            .stripMargin)).as("x"))
        .select(col("doc_id"), col("x.p").as("p"),
          neutral_hash40(col("x.gram")).as("h1"),
          neutral_hash40b(col("x.gram")).as("h2"))
      val wOwn = Window.partitionBy(col("h1"), col("h2"))
        .orderBy(col("doc_id"), col("p"))
      // rn > 1 ⟺ duplicated AND not the owner (a lone occurrence is
      // rn = 1 and survives by the same test — no df side-table needed)
      val rm = pos
        .withColumn("rn", row_number().over(wOwn))
        .where(col("rn") > 1)
        .select(col("doc_id"), explode(sequence(col("p"),
          col("p") + lit(MinLen - 1))).as("q"))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_set(col("q"))).as("ps"))
      toks.join(rm, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("ps").isNull, concat_ws(" ", col("w")))
            .otherwise(graft.functions.TextFunctions.remove_tokens_at(
              col("w"), expr("transform(ps, x -> x - 1)")))
            .as("clean_text"),
          coalesce(size(col("ps")), lit(0)).cast("long").as("n_removed"),
          // islands over the sorted distinct position array: 1 + the
          // count of gaps. size(ps) ≥ MinLen whenever ps is non-null,
          // so sequence(2, size) never hits Spark's descending-range
          // edge; a null ps rides the coalesce to 0.
          coalesce(expr(
            s"""1 + size(filter(sequence(2, size(ps)),
               |  j -> element_at(ps, j) != element_at(ps, j - 1) + 1))"""
              .stripMargin), lit(0)).cast("long").as("n_spans"))
        .orderBy(col("doc_id"))
    })
  )

  /** The oracle replays the same truncated-suffix construction: DuckDB
    * list slicing clamps like Spark's slice, LAG/LEAD over the
    * gram-bucketed sort, the bounded first-mismatch LCP as a list
    * comprehension, and the identical running-max interval union. */
  /** DuckDB replay of NeutralHash40's byte fold (ascii(c) ≡ the UTF-8
    * byte on the ASCII fixture corpus — the equivalence every
    * neutral-hash oracle in this library already stands on). Every
    * intermediate h·mult + c stays under 2^60, inside DuckDB's
    * overflow-checked BIGINT. Exposed to Dedup so the v2 pipeline's
    * despan stage replays the identical ownership key. */
  private[graft] def fold40Sql(e: String, mult: Long): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(string_split($e, ''),
       |        c -> CAST(ascii(c) AS BIGINT))),
       |      (h, c) -> (h * $mult + c) % 1099511627776)""".stripMargin

  /** The two ownership-fold multipliers (Spark: neutral_hash40 /
    * neutral_hash40b; oracle: [[fold40Sql]]). */
  private[graft] val FoldA = 1000003L
  private[graft] val FoldB = 999983L

  private def lcpSql(a: String, b: String): String =
    s"""CASE WHEN $b IS NULL OR LEAST(len($a), len($b)) <= 0 THEN 0
       |ELSE COALESCE(list_min([CASE WHEN $a[i] <> $b[i] THEN i - 1 END
       |    for i in generate_series(1, LEAST(len($a), len($b)))]),
       |  LEAST(len($a), len($b))) END""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_dedup_substring" ->
      s"""WITH t AS MATERIALIZED (
         |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |sufs AS MATERIALIZED (
         |  SELECT doc_id, p,
         |    array_to_string(w[p : p + ${MinLen - 1}], ' ') AS gram,
         |    w[p + $MinLen : p + ${MinLen + ExtLen - 1}] AS ext,
         |    array_to_string(w[p + $MinLen : p + ${MinLen + ExtLen - 1}], ' ')
         |      AS ext_s
         |  FROM (SELECT doc_id, w,
         |      UNNEST(generate_series(1, len(w) - ${MinLen - 1})) AS p
         |    FROM t)),
         |nb AS (SELECT doc_id, p, ext,
         |    LAG(ext)  OVER (PARTITION BY gram ORDER BY ext_s, doc_id, p)
         |      AS pext,
         |    LEAD(ext) OVER (PARTITION BY gram ORDER BY ext_s, doc_id, p)
         |      AS next_ext
         |  FROM sufs),
         |sp AS (SELECT doc_id, p AS s0,
         |    p + ${MinLen - 1} + GREATEST(${lcpSql("ext", "pext")},
         |      ${lcpSql("ext", "next_ext")}) AS e0
         |  FROM nb WHERE pext IS NOT NULL OR next_ext IS NOT NULL),
         |g AS (SELECT doc_id, s0, e0,
         |    SUM(CASE WHEN rm IS NULL OR s0 > rm THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id ORDER BY s0, e0
         |            ROWS UNBOUNDED PRECEDING) AS grp
         |  FROM (SELECT doc_id, s0, e0,
         |      MAX(e0) OVER (PARTITION BY doc_id ORDER BY s0, e0
         |                    ROWS BETWEEN UNBOUNDED PRECEDING
         |                    AND 1 PRECEDING) AS rm
         |    FROM sp)),
         |m AS (SELECT doc_id, grp, MIN(s0) AS s, MAX(e0) AS e
         |  FROM g GROUP BY doc_id, grp),
         |pd AS (SELECT doc_id, COUNT(*) AS n_spans,
         |    CAST(SUM(e - s + 1) AS BIGINT) AS dup_tokens,
         |    CAST(MAX(e - s + 1) AS BIGINT) AS max_span,
         |    string_agg(s || '-' || e, ',' ORDER BY s) AS spans
         |  FROM m GROUP BY doc_id)
         |SELECT d.doc_id, CAST(COALESCE(pd.n_spans, 0) AS BIGINT) AS n_spans,
         |  CAST(COALESCE(pd.dup_tokens, 0) AS BIGINT) AS dup_tokens,
         |  CAST(COALESCE(pd.max_span, 0) AS BIGINT) AS max_span,
         |  COALESCE(pd.spans, '') AS spans
         |FROM documents d LEFT JOIN pd USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // Replays ownership (ROW_NUMBER over the HASHED gram bucket —
    // both 40-bit folds, the identical key Spark shuffles — in
    // (doc_id, p) order), the 8-position marking, the distinct-union,
    // the island count (run-id = q − rank, constant per consecutive
    // run), and the membership-filtered list-comprehension rebuild.
    "q_dedup_substring_rebuild" ->
      s"""WITH t AS MATERIALIZED (
         |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |pos AS MATERIALIZED (
         |  SELECT doc_id, p, array_to_string(w[p : p + ${MinLen - 1}], ' ')
         |    AS gram
         |  FROM (SELECT doc_id, w,
         |      UNNEST(generate_series(1, len(w) - ${MinLen - 1})) AS p
         |    FROM t WHERE len(w) >= $MinLen)),
         |rep AS (SELECT doc_id, p FROM (
         |    SELECT doc_id, p, ROW_NUMBER() OVER (
         |      PARTITION BY h1, h2 ORDER BY doc_id, p) AS rn
         |    FROM (SELECT doc_id, p,
         |        ${fold40Sql("gram", FoldA)} AS h1,
         |        ${fold40Sql("gram", FoldB)} AS h2
         |      FROM pos))
         |  WHERE rn > 1),
         |rmq AS (SELECT DISTINCT doc_id, q FROM (
         |    SELECT doc_id, UNNEST(generate_series(p, p + ${MinLen - 1}))
         |      AS q
         |    FROM rep)),
         |rm AS (SELECT doc_id, LIST(q ORDER BY q) AS ps,
         |    COUNT(*) AS n_removed
         |  FROM rmq GROUP BY doc_id),
         |isl AS (SELECT doc_id, COUNT(DISTINCT q - rn) AS n_spans FROM (
         |    SELECT doc_id, q, ROW_NUMBER() OVER (
         |      PARTITION BY doc_id ORDER BY q) AS rn
         |    FROM rmq)
         |  GROUP BY doc_id)
         |SELECT t.doc_id,
         |  CASE WHEN rm.ps IS NULL THEN array_to_string(t.w, ' ')
         |       -- COALESCE: DuckDB's array_to_string([]) is NULL, but a
         |       -- fully-excised doc must rebuild to '' like Spark's
         |       -- RemoveTokensAt merge
         |       ELSE COALESCE(array_to_string([t.w[i]
         |           for i in generate_series(1, len(t.w))
         |           if NOT list_contains(rm.ps, i)], ' '), '')
         |  END AS clean_text,
         |  CAST(COALESCE(rm.n_removed, 0) AS BIGINT) AS n_removed,
         |  CAST(COALESCE(isl.n_spans, 0) AS BIGINT) AS n_spans
         |FROM t LEFT JOIN rm USING (doc_id) LEFT JOIN isl USING (doc_id)
         |ORDER BY t.doc_id""".stripMargin
  )
}
