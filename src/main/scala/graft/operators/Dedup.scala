package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.QueryDefs.Q
import graft.sources.Tables
import graft.functions.VectorFunctions.cosine_sim

/** Deduplication operators over the `documents` / `embeddings` fixtures —
  * the LLM-data-pipeline extensions beyond the reference's own surface
  * (BASELINE.json north_star; the reference itself only ever filter-scans,
  * /root/reference/main.cc:164-169).
  *
  * Scale design notes (100 TB):
  *  - exact dedup is a hash groupBy — one shuffle on the full text (or a
  *    content hash: group on xxhash64+length to avoid shuffling bodies).
  *  - near-dup goes shingle→MinHash signature→LSH band buckets→bucket-local
  *    pairs→exact verify. Work is O(docs × shingles + Σ bucket²), never
  *    the O(n²) all-pairs of the naive approach; bucket skew is bounded
  *    because a band key is a 64-bit hash of two 64-bit minhashes.
  *  - embedding near-dup uses a cheap codegen'd double cosine as a
  *    prefilter and the decimal-exact cosine only for survivors.
  */
object Dedup {

  /** Word-trigram shingle set (distinct) per document. Guarded for texts
    * shorter than 3 words (falls back to the whole text as one shingle).
    * Tokenization happens in its own projection: inlining `split(text)`
    * into the shingle lambda would re-split the text once per element
    * (O(words²) per doc — measured 2-3× on the whole query). */
  private[operators] def withShingles(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      // the fixture is one parquet file = one input split; without this
      // the whole O(docs × words) shingle compute runs on a single core.
      // At corpus scale the source is many files and this is a no-op
      // cost-wise, but the intent (parallelize CPU-bound per-doc work)
      // is the same.
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), expr(
        """CASE WHEN size(toks) >= 3 THEN
          |  array_distinct(transform(
          |    sequence(1, size(toks) - 2),
          |    i -> concat_ws(' ', element_at(toks, i),
          |                        element_at(toks, i + 1),
          |                        element_at(toks, i + 2))))
          |ELSE array(array_join(toks, ' ')) END""".stripMargin).as("sh"))
      // reused by the inverted index, the size lookup, and the LSH
      // verify joins — and across the dedup queries themselves; cache
      // once instead of recomputing the shingle transform per branch
      .cache()

  /** jaccard = |A∩B| / |A∪B| from intersection count + set sizes. */
  private def jaccard(inter: Column, na: Column, nb: Column): Column =
    inter / (na + nb - inter)

  /** Exact pairwise trigram-Jaccard > 0.5 via shingle-inverted-index
    * self-join (no all-pairs cross product: only docs sharing a shingle
    * ever meet). */
  private def ngramJaccardPairs(s: SparkSession, d: String): DataFrame = {
    val g = withShingles(s, d)
    val ex = g.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val sizes = g.select(col("doc_id"), size(col("sh")).as("n"))
    val inter = ex.as("a").join(ex.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        jaccard(col("inter"), col("sa.n"), col("sb.n")).as("jaccard"))
      .where(col("jaccard") > 0.5)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val defs: Map[String, Q] = Map(

    // Exact dedup: keep the smallest doc_id per identical text.
    "q_dedup_exact" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("n_copies"), col("text"))
        .orderBy(col("keep_id"))
    }),

    // Exact n-gram Jaccard near-dup (ground truth for the LSH variant).
    "q_dedup_ngram_jaccard" -> ((s, d) => ngramJaccardPairs(s, d)),

    // MinHash + LSH near-dup: 32 minhashes (hash family h_k(s) =
    // xxhash64(s, k)), 16 bands × 2 rows, bucket-join for candidates,
    // exact-Jaccard verify. With the fixture's near-dups at J ≥ 0.88 the
    // per-pair miss probability is (1 - J²)^16 < 1e-11, so the verified
    // output equals the exact result — which is exactly what the oracle
    // checks.
    "q_dedup_minhash_lsh" -> ((s, d) => {
      val g = withShingles(s, d)
      // signature: explode shingles once, 32 codegen'd xxhash64 columns,
      // ONE groupBy with 32 min() aggregates (map-side partial combine) —
      // not nested lambda folds, which run interpreted per element.
      val ex = g.select(col("doc_id"), explode(col("sh")).as("t"))
      val hashCols = (0 until 32).map(k => xxhash64(col("t"), lit(k)).as(s"h$k"))
      val hashed = ex.select(col("doc_id") +: hashCols: _*)
      val minAggs = (0 until 32).map(k => min(col(s"h$k")).as(s"m$k"))
      val sig = hashed.groupBy(col("doc_id")).agg(minAggs.head, minAggs.tail: _*)
      // 16 bands × 2 rows: band key hashes two adjacent minhashes + band id
      val bandStructs = (0 until 16).map(b => struct(lit(b).as("b"),
        xxhash64(col(s"m${2 * b}"), col(s"m${2 * b + 1}"), lit(b)).as("k")))
      val bands = sig.select(col("doc_id"),
        explode(array(bandStructs: _*)).as("bk"))
      val cand = bands.as("a").join(bands.as("b"),
          col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      // exact verify: join the shingle sets back by id (arrays travel
      // only for the few candidates, not through the 16× band explosion)
      cand
        .join(g.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
        .join(g.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          jaccard(size(array_intersect(col("sha"), col("shb"))),
            size(col("sha")), size(col("shb"))).as("jaccard"))
        .where(col("jaccard") > 0.5)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // SimHash near-dup: 64-bit signature from per-shingle xxhash64 bit
    // votes (trigram shingles — the same feature space as the Jaccard
    // ground truth; unigrams over the fixture's ~30-word vocabulary make
    // every document collide). Computed scale-friendly: explode shingles,
    // hash once, then 64 codegen'd conditional sums in ONE groupBy (a
    // single shuffle) — not nested lambda folds. Candidates via 8×8-bit
    // chunk banding (pigeonhole: hamming ≤ 7 ⇒ some identical chunk);
    // no DuckDB oracle (xxhash64 is engine-specific) → rows-only check.
    "q_dedup_simhash" -> ((s, d) => {
      val ex = withShingles(s, d)
        .select(col("doc_id"), explode(col("sh")).as("t"))
        .withColumn("h", xxhash64(col("t")))
      // one-pass native aggregate (TypedImperativeAggregate): the vote
      // vector is the buffer, partial/final combine is vector addition
      val sims = ex.groupBy(col("doc_id"))
        .agg(graft.functions.SimHashAgg.simhash_agg(col("h")).as("simhash"))
      val chunks = sims.select(col("doc_id"), col("simhash"),
        explode(expr(
          """transform(sequence(0, 7),
            |  c -> named_struct('c', c,
            |    'v', shiftright(simhash, c * 8) & 255))""".stripMargin))
          .as("ck"))
      chunks.as("a").join(chunks.as("b"),
          col("a.ck") === col("b.ck") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
        .distinct()
        .where(col("hamming") <= 7)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Cluster resolution: connected components over the near-dup pair
    // graph, keeping the min-doc_id as each cluster's canonical doc —
    // the step that turns pair detection into corpus dedup. Iterative
    // min-label propagation (8 rounds, join + min-aggregate per round;
    // near-dup clusters have tiny diameter, so 8 is a safe fixpoint
    // bound — at web scale swap in the alternating large-star/small-star
    // algorithm, same join primitive). Oracle: recursive-CTE reachability
    // in DuckDB.
    "q_dedup_clusters" -> ((s, d) => {
      val pairs = ngramJaccardPairs(s, d).select(col("doc_a"), col("doc_b"))
      val edges = pairs.unionAll(
        pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
        .toDF("src", "dst").cache()
      var labels = Tables.documents(s, d)
        .select(col("doc_id"), col("doc_id").as("lbl"))
      for (_ <- 1 to 8) {
        val prop = edges.join(labels, edges("src") === labels("doc_id"))
          .groupBy(col("dst")).agg(min(col("lbl")).as("nlbl"))
        labels = labels.join(prop, labels("doc_id") === prop("dst"), "left")
          .select(col("doc_id"),
            least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
      }
      labels.select(col("doc_id"), col("lbl").as("keep_id"),
          (col("doc_id") === col("lbl")).as("is_keeper"))
        .orderBy(col("doc_id"))
    }),

    // Embedding near-dup: codegen'd double cosine prefilter (custom
    // Catalyst expression, whole-stage codegen) + decimal-exact cosine on
    // survivors so the oracle hash is order-independent.
    "q_dedup_embedding" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"),
          col("embedding").cast("array<double>").as("v"))
      val pre = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
        .where(cosine_sim(col("a.embedding"), col("b.embedding")) > 0.399)
      pre.select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          (decSum(zipProd(col("a.v"), col("b.v"))).cast("double") /
            sqrt(decSum(zipProd(col("a.v"), col("a.v"))).cast("double") *
                 decSum(zipProd(col("b.v"), col("b.v"))).cast("double")))
            .as("cos"))
        .where(col("cos") > 0.4)
        .orderBy(col("vec_a"), col("vec_b"))
    })
  )

  /** Element-wise product of two double arrays. */
  private def zipProd(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => x * y)

  /** Order-independent sum of a double array via exact decimal fold. */
  private def decSum(arr: Column): Column =
    aggregate(arr, lit(0).cast("decimal(30,12)"),
      (acc, x) => (acc + x.cast("decimal(30,12)")).cast("decimal(30,12)"))

  /** DuckDB twin of the exact trigram-Jaccard pair query (also the oracle
    * for the LSH variant — see q_dedup_minhash_lsh's recall argument). */
  private val ngramOracle =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
      |           FROM documents),
      |g AS (SELECT doc_id, CASE WHEN len(w) >= 3 THEN
      |        list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
      |                       for i in generate_series(1, len(w) - 2)])
      |      ELSE [array_to_string(w, ' ')] END AS sh
      |      FROM t),
      |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |        len(list_intersect(a.sh, b.sh)) AS inter,
      |        len(a.sh) AS na, len(b.sh) AS nb
      |      FROM g a JOIN g b ON a.doc_id < b.doc_id)
      |SELECT doc_a, doc_b, inter / (na + nb - inter) AS jaccard
      |FROM p WHERE inter / (na + nb - inter) > 0.5
      |ORDER BY doc_a, doc_b""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies, text
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,

    "q_dedup_ngram_jaccard" -> ngramOracle,
    "q_dedup_minhash_lsh" -> ngramOracle,

    "q_dedup_clusters" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
        |           FROM documents),
        |g AS (SELECT doc_id, CASE WHEN len(w) >= 3 THEN
        |        list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |                       for i in generate_series(1, len(w) - 2)])
        |      ELSE [array_to_string(w, ' ')] END AS sh
        |      FROM t),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |        len(list_intersect(a.sh, b.sh)) AS inter,
        |        len(a.sh) AS na, len(b.sh) AS nb
        |      FROM g a JOIN g b ON a.doc_id < b.doc_id),
        |pairs AS (SELECT doc_a, doc_b FROM p
        |          WHERE inter / (na + nb - inter) > 0.5),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |          UNION ALL SELECT doc_b, doc_a FROM pairs),
        |rec AS (
        |  WITH RECURSIVE reach(id, lbl) AS (
        |    SELECT doc_id, doc_id FROM documents
        |    UNION
        |    SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
        |    WHERE r.lbl < e.dst
        |  ) SELECT id, MIN(lbl) AS keep_id FROM reach GROUP BY id)
        |SELECT id AS doc_id, keep_id, (id = keep_id) AS is_keeper
        |FROM rec ORDER BY doc_id""".stripMargin,

    "q_dedup_embedding" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, v,
        |        (SELECT CAST(SUM(CAST(x * x AS DECIMAL(30,12))) AS DOUBLE)
        |         FROM UNNEST(v) AS t(x)) AS nsq
        |      FROM e),
        |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |        (SELECT CAST(SUM(CAST(a.v[i] * b.v[i] AS DECIMAL(30,12)))
        |                AS DOUBLE)
        |         FROM generate_series(1, 64) AS s(i)) AS dot,
        |        a.nsq AS na, b.nsq AS nb
        |      FROM n a JOIN n b ON a.vec_id < b.vec_id)
        |SELECT vec_a, vec_b, dot / SQRT(na * nb) AS cos
        |FROM p WHERE dot / SQRT(na * nb) > 0.4
        |ORDER BY vec_a, vec_b""".stripMargin
  )
}
