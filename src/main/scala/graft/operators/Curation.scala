package graft.operators

import org.apache.spark.sql.functions._

import graft.queries.QueryDefs.Q
import graft.sources.Tables

/** Corpus-curation operators over the `documents` fixture — the
  * reproducibility-first shapes a training-data pipeline needs beyond
  * detection/dedup: deterministic sampling, shard packing, PII scrubbing.
  *
  * Everything here is hash- or rule-deterministic (no RNG), so each query
  * carries a full DuckDB oracle: at 100 TB, "re-run the pipeline and get
  * the same corpus" is a feature you design in, not an accident — a
  * seeded engine RNG (cf. q_sample_stratified's sampleBy) changes output
  * under repartitioning, while a content/key hash never does.
  */
object Curation {

  /** Knuth multiplicative hash of the doc id onto [0, 1000) — permille
    * bucket for sampling. The id is bounded mod 2^20 first so the
    * multiply never overflows INT64 (DuckDB raises on overflow rather
    * than wrapping, so both engines must stay in range; the masked id
    * still separates every doc at fixture scale and cycles harmlessly
    * beyond it). Same public constant as [[graft.functions.SrpBandKeys]].
    */
  private val SampleHashSql =
    "pmod(shiftright((doc_id % 1048576) * 2654435761, 16), 1000)"

  val defs: Map[String, Q] = Map(

    // N-gram novelty against a frozen reference slice (source = 'src0'):
    // per candidate document, the share of its distinct trigram shingles
    // absent from the ENTIRE reference corpus — the mixing signal that
    // ranks incoming data by how much it adds over what the model
    // already trained on (decontamination's complement: there the
    // overlap disqualifies, here the non-overlap is the value). Shingles
    // ride the shared Dedup.ShingleExpr kernel. Scale shape: the
    // reference's distinct-shingle table builds once with map-side
    // combine, candidates LEFT ANTI join it on the shingle — one
    // equi-shuffle, no arrays through the join; at 100 TB swap the anti
    // join for a bloom filter of the reference set (the q_dedup_bloom
    // machinery) and the same plan keeps one corpus scan per side.
    "q_curation_novelty" -> ((s, d) => {
      val sh = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("source"),
          explode(expr(Dedup.ShingleExpr)).as("sh"))
      // totals and novel counts in ONE pass: a LEFT join against the
      // reference set with null-flag counting, instead of a separate
      // totals aggregation + anti join (which scanned the corpus three
      // times — plan-asserted down to two)
      val ref = sh.where(col("source") === "src0")
        .select(col("sh")).distinct().withColumn("in_ref", lit(1))
      val cand = sh.where(col("source") =!= "src0")
      cand.join(ref, Seq("sh"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_sh"),
          sum(when(col("in_ref").isNull, 1L).otherwise(0L)).as("n_novel"))
        .select(col("doc_id"), col("n_sh"), col("n_novel"),
          expr("(1000 * n_novel) div n_sh").as("novelty_pm"))
        .orderBy(col("doc_id"))
    }),

    // Jensen–Shannon divergence between the train and valid splits'
    // token distributions — the QA check that the hash split didn't
    // skew CONTENT (a balanced row count says nothing about balanced
    // vocabulary). Every JS term is ln of an INTEGER product
    // (ln(2·c_p·n_q) − ln(c_p·n_q + c_q·n_p), products < 2^53 exact in
    // double), 1e6-floor-quantized and count-weighted, so the two
    // emitted sums are exact integers; envelope: exact while
    // c_max·n_other < 2^53 (≈ 3e9 tokens per side for a 1e6-count top
    // word) — past that, audit per language shard or subsample, the
    // statistic is an average anyway; one-sided words contribute ln 2
    // on their side and zero on the other, exactly as JS prescribes
    // (KL would be undefined — the reason JS is the right audit).
    // Scale: one scan, one vocab-sized aggregate, totals broadcast.
    "q_split_divergence" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(expr(SampleHashSql).as("hb"),
          explode(split(col("text"), " ")).as("w"))
        .where(col("hb") < 990)
        .select(col("w"), (col("hb") < 980).as("is_train"))
      val cnt = toks.groupBy(col("w"))
        .agg(sum(when(col("is_train"), 1L).otherwise(0L)).as("cp"),
          sum(when(!col("is_train"), 1L).otherwise(0L)).as("cq"))
      val tot = cnt.agg(sum(col("cp")).as("np"), sum(col("cq")).as("nq"))
      cnt.crossJoin(broadcast(tot))
        .select(col("cp"), col("cq"), col("np"), col("nq"),
          when(col("cp") > 0, col("cp") *
            (floor(log(lit(2.0) * col("cp") * col("nq")) * 1e6)
              .cast("long") -
             floor(log(col("cp") * col("nq") + col("cq") * col("np"))
               * 1e6).cast("long"))).otherwise(0L).as("ta"),
          when(col("cq") > 0, col("cq") *
            (floor(log(lit(2.0) * col("cq") * col("np")) * 1e6)
              .cast("long") -
             floor(log(col("cq") * col("np") + col("cp") * col("nq"))
               * 1e6).cast("long"))).otherwise(0L).as("tb"))
        .groupBy(col("np"), col("nq"))
        .agg(sum(col("ta")).as("js_a_scaled"),
          sum(col("tb")).as("js_b_scaled"))
        .select(col("np").as("n_train_tokens"),
          col("nq").as("n_valid_tokens"),
          col("js_a_scaled"), col("js_b_scaled"))
    }),

    // Exactly-k-per-group sampling: the fixed-size counterpart of
    // q_sample_hash's fixed-RATE draw — a rate gives each stratum a
    // binomial count, while eval sets and per-domain probes need
    // exactly k rows per group regardless of group size. Rank by the
    // shared deterministic hash ascending (negated for the heap
    // operator's DESC order) and keep the k smallest: a second use
    // case for TopKPerGroupExec — one hash-exchange heap pass, no
    // per-group sort (the window spelling is the operator's own
    // documented fallback).
    "q_sample_per_group" -> ((s, d) => {
      val scored = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          expr("-(((doc_id % 1048576) * 2654435761 >> 16) % 1048576)")
            .as("nh"))
      graft.plans.TopK.topKPerGroup(scored, Seq("source"), "nh", "doc_id", 5)
        .select(col("source"), col("doc_id"), (-col("nh")).as("hs"))
        .orderBy(col("source"), col("doc_id"))
    }),

    // Deterministic stratified sampling: per-language permille rates
    // applied by hashing the KEY, not by drawing randoms — the same doc
    // is kept or dropped on every run, on any partitioning, on any
    // engine. One scan, one groupBy; at scale the filter runs in the
    // scan stage and the only shuffle is the tiny per-stratum count.
    "q_sample_hash" -> ((s, d) => {
      val permille = when(col("lang") === "en", 100).otherwise(50)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          expr(SampleHashSql).as("hb"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("hb") < permille, 1L).otherwise(0L)).as("n_sampled"))
        .orderBy(col("lang"))
    }),

    // Weighted sampling WITHOUT replacement in one distributed pass
    // (Efraimidis & Spirakis 2006, algorithm A-ES): each doc draws a
    // deterministic hash-uniform u ∈ (0,1] and competes with key
    // u^(1/weight); the k largest keys ARE a weighted sample without
    // replacement. Ranking by ln(u)/weight is order-equivalent (ln is
    // monotone, weights positive) and avoids pow; keys are quantized
    // floor-1e4 with doc_id tiebreak so the selection is total-ordered
    // and the ln rides the established cross-engine envelope. Weight =
    // distinct-word count — the integer quality signal the canonical
    // picker already uses, so high-quality docs are proportionally
    // favored but every doc keeps a nonzero chance: the
    // quality-weighted subcorpus draw a curation pipeline wants where
    // a hard top-k-by-quality would collapse diversity. Scale shape:
    // u and the key are scan-stage expressions (no RNG, no shuffle);
    // the k winners come out of a distributed TakeOrdered, and the
    // k-row rank window runs on k rows only.
    "q_sample_weighted" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      import graft.functions.VectorFunctions.neutral_hash40
      val keyed = Tables.documents(s, d)
        .select(col("doc_id"),
          size(array_distinct(split(col("text"), " "))).cast("long")
            .as("quality"),
          neutral_hash40(col("doc_id").cast("string")).as("h"))
        .select(col("doc_id"), col("quality"),
          floor(log((col("h").cast("double") + lit(1.0)) /
              lit(1099511627776.0)) * lit(1e4) /
            col("quality").cast("double")).cast("long").as("key_q"))
      val top = keyed
        .orderBy(col("key_q").desc, col("doc_id")).limit(200)
      top.withColumn("rk", row_number().over(
          Window.orderBy(col("key_q").desc, col("doc_id"))))
        .select(col("rk"), col("doc_id"), col("quality"), col("key_q"))
        .orderBy(col("rk"))
    }),

    // Temperature-based mixture sampling (α = 0.5): the multilingual
    // data-mixing step — per-language budgets ∝ n_lang^α flatten the
    // language distribution (rare languages up-weighted, head languages
    // capped), then each budget is filled deterministically by hash
    // rank, never RNG. Scale shape: language counts are a k-row
    // aggregate (k = #languages) broadcast back; the rank window
    // partitions by language; the corpus itself never shuffles twice.
    // Cross-engine determinism: SQRT is one correctly-rounded IEEE op;
    // the denominator Σ√n quantizes each term to decimal before the
    // (order-free) sum; budget = floor of a single double expression
    // both engines evaluate identically.
    "q_sample_temperature" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val budget = 200.0
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          expr("shiftright((doc_id % 1048576) * 2654435761, 16)").as("hs"))
      val counts = docs.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_l"))
        .withColumn("sq", sqrt(col("n_l").cast("double"))
          .cast("decimal(30,12)"))
      val tot = counts.agg(sum(col("sq")).as("tot"))
      val targets = counts.crossJoin(broadcast(tot))
        .select(col("lang"),
          floor(lit(budget) * col("sq").cast("double") /
            col("tot").cast("double")).as("target"))
      val w = Window.partitionBy(col("lang")).orderBy(col("hs"), col("doc_id"))
      docs.join(broadcast(targets), "lang")
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= col("target"))
        .select(col("doc_id"), col("lang"), col("rk"), col("target"))
        .orderBy(col("doc_id"))
    }),

    // Fractional-epoch upsampling — the other half of data mixing:
    // q_sample_temperature DOWN-samples head domains; a pretraining mix
    // also UP-samples rare ones by repeating them a fractional number
    // of epochs. Per language f = min(4, sqrt(n_max / n_l)) ≥ 1: every
    // doc appears floor(f) times, plus once more iff its hash permille
    // falls under frac(f)·1000 — the realized epoch count converges to
    // f per language with zero RNG, docs never repeat adjacently (the
    // extra copy is a hash-chosen SLICE, not a tail duplicate), and
    // reruns emit the identical corpus. Scale shape: the factor table
    // is k rows broadcast back; the fan-out is a map-side
    // explode(sequence(...)) in the scan stage; the corpus shuffles
    // only for the presentation sort. sqrt/floor are single
    // correctly-rounded IEEE ops both engines evaluate identically
    // (same argument as q_sample_temperature's budget).
    "q_mix_epochs" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), expr(SampleHashSql).as("hb"))
      val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_l"))
      val nmax = counts.agg(max(col("n_l")).as("nmax"))
      val fac = counts.crossJoin(broadcast(nmax))
        .select(col("lang"), least(lit(4.0),
          sqrt(col("nmax").cast("double") / col("n_l").cast("double")))
          .as("f"))
        .select(col("lang"),
          floor(col("f")).cast("long").as("base"),
          floor((col("f") - floor(col("f"))) * 1000).cast("long")
            .as("extra_pm"))
      docs.join(broadcast(fac), "lang")
        .select(col("doc_id"), col("lang"),
          (col("base") +
            when(col("hb") < col("extra_pm"), 1L).otherwise(0L))
            .as("n_copies"))
        .select(col("doc_id"), col("lang"), col("n_copies"),
          explode(sequence(lit(1L), col("n_copies"))).as("copy"))
        .orderBy(col("doc_id"), col("copy"))
    }),

    // Deterministic training-order shuffle + shard manifest: the last
    // step before a trainer reads the corpus — an order that is (a)
    // well-mixed (hash order, so domains/languages interleave), (b)
    // reproducible bit-for-bit across reruns and engines, (c) computed
    // WITHOUT a global sort rank (shard = hash mod k and the order key
    // is the hash VALUE, so assignment is a map-side expression and the
    // within-shard sort is embarrassingly parallel — no single-partition
    // row_number over the corpus, which is the spelling that dies at
    // 100 TB). The manifest emits per shard: size, id sum, and a
    // positional checksum Σ rank·doc_id that pins the exact permutation
    // a trainer would replay — if any doc moved, the digest moves.
    "q_mix_shard_order" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("shard"))
        .orderBy(col("hs"), col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          expr("shiftright((doc_id % 1048576) * 2654435761, 16)").as("hs"))
        .withColumn("shard", pmod(col("hs"), lit(16)).cast("long"))
        .withColumn("rk", row_number().over(w))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("id_sum"),
          sum(col("rk").cast("long") * col("doc_id")).as("order_digest"),
          min(col("hs")).as("hs_min"), max(col("hs")).as("hs_max"))
        .orderBy(col("shard"))
    }),

    // Greedy shard packing: documents stream in deterministic order
    // (doc_id) within each language and fill fixed-capacity token shards
    // — bin k holds the docs whose PRECEDING cumulative token count lies
    // in [k·cap, (k+1)·cap). This is the one-pass streaming packer (a
    // doc may straddle its shard's nominal capacity, bins stay ≥ cap
    // full on average); per-language windows parallelize across the
    // cluster, and the running sum is a single window scan — no
    // driver-side loop, no second pass.
    "q_pack_tokens" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val cap = 2048L
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      toks
        .withColumn("cum", sum(col("n_tok")).over(w))
        .withColumn("bin", ((col("cum") - col("n_tok")) / cap).cast("long"))
        .groupBy(col("lang"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tok_sum"))
        .orderBy(col("lang"), col("bin"))
    }),

    // Length-bucketed batching audit — the padding-waste lever of every
    // fixed-shape training/inference batcher: sequences are truncated to
    // max_len 256 and grouped into batches of 8, and each batch pads
    // every member up to ITS max — so arrival-order batches mix short
    // and long docs and burn ~35% of their token slots on padding,
    // while length-sorted batching packs near-equal lengths together
    // and cuts the waste to a few percent (both measured here, on the
    // same corpus, as per-mille of padded slots). Both strategies are
    // one window rank per lang partition (embarrassingly parallel; at
    // 100 TB the partition key gains a shard component and the sort is
    // per-shard, exactly how a real batcher shards) — no global
    // single-partition window, no collect. All arithmetic is integer,
    // so the oracle replays it bit-for-bit.
    "q_pack_padding" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val t = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          least(size(split(col("text"), " ")).cast("long"), lit(256L))
            .as("n_tok"))
      def waste(w: org.apache.spark.sql.expressions.WindowSpec,
          strategy: String): org.apache.spark.sql.DataFrame =
        t.withColumn("rk", row_number().over(w))
          .withColumn("batch", expr("(rk - 1) div 8"))
          .groupBy(col("lang"), col("batch"))
          .agg(count(lit(1)).as("nd"), max(col("n_tok")).as("mx"),
            sum(col("n_tok")).as("sm"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_batches"),
            sum(col("nd")).as("n_docs"),
            sum(col("sm")).as("tok_sum"),
            sum(col("nd") * col("mx") - col("sm")).as("pad_sum"),
            sum(col("nd") * col("mx")).as("slots"))
          .select(lit(strategy).as("strategy"), col("lang"),
            col("n_batches"), col("n_docs"), col("tok_sum"), col("pad_sum"),
            expr("(1000 * pad_sum) div slots").as("pad_pm"))
      val arrival = waste(
        Window.partitionBy(col("lang")).orderBy(col("doc_id")), "arrival")
      val bylen = waste(
        Window.partitionBy(col("lang")).orderBy(col("n_tok"), col("doc_id")),
        "length")
      arrival.unionAll(bylen).orderBy(col("strategy"), col("lang"))
    }),

    // Incremental aggregate maintenance — the nightly-delta pattern: a
    // 100 TB corpus's per-source stats are NOT recomputed by rescanning
    // history every refresh; the stored sufficient statistics (n, Σx,
    // Σx²) merge with the delta batch's in a k-row join. This query
    // runs that merge for real — the "existing" corpus (doc_id % 3 ≠ 0,
    // q_dedup_bloom's convention) and the delta (doc_id % 3 = 0) are
    // aggregated as SEPARATE scans and combined by component-wise
    // addition over a full-outer source join — and the DuckDB oracle
    // computes the same stats from ONE full scan, so the hash-exact
    // match IS the merge-equals-recompute proof. All moments are exact
    // integers (token counts), mean is integer-quantized; at scale the
    // existing side is a stored k-row table, and only the delta ever
    // scans.
    "q_agg_incremental" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
      def stats(f: org.apache.spark.sql.Column) = docs.where(f)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_tok")).as("s"),
          sum(col("n_tok") * col("n_tok")).as("q"))
      val existing = stats(pmod(col("doc_id"), lit(3)) =!= 0)
      val delta = stats(pmod(col("doc_id"), lit(3)) === 0)
      existing.as("a").join(delta.as("b"), Seq("source"), "full")
        .select(col("source"),
          (coalesce(col("a.n"), lit(0L)) + coalesce(col("b.n"), lit(0L)))
            .as("n_docs"),
          (coalesce(col("a.s"), lit(0L)) + coalesce(col("b.s"), lit(0L)))
            .as("tok_sum"),
          (coalesce(col("a.q"), lit(0L)) + coalesce(col("b.q"), lit(0L)))
            .as("tok_sumsq"))
        .withColumn("mean_tok_q",
          expr("(1000000 * tok_sum) div n_docs"))
        .orderBy(col("source"))
    }),

    // Model-based quality filtering via the hashing trick: a linear
    // classifier whose features are hashed token buckets and whose
    // weights derive from the shared Knuth hash — the fastText-shaped
    // quality gate (score = Σ w[bucket(token)], keep if positive)
    // expressed as ONE codegen'd aggregate() fold per document. No
    // explode, no shuffle: the score is computed inside the scan stage,
    // so at 100 TB this filter costs exactly one pass over the text. All
    // arithmetic is integer, so the oracle replays it bit-for-bit.
    "q_text_classifier" -> ((s, d) => {
      val score = expr(
        """aggregate(split(text, ' '), 0L, (acc, t) ->
          |  acc + (shiftright((pmod(ascii(t) * 31 + length(t), 64) + 1)
          |                    * 2654435761, 16) % 2001) - 1000)""".stripMargin)
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).as("n_tok"),
          score.as("score"))
        .withColumn("kept", (col("score") > 0).cast("int"))
        .orderBy(col("doc_id"))
    }),

    // Calibration audit of the hashed-linear classifier against the
    // distinct-word-ratio weak label: per fixed-width score bin
    // (width 200, clamped to ±5 — fixed bins, NOT ntile, because a
    // global decile rank is a corpus-sized single-partition window;
    // fixed bins compute map-side), the observed positive rate. A
    // usable quality score must be monotone-ish in the label rate; a
    // flat curve means the classifier adds nothing over chance — which
    // is the honest fixture reading, and exactly what this audit is
    // for. Score binning uses the explicit floor-division spelling
    // (scores are signed). One scan, 11 rows out.
    "q_audit_calibration" -> ((s, d) => {
      val score = expr(
        """aggregate(split(text, ' '), 0L, (acc, t) ->
          |  acc + (shiftright((pmod(ascii(t) * 31 + length(t), 64) + 1)
          |                    * 2654435761, 16) % 2001) - 1000)""".stripMargin)
      val toks = split(col("text"), " ")
      Tables.documents(s, d)
        .select(score.as("score"),
          (size(array_distinct(toks)).cast("double") /
            size(toks).cast("double") > 0.45).as("pos"))
        .select(greatest(lit(-5L), least(lit(5L),
          expr("(score - ((score % 200 + 200) % 200)) div 200")))
          .as("bin"), col("pos"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"))
        .select(col("bin"), col("n_docs"), col("n_pos"),
          expr("(1000 * n_pos) div n_docs").as("pos_pm"))
        .orderBy(col("bin"))
    }),

    // Per-domain document cap (the Common-Crawl anti-spam lever): at most
    // `cap` docs survive per source, chosen by deterministic hash rank so
    // reruns keep the same docs. The window partitions by domain —
    // embarrassingly parallel — and only (doc_id, source, hash) triples
    // ever shuffle; kept_id_sum proves WHICH docs survived, not just how
    // many.
    "q_domain_cap" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val cap = 15
      val w = Window.partitionBy(col("source")).orderBy(col("hs"), col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          expr("shiftright((doc_id % 1048576) * 2654435761, 16)").as("hs"))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= cap)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("kept_id_sum"))
        .orderBy(col("source"))
    }),

    // Deterministic train/valid/test assignment — the split every
    // corpus ships with, done the reproducible way: 980/10/10 permille
    // by the shared content-key hash (not RNG), stratified per language
    // so low-resource languages keep eval coverage. Emits per-stratum
    // counts plus id-sum digests proving WHICH docs landed where. Same
    // scale shape as q_sample_hash: the assignment is a map-side
    // expression in the scan stage; only (lang, split) aggregates
    // shuffle.
    "q_split_assign" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), expr(SampleHashSql).as("hb"))
        .withColumn("split",
          when(col("hb") < 980, "train")
            .when(col("hb") < 990, "valid").otherwise("test"))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
        .orderBy(col("lang"), col("split"))
    }),

    // The bloom-filter rendition of q_curation_novelty — the documented
    // 100 TB swap made real: instead of anti-joining every candidate
    // shingle against the reference set (a corpus×corpus equi-shuffle),
    // build ONE corpus-sized bloom filter over the reference shingles
    // (mergeable aggregate, map-side combined, M/8 bytes broadcast) and
    // probe each candidate shingle map-side — the candidate corpus
    // never shuffles at all. A bloom MISS is a certain novelty (no
    // false negatives), a hit may be a false positive, so the bloom
    // novelty count is a provable LOWER bound on the exact one
    // (spec-asserted per doc, with the aggregate within the FP
    // envelope). M derives from the reference cardinality (≈ 8
    // bits/key, smallest power of two ≥ 8n — the lshBits rule: the
    // 4096-bit default saturates at sf0.1's 10k reference shingles and
    // would report zero novelty). The reference count is ONE bounded
    // driver scalar, same class as the centroid loops.
    "q_curation_novelty_bloom" -> ((s, d) => {
      import graft.functions.BloomFilterAgg
      import graft.functions.BloomFilterAgg.bloom_agg
      import graft.functions.CountMinAgg.cms_base
      val sh = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("source"),
          explode(expr(Dedup.ShingleExpr)).as("sh"))
      val ref = sh.where(col("source") === "src0")
        .select(col("sh")).distinct()
        // r15: read by BOTH the sizing count and the bloom aggregate —
        // one explode+distinct instead of two
        .localCheckpoint()
      val nRef = ref.count() // bounded driver scalar: sizes the filter
      // clamp to the oracle's enumerated bit range [12, 26] — past 2^23
      // reference shingles the two engines would otherwise diverge, and
      // an unclamped Int shift overflows at bits >= 31; nRef == 0
      // (empty reference) takes the floor instead of nlz(-1) = 64
      val bits =
        if (nRef == 0L) 12
        else math.min(26, math.max(12,
          64 - java.lang.Long.numberOfLeadingZeros(8L * nRef - 1)))
      val m = 1 << bits
      val filt = ref.agg(bloom_agg(col("sh"), m).as("bloom"))
      val hit = (0 until BloomFilterAgg.K).map { r =>
        val p = s"((shiftright(base * ${2654435761L + r}, 16)) % $m)"
        expr(s"(shiftrightunsigned(element_at(bloom," +
          s" CAST($p DIV 64 AS INT) + 1), CAST($p % 64 AS INT)) & 1) = 1")
      }.reduce(_ && _)
      sh.where(col("source") =!= "src0")
        .crossJoin(broadcast(filt))
        .withColumn("base", cms_base(col("sh")))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_sh"),
          sum(when(!hit, 1L).otherwise(0L)).as("n_novel_bloom"))
        .select(col("doc_id"), col("n_sh"), col("n_novel_bloom"),
          expr("(1000 * n_novel_bloom) div n_sh").as("novelty_bloom_pm"))
        .orderBy(col("doc_id"))
    }),

    // In-batch negative pairs for contrastive training, with
    // false-negative filtering: hash documents into training batches,
    // take every within-batch ordered pair (a < b) as a candidate
    // negative, and EXCLUDE pairs the near-dup miner knows are
    // near-copies — training "apart" on a near-duplicate is the classic
    // false-negative failure of in-batch sampling. Output is
    // analytics-sized (per batch: doc/pair/excluded counts + a digest
    // of the kept pairs), never pair-sized. Scale shape: the candidate
    // stage is a self-equi-join ON THE BATCH KEY, so the quadratic is
    // bounded by batch_size² — a bound the training-batch semantics
    // impose anyway; batch count grows as n/batch_size (the fixture
    // pins 4 batches so the exclusion path is provably non-vacuous:
    // 10 of 28 near-dup pairs land same-batch at sf0.001). The
    // exclusion table is the memoized pair memo — broadcast-sized.
    "q_sample_negatives" -> ((s, d) => {
      val b = Tables.documents(s, d).select(col("doc_id"),
        expr("((doc_id % 1048576) * 2654435761 >> 16) % 4").as("batch"))
      val cand = b.as("x").join(b.as("y"),
          col("x.batch") === col("y.batch") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.batch").as("batch"), col("x.doc_id").as("doc_a"),
          col("y.doc_id").as("doc_b"))
      val nd = Dedup.ngramJaccardPairsMemo(s, d).withColumn("dup", lit(1))
      val sizes = b.groupBy(col("batch")).agg(count(lit(1)).as("n_docs"))
      cand.join(broadcast(nd), Seq("doc_a", "doc_b"), "left")
        .groupBy(col("batch"))
        .agg(sum(when(col("dup").isNull, 1L).otherwise(0L)).as("n_neg_pairs"),
          sum(when(col("dup").isNotNull, 1L).otherwise(0L)).as("n_excluded"),
          sum(when(col("dup").isNull,
            col("doc_a") * 100003L + col("doc_b")).otherwise(0L))
            .as("pair_digest"))
        .join(broadcast(sizes), Seq("batch"))
        .select(col("batch"), col("n_docs"), col("n_neg_pairs"),
          col("n_excluded"), col("pair_digest"))
        .orderBy(col("batch"))
    }),

    // Leakage-safe train/valid/test split: hash the near-dup cluster
    // CANONICAL id, not the doc id, so every member of a duplicate
    // family lands in the SAME split by construction. The doc-keyed
    // split (q_split_assign's shape at 80/10/10) measurably leaks on
    // the fixture — 5 of 28 near-dup pairs straddle splits at sf0.001
    // (spec-demonstrated) — which is exactly how eval contamination
    // enters a pretraining corpus: the model trains on a near-copy of
    // a held-out document. Rides the memoized pair table + CC labels
    // (one mining pass per session); the split itself is a map-side
    // expression over the label table.
    "q_split_leakage" -> ((s, d) => {
      Dedup.clusterLabels(s, d)
        .select(col("doc_id"), col("keep_id"),
          expr("((keep_id % 1048576) * 2654435761 >> 16) % 1000").as("hb"))
        .withColumn("split",
          when(col("hb") < 800, "train")
            .when(col("hb") < 900, "valid").otherwise("test"))
        .select(col("doc_id"), col("keep_id"), col("split"))
        .orderBy(col("doc_id"))
    }),

    // CCNet-style perplexity bucketing: per language, rank documents by
    // their statistical-LM score (the shared add-1 bigram scorer behind
    // q_text_lm_score) and split into head/middle/tail terciles — the
    // classic quality-stratified mix a pretraining corpus is assembled
    // from (head kept, middle sampled, tail dropped). The sort key is
    // the per-doc mean log-prob (one double division of two exact
    // integers — identical on both engines; ties broken by doc_id), but
    // the published columns are pure integers: per (lang, tercile)
    // counts plus an id-sum digest proving WHICH docs landed in each
    // bucket. Docs too short to carry a bigram have no LM score and are
    // excluded by the join, same as the oracle. Scale shape: the LM is
    // corpus-trained (bigram/unigram aggregates), the tercile window is
    // per-language, and only (doc_id, lang, two ints) rows shuffle.
    "q_mix_ccnet" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("avg_lp").desc, col("doc_id"))
      Tables.documents(s, d).select(col("doc_id"), col("lang"))
        .join(TextAnalysis.lmDocScores(s, d), "doc_id")
        .withColumn("avg_lp",
          col("score_q").cast("double") / col("n_bigrams").cast("double"))
        .withColumn("bucket", ntile(3).over(w).cast("long"))
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
        .orderBy(col("lang"), col("bucket"))
    }),

    // DSIR-style importance resampling (Data Selection via Importance
    // Resampling, Xie et al. 2023): score every raw document by how
    // target-like its hashed-n-gram profile is — log p_target/p_raw
    // summed over the doc's hashed unigram buckets — then keep the
    // top-k. Target distribution = the `lang = 'en'` slice; features =
    // the same 64 hashed token buckets as q_text_classifier. The two
    // bag-of-buckets models are Laplace-smoothed bucket frequencies;
    // per-bucket log-ratios are quantized to integers (1e6 grid, the
    // q_text_lm_score pattern) so the per-doc score is an exact integer
    // sum both engines reproduce bit-for-bit. Scale shape: the bucket
    // stats are ONE token-level map-side-combined aggregate onto 64
    // rows; those 64 (bucket, weight) longs come back to the driver
    // (bounded, 512 bytes — the centroid-table pattern) and re-enter
    // the plan as an array literal, so the scoring pass is a pure scan
    // stage: one aggregate() fold per doc, no corpus shuffle, and the
    // global top-200 is TakeOrderedAndProject (per-partition heaps, no
    // full sort).
    "q_curation_dsir" -> ((s, d) => {
      val bucket = "pmod(ascii(t) * 31 + length(t), 64)"
      val stats = Tables.documents(s, d)
        .select(col("lang"), explode(split(col("text"), " ")).as("t"))
        .select(col("lang"), expr(bucket).as("b"))
        .groupBy(col("b"))
        .agg(count(lit(1)).as("n_r"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_t"))
        .collect().map(r => r.getInt(0) ->
          (r.getLong(1), r.getLong(2))).toMap
      val totR = stats.valuesIterator.map(_._1).sum
      val totT = stats.valuesIterator.map(_._2).sum
      val lw = (0 until 64).map { b =>
        val (nR, nT) = stats.getOrElse(b, (0L, 0L))
        math.floor(math.log(
          ((nT + 1).toDouble * (totR + 64).toDouble) /
            ((nR + 1).toDouble * (totT + 64).toDouble)) * 1e6).toLong
      }
      val lwLit = array(lw.map(lit(_)): _*)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          aggregate(split(col("text"), " "), lit(0L), (acc, t) =>
            acc + element_at(lwLit,
              (pmod(ascii(t) * lit(31) + length(t), lit(64)) + lit(1))
                .cast("int"))).as("score"))
        .orderBy(col("score").desc, col("doc_id")).limit(200)
        .orderBy(col("doc_id"))
    }),

    // PII scrubbing: regex redaction of emails and phone-shaped strings,
    // with per-doc redaction counts and a digest of the scrubbed text.
    // The fixture corpus contains no PII, so the query first INJECTS
    // deterministic synthetic PII into a third of the docs (keyed on
    // doc_id — no RNG), then scrubs it; the digest proves the
    // replacement text, not just the counts. One scan, all codegen'd
    // string expressions; the patterns are RE2-safe so the oracle runs
    // them verbatim.
    "q_pii_scrub" -> ((s, d) => {
      val email = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
      val phone = "555-[0-9]{4}"
      val aug = when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" contact user"),
            col("doc_id").cast("string"), lit("@example.com now")))
        .when(col("doc_id") % 3 === 1,
          concat(col("text"), lit(" call 555-"),
            (lit(1000) + col("doc_id") % 9000).cast("string")))
        .otherwise(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"), aug.as("aug"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("aug"), lit(email), lit(0)))
            .as("n_emails"),
          size(regexp_extract_all(col("aug"), lit(phone), lit(0)))
            .as("n_phones"),
          sha2(regexp_replace(regexp_replace(col("aug"), email, "<EMAIL>"),
            phone, "<PHONE>").cast("binary"), 256).as("scrubbed_digest"))
        .orderBy(col("doc_id"))
    }),

    // Token-budget water-filling: given a total training-token budget
    // (here 60% of the corpus), allocate it across domains as evenly as
    // possible — small domains contribute everything they have, large
    // domains are capped at a common threshold t chosen so the
    // allocations sum to the budget (the max-entropy mixture under
    // availability caps; the closed form behind "uniform up to
    // saturation" data-mixing recipes). The solver sorts domains by
    // availability ascending and takes the first rank whose even split
    // of the remaining budget fits under its own availability — pure
    // integer arithmetic end to end, so the oracle replays it exactly
    // (integer div leaves < k tokens unspent, documented not hidden).
    // Scale shape: per-domain availability is ONE corpus aggregate
    // (token counts fold inside the scan stage), PERSISTED because four
    // consumers (totals, solver ranks, threshold, final allocation)
    // would otherwise each re-derive it from the corpus — the cache is
    // k rows, the recompute it saves is a 100 TB scan per consumer
    // (plan-asserted: exactly one documents read). The solver itself
    // runs on k = |domains| rows — its global window is bounded by the
    // domain alphabet, never by corpus size — and the threshold
    // broadcasts back to the k-row table.
    "q_mix_waterfill" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val avail = Tables.documents(s, d)
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .groupBy(col("source")).agg(sum(col("n_tok")).as("avail"))
        .persist()
      val tot = avail.agg(sum(col("avail")).as("tot"),
        count(lit(1)).as("k"), max(col("avail")).as("mx"))
      val ord = Window.orderBy(col("avail"), col("source"))
      val j = avail.crossJoin(broadcast(tot))
        .withColumn("budget", expr("(tot * 3) div 5"))
        .withColumn("rn", row_number().over(ord))
        .withColumn("prev", coalesce(sum(col("avail")).over(
          ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("cand", expr("(budget - prev) div (k - rn + 1)"))
      val thr = j.where(col("cand") <= col("avail"))
        .agg(min_by(col("cand"), col("rn")).as("t0"))
      avail.crossJoin(broadcast(thr)).crossJoin(broadcast(tot))
        .withColumn("alloc",
          least(col("avail"), coalesce(col("t0"), col("mx"))))
        .select(col("source"), col("avail"), col("alloc"),
          expr("(1000 * alloc) div avail").as("rate_pm"))
        .orderBy(col("source"))
    }),

    // Robust per-domain score normalization: median/IQR scaling of the
    // per-doc token count within its source — the outlier-resistant
    // standardization a curation pipeline applies before thresholding
    // quality scores pooled across heterogeneous domains (mean/stddev
    // z-scores let one giant document shift the whole domain; quartiles
    // don't). Exact-percentile interpolation lands on quarter fractions
    // of integers — exactly representable doubles — and the scaled
    // value quantizes to per-mille, so both engines emit identical
    // bits. Scale shape: two corpus reads, the minimum any
    // stats-then-score shape admits — one per-domain quartile aggregate
    // (exact percentile shuffles only (source, n_tok) pairs; at extreme
    // cardinality swap in approx_percentile with documented error),
    // then the k-row quartile table broadcasts onto a second scan that
    // scores every document. Plan-asserted at exactly two reads.
    "q_text_robust_scale" -> ((s, d) => {
      val t = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
      val q = t.groupBy(col("source")).agg(
        expr("percentile(n_tok, 0.25)").as("q1"),
        expr("percentile(n_tok, 0.5)").as("med"),
        expr("percentile(n_tok, 0.75)").as("q3"))
      t.join(broadcast(q), "source")
        .select(col("doc_id"), col("source"), col("n_tok"),
          when(col("q3") > col("q1"),
            floor(lit(1000.0) * (col("n_tok") - col("med")) /
              (col("q3") - col("q1"))))
            .otherwise(0L).cast("long").as("rz_pm"))
        .orderBy(col("doc_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    // Same classifier fold (the q_text_classifier oracle spelling),
    // weak label, floor-div binning, and clamp.
    "q_audit_calibration" ->
      """WITH s AS (SELECT
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(text, ' '), t ->
        |        ((((ascii(t) * 31 + length(t)) % 64 + 1) * 2654435761
        |          >> 16) % 2001) - 1000)),
        |      (acc, x) -> acc + x) AS score,
        |    len(list_distinct(string_split(text, ' '))) * 1.0
        |      / len(string_split(text, ' ')) > 0.45 AS pos
        |  FROM documents),
        |b AS (SELECT GREATEST(-5, LEAST(5,
        |        (score - ((score % 200 + 200) % 200)) // 200)) AS bin,
        |        pos
        |      FROM s)
        |SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(COUNT(*) FILTER (WHERE pos) AS BIGINT) AS n_pos,
        |  (1000 * CAST(COUNT(*) FILTER (WHERE pos) AS BIGINT))
        |    // CAST(COUNT(*) AS BIGINT) AS pos_pm
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,

    // Same term construction; DuckDB's LN on the same exact-in-double
    // integer products, identical quantization.
    "q_split_divergence" ->
      """WITH tk AS (SELECT
        |    ((doc_id % 1048576) * 2654435761 >> 16) % 1000 AS hb,
        |    UNNEST(string_split(text, ' ')) AS w
        |  FROM documents),
        |f AS (SELECT w, hb < 980 AS is_train FROM tk WHERE hb < 990),
        |c AS (SELECT w,
        |        CAST(SUM(CASE WHEN is_train THEN 1 ELSE 0 END) AS BIGINT)
        |          AS cp,
        |        CAST(SUM(CASE WHEN is_train THEN 0 ELSE 1 END) AS BIGINT)
        |          AS cq
        |      FROM f GROUP BY w),
        |t AS (SELECT CAST(SUM(cp) AS BIGINT) AS np,
        |        CAST(SUM(cq) AS BIGINT) AS nq FROM c),
        |terms AS (SELECT np, nq,
        |    CASE WHEN cp > 0 THEN cp *
        |      (CAST(FLOOR(LN(2.0 * cp * nq) * 1e6) AS BIGINT)
        |       - CAST(FLOOR(LN(CAST(cp * nq + cq * np AS DOUBLE)) * 1e6)
        |           AS BIGINT))
        |    ELSE 0 END AS ta,
        |    CASE WHEN cq > 0 THEN cq *
        |      (CAST(FLOOR(LN(2.0 * cq * np) * 1e6) AS BIGINT)
        |       - CAST(FLOOR(LN(CAST(cq * np + cp * nq AS DOUBLE)) * 1e6)
        |           AS BIGINT))
        |    ELSE 0 END AS tb
        |  FROM c CROSS JOIN t)
        |SELECT np AS n_train_tokens, nq AS n_valid_tokens,
        |  CAST(SUM(ta) AS BIGINT) AS js_a_scaled,
        |  CAST(SUM(tb) AS BIGINT) AS js_b_scaled
        |FROM terms GROUP BY np, nq""".stripMargin,

    // The rank spelling of the per-group k-smallest-hash draw.
    "q_sample_per_group" ->
      """WITH h AS (SELECT source, doc_id,
        |             ((doc_id % 1048576) * 2654435761 >> 16) % 1048576
        |               AS hs
        |           FROM documents),
        |r AS (SELECT source, doc_id, hs,
        |        ROW_NUMBER() OVER (PARTITION BY source
        |          ORDER BY hs, doc_id) AS rn
        |      FROM h)
        |SELECT source, doc_id, CAST(hs AS BIGINT) AS hs
        |FROM r WHERE rn <= 5 ORDER BY source, doc_id""".stripMargin,

    // Same trigram construction as the Dedup family's ngram oracle;
    // novelty counted via the anti-join spelling.
    "q_curation_novelty" ->
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS w
        |           FROM documents),
        |g AS (SELECT doc_id, source,
        |        UNNEST(CASE WHEN len(w) >= 3 THEN
        |          list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |                         for i in generate_series(1, len(w) - 2)])
        |        ELSE [array_to_string(w, ' ')] END) AS sh
        |      FROM t),
        |ref AS (SELECT DISTINCT sh FROM g WHERE source = 'src0'),
        |cand AS (SELECT doc_id, sh FROM g WHERE source <> 'src0'),
        |tot AS (SELECT doc_id, COUNT(*) AS n_sh FROM cand GROUP BY doc_id),
        |nov AS (SELECT c.doc_id, COUNT(*) AS n_novel FROM cand c
        |        WHERE NOT EXISTS (SELECT 1 FROM ref r WHERE r.sh = c.sh)
        |        GROUP BY c.doc_id)
        |SELECT t.doc_id, t.n_sh,
        |  CAST(COALESCE(n.n_novel, 0) AS BIGINT) AS n_novel,
        |  (1000 * CAST(COALESCE(n.n_novel, 0) AS BIGINT)) // t.n_sh
        |    AS novelty_pm
        |FROM tot t LEFT JOIN nov n USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,

    "q_sample_hash" ->
      """WITH h AS (
        |  SELECT doc_id, lang,
        |    ((doc_id % 1048576) * 2654435761 >> 16) % 1000 AS hb,
        |    CASE WHEN lang = 'en' THEN 100 ELSE 50 END AS permille
        |  FROM documents)
        |SELECT lang, COUNT(*) AS n_total,
        |  CAST(SUM(CASE WHEN hb < permille THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_sampled
        |FROM h GROUP BY lang ORDER BY lang""".stripMargin,

    // Same 40-bit fold over the doc_id's decimal string, same
    // LN/quantize/divide spelling, same top-200 total order.
    "q_sample_weighted" ->
      """WITH ks AS (SELECT doc_id,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
        |      AS quality,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(CAST(doc_id AS VARCHAR), ''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |      (a, c) -> (a * 1000003 + c) % 1099511627776) AS h
        |  FROM documents),
        |kq AS (SELECT doc_id, quality,
        |    CAST(FLOOR(LN((CAST(h AS DOUBLE) + 1.0) / 1099511627776.0)
        |               * 1e4 / CAST(quality AS DOUBLE)) AS BIGINT)
        |      AS key_q
        |  FROM ks),
        |top AS (SELECT * FROM kq ORDER BY key_q DESC, doc_id LIMIT 200)
        |SELECT ROW_NUMBER() OVER (ORDER BY key_q DESC, doc_id) AS rk,
        |  doc_id, quality, key_q
        |FROM top ORDER BY rk""".stripMargin,

    "q_sample_temperature" ->
      """WITH h AS (
        |  SELECT doc_id, lang,
        |    ((doc_id % 1048576) * 2654435761 >> 16) AS hs
        |  FROM documents),
        |c AS (SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY lang),
        |cq AS (SELECT lang, CAST(SQRT(CAST(n_l AS DOUBLE))
        |                         AS DECIMAL(30,12)) AS sq FROM c),
        |t AS (SELECT SUM(sq) AS tot FROM cq),
        |tg AS (SELECT lang,
        |         CAST(FLOOR(200.0 * CAST(sq AS DOUBLE)
        |                    / CAST(tot AS DOUBLE)) AS BIGINT) AS target
        |       FROM cq CROSS JOIN t),
        |r AS (SELECT doc_id, lang,
        |        ROW_NUMBER() OVER (PARTITION BY lang
        |                           ORDER BY hs, doc_id) AS rk
        |      FROM h)
        |SELECT r.doc_id, r.lang, CAST(r.rk AS INT) AS rk, tg.target
        |FROM r JOIN tg USING (lang)
        |WHERE r.rk <= tg.target
        |ORDER BY r.doc_id""".stripMargin,

    "q_mix_shard_order" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    ((doc_id % 1048576) * 2654435761 >> 16) AS hs
        |  FROM documents),
        |sh AS (SELECT doc_id, hs, hs % 16 AS shard FROM h),
        |r AS (SELECT doc_id, hs, shard,
        |        ROW_NUMBER() OVER (PARTITION BY shard
        |                           ORDER BY hs, doc_id) AS rk
        |      FROM sh)
        |SELECT shard, COUNT(*) AS n_docs,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_sum,
        |  CAST(SUM(rk * doc_id) AS BIGINT) AS order_digest,
        |  CAST(MIN(hs) AS BIGINT) AS hs_min, CAST(MAX(hs) AS BIGINT) AS hs_max
        |FROM r GROUP BY shard ORDER BY shard""".stripMargin,

    "q_mix_epochs" ->
      """WITH h AS (
        |  SELECT doc_id, lang,
        |    ((doc_id % 1048576) * 2654435761 >> 16) % 1000 AS hb
        |  FROM documents),
        |c AS (SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY lang),
        |mx AS (SELECT MAX(n_l) AS nmax FROM c),
        |f AS (SELECT lang,
        |        LEAST(CAST(4 AS DOUBLE),
        |              SQRT(CAST(nmax AS DOUBLE) / CAST(n_l AS DOUBLE)))
        |          AS fac
        |      FROM c CROSS JOIN mx),
        |e AS (SELECT lang, CAST(FLOOR(fac) AS BIGINT) AS base,
        |        CAST(FLOOR((fac - FLOOR(fac)) * 1000) AS BIGINT)
        |          AS extra_pm
        |      FROM f),
        |n AS (SELECT h.doc_id, h.lang,
        |        e.base + CASE WHEN h.hb < e.extra_pm THEN 1 ELSE 0 END
        |          AS n_copies
        |      FROM h JOIN e USING (lang)),
        |x AS (SELECT doc_id, lang, n_copies,
        |        UNNEST(generate_series(1, n_copies)) AS copy
        |      FROM n)
        |SELECT doc_id, lang, CAST(n_copies AS BIGINT) AS n_copies, copy
        |FROM x ORDER BY doc_id, copy""".stripMargin,

    "q_pack_tokens" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT lang, n_tok,
        |    CAST(SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
        |                          ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |      AS cum
        |  FROM t)
        |SELECT lang, (cum - n_tok) // 2048 AS bin,
        |  COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS tok_sum
        |FROM c GROUP BY lang, bin ORDER BY lang, bin""".stripMargin,

    // ONE full scan — deliberately NOT the merge: equality proves the
    // merged sufficient statistics reproduce the full recompute.
    "q_agg_incremental" ->
      """WITH t AS (
        |  SELECT source,
        |    CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tok) AS BIGINT) AS tok_sum,
        |  CAST(SUM(n_tok * n_tok) AS BIGINT) AS tok_sumsq,
        |  (1000000 * CAST(SUM(n_tok) AS BIGINT)) // COUNT(*)
        |    AS mean_tok_q
        |FROM t GROUP BY source ORDER BY source""".stripMargin,

    "q_pack_padding" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    LEAST(CAST(LEN(string_split(text, ' ')) AS BIGINT), 256)
        |      AS n_tok
        |  FROM documents),
        |n AS (SELECT lang, n_tok,
        |        ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id)
        |          AS rk
        |      FROM t),
        |s AS (SELECT lang, n_tok,
        |        ROW_NUMBER() OVER (PARTITION BY lang
        |                           ORDER BY n_tok, doc_id) AS rk
        |      FROM t),
        |b AS (
        |  SELECT 'arrival' AS strategy, lang, (rk - 1) // 8 AS batch,
        |         COUNT(*) AS nd, MAX(n_tok) AS mx, SUM(n_tok) AS sm
        |  FROM n GROUP BY lang, batch
        |  UNION ALL
        |  SELECT 'length' AS strategy, lang, (rk - 1) // 8 AS batch,
        |         COUNT(*) AS nd, MAX(n_tok) AS mx, SUM(n_tok) AS sm
        |  FROM s GROUP BY lang, batch)
        |SELECT strategy, lang, COUNT(*) AS n_batches,
        |  CAST(SUM(nd) AS BIGINT) AS n_docs,
        |  CAST(SUM(sm) AS BIGINT) AS tok_sum,
        |  CAST(SUM(nd * mx - sm) AS BIGINT) AS pad_sum,
        |  (1000 * CAST(SUM(nd * mx - sm) AS BIGINT)) //
        |    CAST(SUM(nd * mx) AS BIGINT) AS pad_pm
        |FROM b GROUP BY strategy, lang
        |ORDER BY strategy, lang""".stripMargin,

    "q_text_classifier" ->
      """SELECT doc_id,
        |  CAST(LEN(string_split(text, ' ')) AS INT) AS n_tok,
        |  CAST(COALESCE(list_sum(list_transform(string_split(text, ' '),
        |    t -> ((((ascii(t) * 31 + length(t)) % 64 + 1) * 2654435761
        |           >> 16) % 2001) - 1000)), 0) AS BIGINT) AS score,
        |  CASE WHEN CAST(COALESCE(list_sum(list_transform(
        |    string_split(text, ' '),
        |    t -> ((((ascii(t) * 31 + length(t)) % 64 + 1) * 2654435761
        |           >> 16) % 2001) - 1000)), 0) AS BIGINT) > 0
        |    THEN 1 ELSE 0 END AS kept
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_domain_cap" ->
      """WITH h AS (
        |  SELECT doc_id, source,
        |    ((doc_id % 1048576) * 2654435761 >> 16) AS hs
        |  FROM documents),
        |r AS (SELECT doc_id, source,
        |        ROW_NUMBER() OVER (PARTITION BY source
        |                           ORDER BY hs, doc_id) AS rk
        |      FROM h)
        |SELECT source, COUNT(*) AS n_kept,
        |  CAST(SUM(doc_id) AS BIGINT) AS kept_id_sum
        |FROM r WHERE rk <= 15
        |GROUP BY source ORDER BY source""".stripMargin,

    "q_split_assign" ->
      """WITH h AS (
        |  SELECT doc_id, lang,
        |    ((doc_id % 1048576) * 2654435761 >> 16) % 1000 AS hb
        |  FROM documents),
        |a AS (SELECT doc_id, lang,
        |        CASE WHEN hb < 980 THEN 'train'
        |             WHEN hb < 990 THEN 'valid'
        |             ELSE 'test' END AS split
        |      FROM h)
        |SELECT lang, split, COUNT(*) AS n_docs,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |FROM a GROUP BY lang, split ORDER BY lang, split""".stripMargin,

    // Replays the corpus-derived filter size (smallest power of two ≥
    // 8·n_ref, floor 2^12 — integer comparisons, no log2 float), the
    // shared cms_base fold, and the K=3 Knuth bit positions as a
    // distinct-position membership join (the q_dedup_bloom spelling).
    "q_curation_novelty_bloom" ->
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS w
        |           FROM documents),
        |g AS (SELECT doc_id, source,
        |        UNNEST(CASE WHEN len(w) >= 3 THEN
        |          list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |                         for i in generate_series(1, len(w) - 2)])
        |        ELSE [array_to_string(w, ' ')] END) AS sh
        |      FROM t),
        |refsh AS (SELECT DISTINCT sh FROM g WHERE source = 'src0'),
        |refc AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM refsh),
        |mb AS (SELECT MIN(b) AS bits FROM (VALUES (12),(13),(14),(15),
        |         (16),(17),(18),(19),(20),(21),(22),(23),(24),(25),(26))
        |         v(b) CROSS JOIN refc
        |       WHERE (CAST(1 AS BIGINT) << b) >= 8 * c),
        |mm AS (SELECT CAST(1 AS BIGINT) << bits AS m FROM mb),
        |rb AS (SELECT DISTINCT list_reduce(list_prepend(CAST(0 AS BIGINT),
        |         list_transform(string_split(sh, ''),
        |           c -> CAST(ascii(c) AS BIGINT))),
        |         (h, c) -> (h * 31 + c) % 1048576) AS base
        |       FROM refsh),
        |r AS (SELECT UNNEST([0, 1, 2]) AS r),
        |setpos AS (SELECT DISTINCT
        |             ((base * (2654435761 + r)) >> 16) % (SELECT m FROM mm)
        |               AS p
        |           FROM rb CROSS JOIN r),
        |cb AS (SELECT doc_id, sh,
        |         list_reduce(list_prepend(CAST(0 AS BIGINT),
        |           list_transform(string_split(sh, ''),
        |             c -> CAST(ascii(c) AS BIGINT))),
        |           (h, c) -> (h * 31 + c) % 1048576) AS base
        |       FROM g WHERE source <> 'src0'),
        |probe AS (SELECT doc_id, sh,
        |            ((base * (2654435761 + r)) >> 16) % (SELECT m FROM mm)
        |              AS p
        |          FROM cb CROSS JOIN r),
        |hits AS (SELECT pr.doc_id, pr.sh,
        |           CASE WHEN COUNT(sp.p) = 3 THEN 1 ELSE 0 END AS hit
        |         FROM probe pr LEFT JOIN setpos sp ON sp.p = pr.p
        |         GROUP BY pr.doc_id, pr.sh)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh,
        |  CAST(SUM(1 - hit) AS BIGINT) AS n_novel_bloom,
        |  (1000 * CAST(SUM(1 - hit) AS BIGINT))
        |    // CAST(COUNT(*) AS BIGINT) AS novelty_bloom_pm
        |FROM hits GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Standard pairs CTE block for the exclusion, the shared batch hash
    // for assignment, and the same null-flag conditional counting.
    "q_sample_negatives" ->
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
        |b AS (SELECT doc_id,
        |        ((doc_id % 1048576) * 2654435761 >> 16) % 4 AS batch
        |      FROM documents),
        |cand AS (SELECT x.batch, x.doc_id AS doc_a, y.doc_id AS doc_b
        |         FROM b x JOIN b y
        |           ON x.batch = y.batch AND x.doc_id < y.doc_id),
        |f AS (SELECT c.batch, c.doc_a, c.doc_b,
        |        EXISTS (SELECT 1 FROM pairs p
        |                WHERE p.doc_a = c.doc_a AND p.doc_b = c.doc_b)
        |          AS dup
        |      FROM cand c),
        |agg AS (SELECT batch,
        |          CAST(COUNT(*) FILTER (WHERE NOT dup) AS BIGINT)
        |            AS n_neg_pairs,
        |          CAST(COUNT(*) FILTER (WHERE dup) AS BIGINT)
        |            AS n_excluded,
        |          CAST(SUM(CASE WHEN NOT dup
        |                   THEN doc_a * 100003 + doc_b ELSE 0 END)
        |            AS BIGINT) AS pair_digest
        |        FROM f GROUP BY batch),
        |sz AS (SELECT batch, COUNT(*) AS n_docs FROM b GROUP BY batch)
        |SELECT a.batch, s.n_docs, a.n_neg_pairs, a.n_excluded,
        |       a.pair_digest
        |FROM agg a JOIN sz s USING (batch)
        |ORDER BY a.batch""".stripMargin,

    // Same cluster-label CTE block as the q_dedup_clusters oracle, then
    // the split is the shared hash arithmetic applied to keep_id.
    "q_split_leakage" ->
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
        |  ) SELECT id, MIN(lbl) AS keep_id FROM reach GROUP BY id),
        |h AS (SELECT id AS doc_id, keep_id,
        |        ((keep_id % 1048576) * 2654435761 >> 16) % 1000 AS hb
        |      FROM rec)
        |SELECT doc_id, keep_id,
        |  CASE WHEN hb < 800 THEN 'train'
        |       WHEN hb < 900 THEN 'valid' ELSE 'test' END AS split
        |FROM h ORDER BY doc_id""".stripMargin,

    // Rides TextAnalysis.LmScoreCtes so the LM derivation has exactly
    // one SQL replica (shared-kernel discipline).
    "q_mix_ccnet" ->
      (s"WITH ${TextAnalysis.LmScoreCtes},\n" +
        """dl AS (SELECT d.doc_id, d.lang,
          |         CAST(lm.score_q AS DOUBLE)
          |           / CAST(lm.n_bigrams AS DOUBLE) AS avg_lp
          |       FROM documents d JOIN lm ON lm.doc_id = d.doc_id),
          |b AS (SELECT lang, doc_id,
          |        NTILE(3) OVER (PARTITION BY lang
          |                       ORDER BY avg_lp DESC, doc_id) AS bucket
          |      FROM dl)
          |SELECT lang, bucket, COUNT(*) AS n_docs,
          |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
          |FROM b GROUP BY lang, bucket
          |ORDER BY lang, bucket""".stripMargin),

    "q_curation_dsir" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, UNNEST(string_split(text, ' ')) AS t
        |  FROM documents),
        |bk AS (SELECT doc_id, lang,
        |         (ascii(t) * 31 + length(t)) % 64 AS b FROM tok),
        |st AS (SELECT b, COUNT(*) AS n_r,
        |         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS n_t
        |       FROM bk GROUP BY b),
        |spine AS (SELECT UNNEST(generate_series(0, 63)) AS b),
        |f AS (SELECT spine.b, COALESCE(st.n_r, 0) AS n_r,
        |        COALESCE(st.n_t, 0) AS n_t
        |      FROM spine LEFT JOIN st USING (b)),
        |tot AS (SELECT CAST(SUM(n_r) AS BIGINT) AS nr,
        |          CAST(SUM(n_t) AS BIGINT) AS nt FROM f),
        |w AS (SELECT b,
        |        CAST(FLOOR(LN(
        |          (CAST(n_t + 1 AS DOUBLE) * CAST(nr + 64 AS DOUBLE)) /
        |          (CAST(n_r + 1 AS DOUBLE) * CAST(nt + 64 AS DOUBLE)))
        |          * 1e6) AS BIGINT) AS lw
        |      FROM f CROSS JOIN tot),
        |lwl AS (SELECT LIST(lw ORDER BY b) AS lws FROM w),
        |sc AS (SELECT doc_id, lang,
        |         CAST(COALESCE(list_sum(list_transform(
        |           string_split(text, ' '),
        |           t -> lws[((ascii(t) * 31 + length(t)) % 64) + 1])), 0)
        |           AS BIGINT) AS score
        |       FROM documents CROSS JOIN lwl),
        |sel AS (SELECT doc_id, lang, score FROM sc
        |        ORDER BY score DESC, doc_id LIMIT 200)
        |SELECT doc_id, lang, score FROM sel ORDER BY doc_id""".stripMargin,

    "q_pii_scrub" ->
      """WITH a AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN
        |           text || ' contact user' || CAST(doc_id AS VARCHAR)
        |                || '@example.com now'
        |         WHEN doc_id % 3 = 1 THEN
        |           text || ' call 555-'
        |                || CAST(1000 + doc_id % 9000 AS VARCHAR)
        |         ELSE text END AS aug
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(LEN(regexp_extract_all(aug,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS INT)
        |    AS n_emails,
        |  CAST(LEN(regexp_extract_all(aug, '555-[0-9]{4}')) AS INT)
        |    AS n_phones,
        |  SHA256(regexp_replace(regexp_replace(aug,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>',
        |    'g'), '555-[0-9]{4}', '<PHONE>', 'g')) AS scrubbed_digest
        |FROM a ORDER BY doc_id""".stripMargin,

    // Replays the integer water-filling derivation step for step: same
    // ascending sort, same prefix sums, same first-fitting-rank rule.
    "q_mix_waterfill" ->
      """WITH a AS (SELECT source,
        |             SUM(len(string_split(text, ' '))) AS avail
        |           FROM documents GROUP BY source),
        |tot AS (SELECT SUM(avail) AS tot, COUNT(*) AS k,
        |          MAX(avail) AS mx FROM a),
        |j AS (SELECT a.source, a.avail, (tot.tot * 3) // 5 AS budget,
        |        tot.k,
        |        ROW_NUMBER() OVER (ORDER BY a.avail, a.source) AS rn,
        |        COALESCE(SUM(a.avail) OVER (ORDER BY a.avail, a.source
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS prev
        |      FROM a CROSS JOIN tot),
        |t AS (SELECT MIN_BY((budget - prev) // (k - rn + 1), rn) AS t0
        |      FROM j WHERE (budget - prev) // (k - rn + 1) <= avail),
        |f AS (SELECT a.source, a.avail,
        |        LEAST(a.avail, COALESCE(t.t0, tot.mx)) AS alloc
        |      FROM a CROSS JOIN t CROSS JOIN tot)
        |SELECT source, CAST(avail AS BIGINT) AS avail,
        |  CAST(alloc AS BIGINT) AS alloc,
        |  CAST((1000 * alloc) // avail AS BIGINT) AS rate_pm
        |FROM f ORDER BY source""".stripMargin,

    // quantile_cont interpolates lo + (hi-lo)·frac with frac ∈
    // {0, ¼, ½, ¾} over integers — the same exact doubles Spark's
    // percentile() produces.
    "q_text_robust_scale" ->
      """WITH t AS (SELECT doc_id, source,
        |             CAST(len(string_split(text, ' ')) AS BIGINT)
        |               AS n_tok
        |           FROM documents),
        |q AS (SELECT source,
        |        quantile_cont(n_tok, 0.25) AS q1,
        |        quantile_cont(n_tok, 0.5) AS med,
        |        quantile_cont(n_tok, 0.75) AS q3
        |      FROM t GROUP BY source)
        |SELECT t.doc_id, t.source, t.n_tok,
        |  CAST(CASE WHEN q.q3 > q.q1 THEN
        |         FLOOR(1000.0 * (t.n_tok - q.med) / (q.q3 - q.q1))
        |       ELSE 0 END AS BIGINT) AS rz_pm
        |FROM t JOIN q USING (source)
        |ORDER BY t.doc_id""".stripMargin
  )
}
