package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.QueryDefs.Q
import graft.sources.Tables
import graft.functions.VectorFunctions.cosine_sim

/** Similarity search over the `embeddings` fixture (vector column
  * `array<float>`, dim 64 — FIXTURES.md).
  *
  * Two paths, mirroring what a 100 TB corpus needs:
  *  - brute-force cosine top-k: the correctness baseline. The query set is
  *    broadcast; the corpus side streams through a whole-stage-codegen'd
  *    cosine (custom Catalyst expression) — one scan, no shuffle except
  *    the final per-query top-k (TakeOrdered-sized, k×|queries| rows).
  *  - SRP-LSH (signed-random-projection) bucketed ANN: corpus is hashed
  *    once into 16-bit sign buckets; a query only scans its own bucket.
  *    At scale the bucket id becomes the partition key, so a lookup reads
  *    ~1/65536 of the data; recall is tunable via bands/probes.
  */
object Similarity {

  /** Decimal-exact cosine (order-independent, DuckDB-hash-identical) via
    * the compiled DecimalDotProduct expression — same arithmetic as the
    * SQL decimal fold, without interpreted per-element lambdas. */
  private def exactCos(va: Column, vb: Column): Column = {
    import graft.functions.VectorFunctions.decimal_dot
    decimal_dot(va, vb).cast("double") /
      sqrt(decimal_dot(va, va).cast("double") *
           decimal_dot(vb, vb).cast("double"))
  }

  /** Deterministic ±1 hyperplane weights for SRP-LSH — canonical impl in
    * [[graft.functions.SrpBandKeys.weight]]; re-computable in plain SQL,
    * which is how the q_dedup_embedding_lsh oracle derives the identical
    * hyperplanes engine-independently. */
  private[operators] def planeWeightD(p: Int, j: Int): Double =
    graft.functions.SrpBandKeys.weight(p, j)

  val defs: Map[String, Q] = centroidDefs ++ Map(

    // Brute-force k-NN, decimal-exact scores (oracle-checked): queries =
    // vec_id < 3, k = 5, ties broken by neighbor id.
    "q_sim_cosine_topk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val q = e.where(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val scored = e.where(col("vec_id") >= 3).as("c")
        .join(broadcast(q))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          exactCos(col("qv"), col("v")).as("cos"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      scored.withColumn("rn", row_number().over(w))
        .where(col("rn") <= 5)
        .orderBy(col("query_id"), col("rn"))
    }),

    // SRP-LSH ANN: 16 sign-bits bucket per vector; query scans only its
    // bucket, then re-ranks with the codegen'd cosine. Approximate (no
    // oracle → rows-only): recall depends on bucket collisions; the scale
    // path is bucket-partitioned storage + multi-probe. The bucket is the
    // compiled SrpBandKeys expression (1 band × 16 bits) — the HOF-lambda
    // spelling of the same hash ran interpreted per element.
    "q_sim_ann_lsh" -> ((s, d) => {
      import graft.functions.VectorFunctions.srp_band_keys
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"))
        .withColumn("bucket", element_at(
          srp_band_keys(col("embedding").cast("array<double>"), 1, 16), 1))
      val q = e.where(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
          col("bucket"))
      val cand = e.where(col("vec_id") >= 3)
        .join(q, Seq("bucket"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          cosine_sim(col("qe"), col("embedding")).as("cos"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      cand.withColumn("rn", row_number().over(w))
        .where(col("rn") <= 5)
        .orderBy(col("query_id"), col("rn"))
    }),

    // IVF-style ANN: coarse-quantize to the nearest of 8 centroids from a
    // real (if short) Lloyd's k-means — deterministic seeds (vec_id 3..10)
    // refined by 2 assign/recompute rounds — then probe only the query's
    // cell. Approximate → rows-only. The k-means itself is the scale
    // shape: assignment is a broadcast join + codegen'd cosine over one
    // corpus scan, and the centroid update reuses the no-explode
    // 64-sums-in-one-groupBy trick of q_sim_centroids (only 8×64 doubles
    // ever return to the driver-side plan as the next broadcast). At
    // 100 TB you'd run it on a sample; the fixture IS sample-sized.
    "q_sim_ann_ivf" -> ((s, d) => {
      val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
        .withColumn("v", col("embedding").cast("array<double>"))
      def nearest(cents: DataFrame): DataFrame =
        e.join(broadcast(cents))
          .select(col("vec_id"), col("embedding"), col("v"), col("cent_id"),
            cosine_sim(col("v"), col("cv")).as("sim"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("vec_id"))
              .orderBy(col("sim").desc, col("cent_id"))))
          .where(col("rn") === 1)
      var cents = e.where(col("vec_id").between(3, 10))
        .select(col("vec_id").as("cent_id"), col("v").as("cv"))
      for (_ <- 1 to 2) {
        val sums = (0 until 64).map(i =>
          sum(element_at(col("v"), i + 1)).as(s"s$i"))
        val counts = nearest(cents).groupBy(col("cent_id"))
          .agg(sums.head, (sums.tail :+ count(lit(1)).as("n")): _*)
        cents = counts.select(col("cent_id"),
          array((0 until 64).map(i => col(s"s$i") / col("n")): _*).as("cv"))
      }
      val assigned = nearest(cents)
        .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"))
      val q = assigned.where(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
          col("cell"))
      val cand = assigned.where(col("vec_id") >= 3)
        .join(q, Seq("cell"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          cosine_sim(col("qe"), col("embedding")).as("cos"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      cand.withColumn("rn", row_number().over(w))
        .where(col("rn") <= 5)
        .orderBy(col("query_id"), col("rn"))
    })
  )

  /** Per-label embedding centroids — the vector-aggregate primitive that
    * IVF/k-means coarse quantization is built from. Spark-first shape:
    * ONE groupBy carrying 64 codegen'd decimal sums (the same no-explode
    * trick as the MinHash signature — element_at projections fold into
    * map-side partial aggregation, so the shuffle moves only per-partition
    * partials, never the exploded (row × dim) table, and never the raw
    * vectors). Sums stay decimal-exact (merge-order-independent), and the
    * emitted centroid is a 1e-6-quantized joined string: result columns
    * must never be array-typed (driver comparator), and sums rather than
    * means are emitted because decimal division rounding differs between
    * engines while the sums are bit-reproducible. */
  private def centroidDefs: Map[String, Q] = Map(
    "q_sim_centroids" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("label"), col("embedding").cast("array<double>").as("v"))
      val sums = (0 until 64).map(i =>
        sum(element_at(col("v"), i + 1).cast("decimal(30,12)")).as(s"s$i"))
      val quant = (0 until 64).map(i =>
        floor(col(s"s$i").cast("double") * 1e6).cast("long").cast("string"))
      e.groupBy(col("label"))
        .agg(sums.head, (sums.tail :+ count(lit(1)).as("n")): _*)
        .select(col("label"), col("n"),
          concat_ws("|", quant: _*).as("centroid_sum_q"))
        .orderBy(col("label"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_sim_centroids" ->
      """WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |x AS (SELECT label, i,
        |        SUM(CAST(v[i] AS DECIMAL(30,12))) AS s
        |      FROM e CROSS JOIN generate_series(1, 64) AS t(i)
        |      GROUP BY label, i),
        |c AS (SELECT label,
        |        STRING_AGG(CAST(CAST(FLOOR(CAST(s AS DOUBLE) * 1e6)
        |            AS BIGINT) AS VARCHAR), '|' ORDER BY i)
        |          AS centroid_sum_q
        |      FROM x GROUP BY label),
        |n AS (SELECT label, COUNT(*) AS n FROM e GROUP BY label)
        |SELECT c.label, n.n, c.centroid_sum_q
        |FROM c JOIN n USING (label) ORDER BY c.label""".stripMargin,

    "q_sim_cosine_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, v,
        |        (SELECT CAST(SUM(CAST(x * x AS DECIMAL(30,12))) AS DOUBLE)
        |         FROM UNNEST(v) AS t(x)) AS nsq
        |      FROM e),
        |s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |        (SELECT CAST(SUM(CAST(q.v[i] * c.v[i] AS DECIMAL(30,12)))
        |                AS DOUBLE)
        |         FROM generate_series(1, 64) AS t(i))
        |          / SQRT(q.nsq * c.nsq) AS cos
        |      FROM n q JOIN n c ON q.vec_id < 3 AND c.vec_id >= 3),
        |r AS (SELECT query_id, neighbor_id, cos,
        |        ROW_NUMBER() OVER (PARTITION BY query_id
        |                           ORDER BY cos DESC, neighbor_id) AS rn
        |      FROM s)
        |SELECT query_id, neighbor_id, cos, rn FROM r
        |WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin
  )
}
