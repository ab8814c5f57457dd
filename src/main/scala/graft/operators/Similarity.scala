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

  /** Element-wise product of two double arrays. */
  private def zipProd(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => x * y)

  /** Order-independent sum of a double array via exact decimal fold
    * (keeps the DuckDB oracle hash-identical; see QueryDefs). */
  private def decSum(arr: Column): Column =
    aggregate(arr, lit(0).cast("decimal(30,12)"),
      (acc, x) => (acc + x.cast("decimal(30,12)")).cast("decimal(30,12)"))

  private def exactCos(va: Column, vb: Column): Column =
    decSum(zipProd(va, vb)).cast("double") /
      sqrt(decSum(zipProd(va, va)).cast("double") *
           decSum(zipProd(vb, vb)).cast("double"))

  /** Deterministic ±1 hyperplane weights for SRP-LSH: plane p, dim j.
    * Knuth multiplicative hash of (p*64+j) — fixed, reproducible (and
    * re-computable in plain SQL, which is how the q_dedup_embedding_lsh
    * oracle derives the identical hyperplanes engine-independently). */
  private[operators] def planeWeightD(p: Int, j: Int): Double = {
    val h = ((p * 64 + j) * 2654435761L) >>> 16
    if ((h & 1L) == 0L) 1.0 else -1.0
  }

  private def planeWeight(p: Int, j: Int): Float = planeWeightD(p, j).toFloat

  val defs: Map[String, Q] = Map(

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
    // path is bucket-partitioned storage + multi-probe.
    "q_sim_ann_lsh" -> ((s, d) => {
      val planes = typedLit(
        Seq.tabulate(16)(p => Seq.tabulate(64)(j => planeWeight(p, j))))
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"), planes.as("planes"))
        .withColumn("bucket", expr(
          """aggregate(sequence(0, 15), CAST(0 AS BIGINT), (acc, p) ->
            |  acc * 2 + CAST(
            |    aggregate(zip_with(embedding, element_at(planes, p + 1),
            |                       (x, w) -> x * w),
            |              CAST(0.0 AS DOUBLE), (a, x) -> a + x) > 0
            |    AS BIGINT))""".stripMargin))
        .drop("planes")
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

    // IVF-style ANN: coarse-quantize to the nearest of 8 seed centroids
    // (vec_id 3..10 double as centroids), probe only the query's cell.
    // Approximate → rows-only. At scale the cell id is the partition key
    // and centroids come from a sampled k-means; the probe reads 1/cells
    // of the corpus.
    "q_sim_ann_ivf" -> ((s, d) => {
      val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val cent = e.where(col("vec_id").between(3, 10))
        .select(col("vec_id").as("cent_id"), col("embedding").as("cv"))
      val assigned = e.as("v").join(broadcast(cent))
        .select(col("vec_id"), col("embedding"), col("cent_id"),
          cosine_sim(col("embedding"), col("cv")).as("sim"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("vec_id"))
            .orderBy(col("sim").desc, col("cent_id"))))
        .where(col("rn") === 1)
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

  val oracles: Map[String, String] = Map(
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
