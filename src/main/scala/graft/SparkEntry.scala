package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.QueryDefs.Q

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query library itself lives in `graft.queries.*` (one object per
  * operator family, mirroring SURVEY.md §2's inventory); this object only
  * aggregates the maps the driver consumes.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Reference shape: `SELECT * FROM '<file>' WHERE ke > 0.5`
    * (/root/reference/main.cc:164-169) with `l_extendedprice` standing in
    * for `ke` (FIXTURES.md). */
  def entry(spark: SparkSession): DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .where(col("l_extendedprice") > lit(0.5))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, Q] =
    graft.queries.Relational.defs ++
      graft.queries.Extended.defs ++
      graft.queries.Reshape.defs ++
      graft.operators.Dedup.defs ++
      graft.operators.Similarity.defs ++
      graft.operators.TextAnalysis.defs ++
      graft.operators.Multimodal.defs ++
      graft.operators.Curation.defs ++
      graft.operators.Bpe.defs ++
      graft.operators.UnigramLm.defs ++
      graft.operators.SubstringDedup.defs ++
      graft.streaming.EventStreams.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check
    * (used for ops DuckDB can't express identically, e.g. engine-specific
    * hashes or approximate ANN). */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.Extended.oracles ++
      graft.queries.Reshape.oracles ++
      graft.operators.Dedup.oracles ++
      graft.operators.Similarity.oracles ++
      graft.operators.TextAnalysis.oracles ++
      graft.operators.Multimodal.oracles ++
      graft.operators.Curation.oracles ++
      graft.operators.Bpe.oracles ++
      graft.operators.UnigramLm.oracles ++
      graft.operators.SubstringDedup.oracles ++
      graft.streaming.EventStreams.oracles
}
