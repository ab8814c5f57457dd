package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table catalog over the driver-provided Parquet fixtures.
  *
  * The reference's data model is "a file is a table": queries are issued
  * directly against a file path (`SELECT * FROM '<file>'`,
  * /root/reference/main.cc:164-169). We mirror that with schema-on-read
  * Parquet loads — no metastore, no CREATE TABLE. Each call builds a fresh
  * logical scan node; Catalyst prunes columns and pushes filters into the
  * Parquet reader, so repeated `load` calls cost nothing until an action.
  *
  * Scale note (100 TB): `spark.read.parquet(dir)` plans one task per file
  * split (<= spark.sql.files.maxPartitionBytes), so the same code fans out
  * to thousands of executor tasks on a real cluster. Nothing here collects
  * to the driver.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `load(spark, dir, "lineitem")` == scan of `<dir>/lineitem.parquet`. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")

  /** `events.ts` is parquet TIMESTAMP(MICROS, isAdjustedToUTC=false),
    * which Spark 4 infers as TIMESTAMP_NTZ. Normalize to session-local
    * TimestampType (sessions here pin UTC, so the wall values are the
    * epoch micros unchanged): event-time streaming (watermarks, window())
    * and the batch window frames all operate on TimestampType, and DuckDB
    * reads the same column as its naive TIMESTAMP — identical values on
    * both sides of the oracle compare. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    import org.apache.spark.sql.functions._
    raw.withColumn("ts", col("ts").cast("timestamp"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every fixture as a temp view so `spark.sql` queries can use
    * bare table names (the same names the DuckDB oracle uses). `events`
    * goes through its nanos-normalizing loader. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
