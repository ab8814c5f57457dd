package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared plumbing for the query library.
  *
  * Every query in the library is a `(SparkSession, sfDir) => DataFrame`
  * paired (where DuckDB can express it) with an ANSI-SQL oracle twin that
  * the driver runs on the same Parquet files. Two cross-engine hazards are
  * handled centrally here:
  *
  *  1. Floating-point aggregation order. Spark sums doubles in partition /
  *     shuffle order, DuckDB in file order; the last ulp differs. Any sum
  *     or avg over a double column goes through [[dsum]]/[[davg]], which
  *     casts to an exact decimal first (associative, order-independent)
  *     and casts the final result back to double so both engines emit the
  *     identical bit pattern. Exact types (ints, counts, min/max) need no
  *     treatment.
  *  2. Row order. The driver hash-compares results, so every query ends in
  *     a total ORDER BY over a unique key, spelled identically in the
  *     oracle SQL (with explicit NULLS FIRST to match Spark's ASC default).
  */
object QueryDefs {
  type Q = (SparkSession, String) => DataFrame

  /** Decimal wide enough for sf0.1 sums of prices (~1e10) at 4dp. */
  private val Dec = DecimalType(30, 4)

  /** Order-independent sum of a double column: exact decimal accumulate,
    * double out. Oracle twin: CAST(SUM(CAST(x AS DECIMAL(30,4))) AS DOUBLE). */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** Order-independent mean: decimal sum cast to double, then ONE double
    * division (decimal division would round at scale 6 and drift from the
    * oracle). Oracle twin:
    * CAST(SUM(CAST(x AS DECIMAL(30,4))) AS DOUBLE) / COUNT(*). */
  def davg(c: Column): Column =
    sum(c.cast(Dec)).cast("double") / count(c)
}
