package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst table-generating function (UDTF): word n-grams of a
  * string column with their positions, one output row per n-gram. The
  * third leg of the extension surface next to the scalar expressions
  * (CosineSimilarity &c.) and the native aggregates (CountMinAgg,
  * BloomFilterAgg, SimHashAgg): a `Generator` plugs into Catalyst's
  * `Generate` operator exactly like `explode`/`posexplode`, so it
  * composes with LATERAL VIEW, gets column pruning above it, and runs
  * inside the scan stage — unlike the flatMap/DataFrame detour
  * (explode over a transform'd array), it never materializes the
  * intermediate n-gram ARRAY per row, streaming one n-gram at a time
  * into the consumer.
  *
  * Texts shorter than `n` words emit a single row: the whole text at
  * position 0 (the [[graft.operators.Dedup]] shingle guard, and equal
  * to a clamped array slice — which is how the DuckDB oracle spells
  * it). CodegenFallback: GenerateExec evaluates non-codegen generators
  * row-by-row; the O(words) loop inside is JIT'd.
  */
case class WordNgramsGenerator(child: Expression, n: Int)
    extends Generator with CodegenFallback {
  require(n >= 1, "n-gram size must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))
  override def prettyName: String = "word_ngrams"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val words = v.asInstanceOf[UTF8String].toString.split(" ", -1)
      if (words.length < n) {
        InternalRow(0, UTF8String.fromString(words.mkString(" "))) :: Nil
      } else {
        (0 to words.length - n).map { i =>
          InternalRow(i,
            UTF8String.fromString(words.slice(i, i + n).mkString(" ")))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

object WordNgramsGenerator {
  /** Generator Column: `df.select(col("id"), word_ngrams(col("text"), 3))`
    * expands to (pos, ngram) rows via Catalyst's Generate. */
  def word_ngrams(c: Column, n: Int): Column =
    Bridge.column(WordNgramsGenerator(Bridge.expression(c), n))
}
