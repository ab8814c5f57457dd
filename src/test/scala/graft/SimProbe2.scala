package graft
import org.apache.spark.sql.functions._
object SimProbe2 extends App {
  val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf
  val docs = graft.sources.Tables.documents(spark, sf)
  val sh = docs.select(col("doc_id"), expr(
    """CASE WHEN size(split(text, ' ')) >= 3 THEN
      |  array_distinct(transform(sequence(1, size(split(text, ' ')) - 2),
      |    i -> concat_ws(' ', element_at(split(text, ' '), i),
      |      element_at(split(text, ' '), i + 1),
      |      element_at(split(text, ' '), i + 2))))
      |ELSE array(text) END""".stripMargin).as("toks"))
  val sims = sh.select(col("doc_id"), expr(
    """aggregate(sequence(0, 63), CAST(0 AS BIGINT), (acc, i) ->
      |  acc + shiftleft(CAST(
      |    aggregate(toks, 0,
      |      (v, t) -> v + CAST(shiftright(xxhash64(t), i) & 1 AS INT) * 2 - 1)
      |    > 0 AS BIGINT), i))""".stripMargin).as("simhash"))
  val exact = SparkEntry.queries("q_dedup_ngram_jaccard")(spark, sf)
  val j = exact.as("p")
    .join(sims.as("x"), col("p.doc_a") === col("x.doc_id"))
    .join(sims.as("y"), col("p.doc_b") === col("y.doc_id"))
    .select(expr("bit_count(x.simhash ^ y.simhash)").as("ham"))
  j.summary("min","max","50%").show()
  // background pair hamming distribution (sample)
  val bg = sims.as("a").join(sims.as("b"), col("a.doc_id") < col("b.doc_id"))
    .where(col("a.doc_id") % 10 === 0)
    .select(expr("bit_count(a.simhash ^ b.simhash)").as("ham"))
  bg.summary("min","1%","5%","50%").show()
  spark.stop()
}
