package graft

import org.apache.spark.sql.functions._

/** Edge-case lock for text_repetition: documents below the 3-token
  * shingle width (the `greatest(size - 2, 1)` partial-gram convention
  * shared with shingles()), a fully self-repeating doc, and a
  * repetition-free doc, each against hand-computed values.
  */
class TextRepetitionSpec extends SparkSpec {

  test("intra-doc duplicated-3-gram fractions match hand-computed values") {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files.createTempDirectory("graft_rep").toString
    val rows = Seq(
      (1L, "a"),                   // 1 token  -> one partial gram, no dup
      (2L, "a b"),                 // 2 tokens -> one partial gram, no dup
      (3L, "x y z x y z x y z"),   // 9 tokens -> all 7 grams duplicated
      (4L, "p q r s")              // 4 tokens -> 2 distinct grams
    )
    spark.createDataFrame(rows).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.LlmPipeline.textRepetition(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq === Seq(
      (1L, 1L, 0L, false),
      (2L, 1L, 0L, false),
      (3L, 7L, 1000000L, true),
      (4L, 2L, 0L, false)))
  }
}
