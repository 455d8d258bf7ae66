package graft

import org.apache.spark.sql.functions._

/** Known-answer micro-tests for the text-analysis primitives. */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tf-idf: a corpus-unique term outranks ubiquitous terms") {
    val docs = Seq(
      (1L, "alpha beta beta"),
      (2L, "alpha gamma"),
      (3L, "alpha delta")).toDF("doc_id", "text")
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df_ = toks.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.count().toDouble
    val top = tf.join(df_, "term")
      .withColumn("tfidf", col("tf") * log(lit(n) / col("df")))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("tfidf").desc, col("term"))))
      .filter(col("rk") === 1)
      .orderBy("doc_id").collect()
    // 'alpha' appears everywhere -> idf 0; the unique terms win
    assert(top.map(_.getString(0)).toSeq === Seq("beta", "gamma", "delta"))
  }

  test("langid lexicon vote: marker hits decide, ties break by lexicon name") {
    val toks = Seq((1L, "join"), (1L, "scan")).toDF("doc_id", "tok")
    val lex = Map("lx_join" -> Seq("join"), "lx_scan" -> Seq("scan"))
    val scored = lex.toSeq.sortBy(_._1).map { case (name, words) =>
      toks.groupBy("doc_id")
        .agg(sum(when(col("tok").isin(words: _*), 1L).otherwise(0L)).as("score"))
        .withColumn("lx", lit(name))
    }.reduce(_ unionByName _)
    val winner = scored.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("score").desc, col("lx"))))
      .filter(col("rk") === 1).head()
    assert(winner.getAs[String]("lx") === "lx_join") // tie -> lexicographic
  }

  test("BPE-ish regex tokenizer splits alpha runs, digit runs, symbols") {
    val r = Seq("ab12 cd-ef").toDF("text")
      .select(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)").as("t"))
      .head().getAs[scala.collection.Seq[String]]("t")
    assert(r.toList === List("ab", "12", "cd", "-", "ef"))
  }

  test("quality band: in-range token counts score the 0.4 band") {
    val q = operators.LlmPipeline.queries.find(_.id == "text_quality").get
      .fn(spark, sfDir)
    val inBand = q.filter(col("n_tok").between(20, 80))
      .filter(col("quality_e6") < 400000L)
    assert(inBand.count() === 0) // band floor respected
  }

  test("bm25: top-10 docs all contain a query term, ranks total-ordered") {
    val top = operators.LlmPipeline.queries.find(_.id == "text_bm25").get
      .fn(spark, sfDir)
    val rows = top.collect()
    assert(rows.length === 10)
    assert(rows.map(_.getAs[Int]("rk").toLong).toSeq === (1L to 10L))
    assert(rows.forall(_.getLong(2) > 0L)) // +1-form idf keeps scores positive
    val docs = sources.Tables.documents(spark, sfDir)
      .filter(col("doc_id").isin(rows.map(r => r.getLong(1)): _*))
      .filter(!col("text").rlike("\\b(spark|hash|join)\\b"))
    assert(docs.count() === 0)
  }

  test("bm25 favors higher tf at equal length, penalizes longer docs at equal tf") {
    import spark.implicits._
    // same shape as the operator's scoring: direct formula micro-check
    val k1 = 1.2; val b = 0.75
    def w(tf: Double, dl: Double, avgdl: Double, idf: Double) =
      idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
    assert(w(3, 50, 50, 1.0) > w(1, 50, 50, 1.0))
    assert(w(2, 100, 50, 1.0) < w(2, 25, 50, 1.0))
  }
}
