package graft

import org.apache.spark.sql.functions._

/** Exact-equivalence twin for the round-8 minhash signature
  * restatement (the KnnDescentSpec pattern): the production pass
  * hashes each DISTINCT shingle once on the family-shared basket
  * relation and explodes the doc arrays after, where the naive shape
  * hashes every (doc, shingle) POSTING. On any corpus where the
  * df≤DfCap universe covers all postings (true of every fixture —
  * max df ≈ 25), the per-doc 16-minimum signatures must be BITWISE
  * identical: a shingle's md5 slices don't depend on which doc
  * carries it, and min over a multiset ignores multiplicity. The
  * naive twin below is the old implementation inlined, so a future
  * edit to the production path is checked against the definition,
  * not against itself.
  */
class MinhashTwinSpec extends SparkSpec {

  test("per-distinct-shingle signatures == per-posting signatures") {
    val sh = operators.LlmPipeline.shingleBase(spark, sfDir)

    // naive twin: the pre-round-8 per-posting shape
    val naiveHashed = sh
      .withColumn("d0", md5(concat(lit("100:"), col("shingle"))))
      .withColumn("d1", md5(concat(lit("101:"), col("shingle"))))
      .withColumn("d2", md5(concat(lit("102:"), col("shingle"))))
      .withColumn("d3", md5(concat(lit("103:"), col("shingle"))))
    val naiveAggs = (0 until 16).map { s =>
      min(expr(s"cast(conv(substring(d${s / 4}, ${s % 4 * 8 + 1}, 8), 16, 10) as bigint)"))
        .as(s"mh$s")
    }
    val naive = naiveHashed.groupBy("doc_id").agg(naiveAggs.head, naiveAggs.tail: _*)

    // production shape: hash the basket relation, explode docs after
    val prodHashed = operators.LlmPipeline.shingleBaskets(spark, sfDir)
      .withColumn("d0", md5(concat(lit("100:"), col("shingle"))))
      .withColumn("d1", md5(concat(lit("101:"), col("shingle"))))
      .withColumn("d2", md5(concat(lit("102:"), col("shingle"))))
      .withColumn("d3", md5(concat(lit("103:"), col("shingle"))))
      .select(col("docs"), array((0 until 16).map { s =>
        expr(s"cast(conv(substring(d${s / 4}, ${s % 4 * 8 + 1}, 8), 16, 10) as bigint)")
      }: _*).as("mhs"))
    val prodAggs = (0 until 16).map { s =>
      min(element_at(col("mhs"), s + 1)).as(s"mh$s")
    }
    val prod = prodHashed.select(explode(col("docs")).as("doc_id"), col("mhs"))
      .groupBy("doc_id").agg(prodAggs.head, prodAggs.tail: _*)

    val nDocs = naive.count()
    assert(nDocs > 0)
    assert(prod.count() === nDocs,
      "signature universes differ — the df cap binds on this fixture " +
        "(twin comparison only holds where it doesn't)")
    assert(naive.exceptAll(prod).isEmpty && prod.exceptAll(naive).isEmpty,
      "per-distinct-shingle minhash signatures diverge from the " +
        "per-posting definition")
  }
}
