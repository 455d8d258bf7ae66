package graft

import org.apache.spark.sql.functions._

/** Known-answer tests for the LLM-pipeline primitives on hand-built
  * micro-corpora (near-dup pairs by construction, orthogonal vectors,
  * reordered tokens).
  */
class LlmPipelineSpec extends SparkSpec {
  import spark.implicits._

  // Beam parameters chosen by measurement (graft.RecallProbe, round 5):
  // k=12/rounds=4/beam=48/hops=8 recovers 0.98 / 0.98 / 0.91 of the
  // exact top-5 at sf0.001 / 0.01 / 0.1 — ≥ 0.85 with margin at every
  // fixture. The r4 contract (k=8/rounds=3/beam=24/hops=6, floor 0.6)
  // measured 0.59 at sf0.1: below its own floor at the one scale the
  // suite never ran. The fixtures are UNIFORM-RANDOM embeddings — the
  // worst case for a neighborhood-descent graph (neighbor-of-neighbor
  // carries no metric signal beyond sampling, so the graph is closest
  // to an expander and beam search closest to blind walk); clustered
  // real-corpus embeddings only raise these numbers. Serve cost is
  // O(beam · k · hops) candidate rows per query batch — parameter
  // changes scale the batched joins, never the corpus term.
  test("kNN-graph beam search recovers the exact neighbors (serve path)") {
    import graft.functions.VectorExprs
    val dir = sfDir
    val nQ = 20
    val got = operators.LlmPipeline
      .knnGraphSearch(spark, dir, k = 12, rounds = 4, beam = 48, hops = 8, nQ = nQ)
    val ev = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("n", VectorExprs.l2(col("v")))
    val exact = ev.as("q").filter(col("q.vec_id") < nQ)
      .join(ev.as("c"), col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("qid"), col("c.vec_id").as("cid"),
        (VectorExprs.dot(col("q.v"), col("c.v")) / (col("q.n") * col("c.n"))).as("cos"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("cos").desc, col("cid"))))
      .filter(col("rk") <= 5)
    val hits = exact.join(got.select(col("qid"), col("cid")),
      Seq("qid", "cid"), "leftsemi").count()
    assert(hits >= (nQ * 5 * 85) / 100,
      s"beam-search recall too low: $hits/${nQ * 5} (floor 0.85; " +
        "measured 0.98/0.98/0.91 at sf0.001/0.01/0.1 — see RecallProbe)")
  }

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  test("3-gram shingle Jaccard: identical docs = 1.0, disjoint = no pair") {
    val d = docs(
      1L -> "a b c d e f",
      2L -> "a b c d e f",
      3L -> "q r s t u v")
    val sh = d.select(col("doc_id"),
      expr("explode(array_distinct(transform(sequence(1, greatest(size(split(text, ' ')) - 2, 1)), " +
        "i -> concat_ws(' ', slice(split(text, ' '), i, 3)))))").as("shingle"))
    val pairs = sh.as("x").join(sh.as("y"),
        col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id"), col("y.doc_id")).count().collect()
    assert(pairs.length === 1)
    assert(pairs.head.getLong(2) === 4) // 6 tokens -> 4 shingles, all shared
  }

  test("cosine: orthogonal = 0, parallel = 1") {
    val df = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)), (3L, Seq(2.0, 0.0))
    ).toDF("id", "v")
    val n = df.withColumn("n",
      expr("sqrt(aggregate(transform(v, x -> x * x), 0D, (a, x) -> a + x))"))
    val cos = n.as("a").join(n.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        (expr("aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)") /
          (col("a.n") * col("b.n"))).as("cos"))
      .orderBy(col("a.id"), col("b.id")).collect()
    assert(cos(0).getDouble(2) === 0.0) // 1 vs 2
    assert(cos(1).getDouble(2) === 1.0) // 1 vs 3
    assert(cos(2).getDouble(2) === 0.0) // 2 vs 3
  }

  test("rolling fingerprint is order-sensitive, exact-hash is not") {
    val d = docs(1L -> "alpha beta gamma", 2L -> "gamma beta alpha")
    val fp = d.select(col("doc_id"),
      expr("aggregate(transform(split(text, ' '), " +
        "t -> cast(ascii(substring(t, 1, 1)) * 64 + length(t) as bigint)), 0L, " +
        "(acc, x) -> pmod(acc * 31 + x, 1000000007L))").as("f")).collect()
    assert(fp(0).getLong(1) !== fp(1).getLong(1))
    val sortedHash = d.select(
      md5(concat_ws(" ", array_sort(split(col("text"), " ")))).as("h"))
      .collect().map(_.getString(0))
    assert(sortedHash(0) === sortedHash(1)) // bag-of-words hash collides them
  }

  test("simhash of identical token multisets is identical") {
    val q = operators.LlmPipeline.queries.find(_.id == "dedup_simhash").get
    // planted near-dups in the driver fixture surface as hamming<=3 pairs
    val out = q.fn(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getInt(2) <= 3))
  }

  test("exact dedup: re-crawled union collapses to one keeper per hash") {
    val q = operators.LlmPipeline.queries.find(_.id == "dedup_exact").get
    val out = q.fn(spark, sfDir)
    val total = out.agg(sum("n_copies")).head().getLong(0)
    val keepers = out.count()
    // sf0.001: 500 docs + ceil(500/7)=72 re-crawls; every hash keeps one
    assert(total === 572)
    assert(keepers === 500)
  }

  test("knn vote output has one prediction per query vector") {
    val q = operators.LlmPipeline.queries.find(_.id == "sim_knn_class").get
    val out = q.fn(spark, sfDir).collect()
    assert(out.map(_.getLong(0)).distinct.length === out.length)
    assert(out.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= 10))
  }

  test("multimodal binary stub: checksum equals sum of md5 bytes") {
    val q = operators.LlmPipeline.queries.find(_.id == "multimodal_binary").get
    val out = q.fn(spark, sfDir).limit(5).collect()
    assert(out.forall(_.getInt(1) === 16))
    assert(out.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= 16L * 255))
  }

  test("containment catches an embedded doc that Jaccard misses") {
    import spark.implicits._
    // doc 2's shingles are a strict subset of doc 1's (quote-in-wrapper):
    // containment = 5/5 = 1.0 while jaccard = 5/20 = 0.25
    val sh = ((1 to 20).map(i => (1L, s"s$i")) ++
      (1 to 5).map(i => (2L, s"s$i"))).toDF("doc_id", "shingle")
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("x").join(sh.as("y"),
        col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
      .agg(count(lit(1)).as("inter"))
    val r = inter
      .join(sizes.select(col("doc_id").as("da"), col("n_sh").as("na")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("n_sh").as("nb")), "db")
      .select(expr("(1000000 * inter) div least(na, nb)"),
        expr("(1000000 * inter) div (na + nb - inter)"))
      .head()
    assert(r.getLong(0) === 1000000L) // containment: perfect hit
    assert(r.getLong(1) === 250000L)  // jaccard: far below any threshold
  }
}
