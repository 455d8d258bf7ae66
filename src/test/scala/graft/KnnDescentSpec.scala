package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Locks the incremental NN-Descent candidate rule: restricting
  * generation to pairs with ≥1 newly-entered endpoint must reproduce
  * EXACTLY the graph of the naive full-rejoin loop. The argument: a
  * pair of co-resident neighbors is generated in the round the later
  * endpoint entered (at init every edge is new, and a re-entering edge
  * re-enters as new), and a pair rejected by the per-source top-k once
  * stays rejected forever because the kept set only improves — so the
  * old-old pairs the rule skips can never change the result. This spec
  * is the executable form of that argument against the real fixture.
  */
class KnnDescentSpec extends SparkSpec {

  private def h32(sexpr: String, seed: Int): String =
    s"cast(conv(substring(md5(concat('$seed:', $sexpr)), 1, 8), 16, 10) as bigint)"

  /** The naive full-rejoin NN-Descent (pre-round-6 formulation):
    * identical init, scoring, and top-k; candidates = ALL
    * neighbor-of-neighbor pairs every round. */
  private def naiveEdges(dir: String, k: Int, rounds: Int): DataFrame = {
    import graft.functions.VectorExprs
    val ev = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("n", VectorExprs.l2(col("v")))
      .persist()
    def score(cand: DataFrame): DataFrame = cand
      .join(ev.select(col("vec_id").as("src"), col("v").as("pv"), col("n").as("pn")), "src")
      .join(ev.select(col("vec_id").as("dst"), col("v").as("qv"), col("n").as("qn")), "dst")
      .select(col("src"), col("dst"),
        (VectorExprs.dot(col("pv"), col("qv")) / (col("pn") * col("qn"))).as("cos"))
    def topK(scored: DataFrame): DataFrame = scored
      .withColumn("rk", row_number().over(
        Window.partitionBy("src").orderBy(col("cos").desc, col("dst"))))
      .filter(col("rk") <= k).select(col("src"), col("dst"), col("cos"))
    val nBuckets = math.max(1L, ev.count() / 12L) // = knnGraphEdges' default bucketSize
    val initCand = (1 to 6).map { s => // = knnGraphEdges' default bucketings (r14: 6)
      val withB = ev.select(col("vec_id"),
        expr(s"pmod(${h32("vec_id", 100 + s)}, $nBuckets)").as("b"))
      withB.select(col("vec_id").as("src"), col("b"))
        .join(withB.select(col("vec_id").as("dst"), col("b")), "b")
        .filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst"))
    }.reduce(_ unionByName _).distinct()
    var edges = topK(score(initCand)).localCheckpoint()
    for (_ <- 1 to rounds) {
      val adj = edges.select(col("src"), col("dst")).unionByName(
        edges.select(col("dst").as("src"), col("src").as("dst")))
      val cand = adj.as("a").join(adj.as("b"), col("a.dst") === col("b.src"))
        .select(col("a.src").as("src"), col("b.dst").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      edges = topK(edges.unionByName(score(cand)).distinct()).localCheckpoint()
    }
    ev.unpersist(blocking = false)
    edges
  }

  test("incremental new/old candidate rule reproduces the full-rejoin graph exactly") {
    val (k, rounds) = (6, 3)
    val inc = graft.operators.LlmPipeline
      .knnGraphEdges(spark, sfDir, k, rounds).select("src", "dst")
    val ref = naiveEdges(sfDir, k, rounds).select("src", "dst")
    assert(inc.exceptAll(ref).isEmpty, "incremental graph has edges the full-rejoin graph lacks")
    assert(ref.exceptAll(inc).isEmpty, "incremental graph is missing full-rejoin edges")
    assert(inc.count() > 0)
  }
}
