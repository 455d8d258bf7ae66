package graft.ps

import graft.functions.VectorExprs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full synchronous matrix-factorization training loop — the
  * vector-model realization of `FlinkParameterServer.transform` +
  * `PSOnlineMatrixFactorization` (SURVEY §3.2 [K-high]) in Spark's
  * bulk-synchronous model (§3.4):
  *
  *   pull  = join ratings ⋈ P (user factors) ⋈ Q (item factors)
  *   work  = e = r − p·q; per-rating gradients
  *   push  = groupBy(id) vector-sum of gradients (map-side combined)
  *   update= P += lr·ΣΔp, Q += lr·ΔΣq  (full-batch gradient step)
  *
  * Each iteration shuffles only on (user) and (item) keys; factor
  * vectors ride along as ARRAY<DOUBLE>. At 100 TB: ratings partition by
  * user for the P-join (co-partitioned after the first shuffle), Q
  * broadcasts when the item universe is small, and the vector-sum uses
  * dimension-exploded rows so partial aggregation applies — no
  * driver-side state beyond the loop counter.
  *
  * Deterministic: md5-seeded init, fixed iteration count, exploded
  * integer-keyed gradient sums (order-free double adds per (id, dim)
  * group are NOT order-free in IEEE — but each (id,dim) group sums the
  * same operand multiset in partition order; for the convergence test
  * only aggregate loss trends matter, and the oracle-checked single
  * step lives in mf_sgd).
  */
object MfTrainer {

  private def initFactors(df: DataFrame, idCol: String, k: Int, seed: Int): DataFrame =
    df.select(col(idCol).as("id")).distinct()
      .withColumn("vec", expr(
        s"transform(sequence(0, ${k - 1}), j -> cast(-0.1 as double) + " +
          s"(pmod(cast(conv(substring(md5(concat('$seed:', id, ':', j)), 1, 8), 16, 10) as bigint), 1000) " +
          s"/ cast(1000 as double)) * cast(0.2 as double))"))

  /** Vector-sum of gradient arrays per id: explode dims → keyed sum →
    * reassemble in dimension order (partial aggregation applies). */
  private def vectorSum(grads: DataFrame, k: Int): DataFrame =
    grads.select(col("id"), posexplode(col("g")).as(Seq("j", "gj")))
      .groupBy("id", "j").agg(sum("gj").as("gj"))
      .groupBy("id")
      .agg(expr("transform(array_sort(collect_list(struct(j, gj))), s -> s.gj)").as("g"))

  /** Train k-dim factors for `iters` full-batch iterations; returns
    * (userFactors(id, vec), itemFactors(id, vec), lossPerIter). */
  def train(spark: SparkSession, ratings: DataFrame, k: Int = 8,
      iters: Int = 5, lr: Double = 0.002, reg: Double = 0.01)
      : (DataFrame, DataFrame, Seq[Double]) = {
    var p = initFactors(ratings, "user", k, 21).cache()
    var q = initFactors(ratings, "item", k, 22).cache()
    val r = ratings.select(col("user"), col("item"), col("rating").cast("double").as("r"))
      .cache()
    val losses = scala.collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to iters) {
      val joined = r
        .join(p.select(col("id").as("user"), col("vec").as("pv")), "user")
        .join(q.select(col("id").as("item"), col("vec").as("qv")), "item")
        .withColumn("e", col("r") - VectorExprs.dot(col("pv"), col("qv")))
        .cache()
      losses += joined.agg(avg(col("e") * col("e"))).head().getDouble(0)
      val gradP = vectorSum(joined.select(col("user").as("id"),
        expr(s"transform(sequence(0, ${k - 1}), " +
          s"j -> e * element_at(qv, j + 1) - $reg * element_at(pv, j + 1))").as("g")), k)
      val gradQ = vectorSum(joined.select(col("item").as("id"),
        expr(s"transform(sequence(0, ${k - 1}), " +
          s"j -> e * element_at(pv, j + 1) - $reg * element_at(qv, j + 1))").as("g")), k)
      // localCheckpoint (eager) rather than cache+count: it materializes
      // AND truncates the logical plan. pNew references p both directly
      // and through `joined`, so an uncut lineage doubles per iteration —
      // exponential plan growth that breaks long trainings (found as an
      // explainString OOM in the dedup_clusters fixpoint loop, same
      // shape). On a cluster: reliable checkpoint() every few iters.
      val pNew = p.join(gradP, Seq("id"), "left")
        .select(col("id"), coalesce(
          expr(s"zip_with(vec, g, (v, gj) -> v + $lr * gj)"), col("vec")).as("vec"))
        .localCheckpoint()
      val qNew = q.join(gradQ, Seq("id"), "left")
        .select(col("id"), coalesce(
          expr(s"zip_with(vec, g, (v, gj) -> v + $lr * gj)"), col("vec")).as("vec"))
        .localCheckpoint()
      // Free the previous iteration explicitly: on iteration 1, p/q are
      // cache()d (CacheManager — unpersist() works); from iteration 2 on
      // they are localCheckpointed, whose blocks live OUTSIDE the
      // CacheManager and would otherwise wait for driver GC +
      // ContextCleaner (O(ids·k) blocks per iteration accumulate on long
      // trainings). freeCheckpoint unpersists the underlying RDD.
      p.unpersist(); q.unpersist(); joined.unpersist()
      graft.operators.GraphOps.freeCheckpoint(p)
      graft.operators.GraphOps.freeCheckpoint(q)
      p = pNew
      q = qNew
    }
    val finalLoss = r
      .join(p.select(col("id").as("user"), col("vec").as("pv")), "user")
      .join(q.select(col("id").as("item"), col("vec").as("qv")), "item")
      .select((col("r") - VectorExprs.dot(col("pv"), col("qv"))).as("e"))
      .agg(avg(col("e") * col("e"))).head().getDouble(0)
    losses += finalLoss
    (p, q, losses.toSeq)
  }
}
