package graft.ps

import graft.functions.VectorExprs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full Passive-Aggressive training loop, bulk-synchronous restatement
  * of the reference's online PA job (`ps/.../passive/aggressive/`
  * [K-high], SURVEY §2.B pa_binary): per iteration every margin is
  * computed against the current weight vector (pull = broadcast join of
  * one w row), per-record PA-I updates τ·y·x are computed row-locally,
  * and their sum is pushed as one averaged batch update — the
  * mini-batch PA of Crammer et al. §8 generalized to full batches.
  *
  * w lives as a single ARRAY<DOUBLE> row (the model is tiny; the DATA
  * is what scales), so each iteration is: broadcast w → map over x
  * (native dot inside codegen) → one dimension-exploded vector-sum.
  * State never touches the driver except the loop counter and the
  * per-iteration metrics.
  */
object PaTrainer {

  /** Train on (features ARRAY<DOUBLE>, y ∈ {-1,+1}); returns the final
    * weights row and per-iteration (hinge, accuracy). */
  def train(spark: SparkSession, data: DataFrame, dim: Int,
      iters: Int = 5, c: Double = 0.5)
      : (Array[Double], Seq[(Double, Double)]) = {
    import spark.implicits._
    val d = data.select(col("x"), col("y")).cache()
    val n = d.count().toDouble
    var w = Array.fill(dim)(0.0)
    val metrics = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
    for (_ <- 1 to iters) {
      val wDf = Seq(w.toSeq).toDF("w")
      val scored = d.crossJoin(broadcast(wDf))
        .withColumn("wx", VectorExprs.dot(col("w"), col("x")))
        .withColumn("xx", VectorExprs.dot(col("x"), col("x")))
        .withColumn("loss", greatest(lit(0.0), lit(1.0) - col("y") * col("wx")))
        .withColumn("tau", least(lit(c), col("loss") / col("xx")))
        .cache()
      val hinge = scored.agg(avg("loss")).head().getDouble(0)
      val acc = scored.filter(col("y") * col("wx") > 0).count() / n
      metrics += ((hinge, acc))
      // batch update: w += (1/n) Σ τ·y·x  (dimension-exploded keyed sum)
      val upd = scored.filter(col("tau") > 0)
        .select(posexplode(expr("transform(x, v -> tau * y * v)")).as(Seq("j", "g")))
        .groupBy("j").agg(sum("g").as("g"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      scored.unpersist()
      w = w.zipWithIndex.map { case (v, j) => v + upd.getOrElse(j, 0.0) / n }
    }
    (w, metrics.toSeq)
  }
}
