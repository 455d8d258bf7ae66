package graft

import org.apache.spark.sql.functions._

/** Hand-computed checks of the PS/algorithm update algebra
  * (SURVEY §5.2: PA single-step closed form, MF SGD step, loop
  * convergence) — independent of the DuckDB oracle.
  */
class PsAlgebraSpec extends SparkSpec {
  import spark.implicits._

  test("PA-I step algebra on a hand-computed example") {
    // x=(1,0), w=(0.5,0), y=-1: wx=0.5, loss=1-(-1*0.5)=1.5, xx=1
    // tau=min(C=0.5, 1.5)=0.5, new_margin=y*wx+tau*xx=-0.5+0.5=0.0
    val df = Seq((Seq(1.0, 0.0), Seq(0.5, 0.0), -1.0)).toDF("x", "w", "y")
      .withColumn("wx", expr("aggregate(zip_with(w, x, (a, b) -> a * b), 0D, (acc, v) -> acc + v)"))
      .withColumn("xx", expr("aggregate(transform(x, v -> v * v), 0D, (acc, v) -> acc + v)"))
      .withColumn("loss", greatest(lit(0.0), lit(1.0) - col("y") * col("wx")))
      .withColumn("tau", least(lit(0.5), col("loss") / col("xx")))
      .withColumn("new_margin", col("y") * col("wx") + col("tau") * col("xx"))
    val r = df.head()
    assert(r.getAs[Double]("loss") === 1.5)
    assert(r.getAs[Double]("tau") === 0.5)
    assert(r.getAs[Double]("new_margin") === 0.0)
  }

  test("MF SGD step algebra on a hand-computed example") {
    // p=(1,0), q=(0.5,0.5), r=2: e = 2 - 0.5 = 1.5
    // dq_j = lr*(e*p_j - reg*q_j), lr=0.1, reg=0 -> q' = (0.65, 0.5)
    val df = Seq((Seq(1.0, 0.0), Seq(0.5, 0.5), 2.0)).toDF("p", "q", "r")
      .withColumn("e", col("r") -
        expr("aggregate(zip_with(p, q, (x, y) -> x * y), 0D, (a, x) -> a + x)"))
      .withColumn("q_new", expr(
        "transform(sequence(0, 1), j -> element_at(q, j + 1) + " +
          "0.1 * (e * element_at(p, j + 1) - 0.0 * element_at(q, j + 1)))"))
    val r = df.head()
    assert(r.getAs[Double]("e") === 1.5)
    assert(r.getAs[Seq[Double]]("q_new") === Seq(0.65, 0.5))
  }

  test("ps_transform loop converges toward per-item mean rating") {
    val q = ps.PsQueries.queries.find(_.id == "ps_transform").get
    val model = q.fn(spark, sfDir)
    // after 3 damped steps p = (1 - 0.5^3) * mean = 0.875 * mean
    val ratings = Tables0.ratings(spark, sfDir)
    val mean = ratings.groupBy("item")
      .agg((sum(Det.cents(col("rating"))).cast("double") / 100.0 /
        count(lit(1)).cast("double")).as("m"))
    val joined = model.join(mean, "item")
      .withColumn("expect", round(col("m") * 0.875, 6))
      .filter(abs(col("p") - col("expect")) > 1e-9)
    assert(joined.count() === 0)
  }

  test("negative samples never collide with observed pairs") {
    val q = ps.PsQueries.queries.find(_.id == "mf_neg_sample").get
    val neg = q.fn(spark, sfDir)
    val seen = Tables0.ratings(spark, sfDir)
      .select(col("user"), col("item").as("neg_item")).distinct()
    assert(neg.join(seen, Seq("user", "neg_item"), "inner").count() === 0)
  }

  test("mf_topk scores agree with direct inner products (pruning is lossless at k)") {
    val q = ps.PsQueries.queries.find(_.id == "mf_topk").get
    val out = q.fn(spark, sfDir)
    assert(out.groupBy("uid").count().filter(col("count") =!= 5).count() === 0)
    // rank 1 score >= rank 5 score per user
    val agg = out.groupBy("uid")
      .agg(max(when(col("rk") === 1, col("score"))).as("s1"),
        max(when(col("rk") === 5, col("score"))).as("s5"))
    assert(agg.filter(col("s1") < col("s5")).count() === 0)
  }
}

/** Test-side duplicate of the ratings view (PsQueries' is private). */
object Tables0 {
  def ratings(spark: org.apache.spark.sql.SparkSession, dir: String) = {
    val o = graft.sources.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
    val l = graft.sources.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("user"), col("l_partkey").as("item"),
        col("l_quantity").as("rating"))
  }
}

/** Full training-loop convergence (SURVEY §3.2/§3.4 harness). */
class MfTrainerSpec extends SparkSpec {
  test("MF training loop monotonically reduces MSE on the ratings matrix") {
    val ratings = Tables0.ratings(spark, sfDir)
    val (p, q, losses) = ps.MfTrainer.train(spark, ratings, k = 8, iters = 4)
    assert(losses.size === 5)
    // strictly decreasing loss trajectory (full-batch, small lr)
    losses.sliding(2).foreach { case Seq(a, b) => assert(b < a, losses) }
    // factors stay finite and k-dimensional
    import org.apache.spark.sql.functions._
    assert(p.filter(size(col("vec")) =!= 8).count() === 0)
    assert(q.filter(size(col("vec")) =!= 8).count() === 0)
  }
}

/** PA full-loop training: hinge loss decreases, accuracy beats chance. */
class PaTrainerSpec extends SparkSpec {
  test("PA training loop reduces hinge loss on the embeddings") {
    import org.apache.spark.sql.functions._
    val data = graft.sources.Tables.embeddings(spark, sfDir)
      .select(expr("transform(embedding, v -> cast(v as double))").as("x"),
        when(col("label") >= 5, 1.0).otherwise(-1.0).as("y"))
    val (w, metrics) = ps.PaTrainer.train(spark, data, dim = 64, iters = 5)
    assert(w.length === 64)
    assert(metrics.size === 5)
    assert(metrics.last._1 < metrics.head._1, metrics)   // hinge decreased
    assert(metrics.last._2 > 0.5, metrics)               // beats chance
  }
}
