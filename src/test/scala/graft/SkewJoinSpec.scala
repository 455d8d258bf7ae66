package graft

import org.apache.spark.sql.functions._

/** AQE skew-join evidence (VERDICT r2 "Next round" #6): the fixture SFs
  * are too small for Spark's default skew thresholds to ever trigger, so
  * this suite derives a genuinely skewed key distribution (≈99% of
  * lineitem rows collapse onto one hot key) and lowers the AQE skew
  * thresholds to fixture scale, then asserts that
  * OptimizeSkewedJoin actually SPLITS the hot partition (`skew=true` in
  * the final adaptive plan) and that the split result is row-identical
  * to the same join with AQE skew handling off. This is the runtime
  * complement to the explicit-salting qid (join_skew_salt): at 100 TB
  * the same plan shape lets AQE carve a hot advertiser/user/shingle key
  * into advisory-sized slices with no manual salt factor to tune.
  */
class SkewJoinSpec extends SparkSpec {

  private def skewedJoin() = {
    // ~99% of rows land on key 1; remaining keys stay unique — the
    // classic hot-key profile (power-law head + long tail)
    // sf0.01: the 60k-row hot partition is comfortably above the lowered
    // byte threshold even after shuffle compression (sf0.001's ~6k rows
    // compress to within noise of it)
    // repartition(16) first: AQE splits a skewed reduce partition into
    // PER-MAPPER chunks, and the fixture is a single parquet file (one
    // map task) — with one mapper there is nothing to split, however
    // skewed the key is. On a real cluster the map side is always wide;
    // this recreates that shape at fixture scale.
    val left = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.01")
      .repartition(16)
      .select(
        when(col("l_orderkey") % 100 =!= 0, lit(1L))
          .otherwise(col("l_orderkey")).as("k"),
        col("l_quantity"))
    val right = spark.range(0, 8000).select(
      col("id").as("k"), (col("id") % 7).as("grp"))
    left.join(right, "k")
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
      .orderBy(col("grp"))
  }

  test("AQE splits the hot partition (skew=true) and preserves results") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k)).toMap
    def restore(): Unit = saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
    try {
      // force a shuffled join (no broadcast), thresholds at fixture scale
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16k")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8k")

      val df = skewedJoin()
      val withSkew = df.collect()
      // the plan string only reflects AQE decisions AFTER execution
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a skew-split join in the adaptive plan, got:\n${plan.take(4000)}")

      conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val noSkew = skewedJoin().collect()
      assert(withSkew.sameElements(noSkew),
        "skew-split changed the join result")
    } finally restore()
  }
}
