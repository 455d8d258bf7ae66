package graft

import org.apache.spark.sql.functions._

/** Locks for [[SerialStageAudit.serialRows]] — the detector the
  * serial-stage scale audit stands on. If a Spark upgrade renames the
  * shuffle-write metric or changes how an unpartitioned Window
  * compiles, the audit would silently report zeros and every
  * "measured bounded" claim in the round log would go stale; these
  * tests pin the two detection paths (single-partition shuffle,
  * coalesce(1)) and the non-detection of healthy partitioned shapes.
  */
class SerialStageAuditSpec extends SparkSpec {

  private def serialOf(df: org.apache.spark.sql.DataFrame): Seq[(String, Long)] = {
    df.collect()
    SerialStageAudit.serialRows(df.queryExecution.executedPlan)
      .filter(_._2 > 0)
  }

  test("an unpartitioned window funnels all rows through one partition and is detected") {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("id"))
    val df = spark.range(5000).toDF("id")
      .withColumn("rk", row_number().over(w))
      .groupBy(lit(1)).agg(sum(col("rk")).as("s"))
    val serial = serialOf(df)
    // the window's input (5000 rows) crosses a SinglePartition exchange
    assert(serial.exists(_._2 >= 5000L), serial.toString)
  }

  test("coalesce(1) is detected with its child row count") {
    val df = spark.range(3000).toDF("id").coalesce(1)
      .groupBy(col("id") % 7).count()
    val serial = serialOf(df)
    assert(serial.exists { case (ctx, n) => ctx.contains("coalesce(1)") && n >= 3000L },
      serial.toString)
  }

  test("ShuffleGrowthAudit counts the records a keyed groupBy shuffles") {
    val df = spark.range(4000).toDF("id")
      .groupBy(col("id") % 997).agg(sum(col("id")).as("s"))
    df.collect()
    val n = ShuffleGrowthAudit.shuffleRows(df.queryExecution.executedPlan)
    // partial aggregation combines map-side, but 997 groups over 4
    // partitions still shuffle >= 997 combined rows (and < 4000 raw —
    // map-side combine is working if this upper bound holds too)
    assert(n >= 997L && n < 4000L, n.toString)
  }

  test("a partitioned window and a keyed groupBy raise no corpus-sized serial stage") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id") % 16).orderBy(col("id"))
    val df = spark.range(5000).toDF("id")
      .withColumn("rk", row_number().over(w))
      .groupBy(col("id") % 16).agg(sum(col("rk")).as("s"))
    // the only single-partition rows allowed are scalar-aggregate
    // finals (bounded by partition count, not the corpus)
    val serial = serialOf(df)
    assert(serial.forall(_._2 < 100L), serial.toString)
  }
}
