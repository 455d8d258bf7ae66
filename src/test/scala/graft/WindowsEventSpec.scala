package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hand-computed window / event-time semantics on micro-fixtures:
  * as-of joins pick the latest prior row, range frames respect time
  * bounds, duplicate events dedup deterministically, rollup produces
  * the full grouping lattice.
  */
class WindowsEventSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join picks the latest event at or before each probe time") {
    val quotes = Seq((1L, 10L, 100.0), (1L, 20L, 101.0), (1L, 30L, 99.0))
      .toDF("k", "t", "px")
    val probes = Seq((1L, 25L), (1L, 30L), (1L, 5L)).toDF("k", "pt")
    val joined = probes.join(quotes, Seq("k"), "left")
      .filter(col("t") <= col("pt"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("k", "pt").orderBy(col("t").desc)))
      .filter(col("rk") === 1)
      .select("pt", "px").orderBy("pt").collect()
    // pt=5 has no prior quote -> filtered out entirely (inner-after-filter)
    assert(joined.map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      Seq((25L, 101.0), (30L, 99.0)))
  }

  test("range frame sums only rows within the time interval") {
    val df = Seq((1L, 0L, 1.0), (1L, 50L, 2.0), (1L, 200L, 4.0)).toDF("k", "t", "v")
    val w = Window.partitionBy("k").orderBy("t").rangeBetween(-100L, 0L)
    val r = df.withColumn("s", sum("v").over(w)).orderBy("t").collect()
    assert(r.map(_.getDouble(3)).toSeq === Seq(1.0, 3.0, 4.0))
  }

  test("dropDuplicates keeps exactly one row per event id") {
    val df = Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("event_id", "v")
    assert(df.dropDuplicates("event_id").count() === 2)
  }

  test("rollup produces the full aggregation lattice with null totals") {
    val df = Seq(("x", "p", 1L), ("x", "q", 2L), ("y", "p", 4L)).toDF("a", "b", "v")
    val r = df.rollup("a", "b").agg(sum("v").as("s")).collect()
    // rows: (x,p)(x,q)(y,p)(x,null)(y,null)(null,null) = 6
    assert(r.length === 6)
    val total = r.find(row => row.isNullAt(0) && row.isNullAt(1)).get.getLong(2)
    assert(total === 7L)
  }

  test("sliding-window expansion covers each event in exactly 4 windows") {
    val n = graft.operators.EventStream.queries.find(_.id == "stream_slide").get
      .fn(spark, sfDir).agg(sum("n")).head().getLong(0)
    val events = graft.sources.Tables.events(spark, sfDir).count()
    assert(n === 4 * events)
  }

  test("session windows never contain an internal gap over the threshold") {
    val out = graft.operators.EventStream.queries.find(_.id == "stream_session").get
      .fn(spark, sfDir)
    // session length bounded by (n_events - 1) * gap
    val gapUs = 2L * 3600 * 1000000
    val bad = out.filter(
      col("sess_end_us") - col("sess_start_us") > (col("n_events") - 1) * gapUs)
    assert(bad.count() === 0)
  }
}
