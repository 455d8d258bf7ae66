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

  test("attribution conserves purchases and revenue across channels") {
    val rep = graft.operators.EventStream.queries.find(_.id == "event_attribution").get
      .fn(spark, sfDir)
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
    assert(rep.agg(sum("n_purchases")).head().getLong(0) === ev.count())
    assert(rep.agg(sum("revenue_c")).head().getLong(0) ===
      ev.agg(sum(round(col("value") * 100).cast("long"))).head().getLong(0))
    // channels are touch types or 'organic' — never 'purchase' itself
    assert(rep.filter(col("channel") === "purchase").count() === 0)
  }

  test("last-touch carry-forward picks the nearest preceding touch") {
    val df = Seq(
      (1L, 1L, "view", 0.0), (1L, 2L, "click", 0.0), (1L, 3L, "purchase", 5.0),
      (2L, 4L, "purchase", 7.0)) // no prior touch -> organic
      .toDF("user_id", "event_id", "event_type", "value")
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val r = df.withColumn("touch", last(
        when(col("event_type") =!= "purchase", col("event_type")), true).over(w))
      .filter(col("event_type") === "purchase")
      .select("user_id", "touch").collect().map(x => (x.getLong(0), x.getString(1))).toMap
    assert(r === Map(1L -> "click", 2L -> null))
  }

  test("ts_outlier medians are in-range and counts conserve") {
    val out = graft.operators.EventStream.queries.find(_.id == "ts_outlier").get
      .fn(spark, sfDir)
    val perType = graft.sources.Tables.events(spark, sfDir)
      .groupBy("event_type").agg(
        count(lit(1)).as("n_ev"),
        min(round(col("value") * 100).cast("long")).as("lo"),
        max(round(col("value") * 100).cast("long")).as("hi"))
    val joined = out.join(perType, "event_type")
    assert(joined.filter(col("n") =!= col("n_ev")).count() === 0)
    assert(joined.filter(col("med_c") < col("lo") || col("med_c") > col("hi"))
      .count() === 0)
    assert(joined.filter(col("mad_c") < 0 || col("n_outliers") > col("n"))
      .count() === 0)
  }

  test("integer-moment OLS recovers a perfect line exactly") {
    // y = 2x + 5 -> slope_e6 = 2_000_000, r2_e6 = 1_000_000, zero drift
    val df = (0L to 10L).map(x => ("a", x, 2 * x + 5)).toDF("k", "x", "y")
    val m = df.groupBy("k").agg(
      count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
      .withColumn("num", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("den", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("deny", col("n") * col("syy") - col("sy") * col("sy"))
      .select(
        round(col("num").cast("double") / col("den").cast("double") * 1e6)
          .cast("long").as("slope_e6"),
        round(col("num").cast("double") * col("num").cast("double") /
          (col("den").cast("double") * col("deny").cast("double")) * 1e6)
          .cast("long").as("r2_e6"))
      .head()
    assert(m.getLong(0) === 2000000L)
    assert(m.getLong(1) === 1000000L)
  }

  test("ts_trend R2 is a valid fraction and n matches the hour buckets") {
    val out = graft.operators.EventStream.queries.find(_.id == "ts_trend").get
      .fn(spark, sfDir)
    assert(out.filter(col("r2_e6") < 0 || col("r2_e6") > 1000000L).count() === 0)
    val hours = graft.sources.Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts"))).count()
      .groupBy("event_type").count().withColumnRenamed("count", "n_hours")
    assert(out.join(hours, "event_type")
      .filter(col("n") =!= col("n_hours")).count() === 0)
  }

  test("integer CUSUM locates a planted level shift at its last low point") {
    // series 10,10,10,50,50: n·cx − i·sx = -80,-160,-240,-120,0 —
    // peak |…| at i=3, halves mean 10 and 50
    val df = Seq(1L -> 10L, 2L -> 10L, 3L -> 10L, 4L -> 50L, 5L -> 50L)
      .map { case (h, x) => ("a", h, x) }.toDF("k", "h", "x")
    val w = Window.partitionBy("k").orderBy("h")
    val cum = df
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("cx", sum(col("x")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("k")))
      .withColumn("sx", sum(col("x")).over(Window.partitionBy("k")))
      .withColumn("cusum", col("n") * col("cx") - col("i") * col("sx"))
    val top = cum.withColumn("rk", row_number().over(
        Window.partitionBy("k").orderBy(abs(col("cusum")).desc, col("h"))))
      .filter(col("rk") === 1)
      .select(col("h"), col("cusum"), expr("cx div i"),
        expr("(sx - cx) div nullif(n - i, 0)")).head()
    assert(top.getLong(0) === 3L)
    assert(top.getLong(1) === -240L)
    assert(top.getLong(2) === 10L)
    assert(top.getLong(3) === 50L)
  }

  test("binary-length binning equals floor(log2)+1 for 1..1000") {
    val df = (1L to 1000L).toDF("d")
      .withColumn("bin_conv", length(conv(col("d"), 10, 2)).cast("long"))
      .withColumn("bin_math",
        floor(log(2.0, col("d").cast("double"))).cast("long") + 1L)
    assert(df.filter(col("bin_conv") =!= col("bin_math")).count() === 0)
  }

  test("manual median position matches percentile_disc semantics") {
    // n=4 -> position (4+1) div 2 = 2; values 10,20,30,40 -> med 20
    val df = Seq(10L, 20L, 30L, 40L).zipWithIndex
      .map { case (v, i) => ("a", i.toLong, v) }.toDF("k", "id", "v")
    val w = Window.partitionBy("k").orderBy("v", "id")
    val med = df.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("k")))
      .groupBy("k")
      .agg(max(when(col("rn") === expr("(n + 1) div 2"), col("v"))).as("med"))
      .head().getLong(1)
    assert(med === 20L)
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

  test("ACF integer moments recover the alternating-series correlogram") {
    // y = +1,-1,... (n=10): S=0, so acf_L = P_L/SS exactly:
    // -9/10, +8/10, -7/10
    val df = (1L to 10L).map(i => ("a", i, if (i % 2 == 1) 1L else -1L))
      .toDF("k", "h", "y")
    val w = Window.partitionBy("k").orderBy("h")
    val led = df.select(col("k"), col("y"),
      lead("y", 1).over(w).as("y1"), lead("y", 2).over(w).as("y2"),
      lead("y", 3).over(w).as("y3"))
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val m = led.groupBy("k").agg(
      count(lit(1)).as("n"), sum("y").as("s"),
      sum(col("y") * col("y")).as("ss"),
      count("y1").as("m1"), sum(col("y") * col("y1")).as("p1"),
      sum(when(col("y1").isNotNull, col("y"))).as("h1"), sum("y1").as("t1"))
      .select(round(
        (dec(col("n")) * dec(col("n")) * dec(col("p1"))
          - dec(col("n")) * dec(col("s")) * (dec(col("h1")) + dec(col("t1")))
          + dec(col("m1")) * dec(col("s")) * dec(col("s"))).cast("double")
          / (dec(col("n")) * dec(col("n")) * dec(col("ss"))
            - dec(col("n")) * dec(col("s")) * dec(col("s"))).cast("double")
          * 1e6).cast("long").as("acf1"))
      .head()
    assert(m.getLong(0) === -900000L)
  }

  test("ts_seasonal: flat series indexes at exactly 1e6; shape detected") {
    import org.apache.spark.sql.expressions.{Window => W}
    // dow means 10,10,10 and 10,40,10: flat -> all 1e6; spiky -> spike
    // day indexes at 40/20 = 2e6 and the flat days at 10/20 = 5e5
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val df = Seq(("flat", 1L, 10L), ("flat", 2L, 10L), ("flat", 3L, 10L),
      ("spike", 1L, 10L), ("spike", 2L, 40L), ("spike", 3L, 10L))
      .toDF("k", "dow", "v")
    val w = W.partitionBy("k")
    val out = df.groupBy("k", "dow")
      .agg(count(lit(1)).as("dow_n"), sum("v").as("dow_sum"))
      .withColumn("tot_n", sum(col("dow_n")).over(w))
      .withColumn("tot_sum", sum(col("dow_sum")).over(w))
      .select(col("k"), col("dow"),
        round((dec(col("dow_sum")) * dec(col("tot_n"))).cast("double")
          / (dec(col("dow_n")) * dec(col("tot_sum"))).cast("double") * 1e6)
          .cast("long").as("idx"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out(("flat", 1L)) === 1000000L)
    assert(out(("flat", 2L)) === 1000000L)
    assert(out(("spike", 2L)) === 2000000L)
    assert(out(("spike", 1L)) === 500000L)
  }

  test("ts_acf output is a bounded correlogram with n-L pairs per lag") {
    val out = graft.operators.EventStream.queries.find(_.id == "ts_acf").get
      .fn(spark, sfDir)
    assert(out.count() === 15) // 5 series x 3 lags
    assert(out.filter(col("acf_e6") < -1000000L || col("acf_e6") > 1000000L)
      .count() === 0)
    val hours = graft.sources.Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts"))).count()
      .groupBy("event_type").count().withColumnRenamed("count", "n_hours")
    assert(out.join(hours, "event_type")
      .filter(col("n_pairs") =!= col("n_hours") - col("lag")).count() === 0)
  }
}
