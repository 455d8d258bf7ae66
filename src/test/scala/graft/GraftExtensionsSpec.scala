package graft

import graft.functions.GraftExtensions

/** SQL-surface registration of the native expressions via the
  * extensions hook / function registry. */
class GraftExtensionsSpec extends SparkSpec {

  test("array_dot_product and array_l2_norm callable from SQL") {
    GraftExtensions.registerOn(spark)
    val r = spark.sql(
      """SELECT array_dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       array_l2_norm(array(3.0D, 4.0D)) AS n""".stripMargin).head()
    assert(r.getDouble(0) === 11.0)
    assert(r.getDouble(1) === 5.0)
  }

  test("extensions class injects into a fresh session") {
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      // newSession keeps extensions; the builder may return the existing
      // session, so register-on covers that path too
      GraftExtensions.registerOn(s2)
      val d = s2.sql("SELECT array_dot_product(array(2.0D), array(8.0D))").head().getDouble(0)
      assert(d === 16.0)
    } finally ()
  }
}

/** Optimizer fusion of the HOF dot-product pattern into the native
  * kernel (graft.plans.FuseArrayDotProduct). */
class FuseDotSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private val hof =
    "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"

  private def frame = {
    import spark.implicits._
    Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.5, -1.0, 2.0), Array(2.0, 2.0, 2.0))).toDF("a", "b")
  }

  test("rule rewrites the analyzed plan to array_dot_product") {
    val analyzed = frame.selectExpr(s"$hof AS dot").queryExecution.analyzed
    val fused = graft.plans.FuseArrayDotProduct(analyzed)
    assert(fused.expressions.exists(_.exists(
      _.isInstanceOf[graft.functions.ArrayDotProduct])), fused.toString)
    // commuted lambdas fuse too (IEEE * and + are commutative)
    val commuted = frame.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> y * x), 0D, (acc, v) -> v + acc) AS dot")
      .queryExecution.analyzed
    assert(graft.plans.FuseArrayDotProduct(commuted).expressions.exists(_.exists(
      _.isInstanceOf[graft.functions.ArrayDotProduct])))
  }

  test("rule leaves non-dot aggregates alone") {
    val sumAgg = frame.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> x + y), 0D, (acc, v) -> acc + v) AS s")
      .queryExecution.analyzed
    assert(!graft.plans.FuseArrayDotProduct(sumAgg).expressions.exists(_.exists(
      _.isInstanceOf[graft.functions.ArrayDotProduct])))
  }

  test("injected at runtime, fusion preserves results end to end") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ graft.plans.FuseArrayDotProduct
    try {
      // range-derived arrays: literal rows would collapse to a
      // LocalTableScan at plan time and hide the fused expression
      val df = spark.range(2)
        .selectExpr("transform(sequence(0, 2), i -> cast(i + id AS double)) AS a",
          "transform(sequence(0, 2), i -> 2.0D) AS b")
        .selectExpr(s"$hof AS dot")
      assert(df.queryExecution.executedPlan.toString.contains("array_dot_product"),
        df.queryExecution.executedPlan.toString)
      assert(df.orderBy("dot").collect().map(_.getDouble(0)).toSeq === Seq(6.0, 12.0))
    } finally spark.experimental.extraOptimizations = prev
  }
}

/** GraftSession builder produces a working, function-registered session. */
class GraftSessionSpec extends SparkSpec {
  test("builder yields a session with graft functions registered") {
    spark.range(1).count() // ensure the shared fixture session exists
    // getOrCreate returns the shared test session; registration and
    // configs must still apply to it
    val s = GraftSession.builder().name("graft-test").build()
    assert(s.conf.get("spark.sql.session.timeZone") === "UTC")
    val d = s.sql("SELECT array_l2_norm(array(3.0D, 4.0D))").head().getDouble(0)
    assert(d === 5.0)
  }
}
