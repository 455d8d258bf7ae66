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
