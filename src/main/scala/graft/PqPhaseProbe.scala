package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: first-difference attribution of sim_pq's driver-bench
  * figure (r8: 1.61 → 2.35 s with an unchanged plan — verdict ask #4).
  * Runs the registered query twice in one JVM (cold pass = plan +
  * codegen + execution, warm pass = execution only) and, separately,
  * each phase via a plan-prefix count. Not a driver surface.
  */
object PqPhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", Warehouse.dir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    // bench-prelude-equivalent generic warms (session, parquet, HOFs)
    Class.forName("org.apache.spark.sql.catalyst.util.CollationAwareUTF8String")
    spark.range(1000).groupBy((org.apache.spark.sql.functions.col("id") % 7)).count().count()
    spark.read.parquet(s"$dir/embeddings.parquet").limit(100)
      .selectExpr("aggregate(zip_with(embedding, embedding, (a, b) -> cast(a*b as double)), 0D, (s, v) -> s + v)")
      .count()
    for (pass <- 1 to 3) {
      t(s"sim_pq full pass $pass")(Registry.byId("sim_pq").fn(spark, dir).count())
    }
    spark.stop()
  }
}
