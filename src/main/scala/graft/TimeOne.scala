package graft
import org.apache.spark.sql.SparkSession
/** Ad-hoc per-query timing harness (dev tool, not part of the driver
  * contract): runs each named qid twice to split JVM warmup from
  * steady-state cost. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", Warehouse.dir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if (args.isEmpty) {
      // full Bench-order sweep, then re-time the slowest-so-far twice
      SparkEntry.queries.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        SparkEntry.queries("dedup_exact")(spark, dir).count()
        println(f"dedup_exact again run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    } else for (q <- args; i <- 1 to 2) {
      val t0 = System.nanoTime()
      Registry.byId(q).fn(spark, dir).count()
      println(f"$q run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
