package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: time individual registered qids on a given SF dir,
  * in the given order, WITHOUT clearing caches between them — for
  * attributing bench deltas to a single query or a family-shared
  * relation. Not part of the driver contract.
  *
  * Usage: graft.TimeQuery <sfDir> <qid> [qid...]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
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
    spark.sparkContext.setLogLevel("WARN")
    // same one-time warmup the bench runs
    Class.forName("org.apache.spark.sql.catalyst.util.CollationAwareUTF8String")
    spark.range(1000).groupBy((org.apache.spark.sql.functions.col("id") % 7)).count().count()
    for (qid <- args.drop(1)) {
      val t0 = System.nanoTime()
      val rows = Registry.byId(qid).fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"qid":"$qid","sec":$sec%.2f,"rows":$rows}""")
    }
    spark.stop()
  }
}
