package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Diagnostic main: count job-bearing actions per registered qid, in
  * the bench's own name order with its family-boundary cache clears —
  * the suite-wide version of Round8JobCountSpec's listener. Each
  * sequential action pays full scheduling latency on a contended
  * driver host, so a non-loop query showing more than ONE execution
  * (the bench's single count) has hidden eager work worth attributing:
  * an internal loop, a family-memo build, a staged table write, or a
  * driver-side scalar that should be folded into the main plan.
  *
  * Counted as distinct SQL execution ids observed on started jobs
  * (Round8JobCountSpec's definition — raw job counts are AQE-stage
  * artifacts, raw execution counts include job-less registrations).
  *
  * Usage: graft.ActionAudit [sfDir] — prints one line per qid with
  * its action count, worst-first.
  */
object ActionAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
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

    val ids = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val id = j.properties.getProperty("spark.sql.execution.id")
        if (id != null) ids.add(id)
      }
    }
    // listener delivery is async (and the bus drain is private API):
    // poll until the count is stable, Round8JobCountSpec's protocol
    def settled(): Int = {
      var last = -1
      var stable = 0
      val deadline = System.nanoTime() + 3_000_000_000L
      while (stable < 3 && System.nanoTime() < deadline) {
        Thread.sleep(30)
        val now = ids.size()
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      ids.size()
    }
    spark.sparkContext.addSparkListener(listener)

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    def family(name: String): String = name.takeWhile(_ != '_')
    val counts = ordered.zipWithIndex.map { case ((name, fn), i) =>
      val before = settled()
      try fn(spark, sfDir).count()
      catch { case t: Throwable => println(s"ERR $name ${t.getClass.getSimpleName}") }
      val actions = settled() - before
      val lastOfFamily = i + 1 >= ordered.size ||
        family(ordered(i + 1)._1) != family(name)
      if (lastOfFamily)
        try spark.catalog.clearCache() catch { case _: Throwable => () }
      (name, actions)
    }
    counts.sortBy(-_._2).foreach { case (n, c) => println(f"$c%4d  $n") }
    println(s"total actions: ${counts.map(_._2).sum} over ${counts.size} qids")
    spark.stop()
  }
}
