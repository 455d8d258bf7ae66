package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Diagnostic main: where does a qid's PROCESS CPU actually go?
  *
  * The r10 bench CPU channel showed single qids burning 100+
  * CPU-core-seconds on kilobyte-scale data (graph_pagerank: 137 cpu-s
  * for a 3-iteration loop over a ~1M-edge graph). This probe runs one
  * qid (args(0)) at one sfDir (args(1), default sf0.1) and splits its
  * process-CPU delta into:
  *   - task CPU (Σ stage executorCpuTime — work inside task threads)
  *   - task wall (Σ stage executorRunTime — includes spin/waits inside
  *     tasks)
  *   - everything else (driver: planning, codegen, AQE, scheduler)
  * Task CPU ≈ process CPU ⇒ the burn is real per-task work (or
  * in-task spinning); task CPU ≪ process CPU ⇒ driver-side.
  */
object CpuProbe {
  def main(args: Array[String]): Unit = {
    val qid = args.headOption.getOrElse("graph_pagerank")
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
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
    @volatile var taskCpuNs = 0L
    @volatile var taskRunMs = 0L
    @volatile var nTasks = 0L
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(String, Double, Double, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        taskCpuNs += sc.stageInfo.taskMetrics.executorCpuTime
        taskRunMs += sc.stageInfo.taskMetrics.executorRunTime
        nTasks += sc.stageInfo.numTasks
        stages.add((sc.stageInfo.name.takeWhile(_ != '\n').take(90),
          sc.stageInfo.taskMetrics.executorCpuTime / 1e9,
          sc.stageInfo.taskMetrics.executorRunTime / 1e3,
          sc.stageInfo.numTasks))
      }
    })
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    // small generic warm so the measured run isn't dominated by first-JIT
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // dev A/B hook: columnar-cache compression on/off
    if (sys.env.contains("SPARK_GRAFT_NO_CACHE_COMPRESS"))
      spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", false)
    // synthetic micro-benchmarks instead of a qid:
    //   CACHE_TEST  — persist+count a 2.4M x 3-long relation (the
    //                 withDeg shape) with columnar compression on/off
    //   SHUFFLE_TEST — one repartition+agg of the same relation, no cache
    if (qid == "CACHE_TEST" || qid == "SHUFFLE_TEST") {
      def rel = spark.range(2400000L).selectExpr(
        "id % 20000 AS src", "(id * 7) % 20000 AS dst", "id % 40 + 1 AS deg")
      for (compressed <- Seq(true, false)) {
        spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", compressed)
        val c0 = os.getProcessCpuTime; val t0 = System.nanoTime()
        if (qid == "CACHE_TEST") {
          val d = rel.repartition(col("src")).persist()
          d.count()
          val c1 = os.getProcessCpuTime; val t1 = System.nanoTime()
          println(f"cache build (compressed=$compressed): wall=${(t1 - t0) / 1e9}%.2f cpu=${(c1 - c0) / 1e9}%.1f")
          d.groupBy(col("dst")).count().count() // one scan of the cache
          println(f"cache scan  (compressed=$compressed): wall=${(System.nanoTime() - t1) / 1e9}%.2f cpu=${(os.getProcessCpuTime - c1) / 1e9}%.1f")
          d.unpersist(true)
        } else {
          rel.repartition(col("src")).groupBy(col("dst")).count().count()
          println(f"shuffle+agg (compressed=$compressed irrelevant): wall=${(System.nanoTime() - t0) / 1e9}%.2f cpu=${(os.getProcessCpuTime - c0) / 1e9}%.1f")
        }
      }
      spark.stop(); return
    }
    val fn = Registry.byId(qid).fn
    Thread.sleep(500)
    val c0 = os.getProcessCpuTime
    val (t0, cpu0, run0, nt0) = (System.nanoTime(), taskCpuNs, taskRunMs, nTasks)
    fn(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    // let straggler stage-completed events drain
    Thread.sleep(1000)
    val procCpu = (os.getProcessCpuTime - c0) / 1e9
    val tCpu = (taskCpuNs - cpu0) / 1e9
    val tRun = (taskRunMs - run0) / 1e3
    println(f"qid=$qid wall=$wall%.2f proc_cpu=$procCpu%.1f " +
      f"task_cpu=$tCpu%.1f task_run=$tRun%.1f tasks=${nTasks - nt0} " +
      f"other_cpu=${procCpu - tCpu}%.1f")
    import scala.jdk.CollectionConverters._
    stages.asScala.toSeq.sortBy(-_._2).take(12).foreach { case (n, c, r, t) =>
      println(f"  stage cpu=$c%7.1f run=$r%7.1f tasks=$t%4d  $n")
    }
    spark.stop()
  }
}
