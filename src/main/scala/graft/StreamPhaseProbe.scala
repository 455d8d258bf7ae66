package graft

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic (r14, VERDICT r13 ask #6): where do the
  * stream_live_* seconds actually go? Runs each live-streaming qid
  * twice in one JVM (pass 2 = JIT-warm, the bench regime) and dumps,
  * per run: wall, the StreamingQueryProgress durationMs breakdown per
  * micro-batch (addBatch / getBatch / latestOffset / queryPlanning /
  * walCommit / commitOffsets / triggerExecution), state-store commit
  * times, and the residual (wall − Σ triggerExecution) — the query
  * start/stop machinery outside any batch. Dev tool, not driver
  * contract.
  */
object StreamPhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", Warehouse.dir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qids = Seq("stream_live_tumble", "stream_live_state",
      "stream_live_session", "stream_live_join", "stream_live_cdc")
    val listener = new ProgressListener
    spark.streams.addListener(listener)
    for (pass <- 1 to 2; qid <- qids) {
      listener.reset()
      val t0 = System.nanoTime()
      val df = Registry.byId(qid).fn(spark, dir)
      val n = df.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val trig = listener.progress.map(_._2.get("triggerExecution").map(_.toDouble).getOrElse(0.0)).sum / 1e3
      println(f"== pass $pass $qid wall=$wall%.2f s rows=$n batches=${listener.progress.size} " +
        f"sum_triggerExecution=$trig%.2f s residual(start/stop/driver)=${wall - trig}%.2f s")
      listener.progress.zipWithIndex.foreach { case ((rows, m, st), i) =>
        val keys = Seq("addBatch", "getBatch", "latestOffset", "queryPlanning",
          "walCommit", "commitOffsets")
        val parts = keys.flatMap(k => m.get(k).map(v => f"$k=${v / 1e3}%.2f"))
        println(f"   batch$i rows=$rows ${parts.mkString(" ")} $st")
      }
    }
    spark.stop()
  }

  class ProgressListener extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    val progress = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Map[String, Long], String)]
    def reset(): Unit = progress.clear()
    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      import scala.jdk.CollectionConverters._
      val p = e.progress
      val st = p.stateOperators.toSeq.map(s =>
        f"state[commit=${s.allUpdatesTimeMs + s.commitTimeMs}%d ms mem=${s.memoryUsedBytes}]").mkString(" ")
      progress += ((p.numInputRows, p.durationMs.asScala.map { case (k, v) => k -> v.toLong }.toMap, st))
    }
  }
}
