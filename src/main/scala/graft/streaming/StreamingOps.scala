package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode,
  TimerValues, Trigger, ValueState}

/** True Structured Streaming restatements of the reference's streaming
  * semantics (SURVEY §2.C stream_* rows, §7.3 step 7). The oracle-checked
  * batch analogs live in `operators.EventStream`; these run the same
  * computations through `readStream` → incremental plans → sinks, which
  * is the deployment shape on an unbounded 100-TB/day feed:
  *
  *  - event-time tumbling windows + watermark (late-data tolerance),
  *  - exact dedup by event_id with watermark-bounded state,
  *  - arbitrary keyed state via `mapGroupsWithState` — the closest
  *    Spark analog of the reference's per-worker mutable state
  *    (`WorkerLogic.onRecv` [K-high]): state lives per key, updates per
  *    micro-batch, and is checkpoint-consistent (which the reference's
  *    iteration loop notably was not — SURVEY §2.D).
  *
  * All helpers read the events parquet as a file stream with
  * `Trigger.AvailableNow` and write to an in-memory sink, so they run
  * bounded and deterministic (single final flush) — the capability
  * proof the ScalaTest suite asserts against the batch analog.
  */
object StreamingOps {

  /** Read the events table as a file stream (schema pinned from a batch
    * read; ns timestamps normalized the same way as Tables.events).
    * The file-stream source watches a directory, so the fixture's single
    * parquet file is staged into a temp dir once per (dir) — in
    * production this is simply the landing directory new files arrive in.
    */
  def eventStream(spark: SparkSession, dir: String): DataFrame = {
    val src = java.nio.file.Paths.get(dir, "events.parquet")
    // the source may be a single parquet FILE (the fixtures) or a
    // multi-part parquet DIRECTORY (the rehearsal corpora, any real
    // Spark-written table): enumerate the data files either way.
    // Files.copy on a directory copies NO entries (javadoc) — the
    // single-file-only staging silently produced an EMPTY stream for
    // directory sources (caught by the r10 continuation code review).
    val srcFiles: Seq[java.nio.file.Path] =
      if (java.nio.file.Files.isDirectory(src)) {
        val listing = java.nio.file.Files.list(src)
        try listing.iterator().asScala
          .filter { p =>
            val n = p.getFileName.toString
            java.nio.file.Files.isRegularFile(p) &&
              !n.startsWith("_") && !n.startsWith(".")
          }.toSeq.sortBy(_.getFileName.toString)
        finally listing.close()
      } else Seq(src)
    require(srcFiles.nonEmpty, s"no parquet data files under $src")
    // key the staging dir by the source's (names, sizes, mtimes) so a
    // regenerated fixture restages instead of replaying a stale copy
    // under a pinned schema
    val stageKey = (dir +: srcFiles.map { p =>
      val a = java.nio.file.Files.readAttributes(
        p, classOf[java.nio.file.attribute.BasicFileAttributes])
      (p.getFileName.toString, a.size(), a.lastModifiedTime().toMillis)
    }).hashCode()
    val tmpRoot = java.nio.file.Paths.get(graft.Scratch.tmpRoot)
    // a regenerated fixture gets a NEW key: drop superseded stage dirs
    // for this source so regenerations don't leak temp disk forever
    val prefix = "graft_stream_" + Integer.toHexString(dir.hashCode) + "_"
    val stageName = prefix + Integer.toHexString(stageKey)
    try {
      val listing = java.nio.file.Files.list(tmpRoot)
      try listing.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith(prefix) &&
          p.getFileName.toString != stageName)
        .foreach { stale =>
          val files = java.nio.file.Files.walk(stale)
          try files.iterator().asScala.toSeq.reverseIterator
            .foreach(f => java.nio.file.Files.deleteIfExists(f))
          finally files.close()
        }
      finally listing.close()
    } catch { case _: java.io.IOException => () }
    val staged = tmpRoot.resolve(stageName)
    java.nio.file.Files.createDirectories(staged)
    srcFiles.foreach { f =>
      // a directory source's part files keep their names; a file source
      // stages as events.parquet (the historical single-file layout)
      val target = staged.resolve(
        if (srcFiles.size == 1) "events.parquet" else f.getFileName.toString)
      if (!java.nio.file.Files.exists(target)) {
        // copy to a unique temp name, then ATOMIC_MOVE into place: the
        // target either doesn't exist or is a complete copy, even if a
        // JVM dies mid-copy or two JVMs stage concurrently (the loser's
        // move just finds the target already present)
        val tmp = java.nio.file.Files.createTempFile(staged, ".stage_", ".tmp")
        try {
          java.nio.file.Files.copy(f, tmp,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          try java.nio.file.Files.move(tmp, target,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          catch { case _: java.nio.file.FileAlreadyExistsException => () }
        } finally java.nio.file.Files.deleteIfExists(tmp)
      }
    }
    val raw = spark.readStream
      .schema(spark.read.parquet(s"$dir/events.parquet").schema)
      .parquet(staged.toString)
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** Run a streaming DF to completion (AvailableNow) into a memory sink
    * and return the final table. An existing temp view under `name` is
    * dropped first, so DETERMINISTIC names (one per capability × source
    * dir) replace their previous run's sink instead of accumulating —
    * re-running a qid in a long-lived session (the registry determinism
    * spec, the driver's double hash-compare, audit sweeps) leaks no
    * views. A previously-returned DataFrame stays readable: its
    * resolved plan references the old sink relation directly, not the
    * catalog name. */
  def runToTable(spark: SparkSession, sdf: DataFrame, name: String,
      mode: OutputMode): DataFrame = {
    spark.catalog.dropTempView(name)
    // State-store hygiene (VERDICT r10 ask #3): a stateful streaming
    // operator materializes ONE state store per shuffle partition per
    // micro-batch — under the session's batch-sized 32 partitions the
    // watermarked window agg pays 32 HDFS-backed store loads/commits/
    // snapshots × every batch INCLUDING the no-data watermark-advance
    // batch, for state that fits in a handful of partitions at any
    // fixture scale (~160 windows / ~2k users). That fixed machinery,
    // not the data, dominated the r10 driver's stream_live_tumble
    // entry (292 CPU-s, the suite's worst). Pin the stream's shuffle
    // width to a state-size-matched count for the duration of the run
    // (the plan captures it at start()), then restore. Partition count
    // never changes results (the Det ground rule); on a real cluster
    // this is the same knob sized UP to state volume ÷ executor
    // memory — it is per-deployment state sizing either way, not a
    // fixture hack, and SPARK_GRAFT_STREAM_PARTS overrides it.
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "8"))
    // Explicit per-run checkpoint dir on fast scratch (guide §6 /
    // [[graft.Scratch]]): without it Spark places the temp checkpoint
    // under java.io.tmpdir — the contended shared disk — and every
    // micro-batch pays state-store delta/commit fsync latency there
    // (the streaming family's fixed cost is exactly this machinery).
    // UNIQUE per run (pid + counter), never reused: a reused
    // checkpoint would make a re-run resume from committed offsets
    // and process nothing. Deleted in the finally — on tmpfs the
    // recursive delete is microseconds, and leaking it would slowly
    // eat the RAM-backed mount.
    val chk = java.nio.file.Paths.get(graft.Scratch.tmpRoot,
      s"graft_chk_${ProcessHandle.current().pid()}_${chkSeq.incrementAndGet()}")
    try {
      val q = sdf.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", chk.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // execution evidence of the pin for the spec: the state
      // operator's partition count as the stream ACTUALLY ran it
      // (None for stateless streams)
      lastStateStoreParts = q.recentProgress.toSeq
        .flatMap(_.stateOperators).lastOption.map(_.numShufflePartitions)
    } finally {
      spark.conf.set(key, prev)
      try graft.sources.Snapshots.deleteRecursively(chk)
      catch { case _: Throwable => () }
    }
    spark.table(name)
  }

  /** Monotone suffix for [[runToTable]] checkpoint dirs — pid alone is
    * not unique across the many runs inside one JVM. */
  private val chkSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** numShufflePartitions of the most recent stateful stream run
    * through [[runToTable]] — observability hook for the width-pin
    * spec; diagnostics only, never read by query code. */
  @volatile private[graft] var lastStateStoreParts: Option[Long] = None

  /** One deterministic memory-sink view name per (capability, dir) —
    * the bound that keeps repeated qid constructions from growing the
    * catalog (see [[runToTable]]). */
  private def sinkName(cap: String, dir: String): String =
    s"${cap}_${Integer.toHexString(dir.hashCode)}"

  /** Tumbling 1-hour event-time counts with a 10-minute watermark. */
  def tumblingCounts(spark: SparkSession, dir: String): DataFrame =
    runToTable(spark,
      eventStream(spark, dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n")),
      sinkName("tumble", dir), OutputMode.Append())
      .select(col("window.start").as("h"), col("event_type"), col("n"))

  /** Exact streaming dedup by event_id with watermark-bounded state. */
  def streamingDedup(spark: SparkSession, dir: String): DataFrame =
    runToTable(spark,
      eventStream(spark, dir)
        .withWatermark("ts", "10 minutes")
        .dropDuplicates("event_id"),
      sinkName("dedup", dir), OutputMode.Append())

  /** Event-time sessionization (2-hour gap) via flatMapGroupsWithState —
    * the canonical arbitrary-stateful streaming operator and the true
    * streaming form of the batch `stream_session` qid. State = the open
    * session per user; every closed session is emitted. With
    * AvailableNow the final batch flushes all remaining state, so on a
    * bounded input the output equals the batch sessionization. */
  def streamingSessions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val gapUs = 2L * 3600 * 1000000
    val ev = eventStream(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts)").as("ts_us"), col("event_id"))
      .as[(Long, Long, Long)]
    // state: (sessStart, sessEnd, nEvents) of the open session
    val out = ev.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), (Long, Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user, rows, state: GroupState[(Long, Long, Long)]) =>
          // within one micro-batch, order by (ts, event_id) as batch does
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
          var acc = state.getOption
          val closed = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
          sorted.foreach { case (_, ts, _) =>
            acc match {
              case Some((s, e, n)) if ts - e <= gapUs => acc = Some((s, ts, n + 1))
              case Some((s, e, n)) =>
                closed += ((user, s, e, n)); acc = Some((ts, ts, 1L))
              case None => acc = Some((ts, ts, 1L))
            }
          }
          acc.foreach(state.update)
          // bounded input: the single batch sees everything — emit the
          // open session too (the final flush a watermark would do)
          (closed ++ acc.map(a => (user, a._1, a._2, a._3))).iterator
      }
      .toDF("user_id", "sess_start_us", "sess_end_us", "n_events")
    runToTable(spark, out, sinkName("sessions", dir), OutputMode.Append())
  }

  /** Arbitrary keyed state: per-user running counter + max value via
    * mapGroupsWithState — the PS worker-state analog in streaming. */
  def statefulUserAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev: Dataset[(Long, Double)] = eventStream(spark, dir)
      .select(col("user_id"), col("value")).as[(Long, Double)]
    val out = ev.groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), (Long, Long, Double)](
        GroupStateTimeout.NoTimeout()) {
        case (user, rows, state: GroupState[(Long, Double)]) =>
          val (n0, mx0) = state.getOption.getOrElse((0L, Double.MinValue))
          var n = n0
          var mx = mx0
          rows.foreach { case (_, v) => n += 1; if (v > mx) mx = v }
          state.update((n, mx))
          (user, n, mx)
      }
      .toDF("user_id", "n_events", "max_value")
    runToTable(spark, out, sinkName("stateful", dir), OutputMode.Update())
  }

  /** Per-user running (count, max) as a Spark 4 `StatefulProcessor` —
    * the state-v2 `transformWithState` form of [[statefulUserAgg]].
    * State is an explicit named `ValueState` handle (RocksDB-backed;
    * the v2 API requires the RocksDB state store provider), which is
    * the closest Spark analog yet of the reference's per-worker mutable
    * parameter storage [K-high]: named state slots per key, TTL
    * support, and timers — mapGroupsWithState's single opaque state
    * value, generalized. */
  class RunningUserAgg
      extends StatefulProcessor[Long, (Long, Double), (Long, Long, Double)] {
    @transient private var agg: ValueState[(Long, Double)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      agg = getHandle.getValueState[(Long, Double)]("agg",
        Encoders.product[(Long, Double)], TTLConfig.NONE)
    override def handleInputRows(user: Long, rows: Iterator[(Long, Double)],
        timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
      val (n0, mx0) = if (agg.exists()) agg.get() else (0L, Double.MinValue)
      var n = n0
      var mx = mx0
      rows.foreach { case (_, v) => n += 1; if (v > mx) mx = v }
      agg.update((n, mx))
      Iterator.single((user, n, mx))
    }
  }

  /** Event-time sessionization with TIMERS (state v2): the open session
    * per user lives in a named ValueState; every arriving batch extends
    * or closes it, and an event-time timer registered at
    * `sessionEnd + gap` closes quiet sessions when the WATERMARK passes
    * that instant — the push-based expiry the reference's windowed
    * worker state needs, which mapGroupsWithState could only poll for.
    * In-batch closures emit immediately; timer closures emit from
    * `handleExpiredTimer`. Sessions still open when the watermark stops
    * advancing (each user's last burst on a bounded input) stay in
    * state, exactly as on an unbounded stream. */
  class SessionProcessor(gapUs: Long)
      extends StatefulProcessor[Long, (Long, Long, Long), (Long, Long, Long, Long)] {
    @transient private var sess: ValueState[(Long, Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[(Long, Long, Long)]("open_session",
        Encoders.product[(Long, Long, Long)], TTLConfig.NONE)
    override def handleInputRows(user: Long, rows: Iterator[(Long, Long, Long)],
        timerValues: TimerValues): Iterator[(Long, Long, Long, Long)] = {
      val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
      var acc = if (sess.exists()) Some(sess.get()) else None
      acc.foreach { case (_, e, _) => getHandle.deleteTimer(e / 1000 + gapUs / 1000) }
      val closed = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
      sorted.foreach { case (_, ts, _) =>
        acc match {
          case Some((s, e, n)) if ts - e <= gapUs => acc = Some((s, ts, n + 1))
          case Some((s, e, n)) =>
            closed += ((user, s, e, n)); acc = Some((ts, ts, 1L))
          case None => acc = Some((ts, ts, 1L))
        }
      }
      acc.foreach { a =>
        sess.update(a)
        getHandle.registerTimer(a._2 / 1000 + gapUs / 1000)
      }
      closed.iterator
    }
    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long, Long, Long)] = {
      if (!sess.exists()) Iterator.empty
      else {
        val (s, e, n) = sess.get()
        if (e / 1000 + gapUs / 1000 <= expiredTimerInfo.getExpiryTimeInMs()) {
          sess.clear()
          Iterator.single((user, s, e, n))
        } else Iterator.empty
      }
    }
  }

  /** Run [[SessionProcessor]] (2-hour gap) over the event stream and
    * return every session closed either in-batch or by timer expiry. */
  def timerSessions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val gapUs = 2L * 3600 * 1000000
      val ev = eventStream(spark, dir)
        .withWatermark("ts", "10 minutes")
        .select(col("user_id"), expr("unix_micros(ts)").as("ts_us"), col("event_id"))
        .as[(Long, Long, Long)]
      val out = ev.groupByKey(_._1)
        .transformWithState(new SessionProcessor(gapUs), TimeMode.EventTime(),
          OutputMode.Append())
        .toDF("user_id", "sess_start_us", "sess_end_us", "n_events")
      runToTable(spark, out, sinkName("timer_sessions", dir),
        OutputMode.Append())
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  /** Run [[RunningUserAgg]] over the event stream via
    * `transformWithState` and return the final per-user table. */
  def statefulUserAggV2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ev: Dataset[(Long, Double)] = eventStream(spark, dir)
        .select(col("user_id"), col("value")).as[(Long, Double)]
      val out = ev.groupByKey(_._1)
        .transformWithState(new RunningUserAgg, TimeMode.None(),
          OutputMode.Update())
        .toDF("user_id", "n_events", "max_value")
      runToTable(spark, out, sinkName("stateful_v2", dir),
        OutputMode.Update())
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  /** Stream-stream interval join: purchases within 1 hour after a click
    * by the same user — the true streaming form of the batch
    * `join_interval` qid. Both sides carry watermarks and the join
    * condition bounds event time on both ends, so each side's buffered
    * state is evicted once the other side's watermark passes — bounded
    * state on an unbounded stream, the property that makes this run
    * forever on a real cluster. On the bounded fixture with AvailableNow
    * the final flush makes the pair set equal to the batch join
    * (asserted in StreamingMlSpec).
    */
  def streamStreamJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventStream(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "10 minutes")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("p_ts"),
        col("event_id").as("purch_id"))
      .withWatermark("p_ts", "2 hours")
    val pairs = clicks.join(purchases,
      col("cu") === col("pu") &&
        col("p_ts") > col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"))
    runToTable(spark, pairs.select(col("cu").as("user_id"),
        col("click_id"), col("purch_id")),
      sinkName("ssjoin", dir), OutputMode.Append())
  }

  /** Streaming CDC apply — the true streaming form of the table_merge
    * qid. Change batches land as files; `foreachBatch` applies each
    * microbatch to the target with the SAME merge step the batch qid
    * uses (full-outer key join + action resolution), which is exactly
    * how a lakehouse streaming-MERGE sink is driven (foreachBatch +
    * MERGE INTO per microbatch). `maxFilesPerTrigger=1` forces the CDC
    * batch through as two genuine microbatches; the split is by key
    * hash, so each key's single action rides exactly one batch and
    * sequential application is order-safe. The evolving target is
    * localCheckpointed per batch (the iterative-loop lineage rule).
    * StreamingMlSpec asserts the result equals the one-shot batch
    * merge on the same input.
    */
  def streamingCdcMerge(spark: SparkSession, dir: String): DataFrame = {
    val staged = java.nio.file.Paths.get(
      graft.Scratch.tmpRoot,
      // v2: staged content changed when cdcBatch moved to max-derived
      // insert keys — version the path so a pre-change staging (the
      // _DONE marker outlives the JVM) can never be replayed
      "graft_cdc_v2_" + Integer.toHexString(dir.hashCode))
    val rel = graft.operators.Relational
    val cdc = rel.cdcBatch(spark, dir)
    if (!java.nio.file.Files.exists(staged.resolve("_DONE"))) {
      java.nio.file.Files.createDirectories(staged)
      for (b <- 0 to 1) {
        cdc.filter(pmod(xxhash64(col("o_orderkey")), lit(2)) === b)
          .coalesce(1).write.mode("overwrite")
          .parquet(staged.resolve(s"batch$b").toString)
      }
      java.nio.file.Files.createFile(staged.resolve("_DONE"))
    }
    var state = rel.mergeTarget(spark, dir).localCheckpoint()
    val stream = spark.readStream
      .schema(cdc.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(staged.toString + "/batch*")
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val next = rel.mergeStep(state, batch).localCheckpoint()
        graft.operators.GraphOps.freeCheckpoint(state)
        state = next
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    state.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("price_cents")).as("total_cents"))
      .orderBy(col("o_orderpriority"))
  }
}
