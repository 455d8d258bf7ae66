package graft

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.util.QueryExecutionListener

/** Diagnostic main: count LIVE parquet scans per source file in each
  * qid's executed plans — the suite-wide version of the sketch_tow
  * round-9 finding. A table appearing twice in one final adaptive plan
  * means AQE exchange reuse did NOT collapse two canonically-unequal
  * subtrees over the same data; at fixture scale that is noise, at
  * 100 TB it is a full redundant table read. The usual cause is a
  * pushed-filter mismatch: one branch's join implies IsNotNull on a
  * column the other branch doesn't filter, the scans differ, and
  * nothing upstream canonicalizes equal. The usual fix is free —
  * align the filters explicitly where that is semantically a no-op.
  *
  * "Live" = a FileSourceScan reachable in the FINAL adaptive plan
  * without passing through a ReusedExchange (computed once elsewhere)
  * or an InMemoryTableScan (paid once at cache build, which this audit
  * sees as its own execution). Counts are collected per SQL execution
  * via a QueryExecutionListener, so multi-action qids (loops, eager
  * family builds) report the scans each round actually pays.
  *
  * The driving action is collect(), NOT Bench's count(): under count
  * Catalyst prunes every output column, which can legitimately
  * restructure branches (e.g. collapse groupBy(a,b)->groupBy(a) once
  * the aggregate is unused) and make subtrees diverge that are shared
  * in the materialized plan — sketch_tow single-scans under collect
  * but double-scans under count, by design. The materialized plan is
  * what the correctness gate and a real user pay for.
  *
  * Usage: graft.ScanAudit [sfDir] — prints one line per (qid, file)
  * whose worst single execution scans the file more than once, then a
  * summary. Run order and family-boundary cache clears mirror Bench.
  */
object ScanAudit {
  /** Source files scanned by `p`, one entry per live scan node, tagged
    * with how the scan is consumed — the tag decides whether a
    * duplicate is a SCALE problem:
    *
    *   - `bcast`: under a BroadcastExchange — the duplicate is a
    *     broadcast BUILD of data also read elsewhere. Whether it
    *     persists at production scale depends on whether the shuffled
    *     plan's subtrees canonicalize equal; do NOT assume broadcast
    *     duplicates vanish at scale — rerun with
    *     SPARK_GRAFT_NO_BCAST=1 (broadcast joins disabled, the shape
    *     a non-broadcastable side gets) and read THAT count as the
    *     scale-path answer. r9 measured both outcomes: dedup_embed's
    *     symmetric self-join DOES collapse on the shuffled path,
    *     while the structurally-divergent qids (raw rows vs
    *     aggregated above the scan) did not and needed restatements.
    *   - `subq`: inside a scalar/IN-subquery plan — a separate pass
    *     over the table that the semantics themselves demand.
    *   - `main`: in the main pipeline. A file appearing twice with
    *     tag `main` and identical slice is a real double read in
    *     THIS plan; the fix is a restatement that derives both
    *     consumers from one shuffled relation (see text_langid,
    *     fn_collate, dedup_lines r9) or an aligned subtree that AQE
    *     can reuse (sketch_tow r9).
    */
  private[graft] def liveScans(p: SparkPlan, tag: String = "main"): Seq[String] = p match {
    case a: AdaptiveSparkPlanExec => liveScans(a.executedPlan, tag)
    case s: QueryStageExec => liveScans(s.plan, tag)
    case _: ReusedExchangeExec => Nil
    case _: InMemoryTableScanExec => Nil
    case f: FileSourceScanExec =>
      // key on (file, pushed filters, read schema): two scans of the
      // same file reading DIFFERENT slices (set ops over disjoint
      // filters, SCD2's current-vs-history split) are legitimate
      // partial reads at scale; two IDENTICAL scans are a redundancy
      val filters = f.dataFilters.map(_.sql).sorted.mkString(" AND ")
      val schema = f.requiredSchema.fieldNames.sorted.mkString(",")
      f.relation.location.rootPaths.map(p => s"${p.getName}[$schema][$filters]" -> tag)
        .map { case (k, t) => s"$t $k" }.toSeq
    case b: BroadcastExchangeExec =>
      (b.children.flatMap(liveScans(_, "bcast"))
        ++ b.subqueries.flatMap(liveScans(_, "subq")))
    case other =>
      (other.children.flatMap(liveScans(_, tag))
        ++ other.subqueries.flatMap(liveScans(_, "subq")))
  }

  /** Live (non-reused) shuffle exchanges in `p`. Two live exchanges in
    * one execution whose canonicalized plans are semantically equal are
    * a MISSED reuse: identical data, identically partitioned, computed
    * twice — either an AQE canonicalization near-miss worth
    * restructuring around, or work that should derive from one shared
    * relation. (ScanAudit's scan metric only sees duplicates that reach
    * a parquet scan; this catches recomputed DERIVED relations too.) */
  private[graft] def liveExchanges(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => liveExchanges(a.executedPlan)
    case s: QueryStageExec => liveExchanges(s.plan)
    case _: ReusedExchangeExec => Nil
    case _: InMemoryTableScanExec => Nil
    case e: ShuffleExchangeExec =>
      e +: (e.children ++ e.subqueries).flatMap(liveExchanges)
    case other =>
      (other.children ++ other.subqueries).flatMap(liveExchanges)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4, Runtime.getRuntime.availableProcessors()).toString)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", Warehouse.dir)
    // scale-path mode: disable broadcast joins so every join takes the
    // shape it would with a non-broadcastable (100 TB) side, and the
    // audit reports the scan counts THAT plan pays
    if (sys.env.contains("SPARK_GRAFT_NO_BCAST")) {
      builder.config("spark.sql.autoBroadcastJoinThreshold", "-1")
      builder.config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // per-execution scan multisets, drained between qids; listener
    // delivery is async, so the drain polls until stable (the
    // ActionAudit protocol)
    val executions = new java.util.concurrent.ConcurrentLinkedQueue[Seq[String]]()
    val exchDupes = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, ns: Long): Unit = {
        executions.add(liveScans(qe.executedPlan))
        liveExchanges(qe.executedPlan)
          .groupBy(_.canonicalized.semanticHash()).values
          .filter(g => g.size > 1 && g.sliding(2).forall {
            case Seq(x, y) => x.sameResult(y); case _ => true
          })
          .foreach(g => exchDupes.add(
            s"${g.size}x ${g.head.outputPartitioning}"))
      }
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    })
    def drain(): Seq[Seq[String]] = {
      var last = -1
      var stable = 0
      val deadline = System.nanoTime() + 3_000_000_000L
      while (stable < 3 && System.nanoTime() < deadline) {
        Thread.sleep(30)
        val now = executions.size()
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      val out = mutable.Buffer[Seq[String]]()
      while (!executions.isEmpty) out += executions.poll()
      out.toSeq
    }

    // dev-only prefix filter (uniform across the four audit mains):
    // re-check just the qids a fix touched without a full sweep
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
      // stream_live_* execute via IncrementalExecution, which never
      // reaches QueryExecutionListener — running them here would pay
      // seconds of streaming machinery per sweep to audit only the
      // trivial post-sink batch fragment, recording HOLLOW coverage.
      // Their scale story is the batch twins' (same shapes) plus the
      // StreamingMlSpec equality proofs; excluded LOUDLY:
      .filterNot { case (n, _) =>
        val skip = n.startsWith("stream_live")
        if (skip) println(s"SKIP $n (streaming IncrementalExecution is invisible to QueryExecutionListener)")
        skip
      }
    def family(name: String): String = name.takeWhile(_ != '_')
    var flagged = 0
    var mainFlagged = 0
    var exchFlagged = 0
    ordered.zipWithIndex.foreach { case ((name, fn), i) =>
      drain()
      try fn(spark, sfDir).collect()
      catch { case t: Throwable => println(s"ERR $name ${t.getClass.getSimpleName}") }
      val execs = drain()
      // worst single execution per file (the redundant-read signal) and
      // the total across executions (loop context)
      // group by the slice key (tag stripped); report the tag multiset
      // so broadcast-choice duplicates are visibly distinct from real
      // main-pipeline double reads
      val worst = mutable.Map[String, Int]().withDefaultValue(0)
      val total = mutable.Map[String, Int]().withDefaultValue(0)
      val tags = mutable.Map[String, mutable.Buffer[String]]()
      execs.foreach { sc =>
        sc.map(_.split(" ", 2)).map { case Array(t, k) => (k, t) }
          .groupBy(_._1).foreach { case (f, hits) =>
            worst(f) = math.max(worst(f), hits.size)
            total(f) += hits.size
            tags.getOrElseUpdate(f, mutable.Buffer()) ++= hits.map(_._2)
          }
      }
      worst.toSeq.sortBy(-_._2).foreach { case (f, w) =>
        if (w > 1) {
          flagged += 1
          val mains = tags(f).count(_ == "main")
          if (mains > 1) mainFlagged += 1
          println(f"$w%3d in one exec (${total(f)}%3d over ${execs.size}%2d execs, tags=${tags(f).sorted.mkString("/")})  $name%-24s $f")
        }
      }
      while (!exchDupes.isEmpty) {
        exchFlagged += 1
        println(s"EXCH missed reuse  $name  ${exchDupes.poll()}")
      }
      val lastOfFamily = i + 1 >= ordered.size ||
        family(ordered(i + 1)._1) != family(name)
      if (lastOfFamily)
        try spark.catalog.clearCache() catch { case _: Throwable => () }
    }
    println(s"flagged (identical slice scanned >1x in a single execution): $flagged")
    println(s"of which >1 main-pipeline reads (the real scale findings): $mainFlagged")
    println(s"missed exchange reuses (semantically-equal live shuffles): $exchFlagged")
    spark.stop()
  }
}
