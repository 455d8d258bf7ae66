package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.util.QueryExecutionListener

/** Diagnostic main: measure how each qid's TOTAL SHUFFLE VOLUME grows
  * with the corpus — the fourth empirical-scale audit (ScanAudit:
  * redundant reads; BroadcastAudit: unbounded broadcast builds;
  * SerialStageAudit: single-partition funnels; this: superlinear
  * shuffle classes). Every qid runs against the 1× and 10× rehearsal
  * corpora and the sum of live shuffle records written across the
  * qid's executions is compared. Row counts, not seconds, so the
  * verdict is immune to host throttling and JIT noise — the property
  * that makes this the right scale probe on a shared box.
  *
  *   - ~10× ratio: the qid shuffles linearly in the corpus — the
  *     cluster answer is "add executors".
  *   - ~100× ratio: something pairwise escaped its cap — an all-pairs
  *     or per-group-quadratic stream that banding/df-caps/bucketing
  *     were supposed to bound. At 1000× the corpus that class is not
  *     slow, it is dead.
  *
  * The threshold is 25× (2.5× superlinear headroom): wedge joins and
  * pair streams over a FIXED degree distribution grow linearly in the
  * corpus (the rehearsal replicates into disjoint id namespaces, so
  * per-key group sizes stay constant by construction — growth along
  * the group-size axis is the ScaleRehearsal tables' subject, not
  * this audit's). Loops contribute each round's shuffles to the sum;
  * a loop whose ROUND COUNT grows with the corpus (log-depth doubling)
  * may flag here without any single shuffle being superlinear — read
  * the per-scale sums against the loop's documented round bound
  * before calling it a defect.
  *
  * Usage: graft.ShuffleGrowthAudit [dir1x] [dir10x]; SPARK_GRAFT_ONLY
  * prefix-filters qids (the Bench contract), SPARK_GRAFT_NO_BCAST
  * gives the non-broadcastable join shapes (the ScanAudit convention).
  *
  * Read DEFAULT-mode ratios with care: a join that AQE broadcasts at
  * 1× but shuffles at 10× jumps from ~0 shuffle rows to corpus-sized —
  * a strategy transition, not a quadratic (r9: sql_surface "609,542×"
  * was 10 rows → one honest shuffle). The NO_BCAST run shuffles at
  * both scales and is the decisive ratio, exactly as with
  * BroadcastAudit's hinted mode.
  *
  * r9 results (no-bcast mode): everything 10.0–13.7× linear except two
  * pair-LISTING queries over the rehearsal's verbatim-replica values —
  * join_fuzzy 28× (identical supplier names ⇒ k² band-block pairs) and
  * dedup_embed 54× (identical vectors share every sign bit ⇒ no key
  * width can split a duplicate group). Both restated distinct-first:
  * band/bucket/verify/score per DISTINCT value, expand through the id
  * tables after matching — post-fix 7.7× and 21×, where the residual
  * is the OUTPUT itself (under duplicate mass the true match list is
  * Σ(multiplicity²): dedup_embed's x10 output is 95,800 rows vs 40 at
  * x1 — every cross-replica copy pair is a genuine near-duplicate).
  * An output-sized floor is inherent to the pair-list interface; the
  * production escape is the cluster-representative output
  * (dedup_clusters).
  */
object ShuffleGrowthAudit {
  /** Total records written by live (non-reused) shuffles in `p`.
    * Cache builds count at the execution that materializes them (the
    * ScanAudit convention) — family ETL paid once is reported once. */
  private[graft] def shuffleRows(p: SparkPlan): Long = p match {
    case a: AdaptiveSparkPlanExec => shuffleRows(a.executedPlan)
    case s: QueryStageExec => shuffleRows(s.plan)
    case _: ReusedExchangeExec => 0L
    case _: InMemoryTableScanExec => 0L
    case e: ShuffleExchangeExec =>
      e.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L) +
        (e.children ++ e.subqueries).map(shuffleRows).sum
    case other =>
      (other.children ++ other.subqueries).map(shuffleRows).sum
  }

  def main(args: Array[String]): Unit = {
    val dir1 = args.headOption.getOrElse("/tmp/graft_scale/x1")
    val dirK = args.drop(1).headOption.getOrElse("/tmp/graft_scale/x10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4, Runtime.getRuntime.availableProcessors()).toString)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", Warehouse.dir)
    if (sys.env.contains("SPARK_GRAFT_NO_BCAST")) {
      builder.config("spark.sql.autoBroadcastJoinThreshold", "-1")
      builder.config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val perExec = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, ns: Long): Unit =
        perExec.add(shuffleRows(qe.executedPlan))
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    })
    def drainSum(): Long = {
      var last = -1
      var stable = 0
      val deadline = System.nanoTime() + 3_000_000_000L
      while (stable < 3 && System.nanoTime() < deadline) {
        Thread.sleep(30)
        val now = perExec.size()
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      var s = 0L
      while (!perExec.isEmpty) s += perExec.poll()
      s
    }

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
    def sweep(dir: String): Map[String, Long] =
      ordered.zipWithIndex.map { case ((name, fn), i) =>
        drainSum()
        try fn(spark, dir).collect()
        catch { case t: Throwable => println(s"ERR $name $dir ${t.getClass.getSimpleName}") }
        val s = drainSum()
        val lastOfFamily = i + 1 >= ordered.size ||
          family(ordered(i + 1)._1) != family(name)
        if (lastOfFamily)
          try spark.catalog.clearCache() catch { case _: Throwable => () }
        name -> s
      }.toMap

    // ratio table + SUPERLINEAR verdicts for one family's 1x/10x pair
    // (shared by both families so threshold/format edits stay single-site)
    def familyReport(a1: Map[String, Long], aK: Map[String, Long],
        d1: String, dK: String): Seq[(String, Long, Long, Double)] = {
      val rs = ordered.map(_._1).map { q =>
        val (a, b) = (a1(q), aK(q))
        val ratio = if (a > 0) b.toDouble / a
          else if (b > 0) Double.PositiveInfinity else 1.0
        (q, a, b, ratio)
      }
      var flagged = 0
      rs.sortBy(-_._4).foreach { case (q, a, b, r) =>
        if (b >= 100000 && r >= 25.0) {
          flagged += 1
          println(f"SUPERLINEAR $r%6.1fx  $q%-24s shuffle rows $a%10d -> $b%10d")
        }
      }
      println(s"qids shuffling >=25x more (>=100k rows) from $d1 to $dK: $flagged")
      rs
    }
    val at1 = sweep(dir1)
    val atK = sweep(dirK)
    val rows = familyReport(at1, atK, dir1, dirK)
    println("-- largest shuffle volumes at 10x (growth context) --")
    rows.sortBy(-_._3).take(10).foreach { case (q, a, b, r) =>
      println(f"  $q%-24s $a%10d -> $b%10d  ($r%5.1fx)")
    }
    // Cross-family absolute-volume invariant (VERDICT r10 ask #5):
    // the ps-family 1× denominators carry a model-snapshot asymmetry
    // (the snapshot build's shuffle doesn't scale with the corpus, so
    // the SKEWED family's small 1× volume inflates the ratio — r10's
    // ps_push read 23.8× on zx while its ABSOLUTE 10× volume was
    // identical to the uniform family's, both linear). A quadratic
    // hiding under that asymmetry cannot also hold the 10× volumes
    // equal across families: skew amplifies any per-group-superlinear
    // term, so equality of the two 10× sums IS the drift tripwire the
    // ratio threshold can't provide for these qids. With dirs 3+4
    // (the OTHER family's 1×/10×), sweep that family too and flag any
    // qid whose 10× volumes diverge >50% (>=100k rows) — turning the
    // documented per-qid footnote into a checked invariant.
    args.drop(2) match {
      case Array(dir1b, dirKb, _*) =>
        println(s"-- cross-family sweep: $dir1b -> $dirKb --")
        val at1b = sweep(dir1b)
        val atKb = sweep(dirKb)
        val rowsB = familyReport(at1b, atKb, dir1b, dirKb)
        // The hard invariant applies ONLY where the ratio test is
        // weakened: qids whose per-family ratio exceeds 15× lean on
        // the documented denominator asymmetry, so for THEM equality
        // of the 10× absolute volumes across families is the drift
        // tripwire (r11 first run: ps_push 23.8× in both families
        // with bit-identical 6,688,820-row 10× volumes — asymmetry
        // confirmed benign). For ordinary ≤15× qids, family deltas
        // are EXPECTED data-distribution effects (zipf shrinks
        // distinct keys → map-side combine output for agg/sketch;
        // value-domain filters pass different masses), measured at 17
        // such qids on the first run — counted, not flagged.
        val ratioA = rows.map(r => r._1 -> r._4).toMap
        val ratioB = rowsB.map(r => r._1 -> r._4).toMap
        var drifted = 0
        var benign = 0
        ordered.map(_._1).foreach { q =>
          val (va, vb) = (atK(q), atKb(q))
          val hi = math.max(va, vb)
          val leansOnAsymmetry = math.max(ratioA(q), ratioB(q)) >= 15.0
          if (hi >= 100000 && math.abs(va - vb) > hi / 2) {
            if (leansOnAsymmetry) {
              drifted += 1
              println(f"ASYMMETRY DRIFT  $q%-24s ratio a=${ratioA(q)}%.1fx b=${ratioB(q)}%.1fx 10x volume $dirK=$va%d $dirKb=$vb%d")
            } else benign += 1
          } else if (leansOnAsymmetry && hi >= 100000) {
            println(f"ASYMMETRY-OK     $q%-24s ratio a=${ratioA(q)}%.1fx b=${ratioB(q)}%.1fx 10x volumes equal ($va%d / $vb%d) - denominator artifact, not drift")
          }
        }
        println(s"high-ratio qids whose 10x volume diverges across families (REAL drift risk): $drifted")
        println(s"ordinary qids with >50% family volume deltas (data-distribution, expected): $benign")
      case _ => ()
    }
    spark.stop()
  }
}
