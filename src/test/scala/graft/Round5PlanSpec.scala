package graft

import org.apache.spark.sql.catalyst.plans.logical.Window

/** Round-5 plan lock (VERDICT r4 "What's wrong" #7): a window with no
  * PARTITION BY serializes the whole relation through one task — fatal
  * at 100 TB unless its input is provably bounded. Exactly two
  * registered queries carry one, each with the bound argument written
  * at the definition site:
  *
  *   - skyline_pareto: windows over DISTINCT (price, size) pairs AFTER
  *     a groupBy — O(|value domain|), not O(rows); the two-phase
  *     bucket-skyline variant is documented for unbounded domains.
  *   - sim_ann_ivf_sweep: windows over the 8-row nprobe sweep table.
  *   - text_bm25: ranks the 10 survivors of an orderBy+limit
  *     (TakeOrderedAndProject) — the window input is O(k) rows.
  *   - join_range_band: the cross-band carry prefix sum runs over ONE
  *     row per 60-second band — bounded by the time range (one row per
  *     minute of history), not by event volume.
  *
  * This suite pins that inventory in BOTH directions: any NEW
  * unpartitioned window fails loudly (a scale regression cannot slip
  * in unnoticed), and the two audited ones must still be present (if a
  * rewrite removes them, the allowlist — and this doc — must shrink
  * with it, keeping list and reality in sync).
  */
class Round5PlanSpec extends SparkSpec {

  test("skyline_pareto and sim_ann_ivf_sweep are the ONLY unpartitioned windows") {
    val allowed = Set("skyline_pareto", "sim_ann_ivf_sweep", "text_bm25",
      "join_range_band")
    val offenders = Registry.all.flatMap { q =>
      // optimizedPlan runs analysis + optimizer only — no job for pure
      // plans; iterative qids do execute their build loops at
      // construction time (the RegistrySpec cost note applies)
      val plan = q.fn(spark, sfDir).queryExecution.optimizedPlan
      val bare = plan.collect { case w: Window if w.partitionSpec.isEmpty => w }
      if (bare.nonEmpty) Some(q.id) else None
    }.toSet
    spark.catalog.clearCache()
    assert((offenders -- allowed).isEmpty,
      s"NEW unpartitioned-window plans (single-task at scale — partition " +
        s"or justify + allowlist): ${(offenders -- allowed).mkString(", ")}")
    assert((allowed -- offenders).isEmpty,
      s"allowlisted unpartitioned windows no longer present — shrink the " +
        s"allowlist: ${(allowed -- offenders).mkString(", ")}")
  }
}
