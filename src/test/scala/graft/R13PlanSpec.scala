package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.SortAggregateExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowGroupLimitExec

/** Structural locks for the round-13 plan restatements. Each rewrite
  * keeps results bit-identical (the oracle already locks that); what a
  * correctness suite cannot see is the PLAN regressing back to the
  * measured-slow shape, so these pin the executed-plan property each
  * optimization bought — the Round9PlanSpec pattern.
  */
class R13PlanSpec extends SparkSpec {

  /** Every node of the EXECUTED plan, descending through adaptive
    * wrappers, materialized query stages, and subqueries. */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: allNodes(a.executedPlan)
    case q: QueryStageExec => p +: allNodes(q.plan)
    case _ => p +: (p.children ++ p.subqueries).flatMap(allNodes)
  }

  private def executedNodes(qid: String): Seq[SparkPlan] = {
    val df = Registry.byId(qid).fn(spark, sfDir)
    df.collect()
    allNodes(df.queryExecution.executedPlan)
  }

  test("sim_pq: hash-aggregate encode path, no SortAggregate anywhere") {
    // min(struct(d, c)) forced SortAggregate — a full sort of the
    // n×8×16 joined pair stream before the partial agg. The packed
    // min(d·16 + c) form must keep the whole encode on HashAggregate.
    val nodes = executedNodes("sim_pq")
    assert(nodes.collect { case s: SortAggregateExec => s }.isEmpty,
      "sim_pq's executed plan contains a SortAggregate — the packed-long " +
        "argmin regressed to a sort-based aggregate")
  }

  test("sim_pq: codebook top-16 is a pushed window group limit") {
    // `row_number() - 1 < 16` defeated the WindowGroupLimit rewrite
    // (it pattern-matches predicates on the rank attribute itself), so
    // every subvector row was exchanged into 8 subspace partitions and
    // fully sorted there. The rank-shaped filter must keep the pushed
    // group limit (partial before the exchange + final after) in the
    // executed plan.
    val wgl = executedNodes("sim_pq").collect { case w: WindowGroupLimitExec => w }
    assert(wgl.nonEmpty,
      "sim_pq's executed plan has no WindowGroupLimit — the codebook " +
        "top-16 filter no longer pushes into the window sort")
  }

  test("graph_pagerank: per-round share join shuffle-hashes, never sort-merges") {
    // AQE planned e ⋈ share as SortMergeJoin (the share's size estimate
    // derives from the edge-sized relation, and the cached edge side
    // offers no query-stage boundary to replan around), fully sorting
    // the edge cache every round. The SHUFFLE_HASH hint on the
    // node-sized share is the structural fix — the src-partitioned
    // edge cache satisfies the join's distribution, so a round moves
    // no edge bytes and sorts nothing (and unlike the broadcast(share)
    // draft, the build is per-partition: nothing grows with |nodes|).
    // ranks' returned plan carries the last round's join, so a lost
    // hint shows up here as a SortMergeJoin.
    val nodes = executedNodes("graph_pagerank")
    assert(nodes.collect { case s: SortMergeJoinExec => s }.isEmpty,
      "graph_pagerank's executed plan sort-merge-joins — the " +
        "SHUFFLE_HASH share hint regressed")
    assert(nodes.collect { case j: ShuffledHashJoinExec => j }.nonEmpty,
      "graph_pagerank's executed plan has no shuffled hash join — " +
        "plan shape changed out from under the round-13 lock")
  }

  test("join_skew_salt: the salted join shuffles, it does not broadcast") {
    // The planner broadcast the ×8-EXPLODED dim (serial driver build of
    // the replicated relation, and a broadcast join has no reducer for
    // the salt to spread load over — it voids the capability the qid
    // demonstrates). The SHUFFLE_HASH hint must survive: the salted
    // equi-join itself has to be a shuffled hash join.
    val joins = executedNodes("join_skew_salt")
    assert(joins.collect { case j: ShuffledHashJoinExec => j }.nonEmpty,
      "join_skew_salt's executed plan has no ShuffledHashJoin — the " +
        "SHUFFLE_HASH hint on the exploded dim regressed")
    assert(joins.collect { case j: BroadcastHashJoinExec => j }.isEmpty,
      "join_skew_salt's executed plan broadcast-joins the salted dim — " +
        "the salting demonstration is void under a broadcast")
  }
}
