package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives for the dedup pipeline. The only one a
  * training-data pipeline genuinely needs is connected components:
  * near-dup similarity is not transitive, so verified pairs must
  * collapse into components before a keep-one policy can act (else
  * chains A~B~C yield two contradictory keep-one decisions).
  */
object GraphOps {

  /** Connected components by synchronous min-label propagation with
    * pointer jumping.
    *
    * Input: an edge list with two long columns `src`, `dst` (undirected
    * semantics; direction and duplicates are normalized internally).
    * Output: one row per distinct endpoint — (`id`, `lab`) where `lab`
    * is the minimum node id of the component. Exact and deterministic,
    * so a DuckDB recursive-CTE closure can oracle it (dedup_clusters).
    *
    * Shape per round: one co-partitioned join (edges ⋈ labels on the
    * node id) + one min-groupBy — both map-side combinable. Shortcut
    * edges (lab → id) are added to the propagation relation each round,
    * so label information travels 2^r hops after r rounds (pointer
    * jumping): O(log diameter) rounds, the HashToMin bound. Fixpoint is
    * detected by the strictly-decreasing exact label sum going stable —
    * one cheap aggregate per round, no driver-side row materialization.
    *
    * Every round localCheckpoints (eager): `next` references `labels`
    * twice (directly and through the messages), so an uncut lineage
    * DOUBLES per round — exponential logical-plan growth that OOMs plan
    * stringification long before any data is at risk. On a real cluster
    * the same loop uses reliable checkpoint() to DFS every few rounds
    * (the GraphFrames/GraphX iteration contract); the blocks here are
    * one (id, lab) pair per node — O(nodes), never O(edges).
    */
  def connectedComponents(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .persist()
    val undirected = e.unionByName(
      e.select(col("dst").as("src"), col("src").as("dst")))
    var labels = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct()
      .withColumn("lab", col("id"))
      .localCheckpoint()
    def labSum(df: DataFrame): Long =
      df.agg(coalesce(sum(col("lab")), lit(0L))).head.getLong(0)
    var s = labSum(labels)
    // no explicit empty check: an empty label set sums to 0, the first
    // round's sum is also 0, and the loop exits after one trivial round
    var converged = false
    while (!converged) {
      val hops = undirected.unionByName(
        labels.select(col("lab").as("src"), col("id").as("dst")))
      val msgs = hops.join(labels, col("src") === col("id"))
        .select(col("dst").as("id"), col("lab"))
      val next = labels.select(col("id"), col("lab")).unionByName(msgs)
        .groupBy(col("id"))
        .agg(min(col("lab")).as("lab"))
        .localCheckpoint()
      val nextSum = labSum(next)
      labels = next
      converged = nextSum == s
      s = nextSum
    }
    e.unpersist()
    labels
  }
}
