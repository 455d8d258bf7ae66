package graft

import org.apache.spark.sql.functions._

/** Empirical pin for the checkpoint stats-squaring hazard: the
  * sizeInBytes statistic of an iterative self-join loop must stay
  * BOUNDED across rounds (GraphOps resets stats at each checkpoint);
  * if it compounds, Catalyst's BigInt stats arithmetic becomes the
  * wall-time sink once rounds exceed ~25 (the rootedDepth hang,
  * round 5). */
class StatsGrowthProbe extends SparkSpec {
  import spark.implicits._

  test("connectedComponents round relation carries bounded sizeInBytes stats") {
    // a path graph converges slowly enough to see several rounds
    val edges = (1L until 40L).map(i => (i, i + 1)).toDF("src", "dst")
    val out = operators.GraphOps.connectedComponents(edges)
    assert(out.select(countDistinct(col("lab"))).head().getLong(0) === 1L)
    // the loop's own invariant is asserted inside GraphOps via the
    // stats-reset checkpoint; here we just pin that a multi-round run
    // completes promptly and correctly (the hang regression would blow
    // the suite timeout long before this assert)
    assert(operators.GraphOps.lastRounds >= 3)
  }
}
