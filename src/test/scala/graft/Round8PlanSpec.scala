package graft

import org.apache.spark.sql.catalyst.expressions.{Expression, Md5}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, LogicalPlan}
import org.apache.spark.sql.functions._

/** Structural locks for the round-8 restatements that correctness
  * tests can't see (moving them back would keep results identical and
  * only re-inflate the cost):
  *
  *  - dedup_minhash hashes signatures per DISTINCT shingle: every
  *    md5-of-shingle expression must sit BELOW the explode of the
  *    basket doc arrays (hashing after the explode would be the old
  *    per-posting shape — ~10× the md5 work for identical minima).
  *  - Tables.table and marker-validated Snapshots reads are memoized
  *    per application — the same call must return the SAME plan
  *    instance, or every qid re-pays ~60 ms of driver file listing +
  *    footer read (measured: 200 re-reads = 11.7 s).
  */
class Round8PlanSpec extends SparkSpec {

  private def md5OnShingle(e: Expression): Boolean = e.exists {
    case m: Md5 => m.references.exists(_.name == "shingle")
    case _ => false
  }

  test("dedup_minhash: md5(shingle) only below the basket docs explode") {
    val plan = operators.LlmPipeline
      .dedupMinhash(spark, sfDir).queryExecution.analyzed
    var sawDocsGenerate = false
    def check(p: LogicalPlan): Unit = {
      val isDocsGenerate = p match {
        case g: Generate => g.generator.references.exists(_.name == "docs")
        case _ => false
      }
      if (isDocsGenerate) sawDocsGenerate = true
      else {
        assert(!p.expressions.exists(md5OnShingle),
          s"md5(shingle) computed ABOVE the docs explode — the " +
            s"per-posting signature shape is back:\n$p")
        p.children.foreach(check)
      }
    }
    check(plan)
    assert(sawDocsGenerate,
      "plan has no explode of the basket docs array — the signature " +
        "pass no longer reads shingleBaskets")
  }

  test("connectedComponents epilogue: exactly one Aggregate (one distinct)") {
    // the star-forest readout is leaves ∪ roots under a SINGLE
    // distinct; a pre-distinct on either union branch (the shape this
    // round removed) would re-add an exchange to every CC call while
    // keeping results identical — lock the aggregate count
    import spark.implicits._
    val out = operators.GraphOps.connectedComponents(
      Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("src", "dst"))
    val aggs = out.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.size === 1,
      s"CC epilogue has ${aggs.size} Aggregates — a redundant " +
        "pre-distinct is back (or the final distinct was dropped)")
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L)))
  }

  test("CC round body: the only pure-distinct Aggregate is the final one") {
    // the loop checkpoints each round, cutting its plan out of any
    // post-hoc lineage — so lock the round-body shape directly. The
    // logical tree DUPLICATES shared subplans (smallMin and afterLarge
    // are each referenced twice), so a raw Aggregate count is a
    // copy-count artifact; the stable property is the KIND: the star
    // group-mins carry a min() aggregate function, while a distinct is
    // an Aggregate with none. Exactly one such pure-distinct node may
    // exist — the round's final set restore at the root. A re-added
    // afterLarge pre-dedup (identical results, one extra exchange per
    // round, ~30% of warm round cost in the r8 A/B) would show up as
    // pure-distinct Aggregates below the root.
    import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    import spark.implicits._
    val cur = Seq((1L, 2L), (1L, 3L), (2L, 4L)).toDF("u", "v")
    val round = operators.GraphOps.ccRound(cur)
    val plan = round.queryExecution.optimizedPlan
    val pureDistincts = plan.collect {
      case a: Aggregate
        if !a.aggregateExpressions.exists(_.exists(
          _.isInstanceOf[AggregateExpression])) => a
    }
    assert(pureDistincts.size === 1,
      s"CC round body has ${pureDistincts.size} pure-distinct " +
        "Aggregates — expected only the final set restore; an " +
        "intermediate dedup is back (>1) or the final distinct was " +
        "dropped (0)")
    assert(plan.isInstanceOf[Aggregate] &&
      pureDistincts.head.eq(plan),
      "the pure-distinct Aggregate is not the plan root — the final " +
        "set restore moved or an intermediate dedup replaced it")
    // and the round itself contracts this graph to the star on 1
    assert(round.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 2L), (1L, 3L), (1L, 4L)))
  }

  test("Tables.table returns the memoized scan instance") {
    val a = sources.Tables.table(spark, sfDir, "part")
    val b = sources.Tables.table(spark, sfDir, "part")
    assert(a eq b, "Tables.table re-derived the scan — the per-query " +
      "file-listing overhead is back")
  }

  test("Snapshots memoizes marker-validated reads, same instance per app") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_snapmemo_")
    val snap = dir.resolve("t")
    def live = Seq(1L, 2L, 3L).toDF("x")
    val first = sources.Snapshots.parquet(spark, snap, live)
    val second = sources.Snapshots.parquet(spark, snap, live)
    assert(first.count() === 3)
    assert(first eq second, "a marker-validated snapshot read was " +
      "re-derived instead of memoized")
    sources.Snapshots.deleteRecursively(dir)
  }
}
