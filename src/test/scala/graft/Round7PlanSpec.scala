package graft

import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.apache.spark.sql.catalyst.plans.QueryPlan
import org.apache.spark.sql.execution.columnar.{InMemoryRelation, InMemoryTableScanExec}

/** Round-7 plan lock: the similarity/ANN family is UDF-free. The r7
  * quantizer rewrite removed the last `ScalaUDF` from this family (the
  * MLlib vectorization bridge in ivfCandidates) — every distance,
  * hash, and argmin is now a codegen-friendly native expression, which
  * is what keeps these plans inside whole-stage codegen on the hot
  * path. A UDF creeping back in would be invisible to correctness
  * tests (same results, slower plan), so the lock is on the PLAN.
  * (The deliberate UDF surface demos — udf_scalar/udaf_agg/udtf_gen —
  * are their own qids and exempt by design.)
  *
  * The scan RECURSES through cached relations: the family's shared
  * relations are persisted, so their subtree appears in the optimized
  * plan as an `InMemoryRelation` LEAF whose cached plan lives in
  * `innerChildren`, which `collect` never visits — a naive scan would
  * be blind to exactly the quantizer path this lock exists to guard
  * (it was, when first written this round).
  */
class Round7PlanSpec extends SparkSpec {

  private def udfsIn(plan: QueryPlan[_]): Seq[ScalaUDF] = {
    val here = plan.collect { case node =>
      node.asInstanceOf[QueryPlan[_]].expressions
        .flatMap(_.collect { case u: ScalaUDF => u })
    }.toSeq.flatten
    val cached = plan.collect {
      case imr: InMemoryRelation => udfsIn(imr.cachedPlan)
      case scan: InMemoryTableScanExec => udfsIn(scan.relation.cachedPlan)
    }.toSeq.flatten
    here ++ cached
  }

  test("the similarity/ANN family plans contain no Scala UDFs") {
    for (qid <- Seq("sim_ann_ivf", "sim_ann_ivf_sweep", "sim_ann_lsh",
        "sim_cosine", "sim_pq", "sim_centroid", "sim_quantize",
        "sim_knn_class", "sim_knn_graph")) {
      val udfs = udfsIn(
        Registry.byId(qid).fn(spark, sfDir).queryExecution.optimizedPlan)
      assert(udfs.isEmpty,
        s"$qid's plan contains ScalaUDF(s) — the ANN family is " +
          s"native-expression-only since round 7: $udfs")
    }
  }

  test("the lock actually sees through InMemoryRelation (self-test)") {
    // a deliberately-UDF'd, persisted relation must be caught — this
    // pins the recursion, so the main test can't silently go blind if
    // Spark's cache substitution changes shape
    import org.apache.spark.sql.functions.{col, udf}
    val poison = udf((x: Long) => x + 1)
    val cached = spark.range(10).select(poison(col("id")).as("y")).cache()
    try {
      val derived = cached.select(col("y") * 2)
      assert(udfsIn(derived.queryExecution.optimizedPlan).nonEmpty,
        "the recursive UDF scan failed to see a UDF inside a cached relation")
    } finally cached.unpersist()
  }
}
