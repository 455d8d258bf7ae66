package graft

import org.apache.spark.sql.catalyst.expressions.ScalaUDF

/** Round-7 plan lock: the similarity/ANN family is UDF-free. The r7
  * quantizer rewrite removed the last `ScalaUDF` from this family (the
  * MLlib vectorization bridge in ivfCandidates) — every distance,
  * hash, and argmin is now a codegen-friendly native expression, which
  * is what keeps these plans inside whole-stage codegen on the hot
  * path. A UDF creeping back in would be invisible to correctness
  * tests (same results, slower plan), so the lock is on the PLAN.
  * (The deliberate UDF surface demos — udf_scalar/udaf_agg/udtf_gen —
  * are their own qids and exempt by design.)
  */
class Round7PlanSpec extends SparkSpec {

  test("the similarity/ANN family plans contain no Scala UDFs") {
    for (qid <- Seq("sim_ann_ivf", "sim_ann_ivf_sweep", "sim_ann_lsh",
        "sim_cosine", "sim_pq", "sim_centroid", "sim_quantize",
        "sim_knn_class")) {
      val plan = Registry.byId(qid).fn(spark, sfDir)
        .queryExecution.optimizedPlan
      val udfs = plan.collect { case p =>
        p.expressions.flatMap(_.collect { case u: ScalaUDF => u })
      }.flatten
      assert(udfs.isEmpty,
        s"$qid's plan contains ScalaUDF(s) — the ANN family is " +
          s"native-expression-only since round 7: $udfs")
    }
  }
}
