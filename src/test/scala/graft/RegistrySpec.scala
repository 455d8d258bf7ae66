package graft

/** Registry-wide contract checks: every declared qid runs on sf0.001,
  * has a stable schema, and is bitwise deterministic across two
  * executions (the driver's t2 hash-compare depends on it — SURVEY §0.1).
  */
class RegistrySpec extends SparkSpec {

  test("registry has no duplicate qids") {
    val ids = Registry.all.map(_.id)
    assert(ids.distinct.size === ids.size)
  }

  test("every query with an oracle is declared in SparkEntry maps") {
    val q = SparkEntry.queries
    val o = SparkEntry.oracleSql
    assert(o.keySet.subsetOf(q.keySet))
    assert(q.nonEmpty)
  }

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // Regression guard for the round-1 array-output defect class: the
  // driver's pandas hash compare only supports scalar columns, so any
  // future qid that leaks an array/map/struct output must fail HERE, not
  // at the driver gate. Probed at two SFs because pivot-style plans can
  // in principle infer data-dependent schemas. NOTE: constructing the
  // DataFrame is NOT free for every qid — ML-backed ones execute Spark
  // jobs at build time (the anchor sample/refine in ivfCandidates, the full
  // connected-components fixpoint in dedup_clusters) and persist()
  // intermediates, so the cache is cleared per SF to keep ~146 qids × 2
  // dirs from accumulating cached RDDs.
  test("every declared output schema is scalar-only at sf0.001 and sf0.01") {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    for (d <- Seq(sfDir, "/root/testdata/sf0.01")) {
      for (q <- Registry.all) {
        val bad = q.fn(spark, d).schema.fields.filter(f =>
          f.dataType.isInstanceOf[ArrayType] || f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType])
        assert(bad.isEmpty,
          s"${q.id} on $d has non-scalar output columns: ${bad.map(_.name).mkString(",")}")
      }
      spark.catalog.clearCache()
    }
  }

  for (q <- Registry.all) {
    test(s"${q.id}: runs on sf0.001 and is deterministic") {
      val r1 = q.fn(spark, sfDir).collect().map(_.toString)
      val r2 = q.fn(spark, sfDir).collect().map(_.toString)
      assert(r1.sameElements(r2), s"${q.id} not deterministic across runs")
    }
  }
}
