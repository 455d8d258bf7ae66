package graft

import org.apache.spark.storage.StorageLevel

/** Contract tests for the family-shared memoized relations
  * (LlmPipeline.shinglePairStats, Relational.coPurchaseCanon,
  * the simhash memo behind dedup_simhash*): within a session the same
  * persisted instance is reused; after a clearCache the memo must
  * REBUILD (detect the dead storage level), not hand back a handle to
  * dropped blocks — Verify's per-query clearCache hygiene and the
  * bench's family-boundary clearing both depend on this.
  */
class SharedRelationsSpec extends SparkSpec {

  test("shinglePairStats: reused while cached, rebuilt after clearCache, same rows") {
    val a = operators.LlmPipeline.shinglePairStats(spark, sfDir)
    val rowsA = a.orderBy("da", "db").collect()
    assert(operators.LlmPipeline.shinglePairStats(spark, sfDir) eq a,
      "second call while cached must return the memoized instance")
    spark.catalog.clearCache()
    assert(a.storageLevel == StorageLevel.NONE, "clearCache should drop the blocks")
    val b = operators.LlmPipeline.shinglePairStats(spark, sfDir)
    assert(!(b eq a), "after clearCache the memo must rebuild, not reuse")
    assert(b.storageLevel != StorageLevel.NONE, "rebuild must re-persist")
    assert(b.orderBy("da", "db").collect().sameElements(rowsA),
      "rebuild must reproduce identical content")
    spark.catalog.clearCache()
  }

  test("coPurchaseCanon: reused while cached, rebuilt after clearCache, same rows") {
    val a = operators.Relational.coPurchaseCanon(spark, sfDir)
    val rowsA = a.orderBy("u", "v").collect()
    assert(operators.Relational.coPurchaseCanon(spark, sfDir) eq a)
    spark.catalog.clearCache()
    val b = operators.Relational.coPurchaseCanon(spark, sfDir)
    assert(!(b eq a))
    assert(b.orderBy("u", "v").collect().sameElements(rowsA))
    spark.catalog.clearCache()
  }
}
