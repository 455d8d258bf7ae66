package graft

import org.apache.spark.sql.functions._

/** Cross-scale-factor fixture invariants (SURVEY §5.2 item 5): FK
  * integrity on the star schema and monotone row counts sf0.001 →
  * sf0.01 — a cheap corruption guard over the driver-generated inputs
  * every oracle run depends on.
  */
class FixtureInvariantsSpec extends SparkSpec {
  private val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("row counts are monotone across scale factors") {
    for (t <- graft.sources.Tables.allTables) {
      val counts = sfs.map(d => spark.read.parquet(s"$d/$t.parquet").count())
      assert(counts == counts.sorted, s"$t counts $counts not monotone")
    }
  }

  test("star-schema foreign keys resolve at sf0.001") {
    val d = sfDir
    val nation = graft.sources.Tables.nation(spark, d)
    val region = graft.sources.Tables.region(spark, d)
    assert(nation.join(region,
      nation("n_regionkey") === region("r_regionkey"), "left_anti").count() === 0)
    val cust = graft.sources.Tables.customer(spark, d)
    assert(cust.join(nation,
      cust("c_nationkey") === nation("n_nationkey"), "left_anti").count() === 0)
    val orders = graft.sources.Tables.orders(spark, d)
    assert(orders.join(cust,
      orders("o_custkey") === cust("c_custkey"), "left_anti").count() === 0)
    val li = graft.sources.Tables.lineitem(spark, d)
    assert(li.join(orders,
      li("l_orderkey") === orders("o_orderkey"), "left_anti").count() === 0)
    val part = graft.sources.Tables.part(spark, d)
    assert(li.join(part,
      li("l_partkey") === part("p_partkey"), "left_anti").count() === 0)
  }

  test("documents and embeddings align on id range at sf0.001") {
    val d = graft.sources.Tables.documents(spark, sfDir)
      .agg(min("doc_id"), max("doc_id")).head()
    val e = graft.sources.Tables.embeddings(spark, sfDir)
      .agg(min("vec_id"), max("vec_id")).head()
    assert(d.getLong(0) === e.getLong(0))
    assert(d.getLong(1) === e.getLong(1))
  }

  test("embeddings are dim-64 everywhere; money columns are 2-decimal") {
    assert(graft.sources.Tables.embeddings(spark, sfDir)
      .filter(size(col("embedding")) =!= 64).count() === 0)
    // Det's exact-cents contract requires every money value to be an
    // exact 2-decimal double
    val bad = graft.sources.Tables.lineitem(spark, sfDir)
      .select((col("l_extendedprice") * 100).as("c"))
      .filter(abs(col("c") - round(col("c"))) > 1e-6)
    assert(bad.count() === 0)
  }
}
