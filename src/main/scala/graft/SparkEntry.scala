package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §0.1/§7.
  *
  * `queries` exposes one entry per implemented operator qid from SURVEY §2;
  * `oracleSql` carries the DuckDB twin for the driver's t2 hash-compare.
  * The real implementations live in the per-family modules under
  * `graft.operators` / `graft.functions` / `graft.ps` / `graft.sketch`,
  * registered through [[Registry]].
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.id -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(q.id -> _)).toMap
}
