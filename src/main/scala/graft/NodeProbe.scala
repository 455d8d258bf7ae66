package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Diagnostic main: execute ONE qid and dump the final adaptive plan
  * tree with per-operator SQL metrics (output rows, aggregate/join/scan
  * times, shuffle bytes). CpuProbe attributes a qid's process CPU to
  * stages, but local[*] stage names are callsites — useless for telling
  * WHICH operator inside a 40-node adaptive plan burned the time. This
  * walks the executed plan (including materialized query stages and
  * broadcast subtrees) and prints every node with its non-zero metrics,
  * so a hot expression or a re-executed subtree is visible by name.
  *
  * Usage: graft.NodeProbe <qid> [sfDir]
  */
object NodeProbe {
  def main(args: Array[String]): Unit = {
    val qid = args.headOption.getOrElse("graph_pagerank")
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", Warehouse.dir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect() // generic warm
    val df = Registry.byId(qid).fn(spark, sfDir)
    val t0 = System.nanoTime()
    // collect(), not count(): count() wraps the plan in a NEW
    // QueryExecution, leaving df's own adaptive plan unexecuted (and
    // its metrics empty); collect() runs exactly df.queryExecution.
    val n = df.collect().length
    println(f"qid=$qid wall=${(System.nanoTime() - t0) / 1e9}%.2f rows=$n")
    def walk(p: SparkPlan, depth: Int): Unit = {
      val ms = p.metrics.toSeq
        .map { case (k, m) => (k, m.value) }
        .filter(_._2 > 0)
        .sortBy(-_._2)
        .take(6)
        .map { case (k, v) => s"$k=$v" }
        .mkString(" ")
      println(("  " * depth) + p.nodeName + "  " + ms)
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth + 1)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan, depth + 1)
        case _ =>
          p.children.foreach(walk(_, depth + 1))
          p.subqueries.foreach(walk(_, depth + 1))
      }
    }
    walk(df.queryExecution.executedPlan, 0)
    spark.stop()
  }
}
