package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Plan audit main: prints formatted physical plans for representative
  * queries so the scale-critical properties are inspectable — parquet
  * `PushedFilters`/`ReadSchema` (pushdown + pruning), broadcast vs
  * shuffle join selection, partial aggregation, codegen stage spans.
  * `tools/explain_audit.sh` wraps it.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val qids = if (args.nonEmpty) args.toSeq else Seq(
      "scan_pruned", "join_broadcast", "q1_pricing", "sim_cosine",
      "dedup_minhash", "dedup_near", "dedup_simhash", "pa_multi",
      "sketch_bloom_portable", "topk_per_group", "ps_transform",
      "sketch_cms", "sample_split", "agg_percentile", "unpivot_long")
    for (qid <- qids; q <- Registry.all.find(_.id == qid)) {
      println(s"\n========== $qid ==========")
      println(q.fn(spark, dir).queryExecution.explainString(FormattedMode))
    }
    spark.stop()
  }
}
