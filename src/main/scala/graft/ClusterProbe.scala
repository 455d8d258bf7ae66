package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic: phase-level timing of dedup_clusters at a given
  * SF dir — where do the seconds go (shingle base / rare df-count /
  * postings join / edge self-join / CC loop)? Dev tool, not driver
  * contract. */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (round <- 1 to 2) {
      println(s"--- pass $round")
      val sh = operators.LlmPipeline.shingleBase(spark, dir)
      t("shingleBase count")(sh.count())
      val rare = sh.groupBy(col("shingle"))
        .agg(count(lit(1)).as("df")).filter(col("df") === 2)
        .select(col("shingle"))
      t("rare df-count")(rare.count())
      val rsh = sh.join(rare, "shingle")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      t("rsh persist")(rsh.count())
      val edges = rsh.as("a")
        .join(rsh.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("src"), col("b.doc_id").as("dst"))
        .distinct()
      t("edges")(edges.count())
      val labels = t("CC loop")(operators.GraphOps.connectedComponents(edges))
      t("labels count")(labels.count())
      println(s"CC rounds: ${operators.GraphOps.lastRounds}")
      rsh.unpersist(false)
    }
    spark.stop()
  }
}
