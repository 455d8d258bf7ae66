package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: recall/time of the NN-Descent graph vs rounds (supports
  * the bench-budget decision for sim_knn_graph). Not a driver surface. */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val k = sys.env.get("KNN_K").map(_.toInt).getOrElse(12)
    val nB = sys.env.get("KNN_BUCKETINGS").map(_.toInt).getOrElse(8)
    val bSz = sys.env.get("KNN_BUCKET_SIZE").map(_.toInt).getOrElse(12) // = prod default
    val rounds = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(4, 5)
    // r14: dirs overridable so the ladder can include the 10x rehearsal
    // corpora (VERDICT r13 ask #4)
    val dirs = sys.env.get("KNN_DIRS").map(_.split(",").toSeq).getOrElse(
      Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1"))
    import graft.operators.LlmPipeline
    import graft.functions.VectorExprs
    for (dir <- dirs; r <- rounds) {
      val t0 = System.nanoTime()
      val edges = LlmPipeline.knnGraphEdges(spark, dir, k, r, nB, bSz)
      val ev = graft.sources.Tables.embeddings(spark, dir)
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(x as double))").as("v"))
        .withColumn("n", VectorExprs.l2(col("v")))
      val exact = ev.as("q").filter(col("q.vec_id") < 30)
        .join(ev.as("c"), col("q.vec_id") =!= col("c.vec_id"))
        .select(col("q.vec_id").as("qid"), col("c.vec_id").as("cid"),
          round(VectorExprs.dot(col("q.v"), col("c.v")) /
            (col("q.n") * col("c.n")), 6).as("cos"))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("qid")
            .orderBy(col("cos").desc, col("cid"))))
        .filter(col("rk") <= 5)
      val nhits = exact.join(edges.select(col("src").as("qid"),
          col("dst").as("cid")), Seq("qid", "cid"), "leftsemi").count()
      println(f"PROBE dir=$dir rounds=$r nhits=$nhits/150 " +
        f"recall=${nhits / 150.0}%.2f time=${(System.nanoTime() - t0) / 1e9}%.1f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
