package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: per-phase wall time of the NN-Descent loop (init, each
  * round, convergence check) — the attribution tool behind the round-7
  * sim_knn_graph budget work. Mirrors knnGraphEdges' body exactly so a
  * phase regression localizes to one wide op. Not a driver surface.
  *
  * Usage: graft.KnnPhaseProbe [sfDir] [k] [rounds] [iters]
  */
object KnnPhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(12)
    val rounds = args.lift(2).map(_.toInt).getOrElse(4)
    val iters = args.lift(3).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.VectorExprs
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (iter <- 1 to iters) {
      println(s"== iter $iter ==")
      val ev = sources.Tables.embeddings(spark, dir)
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(x as double))").as("v"))
        .withColumn("n", VectorExprs.l2(col("v"))).persist()
      def score(cand: DataFrame): DataFrame = cand
        .join(ev.select(col("vec_id").as("src"), col("v").as("pv"), col("n").as("pn")), "src")
        .join(ev.select(col("vec_id").as("dst"), col("v").as("qv"), col("n").as("qn")), "dst")
        .select(col("src"), col("dst"),
          (VectorExprs.dot(col("pv"), col("qv")) / (col("pn") * col("qn"))).as("cos"))
      def topKFlag(m: DataFrame): DataFrame = m
        .groupBy(col("src"), col("dst"))
        .agg(max(col("cos")).as("cos"), max(col("old")).as("old"))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("src")
            .orderBy(col("cos").desc, col("dst"))))
        .filter(col("rk") <= k)
        .select(col("src"), col("dst"), col("cos"), (!col("old")).as("isnew"))
      val nBuckets = t("count")(math.max(1L, ev.count() / 16L))
      val withB = ev.select(col("vec_id"), explode(expr(
        s"transform(sequence(1, 8), s -> named_struct(" +
          s"'s', s, 'b', pmod(cast(conv(substring(md5(concat(" +
          s"cast(100 + s as string), ':', vec_id)), 1, 8), 16, 10) as bigint), $nBuckets)))"))
        .as("sb"))
      val initCand = withB.select(col("vec_id").as("src"), col("sb"))
        .join(withB.select(col("vec_id").as("dst"), col("sb")), "sb")
        .filter(col("src") =!= col("dst")).select(col("src"), col("dst"))
      var edges = t("init")(
        topKFlag(score(initCand).withColumn("old", lit(false))).localCheckpoint())
      for (r <- 1 to rounds) {
        val adj = edges.select(col("src"), col("dst"), col("isnew")).unionByName(
          edges.select(col("dst").as("src"), col("src").as("dst"), col("isnew")))
        val cand = adj.as("a").join(adj.as("b"), col("a.dst") === col("b.src"))
          .filter(col("a.isnew") || col("b.isnew"))
          .select(col("a.src").as("src"), col("b.dst").as("dst"))
          .filter(col("src") =!= col("dst"))
        val next = t(s"round$r")(topKFlag(
          edges.select(col("src"), col("dst"), col("cos"), lit(true).as("old"))
            .unionByName(score(cand).withColumn("old", lit(false)))).localCheckpoint())
        operators.GraphOps.freeCheckpoint(edges)
        edges = next
        val conv = t(s"convcheck$r")(edges.filter(col("isnew")).limit(1).isEmpty)
        println(s"  converged=$conv")
      }
      ev.unpersist(blocking = false)
      t("drain")(edges.count())
      operators.GraphOps.freeCheckpoint(edges)
    }
    spark.stop()
  }
}
