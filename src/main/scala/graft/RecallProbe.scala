package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main: measure knnGraphSearch beam-search recall against
  * the exact cosine top-5 at an arbitrary SF and parameter point —
  * the measurement behind LlmPipelineSpec's recall floor and the
  * DESIGN.md serve-path table. Not part of the driver contract.
  *
  * Usage: graft.RecallProbe [sfDir] [k] [rounds] [beam] [hops] [nQ]
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(8)
    val rounds = args.lift(2).map(_.toInt).getOrElse(3)
    val beam = args.lift(3).map(_.toInt).getOrElse(24)
    val hops = args.lift(4).map(_.toInt).getOrElse(6)
    val nQ = args.lift(5).map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master(s"local[${math.max(4, Runtime.getRuntime.availableProcessors())}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.VectorExprs
    val t0 = System.nanoTime()
    val got = operators.LlmPipeline
      .knnGraphSearch(spark, sfDir, k = k, rounds = rounds, beam = beam,
        hops = hops, nQ = nQ)
    val ev = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("n", VectorExprs.l2(col("v")))
    val exact = ev.as("q").filter(col("q.vec_id") < nQ)
      .join(ev.as("c"), col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("qid"), col("c.vec_id").as("cid"),
        (VectorExprs.dot(col("q.v"), col("c.v")) / (col("q.n") * col("c.n"))).as("cos"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("cos").desc, col("cid"))))
      .filter(col("rk") <= 5)
    val hits = exact.join(got.select(col("qid"), col("cid")),
      Seq("qid", "cid"), "leftsemi").count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"sf":"$sfDir","k":$k,"rounds":$rounds,"beam":$beam,"hops":$hops,"nQ":$nQ,"hits":$hits,"of":${nQ * 5},"recall":${hits.toDouble / (nQ * 5)}%.3f,"sec":$sec%.1f}""")
    spark.stop()
  }
}
