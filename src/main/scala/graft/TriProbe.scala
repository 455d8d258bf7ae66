package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage volumes/timings of graph_triangles (bench-cost
  * tuning evidence). Not a driver surface. */
object TriProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val li = graft.sources.Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val und = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v")).distinct().persist()
    t("und count")(println("und=" + und.count()))
    val deg = und.groupBy(col("u")).agg(count(lit(1)).as("d"))
    val oriented = und
      .join(deg.select(col("u"), col("d").as("du")), "u")
      .join(deg.select(col("u").as("v"), col("d").as("dv")), "v")
      .filter(col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v")))
      .select(col("u"), col("v")).persist()
    t("oriented count")(println("oriented=" + oriented.count()))
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.v") === col("e2.u"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
    t("wedges count")(println("wedges=" + wedges.count()))
    val tris = wedges.join(oriented.select(col("u").as("a"), col("v").as("c")),
      Seq("a", "c"), "leftsemi")
    t("tris count")(println("tris=" + tris.count()))
    spark.stop()
  }
}
