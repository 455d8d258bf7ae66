package graft

import graft.sketch.{BloomAgg, SketchQueries}
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Sketch-vs-exact property checks (SURVEY §5.2): ToW inner-product
  * estimates within the AMS variance envelope, bloom filters with no
  * false negatives and mergeable union, minhash agreement concentrated
  * near true Jaccard.
  */
class SketchSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("ToW sign function is ±1 and deterministic") {
    val s = (0 until 100).map(k => SketchQueries.TowAgg.sign(k.toLong, 3))
    assert(s.forall(v => v == 1L || v == -1L))
    assert(s === (0 until 100).map(k => SketchQueries.TowAgg.sign(k.toLong, 3)))
    // roughly balanced
    assert(math.abs(s.sum) < 40)
  }

  test("ToW estimate approximates the exact inner product") {
    val q = SketchQueries.queries.find(_.id == "sketch_tow").get
    val out = q.fn(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val est = r.getAs[Double]("tow_estimate")
      val exact = r.getAs[Long]("exact_inner").toDouble
      // AMS: relative error bounded by norms; loose sanity envelope here
      assert(math.abs(est - exact) <= math.max(4000.0, 4.0 * exact))
    }
  }

  test("BloomAgg: no false negatives; merge behaves as union") {
    val b1 = BloomAgg.zero
    (1L to 500L).foreach(BloomAgg.reduce(b1, _))
    val b2 = BloomAgg.zero
    (400L to 900L).foreach(BloomAgg.reduce(b2, _))
    val merged = BloomAgg.merge(b1, b2)
    (1L to 900L).foreach(k => assert(merged.mightContainLong(k), s"lost $k"))
    val fp = (10000L to 20000L).count(merged.mightContainLong)
    assert(fp < 600) // ~1% fpp target, loose bound
  }

  test("BloomAgg via udaf groups per key") {
    val df = Seq((1, 10L), (1, 11L), (2, 99L)).toDF("g", "v")
    val bloom = udaf(BloomAgg)
    val out = df.groupBy("g").agg(bloom(col("v")).as("bf")).collect()
    val byG = out.map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
    def read(b: Array[Byte]) =
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(b))
    assert(read(byG(1)).mightContainLong(10L))
    assert(read(byG(1)).mightContainLong(11L))
    assert(!read(byG(2)).mightContainLong(10L))
    assert(read(byG(2)).mightContainLong(99L))
  }

  test("portable bloom: no false negatives against the built bitmap") {
    val bloom = SketchQueries.queries.find(_.id == "sketch_bloom_portable").get
      .fn(spark, sfDir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("lane")) ->
        r.getAs[Long]("bits")).toMap
    // every inserted (event_type, user_id) must test positive on all 3 bits
    val h32 = (s: String) => {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).take(4).map(b => f"$b%02x").mkString, 16)
    }
    val members = graft.sources.Tables.events(spark, sfDir)
      .select("event_type", "user_id").distinct().collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("user_id")))
    assert(members.nonEmpty)
    members.foreach { case (et, uid) =>
      (0 to 2).foreach { j =>
        val pos = h32(s"23:$j:$uid") % 252
        val set = (bloom((et, pos / 63)) >> (pos % 63).toInt & 1L) == 1L
        assert(set, s"bloom lost ($et, $uid) hash $j")
      }
    }
  }

  test("minhash estimate within 0.4 of exact Jaccard (8 seeds, coarse)") {
    val q = SketchQueries.queries.find(_.id == "sketch_minhash").get
    val out = q.fn(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val est = r.getAs[Double]("est_jaccard")
      val ex = r.getAs[Double]("exact_jaccard")
      assert(est >= 0.0 && est <= 1.0)
      assert(math.abs(est - ex) <= 0.4)
    }
  }
}
