package graft

import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized boundary lock for the prefix-sum join_range_band: the
  * banded F(p+r) − F(p−r−1) formulation must equal the naive
  * |Δt| ≤ r count on random event sets. Timestamps are drawn on a
  * coarse grid so equal-timestamp collisions (view == probe instant,
  * purchase == purchase instant) and band-edge cases occur constantly
  * — exactly the places where the inclusive-bound and views-before-
  * probes ordering could silently drift.
  */
class RangeBandSpec extends SparkSpec {

  test("banded prefix-sum counts equal the naive range counts on random data") {
    val radiusUs = 60L * 1000000L
    val rnd = new Random(42)
    for (trial <- 1 to 3) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_rb$trial").toString
      // ~300 s span on a 0.5 s grid -> dense collisions and band edges
      val rows = (0 until 300).map { i =>
        val usGrid = rnd.nextInt(600).toLong * 500000L
        val isPurchase = rnd.nextInt(3) == 0
        (i.toLong, usGrid * 1000L, // ts as raw nanos (nanosAsLong shape)
          rnd.nextInt(40).toLong,
          if (isPurchase) "purchase" else "view")
      }
      spark.createDataFrame(rows).toDF("event_id", "ts", "user_id", "event_type")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val expected = {
        val purchases = rows.filter(_._4 == "purchase")
        val views = rows.filter(_._4 == "view")
        purchases.map { p =>
          val pUs = p._2 / 1000L
          (p._1, views.count(v => math.abs(v._2 / 1000L - pUs) <= radiusUs).toLong)
        }.sortBy(_._1)
      }
      val got = graft.operators.EventStream.joinRangeBand(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got === expected, s"trial $trial mismatch")
    }
  }
}
