package graft

import org.apache.spark.sql.functions._

/** Locks the derived-width sign-LSH bucketing behind dedup_embed /
  * sim_ann_lsh: a FIXED key width is the O(n²/B) quadratic class, so
  * the width must grow with the corpus (target bucket ≈ 16, floor 12
  * bits) and the planted re-encode near-dups must still land in one
  * bucket at the wider key (the perturbation preserves every sign, so
  * this holds at ANY width — asserted here beyond the 65,536-vector
  * threshold the fixtures never cross).
  */
class SignLshSpec extends SparkSpec {

  private val n = 70000L

  /** Deterministic synthetic corpus past the width-growth threshold:
    * 64-dim vectors with xxhash64-derived components in [-1, 1) (hash
    * noise, not a sin lattice — a lattice can alias into accidental
    * near-dups). */
  private lazy val corpus = {
    val df = spark.range(n).select(col("id").as("vec_id"),
      expr("transform(sequence(1, 64), j -> cast((pmod(xxhash64(concat(" +
        "cast(id as string), ':', cast(j as string))), 2000000) - 1000000) " +
        "/ 1000000.0d as double))").as("v"))
    df
  }

  test("sign-LSH key width grows past 16-per-bucket (no fixed-width quadratic)") {
    // ceil(log2(70000/16)) = 13 bits -> 8192 possible buckets; with
    // ~8.5 expected occupancy virtually all are hit, so a distinct
    // count above the 12-bit ceiling of 4096 proves the wider key.
    val buckets = graft.operators.LlmPipeline.signLshBucketed(corpus)
      .agg(countDistinct(col("bucket")).as("nb")).head().getLong(0)
    assert(buckets > 4096, s"only $buckets distinct buckets — width did not grow")
    assert(buckets <= 8192)
  }

  test("planted sign-preserving near-dups share a bucket at the wider key") {
    val planted = corpus.filter(col("vec_id") % 50 === 0)
      .select((col("vec_id") + 10000000L).as("vec_id"),
        expr("transform(v, (x, i) -> if(i = 0, x * cast(1.5 as double), x))").as("v"))
    val b = graft.operators.LlmPipeline
      .signLshBucketed(corpus.unionByName(planted))
      .select(col("vec_id"), col("bucket"))
    val pairsInOneBucket = b.as("a").join(b.as("b"),
        col("a.vec_id") + 10000000L === col("b.vec_id") &&
          col("a.bucket") === col("b.bucket"))
      .count()
    assert(pairsInOneBucket === n / 50)
  }
}
