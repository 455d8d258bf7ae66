package graft

import org.apache.spark.sql.Row

/** Non-degeneracy sweep over every qid whose oracle result is ≤ 3 rows
  * (VERDICT r7 "What's wrong" #4, finished properly per r8 ask #3): a
  * tiny audit-aggregate result can pass all three driver checks while
  * asserting nothing — a bound row comparing two zero quantities, a
  * recall row whose denominator is empty. Each check pins the specific
  * quantity that would go to zero if the underlying computation
  * vacated, so the defect class fails a spec instead of sailing
  * through the hash oracle.
  *
  * Membership is DERIVED, not enumerated (r8's lesson: the enumerated
  * list covered 8 of the 17 qids the artifact showed): the highest-
  * numbered CORRECTNESS_r*.json committed at the repo root carries the
  * driver's own oracle row counts, and the derivation test fails the
  * suite whenever a ≤3-row qid appears there without a check in
  * [[checks]] — a new tiny qid, or a result that SHRANK into the tiny
  * class, forces a check before the round ships. The checks run at
  * sf0.001; row-count assertions use bounds that hold at every test SF
  * (both 0.001 and 0.01 outputs were inspected when each was written).
  */
class TinyResultSpec extends SparkSpec {
  private def rows(qid: String): Array[Row] =
    Registry.byId(qid).fn(spark, sfDir).collect()
  private def field[A](r: Row, name: String): A =
    r.getAs[A](name)

  /** qid → non-degeneracy assertion. Every ≤3-oracle-row qid in the
    * latest committed correctness artifact MUST have an entry here
    * (enforced by the derivation test below); extra entries for qids
    * that have since widened are harmless and kept as regression
    * checks. */
  private val checks: Map[String, () => Unit] = Map(
    "sketch_hll_union" -> (() => {
      val r = rows("sketch_hll_union")
      assert(r.length === 1)
      assert(field[Long](r.head, "n_types") > 0L)
      assert(field[Long](r.head, "exact_union") > 0L)
    }),
    "dedup_simhash_recall" -> (() => {
      val r = rows("dedup_simhash_recall")
      assert(r.length === 1)
      // n_exact == 0 would make recall_ok vacuously true
      assert(field[Long](r.head, "n_exact") > 0L,
        "exact near-dup pair set is empty — recall_ok asserts nothing")
    }),
    "agg_weighted" -> (() => {
      val r = rows("agg_weighted")
      assert(r.length === 2)
      r.foreach { row =>
        assert(field[Long](row, "num") > 0L)
        assert(field[Long](row, "den") > 0L)
        assert(field[Long](row, "wavg_e6") > 0L)
      }
    }),
    "agg_stats" -> (() => {
      val r = rows("agg_stats")
      assert(r.length === 2)
      r.foreach { row =>
        assert(field[Double](row, "sd_qty") > 0.0)
        assert(field[Double](row, "var_qty") > 0.0)
        assert(field[Double](row, "median_price") > 0.0)
        // correlation of a constant column would be NaN/0 exactly
        assert(!field[Double](row, "corr_qty_price").isNaN)
      }
    }),
    "sample_split" -> (() => {
      val r = rows("sample_split")
      assert(r.length === 3)
      val byName = r.map(row => row.getString(0) -> row.getLong(1)).toMap
      assert(Set("train", "valid", "test").subsetOf(byName.keySet))
      byName.foreach { case (s, n) => assert(n > 0L, s"split $s is empty") }
      // the md5-coin proportions must actually differentiate: train is
      // the declared majority split
      assert(byName("train") > byName("valid") && byName("train") > byName("test"))
    }),
    "fn_math" -> (() => {
      val r = rows("fn_math")
      assert(r.length === 3)
      r.foreach { row =>
        assert(field[Long](row, "sum_floor") > 0L)
        assert(field[Long](row, "sum_ceil") > field[Long](row, "sum_floor"),
          "ceil sum must exceed floor sum on fractional quantities")
        assert(field[Double](row, "avg_sqrt_qty") > 0.0)
        assert(field[Long](row, "n_discounted") > 0L)
      }
    }),
    "agg_bool" -> (() => {
      val r = rows("agg_bool")
      assert(r.length === 3)
      r.foreach { row =>
        assert(field[Long](row, "n") > 0L,
          "an empty group makes bool_and vacuously true")
      }
    }),
    "sim_ann_ivf_sweep" -> (() => {
      val r = rows("sim_ann_ivf_sweep")
      assert(r.map(_.getLong(0)).toSeq === Seq(1L, 2L, 4L, 8L))
    }),
    // ---- the 9 added in r9 when the set became artifact-derived ----
    "agg_approx_distinct" -> (() => {
      val r = rows("agg_approx_distinct")
      assert(r.length === 3)
      r.foreach { row =>
        // within_5pct over an empty/zero exact count asserts nothing
        assert(field[Long](row, "exact_parts") > 0L)
        assert(field[Boolean](row, "within_5pct"),
          "HLL estimate outside the 5% envelope of a real exact count")
      }
    }),
    "agg_distinct" -> (() => {
      val r = rows("agg_distinct")
      assert(r.length === 3)
      r.foreach { row =>
        assert(field[Long](row, "n_parts") > 0L)
        assert(field[Long](row, "n_supps") > 0L)
        // the three DISTINCT targets must actually differ in
        // cardinality — identical counts would mean one column was
        // counted thrice
        assert(field[Long](row, "n_orders") > field[Long](row, "n_supps"))
      }
    }),
    "agg_filtered" -> (() => {
      val r = rows("agg_filtered")
      assert(r.length === 3)
      r.foreach { row =>
        val bulk = field[Long](row, "n_bulk")
        val all = field[Long](row, "n_all")
        assert(bulk > 0L, "FILTER clause admitted nothing")
        assert(bulk < all, "FILTER clause filtered nothing")
        assert(field[Long](row, "full_price_cents") > 0L)
        assert(field[Long](row, "n_taxed_supps") > 0L)
      }
    }),
    "agg_mode" -> (() => {
      val r = rows("agg_mode")
      assert(r.length === 3)
      r.foreach { row =>
        // a mode with multiplicity 1 means the tie-break picked among
        // singletons — no actual mode computation was exercised
        assert(field[Long](row, "mode_n") > 1L)
      }
    }),
    "dedup_decontam" -> (() => {
      val r = rows("dedup_decontam")
      assert(r.nonEmpty, "no contaminated docs found — gram join vacated")
      r.foreach { row =>
        assert(field[Long](row, "n_shared_grams") > 0L)
        assert(field[Long](row, "n_eval_docs") > 0L)
      }
    }),
    "event_funnel" -> (() => {
      val r = rows("event_funnel")
      // stage histogram over users' deepest ordered progression: the
      // ordering comparisons (click after view, buy after click) must
      // actually discriminate — a single populated stage would mean
      // the CASE chain collapsed
      assert(r.length >= 2, "all users landed in one funnel stage")
      r.foreach(row => assert(field[Long](row, "n_users") > 0L))
      assert(r.exists(row => row.getLong(0) >= 2L),
        "no user passed a timestamp-ordering comparison")
    }),
    "fn_bitmap" -> (() => {
      val r = rows("fn_bitmap")
      assert(r.length === 3)
      assert(r.map(_.getString(0)).toSet === Set("A", "N", "R"))
      r.foreach(row => assert(field[Long](row, "n_orders") > 0L,
        "bitmap cardinality of a populated flag group is zero"))
    }),
    "graph_degree_dist" -> (() => {
      val r = rows("graph_degree_dist")
      assert(r.length >= 2, "degree distribution collapsed to one bin")
      r.foreach { row =>
        val bin = field[Long](row, "log2_bin")
        val lo = field[Long](row, "min_deg")
        val hi = field[Long](row, "max_deg")
        assert(field[Long](row, "n_nodes") > 0L)
        // the binary-string-length bin must bracket its degrees:
        // 2^(bin-1) <= deg < 2^bin — the no-float log2 contract
        assert(lo >= (1L << (bin - 1)) && hi < (1L << bin),
          s"bin $bin does not bracket degrees [$lo, $hi]")
        assert(lo <= hi)
      }
    }),
    "join_bucketed" -> (() => {
      val r = rows("join_bucketed")
      assert(r.length === 3)
      r.foreach { row =>
        assert(field[Long](row, "n") > 0L)
        assert(field[Long](row, "qty_cents") > 0L)
      }
    }),
    "sketch_quantile" -> (() => {
      val r = rows("sketch_quantile")
      assert(r.length === 3)
      r.foreach { row =>
        // rank_ok over an empty group is vacuously true; pin n and the
        // median itself
        assert(field[Long](row, "n") > 0L)
        assert(field[Double](row, "p50_cents") > 0.0)
        assert(field[Boolean](row, "rank_ok"),
          "sketch median fell outside the exact rank envelope")
      }
    })
  )

  /** Oracle row counts from the highest-numbered committed correctness
    * artifact — the driver's own numbers, so membership can't drift
    * from prose. Flat per-qid objects, parsed with a regex (no JSON
    * lib on the test classpath). */
  private def latestOracleRowCounts: Option[Map[String, Int]] = {
    val root = new java.io.File(".")
    val arts = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.matches("CORRECTNESS_r\\d+\\.json"))
      .sortBy(_.getName)
    arts.lastOption.map { f =>
      val txt = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      val entry =
        """"([a-z0-9_]+)"\s*:\s*\{[^{}]*?"oracle_rows"\s*:\s*(\d+)[^{}]*?\}""".r
      entry.findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2).toInt).toMap
    }
  }

  test("every <=3-oracle-row qid in the latest correctness artifact has a check") {
    latestOracleRowCounts match {
      case None =>
        cancel("no CORRECTNESS_r*.json at the repo root (fresh clone)")
      case Some(counts) =>
        assert(counts.size > 100,
          s"artifact parse degenerated (${counts.size} qids) — regex drift?")
        val tiny = counts.collect { case (q, n) if n <= 3 => q }.toSet
        val missing = tiny -- checks.keySet
        assert(missing.isEmpty,
          s"tiny-result qids without a non-degeneracy check: ${missing.toSeq.sorted.mkString(", ")}")
    }
  }

  test("every checked qid still exists in the registry") {
    checks.keys.foreach(q =>
      assert(Registry.byId.contains(q), s"unknown qid $q"))
  }

  checks.toSeq.sortBy(_._1).foreach { case (qid, check) =>
    test(s"$qid: non-degenerate") { check() }
  }
}
