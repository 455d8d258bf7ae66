package graft.operators

import graft.{Det, GQuery}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions, per-group top-k, as-of joins (SURVEY.md §2.C).
  *
  * These are the batch restatement of the reference's per-key ordered
  * processing: worker-local recency state (mf_user_memory), online top-k
  * emission (mf_topk), and "join each record to the most recent model
  * version" (pull answers) all become window functions over keyed,
  * time-ordered partitions — one shuffle on the partition key, then
  * order-local computation; no N² pair joins, which is what keeps these
  * shapes viable at 100 TB.
  */
object Windows {
  import Det._

  // ------------------------------------------------------------------ win_rank
  /** Ranking family: row_number / rank / dense_rank / ntile per customer.
    * Window ORDER BY carries a total-order tiebreak (o_orderkey) so
    * row_number is deterministic.
    */
  def winRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .filter(col("o_custkey") <= 200)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rk"),
        dense_rank().over(w).as("drk"),
        ntile(4).over(w).as("quartile"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  private val winRankOracle =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  ROW_NUMBER() OVER w AS rn,
      |  RANK() OVER w AS rk,
      |  DENSE_RANK() OVER w AS drk,
      |  NTILE(4) OVER w AS quartile
      |FROM orders
      |WHERE o_custkey <= 200
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_custkey, rn""".stripMargin

  // ------------------------------------------------------------ win_percentile
  /** Distribution family: percent_rank / cume_dist per customer. Both
    * are single IEEE divisions of identical integer counts, so the
    * doubles are bit-identical cross-engine with no rounding contract
    * needed; the usual total-order tiebreak keeps ranks deterministic. */
  def winPercentile(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .filter(col("o_custkey") <= 200)
      .select(
        col("o_custkey"), col("o_orderkey"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy(col("o_custkey"), col("pr"), col("o_orderkey"))
  }

  private val winPercentileOracle =
    """SELECT o_custkey, o_orderkey,
      |  PERCENT_RANK() OVER w AS pr,
      |  CUME_DIST() OVER w AS cd
      |FROM orders
      |WHERE o_custkey <= 200
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_custkey, pr, o_orderkey""".stripMargin

  // ------------------------------------------------------ win_running_distinct
  /** Running COUNT(DISTINCT) per user over event time — neither engine
    * supports DISTINCT inside a window frame, so it is restated
    * portably: mark each (user, type)'s first occurrence with one
    * ranking window, then running-sum the marks with a second. Two
    * window passes over the same user partitioning = one shuffle.
    * The feature-engineering shape behind "how many distinct X has
    * this entity touched so far" columns.
    */
  def winRunningDistinct(spark: SparkSession, dir: String): DataFrame = {
    val firstW = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val runW = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .filter(col("user_id") < 30)
      .withColumn("first_seen",
        when(row_number().over(firstW) === 1, 1L).otherwise(0L))
      .select(col("user_id"), col("event_id"),
        sum(col("first_seen")).over(runW).as("n_distinct_types"))
      .orderBy(col("user_id"), col("event_id"))
  }

  private val winRunningDistinctOracle =
    """SELECT user_id, event_id,
      |  CAST(SUM(first_seen) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS n_distinct_types
      |FROM (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |              ORDER BY ts, event_id) = 1 THEN 1 ELSE 0 END AS first_seen
      |  FROM events WHERE user_id < 30)
      |ORDER BY user_id, event_id""".stripMargin

  // ----------------------------------------------------------- win_gap_islands
  /** Gaps-and-islands: collapse each user's distinct active days into
    * maximal consecutive runs via the classic day − row_number()
    * constant-per-island trick — no self-join, no iteration, one
    * window pass after the distinct. The batch analog of gap-based
    * sessionization at day granularity (stream_session is the
    * timestamp-gap form). Output: one row per island with its bounds
    * and length.
    */
  def winGapIslands(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .filter(col("user_id") < 50)
      .select(col("user_id"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    days
      .withColumn("island", col("day") - row_number().over(w))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("day")).as("start_day"), max(col("day")).as("end_day"),
        count(lit(1)).as("n_days"))
      .select(col("user_id"), col("start_day"), col("end_day"), col("n_days"))
      .orderBy(col("user_id"), col("start_day"))
  }

  private val winGapIslandsOracle =
    """WITH days AS (
      |  SELECT DISTINCT user_id,
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
      |      AS day
      |  FROM events WHERE user_id < 50),
      |isl AS (
      |  SELECT user_id, day,
      |    day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS island
      |  FROM days)
      |SELECT user_id, MIN(day) AS start_day, MAX(day) AS end_day,
      |  COUNT(*) AS n_days
      |FROM isl GROUP BY user_id, island
      |ORDER BY user_id, start_day""".stripMargin

  // ---------------------------------------------------------- win_ignore_nulls
  /** IGNORE NULLS analytics over a sparse measure: forward fill
    * (`last_value IGNORE NULLS` over an unbounded-preceding frame),
    * previous non-null (`lag IGNORE NULLS`), and backward fill
    * (`first_value IGNORE NULLS` over an unbounded-following frame) —
    * the imputation primitives a feature pipeline runs over sparsely
    * observed signals. The fixture has no natural nulls, so the measure
    * is deterministically nulled on every third order key; DuckDB's
    * spelling puts IGNORE NULLS inside the call parens
    * (`lag(x IGNORE NULLS)`). Same single-shuffle window topology as
    * the rest of the family.
    */
  def winIgnoreNulls(spark: SparkSession, dir: String): DataFrame = {
    val base = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    val x = when(col("o_orderkey") % 3 === 0, lit(null))
      .otherwise(Det.cents(col("o_totalprice")))
    Tables.orders(spark, dir)
      .filter(col("o_custkey") <= 100)
      .select(
        col("o_custkey"), col("o_orderkey"), x.as("x"),
        last(x, ignoreNulls = true)
          .over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("ffill"),
        lag(x, 1, null, ignoreNulls = true).over(base).as("prev_nn"),
        first(x, ignoreNulls = true)
          .over(base.rowsBetween(Window.currentRow, Window.unboundedFollowing))
          .as("bfill"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val winIgnoreNullsOracle =
    s"""SELECT o_custkey, o_orderkey,
       |  CASE WHEN o_orderkey % 3 = 0 THEN NULL
       |       ELSE ${Det.oCents("o_totalprice")} END AS x,
       |  last_value(CASE WHEN o_orderkey % 3 = 0 THEN NULL
       |       ELSE ${Det.oCents("o_totalprice")} END IGNORE NULLS)
       |    OVER (PARTITION BY o_custkey ORDER BY o_orderkey
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill,
       |  lag(CASE WHEN o_orderkey % 3 = 0 THEN NULL
       |       ELSE ${Det.oCents("o_totalprice")} END IGNORE NULLS)
       |    OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_nn,
       |  first_value(CASE WHEN o_orderkey % 3 = 0 THEN NULL
       |       ELSE ${Det.oCents("o_totalprice")} END IGNORE NULLS)
       |    OVER (PARTITION BY o_custkey ORDER BY o_orderkey
       |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS bfill
       |FROM orders WHERE o_custkey <= 100
       |ORDER BY o_custkey, o_orderkey""".stripMargin

  // -------------------------------------------------------------- win_analytic
  /** Analytic family: lag / lead / first / last over per-user event time.
    * Explicit frames everywhere — engine default frames differ subtly.
    */
  def winAnalytic(spark: SparkSession, dir: String): DataFrame = {
    val order = Seq(col("ts"), col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(order: _*)
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(spark, dir)
      .filter(col("user_id") <= 20)
      .select(
        col("user_id"), col("event_id"), col("event_type"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("event_type"), 1).over(w).as("next_type"),
        first(col("event_id")).over(wAll).as("first_event"),
        last(col("event_id")).over(wAll).as("last_event"))
      .orderBy(col("user_id"), col("event_id"))
  }

  private val winAnalyticOracle =
    """SELECT user_id, event_id, event_type,
      |  LAG(value, 1) OVER w AS prev_value,
      |  LEAD(event_type, 1) OVER w AS next_type,
      |  FIRST_VALUE(event_id) OVER
      |    (PARTITION BY user_id ORDER BY ts, event_id
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_event,
      |  LAST_VALUE(event_id) OVER
      |    (PARTITION BY user_id ORDER BY ts, event_id
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_event
      |FROM events
      |WHERE user_id <= 20
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, event_id""".stripMargin

  // ------------------------------------------------------------ win_frame_rows
  /** Rolling ROWS frame: running count + rolling sum of the last 4 rows.
    * The rolling sum runs on exact integer cents — rolling-window float
    * accumulation strategies differ across engines (incremental subtract
    * vs recompute), so doubles would drift.
    */
  def winFrameRows(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .filter(col("user_id") <= 20)
      .select(
        col("user_id"), col("event_id"),
        count(lit(1)).over(w.rowsBetween(Window.unboundedPreceding, 0)).as("running_n"),
        (sum(cents(col("value"))).over(w.rowsBetween(-3, 0)).cast("double") / 100.0)
          .as("rolling_sum4"))
      .orderBy(col("user_id"), col("event_id"))
  }

  private val winFrameRowsOracle =
    """SELECT user_id, event_id,
      |  COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n,
      |  CAST(CAST(SUM(CAST(ROUND((value)*100) AS BIGINT)) OVER
      |    (PARTITION BY user_id ORDER BY ts, event_id
      |     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS DOUBLE)/100.0
      |    AS rolling_sum4
      |FROM events
      |WHERE user_id <= 20
      |ORDER BY user_id, event_id""".stripMargin

  // ----------------------------------------------------------- win_frame_range
  /** Time-based RANGE frame: events in the trailing hour per user.
    * Ordered on integer epoch-µs so RANGE bounds are engine-agnostic
    * (Spark interval RANGE and DuckDB interval RANGE agree, but integer
    * bounds remove any timestamp-precision question).
    */
  def winFrameRange(spark: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-hourUs, 0)
    Tables.events(spark, dir)
      .filter(col("user_id") <= 20)
      .withColumn("ts_us", unix_micros(col("ts")))
      .select(
        col("user_id"), col("event_id"), col("ts_us"),
        count(lit(1)).over(w).as("n_last_hour"),
        (sum(cents(col("value"))).over(w).cast("double") / 100.0).as("sum_last_hour"))
      .orderBy(col("user_id"), col("event_id"))
  }

  private val winFrameRangeOracle =
    """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |  COUNT(*) OVER w AS n_last_hour,
      |  CAST(CAST(SUM(CAST(ROUND((value)*100) AS BIGINT)) OVER w AS BIGINT) AS DOUBLE)/100.0
      |    AS sum_last_hour
      |FROM events
      |WHERE user_id <= 20
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin

  // ----------------------------------------------------------- topk_per_group
  /** Per-group top-k — the reference's online top-K recommendation shape
    * (mf_topk): rank within partition, keep k. Spark ≥3.5 pushes the
    * rn<=k limit into the window sort (InferWindowGroupLimit), so each
    * partition only tracks k rows — the LEMP-pruning analog.
    */
  def topkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  private val topkPerGroupOracle =
    """SELECT * FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  // ---------------------------------------------------------------- join_asof
  /** As-of join: each purchase gets the user's most recent click at or
    * before it. Implemented as union + ordered forward-fill (last_value
    * IGNORE NULLS) — O(n log n) per key, no pairwise blow-up, the same
    * trick that joins records to "the most recent model version" in the
    * reference's pull-answer flow. A range-join formulation would be
    * O(clicks × purchases) per user.
    */
  def joinAsof(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    ev.filter(col("event_type").isin("click", "purchase"))
      .withColumn("click_id",
        when(col("event_type") === "click", col("event_id")))
      .withColumn("asof_click",
        last(col("click_id"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("asof_click"))
      .orderBy(col("event_id"))
  }

  private val joinAsofOracle =
    """SELECT event_id, user_id, asof_click FROM (
      |  SELECT event_id, user_id, event_type,
      |    LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_click
      |  FROM events
      |  WHERE event_type IN ('click','purchase')) t
      |WHERE event_type = 'purchase'
      |ORDER BY event_id""".stripMargin

  def queries: Seq[GQuery] = Seq(
    GQuery("win_percentile", winPercentile, Some(winPercentileOracle),
      "distribution window family: percent_rank / cume_dist"),
    GQuery("win_rank", winRank, Some(winRankOracle),
      "row_number/rank/dense_rank/ntile ranking window"),
    GQuery("win_running_distinct", winRunningDistinct, Some(winRunningDistinctOracle),
      "running distinct count via first-occurrence marks + running sum"),
    GQuery("win_gap_islands", winGapIslands, Some(winGapIslandsOracle),
      "gaps-and-islands: maximal consecutive-day runs per user"),
    GQuery("win_ignore_nulls", winIgnoreNulls, Some(winIgnoreNullsOracle),
      "IGNORE NULLS analytics: forward/backward fill + previous non-null"),
    GQuery("win_analytic", winAnalytic, Some(winAnalyticOracle),
      "lag/lead/first/last analytic window"),
    GQuery("win_frame_rows", winFrameRows, Some(winFrameRowsOracle),
      "running + rolling ROWS frame aggregates"),
    GQuery("win_frame_range", winFrameRange, Some(winFrameRangeOracle),
      "time-based RANGE frame (trailing hour)"),
    GQuery("topk_per_group", topkPerGroup, Some(topkPerGroupOracle),
      "per-group top-k (reference mf_topk shape, window-group-limit pushdown)"),
    GQuery("join_asof", joinAsof, Some(joinAsofOracle),
      "as-of join via ordered forward-fill (no pairwise blow-up)")
  )
}
