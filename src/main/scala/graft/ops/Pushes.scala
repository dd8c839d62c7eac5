package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's core entity: an "ad push" = composite key
  * (ad_unique_id, push_counter), analyse.py:18,67. Driver-table analog
  * (FIXTURES.md role mapping): push = (user_id, event_type) over `events`,
  * observation time = `ts`, view counter = `value`, deterministic
  * tiebreaker = `event_id` (the reference's `id`, analyse.py:159).
  *
  * The reference's `ad_age_in_minutes` comes precomputed from the scraper;
  * here it is derived as minutes since the push's first event. All time
  * arithmetic is done on `unix_micros(ts)` BIGINTs so that Spark and the
  * DuckDB oracle (`epoch_us`) operate on identical integers — the division
  * to minutes is then the same IEEE op on both engines.
  *
  * Scale: every window below partitions by push_id. Pushes are numerous and
  * small (~13 rows each, TESTDATA), so this hash-partitions evenly across a
  * 1000-executor cluster with no skew; nothing is collected to the driver.
  */
object Pushes {
  /** Script C window bounds, analogs of ANALYSIS_*_AGE = 40/400 min
    * (analyse.py:363-364) rescaled to the events table's ~3000-min median
    * inter-event gap: earliest record <= 2 days, latest <= 10 days. */
  val T1Minutes = 2880.0
  val T2Minutes = 14400.0

  /** T1 as exact epoch-micros — integer comparisons where the minute-double
    * form would be equivalent but needlessly float. */
  val T1Micros: Long = (T1Minutes * 60000000L).toLong

  /** Script B initial window, analog of MAX_AGE_MINUTES = 119 (analyse.py:150
    * — the reference's deliberately-off-by-one "first 2 hours"; we preserve
    * the quirk style with 7199 ~ "first 5 days"). */
  val InitialWindowMinutes = 7199.0

  /** Script C HAVING gate, analog of MIN_ADS_PER_CITY = 10 (analyse.py:362),
    * sized so every scale factor keeps a non-empty league table. */
  val MinPushesPerCity = 5

  /** The push surrogate key (P4, analyse.py:67) — single definition shared
    * by every query so the key can never drift between pipelines. */
  def pushKey: Column = concat(col("user_id").cast("string"), lit("_"), col("event_type"))
  val pushKeySql: String = "CAST(user_id AS VARCHAR) || '_' || event_type"

  /** Adds push_id / ts_us / posted_us / age_min. Reference: surrogate key
    * concat at analyse.py:67 (P4) + the implicit ad_age column.
    *
    * The min-window carries the SAME (partition, order) spec as the lag
    * window in [[withLagRates]] — min over an unbounded frame is
    * order-independent, and the identical spec lets Catalyst's
    * CollapseWindow run both in one WindowExec over one sort instead of
    * two differently-sorted passes. */
  def withPushAge(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("push_id").orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    events
      .withColumn("push_id", pushKey)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("posted_us", min(col("ts_us")).over(w))
      .withColumn("age_min", (col("ts_us") - col("posted_us")) / lit(60000000.0))
  }

  /** Matching oracle CTE; `aged` has the same derived columns. */
  val agedSql: String =
    """aged AS (
      |  SELECT e.*,
      |         CAST(user_id AS VARCHAR) || '_' || event_type AS push_id,
      |         epoch_us(ts) AS ts_us,
      |         min(epoch_us(ts)) OVER (PARTITION BY user_id, event_type) AS posted_us,
      |         (epoch_us(ts) - min(epoch_us(ts)) OVER (PARTITION BY user_id, event_type)) / 60000000.0 AS age_min
      |  FROM events e)""".stripMargin

  /** compute_view_rate (analyse.py:61-76): per-push consecutive-row deltas
    * (W1 lag-diff), drop lag-nulls (F5) and non-positive gaps (F6), rate
    * clipped at 0 (P5/P6), interval midpoint (P7). Ordering ties on ts are
    * broken by event_id so both engines diff the same row pairs (SURVEY
    * §7.4 hard-part 3). */
  def withLagRates(aged: DataFrame): DataFrame = {
    val w = Window.partitionBy("push_id").orderBy(col("ts_us"), col("event_id"))
    aged
      .withColumn("dv", col("value") - lag("value", 1).over(w))
      .withColumn("dt_min", (col("ts_us") - lag("ts_us", 1).over(w)) / lit(60000000.0))
      .filter(col("dv").isNotNull && col("dt_min") > lit(0.0))
      .withColumn("rate", greatest(lit(0.0), col("dv") * lit(60.0) / col("dt_min")))
      .withColumn("mid_age", col("age_min") - col("dt_min") / lit(2.0))
  }

  /** Oracle CTEs mirroring [[withLagRates]]; expects `aged` (or a join that
    * preserves its columns) as input relation name. */
  def lagRatesSql(in: String): String =
    s"""lagd AS (
       |  SELECT *,
       |         value - lag(value) OVER wlag AS dv,
       |         (ts_us - lag(ts_us) OVER wlag) / 60000000.0 AS dt_min
       |  FROM $in
       |  WINDOW wlag AS (PARTITION BY push_id ORDER BY ts_us, event_id)),
       |rates AS (
       |  SELECT *,
       |         greatest(0.0, dv * 60.0 / dt_min) AS rate,
       |         age_min - dt_min / 2.0 AS mid_age
       |  FROM lagd WHERE dv IS NOT NULL AND dt_min > 0.0)""".stripMargin

  /** Deterministic per-push first/last reduction (A4/A6, the two interpreted
    * Python loops at analyse.py:249-281 and 437-483): first_value/last_value
    * over (ts_us, event_id) with an unbounded frame, then a constant-fold
    * groupBy. One shuffle + one sort per push; no driver loop, no UDAF. */
  def withFirstLast(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("push_id").orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df.withColumn("f_val", first("value").over(w))
      .withColumn("l_val", last("value").over(w))
      .withColumn("f_us", first("ts_us").over(w))
      .withColumn("l_us", last("ts_us").over(w))
  }

  /** The engine-side deterministic row-ordering key: numerically exact for
    * ANY ts_us / event_id (struct comparison, no string encoding). */
  def ordKey: Column = struct(col("ts_us"), col("event_id"))

  /** Same key in Spark-SQL-expr form, for FILTER-clause aggregates (the
    * Scala Column API has no aggregate FILTER). */
  val ordKeyExpr: String = "struct(ts_us, event_id)"

  /** Oracle-side ordering key: DuckDB's arg_min/arg_max take only scalar
    * keys, so the key is a fixed-width decimal string. ts_us is biased by
    * 2^62 to keep pre-1970 (negative-micros) timestamps lexicographically
    * ordered; event_id is a generated row id, asserted non-negative and
    * < 10^12 by the testdata contract. */
  val OrdBias = 4611686018427387904L // 2^62
  def ordKeySql: String = s"printf('%020d%012d', ts_us + $OrdBias, event_id)"

  /** A4/A6 as ONE hash aggregate: min_by/max_by over [[ordKey]]. Unlike the
    * window formulation ([[withFirstLast]], kept as the cross-check twin)
    * this needs no per-push sort and partial-aggregates map-side, cutting
    * the shuffle from |events| rows to |pushes| rows — the difference that
    * matters at 100 TB. */
  def firstLastAgg(df: DataFrame, extraKeys: String*): DataFrame =
    df.groupBy("push_id", extraKeys: _*)
      .agg(min_by(col("value"), ordKey).as("f_val"),
        max_by(col("value"), ordKey).as("l_val"),
        min(col("ts_us")).as("f_us"), max(col("ts_us")).as("l_us"),
        min(col("posted_us")).as("posted_us"),
        count(lit(1)).as("n_records"))

  /** Oracle twin of [[firstLastAgg]]; emits relation `per0`. */
  def firstLastAggSql(in: String, extraCols: String = ""): String =
    s"""per0 AS (
       |  SELECT push_id$extraCols,
       |         arg_min(value, $ordKeySql) AS f_val,
       |         arg_max(value, $ordKeySql) AS l_val,
       |         min(ts_us) AS f_us, max(ts_us) AS l_us,
       |         min(posted_us) AS posted_us, count(*) AS n_records
       |  FROM $in GROUP BY ALL)""".stripMargin

}
