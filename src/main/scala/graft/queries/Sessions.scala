package graft.queries

import graft.Q
import graft.ops.Tables
import graft.ops.Num.{r6, r6Sql}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization, batch form: the lag → new-session flag →
  * running-sum session-id idiom. This is the SQL-expressible twin of
  * graft.streaming.Streams.sessionize (flatMapGroupsWithState) — the two
  * are parity-tested in StreamsSpec, and this one carries the DuckDB
  * oracle.
  *
  * Scale: one shuffle by user_id for the window pass, then a hash agg on
  * (user_id, session_id) that reuses the same partitioning — no extra
  * exchange. Session gap logic never materializes per-user state bigger
  * than a row.
  */
object Sessions {
  val GapUs: Long = 30L * 60 * 1000000 // 30-minute inactivity gap

  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("prev_us", lag("ts_us", 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > lit(GapUs), lit(1L))
          .otherwise(lit(0L)))
      .withColumn("session_seq", sum("new_session").over(wRun))
      .groupBy("user_id", "session_seq")
      .agg(min("ts_us").as("session_start_us"), max("ts_us").as("session_end_us"),
        count(lit(1)).as("n_events"), r6(sum(col("value"))).as("sum_value"))
      .drop("session_seq")
      .orderBy("user_id", "session_start_us")
  }

  val sessionizeSql: String =
    s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events),
       |lagd AS (
       |  SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us
       |  FROM e),
       |marked AS (
       |  SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > $GapUs THEN 1 ELSE 0 END AS new_session
       |  FROM lagd),
       |sess AS (
       |  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
       |                                   ROWS UNBOUNDED PRECEDING) AS session_seq
       |  FROM marked)
       |SELECT user_id, min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
       |       count(*) AS n_events, ${r6Sql("sum(value)")} AS sum_value
       |FROM sess GROUP BY user_id, session_seq
       |ORDER BY user_id, session_start_us""".stripMargin

  /** The same sessions via Spark's NATIVE session_window operator —
    * `groupBy(session_window(ts, gap))` plans a single SessionWindow
    * aggregation (merging sort-based session assignment into the agg, no
    * explicit lag/running-sum pass). Window end = last event + gap by
    * definition, mirrored in the oracle. */
  def sessionWindowAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("win"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), r6(sum(col("value"))).as("sum_value"))
      .select(col("user_id"), unix_micros(col("win.start")).as("session_start_us"),
        unix_micros(col("win.end")).as("session_end_us"), col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start_us")

  val sessionWindowAggSql: String =
    s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events),
       |lagd AS (
       |  SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us
       |  FROM e),
       |marked AS (
       |  SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > $GapUs THEN 1 ELSE 0 END AS new_session
       |  FROM lagd),
       |sess AS (
       |  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
       |                                   ROWS UNBOUNDED PRECEDING) AS session_seq
       |  FROM marked)
       |SELECT user_id, min(ts_us) AS session_start_us, max(ts_us) + $GapUs AS session_end_us,
       |       count(*) AS n_events, ${r6Sql("sum(value)")} AS sum_value
       |FROM sess GROUP BY user_id, session_seq
       |ORDER BY user_id, session_start_us""".stripMargin

  /** Ordered conversion funnel view → click → purchase: per user, the
    * first view, the first click STRICTLY after that view, the first
    * purchase strictly after that click — one summary row with stage
    * user-counts and r6 conversion rates. Strict event-time ordering
    * (micros) keys every stage, so a click logged before the user's first
    * view doesn't convert — standard ordered-funnel semantics.
    *
    * Scale: three user_id-keyed aggregates over pre-filtered event slices,
    * each stage joining only the previous stage's (user_id, ts) frame —
    * narrow co-partitioned shuffles, never a self-join of the raw table. */
  /** Per-user funnel stage times (one row per user with a view; later
    * stages NULL until reached) — the intermediate frame shared with the
    * streaming twin [[graft.streaming.Streams.funnelStages]], whose
    * per-user state is exactly one of these rows (StreamsSpec parity). */
  def funnelStagesOn(events: DataFrame): DataFrame = {
    val e = events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
    val v = e.filter(col("event_type") === lit("view"))
      .groupBy("user_id").agg(min(col("ts_us")).as("t_view"))
    val c = e.filter(col("event_type") === lit("click"))
      .join(v, Seq("user_id")).filter(col("ts_us") > col("t_view"))
      .groupBy("user_id").agg(min(col("ts_us")).as("t_click"))
    val p = e.filter(col("event_type") === lit("purchase"))
      .join(c, Seq("user_id")).filter(col("ts_us") > col("t_click"))
      .groupBy("user_id").agg(min(col("ts_us")).as("t_purchase"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
  }

  def funnelOn(events: DataFrame): DataFrame = {
    def rate(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      when(den === lit(0L), lit(0.0)).otherwise(r6(num.cast("double") / den))
    funnelStagesOn(events)
      .agg(count(lit(1)).as("n_view"), count(col("t_click")).as("n_click"),
        count(col("t_purchase")).as("n_purchase"))
      .select(col("n_view"), col("n_click"), col("n_purchase"),
        rate(col("n_click"), col("n_view")).as("view_to_click"),
        rate(col("n_purchase"), col("n_click")).as("click_to_purchase"))
  }

  def funnel(spark: SparkSession, dir: String): DataFrame =
    funnelOn(Tables.events(spark, dir))

  val funnelSql: String =
    s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
       |v AS (SELECT user_id, min(ts_us) AS t_view FROM e
       |      WHERE event_type = 'view' GROUP BY 1),
       |c AS (SELECT e.user_id, min(e.ts_us) AS t_click
       |      FROM e JOIN v ON e.user_id = v.user_id
       |      WHERE e.event_type = 'click' AND e.ts_us > v.t_view GROUP BY 1),
       |p AS (SELECT e.user_id, min(e.ts_us) AS t_purchase
       |      FROM e JOIN c ON e.user_id = c.user_id
       |      WHERE e.event_type = 'purchase' AND e.ts_us > c.t_click GROUP BY 1),
       |s AS (SELECT (SELECT count(*) FROM v) AS n_view,
       |             (SELECT count(*) FROM c) AS n_click,
       |             (SELECT count(*) FROM p) AS n_purchase)
       |SELECT n_view, n_click, n_purchase,
       |       CASE WHEN n_view = 0 THEN 0.0
       |            ELSE ${r6Sql("CAST(n_click AS DOUBLE) / n_view")} END AS view_to_click,
       |       CASE WHEN n_click = 0 THEN 0.0
       |            ELSE ${r6Sql("CAST(n_purchase AS DOUBLE) / n_click")} END AS click_to_purchase
       |FROM s""".stripMargin

  /** Weekly cohort-retention triangle: users keyed by first-seen week
    * (Monday-truncated on both engines); for each (cohort_week,
    * weeks_since) the count of cohort members active that week. Both
    * endpoints are week-truncated, so the day delta divides by 7 exactly.
    * cohort_week ships as a 'YYYY-MM-DD' string (DATE physical types
    * hash-mismatch across engines — repo convention).
    *
    * Scale: one user_id aggregate for first-seen, a user-keyed join
    * carrying two truncated columns, a distinct on (user, cohort, week)
    * and one (cohort, age) count — all narrow. */
  /** The distinct (user, cohort_week, active_week) membership pairs —
    * shared intermediate with the streaming twin
    * [[graft.streaming.Streams.cohortPairs]], which emits exactly these
    * rows incrementally (StreamsSpec parity). Weeks ride as 'yyyy-MM-DD'
    * strings (sortable, engine-portable). */
  def cohortPairsOn(events: DataFrame): DataFrame = {
    val e = events.select(col("user_id"), col("ts"))
    val first = e.groupBy("user_id").agg(min(col("ts")).as("t0"))
    e.join(first, Seq("user_id"))
      .select(col("user_id"),
        date_format(date_trunc("week", col("t0")), "yyyy-MM-dd").as("cohort_week"),
        date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("active_week"))
      .distinct()
  }

  /** Pairs → retention triangle; the finisher both the batch query and the
    * streaming twin's output share. */
  def cohortsFromPairs(pairs: DataFrame): DataFrame =
    pairs
      .select(col("cohort_week"),
        (datediff(to_date(col("active_week")), to_date(col("cohort_week"))) / lit(7))
          .cast("long").as("weeks_since"))
      .groupBy("cohort_week", "weeks_since")
      .agg(count(lit(1)).as("n_active"))
      .orderBy("cohort_week", "weeks_since")

  def cohortsOn(events: DataFrame): DataFrame =
    cohortsFromPairs(cohortPairsOn(events))

  def cohorts(spark: SparkSession, dir: String): DataFrame =
    cohortsOn(Tables.events(spark, dir))

  val cohortsSql: String =
    s"""WITH e AS (SELECT user_id, ts FROM events),
       |f AS (SELECT user_id, min(ts) AS t0 FROM e GROUP BY 1),
       |pairs AS (
       |  SELECT DISTINCT e.user_id,
       |         date_trunc('week', f.t0) AS cw,
       |         date_trunc('week', e.ts) AS aw
       |  FROM e JOIN f ON e.user_id = f.user_id)
       |SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
       |       CAST(date_diff('day', cw, aw) / 7 AS BIGINT) AS weeks_since,
       |       count(*) AS n_active
       |FROM pairs GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val all: Seq[Q] = Seq(
    Q("w_sessionize", sessionize _, sessionizeSql),
    Q("w_session_window", sessionWindowAgg _, sessionWindowAggSql),
    Q("w_funnel", funnel _, funnelSql),
    Q("w_cohorts", cohorts _, cohortsSql),
  )
}
