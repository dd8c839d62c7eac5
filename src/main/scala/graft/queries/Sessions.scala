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

  val all: Seq[Q] = Seq(
    Q("w_sessionize", sessionize _, sessionizeSql),
    Q("w_session_window", sessionWindowAgg _, sessionWindowAggSql),
  )
}
