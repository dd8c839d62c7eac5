package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionsSpec extends SparkSpec {
  import spark.implicits._

  private def events(rows: (Long, String, Long)*) =
    rows.toDF("user_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us")))
      .select("user_id", "event_type", "ts")

  test("funnel counts only strictly-ordered view -> click -> purchase chains") {
    val out = Sessions.funnelOn(events(
      // user 1: full ordered conversion
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // user 2: click BEFORE the first view — the click must not convert
      (2L, "click", 5L), (2L, "view", 10L),
      // user 3: view then purchase with no click — purchase stage unreached
      (3L, "view", 10L), (3L, "purchase", 20L),
      // user 4: ties are strict — click at the same micro as the view drops
      (4L, "view", 10L), (4L, "click", 10L)))
      .as[(Long, Long, Long, Double, Double)].head()
    assert(out === ((4L, 1L, 1L,
      graft.ops.Num.r6Double(1.0 / 4.0), 1.0)))
  }

  test("cohort triangle: week-0 row covers every cohort member, counts never exceed it") {
    val dir = "/root/testdata/sf0.001"
    val rows = Sessions.cohorts(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_._1)
    // every user's first-seen week is an active week, so weeks_since=0
    // exists per cohort and is each cohort's maximum
    byCohort.foreach { case (cw, rs) =>
      val week0 = rs.find(_._2 == 0L)
      assert(week0.nonEmpty, s"cohort $cw missing its week-0 row")
      assert(rs.forall(_._3 <= week0.get._3), s"cohort $cw retention exceeds its size")
      assert(rs.forall(_._2 >= 0L), s"cohort $cw has activity before first-seen")
    }
    // cohort sizes (week-0 counts) partition the user universe
    val nUsers = graft.ops.Tables.events(spark, dir)
      .select("user_id").distinct().count()
    assert(byCohort.values.map(_.find(_._2 == 0L).get._3).sum === nUsers)
  }

  test("as-of join: inclusive at-or-before, tie dedup to max id, nulls with no prior quote") {
    def ev(rows: (Long, Long, String, Long, Double)*) =
      rows.toDF("event_id", "user_id", "event_type", "us", "value")
        .withColumn("ts", timestamp_micros(col("us")))
        .select("event_id", "user_id", "event_type", "ts", "value")
    val out = Sessions.asofJoinOn(ev(
      // user 1: quote at 10, trade at 20 → matches; trade at 10 (equal ts)
      // → INCLUSIVE at-or-before matches the ts-10 quote too
      (100L, 1L, "view", 10L, 1.5),
      (101L, 1L, "purchase", 20L, 9.0),
      (102L, 1L, "purchase", 10L, 9.0),
      // user 2: TWO quotes at the same ts → max event_id wins the tie
      (200L, 2L, "view", 10L, 2.0),
      (201L, 2L, "view", 10L, 3.0),
      (202L, 2L, "purchase", 15L, 9.0),
      // user 2: a LATER quote must shadow the earlier ones
      (203L, 2L, "view", 20L, 4.0),
      (204L, 2L, "purchase", 25L, 9.0),
      // user 3: trade before any quote → NULL match
      (300L, 3L, "purchase", 5L, 9.0),
      (301L, 3L, "view", 10L, 5.0),
      // non-view/purchase events are ignored entirely
      (400L, 1L, "click", 15L, 7.0)))
      .as[(Long, Long, Long, Option[Long], Option[Long], Option[Double])]
      .collect().map(r => r._1 -> ((r._4, r._5, r._6))).toMap
    assert(out(101L) === ((Some(100L), Some(10L), Some(1.5))))
    assert(out(102L) === ((Some(100L), Some(10L), Some(1.5))), "equal-ts quote must match (inclusive)")
    assert(out(202L) === ((Some(201L), Some(10L), Some(3.0))), "tie must dedupe to max event_id")
    assert(out(204L) === ((Some(203L), Some(20L), Some(4.0))), "later quote must shadow earlier")
    assert(out(300L) === ((None, None, None)), "no prior quote → null match")
    assert(out.keySet === Set(101L, 102L, 202L, 204L, 300L), "one row per trade, only trades")
  }

  test("bounded-horizon as-of: inside keeps, beyond nulls, exactly-at-horizon inclusive") {
    def ev(rows: (Long, Long, String, Long, Double)*) =
      rows.toDF("event_id", "user_id", "event_type", "us", "value")
        .withColumn("ts", timestamp_micros(col("us")))
        .select("event_id", "user_id", "event_type", "ts", "value")
    val out = Sessions.asofHorizonOn(ev(
      (100L, 1L, "purchase", 10L, 9.0),
      (101L, 1L, "view", 15L, 1.5),  // gap 5 ≤ 10 → matched
      (200L, 2L, "purchase", 10L, 9.0),
      (201L, 2L, "view", 30L, 2.0),  // gap 20 > 10 → horizon-nulled
      (300L, 3L, "purchase", 10L, 9.0),
      (301L, 3L, "view", 20L, 3.0),  // gap exactly 10 → INCLUSIVE keep
      (400L, 4L, "purchase", 10L, 9.0)), // no view at all → null
      horizonUs = 10L)
      .as[(Long, Long, Long, Option[Long], Option[Long], Option[Double])]
      .collect().map(r => r._1 -> ((r._4, r._5, r._6))).toMap
    assert(out(100L) === ((Some(101L), Some(15L), Some(1.5))))
    assert(out(200L) === ((None, None, None)), "beyond-horizon view must null, not match")
    assert(out(300L) === ((Some(301L), Some(20L), Some(3.0))), "exactly at ts+H is inclusive")
    assert(out(400L) === ((None, None, None)))
    assert(out.keySet === Set(100L, 200L, 300L, 400L), "one row per purchase, nulls included")
  }

  test("rate spike: planted burst over a quiet baseline flags, silent hours zero-fill") {
    val H = Sessions.HourUs
    // type "a": exactly one event per hour for 30 h, plus a 50-event burst
    // in hour 27 and NO events in hour 28 (the gap must zero-fill, not
    // shrink the baseline window)
    val rows = (0 until 30).filter(_ != 28).map(h => ("a", h * H + 1)) ++
      (0 until 50).map(i => ("a", 27 * H + 100 + i))
    val out = Sessions.rateSpikeOn(rows.toDF("event_type", "ts_us")).collect()
      .map(r => (r.getLong(1) / H) -> ((r.getLong(2), r.getDouble(5), r.getBoolean(6)))).toMap
    // warmup dropped: first emitted bucket is hour 24
    assert(out.keySet === (24L to 29L).toSet)
    // hour 27 carries 1 + 50 events over a σ=0, mean-1 baseline: the std
    // floor of 1 gives z = 50, flagged
    assert(out(27L)._1 === 51L && out(27L)._2 === 50.0 && out(27L)._3)
    // the quiet hours sit on the baseline: z = 0, unflagged
    assert(out(24L) === ((1L, 0.0, false)))
    // hour 28 exists as a zero-filled bucket; its baseline now contains
    // the burst (mean (23+51)/24), so z is negative, not a spike
    assert(out(28L)._1 === 0L && out(28L)._2 < 0.0 && !out(28L)._3)
  }
}
