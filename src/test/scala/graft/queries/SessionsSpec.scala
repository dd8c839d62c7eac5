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
}
