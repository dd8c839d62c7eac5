package graft.ops

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions.min

/** Lag-diff rate semantics (W1/F5/F6/P5-P7) on the FIXTURES.md edge rows:
  * single-row pushes, timestamp ties, decreasing counters. */
class PushesSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, user: Long, typ: String, tsSec: Long, value: Double) =
    (id, new Timestamp(tsSec * 1000L), user, typ, value, "{}")

  private val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")

  test("single-row push yields no rate rows (lag null dropped)") {
    val df = Seq(ev(1, 1, "a", 0, 10.0)).toDF(cols: _*)
    assert(Pushes.withLagRates(Pushes.withPushAge(df)).count() === 0)
  }

  test("tied timestamps produce dt=0 rows that are filtered out") {
    val df = Seq(ev(1, 1, "a", 100, 10.0), ev(2, 1, "a", 100, 20.0), ev(3, 1, "a", 160, 30.0))
      .toDF(cols: _*)
    val rates = Pushes.withLagRates(Pushes.withPushAge(df))
      .select("event_id", "rate").as[(Long, Double)].collect().toMap
    // pair (1,2) has dt=0 → dropped; pair (2,3): dv=10 over 1 min → 600/h
    assert(rates === Map(3L -> 600.0))
  }

  test("decreasing counter clips the rate to zero, not negative") {
    val df = Seq(ev(1, 1, "a", 0, 50.0), ev(2, 1, "a", 60, 20.0)).toDF(cols: _*)
    val rates = Pushes.withLagRates(Pushes.withPushAge(df))
      .select("rate").as[Double].collect().toSeq
    assert(rates === Seq(0.0))
  }

  test("age_min measures from each push's first event, per push") {
    val df = Seq(ev(1, 1, "a", 0, 1.0), ev(2, 1, "a", 120, 2.0),
      ev(3, 1, "b", 3600, 1.0), ev(4, 1, "b", 3660, 2.0)).toDF(cols: _*)
    val ages = Pushes.withPushAge(df)
      .select("event_id", "age_min").as[(Long, Double)].collect().toMap
    assert(ages === Map(1L -> 0.0, 2L -> 2.0, 3L -> 0.0, 4L -> 1.0))
  }

  test("withFirstLast picks first/last by (ts, event_id) across the frame") {
    val df = Seq(ev(2, 1, "a", 0, 5.0), ev(1, 1, "a", 0, 7.0), ev(3, 1, "a", 60, 9.0))
      .toDF(cols: _*)
    val r = Pushes.withFirstLast(Pushes.withPushAge(df))
      .select("f_val", "l_val").as[(Double, Double)].head()
    assert(r === ((7.0, 9.0))) // event_id 1 wins the ts tie; event 3 is last
  }

  test("firstLastAgg orders correctly for pre-1970 (negative-micros) timestamps") {
    // struct ordering key, not string-encoded: -120s must beat -60s as first
    val df = Seq(ev(1, 1, "a", -60, 5.0), ev(2, 1, "a", -120, 7.0), ev(3, 1, "a", 60, 9.0))
      .toDF(cols: _*)
    val r = Pushes.firstLastAgg(Pushes.withPushAge(df))
      .select("f_val", "l_val").as[(Double, Double)].head()
    assert(r === ((7.0, 9.0)))
  }

  test("firstLastAgg (hash aggregate) matches the window formulation on real data") {
    val aged = Pushes.withPushAge(graft.ops.Tables.events(spark, "/root/testdata/sf0.001"))
    val viaAgg = Pushes.firstLastAgg(aged)
      .select("push_id", "f_val", "l_val", "f_us", "l_us", "posted_us")
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val viaWindow = Pushes.withFirstLast(aged)
      .groupBy("push_id")
      .agg(min("f_val").as("f_val"), min("l_val").as("l_val"),
        min("f_us").as("f_us"), min("l_us").as("l_us"), min("posted_us").as("posted_us"))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(viaAgg.size === viaWindow.size)
    assert(viaAgg === viaWindow)
  }
}
