package graft.api

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Reference-semantics tests over the reference's OWN schema, using the
  * FIXTURES.md synthetic edge rows: coerce boundaries, bin edges, discard
  * paths, HAVING boundary, dedup determinism. */
class MarktAnalyzerSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def monitorDf(rows: (Long, String, Int, Double, Double)*) =
    rows.toDF("id", "ad_unique_id", "push_counter", "ad_age_in_minutes", "views")

  test("age buckets: boundaries 17/18/19.5/26, garbage and empty coerce to null") {
    val profiles = Seq(
      ("a", 1, "17", "x sexchat y"), ("a", 2, "18", "sexchat"), ("a", 3, "19.5", "SEXCHAT!"),
      ("a", 4, "26", "sexchat"), ("a", 5, "abc", "sexchat"), ("a", 6, "", "sexchat"))
      .toDF("ad_unique_id", "push_counter", "age", "profile_url")
    val monitor = monitorDf(
      (1, "a", 1, 0, 0), (2, "a", 1, 10, 5),
      (3, "a", 2, 0, 0), (4, "a", 2, 10, 5),
      (5, "a", 3, 0, 0), (6, "a", 3, 10, 5),
      (7, "a", 4, 0, 0), (8, "a", 4, 10, 5),
      (9, "a", 5, 0, 0), (10, "a", 5, 10, 5),
      (11, "a", 6, 0, 0), (12, "a", 6, 10, 5))
    val out = MarktAnalyzer.lifetimeRateCurves(monitor, profiles)
      .select("age_group").distinct().as[String].collect().toSet
    // 17 (<18), "abc", "" are dropped; 18 → 18-19, 19.5 → 18-19, 26 → 26+
    assert(out === Set("18-19", "26+"))
  }

  test("category: both substrings present → first match wins; null url → other (excluded)") {
    val profiles = Seq(
      ("a", 1, "20", "has sexbilder-sexvideos and sexchat"),
      ("a", 2, "20", null))
      .toDF("ad_unique_id", "push_counter", "age", "profile_url")
    val monitor = monitorDf((1, "a", 1, 0, 0), (2, "a", 1, 10, 5), (3, "a", 2, 0, 0), (4, "a", 2, 10, 5))
    val cats = MarktAnalyzer.lifetimeRateCurves(monitor, profiles)
      .select("category").distinct().as[String].collect().toSeq
    assert(cats === Seq("sexbilder-sexvideos")) // first-wins; null url excluded by isin
  }

  test("computeViewRate drops single-row pushes and zero-gap ties, clips negatives") {
    val monitor = monitorDf(
      (1, "x", 1, 0, 100),            // single-row push → dropped
      (2, "y", 1, 10, 50), (3, "y", 1, 10, 60), (4, "y", 1, 70, 80), // tie then +20 in 60min
      (5, "z", 1, 0, 90), (6, "z", 1, 60, 30)) // decreasing → clip 0
    val rates = MarktAnalyzer.computeViewRate(monitor)
      .select("ad_push", "views_per_hour").as[(String, Double)].collect()
    assert(!rates.map(_._1).contains("x_1"))
    assert(rates.toSet === Set(("y_1", 20.0), ("z_1", 0.0)))
  }

  test("binAndSmooth keeps the full 288-bin grid (pandas observed=False) and smooths over grid neighbors") {
    val profiles = Seq(("a", 1, "20", "sexchat"), ("b", 1, "20", "sexchat"))
      .toDF("ad_unique_id", "push_counter", "age", "profile_url")
    // two pushes with ONE delta each: bin (0,5] (mid 2.5) and (10,15] (mid 12.5)
    val monitor = monitorDf(
      (1, "a", 1, 0.0, 0.0), (2, "a", 1, 5.0, 10.0),    // rate 120/h at mid 2.5
      (3, "b", 1, 10.0, 10.0), (4, "b", 1, 15.0, 20.0)) // rate 120/h at mid 12.5
    val out = MarktAnalyzer.lifetimeRateCurves(monitor, profiles)
    assert(out.count() === 288) // full grid, empty bins present as null-rate rows
    val rows = out.select("bin", "avg_rate", "smoothed_rate")
      .collect().map(r => (r.getDouble(0), Option(r.get(1)), Option(r.get(2)))).toSeq
    val byBin = rows.map(t => t._1 -> (t._2, t._3)).toMap
    assert(byBin(2.5)._1 === Some(120.0))
    assert(byBin(7.5)._1 === None) // empty bin kept
    // centered-5 window at empty bin 7.5 sees 2.5 and 12.5 → (120+120)/2
    assert(byBin(7.5)._2 === Some(120.0))
    // far-away empty bins: whole window empty → null smoothed (NaN in pandas)
    assert(byBin(722.5)._1 === None && byBin(722.5)._2 === None)
  }

  test("duplicate profile rows fan a push into per-subset diff sequences (analyse.py:99-106)") {
    // Script A does NOT dedup profiles: a push scraped under two ages joins
    // into BOTH (category, age_group) subsets, and the reference's per-subset
    // compute_view_rate gives each subset its own consecutive-row deltas.
    val profiles = Seq(("a", 1, "18", "sexchat"), ("a", 1, "26", "sexchat"))
      .toDF("ad_unique_id", "push_counter", "age", "profile_url")
    val monitor = monitorDf((1, "a", 1, 0.0, 0.0), (2, "a", 1, 10.0, 5.0))
    val out = MarktAnalyzer.lifetimeRateCurves(monitor, profiles)
      .filter(col("avg_rate").isNotNull)
      .select("category", "age_group", "bin", "avg_rate")
      .as[(String, String, Double, Double)].collect().toSet
    // one 30 views/h delta at mid_age 5.0 → bin (0,5] center 2.5, in EACH subset
    assert(out === Set(
      ("sexchat", "18-19", 2.5, 30.0),
      ("sexchat", "26+", 2.5, 30.0)))
  }

  test("dedup after cleaning: a null-posting_time duplicate row cannot erase the push") {
    val profiles = Seq(
      ("a", 1, null.asInstanceOf[Timestamp]), // would win keep-first if dedup ran before dropna
      ("a", 1, ts("2024-01-01 00:05:00")))
      .toDF("ad_unique_id", "push_counter", "posting_time")
    val nonzero = MarktAnalyzer.pushCountsByTimeOfDay(profiles)
      .filter(col("n_pushes") > 0).select("bin_label").as[String].collect().toSeq
    assert(nonzero === Seq("00:00"))
  }

  test("Script C: discard paths — no record <=40, latest not after earliest, HAVING boundary") {
    // city "Nine" has 9 pushes (below gate), "Ten" has 10 (at gate)
    val profiles = (1 to 9).map(i => (s"n$i", 1, "Nine", ts("2024-01-01 00:00:00"))) ++
      (1 to 10).map(i => (s"t$i", 1, " Ten ", ts("2024-01-01 00:00:00")))
    val pdf = profiles.toDF("ad_unique_id", "push_counter", "city", "posting_time")
    // each push: good pair (age 10 → 100) except t1 (first record at age 50
    // → no earliest) and t2 (only one record ≤ 400 → latest == earliest)
    val monRows = profiles.zipWithIndex.flatMap { case ((ad, pc, _, _), i) =>
      if (ad == "t1") Seq((i * 10L + 1, ad, pc, 50.0, 10.0), (i * 10L + 2, ad, pc, 100.0, 30.0))
      else if (ad == "t2") Seq((i * 10L + 1, ad, pc, 10.0, 10.0))
      else Seq((i * 10L + 1, ad, pc, 10.0, 10.0), (i * 10L + 2, ad, pc, 100.0, 30.0))
    }
    val monitor = monRows.toDF("id", "ad_unique_id", "push_counter", "ad_age_in_minutes", "views")
    val out = MarktAnalyzer.cityLeagueTable(monitor, pdf)
      .as[(String, Double, Long)].collect()
    // "Nine" excluded by the >=10 gate; city trimmed; t1/t2 discarded → 8 used
    assert(out.toSeq === Seq(("Ten", 20.0, 8L)))
  }

  test("initial-rate gate: pushes with one distinct age are excluded; hour zero-fill feeds smoother") {
    val profiles = Seq(("a", 1, ts("2024-01-01 05:30:00")), ("b", 1, ts("2024-01-01 05:40:00")))
      .toDF("ad_unique_id", "push_counter", "posting_time")
    val monitor = monitorDf(
      (1, "a", 1, 10, 0), (2, "a", 1, 110, 50),   // rate = 50/100*60 = 30
      (3, "b", 1, 10, 0), (4, "b", 1, 10, 99))    // nunique(age)=1 → excluded (:259)
    val out = MarktAnalyzer.initialRateByPostingHour(monitor, profiles)
      .select("posting_hour", "avg_initial_rate", "smoothed_rate")
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(out.length === 24)
    val at5 = out(5)
    assert(at5._2 === 30.0)
    // neighbors are zero-filled → smoothed at hours 4/5/6 = (0+0+30)/3 each
    assert(math.abs(at5._3 - 10.0) < 1e-12)
    assert(out(4)._3 === 10.0 && out(6)._3 === 10.0)
    assert(out(3)._3 === 0.0 && out(7)._3 === 0.0)
  }

  test("push counts: all 144 time bins, labels formatted, dedup keeps one row per push") {
    val profiles = Seq(
      ("a", 1, ts("2024-01-01 00:05:00")), ("a", 1, ts("2024-01-01 23:59:00")), // dupe push
      ("b", 1, ts("2024-01-01 00:07:00")))
      .toDF("ad_unique_id", "push_counter", "posting_time")
    val out = MarktAnalyzer.pushCountsByTimeOfDay(profiles)
    assert(out.count() === 144)
    val nonzero = out.filter(col("n_pushes") > 0)
      .select("bin_label", "n_pushes").as[(String, Long)].collect().toSeq
    assert(nonzero === Seq(("00:00", 2L))) // both land in [00:00,00:10); dupe keeps first posting_time
  }

  // ------------------------------------------------------- end-to-end golden
  /** Golden fixture comparison: tools/make_markt_golden.py runs the three
    * analyses in LITERAL pandas (mirroring analyse.py step by step) over a
    * checked-in monitor/profiles fixture; this test runs MarktAnalyzer on
    * the same CSVs and demands row-for-row agreement. */
  private def resPath(name: String): String =
    getClass.getResource(s"/markt/$name").getPath

  private def approxRows(actual: Seq[Seq[Any]], expected: Seq[Seq[Any]], tag: String): Unit = {
    assert(actual.size == expected.size, s"$tag: ${actual.size} rows vs golden ${expected.size}")
    actual.zip(expected).zipWithIndex.foreach { case ((a, e), i) =>
      a.zip(e).foreach {
        case (x: Double, y: Double) =>
          assert(math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(y)),
            s"$tag row $i: $x vs golden $y\nactual=$a\ngolden=$e")
        case (x, y) => assert(x == y, s"$tag row $i: $x vs golden $y\nactual=$a\ngolden=$e")
      }
    }
  }

  test("end-to-end golden: all three analyses match the pandas-derived fixture outputs") {
    import org.apache.spark.sql.types._
    val tsOpts = Map("header" -> "true", "timestampFormat" -> "yyyy-MM-dd HH:mm:ss")
    val profiles = spark.read.options(tsOpts)
      .schema(StructType(Seq(
        StructField("ad_unique_id", StringType), StructField("push_counter", IntegerType),
        StructField("age", StringType), StructField("profile_url", StringType),
        StructField("posting_time", TimestampType), StructField("city", StringType))))
      .csv(resPath("profiles.csv"))
    val monitor = spark.read.options(tsOpts)
      .schema(StructType(Seq(
        StructField("id", LongType), StructField("ad_unique_id", StringType),
        StructField("push_counter", IntegerType), StructField("track_time", TimestampType),
        StructField("ad_age_in_minutes", DoubleType), StructField("views", DoubleType))))
      .csv(resPath("monitor_records.csv"))
    def rows(df: org.apache.spark.sql.DataFrame, cols: String*): Seq[Seq[Any]] =
      df.select(cols.map(col): _*).collect().map(_.toSeq).toSeq

    // Script A: smoothed lifetime curves, full 288-bin grid per group
    val a = MarktAnalyzer.lifetimeRateCurves(monitor, profiles)
    val goldenA = spark.read.option("header", "true")
      .schema(StructType(Seq(
        StructField("category", StringType), StructField("age_group", StringType),
        StructField("bin", DoubleType), StructField("avg_rate", DoubleType),
        StructField("smoothed_rate", DoubleType), StructField("time_hours", DoubleType))))
      .csv(resPath("golden_a_lifetime.csv"))
      .orderBy("category", "age_group", "bin")
    approxRows(
      rows(a, "category", "age_group", "bin", "avg_rate", "smoothed_rate", "time_hours"),
      rows(goldenA, "category", "age_group", "bin", "avg_rate", "smoothed_rate", "time_hours"),
      "script A")

    // Script B part 1: push counts per 10-minute bin, all 144 bins
    val b1 = MarktAnalyzer.pushCountsByTimeOfDay(profiles)
    val goldenB1 = spark.read.option("header", "true")
      .schema(StructType(Seq(
        StructField("time_bin", LongType), StructField("bin_label", StringType),
        StructField("n_pushes", LongType))))
      .csv(resPath("golden_b_counts.csv")).orderBy("time_bin")
    approxRows(
      rows(b1, "time_bin", "bin_label", "n_pushes"),
      rows(goldenB1, "time_bin", "bin_label", "n_pushes"), "script B counts")

    // Script B part 2: smoothed initial rate by posting hour, hours 0-23
    val b2 = MarktAnalyzer.initialRateByPostingHour(monitor, profiles)
    val goldenB2 = spark.read.option("header", "true")
      .schema(StructType(Seq(
        StructField("posting_hour", LongType), StructField("avg_initial_rate", DoubleType),
        StructField("smoothed_rate", DoubleType), StructField("n_pushes", LongType))))
      .csv(resPath("golden_b_hourly.csv")).orderBy("posting_hour")
    approxRows(
      rows(b2, "posting_hour", "avg_initial_rate", "smoothed_rate", "n_pushes"),
      rows(goldenB2, "posting_hour", "avg_initial_rate", "smoothed_rate", "n_pushes"),
      "script B hourly")

    // Script C: city league table (Hamburg gated out at MIN_ADS_PER_CITY)
    val c = MarktAnalyzer.cityLeagueTable(monitor, profiles)
    val goldenC = spark.read.option("header", "true")
      .schema(StructType(Seq(
        StructField("city", StringType), StructField("avg_views_gained", DoubleType),
        StructField("n_pushes_used", LongType))))
      .csv(resPath("golden_c_league.csv"))
      .orderBy(col("avg_views_gained").desc, col("city"))
    approxRows(
      rows(c, "city", "avg_views_gained", "n_pushes_used"),
      rows(goldenC, "city", "avg_views_gained", "n_pushes_used"), "script C")
  }
}
