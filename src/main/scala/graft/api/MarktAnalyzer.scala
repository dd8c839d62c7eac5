package graft.api

import graft.ops.{Binning, Smoothing}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Drop-in API for users of the reference analyzer: the three analyses of
  * Elwii04/Markt-Database-Analyzer over DataFrames with the REFERENCE'S OWN
  * schema — `monitor_records(ad_unique_id, push_counter, track_time,
  * ad_age_in_minutes, views [, id])` and `profiles(ad_unique_id,
  * push_counter, age, profile_url, posting_time, city)` — with the
  * reference's exact constants, boundary semantics, and quirks:
  *
  *  - coerce-to-null numeric/timestamp parsing (`errors='coerce'`,
  *    analyse.py:29,175-176,183-184,386-387)
  *  - age buckets 18-19 / 20-25 / 26+, out-of-range → NULL (analyse.py:34-44)
  *  - URL categories "sexbilder-sexvideos" / "sexchat" / other, null→false
  *    contains, first match wins (analyse.py:49-57)
  *  - right-closed 5-minute bins over (0,1440], include_lowest
  *    (analyse.py:83-85); left-closed 10-minute time-of-day bins
  *    (analyse.py:214-218)
  *  - centered rolling means, min_periods=1 (analyse.py:90,297), computed
  *    over PRESENT rows, with the zero-filled domains feeding the smoother
  *    (analyse.py:224,295-297)
  *  - MAX_AGE_MINUTES=119 (analyse.py:150), 40/400-minute Script C window
  *    (analyse.py:363-364 — the code's 400, not the comment's "6 hours"),
  *    MIN_ADS_PER_CITY=10 (analyse.py:362)
  *
  * pandas keeps FIRST duplicates/rows in file order; DataFrames have no file
  * order, so every such place takes an explicit deterministic order — the
  * monitor `id` column (analyse.py:159) and a caller-chosen profile
  * tiebreaker (default `posting_time`).
  */
object MarktAnalyzer {
  val MaxAgeMinutes = 119.0      // analyse.py:150  (labeled "first 2 hours")
  val EarliestWindowMin = 40.0   // analyse.py:363
  val LatestWindowMin = 400.0    // analyse.py:364  (labeled "6 hours")
  val MinAdsPerCity = 10         // analyse.py:362
  val LifetimeBinMin = 5.0       // analyse.py:83
  val LifetimeMaxMin = 1440.0    // analyse.py:83 (first 24 h)

  private def adPush: Column =
    concat(col("ad_unique_id"), lit("_"), col("push_counter").cast("string"))

  /** Age bucketing (analyse.py:34-44) over the coerced numeric age:
    * no otherwise → NULL for <18 / unparsable (the UDF's `return None`). */
  def ageGroup(ageNumeric: Column): Column =
    when(ageNumeric.between(18, 19), "18-19")
      .when(ageNumeric.between(20, 25), "20-25")
      .when(ageNumeric >= 26, "26+")

  /** URL categorization (analyse.py:49-57): case-insensitive contains,
    * null → false, first match wins. */
  def category(profileUrl: Column): Column =
    when(coalesce(lower(profileUrl).contains("sexbilder-sexvideos"), lit(false)), "sexbilder-sexvideos")
      .when(coalesce(lower(profileUrl).contains("sexchat"), lit(false)), "sexchat")
      .otherwise("other")

  /** compute_view_rate (analyse.py:61-76): per-push consecutive deltas over
    * ad_age order (ties broken by idCol), Δt>0, rate clipped at 0,
    * interval midpoint.
    *
    * The reference calls compute_view_rate once per (category, age_group)
    * SUBSET (analyse.py:99-106), so when the un-dedup'd profiles join fans a
    * push into several subsets, diffs run within each subset independently.
    * `groupCols` reproduces that: the lag window partitions by ad_push PLUS
    * the subset columns, so each subset sees its own consecutive-row deltas
    * (one rate row per subset per age step, exactly as the pandas loop). */
  def computeViewRate(monitor: DataFrame, idCol: String = "id",
                      groupCols: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(("ad_push" +: groupCols).map(col): _*)
      .orderBy(col("ad_age_in_minutes"), col(idCol))
    monitor
      .withColumn("ad_push", adPush)
      .withColumn("delta_views", col("views") - lag("views", 1).over(w))
      .withColumn("delta_time", col("ad_age_in_minutes") - lag("ad_age_in_minutes", 1).over(w))
      .filter(col("delta_views").isNotNull && col("delta_time").isNotNull) // dropna :71
      .filter(col("delta_time") > 0)                                       // :72
      .withColumn("views_per_hour", greatest(lit(0.0), col("delta_views") * 60 / col("delta_time")))
      .withColumn("mid_age", col("ad_age_in_minutes") - col("delta_time") / 2)
  }

  /** bin_and_smooth (analyse.py:78-92) generalized over grouping columns
    * (the reference's 2×3 python loop = groupCols Seq("category",
    * "age_group")).
    *
    * pd.cut yields a Categorical, and the groupby at analyse.py:86 keeps
    * ALL bin categories (pandas observed=False default) — so the rolling
    * window at :90 runs over the full 288-bin grid with NaN means in empty
    * bins, which the NaN-skipping rolling mean then ignores. Reproduced by
    * outer-joining the full center grid per group before smoothing:
    * empty bins surface as null avg_rate rows and the centered mean counts
    * only non-null neighbors (null when the whole window is empty). */
  def binAndSmooth(rates: DataFrame, groupCols: Seq[String],
                   binSizeMin: Double = LifetimeBinMin,
                   smoothingWindow: Int = 5): DataFrame = {
    val half = smoothingWindow / 2
    val gcols = groupCols.map(col)
    val nBins = (LifetimeMaxMin / binSizeMin).toInt
    val binned = rates
      .withColumn("bin", Binning.cutRightClosed(col("mid_age"), binSizeMin, LifetimeMaxMin))
      .filter(col("bin").isNotNull) // out-of-range mid_age → NaN key → dropped
      .groupBy(gcols :+ col("bin"): _*)
      .agg(avg("views_per_hour").as("avg_rate"))
    val centers = rates.sparkSession.range(0, nBins)
      .select((col("id") * binSizeMin + binSizeMin / 2).as("bin"))
    val domain = binned.select(gcols: _*).distinct().crossJoin(centers)
    val filled = domain.join(binned, groupCols :+ "bin", "left")
    val w = Window.partitionBy(gcols: _*).orderBy("bin")
    filled
      .withColumn("smoothed_rate", Smoothing.centeredMean(col("avg_rate"), w, half))
      .withColumn("time_hours", col("bin") / 60.0)
      .orderBy(gcols :+ col("bin"): _*)
  }

  /** Script A (analyse.py:1-135): smoothed lifetime view-rate curves per
    * (category, age_group). */
  def lifetimeRateCurves(monitor: DataFrame, profiles: DataFrame,
                         idCol: String = "id"): DataFrame = {
    val dim = profiles
      .select(col("ad_unique_id"), col("push_counter"), col("age"), col("profile_url"))
      .filter(col("age").isNotNull && col("age").cast("string") =!= "") // :28
      .withColumn("age_numeric", expr("try_cast(age AS double)"))       // :29
      .filter(col("age_numeric").isNotNull)                             // :30
      .withColumn("age_group", ageGroup(col("age_numeric")))            // :34-44
      .filter(col("age_group").isNotNull)                               // :45
      .withColumn("category", category(col("profile_url")))             // :49-57
      .filter(col("category").isin("sexbilder-sexvideos", "sexchat"))   // :58
      .select("ad_unique_id", "push_counter", "age_group", "category")
    val joined = monitor.join(broadcast(dim), Seq("ad_unique_id", "push_counter")) // :19-24
    // per-subset diffs (analyse.py:99-106): partition the lag window by the
    // grouping columns too, so duplicate-profile fan-out stays per-subset
    binAndSmooth(computeViewRate(joined, idCol, Seq("category", "age_group")),
      Seq("category", "age_group"))
  }

  /** Keep-FIRST dedup of profiles by push key (analyse.py:194,237,408) —
    * pandas keeps file order; here order = (tiebreakCols). */
  def dedupProfiles(profiles: DataFrame, tiebreakCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy("ad_unique_id", "push_counter")
      .orderBy(tiebreakCols.map(col): _*)
    profiles.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Script B part 1 (analyse.py:192-227): new pushes per 10-minute
    * interval of the day, all 144 bins present, zero-filled.
    * Cleaning precedes dedup, matching the reference order (dropna at
    * :180 before drop_duplicates at :194) — the other way round, a null
    * row can win the keep-first race and silently drop the whole push. */
  def pushCountsByTimeOfDay(profiles: DataFrame): DataFrame = {
    val deduped = dedupProfiles(
      profiles.filter(col("posting_time").isNotNull), // dropna :180 FIRST
      Seq("posting_time"))
    val counts = deduped
      .withColumn("minute_of_day", hour(col("posting_time")) * 60 + minute(col("posting_time"))) // :204
      .withColumn("time_bin", Binning.floorBin(col("minute_of_day").cast("long"), 10))           // :214-218
      .groupBy("time_bin").agg(count(lit(1)).as("n_pushes"))
    Binning.zeroFillDomain(deduped.sparkSession, 144, 10, "time_bin", counts,
        Seq("n_pushes" -> lit(0L)))                                                              // :224
      .withColumn("bin_label", Binning.hhmmLabel(col("time_bin")))                               // :211
      .orderBy("time_bin")
  }

  /** Script B part 2 (analyse.py:231-300): average initial views/hour
    * (first MaxAgeMinutes of each push) by posting hour, zero-filled over
    * hours 0-23, centered rolling-3 smoothed. */
  def initialRateByPostingHour(monitor: DataFrame, profiles: DataFrame,
                               idCol: String = "id"): DataFrame = {
    // monitor-side coercion + dropna (analyse.py:175-185) BEFORE any use:
    // a null views/age row would otherwise poison first/last into a
    // spurious 0.0 rate via greatest(0.0, null)
    val cleanedMonitor = monitor
      .withColumn("ad_age_in_minutes", expr("try_cast(ad_age_in_minutes AS double)")) // :183
      .withColumn("views", expr("try_cast(views AS double)"))                          // :184
      .filter(col("ad_age_in_minutes").isNotNull && col("views").isNotNull)            // :185
    val dim = dedupProfiles(
      profiles.filter(col("posting_time").isNotNull), // dropna :180 before dedup :237
      Seq("posting_time"))
      .select("ad_unique_id", "push_counter", "posting_time")
    val joined = cleanedMonitor.join(broadcast(dim), Seq("ad_unique_id", "push_counter")) // :235-240
      .filter(col("ad_age_in_minutes") <= MaxAgeMinutes)                           // :245
      .withColumn("ad_push", adPush)
    val w = Window.partitionBy("ad_push").orderBy(col("ad_age_in_minutes"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val per = joined
      .withColumn("f_views", first("views").over(w))
      .withColumn("l_views", last("views").over(w))
      .withColumn("f_age", first("ad_age_in_minutes").over(w))
      .withColumn("l_age", last("ad_age_in_minutes").over(w))
      .groupBy("ad_push")
      .agg(min("f_views").as("f_views"), min("l_views").as("l_views"),
        min("f_age").as("f_age"), min("l_age").as("l_age"),
        first("posting_time").as("posting_time"),
        count(lit(1)).as("n"), countDistinct("ad_age_in_minutes").as("n_ages"))
      .filter(col("n") >= 2 && col("n_ages") > 1)                                  // :259
      .withColumn("delta_t", col("l_age") - col("f_age"))
      .filter(col("delta_t") > 0)                                                  // :267
      .withColumn("initial_views_per_hour",
        greatest(lit(0.0), (col("l_views") - col("f_views")) / col("delta_t") * 60)) // :268-270
      .withColumn("posting_hour", hour(col("posting_time")).cast("long"))            // :273
    val byHour = per.groupBy("posting_hour")
      .agg(avg("initial_views_per_hour").as("avg_initial_rate"), count(lit(1)).as("n_pushes"))
    val filled = Binning.zeroFillDomain(monitor.sparkSession, 24, 1, "posting_hour", byHour,
      Seq("avg_initial_rate" -> lit(0.0), "n_pushes" -> lit(0L)))                  // :295 fills 0.0
    filled
      .withColumn("smoothed_rate",
        Smoothing.centeredMean(col("avg_initial_rate"), Window.orderBy("posting_hour"), 1)) // :297
      .orderBy("posting_hour")
  }

  /** Script C (analyse.py:356-513): city league table — views gained
    * between the earliest record ≤40 min and latest ≤400 min, per-city
    * mean, cities with <MinAdsPerCity pushes excluded, sorted desc. */
  def cityLeagueTable(monitor: DataFrame, profiles: DataFrame,
                      idCol: String = "id"): DataFrame = {
    val cleanedMonitor = monitor
      .withColumn("ad_age_in_minutes", expr("try_cast(ad_age_in_minutes AS double)")) // :386
      .withColumn("views", expr("try_cast(views AS double)"))                          // :387
      .filter(col("ad_age_in_minutes").isNotNull && col("views").isNotNull)            // :388
    // clean city BEFORE dedup (reference: trim/''→NaN/dropna at :390-392
    // precede drop_duplicates at :408) — inverted order would let a blank
    // city win keep-first and drop the push
    val dim = dedupProfiles(
      profiles
        .withColumn("city", nullif(trim(col("city")), lit("")))                        // :390-391
        .filter(col("city").isNotNull),                                                // :392
      Seq("city"))                                                                     // :408
      .select("ad_unique_id", "push_counter", "city")
    val joined = cleanedMonitor.join(broadcast(dim), Seq("ad_unique_id", "push_counter")) // :406-411
      .withColumn("ad_push", adPush)
    // HAVING gate on the dedup'd pre-join pushes ("safer to count based on
    // the profiles data", analyse.py:418-422)
    val goodCities = dim.groupBy("city").agg(count(lit(1)).as("n_pushes"))
      .filter(col("n_pushes") >= MinAdsPerCity).select("city")
    val gated = joined.join(goodCities, Seq("city"), "left_semi")                      // :431
    // earliest record ≤40 / latest ≤400 via conditional min_by/max_by (A6);
    // idCol breaks exact age ties like pandas' stable sort (:447)
    val per = gated
      .filter(col("ad_age_in_minutes") <= LatestWindowMin)
      .groupBy("ad_push", "city")
      .agg(
        min_by(struct(col("views"), col("ad_age_in_minutes")),
          when(col("ad_age_in_minutes") <= EarliestWindowMin,
            struct(col("ad_age_in_minutes"), col(idCol)))).as("first_rec"),            // :450-454
        max_by(struct(col("views"), col("ad_age_in_minutes")),
          struct(col("ad_age_in_minutes"), col(idCol))).as("last_rec"))                // :457-462
      .filter(col("first_rec").isNotNull)                                              // no record ≤40 → discard
      .filter(col("last_rec.ad_age_in_minutes") > col("first_rec.ad_age_in_minutes")) // :465
      .withColumn("views_gained_6hr",
        greatest(lit(0.0), col("last_rec.views") - col("first_rec.views")))            // :470-471
    per.groupBy("city")
      .agg(avg("views_gained_6hr").as("avg_views_gained"), count(lit(1)).as("n_pushes_used"))
      .orderBy(col("avg_views_gained").desc, col("city"))                              // :496
  }
}
