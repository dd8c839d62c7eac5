package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed-width binning, reproducing pandas `pd.cut` boundary semantics
  * (SURVEY §2.9 X4/X5 and §7.4 hard-part 1), plus the reindex-against-domain
  * zero-fill joins (J5/J6, analyse.py:224,295).
  */
object Binning {
  /** pd.cut(x, edges 0..max by width, right=True, include_lowest=True)
    * → bin CENTER label (analyse.py:83-85): intervals (lo, hi], the first
    * one [0, width]; out-of-range → NULL (and the caller must drop NULL bins
    * before grouping, matching pandas groupby's NaN-key drop, A1). */
  def cutRightClosed(x: Column, width: Double, max: Double): Column =
    when(x < lit(0.0) || x > lit(max), lit(null).cast("double"))
      .when(x <= lit(width), lit(width / 2))
      .otherwise((ceil(x / lit(width)) - lit(1)).cast("double") * lit(width) + lit(width / 2))

  def cutRightClosedSql(x: String, width: Double, max: Double): String =
    s"""CASE WHEN $x < 0.0 OR $x > $max THEN NULL
       |     WHEN $x <= $width THEN ${width / 2}
       |     ELSE (ceil($x / $width) - 1) * $width + ${width / 2} END""".stripMargin

  /** pd.cut(..., right=False) over integer minute-of-day (analyse.py:214-218,
    * X5): left-closed [lo, hi) — for integers this is plain floor division.
    * Input and output are BIGINT so both engines stay in exact arithmetic. */
  def floorBin(x: Column, width: Long): Column = (x - pmod(x, lit(width)))

  /** "HH:MM" label for a minute-of-day bin (P15, analyse.py:211). */
  def hhmmLabel(minuteOfDay: Column): Column =
    format_string("%02d:%02d", (minuteOfDay / lit(60)).cast("long"), pmod(minuteOfDay, lit(60)))

  def hhmmLabelSql(x: String): String = s"printf('%02d:%02d', $x // 60, $x % 60)"

  /** Zero-fill against a generated integer domain (J5/J6): LEFT JOIN counts
    * onto spark.range and coalesce missing groups to a fill value. The fill
    * deliberately participates in any subsequent rolling mean (hard-part 4).
    * Scale: the domain is tiny (24/144 rows) → broadcast side of the join. */
  def zeroFillDomain(spark: SparkSession, n: Long, step: Long, key: String,
                     counts: DataFrame, fills: Seq[(String, Column)]): DataFrame = {
    val domain = spark.range(0, n).select((col("id") * lit(step)).as(key))
    val filled = domain.join(counts, Seq(key), "left")
    fills.foldLeft(filled) { case (df, (c, fill)) => df.withColumn(c, coalesce(col(c), fill)) }
  }
}
