package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** pd.cut boundary semantics (SURVEY §7.4 hard-part 1) and the zero-fill
  * domain join (J5/J6). */
class BinningSpec extends SparkSpec {
  import spark.implicits._

  private def binOf(xs: Double*): Seq[Option[Double]] =
    xs.toDF("x")
      .select(Binning.cutRightClosed(col("x"), 5.0, 1440.0).as("b"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq

  test("right-closed bins: (lo, hi] with [0, w] first bin (include_lowest)") {
    // x=0 and x=5 both land in the first bin (center 2.5); x=5.1 in the second
    assert(binOf(0.0, 5.0, 5.1, 10.0, 10.5) ===
      Seq(Some(2.5), Some(2.5), Some(7.5), Some(7.5), Some(12.5)))
  }

  test("right-closed bins: out-of-range goes to NULL (pandas NaN-key drop)") {
    assert(binOf(-0.001, 1440.0, 1440.1) === Seq(None, Some(1437.5), None))
  }

  test("floorBin is left-closed [lo, hi) over integers") {
    val got = Seq(0L, 9L, 10L, 1439L).toDF("m")
      .select(Binning.floorBin(col("m"), 10).as("b")).as[Long].collect().toSeq
    assert(got === Seq(0L, 0L, 10L, 1430L))
  }

  test("hhmm label formats minute-of-day") {
    val got = Seq(0L, 61L, 1430L).toDF("m")
      .select(Binning.hhmmLabel(col("m")).as("l")).as[String].collect().toSeq
    assert(got === Seq("00:00", "01:01", "23:50"))
  }

  test("zeroFillDomain left-joins the full domain and fills missing with 0") {
    val counts = Seq((10L, 7L)).toDF("k", "n")
    val filled = Binning.zeroFillDomain(spark, 3, 10, "k", counts, Seq("n" -> lit(0L)))
      .orderBy("k").as[(Long, Long)].collect().toSeq
    assert(filled === Seq((0L, 0L), (10L, 7L), (20L, 0L)))
  }
}
