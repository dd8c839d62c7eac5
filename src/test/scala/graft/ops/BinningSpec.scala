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

  test("property: every in-range value lands in exactly one right-closed bin (count preservation)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val width = 5.0
    val max = 100.0
    val prop = Prop.forAll(Gen.listOfN(50, Gen.choose(-20.0, 120.0))) { xs =>
      val df = xs.toDF("x").select(Binning.cutRightClosed(col("x"), width, max).as("bin"))
      val binned = df.filter(col("bin").isNotNull).count()
      val inRange = xs.count(x => x >= 0.0 && x <= max)
      // total-count preservation: binned row count == in-range input count,
      // and every non-null bin is a legal center
      val centers = df.filter(col("bin").isNotNull).distinct()
        .collect().map(_.getDouble(0))
      binned == inRange &&
        centers.forall(c => (c - width / 2) % width == 0.0 && c > 0 && c < max)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("zeroFillDomain left-joins the full domain and fills missing with 0") {
    val counts = Seq((10L, 7L)).toDF("k", "n")
    val filled = Binning.zeroFillDomain(spark, 3, 10, "k", counts, Seq("n" -> lit(0L)))
      .orderBy("k").as[(Long, Long)].collect().toSeq
    assert(filled === Seq((0L, 0L), (10L, 7L), (20L, 0L)))
  }
}
