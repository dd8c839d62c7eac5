package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Centered rolling mean = pandas rolling(center=True, min_periods=1),
  * over present rows (neighbors-by-position — hard-part 5). */
class SmoothingSpec extends SparkSpec {
  import spark.implicits._

  test("centered rolling-3 shrinks at the edges (min_periods=1)") {
    val df = Seq((1L, 3.0), (2L, 6.0), (3L, 9.0), (4L, 12.0)).toDF("k", "v")
    val w = Window.orderBy("k")
    val got = df.withColumn("s", Smoothing.centeredMean(col("v"), w, 1))
      .orderBy("k").select("s").as[Double].collect().toSeq
    assert(got === Seq((3.0 + 6.0) / 2, (3.0 + 6.0 + 9.0) / 3, (6.0 + 9.0 + 12.0) / 3, (9.0 + 12.0) / 2))
  }

  test("rolling mean ignores absent rows, not time gaps (rows not range)") {
    // keys 1, 2, 10 — position neighbors, despite the time gap
    val df = Seq((1L, 1.0), (2L, 2.0), (10L, 30.0)).toDF("k", "v")
    val w = Window.orderBy("k")
    val got = df.withColumn("s", Smoothing.centeredMean(col("v"), w, 1))
      .orderBy("k").select("s").as[Double].collect().toSeq
    assert(got === Seq(1.5, 11.0, 16.0))
  }

  test("property: smoothed value is bounded by the window's min and max") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.apache.spark.sql.expressions.Window
    val prop = Prop.forAll(Gen.listOfN(12, Gen.choose(-100.0, 100.0))) { ys =>
      val df = ys.zipWithIndex.map { case (y, i) => (i.toLong, y) }.toDF("k", "y")
      val w = Window.orderBy("k")
      val rows = df.select(col("k"), col("y"),
          Smoothing.centeredMean(col("y"), w, 2).as("sm"))
        .collect().map(r => (r.getLong(0).toInt, r.getDouble(1), r.getDouble(2)))
      rows.forall { case (i, _, sm) =>
        val window = ys.slice(math.max(0, i - 2), math.min(ys.length, i + 3))
        sm >= window.min - 1e-9 && sm <= window.max + 1e-9
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("window-5 center value equals plain mean when fully inside") {
    val df = (1 to 9).map(i => (i.toLong, i.toDouble)).toDF("k", "v")
    val w = Window.orderBy("k")
    val got = df.withColumn("s", Smoothing.centeredMean(col("v"), w, 2))
      .orderBy("k").select("s").as[Double].collect()
    assert(got(4) === 5.0) // mean(3,4,5,6,7)
  }
}
