package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Test => SCTest, Prop}

class NumSpec extends SparkSpec {
  import spark.implicits._

  test("r6 rounds half-up at 6 decimals") {
    val got = Seq(1.0000005, 1.0000004, 2.5e-7).toDF("x")
      .select(Num.r6(col("x")).as("r")).as[Double].collect().toSeq
    assert(got === Seq(1.000001, 1.0, 0.0))
  }

  test("property: r6 is idempotent and within 5e-7 + an ulp of the input") {
    val prop = Prop.forAll(Gen.choose(-1e6, 1e6)) { x: Double =>
      val r = math.floor(x * 1e6 + 0.5) / 1e6
      val r2 = math.floor(r * 1e6 + 0.5) / 1e6
      // tolerance: half a decimal step plus the rounding error of x*1e6 itself
      r == r2 && math.abs(r - x) <= 5e-7 + math.ulp(x * 1e6) / 1e6
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: rate formula is non-negative after clipping") {
    val gen = for {
      dv <- Gen.choose(-1e6, 1e6)
      dt <- Gen.choose(1e-6, 1e6)
    } yield (dv, dt)
    val prop = Prop.forAll(gen) { case (dv, dt) =>
      math.max(0.0, dv * 60.0 / dt) >= 0.0
    }
    val res = SCTest.check(SCTest.Parameters.default, prop)
    assert(res.passed, res.status.toString)
  }
}
