package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("hash28 matches the engine-portable SQL hash (conv of md5 prefix)") {
    val vals = Seq("0", "42", "hello", "ünïcode")
    val sparkSide = vals.toDF("s")
      .select(conv(substring(md5(col("s")), 1, 7), 16, 10).cast("long").as("h"))
      .as[Long].collect().toSeq
    assert(sparkSide === vals.map(KmvSketch.hash28))
  }

  test("sketch is exact below K distinct values") {
    val buf = (1 to 40).map(i => s"v$i").foldLeft(KmvSketch.agg.zero)(KmvSketch.agg.reduce)
    assert(KmvSketch.agg.finish(buf) === 40.0)
  }

  test("buffer stays bounded at K and estimate lands near the truth") {
    val n = 5000
    val buf = (1 to n).map(i => s"user_$i").foldLeft(KmvSketch.agg.zero)(KmvSketch.agg.reduce)
    assert(buf.length === KmvSketch.K)
    val est = KmvSketch.agg.finish(buf)
    // KMV with k=64 has ~1/sqrt(k-1) ≈ 12.6% relative std error; 3 sigma
    assert(math.abs(est - n) / n < 0.4, s"estimate $est too far from $n")
  }

  test("merge is commutative and agrees with single-pass reduce") {
    val xs = (1 to 300).map(i => s"a$i")
    val (l, r) = xs.splitAt(120)
    val bl = l.foldLeft(KmvSketch.agg.zero)(KmvSketch.agg.reduce)
    val br = r.foldLeft(KmvSketch.agg.zero)(KmvSketch.agg.reduce)
    val single = xs.foldLeft(KmvSketch.agg.zero)(KmvSketch.agg.reduce)
    assert(KmvSketch.agg.merge(bl, br).toSeq === single.toSeq)
    assert(KmvSketch.agg.merge(br, bl).toSeq === single.toSeq)
  }

  test("null inputs are skipped, matching the oracle SQL's IS NOT NULL filter") {
    val vals: Seq[String] = Seq("a", null, "b", null, "c")
    val buf = vals.foldLeft(KmvSketch.agg.zero)(KmvSketch.agg.reduce)
    // estimateSql filters the hashed expression IS NOT NULL in its hs CTE:
    // a null row must neither count toward n_distinct_hash nor shift the
    // exact-count branch
    assert(KmvSketch.agg.finish(buf) === 3.0)
  }

  test("duplicates do not move the estimate") {
    val once = (1 to 200).map(i => s"u$i")
    val thrice = once ++ once ++ once
    val b1 = once.foldLeft(KmvSketch.agg.zero)(KmvSketch.agg.reduce)
    val b3 = thrice.foldLeft(KmvSketch.agg.zero)(KmvSketch.agg.reduce)
    assert(KmvSketch.agg.finish(b1) === KmvSketch.agg.finish(b3))
  }
}
