package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("dot and norm compute exact double folds over float arrays") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val (d, n) = df.select(
      Similarity.dot(col("a"), col("b")).as("d"),
      Similarity.norm(col("a")).as("n")).as[(Double, Double)].head()
    assert(d === 32.0)
    assert(n === math.sqrt(14.0))
  }

  test("signBucket encodes the sign pattern of the leading dims") {
    val df = Seq(
      Array(1.0f, -1.0f, 1.0f, -1.0f, 9.0f),
      Array(-1.0f, -1.0f, -1.0f, -1.0f, 9.0f)).toDF("embedding")
    val got = df.select(Similarity.signBucket(col("embedding")).as("b")).as[Long].collect().toSeq
    assert(got === Seq(1L + 4L, 0L))
  }

  test("cosine of identical vectors is 1") {
    val df = Seq((Array(0.5f, -0.25f, 8.0f), Array(0.5f, -0.25f, 8.0f))).toDF("a", "b")
    val cos = df.select(
      (Similarity.dot(col("a"), col("b")) /
        (Similarity.norm(col("a")) * Similarity.norm(col("b")))).as("c")).as[Double].head()
    assert(math.abs(cos - 1.0) < 1e-12)
  }
}
