package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Categorization/bucketing semantics (X1-X3): null-safe contains,
  * no-otherwise when-chain → NULL, trim + ''→NULL city cleaning. */
class DimsSpec extends SparkSpec {
  import spark.implicits._

  test("category: case-insensitive contains, NULL segment → other") {
    val df = Seq(Some("FURNITURE"), Some("machinery plus"), Some("household"), None)
      .toDF("c_mktsegment")
    val got = Dims.withCategory(df).select("category").as[String].collect().toSeq
    assert(got === Seq("furniture", "machinery", "other", "other"))
  }

  test("age group: out-of-range balance yields NULL (UDF's return None)") {
    val df = Seq(-1.0, 0.0, 2499.99, 2500.0, 7499.99, 7500.0).toDF("c_acctbal")
    val got = Dims.withAgeGroup(df).select("age_group").collect()
      .map(r => Option(r.getString(0))).toSeq
    assert(got === Seq(None, Some("low"), Some("low"), Some("mid"), Some("mid"), Some("high")))
  }

  test("city cleaning trims and converts empty to NULL") {
    val df = Seq("  Berlin ", "", "   ", "Paris").toDF("c")
    val got = df.select(Dims.cleanCity(col("c")).as("city")).collect()
      .map(r => Option(r.getString(0))).toSeq
    assert(got === Seq(Some("Berlin"), None, None, Some("Paris")))
  }
}
