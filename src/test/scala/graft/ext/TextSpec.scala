package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("tokens drops empty strings from consecutive whitespace") {
    val got = Seq("a  b\t c", "  ", "").toDF("t")
      .select(size(Text.tokens(col("t"))).as("n")).as[Int].collect().toSeq
    assert(got === Seq(3, 0, 0))
  }

  test("normalized collapses whitespace and lowercases") {
    val got = Seq("Hello   World\n\tFoo").toDF("t")
      .select(Text.normalized(col("t")).as("n")).as[String].head()
    assert(got === "hello world foo")
  }

  test("fingerprint groups identical normalized text to one canonical id") {
    val docs = Seq((1L, "Hello  World", "en", "s", 11L), (2L, "hello world", "en", "s", 11L),
      (3L, "different", "en", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.createOrReplaceTempView("t_fp_docs")
    val fp = docs.withColumn("fp", md5(Text.normalized(col("text"))))
      .select("doc_id", "fp").as[(Long, String)].collect().toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L) !== fp(3L))
  }
}
