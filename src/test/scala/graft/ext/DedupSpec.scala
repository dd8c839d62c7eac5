package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("shingles3: short docs yield empty array, no descending sequence") {
    val got = Seq("one two", "one two three four").toDF("t")
      .select(size(Dedup.shingles3(Text.tokens(col("t")))).as("n")).as[Int].collect().toSeq
    assert(got === Seq(0, 2)) // "one two three", "two three four"
  }

  test("shingles3 deduplicates repeated shingles") {
    val got = Seq("a b c a b c a b c").toDF("t")
      .select(size(Dedup.shingles3(Text.tokens(col("t")))).as("n")).as[Int].head()
    assert(got === 3) // "a b c", "b c a", "c a b"
  }

  test("baseHash is stable and within 28 bits") {
    val got = Seq("hello", "hello", "world").toDF("s")
      .select(Dedup.baseHash(col("s")).as("h")).as[Long].collect().toSeq
    assert(got(0) === got(1))
    assert(got(0) !== got(2))
    assert(got.forall(h => h >= 0 && h < (1L << 28)))
  }

  test("sorted_intersect_count equals size(array_intersect) on sorted distinct arrays") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(
      (Array(1L, 3L, 5L, 9L), Array(2L, 3L, 9L, 11L)),
      (Array.empty[Long], Array(1L, 2L)),
      (Array(4L), Array(4L)),
      (Array(1L, 2L, 3L), Array(7L, 8L))).toDF("a", "b")
    val mism = df.filter(
      call_function("sorted_intersect_count", col("a"), col("b"))
        =!= size(array_intersect(col("a"), col("b"))).cast("long"))
    assert(mism.count() === 0)
  }

  test("LSH banding knob: narrower aligned bands strictly widen the candidate set") {
    // band j of the 8-band config is half of band j/2 of the 4-band config:
    // a 4-row band signature can only match when both aligned 2-row halves
    // match, so candidates(4 bands of 4) ⊆ candidates(8 bands of 2) — the
    // recall direction of the LSH S-curve a production job tunes with
    val docs = graft.ops.Tables.documents(spark, "/root/testdata/sf0.001")
    def pairs(bands: Int) =
      Dedup.minhashLshOn(docs, numHashes = 16, numBands = bands)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val coarse = pairs(4)
    val fine = pairs(8)
    spark.catalog.clearCache() // the knobbed variants persist() internally
    assert(coarse.subsetOf(fine),
      s"pairs lost when bands narrowed: ${(coarse -- fine).take(5)}")
    assert(fine.size > coarse.size, "narrower bands added no candidates (degenerate corpus)")
  }

  test("minhash universal-hash constants stay positive under the prime") {
    assert(Dedup.hashA.forall(a => a > 0 && a < Dedup.P))
    assert(Dedup.hashB.forall(b => b >= 0 && b < Dedup.P))
    // (a*h+b) with h < 2^28 must not overflow Long
    val maxH = (1L << 28) - 1
    assert(Dedup.hashA.forall(a => a <= Long.MaxValue / maxH))
  }
}
