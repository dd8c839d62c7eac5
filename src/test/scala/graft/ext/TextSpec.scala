package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("PII scrub redacts every seeded match and each doc seeds exactly one class") {
    val docs = graft.ops.Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = Text.piiScrubOn(docs)
      .as[(Long, Long, Long, Long, Long, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (docId, nEmails, nPhones, nIps, _, _) =>
      val expected = (docId % 3) match {
        case 0 => (1L, 0L, 0L); case 1 => (0L, 1L, 0L); case _ => (0L, 0L, 1L)
      }
      // >= : the raw text could in principle contain a match of its own;
      // the seeded class must be counted at least once
      assert(nEmails >= expected._1 && nPhones >= expected._2 && nIps >= expected._3,
        s"doc $docId seeded class missing: ($nEmails,$nPhones,$nIps)")
    }
    // completeness + idempotence: nothing PII-shaped survives a scrub, so
    // scrubbing the scrubbed text is the identity
    val clean = Text.piiSeeded(docs)
      .withColumn("clean", Text.piiClean(col("seeded_text")))
    val survivors = clean.filter(
      regexp_count(col("clean"), lit(Text.EmailRe)) > 0 ||
        regexp_count(col("clean"), lit(Text.PhoneRe)) > 0 ||
        regexp_count(col("clean"), lit(Text.IpRe)) > 0).count()
    assert(survivors === 0, s"$survivors docs still contain PII-shaped text after scrub")
  }

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

  test("winnow fingerprints: shifted text shares most fingerprints") {
    // winnowing selects window-minima, which are position-independent for
    // shared regions — a shifted copy must overlap heavily in fingerprints
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val shifted = "prefix words added here " + base
    val df = Seq((1L, base, "en", "s", 0L), (2L, shifted, "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    df.createOrReplaceTempView("winnow_docs")
    val toks = Text.tokens(col("text"))
    val th = transform(toks, t => Dedup.baseHash(t))
    val wh = transform(sequence(lit(0), size(toks) - lit(4)),
      i => (1 until 4).foldLeft(element_at(th, i + 1)) { (acc, k) =>
        (acc * lit(1000003L) + element_at(th, i + k + 1)) % lit(2147483647L) })
    val fps = df.withColumn("wh", wh)
      .withColumn("fps", array_distinct(transform(sequence(lit(0), size(col("wh")) - lit(5)),
        i => array_min(slice(col("wh"), i + 1, lit(5))))))
      .select("doc_id", "fps").as[(Long, Seq[Long])].collect().toMap
    val shared = fps(1L).toSet.intersect(fps(2L).toSet).size
    assert(shared >= (fps(1L).size * 2) / 3, s"only $shared of ${fps(1L).size} shared")
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
