package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The library integration path: a session built with [[GraftExtensions]]
  * resolves the engine's native functions in plain SQL with no imperative
  * register() call. On a cluster the same class is wired via
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` — a static
  * conf read at SparkContext start, so the in-JVM test (which shares the
  * suite-wide context) uses the programmatic equivalent
  * `Builder.withExtensions(new GraftExtensions)`. */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    graft.SparkSpec.session // ensure the shared context exists first
    SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions().apply(_))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .create()
  }

  test("float_dot resolves through spark.sql.extensions") {
    val got = spark.sql(
      "SELECT float_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(2.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .head().getDouble(0)
    assert(got === 11.0)
  }

  test("sorted_intersect_count resolves through spark.sql.extensions") {
    val got = spark.sql(
      "SELECT sorted_intersect_count(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS n")
      .head()
    assert(got.getLong(0) === 2L)
  }

  test("optimizer rewrites the declarative dot fold to native float_dot") {
    import org.apache.spark.sql.functions.col
    // parquet-backed input: a literal frame would constant-fold to a
    // LocalRelation before the plan can be inspected
    val df = graft.ops.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(graft.ext.Similarity.dot(col("embedding"), col("embedding")).as("d"))
    assert(df.queryExecution.optimizedPlan.toString.contains("float_dot"),
      df.queryExecution.optimizedPlan.toString)
    // and the rewritten plan computes the identical values
    val viaRule = df.collect().map(_.getDouble(0))
    val viaFold = graft.ops.Tables.embeddings(graft.SparkSpec.session, "/root/testdata/sf0.001")
      .select(graft.ext.Similarity.dot(col("embedding"), col("embedding")).as("d"))
      .collect().map(_.getDouble(0))
    assert(viaRule.toSeq === viaFold.toSeq)
  }

  test("optimizer rewrites the declarative squared-L2 fold to native double_l2sq") {
    import org.apache.spark.sql.functions.{col, transform}
    // parquet-backed double arrays, like pqSub builds them
    def sub(s: SparkSession) =
      graft.ops.Tables.embeddings(s, "/root/testdata/sf0.001")
        .select(transform(col("embedding"), x => x.cast("double")).as("v"))
        .select(graft.ext.Similarity.l2sq(col("v"), col("v")).as("d"))
    val df = sub(spark)
    assert(df.queryExecution.optimizedPlan.toString.contains("double_l2sq"),
      df.queryExecution.optimizedPlan.toString)
    // the rewritten plan computes the identical values to the interpreted
    // fold (the shared SparkSpec session has no extensions, so no rewrite)
    assert(df.collect().map(_.getDouble(0)).toSeq ===
      sub(graft.SparkSpec.session).collect().map(_.getDouble(0)).toSeq)
  }

  test("double_l2sq preserves NULL semantics on ragged and null-element arrays") {
    import org.apache.spark.sql.functions.col
    val mk = (s: SparkSession) => {
      import s.implicits._
      Seq((Array(1.0, 2.0), Array(3.0))).toDF("a", "b")
        .select(graft.ext.Similarity.l2sq(col("a"), col("b")).as("d"))
    }
    assert(mk(spark).head().isNullAt(0), "rewritten path must null-out")
    assert(mk(graft.SparkSpec.session).head().isNullAt(0), "interpreted path nulls out")
  }

  test("the rewrite preserves NULL semantics on ragged arrays") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val mk = (s: SparkSession) => {
      import s.implicits._
      Seq((Array(1.0f, 2.0f), Array(3.0f))).toDF("a", "b")
        .select(graft.ext.Similarity.dot(col("a"), col("b")).as("d"))
    }
    assert(mk(spark).head().isNullAt(0), "rewritten path must null-out")
    assert(mk(graft.SparkSpec.session).head().isNullAt(0), "interpreted path nulls out")
  }

  test("extension functions describe themselves in the catalog") {
    val desc = spark.sql("DESCRIBE FUNCTION float_dot").collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("float_dot"))
  }

  test("graft_cms_estimate never undercounts and resolves through the extension") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // known multiplicities: "a"×100, "b"×10, "c"×1
    val items = (Seq.fill(100)("a") ++ Seq.fill(10)("b") ++ Seq("c")).toDF("v")
    val cms = items.stat.countMinSketch(col("v"), 0.001, 0.99, 42)
    val bos = new java.io.ByteArrayOutputStream()
    cms.writeTo(bos)
    val est = Seq("a", "b", "c", "never-seen").toDF("v")
      .select(col("v"), call_function("graft_cms_estimate", lit(bos.toByteArray), col("v")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the CMS contract: estimate ≥ true count, always
    assert(est("a") >= 100L && est("b") >= 10L && est("c") >= 1L)
    assert(est("never-seen") >= 0L)
    // null value stays null through the codegen path
    assert(Seq(Option.empty[String]).toDF("v")
      .select(call_function("graft_cms_estimate", lit(bos.toByteArray), col("v")).as("e"))
      .head().isNullAt(0))
  }

  test("graft_bloom_agg + graft_bloom_might_contain round-trip through plain SQL") {
    val hits = spark.sql(
      """WITH built AS (
        |  SELECT graft_bloom_agg(xxhash64(id), 1000L, 8000L) AS bf
        |  FROM range(0, 100)
        |)
        |SELECT sum(CASE WHEN graft_bloom_might_contain((SELECT bf FROM built), xxhash64(id))
        |                THEN 1 ELSE 0 END) AS present
        |FROM range(0, 100)""".stripMargin).head().getLong(0)
    // a bloom filter has no false negatives: every inserted key must probe true
    assert(hits === 100L)
  }
}
