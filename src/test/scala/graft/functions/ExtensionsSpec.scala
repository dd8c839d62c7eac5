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

  test("extension functions describe themselves in the catalog") {
    val desc = spark.sql("DESCRIBE FUNCTION float_dot").collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("float_dot"))
  }
}
