package graft

/** Contract tests for the driver registry: every query runs, every oracle
  * key resolves, names are unique, and the flagship entry returns rows. */
class RegistrySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("flagship entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query executes and returns a non-degenerate schema at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        assert(df.schema.fields.nonEmpty)
        df.count() // execute the whole plan
        None
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(200)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
