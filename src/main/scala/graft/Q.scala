package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: the Spark plan builder plus (when the
  * semantics are ANSI-SQL-expressible) the equivalent DuckDB oracle SQL the
  * driver hash-compares against. `oracle = None` → rows-only check. */
case class Q(name: String, fn: (SparkSession, String) => DataFrame, oracle: Option[String])

object Q {
  def apply(name: String, fn: (SparkSession, String) => DataFrame, sql: String): Q =
    Q(name, fn, Some(sql))
}
