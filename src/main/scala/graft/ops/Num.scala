package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric conventions shared by every query and its DuckDB oracle.
  *
  * The driver's correctness gate hash-compares Spark parquet output against a
  * DuckDB run of the oracle SQL. Aggregates over doubles (avg/sum) are
  * summation-order-dependent, so the two engines can differ in the last ulp.
  * Every post-aggregation double output is therefore rounded to 6 decimals —
  * and NOT with `round()`: Spark rounds via exact BigDecimal HALF_UP while
  * DuckDB rounds in binary double arithmetic, which can disagree at ties.
  * Instead both sides use the identical IEEE expression
  * `floor(x * 1e6 + 0.5) / 1e6`, which is bit-deterministic given equal x.
  */
object Num {
  /** Round half-up to 6 decimals, expression-identical to [[r6Sql]]. */
  def r6(c: Column): Column = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)

  /** 9-decimal variant used only as a ranking key (so ulp noise can't flip
    * an ORDER BY between engines); ties are then broken by an id column. */
  def r9(c: Column): Column = floor(c * lit(1000000000.0) + lit(0.5)) / lit(1000000000.0)

  /** Driver-side twin of [[r6]] for specs that recompute expectations. */
  def r6Double(x: Double): Double = math.floor(x * 1000000.0 + 0.5) / 1000000.0

  def r6Sql(e: String): String = s"floor(($e) * 1000000.0 + 0.5) / 1000000.0"
  def r9Sql(e: String): String = s"floor(($e) * 1000000000.0 + 0.5) / 1000000000.0"

  /** Exact fixed-point integerization for money sums: floor(x·scale + 0.5)
    * as BIGINT. Summing these is order-INDEPENDENT, unlike raw double sums
    * whose partial-aggregate ordering noise can cross the r6 boundary —
    * use for every monetary aggregate, expression-identical to [[centsSql]]. */
  def cents(c: Column, scale: Double = 100.0): Column =
    floor(c * lit(scale) + lit(0.5)).cast("long")

  def centsSql(e: String, scale: Double = 100.0): String =
    s"CAST(floor(($e) * $scale + 0.5) AS BIGINT)"
}
