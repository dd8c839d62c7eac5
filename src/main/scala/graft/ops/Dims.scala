package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Profile-style dimension derivations (FIXTURES.md role mapping:
  * customer ⋈ nation plays `profiles`; c_mktsegment plays the URL-derived
  * category; c_acctbal plays the age column; n_name plays city).
  */
object Dims {
  /** Case-insensitive substring categorization (X1/X2, analyse.py:49-57):
    * nested contains with NULL→false, first match wins, fallback "other". */
  def withCategory(customer: DataFrame): DataFrame =
    customer.withColumn("category",
      when(coalesce(lower(col("c_mktsegment")).contains("furniture"), lit(false)), lit("furniture"))
        .when(coalesce(lower(col("c_mktsegment")).contains("machinery"), lit(false)), lit("machinery"))
        .otherwise(lit("other")))

  val categorySql: String =
    """CASE WHEN coalesce(contains(lower(c_mktsegment), 'furniture'), false) THEN 'furniture'
      |     WHEN coalesce(contains(lower(c_mktsegment), 'machinery'), false) THEN 'machinery'
      |     ELSE 'other' END""".stripMargin

  /** Age-group bucketing (X3, the `assign_age_group` UDF at analyse.py:34-44)
    * as a when-chain with NO otherwise — out-of-range (negative balance,
    * the "<18" analog) yields NULL, matching the UDF's `return None`. */
  def withAgeGroup(customer: DataFrame): DataFrame =
    customer.withColumn("age_group",
      when(col("c_acctbal") >= lit(0.0) && col("c_acctbal") < lit(2500.0), lit("low"))
        .when(col("c_acctbal") >= lit(2500.0) && col("c_acctbal") < lit(7500.0), lit("mid"))
        .when(col("c_acctbal") >= lit(7500.0), lit("high")))

  val ageGroupSql: String =
    """CASE WHEN c_acctbal >= 0.0 AND c_acctbal < 2500.0 THEN 'low'
      |     WHEN c_acctbal >= 2500.0 AND c_acctbal < 7500.0 THEN 'mid'
      |     WHEN c_acctbal >= 7500.0 THEN 'high' END""".stripMargin

  /** City cleaning (P13/P14, analyse.py:390-392): trim + ''→NULL. */
  def cleanCity(c: Column): Column = nullif(trim(c), lit(""))
  def cleanCitySql(c: String): String = s"nullif(trim($c), '')"
}
