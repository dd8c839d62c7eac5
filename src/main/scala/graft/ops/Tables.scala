package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table readers (driver testdata layout, TESTDATA.md).
  *
  * Reference analog: the SQLite scans at analyse.py:12-15, 156-165, 367-376.
  * The reference manually prunes columns in its SQL (SURVEY §2.1 S2/S3);
  * here Catalyst column pruning + parquet predicate pushdown do that
  * automatically from the lazy plan, so every reader is a full-table
  * declaration and the physical scan reads only what the query needs.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def events(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "events")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
