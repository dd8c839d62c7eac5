package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{queries => q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The registry is assembled from the per-module query lists so every
  * operator family (reference pipelines, per-operator micros, text analysis,
  * dedup, similarity search) contributes its queries and oracles in one
  * place.
  */
object SparkEntry {
  private val registry: Seq[Q] =
    q.Micro.all ++ q.Reference.all ++ q.Sessions.all ++ q.Relational.all ++ q.Sketches.all ++
      ext.Text.all ++ ext.Dedup.all ++ ext.Similarity.all ++
      multimodal.Multimodal.all

  /** Flagship query (Script C city-league analog); driver smoke-checks
    * rows>0 on /root/testdata/sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    q.Reference.c1CityLeague(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
