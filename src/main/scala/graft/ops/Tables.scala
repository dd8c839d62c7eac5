package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table readers (driver testdata layout, TESTDATA.md).
  *
  * Reference analog: the SQLite scans at analyse.py:12-15, 156-165, 367-376.
  * The reference manually prunes columns in its SQL (SURVEY §2.1 S2/S3);
  * here Catalyst column pruning + parquet predicate pushdown do that
  * automatically from the lazy plan, so every reader is a full-table
  * declaration and the physical scan reads only what the query needs.
  *
  * SESSION CONTRACT — the library assumes `spark.sql.ansi.enabled=false`
  * (SURVEY §7.4 hard-part 8): the reference's `errors='coerce'` pandas and
  * the DuckDB oracle both return NULL for x/0, overflow, and bad casts,
  * where Spark 4's default ANSI mode throws. Set it ON THE SESSION BUILDER
  * (as `Verify`/`Bench`/`SparkSpec` do; `SparkEntry.entry`/`queries` pin it
  * as library entry points); readers deliberately do NOT mutate error
  * semantics on the caller's session. ONE exception, by necessity:
  * [[events]] must set the read-path conf
  * `spark.sql.legacy.parquet.nanosAsLong` or the TIMESTAMP(NANOS) file
  * cannot be read at all — that conf changes how nanos-typed parquet
  * surfaces in this session's later reads (raw longs), which is exactly
  * the handling [[events]] itself implements.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts has shipped as three different parquet physical types across
    * testdata generations; normalize all of them to a micros TimestampType:
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it outright, so
    *    the legacy nanosAsLong conf (set here, before the read) surfaces it
    *    as raw long nanos → truncate to micros, the same truncation DuckDB
    *    applies when it reads the file as TIMESTAMP.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads TIMESTAMP_NTZ;
    *    cast to TimestampType. The session is pinned to UTC (Verify/Bench/
    *    SparkEntry wrappers), so the naive wall-clock maps to the identical
    *    epoch micros DuckDB's epoch_us sees.
    *  - TIMESTAMP(MICROS, adjusted): already TimestampType, pass through. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _                => raw
    }
  }
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  /** documents/embeddings feed CPU-heavy per-row work (shingling, hashing,
    * dot products). The testdata parquet is a single row group — Spark
    * cannot split it, so without help the whole pipeline's first stage runs
    * on ONE core. A round-robin repartition costs one pass over a sub-MB
    * file and parallelizes everything downstream. On a real multi-file
    * 100 TB corpus the scan is already parallel, and an unconditional
    * repartition would glue a full-corpus round-robin shuffle to every
    * scan — so it is GATED: only applied when the scan yields fewer
    * partitions than cores (single-file testdata), a pure pass-through on
    * any input that already parallelizes. */
  /** The widen decision (scan splits < cores?) needs one physical planning
    * pass (file listing) to answer — memoized per (dir content, table,
    * cores, file-split confs) so the dozens of reader calls a bench/verify
    * run makes don't each replan the scan just to re-derive the same
    * boolean, while a session with different split confs (which change the
    * partition count the same files yield) derives its own. */
  private val widenCache = new FrozenCaches.Memo[(String, Int, String, String), Boolean](label = "scan_widen")

  private def widened(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = table(spark, dir, name)
    val cores = spark.sparkContext.defaultParallelism
    val splitConfs = (
      spark.conf.getOption("spark.sql.files.maxPartitionBytes").getOrElse(""),
      spark.conf.getOption("spark.sql.files.openCostInBytes").getOrElse(""))
    val widen = widenCache.get(dir, (name, cores, splitConfs._1, splitConfs._2))(
      df.rdd.getNumPartitions < cores)
    if (widen) df.repartition(cores) else df
  }
  def documents(spark: SparkSession, dir: String): DataFrame =
    widened(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    widened(spark, dir, "embeddings")
}
