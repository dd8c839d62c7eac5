package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink formats beyond the Parquet testdata. The reference's only
  * source is a SQLite full scan (analyse.py:12-15); a standalone engine
  * needs the standard lake formats with explicit schemas (never inference —
  * schema inference re-reads the data and produces drifting types).
  *
  * All readers take an explicit schema and return a plain DataFrame so the
  * whole query library composes over any of them unchanged. Writers default
  * to snappy parquet; CSV/JSON writers exist for interchange, not as the
  * scale path (row formats lose pushdown and columnar pruning — at 100 TB
  * everything lands in parquet/ORC with partitioning).
  */
object Formats {
  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("sep", delimiter)
      // coerce-to-null on malformed cells, mirroring the engine-wide
      // errors='coerce' convention (SURVEY §7.4 hard-part 8)
      .option("mode", "PERMISSIVE")
      .csv(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** JDBC source — the one source the reference actually uses (its whole
    * pipeline starts from a database full scan). `table` is a table name or
    * a "(subquery) alias" pushed to the database.
    *
    * Scale: pass `partitionColumn` + bounds + `numPartitions` so N tasks
    * each pull one range slice in parallel — without them a database read
    * is a single task no matter how large the cluster, which is the first
    * bottleneck every JDBC ingest hits. Filters and column pruning push
    * into the database query (FormatsSpec asserts PushedFilters), so the
    * lake-side plan starts from the smallest possible transfer. */
  def readJdbc(spark: SparkSession, url: String, table: String,
               driver: String = null,
               partitionColumn: String = null,
               lowerBound: Long = 0L, upperBound: Long = 0L,
               numPartitions: Int = 1): DataFrame = {
    var r = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if (driver != null) r = r.option("driver", driver)
    if (partitionColumn != null)
      r = r.option("partitionColumn", partitionColumn)
        .option("lowerBound", lowerBound)
        .option("upperBound", upperBound)
        .option("numPartitions", numPartitions)
    r.load()
  }

  /** JDBC sink (overwrite). Interchange-grade like the CSV/JSON writers:
    * row-at-a-time inserts don't scale — at 100 TB results land in parquet
    * and only small summaries go back to a database. */
  def writeJdbc(df: DataFrame, url: String, table: String,
                driver: String = null): Unit = {
    var w = df.write.mode("overwrite").format("jdbc")
      .option("url", url).option("dbtable", table)
    if (driver != null) w = w.option("driver", driver)
    w.save()
  }

  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Bucketed catalog table: rows are hash-distributed into `nBuckets`
    * files per partition by `bucketCols` and each bucket sorted. Two tables
    * bucketed the same way join WITHOUT a shuffle — the exchange that
    * dominates large fact-fact joins at 100 TB disappears because the data
    * is already co-located on the join key at write time. Requires the
    * catalog (`saveAsTable`), since bucket metadata lives there. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Partitioned AND bucketed catalog table — the publish layout for a
    * table with one coarse filter column and one hot join key: directory-
    * level partition pruning on `partCol` (a consumer filtering one
    * partition never lists the others) plus shuffle-free `bucketCols`
    * joins within each partition. The composed training manifest is the
    * canonical case: partition by split (a trainer reads train/, an eval
    * harness val/), bucket+sort by doc_id (every consumer rejoin). */
  def writePartitionedBucketed(df: DataFrame, table: String, partCol: String,
                               bucketCols: Seq[String], nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .partitionBy(partCol)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Range-clustered parquet: rows are range-partitioned into `nFiles` by
    * `clusterCols` and sorted within each file, so every file (and every
    * row group inside it) covers a narrow key range. Selective scans then
    * skip whole files/row groups on parquet min/max statistics — the
    * layout lever for time-range queries at 100 TB, where an unclustered
    * table forces a full scan that clustering turns into a near-point
    * read (FormatsSpec measures the skip). */
  def writeClustered(df: DataFrame, path: String, clusterCols: Seq[String],
                     nFiles: Int): Unit = {
    import org.apache.spark.sql.functions.col
    val cols = clusterCols.map(col)
    df.repartitionByRange(nFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Z-order (Morton-interleaved) multi-column clustering — the layout for
    * tables queried selectively on SEVERAL columns. Each cluster column is
    * min/max-normalized to a `bitsPerCol`-bit integer (one tiny distributed
    * bounds aggregation up front — the same stats pass production
    * OPTIMIZE-ZORDER jobs run), the bit planes are interleaved into one
    * z-value, and rows are range-partitioned and sorted by it. Every file
    * then covers a small hyper-rectangle of the key space, so parquet
    * min/max statistics skip files/row groups for selective predicates on
    * ANY clustered column — [[writeClustered]]'s lexicographic sort only
    * skips on its leading column. Numeric columns; NULLs sort to bucket 0.
    * The z-value math is plain codegen'd shifts/ors, so the write costs one
    * extra projection over the range shuffle it needs anyway. */
  def writeZOrdered(df: DataFrame, path: String, clusterCols: Seq[String],
                    nFiles: Int, bitsPerCol: Int = 8): Unit = {
    import org.apache.spark.sql.functions._
    val n = clusterCols.size
    require(n >= 1 && bitsPerCol >= 1 && n * bitsPerCol <= 62,
      s"${n} cols x $bitsPerCol bits exceed a signed 64-bit z-value")
    val boundExprs = clusterCols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"mn_$c"), max(col(c).cast("double")).as(s"mx_$c")))
    val row = df.agg(boundExprs.head, boundExprs.tail: _*).head()
    val maxBucket = (1L << bitsPerCol) - 1
    val scaled = clusterCols.zipWithIndex.map { case (c, i) =>
      // all-NULL column or empty frame → null bounds → constant bucket 0
      val mn = if (row.isNullAt(2 * i)) 0.0 else row.getDouble(2 * i)
      val mx = if (row.isNullAt(2 * i + 1)) 0.0 else row.getDouble(2 * i + 1)
      val span = if (mx > mn) mx - mn else 1.0
      // greatest/least also route NULLs to bucket 0 (greatest skips nulls)
      least(lit(maxBucket), greatest(lit(0L),
        ((col(c).cast("double") - lit(mn)) / lit(span) * lit(maxBucket.toDouble)).cast("long")))
    }
    val z = (0 until bitsPerCol).flatMap(b => scaled.zipWithIndex.map { case (sc, i) =>
      shiftleft(shiftright(sc, b).bitwiseAND(lit(1L)), b * n + i) // disjoint bits: + == OR
    }).reduce(_ + _)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
}
