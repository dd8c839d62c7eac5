package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Round-trip every interchange format against the parquet ground truth. */
class FormatsSpec extends SparkSpec {

  private val src = "/root/testdata/sf0.001"
  private lazy val tmp = Files.createTempDirectory("graft_formats").toString

  private def ordersSorted = graft.ops.Tables.orders(spark, src).orderBy("o_orderkey")

  test("csv round-trip preserves rows and values under an explicit schema") {
    val orig = ordersSorted
    Formats.writeCsv(orig, s"$tmp/orders_csv")
    val back = Formats.readCsv(spark, s"$tmp/orders_csv", orig.schema).orderBy("o_orderkey")
    assert(back.count() === orig.count())
    assert(back.collect().toSeq === orig.collect().toSeq)
  }

  test("jsonl round-trip preserves rows and values") {
    val orig = ordersSorted
    Formats.writeJsonl(orig, s"$tmp/orders_json")
    val back = Formats.readJsonl(spark, s"$tmp/orders_json", orig.schema).orderBy("o_orderkey")
    assert(back.collect().toSeq === orig.collect().toSeq)
  }

  test("jdbc round-trip through embedded Derby: partitioned parallel read + filter pushdown") {
    import spark.implicits._
    // keep Derby's derby.log out of the repo working dir
    System.setProperty("derby.system.home", tmp)
    val url = s"jdbc:derby:$tmp/jdbc_db;create=true"
    val orig = spark.range(0, 100)
      .select(col("id"), (col("id") % 7).as("grp"),
        concat(lit("name_"), col("id")).as("name"))
    Formats.writeJdbc(orig, url, "people")
    // plain read: whole table through one connection
    val back = Formats.readJdbc(spark, url, "people")
    assert(back.count() === 100)
    // partitioned read: 4 range slices pulled by 4 parallel tasks — the
    // scale path for database ingest — with identical contents
    val par = Formats.readJdbc(spark, url, "people",
      partitionColumn = "id", lowerBound = 0L, upperBound = 100L, numPartitions = 4)
    assert(par.rdd.getNumPartitions === 4)
    assert(par.select("id").as[Long].collect().toSet === (0L until 100L).toSet)
    // predicates reach the database instead of filtering after transfer
    val filtered = par.filter(col("id") > 90)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan"), plan)
    assert(filtered.count() === 9)
    // subquery pushdown: the database computes the aggregate, Spark reads 7 rows
    // (Spark's JDBC writer quotes column names, so Derby holds them
    // case-sensitive lowercase — quote them in database-side SQL)
    val agg = Formats.readJdbc(spark, url,
      """(SELECT "grp", count(*) AS n FROM people GROUP BY "grp") t""")
    assert(agg.count() === 7)
    assert(agg.agg(sum("n")).head().getLong(0) === 100L)
  }

  test("jdbc round-trip through sqlite — the reference's actual source (cancels where the driver is absent)") {
    // The reference's whole pipeline starts from a SQLite file
    // (analyse.py:12-15: sqlite3.connect + read_sql_query). sqlite-jdbc is
    // not on this build box and cannot resolve (zero-egress environment,
    // offline coursier cache — recorded in BASELINE.md round 7), so the
    // case cancels via assume() here and runs wherever the driver jar is
    // present (any networked build: add org.xerial:sqlite-jdbc to Test).
    assume(scala.util.Try(Class.forName("org.sqlite.JDBC")).isSuccess,
      "sqlite-jdbc not on the classpath")
    import org.apache.spark.sql.functions._
    val url = s"jdbc:sqlite:$tmp/monitoring.db"
    val drv = "org.sqlite.JDBC"
    // the reference's own two tables, written through the generic JDBC sink
    val records = spark.range(0, 100).select(
      col("id").as("record_id"), (col("id") % 10).as("profile_id"),
      (lit(1700000000L) + col("id") * 60).as("ts_epoch"),
      (col("id") * 3 % 97).as("views"))
    val profiles = spark.range(0, 10).select(
      col("id").as("profile_id"), concat(lit("user_"), col("id")).as("name"),
      (lit(18) + col("id") % 50).as("age"))
    Formats.writeJdbc(records, url, "monitor_records", driver = drv)
    Formats.writeJdbc(profiles, url, "profiles", driver = drv)
    // partitioned parallel read — the reference's day-one workflow at scale
    val mr = Formats.readJdbc(spark, url, "monitor_records", driver = drv,
      partitionColumn = "record_id", lowerBound = 0L, upperBound = 100L, numPartitions = 4)
    assert(mr.rdd.getNumPartitions === 4)
    assert(mr.count() === 100)
    // predicates reach the database instead of filtering after transfer
    val filtered = mr.filter(col("views") > 50)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan"), plan)
    assert(filtered.count() === records.filter(col("views") > 50).count())
    // the joined records×profiles shape the reference pipelines consume
    val joined = mr.join(Formats.readJdbc(spark, url, "profiles", driver = drv), "profile_id")
    assert(joined.count() === 100)
  }

  test("orc round-trip preserves rows and values") {
    val orig = ordersSorted
    Formats.writeOrc(orig, s"$tmp/orders_orc")
    val back = Formats.readOrc(spark, s"$tmp/orders_orc").orderBy("o_orderkey")
    assert(back.collect().toSeq === orig.collect().toSeq)
  }

  test("partitioned parquet write prunes partitions on read") {
    val orig = ordersSorted
    Formats.writeParquet(orig, s"$tmp/orders_part", Seq("o_orderstatus"))
    val back = Formats.readParquet(spark, s"$tmp/orders_part")
    val one = back.filter(col("o_orderstatus") === "O")
    // partition pruning: the filtered scan must read fewer files than the full scan
    assert(one.count() === orig.filter(col("o_orderstatus") === "O").count())
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderstatus"), plan)
  }

  test("co-bucketed tables join with zero shuffle exchanges") {
    val orders = graft.ops.Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = graft.ops.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_quantity")
    // a previous JVM may have left the managed location behind without the
    // (in-memory) catalog entry — clear both before writing
    for (t <- Seq("b_orders", "b_lineitem")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    Formats.writeBucketed(orders, "b_orders", Seq("o_orderkey"), 8)
    Formats.writeBucketed(lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", Seq("o_orderkey"), 8)
    val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
    // co-located join: both sides pre-hashed into the same 8 buckets, so
    // the sort-merge join runs with NO Exchange on either side
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n${plan.take(3000)}")
    assert(joined.count() === lineitem.count()) // every lineitem has its order
  }

  test("persisted IVF index: cell-bucketed corpus and probes join with no shuffle on either side") {
    // the 100 TB ANN serving shape: the trained-quantizer assignment table
    // (s_kmeans_assign's output) persists bucketed by cell, probe batches
    // bucket the same way, and every search join is pre-hashed — the
    // corpus-side Exchange that would dominate at scale never exists
    val S = graft.ext.Similarity
    val emb = graft.ops.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cent = S.kmeansCentroidsOn(emb, S.KmeansCfg(dims = S.Dims)).persist()
    val cells = S.assignCellsAgainstOn(emb, cent)
    val probes = S.assignCellsAgainstOn(emb.filter(col("vec_id") % 25 === 0), cent)
      .withColumnRenamed("vec_id", "q_id").drop("ccos")
    for (t <- Seq("ivf_cells", "ivf_probes")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    Formats.writeBucketed(cells, "ivf_cells", Seq("cell"), 8)
    Formats.writeBucketed(probes, "ivf_probes", Seq("cell"), 8)
    cent.unpersist()
    val joined = spark.table("ivf_cells").join(spark.table("ivf_probes"), "cell")
      .filter(col("vec_id") =!= col("q_id"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed IVF join still shuffles:\n${plan.take(3000)}")
    assert(joined.count() > 0, "no probe landed in any populated cell (degenerate)")
  }

  test("range-clustered layout skips most data on a selective scan; unclustered cannot") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft_clustered").toString
    val ev = graft.ops.Tables.events(spark, src)
      .select(unix_micros(col("ts")).as("ts_us"), col("event_id"), col("value"))
    val Array(lo, hi) = ev.stat.approxQuantile("ts_us", Array(0.50, 0.52), 0.0).map(_.toLong)
    Formats.writeClustered(ev, s"$base/clustered", Seq("ts_us"), 8)
    // control: identical rows, hash-scrambled order — every file/page spans
    // the full ts range, so min/max stats can never exclude anything
    Formats.writeParquet(ev.orderBy(md5(col("event_id").cast("string"))).coalesce(2), s"$base/scrambled")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false") // plain plan → scan metrics reachable
      def scanned(path: String): (Long, Long) = {
        val df = spark.read.parquet(path).filter(col("ts_us") >= lo && col("ts_us") < hi)
        val n = df.collect().length.toLong
        val scan = df.queryExecution.executedPlan
          .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }.head
        (n, scan.metrics("numOutputRows").value)
      }
      val (nC, readC) = scanned(s"$base/clustered")
      val (nS, readS) = scanned(s"$base/scrambled")
      assert(nC === nS, "layouts disagree on query results")
      assert(nC > 0, "empty test window")
      // the layout is the only difference: clustered min/max stats confine
      // the read to the matching slice, scrambled stats cover everything
      assert(readS >= readC * 4,
        s"clustering skipped nothing: clustered read $readC rows, scrambled $readS")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("z-ordered layout skips data on BOTH clustered columns; linear clustering only on the leading one") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val ev = graft.ops.Tables.events(spark, "/root/testdata/sf0.01")
      .select(col("event_id"), col("user_id"), col("value"))
    // narrow band on each dimension (~4% of each key range)
    val Array(uLo, uHi) = ev.stat.approxQuantile("user_id", Array(0.50, 0.54), 0.0).map(_.toLong)
    val Array(vLo, vHi) = ev.stat.approxQuantile("value", Array(0.50, 0.54), 0.0)
    // 64 files → each covers ~1/64 of z-space (a ~1/8 x 1/8 hyper-rect):
    // granularity matters — too few files and every thin band crosses
    // every coarse cell, the same sizing rule a production OPTIMIZE uses
    Formats.writeZOrdered(ev, s"$base/zorder", Seq("user_id", "value"), 64)
    Formats.writeClustered(ev, s"$base/linear", Seq("user_id", "value"), 64)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      def scanned(path: String, pred: org.apache.spark.sql.Column): (Long, Long) = {
        val df = spark.read.parquet(path).filter(pred)
        val nRows = df.collect().length.toLong
        val scan = df.queryExecution.executedPlan
          .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }.head
        (nRows, scan.metrics("numOutputRows").value)
      }
      val onUser = col("user_id") >= uLo && col("user_id") < uHi
      val onValue = col("value") >= vLo && col("value") < vHi
      val total = ev.count()
      val (nzU, readZU) = scanned(s"$base/zorder", onUser)
      val (nlU, readLU) = scanned(s"$base/linear", onUser)
      val (nzV, readZV) = scanned(s"$base/zorder", onValue)
      val (nlV, readLV) = scanned(s"$base/linear", onValue)
      assert(nzU === nlU && nzV === nlV, "layouts disagree on query results")
      assert(nzU > 0 && nzV > 0, "empty test band")
      // both layouts skip on the leading column...
      assert(readZU * 2 <= total, s"z-order skipped nothing on user_id: $readZU of $total")
      assert(readLU * 2 <= total, s"linear skipped nothing on user_id: $readLU of $total")
      // ...but only z-order also skips on the second column: the linear
      // sort spreads every value range across every user_id file
      assert(readZV * 2 <= total, s"z-order skipped nothing on value: $readZV of $total")
      assert(readZV * 2 <= readLV,
        s"z-order ($readZV rows) should read well under linear ($readLV) on the trailing column")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("malformed csv cells coerce to null, not error") {
    val dir = s"$tmp/bad_csv"
    Files.createDirectories(java.nio.file.Paths.get(dir))
    Files.writeString(java.nio.file.Paths.get(s"$dir/part.csv"),
      "k,v\n1,2.5\n2,not_a_number\n3,\n")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType)))
    val got = Formats.readCsv(spark, dir, schema).orderBy("k").collect()
    assert(got.length === 3)
    assert(got(0).getDouble(1) === 2.5)
    assert(got(1).isNullAt(1) && got(2).isNullAt(1))
  }
}
