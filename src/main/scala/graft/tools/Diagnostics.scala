package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement mains behind the numbers recorded in BASELINE.md — not part
  * of the query registry, but kept in-tree so every published recall /
  * trade-off figure is reproducible with one `runMain`. */
object Tools {
  def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions().apply(_))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

/** Selective correctness dump for fast iteration on a few queries:
  * `runMain graft.tools.VerifySome <sfDir> <outDir> <name>[,<name>...]`
  * writes the named queries' parquet + an oracle_sql.json restricted to
  * them, in the exact layout tools/check.py expects. */
object VerifySome {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, namesCsv) = args
    val names = namesCsv.split(",").toSeq
    val spark = Tools.session()
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      spark.catalog.clearCache()
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql.view.filterKeys(names.contains)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}

/** Executed-plan dump for plan review:
  * `runMain graft.tools.ExplainSome <sfDir> <name>[,<name>...]` executes
  * each named registry query and prints its final (post-AQE) physical plan. */
object ExplainSome {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, namesCsv) = args
    val spark = Tools.session()
    namesCsv.split(",").foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      // collect() executes THIS df's QueryExecution so its AdaptiveSparkPlan
      // finalizes (count() would build and run a separate groupBy plan and
      // leave this one at isFinalPlan=false)
      df.collect()
      println(s"===== $name =====")
      println(df.queryExecution.executedPlan.toString)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

/** recall@5 of every ANN variant against the brute-force top-5 on a testdata
  * dir (arg 0, default sf0.01): the per-probe |bf ∩ variant| / 5, averaged.
  * PQ variants rank by L2 rather than cosine, so a recall below 1.0 mixes
  * metric disagreement with index loss — comparing `s_knn_ivfpq` against
  * `s_knn_pq` (same metric, same knobs) isolates what the IVF cell bound
  * alone drops. */
object AnnRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Tools.session()
    def top5(name: String): Map[Long, Set[Long]] =
      graft.SparkEntry.queries(name)(spark, sfDir)
        .select("q_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val bf = top5("s_knn_bruteforce")
    spark.catalog.clearCache()
    for (v <- Seq("s_knn_lsh", "s_knn_ivf", "s_knn_ivf_kmeans", "s_knn_pq", "s_knn_ivfpq")) {
      val got = top5(v)
      val recall = bf.keys.toSeq.map(q => (bf(q) intersect got.getOrElse(q, Set.empty)).size / 5.0)
      println(f"$v%-18s recall@5 = ${recall.sum / recall.size}%.3f over ${recall.size} probes ($sfDir)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

/** dup-clusters lineage study: persist-per-round vs localCheckpoint-per-round
  * (args: testdata dirs, default sf0.1). Min of 2 runs each, caches cleared
  * between — the measurement behind the `checkpointRounds` knob note. */
object CcCheckpointBench {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val spark = Tools.session()
    spark.range(1000000).selectExpr("sum(id)").collect() // JIT warmup
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    for (dir <- dirs; ckpt <- Seq(false, true)) {
      val ts = (1 to reps).map { _ =>
        val docs = graft.ops.Tables.documents(spark, dir)
        val t0 = System.nanoTime()
        graft.ext.Dedup.dupClustersOn(docs, checkpointRounds = ckpt).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        System.gc(); Thread.sleep(300)
        dt
      }
      val all = ts.map(t => f"$t%.2f").mkString(", ")
      println(f"dup_clusters $dir checkpointRounds=$ckpt: min ${ts.min}%.2f s (runs: $all)")
    }
    spark.stop()
  }
}
