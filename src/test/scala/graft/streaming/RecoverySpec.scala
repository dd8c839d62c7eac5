package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Checkpoint fault-tolerance of the stateful streaming twins: a query is
  * stopped after its first batches, new data lands, and a NEW query
  * resumes from the RocksDB checkpoint — the union of outputs must equal
  * an uninterrupted run (and the batch twin). This is the half of
  * "streaming twin" the parity suite's single-lifetime runs never
  * asserted: stream-stream join state and flatMapGroupsWithState state
  * surviving a process restart, with the file sink's commit log keeping
  * the output exactly-once across the replay. */
class RecoverySpec extends SparkSpec {
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"

  private def withRocksDb[T](f: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Write one event-time slice of the events table as a single parquet
    * file into `inDir` (the micro-batch unit under maxFilesPerTrigger=1). */
  private def writeSlice(pred: org.apache.spark.sql.Column, inDir: String,
                         name: String): Unit = {
    val ev = graft.ops.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts"), unix_micros(col("ts")).as("ts_us"), col("value"))
    val tmp = s"$inDir/../tmp_$name"
    ev.filter(pred).coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, Paths.get(s"$inDir/$name.parquet"),
      StandardCopyOption.ATOMIC_MOVE)
    Thread.sleep(20) // distinct mtimes → deterministic file-source order
  }

  private val sliceSchema =
    "event_id LONG, user_id LONG, event_type STRING, ts TIMESTAMP, ts_us LONG, value DOUBLE"

  test("stream-stream join state survives a kill + RocksDB checkpoint restart") {
    withRocksDb {
      val base = Files.createTempDirectory("graft_ckpt_join").toString
      Files.createDirectories(Paths.get(s"$base/in"))
      // batch truth + a pair whose view precedes its click: cut between
      // them, so the view enters state BEFORE the kill and the click
      // arrives AFTER the restart — the pair can only emit if the join
      // state was recovered from the checkpoint
      val batch = graft.queries.Sessions.clickAttribution(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
        .toSeq.sorted
      val spanning = batch.filter { case (_, _, cTs, _, vTs, _) => vTs < cTs }
      assert(spanning.nonEmpty, "degenerate corpus: every pair is simultaneous")
      val pair = spanning.minBy { case (_, _, cTs, _, vTs, _) => cTs - vTs }
      val cut = (pair._5 + pair._3) / 2
      def runOnce(): Unit = {
        val q = Streams.clickViewJoin(
            spark.readStream.schema(sliceSchema)
              .option("maxFilesPerTrigger", "1").parquet(s"$base/in")
              .select("event_id", "user_id", "event_type", "ts", "value"))
          .writeStream.format("parquet")
          .option("path", s"$base/out")
          .option("checkpointLocation", s"$base/ckpt")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      // lifetime 1: only the pre-cut slice exists; query runs dry and stops
      writeSlice(col("ts_us") <= cut, s"$base/in", "slice0")
      runOnce()
      val afterRun1 = spark.read.parquet(s"$base/out")
        .select("click_event_id").as[Long].collect().toSet
      assert(!afterRun1.contains(pair._1),
        "cut-spanning pair emitted before its click arrived — cut misplaced")
      // the kill: lifetime 1's query object is gone; new data lands and a
      // NEW query recovers the state store from the checkpoint
      writeSlice(col("ts_us") > cut, s"$base/in", "slice1")
      runOnce()
      val recovered = spark.read.parquet(s"$base/out")
        .select("click_event_id", "user_id", "c_ts_us", "view_event_id", "v_ts_us", "view_value")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
        .toSeq.sorted
      // recovery ≡ batch twin, doc-for-doc including multiplicity (the
      // inner join emits everything by end-of-stream; exactly-once via the
      // sink commit log — a replayed batch must not double-write)
      assert(recovered === batch,
        s"missing: ${(batch.toSet -- recovered.toSet).take(3)}; extra: ${(recovered.toSet -- batch.toSet).take(3)}")
      // ... and the engineered pair crossed the restart boundary
      assert(recovered.exists(_._1 == pair._1), "cut-spanning pair lost in recovery")
    }
  }

  test("transformWithState sessions survive a kill + RocksDB checkpoint restart") {
    withRocksDb {
      val base = Files.createTempDirectory("graft_ckpt_tws").toString
      Files.createDirectories(Paths.get(s"$base/in"))
      // cut INSIDE a known multi-event session: its opening events enter
      // typed ValueState before the kill, its tail (and the event-time
      // timer that flushes it) arrives after the restart — the session can
      // only emit intact if tws state AND timers recover
      val batch = graft.queries.Sessions.sessionize(spark, sfDir)
        .select("user_id", "session_start_us", "session_end_us", "n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val maxTs = batch.map(_._3).max
      val target = batch
        .filter(s => s._4 >= 2 && s._3 > s._2 &&
          s._3 + Streams.SessionGapUs + 1000000 < maxTs)
        .maxBy(_._4)
      val cut = (target._2 + target._3) / 2
      def runOnce(): Unit = {
        val q = Streams.sessionizeTws(
            spark.readStream.schema(sliceSchema)
              .option("maxFilesPerTrigger", "1").parquet(s"$base/in")
              .select(col("user_id"), col("ts_us"), col("value"))
              .as[Streams.SessionEvent], "0 seconds")
          .toDF()
          .writeStream.format("parquet")
          .option("path", s"$base/out")
          .option("checkpointLocation", s"$base/ckpt")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      writeSlice(col("ts_us") <= cut, s"$base/in", "slice0")
      runOnce() // lifetime 1 ends mid-session
      writeSlice(col("ts_us") > cut, s"$base/in", "slice1")
      runOnce() // lifetime 2 recovers state + timers from the checkpoint
      val recovered = spark.read.parquet(s"$base/out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      // append-once across both lifetimes, every row a real batch session
      assert(recovered.length === recovered.toSet.size, "a session double-emitted")
      assert(recovered.toSet.subsetOf(batch.toSet),
        s"phantom sessions: ${(recovered.toSet -- batch.toSet).take(3)}")
      // the cut-spanning session was stitched ACROSS THE RESTART and
      // flushed by a recovered event-time timer
      assert(recovered.toSet.contains(target),
        s"session $target spans the kill at $cut and should have been " +
          "stitched from recovered state, but was not emitted intact")
    }
  }

  test("forward as-of horizon state AND timer survive a kill + RocksDB checkpoint restart") {
    withRocksDb {
      val base = Files.createTempDirectory("graft_ckpt_asofh").toString
      Files.createDirectories(Paths.get(s"$base/in"))
      val ev = graft.ops.Tables.events(spark, sfDir)
      // horizon = median resolution gap (the StreamsSpec horizon convention)
      val gaps = graft.queries.Sessions.asofForward(spark, sfDir).collect()
        .collect { case r if !r.isNullAt(3) => r.getLong(4) - r.getLong(2) }.sorted
      val h = gaps(gaps.length / 2)
      val truth = graft.queries.Sessions.asofHorizonOn(ev, horizonUs = h).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some((r.getLong(3), r.getLong(4), r.getDouble(5))))))
        .toMap
      val wmFinal = ev.agg(max(unix_micros(col("ts")))).head().getLong(0) / 1000L * 1000L
      // the engineered cut: a horizon-NULL purchase whose user goes SILENT
      // before its horizon closes. Cutting at the user's last event puts
      // the candidate-less purchase (and its armed horizon timer) into
      // state before the kill; in lifetime 2 the user has NO further
      // traffic, so its null row can only come from the RECOVERED state
      // store and the RECOVERED event-time timer firing as other users'
      // events advance the watermark past ts + h.
      val lastByUser = ev.groupBy("user_id").agg(max(unix_micros(col("ts"))).as("m"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val candidates = truth.toSeq.collect {
        case (id, (u, ts, None)) if ts + h < wmFinal && lastByUser(u) < ts + h &&
          lastByUser(u) < wmFinal => (id, u, ts)
      }
      assert(candidates.nonEmpty,
        "degenerate corpus: no horizon-null purchase from a user who goes silent before horizon close")
      val (spanId, spanUser, _) = candidates.minBy(_._3)
      val cut = lastByUser(spanUser)
      def runOnce(): Unit = {
        val q = Streams.asofForwardUpdates(
            spark.readStream.schema(sliceSchema)
              .option("maxFilesPerTrigger", "1").parquet(s"$base/in")
              .select("event_id", "user_id", "event_type", "ts_us", "value")
              .as[Streams.AsofEvent], "0 seconds", horizonUs = Some(h))
          .toDF()
          .writeStream.format("parquet")
          .option("path", s"$base/out")
          .option("checkpointLocation", s"$base/ckpt")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      writeSlice(col("ts_us") <= cut, s"$base/in", "slice0")
      runOnce() // lifetime 1: the user's whole history, then the kill
      val afterFirst = spark.read.parquet(s"$base/out")
        .select("event_id").collect().map(_.getLong(0)).toSet
      assert(!afterFirst.contains(spanId),
        "the engineered null row emitted before the restart — cut misplaced")
      writeSlice(col("ts_us") > cut, s"$base/in", "slice1")
      runOnce() // lifetime 2: no same-user traffic; only the recovered timer can seal it
      val recovered = spark.read.parquet(s"$base/out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some((r.getLong(3), r.getLong(4), r.getDouble(5)))))
        .toSeq
      // append-once across both lifetimes
      assert(recovered.map(_._1).distinct.length === recovered.length,
        "a purchase re-emitted across the restart")
      // the engineered null row emitted in lifetime 2 from recovered state
      val span = recovered.find(_._1 == spanId)
      assert(span.exists(_._4.isEmpty),
        s"recovered horizon-null row missing or non-null: $span")
      // every emitted row equals its batch-truth twin
      recovered.foreach { case (id, u, ts, q) =>
        assert(truth.get(id).contains((u, ts, q)), s"row $id drifted from the batch truth")
      }
      // union ≡ the uninterrupted single-lifetime run over the same slices
      val uninterrupted = Streams.runToMemory(spark,
          Streams.asofForwardUpdates(
            spark.readStream.schema(sliceSchema)
              .option("maxFilesPerTrigger", "1").parquet(s"$base/in")
              .select("event_id", "user_id", "event_type", "ts_us", "value")
              .as[Streams.AsofEvent], "0 seconds", horizonUs = Some(h))
            .toDF(), "t_asofh_unint")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some((r.getLong(3), r.getLong(4), r.getDouble(5)))))
        .toSeq
      assert(recovered.sortBy(_._1) === uninterrupted.sortBy(_._1),
        "recovered union differs from the uninterrupted run")
    }
  }

  test("flatMapGroupsWithState ring state survives a kill + RocksDB checkpoint restart") {
    withRocksDb {
      val base = Files.createTempDirectory("graft_ckpt_spike").toString
      Files.createDirectories(Paths.get(s"$base/in"))
      val H = graft.queries.Sessions.HourUs
      val ev = graft.ops.Tables.events(spark, sfDir)
        .withColumn("ts_us", unix_micros(col("ts")))
      val lo = ev.agg(min(col("ts_us") - pmod(col("ts_us"), lit(H)))).head().getLong(0)
      val ts = ev.select("ts_us").as[Long].collect().sorted
      val cut = ts(ts.length / 2)
      def runOnce(): Unit = {
        val q = Streams.rateSpikeUpdates(
            spark.readStream.schema(sliceSchema)
              .option("maxFilesPerTrigger", "1").parquet(s"$base/in")
              .select(col("event_type"), col("ts_us")).as[Streams.RateEvent], lo)
          .toDF()
          .writeStream.format("parquet")
          .option("path", s"$base/out")
          .option("checkpointLocation", s"$base/ckpt")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      writeSlice(col("ts_us") <= cut, s"$base/in", "slice0")
      runOnce() // lifetime 1: first half of the stream, then the kill
      writeSlice(col("ts_us") > cut, s"$base/in", "slice1")
      runOnce() // lifetime 2: recovers ring + watermark from the checkpoint
      val recovered = spark.read.parquet(s"$base/out").collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6))))
        .toSeq
      // append-once across BOTH lifetimes: no bucket double-sealed
      assert(recovered.map(_._1).distinct.length === recovered.length,
        "a bucket was re-emitted across the restart")
      // every sealed row equals its batch-monitor twin — in particular the
      // post-restart rows, whose mu/sd z-scores need the ring counts
      // accumulated BEFORE the kill
      val batchAll = graft.queries.Sessions.rateSpike(spark, sfDir).collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6))))
        .toMap
      recovered.foreach { case (key, v) =>
        assert(batchAll.get(key).contains(v), s"recovered $key=$v != batch ${batchAll.get(key)}")
      }
      // the recovered lifetime actually sealed ring-scored buckets (z
      // requires a FULL baseline ring, so these prove recovered state)
      val postCut = recovered.filter { case ((_, b), _) => b > cut }
      assert(postCut.nonEmpty, "no buckets sealed after the restart")
      // union ≡ the uninterrupted single-lifetime run over the same slices
      val uninterrupted = Streams.runToMemory(spark,
          Streams.rateSpikeUpdates(
            spark.readStream.schema(sliceSchema)
              .option("maxFilesPerTrigger", "1").parquet(s"$base/in")
              .select(col("event_type"), col("ts_us")).as[Streams.RateEvent], lo)
            .toDF(), "t_spike_unint")
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6))))
        .toSeq
      assert(recovered.sorted === uninterrupted.sorted,
        "recovered union differs from the uninterrupted run")
    }
  }
}
