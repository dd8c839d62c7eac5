package graft.streaming

import graft.SparkSpec
import graft.queries.{Micro, Sessions}
import org.apache.spark.sql.functions._

/** Batch/stream parity: the streaming plans must produce exactly the rows
  * their batch twins produce on the same bounded input. */
class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("streaming tumbling window matches the batch tumbling window") {
    // Complete mode: with bounded input + append, the final watermark never
    // advances past the last windows, so they would never emit
    val streamed = Streams.runToMemory(spark,
      Streams.tumblingCounts(Streams.readEventsStream(spark, sfDir)), "t_tumbling",
      org.apache.spark.sql.streaming.OutputMode.Complete())
      .select(unix_micros(col("win_start")).as("win_start_us"), col("event_type"),
        col("n_events"), graft.ops.Num.r6(col("sum_value")).as("sum_value"))
      .orderBy("win_start_us", "event_type")
      .collect()
    val batch = Micro.tumblingWindow(spark, sfDir).collect()
    assert(streamed.length === batch.length)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("streaming sliding window matches the batch sliding window") {
    val streamed = Streams.runToMemory(spark,
      Streams.slidingCounts(Streams.readEventsStream(spark, sfDir)), "t_sliding",
      org.apache.spark.sql.streaming.OutputMode.Complete())
      .select(unix_micros(col("win_start")).as("win_start_us"), col("event_type"),
        col("n_events"), graft.ops.Num.r6(col("sum_value")).as("sum_value"))
      .orderBy("win_start_us", "event_type")
      .collect()
    val batch = Micro.slidingWindow(spark, sfDir).collect()
    assert(streamed.toSeq === batch.toSeq)
  }

  test("stream-static enrichment join matches the batch broadcast join") {
    val streamed = Streams.runToMemory(spark,
      Streams.enrichWithCustomer(Streams.readEventsStream(spark, sfDir),
        graft.ops.Tables.customer(spark, sfDir)), "t_enrich")
      .select("event_id", "c_mktsegment")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val batch = graft.ops.Tables.events(spark, sfDir)
      .join(graft.ops.Tables.customer(spark, sfDir),
        col("user_id") === col("c_custkey"))
      .select("event_id", "c_mktsegment")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("watermarked stream-stream interval join matches the batch range join") {
    val streamed = Streams.runToMemory(spark,
      Streams.clickViewJoin(Streams.readEventsStream(spark, sfDir)), "t_ssjoin")
      .select("c_event_id", "v_ts_us")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = graft.ops.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
    val batch = ev.filter(col("event_type") === "click").as("c")
      .join(ev.filter(col("event_type") === "view").as("v"),
        col("c.user_id") === col("v.user_id") &&
          col("v.ts_us") <= col("c.ts_us") &&
          col("v.ts_us") >= col("c.ts_us") - lit(30L * 60 * 1000000))
      .select(col("c.event_id"), col("v.ts_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming exact dedup emits exactly the batch-distinct key set") {
    val streamed = Streams.runToMemory(spark,
      Streams.dedupKeysExact(Streams.readEventsStream(spark, sfDir)), "t_dedup_exact")
      .select("user_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val batch = graft.ops.Tables.events(spark, sfDir)
      .select("user_id", "event_type").distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed === batch)
  }

  test("watermark-bounded dedup output lies between distinct-keys and all-rows") {
    val n = Streams.runToMemory(spark,
      Streams.dedupKeysWithinWatermark(Streams.readEventsStream(spark, sfDir)),
      "t_dedup_wm").count()
    val events = graft.ops.Tables.events(spark, sfDir)
    val distinctKeys = events.select("user_id", "event_type").distinct().count()
    val total = events.count()
    assert(n >= distinctKeys, s"$n < $distinctKeys: dropped keys entirely")
    assert(n < total, s"$n = $total: suppressed nothing")
  }

  test("parquet sink with checkpoint persists the stream durably (production sink path)") {
    val base = java.nio.file.Files.createTempDirectory("graft_stream_sink").toString
    val q = Streams.tumblingCounts(Streams.readEventsStream(spark, sfDir))
      .select(unix_micros(col("win_start")).as("win_start_us"), col("event_type"),
        col("n_events"), col("sum_value"))
      .writeStream
      .format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val sunk = spark.read.parquet(s"$base/out")
    // append mode emits only watermark-closed windows on bounded input; all
    // emitted rows must agree exactly with the batch twin
    val batch = Micro.tumblingWindow(spark, sfDir)
      .withColumnRenamed("sum_value", "b_sum")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val rows = sunk.select(col("win_start_us"), col("event_type"), col("n_events"),
      graft.ops.Num.r6(col("sum_value")).as("sum_value")).collect()
    assert(rows.nonEmpty, "append sink emitted nothing")
    rows.foreach { r =>
      val k = (r.getLong(0), r.getString(1))
      assert(batch.contains(k), s"sunk window $k missing from batch")
      assert(batch(k) === ((r.getLong(2), r.getDouble(3))), s"mismatch at $k")
    }
  }

  test("flatMapGroupsWithState sessionization matches the window-function batch twin") {
    val evs = graft.ops.Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
      .as[Streams.SessionEvent]
    val stateful = Streams.sessionize(evs)
      .toDF()
      .groupBy("user_id", "session_start_us", "session_end_us")
      .agg(sum("n_events").as("n_events")) // canonical shape for compare
      .orderBy("user_id", "session_start_us")
      .collect()
    val batch = Sessions.sessionize(spark, sfDir)
      .groupBy("user_id", "session_start_us", "session_end_us")
      .agg(sum("n_events").as("n_events"))
      .orderBy("user_id", "session_start_us")
      .collect()
    assert(stateful.length === batch.length)
    assert(stateful.toSeq === batch.toSeq)
  }
}
