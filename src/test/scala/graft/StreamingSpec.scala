package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._

/** Stream/batch equivalence: the streaming tumbling-window aggregation over
  * the finite events fixture must produce exactly the batch `window()`
  * result (same aggregation expressions, watermark can't drop anything when
  * the whole fixture is one micro-batch).
  */
class StreamingSpec extends SparkSpec {

  test("streaming 1h tumbling window matches batch time_window_agg") {
    val streamed = StreamingOps.runToMemorySink(
      StreamingOps.windowedCounts(spark, sf), "stream_win")
      .select(col("hour_start"), col("event_type"), col("n"),
        col("sum_value"))
    val batch = SparkEntry.queries("time_window_agg")(spark, sf)
      .select((col("hour_bucket") * 3600).as("hour_start"),
        col("event_type"), col("n"), col("sum_value"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(streamed).count() === 0L)
  }

  test("streaming dedup emits each event id exactly once") {
    val q = StreamingOps.dedupStream(spark, sf).writeStream
      .outputMode("append").format("memory").queryName("stream_dedup").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("stream_dedup")
    val batchIds = graft.Tables.events(spark, sf).select("event_id").distinct()
    assert(streamed.count() === batchIds.count())
    assert(streamed.select("event_id").distinct().count() === streamed.count())
  }

  test("stream-static enrichment joins every event to its user dim row") {
    val q = StreamingOps.enrichStream(spark, sf).writeStream
      .outputMode("append").format("memory").queryName("stream_enrich").start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("stream_enrich")
    val events = graft.Tables.events(spark, sf)
    assert(out.count() === events.count()) // inner join loses no event
    // the enriched count matches the batch aggregate for every row
    val bad = out.join(
        events.groupBy("user_id").count().withColumnRenamed("count", "exp"),
        "user_id")
      .where(col("user_total_events") =!= col("exp"))
    assert(bad.count() === 0L)
  }

  test("stream-stream interval join matches the batch interval join") {
    val q = StreamingOps.clickToPurchaseJoin(spark, sf).writeStream
      .outputMode("append").format("memory").queryName("stream_ssj").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("stream_ssj")
    val batch = StreamingOps.clickToPurchaseBatch(spark, sf)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(streamed).count() === 0L)
  }

  test("flatMapGroupsWithState threshold alerts match the batch cumsum form") {
    val q = StreamingOps.thresholdAlerts(spark, sf, 50.0).writeStream
      .outputMode("append").format("memory").queryName("stream_alerts").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("stream_alerts")
    val batch = StreamingOps.thresholdAlertsBatch(spark, sf, 50.0)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(streamed).count() === 0L)
  }

  test("streaming session_window matches batch session_window_agg") {
    val streamed = StreamingOps.runToMemorySink(
      StreamingOps.sessionCounts(spark, sf), "stream_sess")
      .select(col("user_id"), col("sess_start"), col("n_events"),
        col("sum_value"))
    val batch = SparkEntry.queries("session_window_agg")(spark, sf)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(streamed).count() === 0L)
  }
}
