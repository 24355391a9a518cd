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

  test("threshold alerts skip NaN and null values identically in both forms") {
    // round-6 ADVICE: floor(NaN*100+0.5) silently maps NaN to 0L in Spark
    // while the DuckDB oracle errors — so NaN must be FILTERED like null in
    // stream, batch, and oracle. Fixture: user 7 crosses 50 only if the NaN
    // row is skipped and the 30+25 rows both count; user 8's only non-NaN
    // row crosses alone; user 9 has just a null row -> no alert.
    import java.nio.file.{Files, Paths}
    import spark.implicits._
    val rows = Seq(
      (1L, 1000000000000L, 7L, "click", Some(30.0), "{}"),
      (2L, 2000000000000L, 7L, "click", Some(Double.NaN), "{}"),
      (3L, 3000000000000L, 7L, "click", Some(25.0), "{}"),
      (4L, 4000000000000L, 8L, "click", Some(Double.NaN), "{}"),
      (5L, 5000000000000L, 8L, "click", Some(60.0), "{}"),
      (6L, 6000000000000L, 9L, "view", None: Option[Double], "{}"))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = Files.createTempDirectory("graft-nan-events")
    val staged = tmp.resolve("w").toString
    df.coalesce(1).write.parquet(staged)
    val part = Files.list(Paths.get(staged)).filter(
      _.getFileName.toString.endsWith(".parquet")).findFirst.get
    Files.copy(part, tmp.resolve("events.parquet"))
    val fixtureDir = tmp.toString // unique basename -> fresh stageDir copy
    val batch = StreamingOps.thresholdAlertsBatch(spark, fixtureDir, 50.0)
    val expected = Set((7L, 3L, 1L), (8L, 5L, 1L))
    assert(batch.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet === expected)
    val q = StreamingOps.thresholdAlerts(spark, fixtureDir, 50.0).writeStream
      .outputMode("append").format("memory").queryName("nan_alerts").start()
    q.processAllAvailable()
    q.stop()
    assert(spark.table("nan_alerts").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet === expected)
  }

  test("streaming as-of carries clicks across micro-batches") {
    // split events by TIME (not id) so batch 1 holds everything at or
    // before the median µs and batch 2 the rest: cross-batch order is
    // then guaranteed and a batch-2 purchase whose nearest click landed
    // in batch 1 exercises the state carry — the path a single-batch run
    // never touches. Result must equal the batch as-of join exactly.
    import java.nio.file.{Files, Paths}
    val dir = "target/stream-fixtures/test-asof-2batch"
    graft.sources.Staging.deleteRecursively(Paths.get(dir))
    Files.createDirectories(Paths.get(dir))
    val ev = graft.Tables.events(spark, sf)
    val medianUs = ev.select(expr("ts div 1000").as("ts_us"))
      .stat.approxQuantile("ts_us", Array(0.5), 0.0).head.toLong
    ev.where(expr("ts div 1000") <= medianUs).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/half-a")
    ev.where(expr("ts div 1000") > medianUs).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/half-b")
    val twoFiles = Seq("half-a", "half-b").flatMap { h =>
      val entries = Files.list(Paths.get(s"$dir/$h"))
      try entries.toArray.map(_.toString).filter(_.endsWith(".parquet"))
      finally entries.close()
    }
    twoFiles.zipWithIndex.foreach { case (f, i) =>
      Files.move(Paths.get(f), Paths.get(s"$dir/part-$i.parquet"))
    }
    Seq("half-a", "half-b").foreach(h =>
      graft.sources.Staging.deleteRecursively(Paths.get(s"$dir/$h")))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import spark.implicits._
    spark.catalog.dropTempView("stream_asof_2b")
    val q = StreamingOps.asofEnrich(
        spark.readStream.schema(StreamingOps.eventsSchema)
          .option("maxFilesPerTrigger", "1").parquet(dir)
          .select(col("user_id"), col("event_id"),
            expr("ts div 1000").as("ts_us"), col("event_type"))
          .as[(Long, Long, Long, String)])
      .writeStream.outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory").queryName("stream_asof_2b").start()
    q.awaitTermination()
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches >= 2,
      s"expected >=2 data micro-batches, got $dataBatches")
    val streamed = spark.table("stream_asof_2b")
    val batch = SparkEntry.queries("join_asof")(spark, sf)
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(streamed).count() === 0L)
    // the carry genuinely fired: some batch-2 purchase was enriched by a
    // batch-1 click (purchase after the median, click at or before it)
    assert(streamed.where(col("ts_us") > medianUs &&
        col("last_click_us") =!= -1L &&
        col("last_click_us") <= medianUs).count() > 0L,
      "no purchase crossed the batch boundary with a carried click")
  }

  test("asof TTL: expired clicks fall to the sentinel and state evicts") {
    // crafted two-batch source at a 5-second TTL, covering every arm:
    // user 2's click enriches a next-batch purchase arriving 1µs inside
    // the TTL; user 4's purchase arrives past it (sentinel + eager
    // eviction by the group's own traffic); user 1 clicks once and goes
    // idle — its state must evict by EVENT-TIME TIMEOUT when batch 2's
    // other traffic advances the watermark past its click + TTL (the
    // path eager eviction can never reach: the group is never
    // re-invoked by data); user 3 never clicks (sentinel, no state).
    // Final state = user 2 alone.
    import java.nio.file.{Files, Paths}
    import spark.implicits._
    val ttl = 5000000L // 5 s in µs
    val dir = "target/stream-fixtures/test-asof-ttl"
    graft.sources.Staging.deleteRecursively(Paths.get(dir))
    Files.createDirectories(Paths.get(dir))
    def write(part: String, rows: Seq[(Long, Long, Long, String)]): Unit =
      rows.toDF("user_id", "event_id", "ts_us", "event_type")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$part")
    write("half-a", Seq(
      (1L, 100L, 1000000L, "click"),    // idle user: timeout eviction
      (4L, 101L, 2000000L, "click"),    // will expire against its own row
      (2L, 102L, 10000000L, "click")))  // survives
    write("half-b", Seq(
      (4L, 200L, 9000000L, "purchase"),         // 7 s gap > TTL: sentinel
      (3L, 201L, 10500000L, "purchase"),        // never clicked: sentinel
      (2L, 202L, 10000000L + ttl - 1, "purchase"))) // 1µs inside: enriched
    val twoFiles = Seq("half-a", "half-b").flatMap { h =>
      val entries = Files.list(Paths.get(s"$dir/$h"))
      try entries.toArray.map(_.toString).filter(_.endsWith(".parquet"))
      finally entries.close()
    }
    twoFiles.zipWithIndex.foreach { case (f, i) =>
      Files.move(Paths.get(f), Paths.get(s"$dir/part-$i.parquet"))
    }
    Seq("half-a", "half-b").foreach(h =>
      graft.sources.Staging.deleteRecursively(Paths.get(s"$dir/$h")))
    spark.catalog.dropTempView("stream_asof_ttl")
    val q = StreamingOps.asofTtlEnrich(
        spark.readStream
          .schema("user_id LONG, event_id LONG, ts_us LONG, " +
            "event_type STRING")
          .option("maxFilesPerTrigger", "1").parquet(dir)
          .withColumn("ts_evt", timestamp_micros(col("ts_us")))
          .withWatermark("ts_evt", "0 seconds")
          .select(col("user_id"), col("event_id"), col("ts_us"),
            col("event_type"), col("ts_evt"))
          .as[(Long, Long, Long, String, java.sql.Timestamp)], ttl)
      .writeStream.outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory").queryName("stream_asof_ttl").start()
    q.awaitTermination()
    val got = spark.table("stream_asof_ttl").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === Map(
      200L -> -1L,                // past TTL
      201L -> -1L,                // no click at all
      202L -> 10000000L))         // carried across batches, inside TTL
    // eviction observable in the state-store metrics: only user 2's
    // state survives the run (1: timed out, 3: never stored, 4: eagerly
    // removed when its own purchase aged the click out)
    val finalState = q.recentProgress.reverse
      .find(_.stateOperators.nonEmpty)
      .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
    assert(finalState === 1L, s"expected 1 surviving state row")
  }

  test("streaming_asof_ttl is row-identical to the TTL-bounded batch as-of") {
    val streamed = SparkEntry.queries("streaming_asof_ttl")(spark, sf)
    val events = graft.Tables.events(spark, sf)
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), expr("ts div 1000").as("c_us"))
    val batch = events.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"))
      .join(clicks, col("user_id") === col("c_user") &&
        col("c_us") <= col("ts_us") &&
        col("c_us") >= col("ts_us") - StreamingOps.ASOF_TTL_US, "left")
      .groupBy(col("event_id"), col("user_id"), col("ts_us"))
      .agg(coalesce(max(col("c_us")), lit(-1L)).as("last_click_us"))
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(streamed).count() === 0L)
    // both outcomes fire on the fixture
    assert(streamed.where(col("last_click_us") === -1L).count() > 0L)
    assert(streamed.where(col("last_click_us") =!= -1L).count() > 0L)
  }

  test("streaming_asof is row-identical to the batch as-of join") {
    val streamed = SparkEntry.queries("streaming_asof")(spark, sf)
    val batch = SparkEntry.queries("join_asof")(spark, sf)
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(streamed).count() === 0L)
  }

  test("streaming compaction revises state across micro-batches") {
    // two half-files + maxFilesPerTrigger=1 force TWO micro-batches, so a
    // key's batch-1 winner must be REVISED when batch 2 brings a later
    // event — the path a single-batch run never exercises. Splitting by
    // even/odd event_id puts later events of most users in both halves.
    import java.nio.file.{Files, Paths}
    val dir = "target/stream-fixtures/test-compact-2batch"
    graft.sources.Staging.deleteRecursively(Paths.get(dir))
    Files.createDirectories(Paths.get(dir))
    val ev = graft.Tables.events(spark, sf)
    ev.where(col("event_id") % 2 === 0).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/half-a")
    ev.where(col("event_id") % 2 === 1).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/half-b")
    val twoFiles = Seq("half-a", "half-b").flatMap { h =>
      val entries = Files.list(Paths.get(s"$dir/$h"))
      try entries.toArray.map(_.toString).filter(_.endsWith(".parquet"))
      finally entries.close()
    }
    twoFiles.zipWithIndex.foreach { case (f, i) =>
      Files.move(Paths.get(f), Paths.get(s"$dir/part-$i.parquet"))
    }
    Seq("half-a", "half-b").foreach(h =>
      graft.sources.Staging.deleteRecursively(Paths.get(s"$dir/$h")))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // drive the query directly (not via runToMemorySink, which discards
    // the handle) so the test can PROVE more than one micro-batch ran —
    // otherwise a typo'd option or a trigger semantics change silently
    // degenerates this back to the single-batch case
    spark.catalog.dropTempView("stream_compact_2b")
    val q = graft.operators.RelationalOps.compactAgg(
        spark.readStream.schema(StreamingOps.eventsSchema)
          .option("maxFilesPerTrigger", "1").parquet(dir))
      .writeStream.outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory").queryName("stream_compact_2b").start()
    q.awaitTermination()
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches >= 2,
      s"expected >=2 data micro-batches, got $dataBatches — the revision " +
        "path is not being exercised")
    val streamed = spark.table("stream_compact_2b")
    val batch = SparkEntry.queries("compact_changelog")(spark, sf)
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(streamed).count() === 0L)
  }

  test("dedup state survives a checkpointed stop/restart (exactly once)") {
    // the production property none of the single-run tests touch: stop a
    // stateful query, add data, RESTART from its checkpoint — recovered
    // state must keep suppressing ids it saw before the restart. File B
    // deliberately re-ships every file-A event (plus the new half): if
    // the dedup state did not survive, the A-events emit twice.
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.streaming.Trigger
    val base = "target/stream-fixtures/test-dedup-recovery"
    graft.sources.Staging.deleteRecursively(Paths.get(base))
    val (src, ckpt, out) = (s"$base/src", s"$base/ckpt", s"$base/out")
    Files.createDirectories(Paths.get(src))
    // no nanosAsLong conf needed: Tables.events sets it for the fixture
    // read, and the re-staged halves store ts as plain INT64 already
    val ev = graft.Tables.events(spark, sf)
    def run(): Unit = {
      val q = spark.readStream.schema(StreamingOps.eventsSchema)
        .parquet(src)
        .dropDuplicates("event_id")
        .select(col("event_id"), col("user_id"), col("event_type"))
        .writeStream.outputMode("append")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .format("parquet").start(out)
      q.awaitTermination()
    }
    // run 1: first half
    stageOne(ev.where(col("event_id") % 2 === 0), s"$base/h0", src, "a")
    run()
    val afterA = spark.read.parquet(out).count()
    assert(afterA === ev.where(col("event_id") % 2 === 0).count())
    // run 2: a file carrying ALL events — the first half again + the rest
    stageOne(ev, s"$base/h1", src, "b")
    run()
    val got = spark.read.parquet(out)
    assert(got.count() === ev.count(),
      "restart re-emitted pre-restart ids — dedup state was lost")
    assert(got.select("event_id").distinct().count() === ev.count())
  }

  /** Write `df` as one parquet file and move it into `src` as `$tag.parquet`. */
  private def stageOne(df: org.apache.spark.sql.DataFrame, tmp: String,
      src: String, tag: String): Unit = {
    import java.nio.file.{Files, Paths}
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val entries = Files.list(Paths.get(tmp))
    val part =
      try entries.toArray.map(_.toString).filter(_.endsWith(".parquet")).head
      finally entries.close()
    Files.move(Paths.get(part), Paths.get(s"$src/$tag.parquet"))
    graft.sources.Staging.deleteRecursively(Paths.get(tmp))
  }

  test("compaction killed mid-drain resumes to the batch fixed point") {
    // the chaos property the clean stop/restart test cannot prove: STOP
    // the query while the AvailableNow drain is in flight (stop()
    // interrupts whatever micro-batch is running rather than letting the
    // trigger finish), then resume from the checkpoint — the recovered
    // run must land on exactly the batch fixed point, with the
    // interrupted batch replayed, never skipped or double-applied. The
    // sink is a complete-mode foreachBatch parquet rewrite — recoverable
    // (the memory sink is not), and the same idempotent-overwrite shape a
    // production compaction job uses.
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.streaming.Trigger
    val base = "target/stream-fixtures/test-compact-chaos"
    graft.sources.Staging.deleteRecursively(Paths.get(base))
    val (src, ckpt, out) = (s"$base/src", s"$base/ckpt", s"$base/out")
    Files.createDirectories(Paths.get(src))
    val ev = graft.Tables.events(spark, sf)
    // four quarter-files + maxFilesPerTrigger=1 => four data micro-batches,
    // so a kill after the first progress report lands mid-drain
    (0 until 4).foreach { i =>
      stageOne(ev.where(col("event_id") % 4 === i), s"$base/h$i", src, s"q$i")
    }
    def start() = graft.operators.RelationalOps.compactAgg(
        spark.readStream.schema(StreamingOps.eventsSchema)
          .option("maxFilesPerTrigger", "1").parquet(src))
      .writeStream.outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.write.mode("overwrite").parquet(out)
      }.start()
    val q1 = start()
    val deadline = System.nanoTime + 120L * 1000 * 1000 * 1000
    while (q1.recentProgress.isEmpty && q1.isActive &&
      System.nanoTime < deadline) Thread.sleep(10)
    q1.stop()
    q1.awaitTermination()
    val q2 = start()
    q2.awaitTermination()
    // all four files were committed by SOME run (an interrupted batch
    // replays in run 2, so the combined data-batch count can exceed 4 but
    // never undershoot it)
    val dataBatches = (q1.recentProgress ++ q2.recentProgress)
      .count(_.numInputRows > 0)
    assert(dataBatches >= 4,
      s"only $dataBatches data micro-batches committed across both runs")
    val streamed = spark.read.parquet(out)
    val batch = SparkEntry.queries("compact_changelog")(spark, sf)
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(streamed).count() === 0L)
  }

  test("streaming compaction matches the batch compact_changelog") {
    val streamed = StreamingOps.runToMemorySink(
      StreamingOps.compactStream(spark, sf), "stream_compact")
    val batch = SparkEntry.queries("compact_changelog")(spark, sf)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(streamed).count() === 0L)
  }

  test("streaming ingest dedup matches the batch dedup_incremental") {
    // the ingest-time twin: arriving delta docs anti-joined on the
    // standing digest index + within-stream min-id collapse must name
    // exactly the batch incremental form's surviving doc ids
    val streamed = StreamingOps.runToMemorySink(
      StreamingOps.dedupIngestStream(spark, sf), "stream_dedup_ing")
    val batch = SparkEntry.queries("dedup_incremental")(spark, sf)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(streamed).count() === 0L)
  }

  test("streaming decontamination matches the batch decontam_report") {
    val streamed = StreamingOps.runToMemorySink(
      StreamingOps.decontamStream(spark, sf), "stream_decontam")
    val batch = SparkEntry.queries("decontam_report")(spark, sf)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(streamed).count() === 0L)
  }

  test("streaming drift monitor matches the batch drift_report") {
    val streamed = SparkEntry.queries("streaming_drift")(spark, sf)
    val batch = SparkEntry.queries("drift_report")(spark, sf)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(streamed).count() === 0L)
  }

  test("streaming outlier flagging matches the batch outlier_mad") {
    val streamed = SparkEntry.queries("streaming_outlier")(spark, sf)
    val batch = SparkEntry.queries("outlier_mad")(spark, sf)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(streamed).count() === 0L)
  }

  test("streaming repetition strip matches the batch repetition_strip") {
    val streamed = SparkEntry.queries("streaming_strip")(spark, sf)
    val batch = SparkEntry.queries("repetition_strip")(spark, sf)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(streamed).count() === 0L)
  }

  test("streaming quality gate matches the batch quality_classifier") {
    val streamed = SparkEntry.queries("streaming_quality_gate")(spark, sf)
    val batch = SparkEntry.queries("quality_classifier")(spark, sf)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(streamed).count() === 0L)
  }

  test("streaming token counting matches the batch token_count_regex") {
    val streamed = SparkEntry.queries("streaming_token_count")(spark, sf)
    val batch = SparkEntry.queries("token_count_regex")(spark, sf)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(streamed).count() === 0L)
  }

  test("streaming IVF assignment matches the batch frozen-model argmin") {
    import graft.operators.{KMeansOps, SimilarityOps}
    val streamed = SparkEntry.queries("streaming_ivf_assign")(spark, sf)
    val dir = SimilarityOps.ensureIvfIndex(spark, sf)
    val cells = KMeansOps.collectCenters(
      spark.read.parquet(s"$dir/cells").orderBy(col("cell")), "cell", "cv")
    val batch = KMeansOps.points(spark, sf)
      .select(col("id"), KMeansOps.nearestCol(col("v"), cells).as("cell"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(streamed).count() === 0L)
  }

  test("streaming admission sampling matches the batch mix_sample") {
    val streamed = SparkEntry.queries("streaming_mix")(spark, sf)
    val batch = SparkEntry.queries("mix_sample")(spark, sf)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(streamed).count() === 0L)
  }

  test("streaming windowed top-k matches the ranked batch window counts") {
    val streamed = SparkEntry.queries("streaming_topk")(spark, sf)
    // batch twin: the same top-3-per-hour rank over the oracle-verified
    // batch time_window_agg counts (rank depends only on the counts the
    // two forms are already proven to share)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("hour_start"))
      .orderBy(col("n").desc, col("event_type"))
    val batch = SparkEntry.queries("time_window_agg")(spark, sf)
      .select((col("hour_bucket") * 3600).as("hour_start"),
        col("event_type"), col("n"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 3)
      .select(col("hour_start"), col("rnk"), col("event_type"), col("n"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(streamed).count() === 0L)
  }

  test("streaming phrase alerts match the batch hit relation") {
    import org.apache.spark.sql.functions._
    val streamed = SparkEntry.queries("streaming_phrase_hits")(spark, sf)
    // batch twin: the full per-(phrase, doc) hit relation (phrase_search
    // before its top-k cut), via the same shingler + phrase table
    val p = { import spark.implicits._
      graft.operators.RetrievalOps.PHRASES.toDF("phrase_id", "phrase") }
    val batch = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(concat(
        org.apache.spark.sql.graft.WordShingles.all(col("text"), 2),
        org.apache.spark.sql.graft.WordShingles.all(col("text"), 3)))
        .as("g"))
      .join(broadcast(p), col("g") === col("phrase"))
      .groupBy(col("phrase_id"), col("phrase"), col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
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
