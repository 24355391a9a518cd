package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Fixture-drift guard (round-11 postmortem): the driver regenerated
  * /root/testdata mid-round and `events.ts` silently switched encoding from
  * parquet TIMESTAMP(NANOS)-as-long to timestamp[us] — 15 queries died.
  * [[Tables.events]] now normalizes every encoding to ONE canonical
  * contract (`ts` = epoch-nanos long); this spec writes the same rows under
  * each encoding a lake writer could plausibly produce and asserts the
  * canonical view is bit-identical over all of them, so the NEXT encoding
  * flip fails here under `sbt test` instead of at the driver's gate.
  */
class TablesSpec extends SparkSpec {

  // sub-millisecond instants so a µs/ns slip can't hide behind round values
  private val micros = Seq(1704067798778549L, 1704068166738090L,
    1706000000000001L)

  private def rows = micros.zipWithIndex.map { case (us, i) =>
    (i.toLong, us, 100L + i, s"type$i", i * 1.5, "{}")
  }

  /** Write a tiny events fixture dir whose ts column is produced by
    * `tsCol` (from the epoch-µs long), return the dir. */
  private def fixture(tag: String, tsCol: org.apache.spark.sql.Column)
      : String = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft-tables-$tag").toString
    rows.toDF("event_id", "ts_src", "user_id", "event_type", "value", "props")
      .select(col("event_id"), tsCol.as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("events.ts canonical contract is identical across lake encodings") {
    // NOTE (round-12 ADVICE): the "nanos" leg writes a plain INT64 —
    // Spark cannot WRITE a TIMESTAMP(NANOS) logical type, so this leg
    // covers only the unannotated-long arrival. The real annotated
    // encoding is covered by the pyarrow-written committed resource in
    // the 'TIMESTAMP(NANOS) annotated parquet' test below.
    val asNanosLong = fixture("nanos", (col("ts_src") * 1000L).cast(LongType))
    val asMicrosTs = fixture("uts", timestamp_micros(col("ts_src")))
    // TIMESTAMP(MICROS, isAdjustedToUTC=false) — the round-11 driver
    // encoding that killed 15 queries (arrives NTZ unless the loader
    // forces TimestampType)
    val asMicrosNtz = fixture("ntz",
      timestamp_micros(col("ts_src")).cast("timestamp_ntz"))
    val canon = Seq(asNanosLong, asMicrosTs, asMicrosNtz).map { dir =>
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType === LongType,
        s"canonical ts must be epoch-nanos long (dir $dir)")
      ev.select(col("event_id"), col("ts")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val expected = micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us * 1000L) }.toSet
    canon.foreach(got => assert(got === expected))
  }

  test("TIMESTAMP(NANOS) annotated parquet reads through the canonical contract") {
    // a REAL TIMESTAMP(NANOS, isAdjustedToUTC=false) file (pyarrow-written
    // committed resource — Spark cannot write this logical type itself, so
    // the encoding-sweep test above can only fake it with a plain INT64;
    // round-12 ADVICE). nanosAsLong must surface it as the raw epoch-nanos
    // long, i.e. the LongType branch for the annotated case.
    val dir = getClass.getResource("/events-nanos-fixture").getPath
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType === LongType)
    val got = ev.select(col("event_id"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us * 1000L) }.toSet
    assert(got === expected)
  }

  test("NTZ branch is session-zone-proof (field arithmetic, not a zone cast)") {
    // drives normalizeEventsTs' TimestampNTZ branch directly — unreachable
    // through events() while its conf pin holds — under a NON-UTC session
    // zone: the old to_utc_timestamp(ntz,'UTC') form resolved the implicit
    // NTZ→Timestamp cast through the session zone and would come back
    // offset by 8h here (round-12 ADVICE).
    val wall = "2024-01-01 00:09:58.778549"
    val inst = java.time.LocalDateTime.parse(wall.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC)
    val expectedNs = inst.getEpochSecond * 1000000000L + inst.getNano
    val prior = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try {
      val df = spark.range(1)
        .select(col("id").as("event_id"),
          to_timestamp_ntz(lit(wall)).as("ts"))
      val out = Tables.normalizeEventsTs(df)
      assert(out.schema("ts").dataType === LongType)
      assert(out.head().getLong(1) === expectedNs,
        "NTZ wall clock did not land on its as-UTC epoch under a non-UTC zone")
    } finally spark.conf.set("spark.sql.session.timeZone", prior)
  }

  test("the shipped events fixture arrives in canonical nanos") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType === LongType)
    val bounds = ev.agg(min(col("ts")), max(col("ts"))).head()
    // epoch-nanos magnitude: 2001-09 (1e18) .. 2262 (long max); a raw µs
    // leak would sit 1000× below the floor, a double-scaled value above
    assert(bounds.getLong(0) > 1000000000000000000L,
      s"min ts ${bounds.getLong(0)} is not epoch-nanos — encoding drift?")
    assert(bounds.getLong(1) < Long.MaxValue / 2)
  }

  test("streaming landing stage carries the canonical contract") {
    // the staged landing file must hold canonical nanos REGARDLESS of the
    // fixture's own encoding — round 11's raw file-copy staging shipped
    // the new µs encoding into a schema declaring nanos and four
    // streaming queries silently computed 1000×-compressed timestamps
    val dir = fixture("stage", timestamp_micros(col("ts_src")))
    val staged = graft.streaming.StreamingOps.stageDir(spark, dir, "events")
    try {
      val got = spark.read
        .schema(graft.streaming.StreamingOps.eventsSchema).parquet(staged)
        .select(col("event_id"), col("ts")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = micros.zipWithIndex
        .map { case (us, i) => (i.toLong, us * 1000L) }.toSet
      assert(got === expected)
      // multi-file landing (round-14 verdict item 6): a coalesce(1) dir
      // makes every micro-batch a 1-task scan; the row compare above
      // would still pass, so pin the shard layout itself
      val parts = java.nio.file.Files.list(java.nio.file.Paths.get(staged))
      val nParts =
        try parts.filter(_.getFileName.toString.endsWith(".parquet")).count()
        finally parts.close()
      assert(nParts > 1L,
        s"landing dir staged $nParts parquet files — micro-batches " +
          "degenerate to single-task scans")
    } finally {
      // the temp fixture's basename is unique per run, so its staged copy
      // can never be reused — sweep both or target/stream-fixtures grows
      // by one dir per sbt test run
      graft.sources.Staging.deleteRecursively(
        java.nio.file.Paths.get(staged).getParent)
      graft.sources.Staging.deleteRecursively(java.nio.file.Paths.get(dir))
    }
  }
}
