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
