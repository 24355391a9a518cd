package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming counterpart of the batch time-window aggregation
  * (`RelationalOps.time_window_agg`): `readStream` over the events parquet →
  * watermark → tumbling window → count/sum, plus a stateful
  * sessionization example.
  *
  * The reference has no streaming surface (SURVEY.md §1.1 "no streams");
  * this is the rebuild's scale path for continuous ingestion. Batch
  * `window()` is the oracle-verified form; these streaming plans share the
  * identical aggregation expressions so the semantics are the batch ones +
  * watermark-bounded state.
  */
object StreamingOps {

  /** Events schema when read as a stream: `ts` arrives as epoch-nanos long
    * (see [[graft.Tables.table]]) and is converted to a real timestamp. */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Spark's file-stream source lists a *directory*; the fixture is a single
    * parquet file. Stage a hard copy under target/ once per sfDir (a real
    * deployment streams from a landing directory anyway — this mirrors that
    * layout without touching the read-only fixtures). */
  def stageDir(sfDir: String, table: String): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val sfName = Paths.get(sfDir).getFileName.toString
    val dir = Paths.get(s"target/stream-fixtures/$sfName/$table")
    val dst = dir.resolve(s"$table.parquet")
    if (!Files.exists(dst)) {
      Files.createDirectories(dir)
      Files.copy(Paths.get(s"$sfDir/$table.parquet"), dst,
        StandardCopyOption.REPLACE_EXISTING)
    }
    dir.toString
  }

  /** Streaming tumbling 1h window per event_type with a 2h watermark. */
  def windowedCounts(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(eventsSchema)
      .parquet(stageDir(sfDir, "events"))
      .withColumn("tstamp", timestamp_micros(expr("ts div 1000")))
      .withWatermark("tstamp", "2 hours")
      .groupBy(window(col("tstamp"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("hour_start"),
        col("event_type"), col("n"), col("sum_value"))
  }

  /** Streaming gap-based sessionization: the same native `session_window`
    * aggregation as the batch `session_window_agg` query, with watermarked
    * state — sessions close (and emit) once the watermark passes their end.
    * Spark-first custom state: the built-in session-window operator replaces
    * a hand-rolled flatMapGroupsWithState for this shape. */
  def sessionCounts(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(eventsSchema)
      .parquet(stageDir(sfDir, "events"))
      .withColumn("tstamp", timestamp_micros(expr("ts div 1000")))
      .withWatermark("tstamp", "4 hours")
      .groupBy(col("user_id"), session_window(col("tstamp"), "2 hours"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("sess_start"),
        col("n_events"), col("sum_value"))
  }

  /** Streaming exact dedup: `dropDuplicatesWithinWatermark` on the event id
    * — the streaming form of `dedup_exact`'s digest-groupBy. State holds
    * one key per id and the watermark bounds its lifetime (an unbounded
    * `dropDuplicates` would accumulate state forever on a real stream). */
  def dedupStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(eventsSchema)
      .parquet(stageDir(sfDir, "events"))
      .withColumn("tstamp", timestamp_micros(expr("ts div 1000")))
      .withWatermark("tstamp", "24 hours")
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("user_id"), col("event_type"))
  }

  /** Stream-static enrichment: the event stream joined to a static
    * broadcast-sized dimension (per-user event counts from the batch
    * table — stand-in for any profile/catalog dim). The static side is
    * planned as a broadcast hash join per micro-batch; no stream-stream
    * state is involved, which is why this is the FIRST tool to reach for
    * before a stateful stream-stream join. */
  def enrichStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val userDim = graft.Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("user_total_events"))
    spark.readStream.schema(eventsSchema)
      .parquet(stageDir(sfDir, "events"))
      .join(org.apache.spark.sql.functions.broadcast(userDim), "user_id")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("user_total_events"))
  }

  /** Run a streaming query to completion against the (finite) fixture and
    * return the materialized result — used by tests to check
    * stream/batch equivalence. */
  def runToMemorySink(df: DataFrame, name: String): DataFrame = {
    val q = df.writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.table(name)
  }
}
