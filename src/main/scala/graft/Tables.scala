package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture-table loaders (TESTDATA.md).
  *
  * All engine queries take an `sfDir` and read driver-generated parquet.
  * This replaces the reference's line-oriented text scans
  * (`/root/reference/SparKMeansGroupBy.java:66`,
  * `/root/reference/BeamKmeansSideInput.java:70`) with a columnar source so
  * Catalyst gets pushdown/pruning for free — at 100 TB the scan is the
  * dominant cost and parquet + pruned `ReadSchema` is the only sane format.
  */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** The events table with ONE canonical timestamp contract regardless of
    * how the lake encoded it: `ts` is an epoch-NANOS long. A real lake
    * accumulates every encoding a writer ever used — this loader has seen
    * three in the fixtures alone (parquet TIMESTAMP(NANOS) read as raw
    * long, TIMESTAMP(MICROS, adjustedToUTC=true) → TimestampType,
    * TIMESTAMP(MICROS, adjustedToUTC=false) → TimestampNTZ) — so the read
    * branches on the ARRIVED Spark type and normalizes, and every consumer
    * (batch windows, as-of joins, streaming staging, jsonl export) codes
    * against the single contract. Round 11 hard-coded the nanos-long
    * encoding and 15 queries died when the fixtures switched to µs; the
    * DuckDB oracles (`epoch_ns(ts)`) were adaptive all along, which is the
    * behavior this restores on the Spark side.
    *
    * Both confs below only affect how the parquet footer's timestamp
    * LOGICAL type maps to a Spark type at read time and are no-ops for
    * non-timestamp columns:
    *  - `nanosAsLong`: Spark 4 refuses TIMESTAMP(NANOS) outright without
    *    it; with it the column arrives as a raw epoch-nanos long.
    *  - `inferTimestampNTZ.enabled=false`: an `isAdjustedToUTC=false` µs
    *    column would otherwise arrive as TimestampNTZ, whose conversion to
    *    an epoch instant depends on the session time zone — forced to
    *    TimestampType, the stored int64 IS epoch-µs and `unix_micros` is
    *    timezone-independent, so Bench/Verify/tests agree bit-for-bit with
    *    DuckDB's naive `epoch_ns` no matter the host zone.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // SESSION-GLOBAL side effect, by necessity (round-12 ADVICE): both
    // confs are read-path logical-type mappings with no per-read
    // DataSource option equivalent (ParquetOptions exposes only rebase/
    // compression/mergeSchema), and a set-read-restore dance would be
    // unsafe — the mapping is re-consulted from the captured session conf
    // at EXECUTION time, after any restore. They are no-ops for
    // non-timestamp columns; in a caller-managed session their visible
    // effect is that other parquet reads after the first events() access
    // see TIMESTAMP(NANOS) as long and µs-NTZ as TimestampType — i.e.
    // exactly this loader's canonical-encoding stance, applied globally.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    // `graft.eventsDir` is the BENCH-ONLY scan-layout override, the
    // events twin of `graft.lineitemDir` below (r21 optimization): the
    // driver fixture is one ~2 MB row group — a 1-task scan that
    // serializes every events consumer's first stage. Bench stages a
    // row-identical multi-file copy (written through THIS loader, so the
    // ts column lands pre-normalized as epoch-nanos long and the
    // normalization below passes it through). Verify/tests never set it —
    // the oracle path always reads the fixture bytes; content is
    // identical either way, only the file split changes.
    sys.props.get("graft.eventsDir") match {
      case Some(dir) => normalizeEventsTs(spark.read.parquet(dir))
      case None =>
        normalizeEventsTs(spark.read.parquet(s"$sfDir/events.parquet"))
    }
  }

  /** Normalize an events frame's `ts` to the canonical epoch-nanos long,
    * whatever Spark type the parquet mapping produced. Split from
    * [[events]] so the NTZ branch is spec-testable without re-enabling
    * NTZ inference session-wide (TablesSpec drives it on a synthetic NTZ
    * column under a non-UTC session zone). */
  private[graft] def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df // legacy TIMESTAMP(NANOS) read as epoch-nanos long
      case TimestampType =>
        df.withColumn("ts", toNanos(unix_micros(col("ts"))))
      case TimestampNTZType =>
        // defensive: unreachable while the NTZ-inference conf in [[events]]
        // holds, but a caller-managed session could re-enable it. NTZ
        // carries no zone and DuckDB's epoch_* treat the wall clock as
        // UTC — so compute epoch-µs from the wall-clock FIELDS, zone-free.
        // (to_utc_timestamp(ntz, 'UTC') is NOT that: the implicit
        // NTZ→Timestamp cast resolves through the SESSION zone and the
        // 'UTC' shift is then a no-op, leaving the session offset baked
        // in — round-12 ADVICE.)
        df.withColumn("ts", toNanos(ntzEpochMicrosUtc(col("ts"))))
      case other => throw new IllegalStateException(
        s"events.ts arrived as unsupported type $other — extend " +
          "graft.Tables.events' normalization for this encoding")
    }

  /** Epoch-µs of an NTZ wall clock interpreted as UTC, via field
    * arithmetic only (`unix_date` of the wall date + µs-of-day) — every
    * term reads NTZ fields directly, so no session-zone cast can leak in
    * and DST transitions of the host zone are irrelevant. */
  private[graft] def ntzEpochMicrosUtc(ntz: Column): Column =
    unix_date(ntz.cast(DateType)).cast(LongType) * lit(86400000000L) +
      hour(ntz).cast(LongType) * lit(3600000000L) +
      minute(ntz).cast(LongType) * lit(60000000L) +
      // SECOND is the finest extract field (Decimal(8,6), exact µs
      // fraction); the decimal×1e6 product is exact before the long cast
      (date_part(lit("SECOND"), ntz) * lit(1000000)).cast(LongType)

  /** µs → canonical nanos. 2262 (long-nanos overflow) is out of fixture
    * range; the multiply is exact for any realistic instant. */
  private def toNanos(us: Column): Column = (us * lit(1000L)).cast(LongType)

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  /** `graft.lineitemDir` is a BENCH-ONLY scan-layout override (round-12
    * verdict item 4): the driver fixture writes lineitem as one ~13.6 MB
    * row group, an unsplittable 1-task scan that amplifies host
    * contention 4-10× and has been BASELINE.md's recurring false
    * "regression" mechanism. Bench stages a row-identical multi-file
    * copy (fingerprint-keyed under target/) and points this property at
    * it so lineitem scans parallelize like they would on any real lake
    * layout. Verify/tests never set it — the oracle path always reads
    * the fixture bytes; content is identical either way, only the file
    * split changes. */
  def lineitem(s: SparkSession, d: String): DataFrame =
    sys.props.get("graft.lineitemDir")
      .map(s.read.parquet(_))
      .getOrElse(table(s, d, "lineitem"))
  /** documents/embeddings/orders get the same BENCH-ONLY multi-file
    * override (r21): each fixture is one row group, and its 1-task scan
    * SERIALIZES every compute-heavy branch reading it — the pipeline
    * family's curate DAG re-scans documents on 4-5 branches, each a
    * 0.3-0.5 s single-thread job at sf0.1 (Probe breakdown,
    * OPTIMIZATION_r21.md). Row-identical copies, split across `cpus`
    * files; Verify/tests never set the props so the oracle path always
    * reads the fixture bytes. */
  def orders(s: SparkSession, d: String): DataFrame =
    sys.props.get("graft.ordersDir")
      .map(s.read.parquet(_))
      .getOrElse(table(s, d, "orders"))
  def documents(s: SparkSession, d: String): DataFrame =
    sys.props.get("graft.documentsDir")
      .map(s.read.parquet(_))
      .getOrElse(table(s, d, "documents"))
  def embeddings(s: SparkSession, d: String): DataFrame =
    sys.props.get("graft.embeddingsDir")
      .map(s.read.parquet(_))
      .getOrElse(table(s, d, "embeddings"))
}
