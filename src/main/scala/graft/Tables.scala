package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark 4 refuses by
    * default; read it as epoch-nanos long (runtime-settable legacy conf) and
    * convert explicitly where timestamp semantics are needed.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
