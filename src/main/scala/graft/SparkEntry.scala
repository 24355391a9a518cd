package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 appears as a named query; each
  * SQL-expressible one has a DuckDB oracle in [[oracleSql]] with *matching
  * column names and types* (the driver sorts columns by name before
  * hashing). Non-SQL-expressible ops (iterative seeding, MLlib fit, sketch
  * pipelines) get a rows-only check.
  */
object SparkEntry {

  /** Flagship query; driver smoke-checks rows>0. Full Lloyd K-Means
    * (deterministic init, k=8) over the embeddings table → per-cluster
    * size + RMS distance. Defaults to the driver's smoke fixture
    * (sf0.001); `SPARK_GRAFT_SF_DIR` points it at any other sfDir. */
  def entry(spark: SparkSession): DataFrame =
    KMeansOps.queries("kmeans_lloyd")(spark,
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    KMeansOps.queries ++ RelationalOps.queries ++ DedupOps.queries ++
      SimilarityOps.queries ++ TextOps.queries ++ MultimodalOps.queries ++
      PipelineOps.queries ++ RetrievalOps.queries ++
      graft.sources.TextIO.queries ++ graft.sources.StorageOps.queries ++
      graft.streaming.StreamingOps.queries

  /** Bench-only plans (timed by [[Bench]], NOT part of the driver's
    * correctness contract): the production sketch-only projections whose
    * declared siblings carry in-plan exact-verification gates, and the
    * IVF index-build ETL timed apart from its probe queries. */
  def benchOnly: Map[String, (SparkSession, String) => DataFrame] =
    RelationalOps.benchOnly ++ SimilarityOps.benchOnly

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    KMeansOps.oracles ++ RelationalOps.oracles ++ DedupOps.oracles ++
      SimilarityOps.oracles ++ TextOps.oracles ++ MultimodalOps.oracles ++
      PipelineOps.oracles ++ RetrievalOps.oracles ++
      graft.sources.TextIO.oracles ++ graft.sources.StorageOps.oracles ++
      graft.streaming.StreamingOps.oracles
}
