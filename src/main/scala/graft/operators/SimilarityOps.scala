package graft.operators

import graft.Tables
import graft.functions.VectorOps._
import graft.functions.VectorSql
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the embedding column.
  *
  * Reference ancestor: the broadcast nearest-centroid argmin
  * (`/root/reference/SparKMeansGroupBy.java:77-98`) — generalized from
  * "1 nearest of k centers" to "top-k nearest of n vectors for q queries".
  *
  * Two paths:
  *  - `similarity_topk`: brute-force cosine baseline. Queries are a small
  *    broadcast relation; sims are codegen'd HOF expressions; per-query
  *    top-k via window over the query id. Exact; oracle-checked.
  *  - `sim_topk_lsh`: scale path. Random-hyperplane LSH buckets (deterministic
  *    literal planes) shrink the candidate set to matching buckets before
  *    scoring — the candidate join is an equi-join on bucket id, so at 100 TB
  *    the crossJoin never happens.
  */
object SimilarityOps {

  private val NQ = 10 // fixed query set: vec_id < 10
  private val TOPK = 5
  private val NPLANES = 8

  /** Deterministic pseudo-random hyperplanes (integer-arithmetic formula —
    * reproducible anywhere, no RNG state). */
  def planes(dim: Int): Array[Array[Double]] =
    Array.tabulate(NPLANES) { b =>
      Array.tabulate(dim) { dd =>
        ((2654435761L * (b * dim + dd + 1)) % 1000003L).toDouble / 1000003.0 - 0.5
      }
    }

  /** Sign-bit bucket id of a vector column against the literal planes. */
  def bucketCol(v: Column, dim: Int): Column =
    planes(dim).zipWithIndex.map { case (p, b) =>
      when(dot(v, typedlit(p)) >= 0, shiftleft(lit(1), b)).otherwise(0)
    }.reduce(_ + _)

  private def queriesDf(s: SparkSession, d: String): DataFrame =
    KMeansOps.points(s, d).where(col("id") < NQ)
      .select(col("id").as("q_id"), col("v").as("qv"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "similarity_topk" -> { (s, d) =>
      val docs = KMeansOps.points(s, d)
      val sims = docs.crossJoin(broadcast(queriesDf(s, d)))
        .where(col("id") =!= col("q_id"))
        .select(col("q_id"), col("id").as("vec_id"),
          r4(cosine(col("v"), col("qv"))).as("sim"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("sim").desc, col("vec_id"))
      sims.withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= TOPK)
        .select(col("q_id"), col("vec_id"), col("rnk"), col("sim"))
    },
    "sim_topk_lsh" -> { (s, d) =>
      val docs = KMeansOps.points(s, d)
      val dim = 64
      val bucketed = docs
        .select(col("id"), col("v"), bucketCol(col("v"), dim).as("bucket"))
      val q = bucketed.where(col("id") < NQ)
        .select(col("id").as("q_id"), col("v").as("qv"),
          col("bucket").as("q_bucket"))
      val cands = bucketed.join(broadcast(q),
          col("bucket") === col("q_bucket") && col("id") =!= col("q_id"))
        .select(col("q_id"), col("id").as("vec_id"),
          r4(cosine(col("v"), col("qv"))).as("sim"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("sim").desc, col("vec_id"))
      cands.withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= TOPK)
        .select(col("q_id"), col("vec_id"), col("rnk"), col("sim"))
    },
    "dedup_embedding" -> { (s, d) =>
      // embedding-cosine near-dup: LSH bucket → within-bucket pairs → verify
      val dim = 64
      val bucketed = KMeansOps.points(s, d)
        .select(col("id"), col("v"), bucketCol(col("v"), dim).as("bucket"))
      val a = bucketed.select(col("id").as("id_a"), col("v").as("va"),
        col("bucket"))
      val b = bucketed.select(col("id").as("id_b"), col("v").as("vb"),
        col("bucket"))
      a.join(b, Seq("bucket")).where(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          r4(cosine(col("va"), col("vb"))).as("sim"))
        .where(col("sim") >= 0.3)
        .orderBy(col("id_a"), col("id_b"))
    }
  )

  val oracles: Map[String, String] = Map(
    "similarity_topk" ->
      s"""SELECT q_id, vec_id, rnk, sim FROM (
         |  SELECT q.vec_id AS q_id, d.vec_id AS vec_id,
         |         row_number() OVER (
         |           PARTITION BY q.vec_id
         |           ORDER BY round(${VectorSql.cosine("d.embedding", "q.embedding")}, 4) DESC,
         |                    d.vec_id)::INT AS rnk,
         |         round(${VectorSql.cosine("d.embedding", "q.embedding")}, 4) AS sim
         |  FROM embeddings d
         |  CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id < $NQ) q
         |  WHERE d.vec_id <> q.vec_id)
         |WHERE rnk <= $TOPK""".stripMargin
  )
}
