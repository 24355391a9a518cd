package graft.operators

import graft.functions.VectorOps._
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Flagship MLlib path (SURVEY.md §7 step 4): the reference's whole program
  * family collapses into `ml.clustering.KMeans`, which internalizes the
  * Lloyd loop as `treeAggregate` of per-partition sufficient statistics —
  * the exact rebuild topology of [[KMeansOps.lloyd]], hardened for clusters
  * (`initMode` maps the reference's seeding strategies: random →"random",
  * ++/farthest → "k-means||", the Bahmani et al. scalable variant).
  */
object MLlibKMeans {

  /** `initMode` carries the SURVEY §7 step-4 seeding mapping: the
    * reference's `takeSample` seeding → "random", its ++/farthest family →
    * "k-means||" (Bahmani et al.'s scalable k-means++ — the distributed
    * form of the same D²-weighted idea). */
  def fit(spark: SparkSession, sfDir: String, k: Int,
      maxIter: Int = 20, seed: Long = 42L,
      initMode: String = "k-means||"): DataFrame = {
    val pts = KMeansOps.points(spark, sfDir)
      .select(col("id"), array_to_vector(col("v")).as("features"))
    val model = new KMeans()
      .setK(k).setSeed(seed).setMaxIter(maxIter).setTol(1e-4)
      .setInitMode(initMode)
      .setFeaturesCol("features").setPredictionCol("cluster_id")
      .fit(pts)
    model.transform(pts)
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_points"))
      .select(col("n_points"))            // cluster ids are seed-dependent;
      .orderBy(col("n_points").desc)      // the size profile is the stable part
  }

  /** Within-set sum of squared distances of a fit at the given init mode —
    * the cross-check scalar KMeansSpec compares against [[KMeansOps.lloyd]]. */
  def fitCost(spark: SparkSession, sfDir: String, k: Int,
      initMode: String, maxIter: Int = 20, seed: Long = 42L): Double = {
    val pts = KMeansOps.points(spark, sfDir)
      .select(array_to_vector(col("v")).as("features"))
    new KMeans()
      .setK(k).setSeed(seed).setMaxIter(maxIter).setTol(1e-4)
      .setInitMode(initMode).setFeaturesCol("features")
      .fit(pts).summary.trainingCost
  }
}
