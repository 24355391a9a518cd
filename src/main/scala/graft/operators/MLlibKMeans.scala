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

  def fit(spark: SparkSession, sfDir: String, k: Int,
      maxIter: Int = 20, seed: Long = 42L): DataFrame = {
    val pts = KMeansOps.points(spark, sfDir)
      .select(col("id"), array_to_vector(col("v")).as("features"))
    val model = new KMeans()
      .setK(k).setSeed(seed).setMaxIter(maxIter).setTol(1e-4)
      .setFeaturesCol("features").setPredictionCol("cluster_id")
      .fit(pts)
    model.transform(pts)
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_points"))
      .select(col("n_points"))            // cluster ids are seed-dependent;
      .orderBy(col("n_points").desc)      // the size profile is the stable part
  }
}
