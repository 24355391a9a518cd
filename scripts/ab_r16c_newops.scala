// Round-16-continuation paired scaling: the session's new operators at
// their scaled fixtures. Run via:
//   sbt -batch package && /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.codegen.cache.maxEntries=5000 \
//     --jars target/scala-2.13/apachebeamkmeansspark_2.13-0.1.0.jar \
//     -I scripts/ab_r16c_newops.scala
// Prereqs: scripts/build_scale_fixtures.scala (scale-test14 + -emb8).
// Results recorded in BASELINE.md (paired median-of-3 noop writes,
// JIT/codegen + one-off index ETL warmup untimed).
val SF = "/root/testdata/sf0.1"
val PAIRS = Seq(
  ("perplexity_buckets", "target/scale-test14"),
  ("lm_eval", "target/scale-test14"),
  ("epoch_plan", "target/scale-test14"),
  ("streaming_topk", "target/scale-test14"),
  ("knn_graph", "target/scale-test15-emb8"),
  ("knn_graph_scaled", "target/scale-test15-emb8"),
  ("knn_components", "target/scale-test15-emb8"),
  ("dedup_embedding_incremental", "target/scale-test15-emb8"))
def run(q: String, dir: String): Double = {
  val t0 = System.nanoTime
  graft.SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
  (System.nanoTime - t0) / 1e9
}
PAIRS.foreach { case (q, big) => run(q, SF); run(q, big) }
def med3(q: String, dir: String): Double = {
  val ts = (1 to 3).map(_ => run(q, dir)).sorted
  ts(1)
}
for ((q, big) <- PAIRS) {
  val a = med3(q, SF)
  val b = med3(q, big)
  println(f"PAIRC $q%-28s sf0.1=$a%6.2fs 8x=$b%7.2fs ratio=${b / a}%5.2fx")
}
// cap behavior at 8x embeddings: how many cells the fixed-k graph loses
val asgDir = graft.operators.SimilarityOps.ensureIvfIndex(spark, "target/scale-test15-emb8")
val over = spark.read.parquet(asgDir + "/vectors").groupBy("cell").count().where(org.apache.spark.sql.functions.col("count") > 1000).count()
println(s"CAPPED_CELLS_8X=$over/16")
sys.exit(0)
