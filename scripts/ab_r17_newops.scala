// Round-17 paired scaling: the session's new operators at their scaled
// fixtures. Run via:
//   sbt -batch package && /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.codegen.cache.maxEntries=5000 \
//     --jars target/scala-2.13/apachebeamkmeansspark_2.13-0.1.0.jar \
//     -I scripts/ab_r17_newops.scala
// Prereqs: scripts/build_scale_fixtures.scala (scale-test15 64x docs,
// scale-test15-emb8 8x embeddings). Results recorded in BASELINE.md
// (paired median-of-3 noop writes, JIT/codegen + one-off index ETL
// warmup untimed).
val SF = "/root/testdata/sf0.1"
val PAIRS = Seq(
  ("dedup_paragraph", "target/scale-test15", "64x"),
  ("dedup_paragraph_apply", "target/scale-test15", "64x"),
  ("dedup_paragraph_incremental", "target/scale-test15", "64x"),
  ("quality_classifier_train", "target/scale-test15", "64x"),
  ("quality_classifier_learned", "target/scale-test15", "64x"),
  ("gopher_rules", "target/scale-test15", "64x"),
  ("bpe_train_unicode", "target/scale-test15", "64x"),
  ("streaming_quality_gate", "target/scale-test15", "64x"),
  ("knn_density", "target/scale-test15-emb8", "8x"),
  ("knn_density_scaled", "target/scale-test15-emb8", "8x"))
def run(q: String, dir: String): Double = {
  val t0 = System.nanoTime
  graft.SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
  (System.nanoTime - t0) / 1e9
}
PAIRS.foreach { case (q, big, _) => run(q, SF); run(q, big) }
def med3(q: String, dir: String): Double = {
  val ts = (1 to 3).map(_ => run(q, dir)).sorted
  ts(1)
}
for ((q, big, tag) <- PAIRS) {
  val a = med3(q, SF)
  val b = med3(q, big)
  println(f"PAIR17 $q%-28s sf0.1=$a%6.2fs $tag%s=$b%7.2fs ratio=${b / a}%5.2fx")
}
sys.exit(0)
