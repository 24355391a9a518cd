// Round-15 paired 8× scaling timings — run via:
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.codegen.cache.maxEntries=5000 \
//     --conf spark.ui.enabled=false \
//     --jars target/scala-2.13/apachebeamkmeansspark_2.13-0.1.0.jar \
//     -I scripts/ab_r15_8x.scala
// Prereqs: target/scale-test14 (round-14 8× fixture: docs/events/lineitem
// replicated, remapped keys) and target/scale-test15-emb8 (embeddings ×8,
// vec_id + r*1e7 so the IVF delta's +1e6 re-key cannot collide).
// Median-of-3 noop-write wall per (query, dir); bpe_train_bytes runs ONE
// rep per dir (64 genuine training trips — the trip count, not noise, is
// what's measured). Results recorded in BASELINE.md round-15 books.
val SF = "/root/testdata/sf0.1"
val D8 = "target/scale-test14"
val E8 = "target/scale-test15-emb8"
def run(q: String, dir: String): Double = {
  spark.catalog.clearCache()
  spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
  val t0 = System.nanoTime
  graft.SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
  (System.nanoTime - t0) / 1e9
}
def medN(q: String, dir: String, n: Int): Double = {
  val ts = (1 to n).map(_ => run(q, dir)).sorted
  ts(ts.size / 2)
}
// JIT/codegen warmup (not timed)
Seq("quality_classifier", "timeseries_fill", "token_count_learned_bytes").foreach(run(_, SF))
val plan: Seq[(String, String, Int)] = Seq(
  ("quality_classifier", D8, 3),
  ("token_count_learned_bytes", D8, 3),
  ("timeseries_fill", D8, 3),
  ("streaming_phrase_hits", D8, 3),
  ("ivf_index_incremental", E8, 3),
  ("kmeans_fit_frozen", E8, 3),
  ("bpe_train_bytes", D8, 1))
for ((q, big, n) <- plan) {
  val a = medN(q, SF, n)
  val b = medN(q, big, n)
  println(f"PAIR8 $q%-26s sf0.1=$a%7.2fs 8x=$b%7.2fs ratio=${b / a}%5.2fx reps=$n")
}
sys.exit(0)
