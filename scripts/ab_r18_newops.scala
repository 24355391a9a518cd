// Round-18 paired scaling: the new-operator batch at its scaled fixtures.
// Run via:
//   sbt -batch package && /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.codegen.cache.maxEntries=5000 \
//     --jars target/scala-2.13/apachebeamkmeansspark_2.13-0.1.0.jar \
//     -I scripts/ab_r18_newops.scala
// Prereqs: scripts/build_scale_fixtures.scala (scale-test15 64x docs,
// scale-test15-emb8 8x embeddings). Results recorded in BASELINE.md
// (paired median-of-3 noop writes, JIT/codegen + one-off index/layout
// ETL warmup untimed; ivf_index_refresh's 8x pair warms the emb8
// build/delete/delta/refresh staging outside the timings like every
// IVF query).
val SF = "/root/testdata/sf0.1"
val PAIRS = Seq(
  ("bpe_train_regex", "target/scale-test15", "64x"),
  ("token_count_regex", "target/scale-test15", "64x"),
  ("pretokenize_gpt2", "target/scale-test15", "64x"),
  ("shard_manifest", "target/scale-test15", "64x"),
  ("ivf_index_refresh", "target/scale-test15-emb8", "8x"))
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
  println(f"PAIR18 $q%-22s sf0.1=$a%6.2fs $tag%s=$b%7.2fs ratio=${b / a}%5.2fx")
}
sys.exit(0)
