// Round-20 paired scaling: the new-operator batch at its scaled fixtures.
// Run via:
//   sbt -batch package && /opt/spark/bin/spark-shell --master 'local[32]' \
//     --driver-memory 24g \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.codegen.cache.maxEntries=5000 \
//     --jars target/scala-2.13/apachebeamkmeansspark_2.13-0.1.0.jar \
//     -I scripts/ab_r20_newops.scala
// Prereqs: scripts/build_scale_fixtures.scala (scale-test15 64x docs,
// scale-test16-li64 64x lineitem, scale-test16-emb64 64x embeddings).
// Results recorded in BASELINE.md (paired median-of-3 noop writes;
// JIT/codegen + one-off index/layout/export staging ETL warmed by the
// first untimed pass, so the timings measure the declared query — the
// probe/read-back/plan — not the ensure* staging it rides on).
val SF = "/root/testdata/sf0.1"
val PAIRS = Seq(
  ("pack_epochs", "target/scale-test15", "64x docs"),
  ("pack_epochs_files", "target/scale-test15", "64x docs"),
  ("export_incremental", "target/scale-test15", "64x docs"),
  ("decontam_fuzzy", "target/scale-test15", "64x docs"),
  ("tokenizer_vocab_sweep", "target/scale-test15", "64x docs"),
  ("layout_vacuum", "target/scale-test15", "64x docs"),
  ("join_bucketed_rebucket", "target/scale-test16-li64", "64x li"),
  ("join_skew_aqe", "target/scale-test16-li64", "64x li"),
  ("bm25_incremental", "target/scale-test15", "64x docs"),
  ("ivf_cell_split", "target/scale-test16-emb64", "64x emb"),
  ("ivf_cell_merge", "target/scale-test16-emb64", "64x emb"),
  ("knn_pagerank", "target/scale-test16-emb64", "64x emb"))
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
  println(f"PAIR20 $q%-22s sf0.1=$a%6.2fs $tag%s=$b%7.2fs ratio=${b / a}%5.2fx")
}
sys.exit(0)
