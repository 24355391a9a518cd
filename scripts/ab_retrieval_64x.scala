// Retrieval-family 64× paired scaling (round 15, verdict item 9) — run via:
//   sbt -batch package && /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.codegen.cache.maxEntries=5000 \
//     --jars target/scala-2.13/apachebeamkmeansspark_2.13-0.1.0.jar \
//     -I scripts/ab_retrieval_64x.scala
// Prereq: target/scale-test15/documents.parquet (64 replicas of sf0.1
// documents, doc_id + r*1_000_000, 10k-row row groups — 32 splittable
// tasks). Measures median-of-3 noop-write wall for the retrieval family
// at sf0.1 vs 64× to pin that the broadcast side (query/phrase literal
// tables) stays flat while only corpus-side stages widen. Results
// recorded in BASELINE.md.
val SF = "/root/testdata/sf0.1"
val X64 = "target/scale-test15"
val FAM = Seq("bm25_topk", "phrase_search", "retrieval_eval", "rank_fusion")
def run(q: String, dir: String): Double = {
  val t0 = System.nanoTime
  graft.SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
  (System.nanoTime - t0) / 1e9
}
// JIT/codegen warmup (not timed)
FAM.foreach(run(_, SF))
def med3(q: String, dir: String): Double = {
  val ts = (1 to 3).map(_ => run(q, dir)).sorted
  ts(1)
}
for (q <- FAM) {
  val a = med3(q, SF)
  val b = med3(q, X64)
  println(f"PAIR64 $q%-16s sf0.1=$a%6.2fs 64x=$b%7.2fs ratio=${b / a}%5.2fx")
}
sys.exit(0)
