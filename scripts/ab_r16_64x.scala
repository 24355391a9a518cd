// Round-16 64× paired scaling (verdict item 4) — the heaviest shuffle
// shapes the 64× table did not yet cover: the dedup banding family under
// 64× duplication pressure, the range-partitioned exact quantiles, and
// one IVF probe at 64× vector volume. Run via:
//   sbt -batch package && /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.codegen.cache.maxEntries=5000 \
//     --jars target/scala-2.13/apachebeamkmeansspark_2.13-0.1.0.jar \
//     -I scripts/ab_r16_64x.scala
// Prereqs:
//   target/scale-test15          64× documents (doc_id + r*1e6, r15)
//   target/scale-test16-li64     64× lineitem (l_orderkey + r*6e6)
//   target/scale-test16-emb64    64× embeddings (vec_id + r*1e7)
// Results recorded in BASELINE.md (paired median-of-3 noop writes,
// JIT/codegen warmup pass untimed; IVF's one-off index-build ETL for the
// 64× dir happens during warmup, matching the build≠probe contract).
val SF = "/root/testdata/sf0.1"
val PAIRS = Seq(
  ("dedup_minhash", "target/scale-test15"),
  ("dedup_cascade", "target/scale-test15"),
  ("percentile_agg", "target/scale-test16-li64"),
  ("quantile_profile", "target/scale-test16-li64"),
  ("sim_topk_ivf", "target/scale-test16-emb64"))
def run(q: String, dir: String): Double = {
  val t0 = System.nanoTime
  graft.SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
  (System.nanoTime - t0) / 1e9
}
// JIT/codegen + one-off layout warmup (not timed)
PAIRS.foreach { case (q, big) => run(q, SF); run(q, big) }
def med3(q: String, dir: String): Double = {
  val ts = (1 to 3).map(_ => run(q, dir)).sorted
  ts(1)
}
for ((q, big) <- PAIRS) {
  val a = med3(q, SF)
  val b = med3(q, big)
  println(f"PAIR64 $q%-18s sf0.1=$a%6.2fs 64x=$b%7.2fs ratio=${b / a}%5.2fx")
}
sys.exit(0)
