// Round-16 new-operator paired scaling: pack_binpack / repetition_strip /
// multimodal_topk at the 8× fixture, multimodal_topk additionally at the
// 64× documents fixture (its corpus side is the one that scales; the
// query side is a broadcast literal set). Run via:
//   sbt -batch package && /opt/spark/bin/spark-shell --master 'local[32]' \
//     --driver-memory 24g --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.codegen.cache.maxEntries=5000 \
//     --jars target/scala-2.13/apachebeamkmeansspark_2.13-0.1.0.jar \
//     -I scripts/ab_r16_newops.scala
// Results recorded in BASELINE.md (paired median-of-3 noop writes,
// warmup untimed).
val SF = "/root/testdata/sf0.1"
val PAIRS = Seq(
  ("pack_binpack", "target/scale-test14"),
  ("repetition_strip", "target/scale-test14"),
  ("multimodal_topk", "target/scale-test14"),
  ("multimodal_topk", "target/scale-test15"))
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
  val label = if (big.endsWith("15")) "64x" else "8x"
  println(f"PAIRN $q%-18s sf0.1=$a%6.2fs $label=$b%7.2fs ratio=${b / a}%5.2fx")
}
sys.exit(0)
