// A/B: AQE skew-join split vs manual hot-key salting (round-12 verdict
// item 7). Run with:
//   /opt/spark/bin/spark-shell --master 'local[8]' \
//     --jars target/scala-2.13/apachebeamkmeansspark_2.13-0.1.0.jar \
//     -I scripts/ab_skew_join.scala
// Constructed skew: SKEW_PCT% of probe rows share ONE key, the rest are
// uniform over 1M keys; build side is 1M keys (too big to broadcast —
// auto-broadcast is disabled for the run so the join is genuinely
// shuffled). Each variant runs the identical join+agg to a noop sink.
// Results land in /tmp/ab_skew_result.txt and BASELINE.md.
import org.apache.spark.sql.functions._
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
spark.conf.set("spark.sql.shuffle.partitions", "8")
val N = 20000000L
val KEYS = 1000000L
val HOT = 42L
def mkProbe(skewPct: Int) = spark.range(N).select(when(col("id") % 100 < skewPct, lit(HOT)).otherwise(pmod(col("id") * 2654435761L, lit(KEYS))).as("k"), (col("id") % 97).cast("double").as("v"))
val build = spark.range(KEYS).select(col("id").as("k"), concat(lit("status-"), col("id") % 5).as("s")).cache()
build.count()
def timeIt(tag: String)(df: => org.apache.spark.sql.DataFrame): (String, Double) = { val t0 = System.nanoTime(); df.write.mode("overwrite").format("noop").save(); val s = (System.nanoTime() - t0) / 1e9; println(f"$tag%-28s $s%8.2f s"); (tag, s) }
def plainJoin(skewPct: Int) = mkProbe(skewPct).join(build, "k").groupBy(col("s")).agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
def saltedJoin(skewPct: Int, R: Int) = { val p = mkProbe(skewPct).withColumn("salt", when(col("k") === HOT, pmod(monotonically_increasing_id(), lit(R)).cast("int")).otherwise(lit(0))); val b = build.withColumn("salts", when(col("k") === HOT, typedlit((0 until R).toArray)).otherwise(typedlit(Array(0)))).select(col("k"), col("s"), explode(col("salts")).as("salt")); p.join(b, Seq("k", "salt")).groupBy(col("s")).agg(count(lit(1)).as("n"), sum(col("v")).as("sv")) }
def withAqe(on: Boolean, skewSplit: Boolean)(body: => (String, Double)): (String, Double) = { spark.conf.set("spark.sql.adaptive.enabled", on.toString); spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewSplit.toString); spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m"); spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m"); spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"); body }
val out = new java.io.PrintWriter("/tmp/ab_skew_result.txt")
for (pct <- Seq(5, 30)) {
  println(s"=== skew: $pct% of ${N / 1000000}M probe rows on one key ===")
  out.println(s"skew_pct=$pct")
  val r1 = withAqe(on = false, skewSplit = false) { timeIt(s"plain (no AQE)")(plainJoin(pct)) }
  val r2 = withAqe(on = true, skewSplit = true) { timeIt(s"AQE skew split (8m thresh)")(plainJoin(pct)) }
  val r3 = withAqe(on = false, skewSplit = false) { timeIt(s"manual salt R=8")(saltedJoin(pct, 8)) }
  val r4 = withAqe(on = true, skewSplit = true) { timeIt(s"salt R=8 + AQE")(saltedJoin(pct, 8)) }
  Seq(r1, r2, r3, r4).foreach { case (t, s) => out.println(f"  $t%-28s $s%.2f") }
}
out.close()
println("wrote /tmp/ab_skew_result.txt")
sys.exit(0)
