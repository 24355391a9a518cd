// Rebuild the paired-scaling fixtures under target/ (they are build
// artifacts, wiped with target/ — this script recreates them from the
// read-only sf0.1 fixtures per the BASELINE.md conventions). Run via:
//   sbt -batch package && /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.sql.shuffle.partitions=32 \
//     --jars target/scala-2.13/apachebeamkmeansspark_2.13-0.1.0.jar \
//     -I scripts/build_scale_fixtures.scala
// Layouts:
//   target/scale-test14       8× documents (doc_id + r·1e6), 8× events
//                             (event_id/user_id + r·1e6), 8× lineitem
//                             (l_orderkey + r·6e6); other tables linked
//   target/scale-test15       64× documents (doc_id + r·1e6)
//   target/scale-test15-emb8  8× embeddings (vec_id + r·1e7)
//   target/scale-test16-li64  64× lineitem (l_orderkey + r·6e6)
//   target/scale-test16-emb64 64× embeddings (vec_id + r·1e7)
// Keys remap per replica so id-keyed joins/windows scale with volume;
// timestamps and payloads are byte-identical per replica (duplication
// pressure is the point for the dedup families). 32 output files per
// replicated table so every scan parallelizes.
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
val SF = "/root/testdata/sf0.1"
def rep(table: String, reps: Int, remap: (DataFrame, Int) => DataFrame): DataFrame = {
  val src = spark.read.parquet(s"$SF/$table.parquet")
  (0 until reps).map(i => remap(src, i)).reduce(_ unionAll _)
}
def link(dir: String, tables: Seq[String]): Unit = {
  val d = new java.io.File(dir); d.mkdirs()
  for (t <- tables) {
    val tgt = java.nio.file.Paths.get(dir, s"$t.parquet")
    if (!java.nio.file.Files.exists(tgt))
      java.nio.file.Files.createSymbolicLink(tgt,
        java.nio.file.Paths.get(s"$SF/$t.parquet"))
  }
}
val ALL = Seq("region", "nation", "customer", "supplier", "part", "orders",
  "lineitem", "events", "documents", "embeddings")
def write(df: DataFrame, dir: String, table: String): Unit =
  df.repartition(32).write.mode("overwrite").parquet(s"$dir/$table.parquet")

// --- scale-test14: 8× docs/events/lineitem ---
val T14 = "target/scale-test14"
write(rep("documents", 8, (d, i) => d.withColumn("doc_id", col("doc_id") + lit(i * 1000000L))), T14, "documents")
write(rep("events", 8, (d, i) => d.withColumn("event_id", col("event_id") + lit(i * 1000000L)).withColumn("user_id", col("user_id") + lit(i * 1000000L))), T14, "events")
write(rep("lineitem", 8, (d, i) => d.withColumn("l_orderkey", col("l_orderkey") + lit(i * 6000000L))), T14, "lineitem")
link(T14, ALL.filterNot(Set("documents", "events", "lineitem")))

// --- scale-test15: 64× documents ---
val T15 = "target/scale-test15"
write(rep("documents", 64, (d, i) => d.withColumn("doc_id", col("doc_id") + lit(i * 1000000L))), T15, "documents")
link(T15, ALL.filterNot(Set("documents")))

// --- scale-test15-emb8: 8× embeddings ---
val E8 = "target/scale-test15-emb8"
write(rep("embeddings", 8, (d, i) => d.withColumn("vec_id", col("vec_id") + lit(i * 10000000L))), E8, "embeddings")
link(E8, ALL.filterNot(Set("embeddings")))

// --- scale-test16-li64: 64× lineitem ---
val L64 = "target/scale-test16-li64"
write(rep("lineitem", 64, (d, i) => d.withColumn("l_orderkey", col("l_orderkey") + lit(i * 6000000L))), L64, "lineitem")
link(L64, ALL.filterNot(Set("lineitem")))

// --- scale-test16-emb64: 64× embeddings ---
val E64 = "target/scale-test16-emb64"
write(rep("embeddings", 64, (d, i) => d.withColumn("vec_id", col("vec_id") + lit(i * 10000000L))), E64, "embeddings")
link(E64, ALL.filterNot(Set("embeddings")))

println("FIXTURES_BUILT")
sys.exit(0)
