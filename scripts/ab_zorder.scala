// Z-order vs single-column-sort layout A/B (round 13) — run via:
//   sbt -batch package && /opt/spark/bin/spark-shell --master 'local[16]' \
//     --conf spark.sql.shuffle.partitions=32 \
//     --jars target/scala-2.13/apachebeamkmeansspark_2.13-0.1.0.jar \
//     -I scripts/ab_zorder.scala
// Writes two 256-file layouts of sf0.1 lineitem under target/zorder-ab
// (z = StorageOps.mortonCol(orderkey-grid, partkey); linear = sorted by
// l_orderkey alone) and measures the scan's numOutputRows — the rows
// surviving parquet row-group min/max pruning — for a 2-D box and for a
// partkey-only filter. Results recorded in BASELINE.md.
import org.apache.spark.sql.functions._
val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.1")
  .select($"l_orderkey", $"l_partkey", $"l_extendedprice")
val z = graft.sources.StorageOps.mortonCol(expr("l_orderkey div 3"), $"l_partkey")
li.withColumn("zv", z).repartitionByRange(256, $"zv").sortWithinPartitions($"zv").drop("zv").write.mode("overwrite").parquet("target/zorder-ab/zorder256")
li.repartitionByRange(256, $"l_orderkey").sortWithinPartitions($"l_orderkey").write.mode("overwrite").parquet("target/zorder-ab/linear256")
def scanRows(path: String, pred: org.apache.spark.sql.Column): Unit = { val df = spark.read.parquet(path).where(pred); val ep = df.queryExecution.executedPlan; val n = ep.execute().count(); val s = ep.collectLeaves().head; println("SCANROWS " + path + " result_rows=" + n + " scan_output_rows=" + s.metrics("numOutputRows").value) }
val box = $"l_orderkey".between(60000, 74999) && $"l_partkey".between(8000, 9999)
scanRows("target/zorder-ab/zorder256", box)
scanRows("target/zorder-ab/linear256", box)
val pkOnly = $"l_partkey".between(8000, 9999)
scanRows("target/zorder-ab/zorder256", pkOnly)
scanRows("target/zorder-ab/linear256", pkOnly)
sys.exit(0)
