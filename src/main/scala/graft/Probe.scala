package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev tool: run declared queries under a job listener and print the
  * per-job wall breakdown (job id, seconds, task count) — the local-mode
  * stand-in for the Spark UI's job timeline (guide §7.1), used to tell
  * driver-loop scheduling overhead from real task work. NOT part of the
  * shipped library and not a declared query.
  *
  * Usage: sbt "runMain graft.Probe <nameRegex> [reps]"
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val pat = args(0).r
    val reps = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    System.setProperty("graft.fastHash", "true")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // mirror Bench's data-derived AQE partition sizing (guide §2.2)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY_PARTITION_BYTES", "64m"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.StorageOps.ensureLayouts(spark, sfDir)
    graft.sources.StorageOps.ensureRebucketed(spark, sfDir)
    graft.sources.TextIO.ensureFixtures(spark, sfDir)
    graft.streaming.StreamingOps.stageDir(spark, sfDir, "events")
    graft.streaming.StreamingOps.stageDir(spark, sfDir, "documents")
    graft.operators.SimilarityOps.ensureIvfIndex(spark, sfDir)
    graft.operators.PipelineOps.ensureExportShards(spark, sfDir)
    graft.sources.StorageOps.ensureBaseManifest(spark, sfDir)
    // mirror Bench's scan-layout overrides so probed shapes match benched
    BenchLayout.stage(spark, sfDir, cpus.toInt)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, Int, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val stages = e.stageInfos.map(_.name.takeWhile(_ != '\n')).mkString("|")
        jobs.put(e.jobId, (System.nanoTime(),
          e.stageInfos.map(_.numTasks).sum, stages.take(120)))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val st = jobs.remove(e.jobId)
        if (st != null)
          done.add((e.jobId, (System.nanoTime() - st._1) / 1e9, st._2, st._3))
      }
    })
    val all = (SparkEntry.queries ++ SparkEntry.benchOnly).toSeq.sortBy(_._1)
    for ((name, fn) <- all if pat.findFirstIn(name).isDefined) {
      for (r <- 1 to reps) {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        graft.sources.Staging.deleteRecursively(
          java.nio.file.Paths.get("target/ivf-bench"))
        done.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val sec = (System.nanoTime() - t0) / 1e9
        org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
        import scala.jdk.CollectionConverters._
        val js = done.asScala.toSeq.sortBy(_._1)
        println(f"== $name rep $r: $sec%.3f s, ${js.size} jobs, " +
          f"${js.map(_._3).sum} tasks")
        if (r == reps)
          js.foreach { case (id, s, n, st) =>
            println(f"   job $id%5d  $s%7.3f s  $n%5d tasks  $st")
          }
      }
    }
    spark.stop()
  }
}
