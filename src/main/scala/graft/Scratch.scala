package graft

import graft.operators.DedupOps._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// dev-only timing scratchpad; not part of the library surface
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val docs0 = Tables.documents(spark, d)

    time("warmup_count") { docs0.count() }
    time("explode_1part") {
      docs0.select(col("doc_id"),
        explode(shinglesCol(wordsCol(col("text")))).as("s")).count()
    }
    time("explode_spread") {
      spread(docs0).select(col("doc_id"),
        explode(shinglesCol(wordsCol(col("text")))).as("s")).count()
    }
    time("explode_spread_again") {
      spread(docs0).select(col("doc_id"),
        explode(shinglesCol(wordsCol(col("text")))).as("s")).count()
    }
    // split into words only (no shingle transform) — isolates transform cost
    time("explode_words_spread") {
      spread(docs0).select(col("doc_id"),
        explode(wordsCol(col("text"))).as("w")).count()
    }
    // precomputed array below the exchange, generate above
    time("explode_precomputed") {
      docs0.select(col("doc_id"), shinglesCol(wordsCol(col("text"))).as("sh"))
        .repartition(64)
        .select(col("doc_id"), explode(col("sh")).as("s")).count()
    }
    spread(docs0).select(col("doc_id"),
      explode(shinglesCol(wordsCol(col("text")))).as("s")).explain("formatted")
    spark.stop()
  }
}
