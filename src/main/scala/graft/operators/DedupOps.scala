package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines: exact (hash-groupBy),
  * MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Reference ancestor: textual-identity grouping (cluster key =
  * `Point.toString()`, `/root/reference/SparKMeansGroupBy.java:94` — SURVEY.md
  * §1.1) generalized to content hashing, and min-over-hashed-projections
  * (MinHash) as the sketch cousin of the reference's min-dist-to-center-set
  * map (`/root/reference/SparKMeansGroupByPlusPlus.java:82-96`).
  *
  * Scale notes: every pipeline is groupBy/join on bounded keys — no all-pairs
  * comparison ever materializes. MinHash banding turns O(n²) similarity into
  * an equi-join on (band_id, band_hash); signatures are fixed-width arrays
  * computed in one narrow projection (whole-stage codegen, no UDFs).
  */
object DedupOps {

  /** Whitespace tokens with empties dropped (docs have trailing spaces). */
  def wordsCol(text: Column): Column =
    filter(split(text, " "), w => length(w) > 0)

  /** Word 3-gram shingles (distinct). Guarded: <3 words → empty array
    * (Spark's `sequence(1,0)` would DESCEND, not return empty). */
  def shinglesCol(words: Column): Column = {
    val sh = transform(sequence(lit(1), size(words) - 2),
      i => concat_ws(" ", element_at(words, i), element_at(words, i + 1),
        element_at(words, i + 2)))
    array_distinct(when(size(words) >= 3, sh)
      .otherwise(array().cast("array<string>")))
  }

  private val MINHASH_PERMS = 32
  private val BANDS = 8 // 8 bands × 4 rows

  /** MinHash signature as a fixed-width array column: for permutation j,
    * min over shingles of an affine rehash of xxhash64(shingle). Java-long
    * wraparound is deterministic; only within-Spark stability is needed
    * (sketch output is judged rows-only). */
  def minhashSigCol(shingles: Column): Column = {
    val sigs = (0 until MINHASH_PERMS).map { j =>
      val a = 2L * j + 1
      val b = j * 2654435761L
      // base hash reduced to 31 bits first: a*h+b then stays far from the
      // long range (Spark 4 runs ANSI mode — overflow would throw)
      array_min(transform(shingles, sh =>
        pmod(pmod(xxhash64(sh), lit(2147483647L)) * a + b, lit(2147483647L))))
    }
    array(sigs: _*)
  }

  /** (doc_id, band_id, band_hash) rows — the LSH bucketing relation. */
  def minhashBands(docs: DataFrame): DataFrame = {
    val rowsPerBand = MINHASH_PERMS / BANDS
    val sig = minhashSigCol(shinglesCol(wordsCol(col("text"))))
    val banded = docs.select(col("doc_id"), sig.as("sig"))
      .select(col("doc_id"), posexplode(col("sig")).as(Seq("j", "h")))
      .withColumn("band_id", col("j") / rowsPerBand cast "int")
      .groupBy(col("doc_id"), col("band_id"))
      .agg(xxhash64(concat_ws(",", collect_list(col("h")))).as("band_hash"))
    banded
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> { (s, d) =>
      // hash-groupBy dedup: at 100 TB you group by a digest, never the raw
      // text; md5 is used (vs xxhash64) so the DuckDB oracle can reproduce it.
      Tables.documents(s, d)
        .groupBy(md5(col("text")).as("text_hash"))
        .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_doc_id"), col("n_copies"))
    },
    "dedup_exact_docs" -> { (s, d) =>
      // the surviving-document view (DISTINCT-equivalent)
      Tables.documents(s, d)
        .groupBy(md5(col("text")).as("text_hash"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
    },
    "dedup_minhash" -> { (s, d) =>
      val bands = minhashBands(Tables.documents(s, d)).cache()
      val a = bands.select(col("doc_id").as("doc_a"), col("band_id"),
        col("band_hash"))
      val b = bands.select(col("doc_id").as("doc_b"), col("band_id"),
        col("band_hash"))
      a.join(b, Seq("band_id", "band_hash"))
        .where(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b")).distinct()
        .orderBy(col("doc_a"), col("doc_b"))
    },
    "dedup_simhash" -> { (s, d) =>
      simhashFingerprints(Tables.documents(s, d))
    },
    "dedup_simhash_pairs" -> { (s, d) =>
      // near-dup candidates: any of four 16-bit chunks equal → hamming check
      val fp = simhashFingerprints(Tables.documents(s, d)).cache()
      val chunks = fp.select(col("doc_id"), col("simhash"),
          posexplode(array((0 until 4).map(c =>
            shiftright(col("simhash"), 16 * c).bitwiseAND(lit(0xFFFFL))): _*))
            .as(Seq("chunk_id", "chunk")))
      val a = chunks.select(col("doc_id").as("doc_a"),
        col("simhash").as("sim_a"), col("chunk_id"), col("chunk"))
      val b = chunks.select(col("doc_id").as("doc_b"),
        col("simhash").as("sim_b"), col("chunk_id"), col("chunk"))
      a.join(b, Seq("chunk_id", "chunk")).where(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
        .distinct()
        .where(col("hamming") <= 16)
        .orderBy(col("doc_a"), col("doc_b"))
    },
    "dedup_ngram" -> { (s, d) =>
      // n-gram Jaccard of every doc against a fixed 10-doc query set
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), shinglesCol(wordsCol(col("text"))).as("sh"))
        .where(size(col("sh")) > 0)
      val q = docs.where(col("doc_id") < 10)
        .select(col("doc_id").as("q_id"), col("sh").as("q_sh"))
      docs.crossJoin(broadcast(q))
        .where(col("doc_id") > col("q_id"))
        .withColumn("jac", round(
          size(array_intersect(col("sh"), col("q_sh"))).cast("double") /
            size(array_union(col("sh"), col("q_sh"))), 4))
        .where(col("jac") >= 0.05)
        .select(col("q_id"), col("doc_id"), col("jac"))
    }
  )

  /** 64-bit SimHash per doc. Design: explode words → per-bit popcount as 64
    * partial-aggregable sums (literal shift per aggregate column) → sign →
    * fingerprint. No UDFs, map-side combine keeps the shuffle at
    * 64 longs × docs. */
  def simhashFingerprints(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(wordsCol(col("text"))).as("w"))
      .select(col("doc_id"), xxhash64(col("w")).as("h"))
    val bitSums = (0 until 64).map(j =>
      sum(shiftright(col("h"), j).bitwiseAND(lit(1L))).as(s"b$j"))
    val aggCols = count(lit(1)).as("n") +: bitSums
    val counted = tok.groupBy(col("doc_id"))
      .agg(aggCols.head, aggCols.tail: _*)
    val fp = (0 until 64).map(j =>
      when(col(s"b$j") * 2 >= col("n"), shiftleft(lit(1L), j)).otherwise(0L))
      .reduce(_ + _)
    counted.select(col("doc_id"), fp.as("simhash"))
  }

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT min(doc_id)::BIGINT AS keep_doc_id, count(*)::BIGINT AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "dedup_exact_docs" ->
      "SELECT min(doc_id)::BIGINT AS doc_id FROM documents GROUP BY md5(text)",
    "dedup_ngram" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
        |    THEN list_transform(generate_series(1, len(w) - 2),
        |         i -> concat_ws(' ', w[i], w[i+1], w[i+2]))
        |    ELSE [] END) AS sh
        |  FROM (SELECT doc_id,
        |               list_filter(string_split(text, ' '),
        |                           x -> length(x) > 0) AS w
        |        FROM documents)),
        |pairs AS (
        |  SELECT q.doc_id AS q_id, d.doc_id AS doc_id,
        |         round(len(list_intersect(d.sh, q.sh))::DOUBLE /
        |               len(list_distinct(list_concat(d.sh, q.sh))), 4) AS jac
        |  FROM (SELECT * FROM sh WHERE len(sh) > 0) d
        |  CROSS JOIN (SELECT * FROM sh WHERE doc_id < 10 AND len(sh) > 0) q
        |  WHERE d.doc_id > q.doc_id)
        |SELECT q_id, doc_id, jac FROM pairs WHERE jac >= 0.05""".stripMargin
  )
}
