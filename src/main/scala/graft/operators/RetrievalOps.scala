package graft.operators

import graft.Tables
import graft.operators.DedupOps.wordsCol
import graft.functions.{VectorOps, VectorSql}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword retrieval over the documents corpus: BM25 scoring and
  * reciprocal-rank fusion of two rankers — the retrieval half of a
  * hybrid (keyword + embedding) search stack, and the standard
  * query-side tool for corpus inspection in a curation pipeline.
  *
  * Reference ancestor: the broadcast nearest-candidate pattern of
  * SURVEY.md §2.3 (a bounded model/query set is broadcast; the corpus
  * is scanned once and never shuffled wholesale).
  *
  * Exact cross-engine arithmetic throughout (the `unigram_logprob`
  * discipline): tf/df/dl are integers, the BM25 idf log runs through
  * the deterministic Mitchell log2 ([[VectorOps.log2m]] — bitlength +
  * exact power-of-two division, no transcendental library), each
  * per-term score is quantized to integer micros BEFORE the per-doc
  * sum, so the aggregate is a LONG sum — addition-order-free, hence
  * repartition-stable and bit-identical in DuckDB.
  *
  * Scale shape: the query set is a bounded literal table, broadcast;
  * the corpus token stream meets it in a map-side broadcast hash join
  * that drops every non-query token BEFORE the only row-scaled
  * shuffle (the map-side-combined per-(query,doc) tf aggregate). df
  * and corpus stats are O(|terms|) / O(1) aggregates. Ranking is the
  * salted two-phase top-k (no per-query reducer funnel).
  */
object RetrievalOps {

  /** Fixed query workload: 3 queries over the fixture vocabulary, with
    * one rare term (`dup`, df≈3% of docs) so idf genuinely varies. */
  private[graft] val QUERIES: Seq[(Int, String)] = Seq(
    (1, "hash"), (1, "join"),
    (2, "window"), (2, "sort"), (2, "merge"),
    (3, "stream"), (3, "batch"), (3, "dup"))

  private val TOPK = 10
  private val SALT = 16

  /** Per-(qid, term, doc) term frequencies with doc length, for query
    * terms only. The broadcast join prunes the exploded token stream
    * map-side; only matching (query-term, doc) rows reach the shuffle. */
  private[graft] def termMatches(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val q = QUERIES.toDF("qid", "term")
    // no spread (r22): the scan's own partitioning is data-derived
    // (maxPartitionBytes) and the explode+broadcast-join+aggregate pass
    // measured equal without the repartition; more importantly a doc_id
    // hash spread SATISFIES the aggregate's clustering requirement, so
    // the agg exchange vanishes and the checkpointed postings inherit
    // the pinned cpus-wide partitioning — every downstream scoring
    // branch then pays cpus-many near-empty tasks per stage, where the
    // ENSURE_REQUIREMENTS exchange left here coalesces under AQE to a
    // data-sized (tiny) partition count for the bounded matched set.
    docs
      .select(col("doc_id"), wordsCol(col("text")).as("w"))
      .select(col("doc_id"), size(col("w")).as("dl"),
        explode(col("w")).as("term"))
      .join(broadcast(q), Seq("term"))
      .groupBy(col("qid"), col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
  }

  /** O(1) corpus stats (doc count, total token count) for the BM25
    * length normalization. */
  private def corpusStats(docs: DataFrame): DataFrame =
    docs
      .select(size(wordsCol(col("text"))).as("dl"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("dl")), lit(0L)).as("tot_dl"))

  /** Salted two-phase per-qid top-k (SimilarityOps.topKPerQuery's
    * shape): phase 1 ranks within (qid, doc_id % SALT) and keeps k per
    * salt lane, phase 2 ranks the ≤ SALT·k survivors — identical
    * result to one global window, no per-query reducer funnel. */
  private[graft] def topKPerQid(scored: DataFrame, k: Int): DataFrame = {
    val ord: Seq[Column] = Seq(col("score").desc, col("doc_id"))
    val w1 = Window.partitionBy(col("qid"), pmod(col("doc_id"), lit(SALT)))
      .orderBy(ord: _*)
    val w2 = Window.partitionBy(col("qid")).orderBy(ord: _*)
    scored.withColumn("rk1", row_number().over(w1)).where(col("rk1") <= k)
      .withColumn("rk", row_number().over(w2)).where(col("rk") <= k)
      .drop("rk1")
  }

  /** BM25 (k1 = 1.2, b = 0.75, Lucene-style idf = log2(1 + (N−df+0.5)
    * /(df+0.5)) via Mitchell log2 on a 2^20-scaled integer argument)
    * aggregated per (qid, doc) as an integer-micros sum.
    *
    * The posting extraction is PINNED (rank_fusion/retrieval_eval's
    * convention): [[bm25ScoredFrom]] consumes `tm` twice (the df pass
    * and the score pass) and per-branch column pruning makes the two
    * subtree exchanges non-identical, so ReuseExchange cannot dedupe
    * them — unpinned, the corpus explode+aggregate ran TWICE per query
    * (r22 Probe: two ~1 s jobs of 64 explode tasks each in bm25_topk).
    * The pinned relation is query-term matches only — bounded, never
    * corpus-scaled. */
  private[graft] def bm25Scored(docs: DataFrame): DataFrame =
    bm25ScoredFrom(termMatches(docs).localCheckpoint(), corpusStats(docs))

  /** BM25 scoring from an already-extracted posting relation — factored
    * so `rank_fusion` can share ONE [[termMatches]] pass (and its
    * shuffle) between its two rankers instead of re-deriving it. */
  private def bm25ScoredFrom(tm: DataFrame, stats: DataFrame): DataFrame = {
    val dfT = tm.select(col("term"), col("doc_id")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    // idf ratio (≥ 1) scaled into the integer domain for the exact log2
    val xInt = floor((((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5)) + lit(1.0)) * lit(1048576.0))
      .cast("long")
    val idf2 = VectorOps.log2m(xInt) - lit(20.0)
    val tfnorm = (col("tf").cast("double") * lit(2.2)) /
      (col("tf").cast("double") + lit(1.2) *
        (lit(0.25) + lit(0.75) *
          (col("dl").cast("double") /
            (col("tot_dl").cast("double") / col("n_docs").cast("double")))))
    tm.join(broadcast(dfT), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("qid"), col("doc_id"),
        floor(idf2 * tfnorm * lit(1000000.0)).cast("long").as("sm"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("sm")).as("score"))
  }

  /** Plain summed-tf ranking from an already-extracted posting
    * relation — the second (boolean/tf) system fused by `rank_fusion`;
    * parameterized on the postings (like [[bm25ScoredFrom]]) so both
    * rankers score ONE shared [[termMatches]] pass. */
  private[graft] def tfScoredFrom(tm: DataFrame): DataFrame =
    tm.groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("tf")).as("score"))

  /** Fixed phrase workload for `phrase_search` — 2- and 3-word phrases
    * over the fixture vocabulary (adjacent-pair hit rates ~1/31 per
    * position, triple ~1/961, so both lengths get a real hit spread). */
  private[graft] val PHRASES: Seq[(Int, String)] = Seq(
    (1, "hash join"), (2, "sort merge"), (3, "the fast key"),
    (4, "group query row"))

  /** The standing inverted-index layout for `bm25_incremental`:
    * term-BUCKETED postings (term, doc_id, dl, tf partitioned by
    * h60(term) mod [[IDX_BUCKETS]] — a query's terms prune to their
    * buckets, the reader never scans the whole index) plus the O(1)
    * corpus stats row, both over the ~70% unitUniform base (the
    * incremental family's one split convention). Staged once per
    * fixture; this is the previous indexing run's shipped artifact —
    * the incremental query's base knowledge comes ONLY from these
    * files, never from re-tokenizing base text. */
  private[graft] val IDX_BUCKETS = 64
  private[graft] def ensureBm25Index(s: SparkSession, d: String): String =
    graft.sources.Staging.ensureDir(
      s"target/bm25-index/${graft.sources.Staging.fixtureKey(d)}",
      marker = "stats/_SUCCESS") { tmp =>
      val base = Tables.documents(s, d)
        .where(VectorOps.unitUniform(col("doc_id")) < 0.7)
      base
        .select(col("doc_id"), wordsCol(col("text")).as("w"))
        .select(col("doc_id"), size(col("w")).as("dl"),
          explode(col("w")).as("term"))
        .groupBy(col("term"), col("doc_id"), col("dl"))
        .agg(count(lit(1)).as("tf"))
        .withColumn("bkt",
          pmod(DedupOps.h60(col("term")), lit(IDX_BUCKETS.toLong))
            .cast("int"))
        .write.mode("overwrite").partitionBy("bkt")
        .parquet(s"$tmp/postings")
      // the scorer's ONE stats definition — a drifted copy here would
      // silently desynchronize the persisted stats from the scorer
      corpusStats(base)
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/stats")
    }

  /** `bm25_incremental`'s matched-postings relation, PRE-checkpoint —
    * factored so PlanSpec can pin the shape the pin would otherwise hide
    * behind the materialization: the standing postings read under a
    * STATIC term-bucket partition filter (the workload's h60 buckets,
    * folded to literals by one bounded driver evaluation) unioned with
    * the delta's in-flight termMatches. */
  private[graft] def bm25IncrementalTm(s: SparkSession,
      d: String): DataFrame = {
    import s.implicits._
    val idx = ensureBm25Index(s, d)
    val q = QUERIES.toDF("qid", "term")
    val qTerms = QUERIES.map(_._2).distinct
    val bkts = s.createDataFrame(qTerms.map(Tuple1(_))).toDF("term")
      .select(pmod(DedupOps.h60(col("term")), lit(IDX_BUCKETS.toLong))
        .cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val baseTm = s.read.parquet(s"$idx/postings")
      .where(col("bkt").isin(bkts: _*))
      .join(broadcast(q), Seq("term"))
      .select(col("qid"), col("term"), col("doc_id"), col("dl"),
        col("tf"))
    baseTm.unionAll(termMatches(Tables.documents(s, d)
      .where(!(VectorOps.unitUniform(col("doc_id")) < 0.7))))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bm25_topk" -> { (s, d) =>
      topKPerQid(bm25Scored(Tables.documents(s, d)), TOPK)
        .select(col("qid"), col("rk"), col("doc_id"), col("n_terms"),
          col("score"))
    },
    "bm25_incremental" -> { (s, d) =>
      // INCREMENTAL INDEXING (round 20) — the retrieval family's member
      // of the incremental matrix: a crawl delta extends the standing
      // inverted index without re-tokenizing the base corpus. Base side
      // = the persisted postings, read TERM-BUCKET-PRUNED to the query
      // workload's buckets (the ~8-term workload touches a handful of
      // the 64 partitions — PlanSpec pins the PartitionFilters) plus the
      // 1-row stats file; delta side = termMatches over the delta docs
      // only. The union feeds the UNCHANGED scorer (bm25ScoredFrom —
      // df comes out of the union since base and delta doc sets are
      // disjoint; n_docs/tot_dl merge additively from the stats row +
      // one delta aggregate), so the oracle is bm25_topk's full-corpus
      // ranking VERBATIM: the hash gate proves the persisted-index merge
      // computes exactly what a from-scratch index would. At 100 TB:
      // query cost = pruned postings buckets + the delta, never a
      // corpus re-scan — indexing cost tracks the crawl, not the lake.
      val idx = ensureBm25Index(s, d)
      val delta = Tables.documents(s, d)
        .where(!(VectorOps.unitUniform(col("doc_id")) < 0.7))
      // the same ONE stats definition the index persisted, renamed for
      // the additive merge
      val deltaStats = corpusStats(delta)
        .select(col("n_docs").as("d_docs"), col("tot_dl").as("d_dl"))
      val stats = s.read.parquet(s"$idx/stats")
        .crossJoin(broadcast(deltaStats))
        .select((col("n_docs") + col("d_docs")).as("n_docs"),
          (col("tot_dl") + col("d_dl")).as("tot_dl"))
      // pin the matched-postings union: bm25ScoredFrom consumes it twice
      // (the df pass and the score pass) and the relation is tiny by
      // construction (query-term matches only) — without the pin the
      // delta leg re-tokenizes and the index re-reads per consumer
      val tm = bm25IncrementalTm(s, d).localCheckpoint()
      topKPerQid(bm25ScoredFrom(tm, stats), TOPK)
        .select(col("qid"), col("rk"), col("doc_id"), col("n_terms"),
          col("score"))
    },
    "phrase_search" -> { (s, d) =>
      // exact phrase matching — the positional-postings capability BM25's
      // bag-of-words scoring can't express: occurrence counts come from
      // the native multiset word-shingler (adjacency IS the n-gram), so
      // a phrase hit is a shingle equality, evaluated in one codegen
      // pass. The phrase table is a bounded broadcast literal; the
      // exploded shingle stream meets it map-side (only hits shuffle,
      // ngram_topk's discipline) and per-(phrase, doc) counts rank
      // through the map-side-capped top-k.
      val s2 = org.apache.spark.sql.graft.WordShingles.all(col("text"), 2)
      val s3 = org.apache.spark.sql.graft.WordShingles.all(col("text"), 3)
      val p = { import s.implicits._; PHRASES.toDF("phrase_id", "phrase") }
      val hits = Tables.documents(s, d)
        .select(col("doc_id"), explode(concat(s2, s3)).as("g"))
        .join(broadcast(p), col("g") === col("phrase"))
        .groupBy(col("phrase_id"), col("phrase"), col("doc_id"))
        .agg(count(lit(1)).as("n_hits"))
      topKPerQid(hits.select(col("phrase_id").as("qid"), col("phrase"),
          col("doc_id"), col("n_hits").as("score")), 5)
        .select(col("qid").as("phrase_id"), col("phrase"), col("rk"),
          col("doc_id"), col("score").as("n_hits"))
    },
    "retrieval_eval" -> { (s, d) =>
      // IR evaluation harness (the keyword twin of sim_topk_ivf_recall's
      // held-out methodology): relevance is DETERMINISTIC boolean-AND —
      // a doc is relevant iff it contains EVERY term of the query — so
      // both engines derive identical qrels and the metrics themselves
      // are oracle-checkable. Per query: relevant-set size, hits in the
      // BM25 top-10, first relevant rank, precision@10, MRR — all exact
      // integer counts + one exact division each. The ranked list is
      // O(queries·k) and broadcast; the qrels aggregate is the only
      // row-scaled shuffle.
      val docs = Tables.documents(s, d)
      val nt = { import s.implicits._
        QUERIES.groupBy(_._1).view.mapValues(_.size).toSeq.toDF("qid", "nt") }
      val tm = termMatches(docs).localCheckpoint() // shared: qrels + ranker
      val rel = tm
        .groupBy(col("qid"), col("doc_id"))
        .agg(count(lit(1)).as("nm"))
        .join(broadcast(nt), Seq("qid"))
        .where(col("nm") === col("nt"))
        .select(col("qid"), col("doc_id"))
      val ranked = topKPerQid(bm25ScoredFrom(tm, corpusStats(docs)), TOPK)
        .select(col("qid"), col("doc_id"), col("rk"))
      rel.join(broadcast(ranked), Seq("qid", "doc_id"), "left")
        .groupBy(col("qid"))
        .agg(count(lit(1)).as("n_rel"), count(col("rk")).as("n_hits10"),
          min(col("rk")).as("fr"))
        .select(col("qid"), col("n_rel"), col("n_hits10"),
          coalesce(col("fr"), lit(-1)).as("first_rank"),
          (col("n_hits10").cast("double") / lit(10.0)).as("prec_at_10"),
          coalesce(lit(1.0) / col("fr"), lit(0.0)).as("mrr"))
    },
    "hard_negatives" -> { (s, d) =>
      // hard-negative mining — the RETRIEVAL family's contribution to
      // contrastive training data (DPR / sentence-encoder trainers pair
      // each positive with the top-scoring NON-relevant docs, which
      // carry far more gradient than random negatives): per query, the
      // BM25 top-k among docs that miss ≥ 1 query term, i.e. the exact
      // complement of retrieval_eval's deterministic boolean-AND
      // relevance — so "negative" is oracle-derivable, not a judgment
      // call. Since the per-(qid, doc) aggregate already counts matched
      // terms (n_terms), the relevance filter is one broadcast of
      // |queries| rows applied BEFORE the top-k: no extra corpus pass,
      // no extra shuffle vs bm25_topk — the mining is free at any scale
      // once the posting extraction ran.
      val docs = Tables.documents(s, d)
      val nt = { import s.implicits._
        QUERIES.groupBy(_._1).view.mapValues(_.size).toSeq.toDF("qid", "nt") }
      topKPerQid(bm25Scored(docs)
          .join(broadcast(nt), Seq("qid"))
          .where(col("n_terms") < col("nt")), TOPK)
        .select(col("qid"), col("rk"), col("doc_id"), col("n_terms"),
          col("score"))
    },
    "rank_fusion" -> { (s, d) =>
      // reciprocal-rank fusion (RRF, k = 60) of the BM25 and summed-tf
      // top-10 lists: rrf = Σ 1/(60+rank) over the systems that
      // retrieved the doc. Both rankers score the SAME posting
      // extraction, so the per-(qid, term, doc) relation is pinned once
      // (bounded by matched rows) and the corpus is scanned once — at
      // serving scale the shared extraction is the index build both
      // systems read. The lists are O(queries·k) and meet in a tiny
      // full-outer join. 1/(60+rk) is one exact IEEE division and the
      // fused score adds exactly two such terms in fixed order —
      // bit-stable cross-engine.
      val docs = Tables.documents(s, d)
      val tm = termMatches(docs).localCheckpoint()
      val a = topKPerQid(bm25ScoredFrom(tm, corpusStats(docs)), TOPK)
        .select(col("qid"), col("doc_id"), col("rk").as("rk_bm25"))
      val b = topKPerQid(tfScoredFrom(tm), TOPK)
        .select(col("qid"), col("doc_id"), col("rk").as("rk_tf"))
      val fused = a.join(b, Seq("qid", "doc_id"), "full_outer")
        .select(col("qid"), col("doc_id"), col("rk_bm25"), col("rk_tf"),
          (coalesce(lit(1.0) / (lit(60) + col("rk_bm25")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("rk_tf")), lit(0.0)))
            .as("score"))
      topKPerQid(fused, TOPK)
        .select(col("qid"), col("rk"), col("doc_id"),
          col("score").as("rrf"), col("rk_bm25"), col("rk_tf"))
    }
  )

  private val wSql = "list_filter(string_split(text, ' '), x -> length(x) > 0)"
  private val qValues = QUERIES
    .map { case (q, t) => s"($q, '$t')" }.mkString(", ")

  /** Shared oracle CTE chain through the per-(qid,doc) BM25 aggregate. */
  private def bm25Ctes: String =
    s"""q(qid, term) AS (VALUES $qValues),
       |tok AS (SELECT doc_id, len(w)::INT AS dl, unnest(w) AS term
       |        FROM (SELECT doc_id, $wSql AS w FROM documents)),
       |stats AS (SELECT count(*)::BIGINT AS n_docs,
       |                 coalesce(sum(len($wSql)), 0)::BIGINT AS tot_dl
       |          FROM documents),
       |tm AS (SELECT qid, term, doc_id, dl, count(*)::BIGINT AS tf
       |       FROM tok JOIN q USING (term) GROUP BY qid, term, doc_id, dl),
       |dft AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df
       |        FROM tm GROUP BY term),
       |perx AS (SELECT qid, doc_id, tf, dl, tot_dl, n_docs,
       |           floor((((n_docs - df)::DOUBLE + 0.5) / (df::DOUBLE + 0.5)
       |                  + 1.0) * 1048576.0)::BIGINT AS x
       |         FROM tm JOIN dft USING (term) CROSS JOIN stats),
       |per AS (SELECT qid, doc_id,
       |          floor((${VectorSql.log2m("x")} - 20.0)
       |            * ((tf::DOUBLE * 2.2) / (tf::DOUBLE + 1.2
       |               * (0.25 + 0.75 * (dl::DOUBLE
       |                  / (tot_dl::DOUBLE / n_docs::DOUBLE)))))
       |            * 1000000.0)::BIGINT AS sm
       |        FROM perx),
       |agg AS (SELECT qid, doc_id, count(*)::BIGINT AS n_terms,
       |               sum(sm)::BIGINT AS score
       |        FROM per GROUP BY qid, doc_id),
       |atop AS (SELECT qid, doc_id, n_terms, score,
       |           row_number() OVER (PARTITION BY qid
       |             ORDER BY score DESC, doc_id)::INT AS rk
       |         FROM agg)""".stripMargin

  private val pValues = PHRASES
    .map { case (i, p) => s"($i, '$p')" }.mkString(", ")

  val oracles: Map[String, String] = Map(
    "bm25_topk" ->
      s"""WITH $bm25Ctes
         |SELECT qid, rk, doc_id, n_terms, score FROM atop
         |WHERE rk <= 10""".stripMargin,
    // bm25_topk's full-corpus ranking VERBATIM — the persisted-index +
    // delta merge must compute exactly what a from-scratch index would
    "bm25_incremental" ->
      s"""WITH $bm25Ctes
         |SELECT qid, rk, doc_id, n_terms, score FROM atop
         |WHERE rk <= 10""".stripMargin,
    "phrase_search" ->
      s"""WITH p(phrase_id, phrase) AS (VALUES $pValues),
         |w0 AS (SELECT doc_id, $wSql AS w FROM documents),
         |g AS (SELECT doc_id, unnest(
         |        CASE WHEN len(w) >= 2
         |          THEN list_transform(generate_series(1, len(w) - 1),
         |               i -> concat_ws(' ', w[i], w[i+1]))
         |          ELSE [] END
         |        || CASE WHEN len(w) >= 3
         |          THEN list_transform(generate_series(1, len(w) - 2),
         |               i -> concat_ws(' ', w[i], w[i+1], w[i+2]))
         |          ELSE [] END) AS g
         |      FROM w0),
         |h AS (SELECT phrase_id, phrase, doc_id, count(*)::BIGINT AS n_hits
         |      FROM g JOIN p ON g.g = p.phrase
         |      GROUP BY phrase_id, phrase, doc_id)
         |SELECT phrase_id, phrase, rk, doc_id, n_hits FROM (
         |  SELECT *, row_number() OVER (PARTITION BY phrase_id
         |    ORDER BY n_hits DESC, doc_id)::INT AS rk FROM h)
         |WHERE rk <= 5""".stripMargin,
    "retrieval_eval" ->
      s"""WITH $bm25Ctes,
         |ntq AS (SELECT qid, count(*)::BIGINT AS nt FROM q GROUP BY qid),
         |m AS (SELECT qid, doc_id, count(*)::BIGINT AS nm
         |      FROM tm GROUP BY qid, doc_id),
         |rel AS (SELECT m.qid, m.doc_id FROM m JOIN ntq USING (qid)
         |        WHERE m.nm = ntq.nt),
         |top AS (SELECT qid, doc_id, rk FROM atop WHERE rk <= 10)
         |SELECT qid, count(*)::BIGINT AS n_rel,
         |       count(rk)::BIGINT AS n_hits10,
         |       coalesce(min(rk), -1)::INT AS first_rank,
         |       count(rk)::DOUBLE / 10.0::DOUBLE AS prec_at_10,
         |       coalesce(1.0::DOUBLE / min(rk), 0.0::DOUBLE) AS mrr
         |FROM rel LEFT JOIN top USING (qid, doc_id)
         |GROUP BY qid""".stripMargin,
    // the shared BM25 chain + the partial-match filter (n_terms < the
    // query's term count) BEFORE re-ranking — rank is recomputed over
    // the negative pool, not sliced out of atop's all-docs ranking
    "hard_negatives" ->
      s"""WITH $bm25Ctes,
         |ntq AS (SELECT qid, count(*)::BIGINT AS nt FROM q GROUP BY qid),
         |neg AS (SELECT agg.qid, agg.doc_id, agg.n_terms, agg.score,
         |          row_number() OVER (PARTITION BY agg.qid
         |            ORDER BY agg.score DESC, agg.doc_id)::INT AS rk
         |        FROM agg JOIN ntq USING (qid)
         |        WHERE agg.n_terms < ntq.nt)
         |SELECT qid, rk, doc_id, n_terms, score FROM neg
         |WHERE rk <= 10""".stripMargin,
    "rank_fusion" ->
      s"""WITH $bm25Ctes,
         |tfr AS (SELECT qid, doc_id, sum(tf)::BIGINT AS score
         |        FROM tm GROUP BY qid, doc_id),
         |btop AS (SELECT qid, doc_id, score,
         |           row_number() OVER (PARTITION BY qid
         |             ORDER BY score DESC, doc_id)::INT AS rk
         |         FROM tfr),
         |fused AS (
         |  SELECT qid, doc_id, a.rk AS rk_bm25, b.rk AS rk_tf,
         |         coalesce(1.0 / (60 + a.rk), 0.0)
         |           + coalesce(1.0 / (60 + b.rk), 0.0) AS rrf
         |  FROM (SELECT * FROM atop WHERE rk <= 10) a
         |  FULL OUTER JOIN (SELECT * FROM btop WHERE rk <= 10) b
         |  USING (qid, doc_id))
         |SELECT qid, rk, doc_id, rrf, rk_bm25, rk_tf FROM (
         |  SELECT *, row_number() OVER (PARTITION BY qid
         |    ORDER BY rrf DESC, doc_id)::INT AS rk FROM fused)
         |WHERE rk <= 10""".stripMargin
  )
}
