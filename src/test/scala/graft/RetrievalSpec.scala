package graft

import graft.functions.VectorOps
import graft.operators.{DedupOps, RelationalOps, RetrievalOps}
import org.apache.spark.sql.functions._

/** Round-14 operators: retrieval (BM25 / RRF), the deterministic log2
  * primitive behind the BM25 idf, and the constructed-case contracts for
  * the time-series fill and the SCD1 merge. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def rIeeeS(x: Double, decimals: Int): Double = {
    val s = math.pow(10.0, decimals)
    math.floor(x * s + 0.5) / s
  }

  test("log2m: exact at powers of two, within the Mitchell bound, monotone") {
    val xs = ((1L to 4096L) ++ Seq(1L << 20, (1L << 20) + 12345,
      123456789L, (1L << 40) + 7)).toSeq
    val rows = xs.toDF("x")
      .select(col("x"), VectorOps.log2m(col("x")).as("m"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    var prev = -1.0
    rows.foreach { case (x, m) =>
      val exact = math.log(x.toDouble) / math.log(2.0)
      // Mitchell's e + (mant-1) UNDERestimates log2 (chord below the
      // concave log), max deficit ~0.0861 at mant = 1/ln2
      assert(m <= exact + 1e-9 && m >= exact - 0.0861,
        s"x=$x m=$m exact=$exact")
      if ((x & (x - 1)) == 0)
        assert(m == exact, s"power of two must be exact: x=$x m=$m")
      assert(m >= prev, s"not monotone at x=$x"); prev = m
    }
  }

  test("bm25: rare-term idf and length normalization order a constructed corpus") {
    // qid 3 = {stream, batch, dup}; padding docs make stream/batch
    // high-df while dup stays rare
    val pad = (10 to 29).map(i => (i.toLong, "stream batch filler words here"))
    val docs = (Seq(
      (1L, "dup stream"), // rare term
      (2L, "stream batch stream batch"), // both terms, tf 2
      (3L, "stream"), // one common term, short
      (4L, "stream " + Seq.fill(40)("pad").mkString(" ")) // same tf, long
    ) ++ pad).toDF("doc_id", "text")
    val s3 = RetrievalOps.bm25Scored(docs)
      .where(col("qid") === 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score"))
      .toMap
    assert(s3(1L) > s3(3L), "rare-term doc must outscore common-term doc")
    assert(s3(3L) > s3(4L), "same tf: shorter doc must win (length norm)")
    assert(s3(2L) > s3(3L), "two matched terms must outscore one")
  }

  test("rank_fusion: rrf recomputes exactly from the member ranks") {
    val rows = SparkEntry.queries("rank_fusion")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = Option(r.getAs[Integer]("rk_bm25")).map(_.toInt)
      val b = Option(r.getAs[Integer]("rk_tf")).map(_.toInt)
      val expect = a.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        b.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(r.getAs[Double]("rrf") == expect, s"rrf drift at $r")
    }
    // ranks are contiguous 1..10 per query
    rows.groupBy(_.getAs[Int]("qid")).values.foreach { g =>
      assert(g.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to 10))
    }
  }

  test("bigram_logprob: bigram counts reconcile with token counts; OOV bounds the mean") {
    val bg = SparkEntry.queries("bigram_logprob")(spark, sf)
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), size(DedupOps.wordsCol(col("text"))).as("n_tok"))
    val joined = bg.join(toks, Seq("doc_id")).collect()
    assert(joined.nonEmpty)
    val totalBg = joined.map(_.getAs[Long]("n_bigrams")).sum
    val oovFloor = 63 - java.lang.Long.numberOfLeadingZeros(totalBg)
    joined.foreach { r =>
      assert(r.getAs[Long]("n_bigrams") == r.getAs[Int]("n_tok") - 1L,
        s"bigram count drift at $r")
      val m = r.getAs[Double]("mean_surprisal")
      assert(m >= 0.0 && m <= oovFloor + 1e-9,
        s"mean surprisal outside [0, oov] at $r")
    }
  }

  test("vocab_coverage reconciles with the corpus token total") {
    val vc = SparkEntry.queries("vocab_coverage")(spark, sf).collect()
    val total = Tables.documents(spark, sf)
      .select(sum(size(DedupOps.wordsCol(col("text")))))
      .first().getLong(0)
    assert(vc.map(_.getAs[Long]("n_tokens")).sum == total)
    vc.foreach { r =>
      val (n, in) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_invocab"))
      assert(in <= n && in > 0)
      assert(r.getAs[Double]("coverage") ==
        rIeeeS(in.toDouble / n, 6), s"coverage drift at $r")
      // fixture vocabulary is 31 tokens; top-16 in-vocab leaves <= 15 OOV types
      assert(r.getAs[Long]("n_oov_types") <= 15)
    }
  }

  test("cooccur_lift: counts bounded, lift recomputes exactly") {
    val n = Tables.documents(spark, sf).count()
    val rows = SparkEntry.queries("cooccur_lift")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach { r =>
      val (ab, a, b) = (r.getAs[Long]("n_ab"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"))
      assert(ab >= 5 && ab <= math.min(a, b))
      assert(r.getAs[Double]("lift") ==
        rIeeeS((n * ab).toDouble / (a * b).toDouble, 6),
        s"lift drift at $r")
    }
  }

  test("html_extract: clean text is markup-free; density and anchor reconcile") {
    val ex = SparkEntry.queries("html_extract")(spark, sf)
    val src = Tables.documents(spark, sf).select(col("doc_id"), col("source"))
    val joined = ex.join(src, Seq("doc_id")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("n_tags") == 10) // the synthetic rendering's tag count
      assert(r.getAs[String]("anchor_text") ==
        r.getAs[String]("source") + " home")
      val d = r.getAs[Double]("link_density")
      assert(d == rIeeeS(r.getAs[String]("anchor_text").length.toDouble /
        r.getAs[Int]("clean_len"), 6), s"density drift at $r")
    }
  }

  test("sample_weighted: well-formed ranks and a length-biased sample") {
    val smp = SparkEntry.queries("sample_weighted")(spark, sf).collect()
    assert(smp.length == 200)
    assert(smp.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to 200))
    assert(smp.map(_.getAs[Long]("doc_id")).distinct.length == 200)
    val sampleAvg = smp.map(_.getAs[Long]("n_chars")).sum.toDouble / 200
    val corpusAvg = Tables.documents(spark, sf)
      .select(avg(col("n_chars"))).first().getDouble(0)
    assert(sampleAvg > corpusAvg,
      s"length-weighted sample must skew long: $sampleAvg vs $corpusAvg")
  }

  test("timeseries_fill: constructed gaps, forward fill, all-NULL bucket") {
    val HR = 3600L * 1000 * 1000 * 1000
    val ev = Seq(
      (1L, 100L * HR + 5L, Some(2.0)), // hour 100, two obs -> avg 3000 milli
      (1L, 100L * HR + 9L, Some(4.0)),
      (1L, 103L * HR + 1L, None), // observed hour, NULL value: no new avg
      (1L, 104L * HR + 2L, Some(5.5)),
      (2L, 200L * HR, Some(7.0))) // single-bucket entity: no gaps
      .toDF("user_id", "ts", "value")
      .select(col("user_id"), col("ts"), col("value").cast("double"))
    val got = RelationalOps.fillHourly(ev)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.getAs[java.lang.Double]("value_filled")).map(_.toDouble),
        r.getBoolean(4)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(
      (1L, 100L, 2L, Some(3000.0), false),
      (1L, 101L, 0L, Some(3000.0), true),
      (1L, 102L, 0L, Some(3000.0), true),
      (1L, 103L, 1L, Some(3000.0), false), // NULL-value bucket carries prior
      (1L, 104L, 1L, Some(5500.0), false),
      (2L, 200L, 1L, Some(7000.0), false)))
  }

  test("timeseries_fill: forward fill stops at the horizon") {
    val HR = 3600L * 1000 * 1000 * 1000
    val ev = Seq(
      (1L, 100L * HR, Some(2.0)), // fills 101..102 (horizon 2), then offline
      (1L, 110L * HR, Some(4.0)), // next obs past horizon: no rows 103..109
      (1L, 112L * HR, None), // NULL bucket still carries 4000 across the gap
      (2L, 200L * HR, Some(7.0)))
      .toDF("user_id", "ts", "value")
      .select(col("user_id"), col("ts"), col("value").cast("double"))
    val got = RelationalOps.fillHourly(ev, horizonHours = 2L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.getAs[java.lang.Double]("value_filled")).map(_.toDouble),
        r.getBoolean(4)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(
      (1L, 100L, 1L, Some(2000.0), false),
      (1L, 101L, 0L, Some(2000.0), true),
      (1L, 102L, 0L, Some(2000.0), true),
      // 103..109 absent: beyond the 2-hour fill horizon
      (1L, 110L, 1L, Some(4000.0), false),
      (1L, 111L, 0L, Some(4000.0), true),
      (1L, 112L, 1L, Some(4000.0), false), // observed NULL bucket: present
      (2L, 200L, 1L, Some(7000.0), false)))
  }

  test("merge_upsert: all five actions on a constructed changelog") {
    val ev = Seq(
      (1L, 500L, 1L, "click", 10.0), // keep
      (2L, 500L, 2L, "click", 10.0), // update ->
      (2L, 1500L, 20L, "view", 20.0),
      (3L, 1500L, 30L, "signup", 30.0), // insert
      (4L, 900L, 4L, "click", 40.0), // delete ->
      (4L, 1500L, 40L, "error", 0.0),
      (5L, 1500L, 50L, "error", 0.0), // noop (delete of absent key)
      (6L, 100L, 60L, "purchase", 1.0), // compaction picks ts 900
      (6L, 900L, 61L, "view", 2.0),
      (6L, 1200L, 62L, "error", 0.0), // superseded delete
      (6L, 1800L, 63L, "click", 3.0)) // update wins
      .toDF("user_id", "ts_us", "event_id", "event_type", "value")
    val got = RelationalOps.mergeActions(ev, 1000L)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3),
        Option(r.getAs[java.lang.Double]("value")).map(_.toDouble)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, "keep", 1L, "click", Some(10.0)),
      (2L, "update", 20L, "view", Some(20.0)),
      (3L, "insert", 30L, "signup", Some(30.0)),
      (4L, "delete", -1L, "none", None),
      (5L, "noop", -1L, "none", None),
      (6L, "update", 63L, "click", Some(3.0))))
  }

  test("phrase_search: hit counts recompute from the raw text") {
    val res = SparkEntry.queries("phrase_search")(spark, sf).collect()
    assert(res.nonEmpty)
    val texts = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def occurrences(text: String, phrase: String): Int = {
      val w = text.split(" ").filter(_.nonEmpty)
      val p = phrase.split(" ")
      (0 to w.length - p.length).count(i => w.slice(i, i + p.length).sameElements(p))
    }
    res.foreach { r =>
      val got = r.getAs[Long]("n_hits")
      val want = occurrences(texts(r.getAs[Long]("doc_id")),
        r.getAs[String]("phrase"))
      assert(got == want && got >= 1, s"hit-count drift at $r (want $want)")
    }
    res.groupBy(_.getAs[Int]("phrase_id")).values.foreach { g =>
      assert(g.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to g.size).toSeq)
    }
  }

  test("retrieval_eval: qrels recompute; metrics are internally consistent") {
    val res = SparkEntry.queries("retrieval_eval")(spark, sf).collect()
    assert(res.map(_.getAs[Int]("qid")).sorted.toSeq == Seq(1, 2, 3))
    // independent qrels recomputation for qid 1 = {hash, join}
    val nRel1 = Tables.documents(spark, sf)
      .select(DedupOps.wordsCol(col("text")).as("w"))
      .where(array_contains(col("w"), "hash") &&
        array_contains(col("w"), "join"))
      .count()
    assert(res.find(_.getAs[Int]("qid") == 1).get.getAs[Long]("n_rel") == nRel1)
    res.foreach { r =>
      val (hits, fr) = (r.getAs[Long]("n_hits10"), r.getAs[Int]("first_rank"))
      assert(hits <= 10 && hits <= r.getAs[Long]("n_rel"))
      assert(r.getAs[Double]("prec_at_10") == hits / 10.0)
      assert(r.getAs[Double]("mrr") ==
        (if (fr > 0) 1.0 / fr else 0.0), s"mrr drift at $r")
      assert((fr == -1) == (hits == 0))
    }
  }

  test("length_histogram: buckets partition the corpus; cumulative closes at 1") {
    val h = SparkEntry.queries("length_histogram")(spark, sf)
      .collect().sortBy(_.getAs[Long]("bucket"))
    val total = Tables.documents(spark, sf).count()
    assert(h.map(_.getAs[Long]("n_docs")).sum == total)
    assert(h.last.getAs[Double]("cum_share") == 1.0)
    h.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(r.getAs[Long]("lo_chars") == (1L << b) - 1)
      assert(r.getAs[Double]("share") ==
        rIeeeS(r.getAs[Long]("n_docs").toDouble / total, 6))
    }
    // cum_share is non-decreasing across the (sorted) bucket domain
    assert(h.map(_.getAs[Double]("cum_share")).toSeq ==
      h.map(_.getAs[Double]("cum_share")).sorted.toSeq)
  }

  test("dataset_diff: statuses follow the version-shim arithmetic exactly") {
    val rows = SparkEntry.queries("dataset_diff")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    val n = Tables.documents(spark, sf).count()
    (0L until n).foreach { id =>
      val inV1 = id % 10 != 0
      val inV2 = id % 7 != 0
      val expect =
        if (inV1 && !inV2) Some("removed")
        else if (!inV1 && inV2) Some("added")
        else if (inV1 && inV2) Some(if (id % 5 == 0) "changed" else "same")
        else None // in neither version: absent from the diff
      assert(rows.get(id) == expect, s"doc $id: ${rows.get(id)} vs $expect")
    }
  }

  test("cluster_topics: well-formed per-cluster rankings over the flagship assignment") {
    val rows = SparkEntry.queries("cluster_topics")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("cluster_id") >= 0 &&
        r.getAs[Int]("cluster_id") < 8)
      assert(r.getAs[Long]("n_ct") >= 5)
      assert(r.getAs[Double]("lift") > 0)
    }
    rows.groupBy(_.getAs[Int]("cluster_id")).values.foreach { g =>
      val sorted = g.sortBy(_.getAs[Int]("rk"))
      assert(sorted.map(_.getAs[Int]("rk")).toSeq == (1 to g.size).toSeq)
      assert(g.map(_.getAs[String]("term")).distinct.length == g.size)
      // ranked by (lift desc, term asc)
      val key = sorted.map(r => (-r.getAs[Double]("lift"),
        r.getAs[String]("term"))).toSeq
      assert(key == key.sorted, s"rank order drift in cluster $g")
    }
  }

  test("incremental_stats: merged statistics equal a direct recompute") {
    val rows = SparkEntry.queries("incremental_stats")(spark, sf).collect()
    assert(rows.nonEmpty)
    // direct recompute over the raw union — the merge must be exact
    val direct = Tables.events(spark, sf)
      .select(col("event_type"),
        floor(col("value") * 1000).cast("long").as("vm"))
      .groupBy(col("event_type"))
      .agg(count(col("vm")).as("n"), sum(col("vm")).as("s"),
        sum(col("vm") * col("vm")).as("q"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    rows.foreach { r =>
      val (n, s, q) = direct(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("n_base") + r.getAs[Long]("n_delta") == n)
      assert(r.getAs[Double]("mean_milli") ==
        rIeeeS(s.toDouble / n, 6), s"mean drift at $r")
      val mean = s.toDouble / n
      assert(r.getAs[Double]("var_milli") ==
        rIeeeS(q.toDouble / n - mean * mean, 6), s"var drift at $r")
      assert(r.getAs[Double]("var_milli") >= 0)
    }
  }

  test("window_ewma recomputes exactly from the raw event sequence") {
    val got = SparkEntry.queries("window_ewma")(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Double]("ewma_milli")).map(_.toDouble))
      .toMap
    val raw = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000").as("ts_us"),
        floor(col("value") * 1000).cast("long").as("vm"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.getAs[java.lang.Long]("vm")).map(_.toLong)))
    assert(got.nonEmpty && got.size == raw.length)
    raw.groupBy(_._1).values.foreach { g =>
      val seq = g.sortBy(t => (t._3, t._2))
      seq.zipWithIndex.foreach { case ((_, eid, _, _), i) =>
        val horizon = (0 until 8).flatMap { k =>
          if (i - k >= 0) seq(i - k)._4.map(v => (v, math.pow(2.0, -k)))
          else None
        }
        val expect =
          if (horizon.isEmpty) None
          else Some(rIeeeS(
            horizon.map { case (v, w) => v.toDouble * w }.sum /
              horizon.map(_._2).sum, 6))
        assert(got(eid) == expect, s"ewma drift at event $eid")
      }
    }
  }

  test("kanon_report: classes partition the corpus; both arms populated") {
    val rows = SparkEntry.queries("kanon_report")(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    assert(rows.exists(_.getAs[Boolean]("is_violation")) &&
      rows.exists(!_.getAs[Boolean]("is_violation")),
      "fixture must exercise both the violating and the safe arm")
    rows.foreach { r =>
      val (n, v) = (r.getAs[Long]("n"), r.getAs[Boolean]("is_violation"))
      assert(v == (n < 8))
      assert(r.getAs[Double]("risk_share") ==
        rIeeeS((if (v) n else 0L).toDouble / total, 6))
    }
  }

  test("hard_negatives: exact partial-match top-10, disjoint from relevant") {
    val got = SparkEntry.queries("hard_negatives")(spark, sf).collect()
    assert(got.nonEmpty)
    // brute-force recheck from the shared BM25 chain: per qid the
    // negative pool is docs matching >= 1 but NOT all terms; its top-10
    // under (score desc, doc_id) must equal the declared result exactly
    val nt = RetrievalOps.QUERIES.groupBy(_._1).view.mapValues(_.size).toMap
    val pool = RetrievalOps.bm25Scored(Tables.documents(spark, sf)).collect()
      .map(r => (r.getAs[Int]("qid"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_terms"), r.getAs[Long]("score")))
      .filter { case (q, _, m, _) => m < nt(q) }
    val expect = pool.groupBy(_._1).map { case (q, g) =>
      q -> g.sortBy(t => (-t._4, t._2)).take(10).zipWithIndex
        .map { case ((_, id, m, s), i) => (i + 1, id, m, s) }.toSeq
    }
    assert(got.map(_.getAs[Int]("qid")).toSet == expect.keySet)
    got.groupBy(_.getAs[Int]("qid")).foreach { case (q, rows) =>
      val gotSeq = rows.sortBy(_.getAs[Int]("rk")).map(r =>
        (r.getAs[Int]("rk"), r.getAs[Long]("doc_id"),
          r.getAs[Long]("n_terms"), r.getAs[Long]("score"))).toSeq
      assert(gotSeq == expect(q), s"qid $q negative top-10 drift")
    }
    // the mined negatives are hard by construction: every one matched at
    // least one query term yet missed at least one — never a full match
    got.foreach { r =>
      val m = r.getAs[Long]("n_terms")
      assert(m >= 1 && m < nt(r.getAs[Int]("qid")))
    }
  }

  test("grouping_sets_agg marginals equal their single-set groupBys") {
    val gs = SparkEntry.queries("grouping_sets_agg")(spark, sf).collect()
    assert(gs.map(_.getAs[Long]("gid")).toSet == Set(1L, 2L))
    val byFlag = Tables.lineitem(spark, sf).groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val flagRows = gs.filter(_.getAs[Long]("gid") == 1L)
    assert(flagRows.map(_.getAs[String]("l_returnflag")).toSet ==
      byFlag.keySet)
    flagRows.foreach { r =>
      assert(r.getAs[Long]("n") == byFlag(r.getAs[String]("l_returnflag")))
      assert(r.getAs[String]("l_linestatus") == null)
    }
  }
}
