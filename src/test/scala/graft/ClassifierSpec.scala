package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** `quality_classifier` contracts: exact fixed-point inference against an
  * independent JVM re-implementation, firing-rate sanity on the fixture,
  * and the weight table's generator-formula equality the oracle depends
  * on. */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  /** Independent scorer: java MessageDigest md5 → 60-bit prefix bucket →
    * formula weight — shares NO code with the Spark expression chain. */
  private def refLogit(text: String): (Int, Long) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val toks = text.split(" ").filter(_.nonEmpty)
    val logit = TextOps.CLF_BIAS_MICROS + toks.map { t =>
      val hex = md.digest(t.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      val bucket = (java.lang.Long.parseLong(hex, 16) % 256).toInt
      TextOps.clfWeightMicros(bucket)
    }.sum
    (toks.length, logit)
  }

  test("constructed corpus scores match an independent md5 scorer") {
    val docs = Seq(
      (1L, "join a filter window row"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "hash hash hash hash"), // repeated token: weight counts per use
      (4L, "   "), // whitespace-only: zero tokens
      (5L, "xyzzy")) // single out-of-vocab token
      .toDF("doc_id", "text")
    val got = TextOps.clfScored(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    Seq(1L, 2L, 3L, 5L).foreach { id =>
      val text = docs.where(col("doc_id") === id)
        .select(col("text")).first().getString(0)
      val (n, logit) = refLogit(text)
      val expectScore = logit.toDouble / n
      val expectPass = logit >= n * TextOps.CLF_THRESH_MICROS_PER_TOK
      assert(got(id) === ((n, logit, expectScore, expectPass)),
        s"doc $id drifted from the independent scorer")
    }
    // empty doc: bias-only logit, zero score, never passes
    assert(got(4L) === ((0, TextOps.CLF_BIAS_MICROS, 0.0, false)))
  }

  test("fixture firing rate is a real split, not a constant gate") {
    val res = SparkEntry.queries("quality_classifier")(spark, sf)
    val n = res.count().toDouble
    val kept = res.where(col("pass")).count().toDouble
    assert(n > 0)
    val rate = kept / n
    assert(rate > 0.05 && rate < 0.95,
      s"pass rate $rate — the classifier is not separating the fixture")
  }

  test("weight table matches its oracle generator formula") {
    // the DuckDB oracle re-derives the weight table inline from the
    // formula; the Spark plan folds TextOps.clfWeights as a literal map.
    // Evaluate the literal map and diff it against the formula so the
    // two can never drift apart silently.
    val evaluated = spark.range(1)
      .select(TextOps.clfWeights.as("m")).first()
      .getMap[Int, Long](0)
    assert(evaluated.size === TextOps.CLF_BUCKETS)
    (0 until TextOps.CLF_BUCKETS).foreach { b =>
      assert(evaluated(b) === TextOps.clfWeightMicros(b))
      assert(TextOps.clfWeightMicros(b) === (b * 2654435761L) % 4001L - 2000L)
    }
    // mixed-sign, non-degenerate weights: a one-sided table would make
    // pass a length test rather than a content test
    val ws = (0 until TextOps.CLF_BUCKETS).map(TextOps.clfWeightMicros)
    assert(ws.count(_ > 0) > 32 && ws.count(_ < 0) > 32)
  }

  test("trained classifier matches an independent JVM derivation") {
    // weight induction + doc scoring re-derived sharing no Spark
    // expression code: labels from the DECLARED quality_score relation
    // (independent of the train query's internal join), java
    // MessageDigest bucketing, plain-Scala counting, and the same
    // dsirLpMicros arithmetic the model documents.
    val labels = SparkEntry.queries("quality_score")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getDouble(4) >= 0.35)).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(t: String): Int = {
      val hex = md.digest(t.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      (java.lang.Long.parseLong(hex, 16) % TextOps.CLF_BUCKETS).toInt
    }
    val nPos = new Array[Long](TextOps.CLF_BUCKETS)
    val nNeg = new Array[Long](TextOps.CLF_BUCKETS)
    docs.foreach { case (id, text) =>
      val arr = if (labels(id)) nPos else nNeg
      text.split(" ").filter(_.nonEmpty).foreach(t => arr(bucket(t)) += 1)
    }
    val (totPos, totNeg) = (nPos.sum, nNeg.sum)
    val dw = (0 until TextOps.CLF_BUCKETS).map(b =>
      TextOps.dsirLpMicros(nPos(b), totPos) -
        TextOps.dsirLpMicros(nNeg(b), totNeg)).toArray
    val train = SparkEntry.queries("quality_classifier_train")(spark, sf)
      .collect().map(r =>
        r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(train.keySet === (0 until TextOps.CLF_BUCKETS).toSet)
    (0 until TextOps.CLF_BUCKETS).foreach { b =>
      assert(train(b) === ((nPos(b), nNeg(b), dw(b))),
        s"bucket $b model row drifted from the independent derivation")
    }
    val learned = SparkEntry.queries("quality_classifier_learned")(
      spark, sf).collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    docs.foreach { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      val logit = toks.map(t => dw(bucket(t))).sum
      val expect = (toks.length.toLong, logit,
        toks.nonEmpty && logit >= 0L)
      assert(learned(id) === expect, s"doc $id learned score drifted")
    }
    // the learned gate must separate the fixture, not rubber-stamp it
    assert(learned.values.exists(_._3) && learned.values.exists(!_._3))
  }

  test("quality_calibration matches an independent JVM re-binning") {
    // re-derive every bin from the DECLARED relations (labels from
    // quality_score, logits from quality_classifier_learned — the rows
    // the calibration claims to histogram), sharing no binning code
    val labels = SparkEntry.queries("quality_score")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getDouble(4) >= 0.35)).toMap
    val logits = SparkEntry.queries("quality_classifier_learned")(spark, sf)
      .collect().filter(_.getLong(1) > 0) // labeled population: tokenful
      .map(r => r.getLong(0) -> r.getLong(2))
    assert(logits.length === labels.size,
      "calibration population must equal the labeled population")
    val W = TextOps.CAL_BIN_MICROS
    val span = TextOps.CAL_BIN_SPAN * W
    def binOf(lg: Long): Int =
      (((math.max(math.min(lg, span - 1), -span) + span) / W)
        - TextOps.CAL_BIN_SPAN).toInt
    val expect = logits.groupBy { case (_, lg) => binOf(lg) }
      .map { case (b, docs) =>
        val nPos = docs.count { case (id, _) => labels(id) }
        b -> (docs.length.toLong, nPos.toLong,
          nPos.toLong * 1000 / docs.length,
          docs.map(_._2).sum)
      }
    val got = SparkEntry.queries("quality_calibration")(spark, sf)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet === expect.keySet)
    expect.foreach { case (b, e) =>
      assert(got(b) === e, s"bin $b drifted from the JVM re-binning") }
    // the measured fixture property the scaladoc claims: the positive
    // rate is nondecreasing in the logit — the model orders the labels
    val rates = got.toSeq.sortBy(_._1).map(_._2._3)
    assert(rates.zip(rates.tail).forall { case (a, b) => a <= b },
      s"pos_rate_milli must be monotone on the fixture: $rates")
    assert(rates.last === 1000L && rates.head === 0L,
      "both extremes of the reliability curve must be exercised")
  }

  test("quality_classifier_eval re-derives from the declared gate outputs") {
    // confusion matrix recomputed from the DECLARED relations (labels
    // from quality_score, decisions from quality_classifier_learned on
    // the tokenful population) — no aggregation code shared
    val labels = SparkEntry.queries("quality_score")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getDouble(4) >= 0.35)).toMap
    val preds = SparkEntry.queries("quality_classifier_learned")(spark, sf)
      .collect().filter(_.getLong(1) > 0)
      .map(r => r.getLong(0) -> (r.getLong(2) >= 0L))
    assert(preds.length === labels.size)
    val tp = preds.count { case (id, p) => p && labels(id) }.toLong
    val fp = preds.count { case (id, p) => p && !labels(id) }.toLong
    val fn = preds.count { case (id, p) => !p && labels(id) }.toLong
    val tn = preds.count { case (id, p) => !p && !labels(id) }.toLong
    val r = SparkEntry.queries("quality_classifier_eval")(spark, sf)
      .collect() match { case Array(one) => one }
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((tp, fp, fn, tn)))
    assert(r.getLong(4) === tp * 1000 / (tp + fp))
    assert(r.getLong(5) === tp * 1000 / (tp + fn))
    assert(r.getLong(6) === (tp + tn) * 1000 / (tp + fp + fn + tn))
    // the measured fixture facts the learned-gate scaladocs claim:
    // full recall of the heuristic positives, imperfect precision
    assert(r.getLong(5) === 1000L, "learned gate must recover every positive")
    assert(r.getLong(1) > 0L, "the fixture must exercise false positives")
  }

  test("dsir_sample matches an independent JVM model + race re-derivation") {
    // full end-to-end recheck on the fixture sharing no Spark expression
    // code: java MessageDigest hashing, plain-Scala counting for both
    // bucket LMs, the Mitchell-log2 race keys, and an in-memory top-K —
    // the exact (rk, doc_id, logw) list must agree.
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(t: String): Int = {
      val hex = md.digest(t.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      (java.lang.Long.parseLong(hex, 16) % TextOps.DSIR_BUCKETS).toInt
    }
    val toks = docs.map { case (id, lang, text) =>
      (id, lang, text.split(" ").filter(_.nonEmpty).map(bucket)) }
    val nRaw = new Array[Long](TextOps.DSIR_BUCKETS)
    val nTgt = new Array[Long](TextOps.DSIR_BUCKETS)
    toks.foreach { case (_, lang, bs) => bs.foreach { b =>
      nRaw(b) += 1; if (lang == TextOps.DSIR_TARGET_LANG) nTgt(b) += 1 } }
    val totRaw = nRaw.sum; val totTgt = nTgt.sum
    val dw = (0 until TextOps.DSIR_BUCKETS).map(b =>
      TextOps.dsirLpMicros(nTgt(b), totTgt) -
        TextOps.dsirLpMicros(nRaw(b), totRaw)).toArray
    val expect = toks.map { case (id, _, bs) =>
      val logw = bs.map(dw(_)).sum
      val uInt = (id * 2654435761L) % 4294967295L + 1L
      val eInt = math.floor(
        (32.0 - TextOps.log2mD(uInt)) * 1099511627776.0).toLong
      val race = (TextOps.log2mD(eInt) - 40.0) - logw.toDouble / 1048576.0
      (race, id, logw)
    }.sortBy(t => (t._1, t._2)).take(TextOps.DSIR_K)
      .zipWithIndex.map { case ((_, id, logw), i) => (i + 1, id, logw) }
    val got = SparkEntry.queries("dsir_sample")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(3))).sortBy(_._1)
    assert(got.length === TextOps.DSIR_K)
    assert(got.toSeq === expect.toSeq,
      "dsir_sample drifted from the independent re-derivation")
  }
}
