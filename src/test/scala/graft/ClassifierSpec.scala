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
}
