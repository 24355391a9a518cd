package graft

import graft.functions.VectorOps._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Distance/norm axioms (SURVEY.md §5 item 3): checked against hand-computed
  * values and scalacheck-generated vectors evaluated through the actual
  * Catalyst expressions. (Raw scalacheck `Gen` + seeded sampling — the
  * scalatestplus bridge isn't in the offline artifact cache.)
  */
class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  private def evalPair(a: Seq[Double], b: Seq[Double],
      f: (Column, Column) => Column): Double =
    Seq((a, b)).toDF("a", "b").select(f(col("a"), col("b"))).head.getDouble(0)

  private def evalOne(a: Seq[Double], f: Column => Column): Double =
    Seq(Tuple1(a)).toDF("a").select(f(col("a"))).head.getDouble(0)

  test("norms against hand-computed values") {
    assert(evalOne(Seq(3.0, -4.0), l1Norm) === 7.0)
    assert(evalOne(Seq(3.0, -4.0), l2Norm) === 5.0)
    assert(evalOne(Seq.empty[Double], l1Norm) === 0.0)
  }

  test("distances against hand-computed values") {
    assert(evalPair(Seq(0.0, 0.0), Seq(3.0, 4.0), euclidean) === 5.0)
    assert(evalPair(Seq(1.0, 2.0), Seq(4.0, 6.0), manhattan) === 7.0)
    assert(evalPair(Seq(1.0, 0.0), Seq(0.0, 1.0), dot) === 0.0)
    assert(math.abs(evalPair(Seq(1.0, 0.0), Seq(1.0, 0.0), cosine) - 1.0) < 1e-12)
    assert(math.abs(
      evalPair(Seq(1.0, 2.0), Seq(4.0, 6.0), minkowski(_, _, 3.0)) -
        math.cbrt(27.0 + 64.0)) < 1e-12)
  }

  private val vecGen = for {
    n <- Gen.choose(1, 8)
    xs <- Gen.listOfN(n, Gen.choose(-100.0, 100.0))
  } yield xs

  private def samples(n: Int): Seq[List[Double]] =
    (0 until n).flatMap(i =>
      vecGen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("euclidean: symmetry, identity, triangle inequality (20 random vectors)") {
    samples(20).foreach { a =>
      val b = a.map(_ + 1.0)
      val c = a.map(_ * 0.5)
      val dab = evalPair(a, b, euclidean)
      val dba = evalPair(b, a, euclidean)
      val daa = evalPair(a, a, euclidean)
      val dac = evalPair(a, c, euclidean)
      val dcb = evalPair(c, b, euclidean)
      assert(math.abs(dab - dba) < 1e-9)
      assert(daa === 0.0)
      assert(dab <= dac + dcb + 1e-9)
    }
  }

  test("manhattan dominates euclidean (L1 >= L2 pointwise)") {
    samples(20).foreach { a =>
      val b = a.map(x => -x + 2.0)
      assert(evalPair(a, b, manhattan) >= evalPair(a, b, euclidean) - 1e-9)
    }
  }

  test("perm is injective on small domain (deterministic sampling key)") {
    val ids = spark.range(1000).toDF("id")
    assert(ids.select(perm(col("id"))).distinct().count() === 1000L)
  }
}
