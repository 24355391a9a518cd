package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<double>` columns, expression-first (no UDFs).
  *
  * Re-expresses the reference's missing `Point` class contract
  * (`/root/reference/SparKMeansGroupBy.java:80-113` call sites — see
  * SURVEY.md §1.2): Minkowski distances, norms, element-wise add/divide.
  * Every function here stays inside whole-stage codegen via higher-order
  * functions (`aggregate`/`zip_with`/`transform`); the reference instead
  * re-parses strings inside the innermost loop
  * (`/root/reference/SparKMeansGroupBy.java:87`, O(n·k) parses/iteration).
  */
object VectorOps {

  /** Cast a float/any numeric array to array<double> once, up front. */
  def asDouble(c: Column): Column = c.cast("array<double>")

  /** L1 norm — `Point.point_abs_sum`
    * (`/root/reference/SparKMeansGroupByPlusPlusInitMaxFarthestManhattan.java:80`). */
  def l1Norm(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => acc + abs(x))

  /** Squared L2 norm (fold, no intermediate array). */
  def l2NormSq(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => acc + x * x)

  /** L2 norm — `Point.point_distance_with_zero`
    * (`/root/reference/SparKMeansGroupByPlusPlusInitMax.java:80`). */
  def l2Norm(v: Column): Column = sqrt(l2NormSq(v))

  /** Dot product of two equal-arity vectors. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Squared Euclidean distance. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0),
      (acc, x) => acc + x)

  /** Euclidean distance — `Point.distance_paradigm(p, q, 2)`
    * (`/root/reference/SparKMeansGroupBy.java:88`). */
  def euclidean(a: Column, b: Column): Column = sqrt(sqDist(a, b))

  /** Manhattan distance — `Point.distance_paradigm(p, q, 1)`. */
  def manhattan(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => abs(x - y)), lit(0.0),
      (acc, x) => acc + x)

  /** Minkowski distance of order p (reference `--paradigm` CLI knob,
    * `/root/reference/SparKMeansGroupBy.java:44`). */
  def minkowski(a: Column, b: Column, p: Double): Column =
    pow(aggregate(zip_with(a, b, (x, y) => pow(abs(x - y), p)), lit(0.0),
      (acc, x) => acc + x), 1.0 / p)

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Deterministic pseudo-random permutation of a non-negative int64 id
    * (Knuth multiplicative hash mod 2^32). Used instead of `rand(seed)`
    * everywhere a "random" sample must hash-match the DuckDB oracle:
    * `ORDER BY (id * 2654435761) % 4294967296` is computable identically in
    * both engines. Replaces the reference's `takeSample(false, k)`
    * (`/root/reference/SparKMeansGroupBy.java:68`).
    */
  def perm(id: Column): Column =
    pmod(id * lit(2654435761L), lit(4294967296L))

  /** Uniform (0,1) deterministic per-row draw derived from [[perm]]. */
  def unitUniform(id: Column): Column =
    (perm(id) + lit(0.5)) / lit(4294967296.0)

  /** Per-(id, round) uniform draw for multi-round seeding: the round index
    * is mixed in (id·31+r is injective per round for r < 31) and the mixed
    * key reduces mod 2^31 BEFORE the Knuth multiply so the product stays
    * inside int64 for any id < 2^63/31 ≈ 3e17 — the raw (id·31+r)·Knuth
    * product overflowed (DuckDB errors; ANSI Spark throws) once id
    * exceeded ~1.1e8, a 31× lower ceiling than [[perm]] itself. */
  def roundUniform(id: Column, round: Int): Column =
    (pmod(pmod(id * lit(31L) + lit(round.toLong), lit(2147483648L)) *
      lit(2654435761L), lit(4294967296L)) + lit(0.5)) / lit(4294967296.0)

  /** Integer floor(log2(x)) for a positive integer column, as
    * bitlength−1 — the exact-arithmetic log primitive behind the
    * surprisal scores (`unigram_logprob` et al.). */
  def ilog2(x: Column): Column = (length(bin(x)) - 1).cast("long")

  /** Deterministic piecewise-linear log2 of a POSITIVE INTEGER column
    * (Mitchell's approximation): with e = bitlength(x)−1 and mantissa
    * m = x/2^e ∈ [1,2), returns e + (m − 1) ≈ log2(x), max error
    * ~0.086 at m≈1.44. Every step is exact IEEE arithmetic — the
    * bitlength is integer, 2^e is exactly representable, and dividing
    * by a power of two is exact — so Spark and DuckDB compute
    * bit-identical values from identical inputs, which no
    * transcendental log library guarantees (the same reason
    * `unigram_logprob` uses integer surprisal). Callers needing
    * fractional-log resolution (BM25 idf) scale the argument by 2^k
    * first and subtract k. */
  def log2m(x: Column): Column = {
    val e = ilog2(x)
    // pow(2, e) is exactly representable (e ≤ 62), so Math.pow returns
    // it exactly and the division by it is exact — matching the SQL
    // twin's integer `1 << e`
    e.cast("double") + x.cast("double") / pow(lit(2.0), e.cast("double")) - lit(1.0)
  }

  /** Round to 4 decimals — the float tolerance for oracle hash-compare. */
  def r4(c: Column): Column = round(c, 4)

  /** Engine-identical rounding for HALF-BOUNDARY-PRONE values: discrete
    * inputs (2-decimal prices, small-integer token ratios) often land
    * EXACTLY on a rounding half-boundary, where Spark's exact-decimal
    * HALF_UP and DuckDB's float-multiply `round` disagree by one grid
    * step (observed: p50 of an even-count price column, quality scores
    * with n_tokens = 32). `floor(x·10^k + 0.5)/10^k` is pure IEEE
    * arithmetic, so both engines compute bit-identical results from
    * identical inputs — they can no longer disagree, whatever side of
    * the boundary the float lands on. NEGATIVE values round half-cases
    * toward +inf rather than HALF_UP's away-from-zero (floor(-2.5+.5) =
    * -2, not -3): cross-engine parity still holds — both sides run the
    * identical IEEE ops — but call sites feeding sums that can go
    * negative (the window/session `sum(value)` aggregates) accept the
    * toward-+inf convention by design (round-7 ADVICE). */
  def rIeee(c: Column, decimals: Int): Column = {
    val scale = math.pow(10.0, decimals)
    floor(c * scale + lit(0.5)) / scale
  }
}

/** DuckDB-SQL fragments mirroring [[VectorOps]] exactly (same fold order,
  * double math on float32 inputs) so oracle strings stay in lock-step with
  * the Spark expressions they verify.
  */
object VectorSql {
  def asDouble(c: String): String = s"$c::DOUBLE[]"
  def l1(c: String): String =
    s"list_aggregate(list_transform(${asDouble(c)}, x -> abs(x)), 'sum')"
  def l2sq(c: String): String =
    s"list_aggregate(list_transform(${asDouble(c)}, x -> x*x), 'sum')"
  def l2(c: String): String = s"sqrt(${l2sq(c)})"
  def dot(a: String, b: String): String =
    s"list_aggregate(list_transform(list_zip(${asDouble(a)}, ${asDouble(b)}), p -> p[1]*p[2]), 'sum')"
  def sqDist(a: String, b: String): String =
    s"list_aggregate(list_transform(list_zip(${asDouble(a)}, ${asDouble(b)}), p -> (p[1]-p[2])*(p[1]-p[2])), 'sum')"
  def euclidean(a: String, b: String): String = s"sqrt(${sqDist(a, b)})"
  def manhattan(a: String, b: String): String =
    s"list_aggregate(list_transform(list_zip(${asDouble(a)}, ${asDouble(b)}), p -> abs(p[1]-p[2])), 'sum')"
  def minkowski(a: String, b: String, p: Double): String =
    s"pow(list_aggregate(list_transform(list_zip(${asDouble(a)}, ${asDouble(b)}), q -> pow(abs(q[1]-q[2]), $p)), 'sum'), ${1.0 / p})"
  def cosine(a: String, b: String): String =
    s"(${dot(a, b)} / (${l2(a)} * ${l2(b)}))"
  def perm(id: String): String = s"(($id * 2654435761) % 4294967296)"
  /** DuckDB rendering of [[VectorOps.unitUniform]] — the deterministic
    * id → (0,1) hash uniform behind every base/delta and train/holdout
    * split; ONE definition so split oracles can't drift from each other
    * or from the Spark column. */
  def unitUniform(id: String): String =
    s"((($id * 2654435761) % 4294967296 + 0.5) / 4294967296.0)"
  def roundUniform(id: String, r: Int): String =
    s"((((($id * 31 + $r) % 2147483648) * 2654435761) % 4294967296) + 0.5) / 4294967296.0"
  /** DuckDB rendering of [[VectorOps.ilog2]]. */
  def ilog2(x: String): String = s"(length(bin($x)) - 1)::BIGINT"
  /** DuckDB rendering of [[VectorOps.log2m]] — Mitchell log2 over a
    * positive integer expression; exact IEEE steps, see the Scala twin. */
  def log2m(x: String): String =
    s"(${ilog2(x)}::DOUBLE + ($x)::DOUBLE / (1::BIGINT << ${ilog2(x)})::DOUBLE - 1.0)"
  def rIeee(e: String, decimals: Int): String = {
    val s = BigDecimal(10).pow(decimals).toBigInt
    s"(floor(($e) * $s + 0.5) / $s)"
  }
}
