package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mutable (sum-vector, count) buffer for [[CentroidAgg]]. */
case class CentroidBuf(var sums: Array[Double], var n: Long)

/** Generic-dimension centroid mean as a typed `Aggregator` — the UDAF
  * surface from SURVEY.md §2.6: the reference's per-group
  * `Point.add`-fold + `Point.divide(count)`
  * (`/root/reference/SparKMeansGroupBy.java:104-114`,
  * `/root/reference/BeamKmeansSideInput.java:107-120`) as a partial+final
  * aggregate. Unlike the fixed-arity `avg(v[i])` column expansion in
  * `KMeansOps.recompute`, this handles any dimensionality at runtime; the
  * buffer is one d-vector + count per (partition, group), merged
  * associatively — map-side combine keeps the shuffle at O(k·d) per
  * partition, the same sufficient-statistics topology MLlib uses.
  */
object CentroidAgg extends Aggregator[Seq[Double], CentroidBuf, Seq[Double]] {

  def zero: CentroidBuf = CentroidBuf(Array.emptyDoubleArray, 0L)

  def reduce(b: CentroidBuf, v: Seq[Double]): CentroidBuf = {
    // null/zero-length vectors contribute nothing and must not count toward
    // n: an empty-sums-but-counted buffer would be dropped by merge's
    // isEmpty short-circuit and skew the divisor partition-dependently
    // (and a null row reaching the udaf must skip, not NPE the query)
    if (v == null || v.isEmpty) return b
    if (b.sums.isEmpty) b.sums = new Array[Double](v.length)
    var i = 0
    while (i < b.sums.length) { b.sums(i) += v(i); i += 1 }
    b.n += 1
    b
  }

  def merge(a: CentroidBuf, b: CentroidBuf): CentroidBuf =
    if (a.sums.isEmpty) b
    else if (b.sums.isEmpty) a
    else {
      var i = 0
      while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
      a.n += b.n
      a
    }

  def finish(r: CentroidBuf): Seq[Double] =
    if (r.n == 0L) Seq.empty else r.sums.map(_ / r.n).toSeq

  def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]
  def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}
