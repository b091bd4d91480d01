package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al.
  * 2002; mergeable form per Beyer et al., SIGMOD'07 "distinct-value
  * synopses"). Keep the k smallest of the values' uniform [0,1)
  * hashes; then the distinct count is exactly the kept-set size while
  * ndv ≤ k, and (k-1)/u_(k) beyond it (u_(k) = the kth smallest hash),
  * with relative error ~1/√k. Unlike HyperLogLog the kept hashes
  * support SET ALGEBRA: union = merge-and-recap (same op as the
  * aggregation merge), and intersection via the Jaccard ratio over
  * the union sketch — the audience-overlap estimator HLL cannot give.
  *
  * Buffer is a plain array<double> SQL value — columnar through the
  * shuffle, ≤ 2k doubles per task. Inserts append and compact every
  * 2k arrivals (amortized O(log) sorts); compaction keeps the k
  * smallest DISTINCT hashes, which is lossless for every later k-min
  * question: a discarded hash ranked > k among distinct values seen
  * so far can never re-enter the k-minimum set, because more data
  * only shrinks it. (At extreme throughput swap the array for a
  * bounded heap; the contract is unchanged.)
  */
class KmvSketch(k: Int)
    extends Aggregator[Double, Seq[Double], Seq[Double]]
    with Serializable {
  require(k >= 16)

  private def compact(b: Seq[Double]): Seq[Double] =
    b.sorted.distinct.take(k)

  def zero: Seq[Double] = Vector.empty

  def reduce(b: Seq[Double], u: Double): Seq[Double] = {
    val grown = b :+ u
    if (grown.size > 2 * k) compact(grown) else grown
  }

  def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] =
    compact(a ++ b)

  def finish(b: Seq[Double]): Seq[Double] = compact(b)

  private val enc: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
  def bufferEncoder: Encoder[Seq[Double]] = enc
  def outputEncoder: Encoder[Seq[Double]] = enc
}

/** Driver-plane estimator over finished sketches (arrays of ≤ k
  * doubles — kilobytes; the set algebra never touches the data).
  */
object Kmv {

  /** ndv estimate: exact below k (the sketch holds every distinct
    * hash), (k-1)/u_(k) at saturation.
    */
  def estimate(k: Int, s: Seq[Double]): Double =
    if (s.size < k) s.size.toDouble else (k - 1).toDouble / s.last

  /** The union's sketch is just the merge — KMV is closed under union. */
  def union(k: Int, a: Seq[Double], b: Seq[Double]): Seq[Double] =
    (a ++ b).sorted.distinct.take(k)

  /** |A ∩ B| via the Jaccard ratio estimator: among the union
    * sketch's hashes (a uniform sample of A ∪ B's distinct values),
    * the fraction present in both sketches estimates J(A,B); scale by
    * the union estimate. Exact in the sub-k regime.
    */
  def intersection(k: Int, a: Seq[Double], b: Seq[Double]): Double = {
    val x = union(k, a, b)
    if (x.isEmpty) return 0d
    val (sa, sb) = (a.toSet, b.toSet)
    val both = x.count(v => sa(v) && sb(v))
    if (x.size < k) both.toDouble
    else both.toDouble / x.size * estimate(k, x)
  }
}
