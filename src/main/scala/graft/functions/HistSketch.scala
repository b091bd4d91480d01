package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Fixed-bin histogram sketch of a non-negative double column — the
  * engine's custom-UDAF surface (typed `Aggregator`, registered with
  * `functions.udaf`). The buffer is a plain `Array[Long]` of bin
  * counts, so partial aggregation is map-side (each task emits one
  * 64-long array, not its rows) and `merge` is element-wise addition —
  * the same mergeability contract as a DataSketches HLL: sketches of
  * disjoint slices combine into the sketch of the union without
  * revisiting the data.
  *
  * Bin bounds are data-independent (`min(floor(x / Width), Bins-1)`)
  * so building needs no global min/max pre-pass and two sketches built
  * anywhere always share a bin layout. Quantile read-off (upper bin
  * edge at the target rank) is deliberately conservative: the estimate
  * is exact to one bin width, which `QuantileSketchSpec` asserts
  * against the exact percentile.
  */
object HistSketch extends Aggregator[Double, Array[Long], Array[Long]] {
  val Bins = 64
  val Width = 25000.0

  def zero: Array[Long] = new Array[Long](Bins)

  def reduce(b: Array[Long], x: Double): Array[Long] = {
    val i = math.min(math.max((x / Width).toInt, 0), Bins - 1)
    b(i) += 1L
    b
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < Bins) { a(i) += b(i); i += 1 }
    a
  }

  def finish(b: Array[Long]): Array[Long] = b

  // array<bigint> as a real SQL type (NOT an opaque serialized blob):
  // the buffer stays columnar through the shuffle and the output is
  // posexplode-able by the caller
  private val enc: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def bufferEncoder: Encoder[Array[Long]] = enc
  def outputEncoder: Encoder[Array[Long]] = enc
}
