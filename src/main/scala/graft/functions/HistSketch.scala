package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Fixed-bin histogram sketch of a non-negative double column — the
  * engine's custom-UDAF surface (typed `Aggregator`, registered with
  * `functions.udaf`). The buffer is a plain `Array[Long]` of bin
  * counts, so partial aggregation is map-side (each task emits one
  * bins-long array, not its rows) and `merge` is element-wise
  * addition — the same mergeability contract as a DataSketches HLL:
  * sketches of disjoint slices combine into the sketch of the union
  * without revisiting the data.
  *
  * Bin bounds are data-independent (`min(floor(x / width), bins-1)`)
  * so building needs no global min/max pre-pass and two sketches built
  * anywhere always share a bin layout. Quantile read-off (upper bin
  * edge at the target rank) is deliberately conservative: the estimate
  * is exact to one bin width, which `QuantileSketchSpec` asserts
  * against the exact percentile.
  *
  * Parameterized by (bins, width) so each caller sizes the layout to
  * its value domain: `Analytics.quantileRollup` uses the default
  * 64 × 25 000 geometry over order totals (`HistSketch`), and
  * `Quality.madOutliersSketch` a 256 × 250-cent geometry over event
  * values. Both instantiate the same class — one kernel, one merge
  * law, one spec surface.
  */
class HistSketchAgg(val bins: Int, val width: Double)
    extends Aggregator[Double, Array[Long], Array[Long]]
    with Serializable {

  def zero: Array[Long] = new Array[Long](bins)

  def reduce(b: Array[Long], x: Double): Array[Long] = {
    val i = math.min(math.max((x / width).toInt, 0), bins - 1)
    b(i) += 1L
    b
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bins) { a(i) += b(i); i += 1 }
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

/** The original 64-bin × 25 000-width instance (order-total domain). */
object HistSketch extends HistSketchAgg(64, 25000.0) {
  val Bins = 64
  val Width = 25000.0
}
