package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Per-group top-k as a MERGEABLE aggregate — the scale-safe
  * replacement for the `row_number() OVER (PARTITION BY g ORDER BY v)
  * <= k` pattern. The window formulation shuffles EVERY row of every
  * group and sorts each group in full; this aggregator's partial
  * (map-side) phase caps each task's contribution at k rows per
  * group, so the exchange carries at most k × tasks rows per group
  * regardless of group size — the same partial-vs-window trade
  * TakeOrderedAndProject makes for the global top-k.
  *
  * Ordering: (value DESC, id ASC) — the id tiebreak makes the result
  * deterministic and oracle-replayable. Buffer is a sorted
  * array<struct<v,id>> capped at k: columnar through the shuffle,
  * and compaction (sort + take k) is lossless for every later top-k
  * question because a row ranked below k in any partial can never
  * enter the final top k.
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)],
      Seq[(Double, Long)]]
    with Serializable {
  require(k >= 1)

  // DESC by value, ASC by id — Ordering on the tuple mirrors it
  private def compact(b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.sortBy { case (v, id) => (-v, id) }.take(k)

  def zero: Seq[(Double, Long)] = Vector.empty

  def reduce(b: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] = {
    val grown = b :+ x
    if (grown.size > 2 * k) compact(grown) else grown
  }

  def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    compact(a ++ b)

  def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = compact(b)

  private val enc: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  def bufferEncoder: Encoder[Seq[(Double, Long)]] = enc
  def outputEncoder: Encoder[Seq[(Double, Long)]] = enc
}
