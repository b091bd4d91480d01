package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Per-group top-k as a MERGEABLE aggregate. The partial (map-side)
  * phase caps each task's contribution at k rows per group, so the
  * exchange carries at most k × tasks rows per group regardless of
  * group size. Spark 4's `WindowGroupLimit` gives the bare
  * `row_number() <= k` window the same map-side prune (pinned
  * elsewhere in PlanQualitySpec) — what the AGGREGATE form adds is
  * composability: top-k is a value in an ordinary groupBy, so it
  * rides in the same pass as other aggregates (sums, counts,
  * sketches), lands as an array for downstream per-group logic, and
  * works where the window rewrite never fires (streaming aggregation
  * state, rollup/cube grids).
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
