package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters summary (Misra & Gries 1982; mergeable
  * form per Agarwal et al., PODS'12): at most `m` counters over a
  * token stream. Guarantees after any sequence of reduces and merges
  * over N items: every item with true frequency > N/(m+1) is present,
  * and each kept counter undercounts its item by at most N/(m+1).
  *
  * This is the candidate-generation half of the heavy-hitters pattern
  * (TextAnalysis.heavyHitters): the sketch fans in map-side — each
  * task emits ≤ m counters, not its token counts — and the exact
  * verification pass touches only the candidates. The buffer is a
  * plain map<string,bigint> SQL value, so partials stay columnar
  * through the shuffle. (At extreme cardinality swap the immutable
  * map for an open-addressing table; the contract is unchanged.)
  */
class MisraGries(m: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]]
    with Serializable {
  require(m >= 1)

  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    b.get(x) match {
      case Some(c)            => b.updated(x, c + 1L)
      case None if b.size < m => b.updated(x, 1L)
      case None => // all counters decrement; the arrival is discarded
        b.flatMap { case (k, c) =>
          if (c > 1L) Some(k -> (c - 1L)) else None
        }
    }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    }
    if (sum.size <= m) sum
    else {
      // subtract the (m+1)-th largest count from everything; positives
      // survive — the mergeable-summaries equivalent of the decrement
      val cut = sum.values.toArray.sortWith(_ > _).apply(m)
      sum.flatMap { case (k, c) =>
        if (c > cut) Some(k -> (c - cut)) else None
      }
    }
  }

  def finish(b: Map[String, Long]): Map[String, Long] = b

  private val enc: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  def bufferEncoder: Encoder[Map[String, Long]] = enc
  def outputEncoder: Encoder[Map[String, Long]] = enc
}
