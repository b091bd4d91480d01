package graft.operators

import graft.{SparkSpec, Tables}

/** Kneser–Ney bigram LM laws (Chen & Goodman 1999): probabilities in
  * (0, 1], the absolute discount reserves mass per context (seen mass
  * strictly below 1 wherever more than one continuation exists), and
  * the distributed pipeline equals a sequential recompute of the same
  * five-op IEEE formula BIT-exactly — the property that lets the
  * DuckDB oracle replay it without a tolerance.
  */
class TextLmSpec extends SparkSpec {

  test("knBigram: bit-exact vs sequential recompute; 0 < p ≤ 1; " +
    "per-context seen mass < 1 when any continuation mass is reserved") {
    val out = TextAnalysis.knBigram(spark, sfDir, minCount = 1).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap

    // sequential recompute from raw text with the same tokenizer
    // (trim → lower → split \s+; empty/1-token docs contribute none)
    val bc = scala.collection.mutable.Map.empty[(String, String), Long]
    Tables.documents(spark, sfDir).select("text").collect().foreach { r =>
      val ts = r.getString(0).trim.toLowerCase.split("\\s+", -1)
      if (ts.length > 1) ts.sliding(2).foreach { p =>
        bc((p(0), p(1))) = bc.getOrElse((p(0), p(1)), 0L) + 1
      }
    }
    val cw1 = bc.groupBy(_._1._1).view
      .mapValues(m => (m.values.sum, m.size.toLong)).toMap
    val cont = bc.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val b = bc.size.toLong
    assert(out.keySet == bc.keySet)
    out.foreach { case ((w1, w2), (c, p)) =>
      assert(c == bc((w1, w2)))
      val (cw, n1w) = cw1(w1)
      val expect = (c - 0.75) / cw + ((0.75 * n1w) / cw) * (cont(w2).toDouble / b)
      assert(p == expect, s"($w1,$w2): $p vs $expect")
      assert(p > 0.0 && p <= 1.0, s"($w1,$w2): p=$p out of range")
    }
    // discount reserve: any context with ≥ 2 distinct continuations
    // keeps seen mass under 1 (the reserved mass backs off to the
    // continuation distribution over the full vocab)
    out.groupBy(_._1._1).foreach { case (w1, ps) =>
      if (cw1(w1)._2 >= 2) {
        val mass = ps.values.map(_._2).sum
        assert(mass < 1.0 + 1e-12, s"context $w1 seen mass $mass")
      }
    }
  }
}
