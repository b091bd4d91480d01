package graft.operators

import graft.SparkSpec

/** Quantified cross-checks for the no-oracle dedup queries at sf0.01 —
  * the driver's correctness gate can only row-count them (hash-family
  * outputs aren't SQL-expressible in DuckDB), so this spec pins their
  * candidate sets against the oracle-verified `ngramJaccard` ground
  * truth (3-gram Jaccard ≥ 0.5, the planted near-dup pairs) with
  * explicit precision/recall bounds.
  */
class DedupRecallSpec extends SparkSpec {
  private val sf01 = "/root/testdata/sf0.01"

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val truth = pairs(Dedup.ngramJaccard(spark, sf01))

  test("sf0.01 ground truth: the 25 planted near-dup pairs") {
    assert(truth.size == 25, s"ground truth ${truth.size}")
  }

  test("minhash+LSH at sf0.01: precision 1.0, recall >= 0.9") {
    val mh = pairs(Dedup.minhashPairs(spark, sf01))
    assert(mh.subsetOf(truth), "minhash pairs are Jaccard-verified")
    val recall = mh.size.toDouble / truth.size
    assert(recall >= 0.9, s"minhash recall $recall")
  }

  test("simhash pairs at sf0.01: recall and precision bounds") {
    val sh = pairs(Dedup.simhashPairs(spark, sf01))
    val recall = truth.intersect(sh).size.toDouble / truth.size
    val precision = truth.intersect(sh).size.toDouble / sh.size
    assert(recall >= 0.6, s"simhash recall $recall")
    assert(precision >= 0.05, s"simhash precision $precision")
  }

  test("payload fingerprint at sf0.01: precision 1.0 (Jaccard-verified " +
    "output), candidate recall >= 0.9") {
    val ph = pairs(Multimodal.payloadNearDup(spark, sf01))
    // output is verified — every pair is a true near-dup
    assert(ph.subsetOf(truth), "payload pairs are Jaccard-verified")
    val recall = ph.size.toDouble / truth.size
    assert(recall >= 0.9, s"payload-fingerprint recall $recall")
  }

  test("decontaminate at sf0.01: near-dup partners of benchmark docs flagged") {
    val flagged = Dedup.decontaminate(spark, sf01).collect()
      .map(r => r.getLong(0)).toSet
    // any planted near-dup pair straddling the benchmark boundary
    // (one member in doc_id % 25 == 0, the other not) MUST surface:
    // 3-gram Jaccard >= 0.5 docs certainly share an 8-gram
    val straddling = truth.flatMap { case (a, b) =>
      if (a % 25 == 0 && b % 25 != 0) Some(b)
      else if (b % 25 == 0 && a % 25 != 0) Some(a)
      else None
    }
    assert(straddling.nonEmpty, "expected straddling planted pairs at sf0.01")
    straddling.foreach(d => assert(flagged.contains(d), s"doc $d not flagged"))
    // and no benchmark doc is ever reported as contaminated train data
    assert(flagged.forall(_ % 25 != 0))
  }

  test("winnow pairs at sf0.01: recall and precision bounds") {
    val wp = pairs(TextAnalysis.winnowPairs(spark, sf01))
    val recall = truth.intersect(wp).size.toDouble / truth.size
    val precision = truth.intersect(wp).size.toDouble / wp.size
    assert(recall >= 0.6, s"winnow recall $recall")
    assert(precision >= 0.5, s"winnow precision $precision")
  }

  test("source overlap matrix: reconciles with the per-doc ground " +
    "truth and its own internal bounds") {
    val m = Dedup.sourceOverlap(spark, sf01).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    m.foreach { case ((a, b), (sh, cand, near)) =>
      assert(a < b, "unordered or self pair")
      assert(sh >= 1 && cand >= 0 && near <= cand, s"($a,$b) bounds")
    }
    // the matrix's cross-source near-dup total must equal the
    // oracle-verified jaccard pair set restricted to cross-source
    val srcOf = graft.Tables.documents(spark, sf01)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val crossTruth = truth.filter { case (x, y) => srcOf(x) != srcOf(y) }
    assert(m.values.map(_._3).sum == crossTruth.size,
      "near-dup totals disagree with ground truth")
    // and each cross-source truth pair lands in ITS source cell
    crossTruth.foreach { case (x, y) =>
      val key = if (srcOf(x) < srcOf(y)) (srcOf(x), srcOf(y))
        else (srcOf(y), srcOf(x))
      assert(m(key)._3 >= 1, s"pair ($x,$y) missing from cell $key")
    }
  }
}
