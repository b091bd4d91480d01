package graft.operators

import graft.SparkSpec

/** Spec for the NN-descent refinement round: the raw IVF-dependent
  * hit counts the assertion-form query cannot ship to the oracle —
  * asserted here with real numbers: monotone per probe (a theorem:
  * the refined list is the exact-scored top-k of a superset of the
  * seed list), bounded by k, and STRICTLY improving somewhere (the
  * measured fact that makes the round worth running — if the 2-hop
  * expansion never recovers a missed true neighbor the operator is
  * decorative).
  */
class NnDescentSpec extends SparkSpec {

  test("nnDescentRound: per-probe hits monotone, bounded by k, and " +
    "strictly improved for at least one probe") {
    val k = 5
    val out = Similarity.nnDescentRound(spark, sfDir, k,
        withCounts = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 8)
    out.foreach { case (q, seed, refined) =>
      assert(seed >= 0 && seed <= k, s"probe $q")
      assert(refined >= seed && refined <= k, s"probe $q")
      assert(refined >= 1, s"probe $q found nothing")
    }
    assert(out.exists { case (_, s0, r0) => r0 > s0 },
      "the 2-hop expansion never recovered a missed neighbor")
    // the seed list must also MISS something, or the eval is vacuous
    assert(out.exists(_._2 < k), "IVF seed already perfect — vacuous")
  }
}
