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

  test("nnDescent: recall curve across 2 bounded rounds — " +
    "nondecreasing per probe per round, round 1 strictly gains, and " +
    "round 1's list equals the single-round operator's") {
    val k = 5
    val curve = Similarity.nnDescent(spark, sfDir, k, rounds = 2,
        withCounts = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(curve.length == 8)
    curve.foreach { case (q, h0, h1, h2) =>
      assert(h0 >= 0 && h0 <= k, s"probe $q seed")
      assert(h1 >= h0 && h1 <= k, s"probe $q round 1 not monotone")
      assert(h2 >= h1 && h2 <= k, s"probe $q round 2 not monotone")
    }
    // the measured curve: round 1 must strictly gain somewhere (the
    // refinement is load-bearing) and total recall never regresses
    val (t0, t1, t2) = (curve.map(_._2).sum, curve.map(_._3).sum,
      curve.map(_._4).sum)
    assert(t1 > t0, s"round 1 gained nothing: $t0 -> $t1")
    assert(t2 >= t1, s"round 2 regressed: $t1 -> $t2")
    // cross-check: the curve's round-1 column is the same number the
    // single-round operator reports (shared refineOnce step)
    val one = Similarity.nnDescentRound(spark, sfDir, k,
        withCounts = true).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    curve.foreach { case (q, _, h1, _) =>
      assert(one(q) == h1, s"probe $q: curve r1 $h1 != round op ${one(q)}")
    }
  }
}
