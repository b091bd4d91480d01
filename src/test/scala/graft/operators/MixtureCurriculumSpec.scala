package graft.operators

import graft.{SparkSpec, Tables}

/** Specs for the round-10 mixture/curriculum pair: driver-side
  * recompute of the integer laws plus the measured properties the
  * oracle's replay can't distinguish from coincidence (temperature
  * actually compresses shares; stages are balanced and monotone).
  */
class MixtureCurriculumSpec extends SparkSpec {

  test("mixtureTemperature: isqrt/ppm laws recompute; the dominant " +
    "domain is downsampled and every smaller domain boosted") {
    val out = TextAnalysis.mixtureTemperature(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(out.length >= 2, "need at least two domains")
    val totTok = out.map(_._3).sum
    val totW = out.map(_._4).sum
    out.foreach { case (d, _, tok, w, nat, samp, boost, quota) =>
      assert(w == math.sqrt(tok.toDouble).toLong, s"$d isqrt")
      assert(w * w <= tok && (w + 1) * (w + 1) > tok, s"$d isqrt law")
      assert(nat == 1000000L * tok / totTok, s"$d natural_ppm")
      assert(samp == 1000000L * w / totW, s"$d sample_ppm")
      assert(boost == 1000L * samp / nat, s"$d boost_pm")
      assert(quota == 100000L * w / totW, s"$d quota")
    }
    // α = 1/2 compresses: the max-token domain's sampled share sits
    // below its natural share, the min-token domain's above it
    val top = out.maxBy(_._3); val bottom = out.minBy(_._3)
    assert(top._6 < top._5, s"dominant ${top._1} not downsampled")
    assert(bottom._6 > bottom._5, s"smallest ${bottom._1} not boosted")
    // quotas budget-feasible: Σ quota ≤ declared budget
    assert(out.map(_._8).sum <= 100000L)
  }

  test("curriculumStages: stages balanced within 1 doc, difficulty " +
    "bands monotone, shares sum to ~1e6, totals reconcile") {
    val out = Pipelines.curriculumStages(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.map(_._1).toSeq == (0L until out.length).toSeq)
    val nDocs = Tables.documents(spark, sfDir).count()
    out.foreach { case (st, n, _, _, _, _) =>
      assert(math.abs(n - nDocs / out.length) <= 1, s"stage $st size $n")
    }
    assert(out.map(_._2).sum == nDocs)
    // bands monotone: a stage's hardest doc is never harder than the
    // next stage's easiest (== allowed: equal-length docs straddle)
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._3, s"stages ${a._1}->${b._1} bands overlap")
    }
    val ppm = out.map(_._6).sum
    assert(ppm > 1000000L - out.length && ppm <= 1000000L,
      s"ppm sum $ppm") // floor-div loses < 1 ppm per stage
    // a length curriculum must actually tilt token mass to the late
    // stages — the last stage carries more tokens than the first
    assert(out.last._5 > out.head._5, "curriculum tilt vacuous")
  }
}
