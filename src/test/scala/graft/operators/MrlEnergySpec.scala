package graft.operators

import graft.{SparkSpec, Tables}

/** Spec for the Matryoshka truncation-energy audit: a BigDecimal
  * driver-side replay of the quantized prefix-energy ratios, plus the
  * structural laws (full level exactly 10^6 ppm; retained energy
  * monotone in the truncation dimension per vector, hence in every
  * rollup stat).
  */
class MrlEnergySpec extends SparkSpec {

  private def replay(levels: Seq[Int]) = {
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getSeq[Float](1).toArray)
    // per vector: quantized element energies, prefix sums per level
    val perVec = vecs.map { v =>
      val q = v.map(x => BigDecimal(x.toDouble * 1000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      val e = q.map(x => x * x)
      levels.map(d => e.take(d).sum) // last level = full length (64)
    }.filter(_.last > 0)
    levels.indices.map { i =>
      val ppms = perVec.map(es => es(i) * 1000000L / es.last)
      (levels(i), perVec.length.toLong,
        ppms.sum / perVec.length, ppms.min, ppms.max,
        ppms.count(_ >= 990000L).toLong)
    }
  }

  test("mrlEnergy: every per-level stat matches the quantized " +
    "driver-side replay; the full level is exactly 10^6 ppm") {
    val out = Similarity.mrlEnergy(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val expect = replay(Seq(4, 16, 64))
    assert(out.toSeq == expect)
    val full = out.last
    assert(full._1 == 64 && full._3 == 1000000L &&
      full._4 == 1000000L && full._5 == 1000000L && full._6 == full._2)
    // projection never gains energy: stats monotone across levels
    assert(out.map(_._3).toSeq == out.map(_._3).toSeq.sorted)
    assert(out.map(_._4).toSeq == out.map(_._4).toSeq.sorted)
  }
}
