package graft.operators

import graft.SparkSpec

/** The distributed logistic-regression trainer: gradient descent must
  * actually descend, and the surfaced weights must be the ones that
  * produced that descent (exactness vs DuckDB is the driver oracle's
  * job — logregOracle replays the chained arithmetic bit-for-bit).
  */
class LearnSpec extends SparkSpec {

  test("three GD iterations strictly reduce train log-loss from the " +
    "w=0 start, and the surfaced micro-weights reproduce that loss") {
    val out = Learn.trainQualityClassifier(spark, sfDir).collect()
    assert(out.map(_.getString(0)).toSeq ==
      Seq("bias", "x_chars_h", "x_src0"))
    val w = out.map(_.getLong(1) / 1e6).toSeq
    assert(w.exists(_ != 0.0), s"degenerate all-zero weights: $w")
    val l0 = Learn.logLoss(spark, sfDir, Seq(0.0, 0.0, 0.0))
    val lT = Learn.logLoss(spark, sfDir, w)
    // w=0 gives exactly ln 2 per row
    assert(math.abs(l0 - math.log(2.0)) < 1e-12)
    assert(lT < l0, s"loss did not descend: $lT >= $l0")
  }
}
