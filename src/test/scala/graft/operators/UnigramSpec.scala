package graft.operators

import graft.SparkSpec

/** The unigram-LM tokenizer pinned on its model laws: hard-EM
  * monotonicity over the actual per-round objectives (not just the
  * query's folded boolean), a vocabulary that really LEARNED
  * multi-char pieces (char-fallback-only would satisfy every
  * reconstruction law vacuously), and end-to-end determinism — the
  * property that lets a trained model go through the driver's
  * hash-compare gate at all.
  */
class UnigramSpec extends SparkSpec {

  test("gate query: every assertion column true, corpus totals " +
    "positive, byte-identical across runs") {
    val a = Unigram.unigramLm(spark, sfDir).collect().head
    assert(a.getLong(0) > 0 && a.getLong(1) > 0 && a.getLong(2) > 0)
    for (i <- 3 to 6)
      assert(a.getBoolean(i), s"assertion column $i false: $a")
    val b = Unigram.unigramLm(spark, sfDir).collect().head
    assert(a == b, "training is not deterministic across runs")
  }

  test("model shape: vocab within target, multi-char pieces learned, " +
    "EM objective strictly informative and monotone per round") {
    val (vocabSize, nMulti, lls) =
      Unigram.modelSummary(spark, sfDir, vocabTarget = 256, emRounds = 3)
    assert(vocabSize <= 256, s"vocab $vocabSize over target")
    assert(nMulti > 0, "no multi-char piece survived — char fallback " +
      "satisfies the reconstruction laws vacuously; training learned " +
      "nothing")
    assert(lls.size == 3)
    lls.zip(lls.tail).foreach { case (x, y) =>
      assert(y >= x - 1e-6 * math.abs(x), s"EM objective fell: $lls")
    }
  }
}
