package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The KMV sketch pinned in both regimes: EXACT below k (what the
  * driver oracle relies on at test sf), bounded-error at saturation
  * (what a 100 TB run would be in), and partition-invariant merging
  * (a sketch whose value depends on task scheduling is useless).
  */
class KmvSketchSpec extends SparkSpec {

  private val k = 512
  private def hashU(c: org.apache.spark.sql.Column) =
    (xxhash64(c).cast("double") / lit(math.pow(2, 64))) + lit(0.5)

  private def sketchOf(n: Int, parts: Int): Seq[Double] = {
    import spark.implicits._
    val sk = udaf(new KmvSketch(k))
    (1 to n).toDF("x").repartition(parts)
      .select(hashU(col("x")).as("u"))
      .agg(sk(col("u"))).collect()(0).getSeq[Double](0)
  }

  test("sub-k regime is exact; merge is partition-invariant") {
    val a = sketchOf(500, 1) // 500 < k: every distinct hash kept
    assert(Kmv.estimate(k, a) == 500d)
    assert(sketchOf(500, 7) == a, "sketch depends on partitioning")
  }

  test("saturation regime: ~1/sqrt(k) relative error on ndv, union " +
    "and intersection") {
    import spark.implicits._
    val sk = udaf(new KmvSketch(k))
    // A = 1..60000, B = 40001..100000 → |A∩B| = 20000, |A∪B| = 100000
    val df = (1 to 100000).toDF("x")
      .select(col("x"), hashU(col("x")).as("u")).repartition(16)
    val a = df.filter(col("x") <= 60000)
      .agg(sk(col("u"))).collect()(0).getSeq[Double](0)
    val b = df.filter(col("x") > 40000)
      .agg(sk(col("u"))).collect()(0).getSeq[Double](0)
    assert(a.size == k && b.size == k, "not saturated")
    def relErr(est: Double, truth: Double) = math.abs(est - truth) / truth
    assert(relErr(Kmv.estimate(k, a), 60000) < 0.15, Kmv.estimate(k, a))
    assert(relErr(Kmv.estimate(k, Kmv.union(k, a, b)), 100000) < 0.15)
    // the ratio estimator compounds union error with sampling error —
    // 0.25 is ~3 standard errors for J=0.2 at k=512
    assert(relErr(Kmv.intersection(k, a, b), 20000) < 0.25,
      Kmv.intersection(k, a, b))
  }

  test("saturated intersection across overlap regimes: high, low, and " +
    "disjoint") {
    import spark.implicits._
    val sk = udaf(new KmvSketch(k))
    val df = (1 to 100000).toDF("x")
      .select(col("x"), hashU(col("x")).as("u")).repartition(16)
    def sketchRange(lo: Int, hi: Int): Seq[Double] =
      df.filter(col("x") > lo && col("x") <= hi)
        .agg(sk(col("u"))).collect()(0).getSeq[Double](0)
    def relErr(est: Double, truth: Double) = math.abs(est - truth) / truth
    // HIGH overlap (J ≈ 0.8): A = 1..50000, B = 5001..55000 → ∩ 45000.
    // The ratio estimator's error SHRINKS with J (sampling variance
    // ~J(1-J)/k): 0.12 ≈ 3 standard errors plus the union estimate's
    // own 1/√k
    val hiA = sketchRange(0, 50000); val hiB = sketchRange(5000, 55000)
    assert(hiA.size == k && hiB.size == k)
    assert(relErr(Kmv.intersection(k, hiA, hiB), 45000) < 0.12,
      Kmv.intersection(k, hiA, hiB))
    // LOW overlap (J ≈ 0.026): A = 1..50000, B = 47501..100000 →
    // ∩ 2500. Relative error blows up as 1/J (few shared samples in
    // the union's bottom-k) — the honest bound is ABSOLUTE: within
    // ~3·√(J(1-J)/k)·|A∪B| ≈ 2100 of truth
    val loA = sketchRange(0, 50000); val loB = sketchRange(47500, 100000)
    assert(math.abs(Kmv.intersection(k, loA, loB) - 2500) < 2100,
      Kmv.intersection(k, loA, loB))
    // DISJOINT: A = 1..50000, B = 50001..100000 → the estimate must
    // collapse toward zero (same absolute band around 0), never a
    // phantom overlap
    val dA = sketchRange(0, 50000); val dB = sketchRange(50000, 100000)
    assert(Kmv.intersection(k, dA, dB) < 2100,
      Kmv.intersection(k, dA, dB))
  }
}
