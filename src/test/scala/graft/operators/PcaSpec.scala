package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Cross-consistency checks for the no-oracle PCA operator: the
  * linear-algebra invariants that hold EXACTLY in exact arithmetic,
  * asserted to tight float tolerances — orthonormal components,
  * descending non-negative eigenvalues, projected variance per
  * component equal to its eigenvalue, and the top-k subspace
  * explaining more variance than a uniform (and a random-projection)
  * share would.
  */
class PcaSpec extends SparkSpec {

  private val k = 8

  test("pca: components are orthonormal, eigenvalues descending >= 0") {
    val (evals, flat, _) = Similarity.pcaModel(spark, sfDir, k)
    val d = flat.length / k
    assert(evals.length == k)
    assert(evals.forall(_ >= -1e-12), evals.mkString(","))
    assert(evals.sliding(2).forall(p => p(0) >= p(1) - 1e-12),
      evals.mkString(","))
    for (a <- 0 until k; b <- a until k) {
      val dot = (0 until d).map(j => flat(a * d + j) * flat(b * d + j)).sum
      val expect = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-9, s"C$a . C$b = $dot")
    }
  }

  test("pca: projected variance per component equals its eigenvalue; " +
    "top-k explains more than the uniform share") {
    val (evals, flat, _) = Similarity.pcaModel(spark, sfDir, k)
    val d = flat.length / k
    val proj = Similarity.pca(spark, sfDir, k)
    // population variance of each projected coordinate — the mean is
    // ~0 by construction (centering offsets), variance = eigenvalue
    val stats = proj.groupBy("dim")
      .agg(avg(col("val")).as("m"),
        avg(col("val") * col("val")).as("m2"))
      .orderBy("dim")
      .collect()
    assert(stats.length == k)
    stats.foreach { r =>
      val dim = r.getInt(0)
      val m = r.getDouble(1)
      val variance = r.getDouble(2) - m * m
      assert(math.abs(m) < 1e-6, s"dim $dim mean $m not centered")
      assert(math.abs(variance - evals(dim)) <=
        1e-6 * math.max(1.0, evals(dim)),
        s"dim $dim variance $variance != eigenvalue ${evals(dim)}")
    }
    // total input variance = trace = sum of ALL eigenvalues; recompute
    // the trace from the raw embeddings and compare the explained share
    val tr = Tables.embeddings(spark, sfDir)
      .select(posexplode(col("embedding")).as(Seq("j", "x")))
      .groupBy("j")
      .agg(avg(col("x").cast("double")).as("m"),
        avg(col("x").cast("double") * col("x").cast("double")).as("m2"))
      .select(sum(col("m2") - col("m") * col("m")).as("tr"))
      .head().getDouble(0)
    val explained = evals.sum / tr
    assert(explained > k.toDouble / 64 + 0.01,
      s"top-$k explains $explained — no better than uniform")
  }
}
