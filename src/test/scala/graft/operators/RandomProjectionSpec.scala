package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Johnson–Lindenstrauss contract of the seeded ±1 random projection:
  * after 1/dOut scaling, squared pairwise distances are preserved in
  * aggregate, and the implicit sign matrix is balanced (the arithmetic
  * hash bit is not degenerate).
  */
class RandomProjectionSpec extends SparkSpec {

  test("randomProjection: squared distances preserved on average (JL)") {
    val dOut = 16
    val proj = Similarity.randomProjection(spark, sfDir, dOut)
      .collect()
      .groupBy(_.getAs[Long]("vec_id"))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getAs[Int]("dim")).map(_.getAs[Double]("val"))
      }
    val orig = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    assert(proj.keySet == orig.keySet)
    assert(proj.values.forall(_.length == dOut))

    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = orig.keys.toArray.sorted.take(40)
    val ratios = for {
      i <- ids.indices; j <- (i + 1) until ids.length
      lo = d2(orig(ids(i)), orig(ids(j))) if lo > 1e-9
    } yield d2(proj(ids(i)).toArray, proj(ids(j)).toArray) / dOut / lo
    assert(ratios.nonEmpty)
    val mean = ratios.sum / ratios.size
    assert(mean > 0.7 && mean < 1.3, s"mean distance ratio $mean")
    // no catastrophic single-pair distortion (sign rows uncorrelated)
    assert(ratios.count(r => r < 0.1 || r > 4.0) <= ratios.size / 20,
      "too many badly-distorted pairs")
  }

  test("vector kernels reject wrong element types at ANALYSIS time " +
    "(no silent memory reinterpretation)") {
    val s = spark
    import s.implicits._
    graft.functions.VectorExpressions.ensureRegistered(s)
    val doubles = Seq((1L, Array(1.0, 2.0))).toDF("id", "v")
    // array<double> into the float kernels: analysis error, not garbage
    for (bad <- Seq("vector_project(v, 4)", "vector_dot(v, v)")) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        doubles.selectExpr(bad).collect()
      }
      assert(e.getMessage.toLowerCase.contains("array<float>") ||
        e.getMessage.contains("DATATYPE_MISMATCH"), e.getMessage)
    }
    // non-literal output dim: rejected too
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((1L, Array(1.0f))).toDF("id", "v")
        .selectExpr("vector_project(v, cast(id as int))").collect()
    }
    assert(e2.getMessage.contains("literal") ||
      e2.getMessage.contains("DATATYPE_MISMATCH"), e2.getMessage)
    // and array<float> into the double kernel
    val e3 = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((Array(1.0f), Array(1.0), Array(0.0)))
        .toDF("v", "c", "i")
        .selectExpr("vector_argmin_l2(v, c, i)").collect()
    }
    assert(e3.getMessage.contains("array<double>") ||
      e3.getMessage.contains("DATATYPE_MISMATCH"), e3.getMessage)
  }

  test("randomProjection: implicit sign matrix is balanced per row") {
    // re-derive the sign bits the operator computes and check each
    // output dimension mixes roughly half +1 / half -1 over 64 inputs
    for (k <- 0 until 16) {
      val plus = (0 until 64).count { j =>
        val h = (k + 1) * 2654435761L % 1048573L
        val g = (j + 1) * 2654435761L % 1048573L
        ((((h + 1) * (g + 1)) >> 10) & 1L) == 0L
      }
      assert(plus >= 20 && plus <= 44, s"row $k unbalanced: $plus/64 positive")
    }
  }

  test("standardize: every dimension lands at mean≈0, std≈1") {
    val byDim = Similarity.standardize(spark, sfDir).collect()
      .groupBy(_.getAs[Int]("dim"))
    assert(byDim.nonEmpty)
    byDim.foreach { case (d, rows) =>
      val zs = rows.map(_.getAs[Double]("z"))
      val mean = zs.sum / zs.length
      val std = math.sqrt(zs.map(z => (z - mean) * (z - mean)).sum / zs.length)
      assert(math.abs(mean) < 1e-6, s"dim $d mean $mean")
      assert(math.abs(std - 1.0) < 0.01, s"dim $d std $std")
    }
  }
}
