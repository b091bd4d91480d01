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

  test("calibrationEce: bins are the div-10 coarsening of the 100-bucket " +
    "score histogram; gap is internally consistent; ECE lands in [0,1]") {
    val cal = Learn.calibrationEce(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(cal.nonEmpty)
    assert(cal.map(_._1).toSeq == cal.map(_._1).toSeq.sorted)
    cal.foreach { case (bin, n, pos, mass, gap) =>
      assert(bin >= 0 && bin <= 9)
      assert(pos >= 0 && pos <= n)
      assert(gap == math.abs(mass - pos * 1000000L))
      assert(mass >= 0 && mass <= n * 1000000L)
    }
    // cross-operator law: scoreQualityClassifier's floor(p*100) buckets
    // coarsened by div 10 (bucket 100 clamps to bin 9, the same p=1.0
    // clamp as least(floor(p*10),9)) must reproduce n_docs and p_mass
    // bucket-for-bucket — two independent plans over the same sigmoid
    val score = Learn.scoreQualityClassifier(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val coarse = score.groupBy { case (bkt, _, _) => math.min(bkt / 10, 9) }
      .view.mapValues(g => (g.map(_._2).sum, g.map(_._3).sum)).toMap
    assert(cal.map(c => c._1 -> ((c._2, c._4))).toMap == coarse)
    val nTot = cal.map(_._2).sum
    val ece = cal.map(_._5).sum.toDouble / (nTot * 1e6)
    assert(ece >= 0.0 && ece <= 1.0, s"ECE out of range: $ece")
  }

  test("activeLearningMargin: TopKAgg selection equals the row_number " +
    "window replay over the same scored docs; ranks consecutive, " +
    "margins non-decreasing within each language") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val k = 20
    val got = Learn.activeLearningMargin(spark, sfDir, k).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (lang, rows) =>
      val ordered = rows.sortBy(_._2)
      assert(ordered.map(_._2).toSeq == (1L to ordered.size).toSeq,
        s"$lang ranks not consecutive")
      assert(ordered.map(_._4).toSeq == ordered.map(_._4).toSeq.sorted,
        s"$lang margins not sorted")
    }
    // independent path: per-language row_number window (the form the
    // oracle uses) over the shared scoring expression
    val m = Learn.scoredDocs(spark, sfDir)
      .select(col("lang"), col("doc_id"),
        abs(round(col("p") * 1e6).cast("long") - 500000L).as("mm"))
    val win = Window.partitionBy("lang").orderBy(col("mm"), col("doc_id"))
    val want = m.withColumn("rk", row_number().over(win).cast("long"))
      .filter(col("rk") <= k)
      .select("lang", "rk", "doc_id", "mm").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.sortBy(x => (x._1, x._2)).toSeq ==
      want.sortBy(x => (x._1, x._2)).toSeq)
  }
}
