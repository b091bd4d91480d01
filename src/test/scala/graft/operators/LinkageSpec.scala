package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage: the pattern table must
  * cover the blocked pair space exactly, and the EM-fitted posterior
  * must be the monotone image of the likelihood ratio it is defined
  * from (bit-exactness vs DuckDB is the driver oracle's job —
  * linkageOracle replays the chained EM arithmetic op-for-op).
  */
class LinkageSpec extends SparkSpec {

  test("linkageFellegiSunter: pattern counts partition the blocked " +
    "pair space; posterior is the monotone image of the LR; is_match " +
    "is exactly the >0.5 posterior threshold") {
    val out = Pipelines.linkageFellegiSunter(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(out.nonEmpty && out.size <= 8)
    assert(out.map(t => (t._1, t._2, t._3)).distinct.length == out.length)
    out.foreach { case (g1, g2, g3, n, lr, post, isM) =>
      assert(Seq(g1, g2, g3).forall(g => g == 0 || g == 1))
      assert(n > 0)
      assert(lr >= 0)
      assert(post >= 0 && post <= 1000000L)
      assert(isM == (post > 500000L))
    }
    // completeness: Σ n_pairs over patterns = the blocked pair count,
    // replayed with an independent one-join SQL count
    val pp = graft.Tables.part(spark, sfDir).select(
      col("p_partkey"),
      element_at(split(col("p_name"), " "), -1).as("noun"),
      col("p_size"), col("p_type"))
    val nPairs = pp.alias("a").join(pp.alias("b"),
      col("a.noun") === col("b.noun") &&
        col("a.p_size") === col("b.p_size") &&
        col("a.p_type") === col("b.p_type") &&
        col("a.p_partkey") < col("b.p_partkey")).count()
    assert(out.map(_._4).sum == nPairs, "pattern table != pair space")
    // posterior = p·LR / (p·LR + 1 − p) is strictly increasing in LR,
    // so ordering by LR must order the posteriors too (±1 micro for
    // the independent roundings of the two columns)
    val sorted = out.sortBy(t => (t._5, t._6))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._6 >= a._6 - 1,
          s"posterior not monotone in LR: $a then $b")
      case _ => ()
    }
  }
}
