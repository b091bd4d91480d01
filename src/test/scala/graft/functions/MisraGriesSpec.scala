package graft.functions

import org.apache.spark.sql.{Encoders, functions => F}
import graft.SparkSpec

/** The Misra–Gries guarantees that make heavyHitters' exact-verify
  * pass sound: every item above the N/(m+1) frequency bar survives
  * any partitioning, and kept counters undercount by at most
  * N/(m+1). Exercised on skewed synthetic data where the capacity
  * genuinely overflows (the documents corpus has vocabulary < m, so
  * decrements never fire there).
  */
class MisraGriesSpec extends SparkSpec {

  // 600×a + 300×b + 100 singletons = N=1000; m=4 → bar N/(m+1)=200:
  // a and b MUST survive, estimates undercount by ≤ 200
  private def skewed = {
    val rows = (Seq.fill(600)("a") ++ Seq.fill(300)("b") ++
      (1 to 100).map(i => s"tail_$i"))
    spark.createDataset(rows)(Encoders.STRING).toDF("token")
  }

  test("misra-gries: heavy items survive every partitioning, bounded " +
    "undercount") {
    val mg = F.udaf(new MisraGries(4), Encoders.STRING)
    for (parts <- Seq(1, 7, 32)) {
      val summary = skewed.repartition(parts)
        .agg(mg(F.col("token")).as("s"))
        .head.getMap[String, Long](0)
      val m = summary.toMap
      assert(m.contains("a") && m.contains("b"),
        s"parts=$parts lost a heavy hitter: ${m.keySet}")
      assert(m.size <= 4, s"capacity violated: $m")
      assert(m("a") <= 600 && m("a") >= 600 - 200, s"a estimate ${m("a")}")
      assert(m("b") <= 300 && m("b") >= 300 - 200, s"b estimate ${m("b")}")
    }
  }

  test("heavyHitters query: equals the exact top-10 from a full groupBy") {
    import graft.operators.TextAnalysis
    val out = TextAnalysis.heavyHitters(spark, sfDir).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("n")))
    val exact = graft.Tables.documents(spark, sfDir)
      .select(F.explode(F.split(F.lower(F.trim(F.col("text"))), "\\s+"))
        .as("token"))
      .groupBy("token").agg(F.count(F.lit(1)).as("n"))
      .orderBy(F.desc("n"), F.asc("token")).limit(10).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("n")))
    assert(out.toSeq == exact.toSeq)
  }
}
