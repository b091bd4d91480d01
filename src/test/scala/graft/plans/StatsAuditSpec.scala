package graft.plans

import graft.SparkSpec

/** Spec for the ANALYZE-stats audit: the raw catalog estimates the
  * assertion-form query cannot ship to the oracle, asserted with
  * real numbers — rowCount must be exactly right (it is a count),
  * the HLL++ distinctCount must sit inside the envelope, and for
  * the LOW-cardinality columns (3 statuses, 5 priorities) the
  * sketch must in fact be exact (HLL++ is exact in its sparse
  * regime — if these drift, someone broke stats collection, not
  * the sketch's error budget).
  */
class StatsAuditSpec extends SparkSpec {

  test("ANALYZE stats: rowCount exact; ndv exact on low-cardinality " +
    "columns and inside the envelope on the high one") {
    val out = StatsAudit.audit(spark, sfDir, withEstimates = true)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(out.keySet ==
      Set("o_custkey", "o_orderstatus", "o_orderpriority"))
    val nRows = graft.Tables.orders(spark, sfDir).count()
    out.foreach { case (c, (actual, ndvExact, statRows, ndvEst)) =>
      assert(actual == nRows && statRows == nRows, c)
      if (c == "o_custkey")
        assert(math.abs(ndvEst - ndvExact) <=
          math.max(ndvExact * 0.15, 2.0), c)
      else assert(ndvEst == ndvExact, c) // sparse regime: exact
    }
  }
}
