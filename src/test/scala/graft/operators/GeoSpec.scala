package graft.operators

import graft.{SparkSpec, Tables}

/** Spec for the grid-cell spatial radius join: the cell blocking must
  * equal a driver-side brute-force O(n²) scan exactly (zero recall
  * loss — the cell-size-= -radius lemma), each pair must appear once,
  * and the exact-distance filter must actually reject some
  * neighbor-cell candidates (i.e. the cells alone are NOT the
  * answer).
  */
class GeoSpec extends SparkSpec {

  test("cellJoin: equals the brute-force pair scan; pairs unique; " +
    "the exact filter rejects some cell candidates") {
    val r = 20000L
    val out = Geo.cellJoin(spark, sfDir).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val ids = Tables.customer(spark, sfDir)
      .select("c_custkey").collect().map(_.getLong(0))
    val pts = ids.map(id => (id,
      id * 2654435761L % 1000000L,
      id / 150L * 1000000L + id * 2246822519L % 1000000L))
    val brute = (for {
      (a, alat, alon) <- pts; (b, blat, blon) <- pts
      if a < b
      d2 = (alat - blat) * (alat - blat) + (alon - blon) * (alon - blon)
      if d2 <= r * r
    } yield (a, b, d2)).sortBy(p => (p._1, p._2))
    assert(out.toSeq == brute.toSeq)
    assert(out.map(p => (p._1, p._2)).distinct.length == out.length)
    // candidates in adjacent cells but farther than r exist (so the
    // row-local distance check is load-bearing, not vacuous)
    val cellCands = (for {
      (a, alat, alon) <- pts; (b, blat, blon) <- pts
      if a < b
      if math.abs(alat / r - blat / r) <= 1 &&
        math.abs(alon / r - blon / r) <= 1
    } yield 1).length
    assert(cellCands > brute.length, "distance filter vacuous")
    assert(brute.nonEmpty, "no pairs at this sf — radius too small")
  }
}
