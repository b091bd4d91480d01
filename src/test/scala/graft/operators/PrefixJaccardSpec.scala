package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Prefix filtering pinned on its two claims: LOSSLESS (bit-identical
  * output to the full-index Jaccard join — the prefix lemma is a
  * guarantee, not a recall knob) and PRUNING (the candidate pair set
  * is strictly smaller than indexing every shingle — the reason the
  * shape survives a 100× corpus).
  */
class PrefixJaccardSpec extends SparkSpec {

  private val t = 0.5

  test("lossless: output equals the full-index join row for row") {
    val full = Dedup.ngramJaccard(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val pref = Dedup.prefixJaccard(spark, sfDir, t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pref.toSeq == full.toSeq)
    assert(full.nonEmpty, "degenerate fixture: no qualifying pairs")
  }

  test("pruning: prefix candidates are a strict subset of full-index " +
    "candidates and a superset of the true pairs") {
    val arr = Dedup.shingleArrDf(spark, sfDir)
      .select(col("doc_id"), col("sharr"))
    val toks = arr.select(col("doc_id"), explode(col("sharr")).as("sh"))
    def candPairs(indexed: org.apache.spark.sql.DataFrame): Long =
      indexed.as("a").join(indexed.as("b"),
          col("a.sh") === col("b.sh") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
    val fullCand = candPairs(toks)
    // the operator's own prefix stream: rarest-first, p = n - ceil(tn) + 1
    val dfreq = toks.groupBy("sh").agg(count(lit(1)).as("df"))
    val prefixToks = toks.join(dfreq, "sh")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("sh")))).as("o"))
      .select(col("doc_id"), explode(slice(
        expr("transform(o, x -> x.sh)"), lit(1),
        (size(col("o")) - ceil(size(col("o")) * lit(t)) + 1).cast("int")))
        .as("sh"))
    val prefCand = candPairs(prefixToks)
    val truth = Dedup.ngramJaccard(spark, sfDir).count()
    assert(prefCand < fullCand,
      s"no pruning: prefix $prefCand vs full $fullCand")
    assert(prefCand >= truth, "candidate set lost a true pair")
  }

  test("stats: the closed-form probe multisets recompute from the df " +
    "tables and bound the distinct candidate counts") {
    val r = Dedup.prefixFilterStats(spark, sfDir).head
    val (nTrue, nCandPref, nCandFull, nProbePref, nProbeFull) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))
    assert(r.getBoolean(5) && r.getBoolean(6) && r.getBoolean(7))
    // Σ C(df,2) over the full index, recomputed independently
    val toks = Dedup.shingleArrDf(spark, sfDir)
      .select(col("doc_id"), explode(col("sharr")).as("sh"))
    val expectedFull = toks.groupBy("sh").count()
      .agg(sum(expr("count * (count - 1L) div 2L"))).head.getLong(0)
    assert(nProbeFull == expectedFull)
    // multiset probes bound distinct candidates; distinct bounds truth
    assert(nCandFull <= nProbeFull, "distinct full > probe multiset")
    assert(nCandPref <= nProbePref, "distinct prefix > probe multiset")
    assert(nTrue <= nCandPref && nCandPref <= nCandFull)
  }
}
