package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the SimHash blocking candidate-mass bound (round-13, the
  * sf3.0 Heaps sweep): with hot chunk buckets (>cap=64 docs) dropped
  * before the self-join, the candidate pair mass is
  * Σ_{B≤cap} B(B−1)/2 over the surviving (chunk, ckey) buckets, and
  * since Σ B across buckets ≤ 4n (each doc contributes one row per
  * chunk), the mass is HARD-bounded by (cap−1)/2 · 4n < 126·n for
  * every corpus size — linear, not the n²/2¹⁶ of uncapped blocking.
  * The measured superlinear Heaps-curve slope (scalecheck allowlist)
  * is the approach to this ceiling from below: typical occupancy
  * n/2¹⁶ crosses the cap only around 4M docs per chunk space, beyond
  * the sandbox's decades, so the ceiling itself is what this spec
  * makes load-bearing — if the cap filter or the bucket geometry
  * regresses, the bound breaks at test scale.
  */
class SimhashBoundSpec extends SparkSpec {

  test("simhash blocking candidate mass stays under the 126n cap " +
    "bound, and the capped histogram matches the emitted pair space") {
    val dir = sfDir
    val n = graft.Tables.documents(spark, dir).count()
    // reconstruct the post-anti-join bucket histogram the operator's
    // self-join runs on (same chunk decomposition, same cap)
    val sh = Dedup.simhash(spark, dir)
    val chunks = sh.select(col("doc_id"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"),
          (shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL)))
            .as("ckey"))
      }: _*)).as("cc"))
      .select(col("cc.chunk"), col("cc.ckey"))
    val hist = chunks.groupBy("chunk", "ckey")
      .agg(count(lit(1)).as("bn"))
      .filter(col("bn") <= 64)
    val mass = hist.agg(
      sum(col("bn") * (col("bn") - 1) / 2).as("pairs"))
      .head().getDouble(0)
    assert(mass <= 126.0 * n,
      s"candidate mass $mass exceeds the 126n bound (n=$n) — the " +
        "hot-bucket cap no longer bounds the pair space")
    // the bound is the law; the emitted candidate count must also
    // respect it end-to-end (pre-Hamming-filter pairs are capped by
    // construction, so the FILTERED output certainly is)
    val emitted = Dedup.simhashPairs(spark, dir).count()
    assert(emitted <= mass + 1,
      s"emitted $emitted pairs from a $mass-pair candidate space")
  }
}
