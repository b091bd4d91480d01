package graft.sources

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** The manifest-based file-skipping index: planning must actually drop
  * files, and the pruned read must stay exact (the residual predicate
  * covers whatever the surviving files over-contain).
  */
class SkippingIndexSpec extends SparkSpec {

  test("prunedFiles keeps only range-overlapping files — a narrow " +
    "slice reads a strict subset of the clustered files") {
    val (keep, total) = SkippingIndex.prunedFiles(spark, sfDir, 3, 7)
    assert(keep.nonEmpty)
    assert(keep.size < total, s"kept ${keep.size} of $total — no pruning")
  }

  test("pruned-scan aggregate is identical to the raw full-scan slice") {
    val viaIndex = SkippingIndex.userSliceAgg(spark, sfDir).collect()
    val raw = Tables.events(spark, sfDir)
      .filter(col("user_id").between(3, 7))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.Scalars.moneySum(col("value")).as("total_value"))
      .orderBy("user_id").collect()
    assert(viaIndex.toSeq == raw.toSeq)
  }

  test("a slice outside every file's range prunes ALL files (the " +
    "planning path alone answers empty)") {
    val (keep, total) = SkippingIndex.prunedFiles(spark, sfDir,
      1000000, 2000000)
    assert(keep.isEmpty && total > 0)
  }
}
