package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** The RLHF/contrastive data-prep queries pinned on their semantic
  * claims (the driver oracle pins the values; these pin the
  * PROPERTIES a training pipeline actually relies on).
  */
class TrainingPrepSpec extends SparkSpec {

  test("preferencePairs: chosen dominates every doc in its source, " +
    "rejected is dominated, gap is strictly positive") {
    val pairs = Pipelines.preferencePairs(spark, sfDir).collect()
    assert(pairs.nonEmpty)
    val scores = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        size(TextAnalysis.tokens(col("text"))).as("nw"),
        size(array_distinct(TextAnalysis.tokens(col("text")))).as("nd"))
      .select(col("doc_id"), col("source"),
        TextAnalysis.qualityExpr(col("nw"), col("nd")).as("s"))
      .collect().map(r => (r.getString(1), r.getLong(0), r.getDouble(2)))
    val bySource = scores.groupBy(_._1)
    pairs.foreach { r =>
      val (src, chosen, rejected, gap) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      val ss = bySource(src).map(x => x._2 -> x._3).toMap
      assert(ss.values.forall(_ <= ss(chosen)))
      assert(ss.values.forall(_ >= ss(rejected)))
      assert(gap > 0 && chosen != rejected)
    }
  }

  test("contrastiveBatches: batches are source-disjoint and cover " +
    "every document exactly once") {
    val b = Pipelines.contrastiveBatches(spark, sfDir)
    val dup = b.groupBy("batch_id", "source").count()
      .filter(col("count") > 1).count()
    assert(dup == 0, "a batch holds two docs from one source")
    assert(b.count() == Tables.documents(spark, sfDir).count())
    assert(b.select("doc_id").distinct().count() == b.count())
  }

  test("leakageSafeSplit: splits partition the corpus, the in-plan " +
    "straddle count is 0, and an independent pair-walk agrees") {
    val rows = Dedup.leakageSafeSplit(spark, sfDir).collect()
    val nDocs = rows.map(_.getLong(1)).sum
    assert(nDocs == Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      assert(r.getLong(4) == 0L,
        s"near-dup pair straddles the split: ${r.getLong(4)}")
      assert(r.getLong(2) <= r.getLong(1), "more units than docs")
    }
    // independent recount: derive each doc's split the same way the
    // operator does, then walk the RAW near-dup pairs — no pair may
    // cross sides (this re-proves the construction from the outside)
    val labels = Dedup.nearDupClusters(spark, sfDir)
      .select(col("doc_id"), col("cluster_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def side(doc: Long): Long = {
      val unit = labels.getOrElse(doc, doc)
      ((unit % 2147483648L) * 2654435761L) % 100L
    }
    def name(b: Long) = if (b < 80) "train" else if (b < 90) "val"
      else "test"
    val pairs = Dedup.jaccardPairs(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture has no near-dup pairs to protect")
    pairs.foreach { case (a, b) =>
      assert(name(side(a)) == name(side(b)), s"pair ($a,$b) straddles")
    }
  }
}
