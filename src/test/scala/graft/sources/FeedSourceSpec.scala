package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The custom MicroBatchStream source: the full feed arrives exactly
  * once, in multiple rate-capped microbatches, with deterministic
  * row content.
  */
class FeedSourceSpec extends SparkSpec {

  test("feed drains in rate-capped microbatches, exactly once") {
    val df = spark.readStream.format("graft.sources.FeedSource")
      .option("totalRows", "350")
      .option("rowsPerTrigger", "100")
      .option("partitionsPerBatch", "3")
      .load()
    val q = df.writeStream.format("memory").queryName("feed_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("feed_out").collect()
      assert(rows.length == 350, s"got ${rows.length}")
      val ids = rows.map(_.getAs[Long]("id")).sorted
      assert(ids.toSeq == (0L until 350L), "every id exactly once")
      // content is the deterministic generator's
      rows.take(50).foreach { r =>
        val id = r.getAs[Long]("id")
        assert(r.getAs[String]("kind") == (if (id % 3 == 0) "credit"
          else "debit"))
        assert(r.getAs[Double]("amount") ==
          ((id * 2654435761L) % 100000L) / 100.0)
      }
      // the 100-row admission cap forced ≥ 4 microbatches
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length >= 4,
        s"expected >= 4 non-empty microbatches, saw ${batches.length}")
      assert(batches.forall(_.numInputRows <= 100),
        batches.map(_.numInputRows).mkString(","))
    } finally q.stop()
  }

  test("restart: a restored checkpoint offset advances the admission " +
    "mark — latestOffset never regresses below it") {
    val st = new FeedStream(totalRows = 350, rowsPerTrigger = 100,
      partitionsPerBatch = 3)
    // Spark replays checkpointed offsets through deserializeOffset on
    // restart; a fresh stream instance must adopt them, or it would
    // hand out (start=300, end=100) and re-deliver rows 100-299
    st.deserializeOffset("300")
    assert(st.latestOffset().json().toLong == 350L,
      "latestOffset must continue from the restored offset")
    // and a stale offset arriving later must not move the mark back
    st.deserializeOffset("100")
    assert(st.latestOffset().json().toLong == 350L)
  }
}
