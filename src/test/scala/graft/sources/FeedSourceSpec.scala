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

  test("admission control is stateless in the start offset: restart " +
    "resumes, Once/AvailableNow get the whole remainder") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val st = new FeedStream(totalRows = 350, rowsPerTrigger = 100,
      partitionsPerBatch = 3)
    def at(start: Long, limit: ReadLimit): Long =
      st.latestOffset(st.deserializeOffset(start.toString), limit)
        .json().toLong
    // normal trigger: advance by the cap from wherever the engine
    // says we are — a restored checkpoint offset (start=300) resumes
    // exactly there, nothing to re-deliver, nothing to restore
    assert(at(0, ReadLimit.maxRows(100)) == 100L)
    assert(at(300, ReadLimit.maxRows(100)) == 350L)
    assert(at(350, ReadLimit.maxRows(100)) == 350L, "drained feed stays put")
    // Trigger.Once / AvailableNow ask with allAvailable and must get
    // the ENTIRE remainder — capping here would silently truncate the
    // query to one batch
    assert(at(0, ReadLimit.allAvailable()) == 350L)
    assert(at(120, ReadLimit.allAvailable()) == 350L)
  }

  test("Trigger.AvailableNow drains the whole feed, not one capped batch") {
    val df = spark.readStream.format("graft.sources.FeedSource")
      .option("totalRows", "350")
      .option("rowsPerTrigger", "100")
      .load()
    val q = df.writeStream.format("memory").queryName("feed_now_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000)
      assert(spark.table("feed_now_out").count() == 350L,
        "AvailableNow must deliver every row before terminating")
    } finally q.stop()
  }
}
