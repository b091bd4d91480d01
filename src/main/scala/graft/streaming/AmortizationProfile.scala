package graft.streaming

import graft.Sessions

/** Batch-size sweep over two representative production drains
  * (round-13 verdict ask #3): the PLANS streaming-floor note argued
  * from arithmetic that the ~100 ms/batch engine fixed cost (WAL
  * fsyncs, per-batch planning, microbatch scheduling) "amortizes
  * 1000×" at production batch sizes — this main MEASURES it. The same
  * two drains the gate checks (feedCusum: transformWithState on
  * RocksDB; feedDaily: watermarked windowed agg on the HDFS-backed
  * store) run with rowsPerTrigger stepped 10³ → 10⁶ (4 microbatches
  * each, the same AvailableNow admission-control path), and the
  * artifact line reports per-batch triggerExecution alongside
  * per-ROW cost — the number that should collapse as batches grow if
  * the fixed cost is really fixed.
  *
  *   sbt "runMain graft.streaming.AmortizationProfile"
  *
  * Emits one `{"metric":"amortization",...}` JSON line (recorded in
  * PLANS.md); per-batch detail prints above it.
  */
object AmortizationProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.local(cpus, "graft-amortization")
    spark.sparkContext.setLogLevel("WARN")
    val sizes: Seq[Long] =
      if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(1000L, 10000L, 100000L, 1000000L)
    val drains = Seq[(String, Long => org.apache.spark.sql.DataFrame)](
      "feedCusum(tws/rocksdb)" ->
        (rpt => StreamingAnalogs.feedCusum(spark, dir, 4 * rpt, rpt)),
      "feedDaily(windowagg/hdfs)" ->
        (rpt => StreamingAnalogs.feedDaily(spark, dir, 4 * rpt, rpt)))
    val cells = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, run) <- drains; rpt <- sizes) {
      StreamStats.drainProgress() // clear any prior buffer
      val t0 = System.nanoTime()
      run(rpt).queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val progs = StreamStats.drainProgress().filter(_.numInputRows > 0)
      def sumMs(key: String): Long = progs.map { p =>
        Option(p.durationMs.get(key)).map(_.toLong).getOrElse(0L)
      }.sum
      val nB = math.max(1, progs.size)
      val rows = progs.map(_.numInputRows).sum
      val trig = sumMs("triggerExecution")
      val add = sumMs("addBatch")
      val fixed = sumMs("walCommit") + sumMs("commitOffsets") +
        sumMs("queryPlanning") + sumMs("getBatch") + sumMs("latestOffset")
      val commit = progs.flatMap(_.stateOperators.map(_.commitTimeMs)).sum
      def f(v: Double) =
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
      println(f"== $name rowsPerTrigger=$rpt batches=$nB rows=$rows " +
        f"wall=$wall%.2fs trigMs/batch=${trig / nB} " +
        f"fixedMs/batch=${fixed / nB} stateCommitMs/batch=${commit / nB} " +
        f"usPerRow=${f(trig * 1000.0 / math.max(1L, rows))}")
      cells += s"""{"drain":"$name","rows_per_trigger":$rpt,""" +
        s""""batches":$nB,"rows":$rows,"wall_s":${f(wall)},""" +
        s""""trig_ms_per_batch":${trig / nB},""" +
        s""""fixed_ms_per_batch":${fixed / nB},""" +
        s""""state_commit_ms_per_batch":${commit / nB},""" +
        s""""us_per_row":${f(trig * 1000.0 / math.max(1L, rows))}}"""
    }
    println(s"""{"metric":"amortization","sf":"$dir","cells":[""" +
      cells.mkString(",") + "]}")
    spark.stop()
  }
}
