package graft.streaming

import graft.{SparkEntry, Sessions}

/** Microbatch-cost profiler for the `stream_*` drains (round-13,
  * verdict r12 ask #7): runs the named stream queries once and dumps
  * every captured StreamingQueryProgress's engine-side `durationMs`
  * breakdown (addBatch, getBatch, walCommit, commitOffsets,
  * queryPlanning, triggerExecution) plus per-operator state metrics.
  * This is the evidence layer under the PLANS streaming-floor note:
  * it separates operator state work (stateOperators' times, rows) from
  * engine fixed cost (offset/commit WAL fsyncs, per-batch planning,
  * microbatch scheduling) that a production stream amortizes over
  * million-row batches and a single long-lived query.
  *
  *   sbt "runMain graft.streaming.DrainProfile stream_cusum ..."
  */
object DrainProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.local(cpus, "graft-drainprofile")
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.filter(_.startsWith("stream_")).toSeq.sorted
    names.foreach { name =>
      StreamStats.drainProgress() // clear any prior buffer
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val progs = StreamStats.drainProgress()
      println(f"== $name wall=$wall%.2fs batches=${progs.size}")
      progs.foreach { p =>
        val dm = p.durationMs
        val keys = dm.keySet.toArray.map(_.toString).sorted
        val parts = keys.map(k => s"$k=${dm.get(k)}").mkString(" ")
        val state = p.stateOperators.map(so =>
          s"rows=${so.numRowsTotal} upd=${so.numRowsUpdated} " +
            s"commitMs=${so.commitTimeMs}").mkString("; ")
        println(s"  batch=${p.batchId} rows=${p.numInputRows} $parts" +
          (if (state.nonEmpty) s" | state: $state" else ""))
      }
    }
    spark.stop()
  }
}
