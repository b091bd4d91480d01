package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args(2+) = optional query-name filter for fast local iteration;
    // the driver's 2-arg invocation dumps everything, unchanged. A
    // typo'd name must fail HERE — a silent no-match dump would feed
    // check.py an empty dir that reads as a vacuous green
    val Array(sfDir, outDir) = args.take(2)
    val only = args.drop(2).toSet
    val unknown = only -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // NOTE: keep the default INT96 parquet timestamp output — pyarrow
    // reads INT96 as tz-naive, matching DuckDB's naive TIMESTAMP in
    // the driver's hash compare (TIMESTAMP_MICROS writes
    // isAdjustedToUTC=true → tz-aware → value mismatch).
    val spark = Sessions.local(cpus, "graft-verify")
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // A query that throws (plan OR execution time) must still leave a
    // footprint: an output dir with no parquet inside, which the
    // compare reads as FAIL. Without this a broken query silently
    // shrinks the artifact's row count and a regression can look like
    // a smaller suite (round 6 hid exactly that).
    var errors = Map.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors += name -> s"${e.getClass.getSimpleName}: ${
          Option(e.getMessage).getOrElse("").linesIterator.take(1)
            .mkString.take(300)}"
        val d = new java.io.File(s"$outDir/$name")
        d.mkdirs() // empty dir (no parquet) = explicit FAIL marker
        d.listFiles().foreach(f => if (f.isFile) f.delete())
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // diagnostic trail for the FAIL markers above (name → first line)
    Files.writeString(Paths.get(s"$outDir/errors.json"),
      errors.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    spark.stop()
  }
}
