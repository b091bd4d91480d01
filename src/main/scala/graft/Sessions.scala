package graft

import org.apache.spark.sql.SparkSession

/** Session factory encoding the configs the library expects — the one
  * place a user (or the Verify/Bench mains) gets a correctly-configured
  * SparkSession from.
  *
  *  - `spark.sql.session.timeZone=UTC`: the reference parses ISO-8601
  *    timestamps with a literal `Z` (`buisness_profile_etl/main.py:661`);
  *    all date/timestamp semantics here assume UTC.
  *  - `graft.plans.GraftExtensions`: registers the optimizer rule that
  *    rewrites the HOF dot-product pattern onto the codegen VectorDot
  *    kernel.
  *  - shuffle partitions default to the core count — on a real cluster
  *    size them to the data (or leave AQE coalescing to shrink them).
  */
object Sessions {

  /** Local session for the driver mains and tests. */
  def local(cores: Int, appName: String = "graft",
      extraConfs: Map[String, String] = Map.empty): SparkSession =
    configure(SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString),
      extraConfs)
      .getOrCreate()

  /** Apply graft's required configs to any builder (cluster deploys
    * pass their own master/resource settings and call this).
    */
  def configure(b: SparkSession.Builder,
      extraConfs: Map[String, String] = Map.empty): SparkSession.Builder =
    extraConfs.foldLeft(
      b.config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.extensions", "graft.plans.GraftExtensions")
        .config("spark.sql.adaptive.enabled", "true")
        // AQE coalescing respects advisoryPartitionSizeInBytes (64 MB
        // default) instead of re-inflating every small shuffle to
        // defaultParallelism-many tasks: parallelismFirst=true is the
        // small-cluster convenience default, and Spark's tuning guide
        // itself recommends false so post-shuffle partitions are sized
        // to the DATA (optimization guide §2.2 — fewer, larger reduce
        // partitions). Measured on the round-14 box: a 20-query mixed
        // subset 37.4 -> 33.4 s at sf0.1; at cluster scale the same
        // setting is what sizes reducers to ~64 MB instead of to the
        // core count.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
          "false")
        // StreamStats decomposes drain wall time from recentProgress,
        // which Spark caps (default 100 events) — a drain with more
        // microbatches would silently undercount the setup/drain/
        // addBatch split benchdiff compares. No production drain is
        // near 1000 batches; StreamStats.drain also warns at the cap.
        .config("spark.sql.streaming.numRecentProgressUpdates", "1000")
        .config("spark.ui.enabled", "false")) {
      case (bb, (k, v)) => bb.config(k, v)
    }
}
