package graft.operators

import java.io.File
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Sink operators (SURVEY.md §2.2): header CSV (K1/K2) + CSV source
  * (S7), date-partitioned JSON archive (K3 bronze layer), overwritten
  * latest-snapshot partition (K4/K5 semantics: only the newest snapshot
  * is load-eligible — modeled as an overwrite, not a rename pass), and
  * CTAS promotion (K6). Each query writes then reads back, so the
  * oracle checks the full round trip. Writes go once per sfDir under
  * /tmp and never rewrite per-row (the reference's O(n²) sink,
  * `BP:710-715`, is a behavior to fix, not replicate).
  */
object Sinks {

  private def root(dir: String) =
    s"/tmp/graft_sinks/${new File(dir).getName}"

  /** K1/K2 + S7: declared-schema CSV sink with header row, read back
    * with the explicit schema (no re-inference drift).
    */
  def csvRoundTrip(s: SparkSession, dir: String): DataFrame = {
    val src = Tables.nation(s, dir)
    val out = s"${root(dir)}/nation_csv"
    src.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(out)
    s.read.schema(src.schema).option("header", "true").csv(out)
      .orderBy("n_nationkey")
  }

  /** K2's inference half: headered CSV ingested with
    * `inferSchema=true` — NO declared schema, mirroring the reference
    * deriving its landing schema from the first row's keys
    * (`Gonukkad_Merchants.py:86`, `presentation.py:54`) — then the X1
    * bool-normalize schema walk runs over the INFERRED schema (the
    * walk is runtime `df.schema` inspection, so it composes with
    * inference exactly as with declared schemas: the inferred BOOLEAN
    * column comes out 0/1). Key columns are cast to canonical widths
    * after ingest: inference picks the narrowest integer type that
    * fits the observed values, which may drift across scale factors —
    * the ingest is inferred, the published schema is pinned.
    */
  def inferredCsv(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Scalars.normalizeBooleans
    val out = s"${root(dir)}/customer_infer_csv"
    Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_name"),
        (col("c_acctbal") > 0).as("is_positive"), col("c_acctbal"))
      .coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(out)
    val back = s.read
      .option("header", "true").option("inferSchema", "true").csv(out)
    // require, not assert (assert elides under -Xdisable-assertions,
    // and this check IS the operator's contract): inference must have
    // found the boolean or the normalize walk below silently no-ops
    require(back.schema("is_positive").dataType ==
      org.apache.spark.sql.types.BooleanType,
      s"csv inference drifted: ${back.schema("is_positive").dataType}")
    normalizeBooleans(back)
      .select(col("c_custkey").cast("long").as("c_custkey"),
        col("c_name"),
        col("is_positive"),
        col("c_acctbal").cast("double").as("c_acctbal"))
      .orderBy("c_custkey")
  }

  /** Columnar-format matrix: the same projection written as ORC and
    * read back — the "second columnar format" a lakehouse needs
    * besides parquet (ORC ships in Spark; predicate pushdown, column
    * pruning, and min/max stats all apply the same way). Values make
    * the round trip bit-exact, so the parquet-derived oracle verifies
    * the ORC write+read.
    */
  def orcRoundTrip(s: SparkSession, dir: String): DataFrame = {
    val out = s"${root(dir)}/supplier_orc"
    Tables.supplier(s, dir)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
        col("s_acctbal"))
      .write.mode("overwrite").orc(out)
    s.read.orc(out)
      .filter(col("s_acctbal") > 0)
      .orderBy("s_suppkey")
  }

  /** Federated-format ingest: the same logical table arriving through
    * four different pipelines (parquet original + CSV, JSON, ORC
    * copies) read back into ONE union and aggregated. The cross-format
    * reads use the DECLARED schema — inference would widen the int
    * keys to long in JSON and guess strings in CSV, and a federated
    * union is only sound when every arm is coerced to the same
    * contract up front. Each arm keeps its own pushdown/pruning
    * behavior (columnar for parquet/ORC, row parse for CSV/JSON);
    * at 100 TB the union is just concatenated scan tasks — no
    * exchange until the aggregate.
    */
  def multiFormatUnion(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.nation(s, dir)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val csvOut = s"${root(dir)}/nation_multi_csv"
    val jsonOut = s"${root(dir)}/nation_multi_json"
    val orcOut = s"${root(dir)}/nation_multi_orc"
    // fixture copies are written once per dir (marker-guarded like
    // SkippingIndex.ensurePartitioned) so repeat invocations — and the
    // bench — time the multi-format READ, not three sink writes
    if (!new java.io.File(orcOut, "_SUCCESS").exists()) {
      base.write.mode("overwrite").option("header", "true").csv(csvOut)
      base.write.mode("overwrite").json(jsonOut)
      base.write.mode("overwrite").orc(orcOut)
    }
    val schema = base.schema
    base
      .unionByName(s.read.schema(schema).option("header", "true").csv(csvOut))
      .unionByName(s.read.schema(schema).json(jsonOut))
      .unionByName(s.read.orc(orcOut))
      .groupBy("n_regionkey")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("n_nationkey")).as("n_nations"))
      .orderBy("n_regionkey")
  }

  /** XML round trip (Spark 4's built-in XML source): nation written as
    * row-tagged XML, read back with the DECLARED schema (inference
    * would widen n_nationkey to long and flip column case rules), then
    * rolled up per region. XML is the one interchange format the
    * JSON/CSV sinks don't cover — B2B feeds and legacy endpoints speak
    * it; at scale each file is one task (multiLine parse), so the
    * writer controls parallelism via files, not a splittable codec.
    */
  def xmlRoundTrip(s: SparkSession, dir: String): DataFrame = {
    val out = s"${root(dir)}/nation_xml"
    val src = Tables.nation(s, dir)
    src.write.mode("overwrite")
      .option("rowTag", "nation").format("xml").save(out)
    s.read.schema(src.schema)
      .option("rowTag", "nation").format("xml").load(out)
      .groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("n_nations"),
        max(col("n_name")).as("max_name"))
      .orderBy("n_regionkey")
  }

  /** Schema evolution across snapshot generations: an early snapshot
    * written WITHOUT a column, a later one with it, read back as one
    * table via parquet mergeSchema — the schema-on-read posture of
    * SURVEY §1 (absent fields → null, then counted/defaulted) applied
    * at the storage layer, where long-lived 100 TB datasets actually
    * evolve. The aggregation proves the merged view: rows from the
    * early generation contribute null priorities.
    */
  def schemaEvolution(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Scalars.moneySum
    val out = s"${root(dir)}/orders_evolved"
    val orders = Tables.orders(s, dir)
    orders.filter(year(col("o_orderdate")) < 1998)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .write.mode("overwrite").parquet(s"$out/gen=1")
    orders.filter(year(col("o_orderdate")) >= 1998)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderpriority")) // column added in the later generation
      .write.mode("overwrite").parquet(s"$out/gen=2")
    s.read.option("mergeSchema", "true").parquet(out)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        count(col("o_orderpriority")).as("n_with_priority"),
        moneySum(col("o_totalprice")).as("total"))
      .orderBy("o_orderstatus")
  }

  /** K3: date-partitioned JSON archive (bronze) → read back → daily
    * counts. partitionBy(day) gives the `responses/<date>/` layout
    * (`BP:175-180`) as partition pruning-friendly directories.
    */
  def jsonArchive(s: SparkSession, dir: String): DataFrame = {
    val out = s"${root(dir)}/events_json"
    Tables.events(s, dir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .select(col("day"), col("event_id"), col("event_type"), col("value"))
      .write.mode("overwrite").partitionBy("day").json(out)
    s.read.json(out)
      .groupBy("day")
      .agg(count(lit(1)).as("n_events"))
      .select(col("day").cast("string").as("day"), col("n_events"))
      .orderBy("day")
  }

  /** K4/K5: dated snapshot where only `latest/` is load-eligible —
    * written twice to prove overwrite idempotence (the reference
    * renames all older blobs instead, `GM:144-155`).
    */
  def latestSnapshot(s: SparkSession, dir: String): DataFrame = {
    val out = s"${root(dir)}/orders_latest"
    val snap = Tables.orders(s, dir)
      .withColumn("snapshot_date", lit("2024-01-01"))
    snap.write.mode("overwrite").parquet(out)
    snap.write.mode("overwrite").parquet(out) // idempotent re-run
    s.read.parquet(out)
      .groupBy("snapshot_date")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("o_orderkey")).as("n_keys"))
      .orderBy("snapshot_date")
  }

  /** A6/ST3 as a sink: upsert-by-date via DYNAMIC partition overwrite —
    * the daily incremental pattern (`BP:20-50` rewrote a whole text
    * file per day). Full history is written once; then ONE day's
    * partition is recomputed and overwritten without touching the
    * others; the read-back must equal a fresh full computation. At
    * 100 TB this is the difference between rewriting a table and
    * rewriting 1/Nth of it per day.
    */
  def upsertByDate(s: SparkSession, dir: String): DataFrame = {
    val out = s"${root(dir)}/daily_counts"
    // checkpointed: the one-day upsert below re-reads the aggregate —
    // without it the day filter re-runs the FULL events scan + shuffle
    // (the aggregate is |days| rows; the scan it saves is the table)
    val daily = Tables.events(s, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_events"))
      .localCheckpoint()
    daily.write.mode("overwrite").partitionBy("day").parquet(out)
    // recompute + upsert just one day's partition (same values here,
    // so the result must stay identical to the full computation).
    // Dynamic overwrite via the per-write option — never a session
    // conf mutation, which would leak into later writes.
    daily.filter(col("day") === "2024-01-15")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day").parquet(out)
    s.read.parquet(out)
      .select(col("day").cast("string").as("day"), col("n_events"))
      .orderBy("day")
  }

  /** Small-file compaction: rewrite a many-file dataset to a bounded
    * file count (the housekeeping half of K5 done the scalable way —
    * fewer files = fewer tasks + footers at read time).
    */
  def compact(s: SparkSession, dir: String): DataFrame = {
    val scattered = s"${root(dir)}/scattered"
    val compacted = s"${root(dir)}/compacted"
    Tables.orders(s, dir).repartition(16)
      .write.mode("overwrite").parquet(scattered)
    s.read.parquet(scattered).coalesce(2)
      .write.mode("overwrite").parquet(compacted)
    s.read.parquet(compacted)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("o_orderkey")).as("n_keys"))
  }

  /** K6: CTAS snapshot promote (`CREATE TABLE ... AS SELECT`,
    * `GM:164-180`) — the whole "query" the reference ships to BigQuery,
    * executed natively with an explicit LOCATION (no warehouse dep).
    */
  def ctasPromote(s: SparkSession, dir: String): DataFrame = {
    val out = s"${root(dir)}/promoted"
    Tables.customer(s, dir).createOrReplaceTempView("graft_tmp_customer")
    s.sql("DROP TABLE IF EXISTS graft_promoted")
    // DROP leaves the explicit LOCATION's files behind; clear them so
    // the CTAS re-runs idempotently (CREATE OR REPLACE semantics).
    val p = new org.apache.hadoop.fs.Path(out)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    s.sql(
      s"""CREATE TABLE graft_promoted USING PARQUET LOCATION '$out'
         |AS SELECT c_custkey, c_name, c_mktsegment
         |   FROM graft_tmp_customer WHERE c_acctbal > 0""".stripMargin)
    s.table("graft_promoted").orderBy("c_custkey")
  }

  /** Z-order clustered layout: events written ordered by the bit
    * interleave of (user bucket, day ordinal), so file-level parquet
    * min/max statistics are narrow on BOTH dimensions at once — a
    * predicate on either user OR day prunes most files at planning
    * time, which a single-column sort can only give for its leading
    * column. This is the table-layout decision that matters at 100 TB:
    * the cluster write is repartitionByRange on the z-key (disjoint
    * per-file key ranges) + sortWithinPartitions, all computed
    * row-locally; no extra shuffle beyond the one range exchange any
    * clustered write needs. ZorderSpec measures the per-file
    * min/max narrowing against the global ranges.
    *
    * The query result is a day-grain rollup read BACK from the
    * clustered files, so the oracle verifies the full write→read
    * round trip, not just the write.
    */
  def zorderCluster(s: SparkSession, dir: String): DataFrame = {
    val out = s"${root(dir)}/events_zorder"
    val bits = 10
    val ub = pmod(col("user_id"), lit(1 << bits))
    // the user dimension is a deliberate hash bucket (pmod), but day
    // is a RANGE dimension: saturate at the 10-bit edges rather than
    // wrap, so an event >1024 days past the epoch clusters at the top
    // bucket instead of aliasing back onto early days and silently
    // widening every file's day min/max
    val db = least(greatest(datediff(col("ts").cast("date"),
      lit(java.sql.Date.valueOf("2024-01-01"))), lit(0)),
      lit((1 << bits) - 1))
    // classic Morton interleave: user bits at odd positions, day bits
    // at even — row-local integer ops, codegen-friendly
    val z = (0 until bits).map { i =>
      shiftleft(shiftright(ub, i).bitwiseAND(lit(1)), 2 * i + 1) +
        shiftleft(shiftright(db, i).bitwiseAND(lit(1)), 2 * i)
    }.reduce(_ + _)
    Tables.events(s, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
      .withColumn("zkey", z)
      .repartitionByRange(8, col("zkey"))
      .sortWithinPartitions("zkey")
      .write.mode("overwrite").parquet(out)
    s.read.parquet(out)
      .groupBy(col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.Scalars.moneySum(col("value")).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("day")
  }
}
