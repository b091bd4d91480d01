package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Scalars._

/** Scalar-function operators (SURVEY.md §2.6), grouped into wide
  * SELECTs so each family (string / date / timestamp / kv-parse /
  * case-chain) is one oracle-checked query. All expressions are
  * codegen'd builtins — no UDFs, so they stay inside whole-stage
  * codegen at 100 TB.
  */
object ScalarSuite {

  /** X15-X17, X19, X4-analog: trim, concat_ws, regexp_replace (suffix
    * strip, `GM:153`), split + element_at (X5), substring, CASE band,
    * bool→0/1 (X1).
    */
  def stringSuite(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_custkey"),
        trim(col("c_name")).as("tname"),
        concat_ws(", ", col("c_name"), col("c_mktsegment")).as("name_seg"),
        regexp_replace(col("c_name"), "#[0-9]+$", "").as("name_prefix"),
        element_at(split(col("c_name"), "#"), 1).as("name_part"),
        upper(col("c_mktsegment")).as("seg_upper"),
        substring(col("c_name"), 1, 8).as("name_head"),
        when(col("c_acctbal") > 5000, "high")
          .when(col("c_acctbal") > 0, "mid")
          .otherwise("low").as("bal_band"),
        (col("c_acctbal") > 0).cast("int").as("is_positive"))
      .orderBy("c_custkey")

  /** X12-X14: date arithmetic (`today - timedelta(7)`, `GM:79-80`),
    * strftime-style formatting, date-from-parts (`BP:670-671`),
    * calendar extraction, datediff.
    */
  def dateSuite(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        to_date(col("o_orderdate")).as("od"),
        date_sub(to_date(col("o_orderdate")), 7).as("week_before"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("od_str"),
        make_date(year(col("o_orderdate")), month(col("o_orderdate")),
          dayofmonth(col("o_orderdate"))).as("od_rebuilt"),
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"),
        dayofmonth(col("o_orderdate")).as("o_day"),
        datediff(lit(java.sql.Date.valueOf("2002-01-01")),
          to_date(col("o_orderdate"))).as("days_to_2002"))
      .orderBy("o_orderkey")

  /** X11: ISO-8601 micros+Z round trip — the reference's exact
    * `strptime(x, "%Y-%m-%dT%H:%M:%S.%fZ")` pattern (`BP:661`).
    */
  def timestampRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val pat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"
    Tables.events(s, dir)
      .select(col("event_id"),
        date_format(col("ts"), pat).as("iso"),
        to_timestamp(date_format(col("ts"), pat), pat).as("parsed"))
      .orderBy("event_id")
  }

  /** X18: query-string parse → typed fields (`parse_qs`, `BP:184-191`)
    * via str_to_map + element_at + cast.
    */
  def kvParse(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("qs",
        concat(lit("event="), col("event_type"),
          lit("&user="), col("user_id")))
      .withColumn("m", str_to_map(col("qs"), lit("&"), lit("=")))
      .select(col("event_id"),
        element_at(col("m"), "event").as("evt"),
        element_at(col("m"), "user").cast("long").as("uid"))
      .orderBy("event_id")

  /** X8: order-sensitive CASE/WHEN decision chain — the profile-status
    * classifier shape (`BP:675-698`), priorities preserved top-down.
    */
  def statusCase(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        when(col("o_orderstatus") === "F", "fulfilled")
          .when(col("o_orderpriority").startsWith("1"), "urgent_open")
          .when(col("o_totalprice") > 300000, "big_open")
          .when(col("o_orderstatus") === "P", "processing")
          .otherwise("open").as("status_class"))
      .orderBy("o_orderkey")

  /** X4: multi-part concat with empty→sentinel defaulting
    * (`extract_address`, `BP:439-456`).
    */
  def addressConcat(s: SparkSession, dir: String): DataFrame = {
    val joined = Tables.customer(s, dir)
      .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))
    joined
      .withColumn("addr",
        concat_ws(", ", col("c_name"), col("n_name"), col("r_name")))
      .select(col("c_custkey"),
        when(length(col("addr")) === 0, lit(NotFoundSentinel))
          .otherwise(col("addr")).as("address"))
      .orderBy("c_custkey")
  }

  /** X7: key→value map construction from grouped entries
    * (`daywise_hours`, `BP:536-546`) — MapType built with
    * map_from_entries, then serialized deterministically (sorted
    * entries) for the oracle compare.
    */
  def mapConstruct(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("user_id")
      .agg(map_from_entries(collect_list(struct(col("event_type"),
        col("cnt")))).as("m"))
      .select(col("user_id"),
        array_join(
          transform(array_sort(map_entries(col("m"))),
            e => concat(e.getField("key"), lit("="),
              e.getField("value").cast("string"))),
          ",").as("type_counts"))
      .orderBy("user_id")

  /** Higher-order array functions (the lambda surface: transform /
    * filter / exists / aggregate / zip_with / sequence) exercised
    * end-to-end over per-order quantity arrays. Everything here is
    * row-local codegen'd expression work — the ONLY shuffle is the
    * groupBy that builds the arrays (sort_array on the linenumber-led
    * struct makes collect_list's nondeterministic order canonical —
    * the struct sort compares (linenumber, quantity), so the key is
    * unique even where linenumbers repeat, and the lambdas fold in a
    * fixed sequence on every engine). The
    * folded values are integer-valued, so the sums are exact in
    * double regardless of fold order — the oracle's list_sum needs no
    * float-ordering caveat.
    */
  def hofSuite(s: SparkSession, dir: String): DataFrame = {
    val qtys = col("qtys")
    Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(transform(
        sort_array(collect_list(struct(col("l_linenumber"),
          col("l_quantity")))),
        e => e.getField("l_quantity")).as("qtys"))
      .select(col("l_orderkey"),
        size(qtys).cast("long").as("n_lines"),
        aggregate(transform(qtys, x => x * 2), lit(0.0),
          (acc, x) => acc + x).as("doubled_sum"),
        size(filter(qtys, x => x >= 25)).cast("long").as("n_heavy"),
        exists(qtys, x => x === 50.0).cast("int").as("has_max"),
        aggregate(
          zip_with(qtys, sequence(lit(1), size(qtys)),
            (q, i) => q * i),
          lit(0.0), (acc, x) => acc + x).as("pos_weighted"))
      .orderBy("l_orderkey")
  }

  /** Business-day SLA audit: ship latency in WEEKDAYS per order
    * priority — calendar-day latency overstates weekend-spanning
    * shipments, which is why SLAs are contracted in business days.
    * The weekday count comes from a closed-form prefix function
    * instead of a per-day loop or calendar table:
    * W(e) = 5·⌊(e+3)/7⌋ + min((e+3) mod 7 + 1, 5) counts weekdays
    * from the epoch through day e (the +3 aligns the week so index
    * 0 = Monday; epoch day 0 = Thursday = index 3), and
    * bd(a, b] = W(b) − W(a) — two integer ops per row, exact in both
    * engines, valid for any span with no loop. The fixture's ship
    * dates are NOT anchored to order dates (signed gaps in
    * ±~2400 bd), so the rollup treats bd as a signed gap: SLA =
    * shipped AFTER the order and within 5 business days; the mean
    * is emitted as (sum, n) exact pairs rather than a floor quotient
    * — integer division on a possibly-negative sum is exactly where
    * Spark's truncating `div` and DuckDB's flooring `//` diverge.
    */
  def businessDays(s: SparkSession, dir: String): DataFrame = {
    // W(e) built as SQL expressions for readability and exact parity
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("ea",
        expr("datediff(cast(o_orderdate as date), date '1970-01-01')")
          .cast("long"))
      .withColumn("eb",
        expr("datediff(cast(l_shipdate as date), date '1970-01-01')")
          .cast("long"))
      .withColumn("wa", expr(
        "5L * ((ea + 3) div 7) + least((ea + 3) % 7 + 1, 5L)"))
      .withColumn("wb", expr(
        "5L * ((eb + 3) div 7) + least((eb + 3) % 7 + 1, 5L)"))
      .withColumn("bd", col("wb") - col("wa"))
    li.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("bd") >= 0L && col("bd") <= 5L, 1L)
          .otherwise(0L)).as("n_within_sla"),
        sum(col("bd")).as("bd_sum"),
        min(col("bd")).as("bd_min"),
        max(col("bd")).as("bd_max"))
      .select(col("o_orderpriority"), col("n_lines"),
        col("n_within_sla"),
        expr("n_within_sla * 1000000L div n_lines").as("sla_ppm"),
        col("bd_sum"), col("bd_min"), col("bd_max"))
      .orderBy("o_orderpriority")
  }
}
