package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Scalars._

/** Core relational operators: scans, filters, projections, joins
  * (SURVEY.md §2.1, §2.3, §2.4). Each `def` is one `SparkEntry.queries`
  * entry with a DuckDB oracle; all outputs are fully sorted with a
  * unique tie-break so the driver's hash compare is order-stable.
  *
  * Scale notes (100 TB): ID sets for semi joins stay distributed —
  * never collected to the driver and spliced into SQL text like the
  * reference (`Gonukkad_Merchants.py:44,61`) — and are broadcast only
  * while they fit the session threshold (planner-sized; no forced
  * hints on data-proportional sides). All scans go through parquet
  * relations so Catalyst pushes filters/projections.
  */
object Relational {

  /** Flagship — the reference's daily-snapshot pipeline shape (§3.1):
    * active-ID scan → digit/null filter → broadcast semi join → bool
    * normalize (X1) → null column overwrite (X2, `GM:122`) → literal
    * snapshot date (X20; literal not current_date so the oracle is
    * deterministic, SURVEY §7.4).
    */
  def snapshot(s: SparkSession, dir: String): DataFrame = {
    // the ID set is DATA-proportional (every active customer), so no
    // forced broadcast hint: the side is a plain scan+filter the planner
    // can size, auto-broadcast picks BHJ while it fits the threshold
    // (plan-pinned at small sf in PlanQualitySpec) and the join degrades
    // to a shuffled semi join — not a driver OOM — when it outgrows it
    val ids = Tables.customer(s, dir)
      .filter(col("c_acctbal") > 0 && col("c_name").isNotNull)
      .select(col("c_custkey"))
    Tables.orders(s, dir)
      .join(ids, col("o_custkey") === col("c_custkey"), "left_semi")
      .withColumn("is_fulfilled", (col("o_orderstatus") === "F").cast("int"))
      .withColumn("geolocation", lit(null).cast("string"))
      .withColumn("snapshot_date", lit(java.sql.Date.valueOf("2024-01-01")))
      .orderBy("o_orderkey")
  }

  /** S2 over a REAL JDBC relation (embedded Derby — see
    * graft.sources.JdbcSource): the reference's database-table ingest
    * (`Gonukkad_Merchants.py:61`) as a pushdown-capable JDBC scan +
    * broadcast semi join against a parquet dim. The acctbal predicate
    * and the 4-column projection reach the database as SQL (WHERE /
    * select list — asserted in JdbcSourceSpec), the read is
    * range-partitioned on the numeric key, and the ID set joins
    * distributed, never spliced into the query text.
    */
  def jdbcSnapshot(s: SparkSession, dir: String): DataFrame = {
    val nations = Tables.nation(s, dir)
      .filter(col("n_regionkey") === 1)
      .select(col("n_nationkey"))
    graft.sources.JdbcSource.supplier(s, dir)
      .filter(col("s_acctbal") > 0)
      .join(broadcast(nations),
        col("s_nationkey") === col("n_nationkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
        col("s_acctbal"))
      .orderBy("s_suppkey")
  }

  /** S1/P1: scan + narrow projection (only 2 of 6 columns read). */
  def scanProject(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_orderkey")

  /** F1: not-null + all-digits + trim id filter (`BP:69-70`, `GM:40-41`),
    * applied to the digit suffix of customer names.
    */
  def digitIdFilter(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_custkey"),
        trim(regexp_extract(col("c_name"), "#([0-9]+)$", 1)).as("id_str"))
      .filter(col("id_str").isNotNull && col("id_str").rlike("^[0-9]+$"))
      .withColumn("id_num", col("id_str").cast("long"))
      .orderBy("c_custkey")

  /** S3 analog: full-table snapshot dump (`SELECT *`, `CB:37` et al.)
    * with X1 schema-walk bool normalization — the `presentation.py`
    * pipeline shape (§3.3).
    */
  def fullDump(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.nation(s, dir)
      .withColumn("is_low_key", col("n_nationkey") < 12)
    normalizeBooleans(base).orderBy("n_nationkey")
  }

  /** J2: per-key left-outer enrichment with null-side defaults — the
    * token-row ⟕ API-results join (`BP:475-708`); missing side →
    * 0 / "Not_Found" sentinels (X3).
    */
  def leftEnrich(s: SparkSession, dir: String): DataFrame = {
    val recent = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders_2001"),
        moneySum(col("o_totalprice")).as("spend_2001"),
        max(col("o_orderstatus")).as("last_status"))
    Tables.customer(s, dir)
      .join(recent, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("c_name"),
        coalesce(col("n_orders_2001"), lit(0L)).as("n_orders_2001"),
        coalesce(col("spend_2001"), lit(0.0)).as("spend_2001"),
        notFound(col("last_status")).as("last_status"))
      .orderBy("c_custkey")
  }

  /** 3-way inner join + grouped rollup — revenue by market segment and
    * order year. The widest table (lineitem) is pre-aggregated to one
    * row per l_orderkey BEFORE the orders/customer joins, so the
    * shuffled fact shrinks by the per-order line multiplicity and the
    * distinct-order count degrades to a plain count(*) — no Expand
    * (row-duplicating countDistinct rewrite) anywhere in the plan.
    * Same result at any scale; the order-grain aggregate partial-aggs
    * map-side on the scan's natural clustering.
    */
  def join3Revenue(s: SparkSession, dir: String): DataFrame = {
    val perOrder = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("order_revenue"))
    Tables.orders(s, dir)
      .join(perOrder, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), year(col("o_orderdate")).as("order_year"))
      .agg(
        moneySum(col("order_revenue")).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("c_mktsegment", "order_year")
  }

  /** TPC-H Q5 shape — the heaviest classic OLAP join tree: region →
    * nation → customer → orders → lineitem → supplier with the "local
    * supplier" condition (the supplier sits in the customer's nation),
    * revenue per nation over one order-date year. Physical shape at
    * any scale: region/nation/supplier are broadcast dims, the
    * customer⋈orders⋈lineitem chain shuffles on its keys, the date
    * filter pushes to the orders scan, and the local-supplier
    * predicate rides the supplier join as an equi-key — never a
    * post-join filter over the full fact product.
    */
  def q5LocalSupplier(s: SparkSession, dir: String): DataFrame = {
    val nations = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    Tables.customer(s, dir)
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >= "1996-01-01" &&
            col("o_orderdate") < "1997-01-01"),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      // local supplier: join key includes the nation, so non-local
      // pairs never materialize. No forced hint — supplier GROWS with
      // the data (SF x 10k rows); the planner sizes the scan and
      // broadcasts while it fits, shuffles beyond
      .join(Tables.supplier(s, dir),
        col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Part-dimension enrichment rollup (TPC-H Q14 shape): lineitem ⋈
    * part with the dim broadcast, promo-revenue share per brand. The
    * share divides the two decimal-exact sums as one double division
    * (bit-identical cross-engine; no round()).
    */
  def promoRevenue(s: SparkSession, dir: String): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    // part grows with the data (SF x 200k rows) — planner-sized, no
    // forced hint; auto-broadcast picks BHJ while the dim fits
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        moneySum(rev).as("revenue"),
        moneySum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0)))
          .as("promo_revenue"),
        count(lit(1)).as("n_items"))
      .withColumn("promo_share", col("promo_revenue") / col("revenue"))
      .orderBy("p_brand")
  }

  /** TPC-H Q3 shape — shipping-priority top-k: segment-filtered
    * customers ⋈ date-filtered orders ⋈ shipdate-filtered lineitem,
    * revenue per order, global top 10. Physical shape at any scale:
    * all three filters push to their scans (segment/date/shipdate —
    * `PushedFilters` on each parquet relation), the per-order rollup
    * partial-aggs map-side, and the top-10 is TakeOrderedAndProject
    * (per-partition top-k + a 10-row driver merge), never a global
    * sort. Tie-break on l_orderkey keeps the limit deterministic.
    */
  def q3ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cutoff = "1998-06-01"
    Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
      .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") < cutoff),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, dir)
          .filter(col("l_shipdate") > cutoff),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q10 shape — returned-item reporting: revenue lost to
    * returns per customer over one quarter, top 20. The nation dim
    * (fixed 25 rows) is the one legitimately-hinted broadcast; the
    * quarter filter pushes to orders, the returnflag filter to
    * lineitem, and the top-20 is TakeOrderedAndProject. Customer rides
    * as a join after the orders⋈lineitem rollup is still
    * order-grained, so the widest shuffle carries one row per
    * qualifying order line, keyed on o_custkey only for the final
    * per-customer rollup.
    */
  def q10ReturnedItems(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >= "1996-01-01" &&
            col("o_orderdate") < "1996-04-01"),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, dir).filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("n_name"))
      .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  /** TPC-H Q7 shape — volume shipping between two nations: revenue by
    * (supplier nation, customer nation, ship year) for the two
    * directed pairs of a nation pair. Physical shape: the nation dim
    * is filtered to the TWO named nations before joining, so supplier
    * and customer shrink to 2/25ths of their rows ahead of the fact
    * joins (inner join to the filtered dim doubles as the filter);
    * the cross-pair disjunction (n1≠n2) is the only post-join
    * predicate and runs over dim columns already in the row. Shipdate
    * range pushes to the lineitem scan.
    */
  def q7VolumeShipping(s: SparkSession, dir: String): DataFrame = {
    val pair = Seq("NATION_1", "NATION_2")
    val n1 = Tables.nation(s, dir).filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, dir).filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
    Tables.supplier(s, dir)
      .join(broadcast(n1), col("s_nationkey") === col("s_nkey"))
      .join(Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= "1996-01-01" &&
            col("l_shipdate") < "1998-01-01"),
        col("s_suppkey") === col("l_suppkey"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q8 shape — national market share: of all ECONOMY-part
    * revenue sold to ASIA-region customers per order year, the share
    * supplied by NATION_3. The share is a conditional sum over the
    * same joined fact — one pass, no self-join. Region/nation dims
    * broadcast by hint (constant-size); part and supplier are
    * planner-sized (they grow with SF). The p_type filter reaches the
    * part scan, the date range the orders scan.
    */
  def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    val asiaNations = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val suppNation = Tables.nation(s, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir).filter(col("p_type") === "ECONOMY"),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >= "1996-01-01" &&
            col("o_orderdate") < "1998-01-01"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"),
        "left_semi")
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        moneySum(when(col("supp_nation") === "NATION_3", vol)
          .otherwise(lit(0.0))).as("nation_volume"),
        moneySum(vol).as("total_volume"))
      .withColumn("mkt_share", col("nation_volume") / col("total_volume"))
      .orderBy("o_year")
  }

  /** TPC-H Q6 shape — forecast revenue change: the pure
    * scan-filter-aggregate. All three range predicates reach the
    * parquet scan as PushedFilters; with min/max row-group stats the
    * shipdate year prunes most of a date-sorted fact without reading
    * it. No join, no shuffle except the 1-row final aggregate — the
    * query every columnar engine should execute at I/O speed.
    */
  def q6ForecastRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= "1996-01-01" &&
        col("l_shipdate") < "1997-01-01" &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(moneySum(col("l_extendedprice") * col("l_discount"))
          .as("revenue_delta"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q4 shape — order-priority checking: orders with at least
    * one late line item (shipped after the order quarter ended — the
    * commitdate analog this schema supports), counted per priority.
    * The EXISTS is a LEFT SEMI join on the order key: lineitem never
    * multiplies the orders side, and the semi join's build input is
    * pre-filtered by the pushed shipdate predicate.
    */
  def q4PriorityCheck(s: SparkSession, dir: String): DataFrame = {
    val late = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= "1996-04-01")
      .select(col("l_orderkey"))
    Tables.orders(s, dir)
      .filter(col("o_orderdate") >= "1996-01-01" &&
        col("o_orderdate") < "1996-04-01")
      .join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q13 shape — customer order-count distribution: LEFT OUTER
    * customer⟕orders with the priority predicate in the ON clause
    * (filtering the orders side pre-join — NOT a post-join WHERE,
    * which would turn the outer join inner), count of matched orders
    * per customer (zero for order-less customers via count(col)'s
    * null-skip), then the histogram of those counts. Two aggregations:
    * the first shuffles on c_custkey (partial-agg friendly), the
    * second is over at most max-order-count distinct keys — tiny at
    * any scale.
    */
  /** TPC-H Q9 shape — product-type profit rollup: the widest dim
    * fan-in of the suite (part + supplier + nation + orders around
    * the fact). The name-pattern part prune rides a planner-sized
    * broadcast; supplier×nation is broadcast EXPLICITLY (see the
    * in-body note — the planner's join-size estimate misjudges the
    * dimension product past sf0.01); orders joins on the order key
    * only to supply the year, after the fact has already been
    * part-pruned — so the big join's probe side is ~1/9 of lineitem,
    * not all of it. Profit =
    * extended price net of discount (the fixture ships no
    * ps_supplycost); decimal-exact, grouped by nation × year.
    */
  def q9ProductProfit(s: SparkSession, dir: String): DataFrame = {
    val boltParts = Tables.part(s, dir)
      .filter(col("p_name").like("%bolt%"))
      .select(col("p_partkey"))
    val suppNation = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    // suppNation is explicitly broadcast: supplier×nation is a
    // dimension product (|suppliers| rows of (key, name)) at ANY sf,
    // but the planner's join-size estimate crosses the auto-broadcast
    // threshold at sf0.1 and compiles SMJ — AQE converts it back to
    // BHJ at runtime, yet both map-side hash exchanges still execute
    // (the measured 0.01→1.3 MB shuffle jump in SCALE.json). The hint
    // removes the exchanges at plan time at every sf.
    Tables.lineitem(s, dir)
      .join(boltParts, col("l_partkey") === col("p_partkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), col("o_year"))
      .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("sum_profit"))
      .orderBy(col("n_name"), col("o_year").desc)
  }

  /** TPC-H Q12 shape — two-way conditional counts by a fact dim: per
    * ship class (the returnflag stands in for the fixture's missing
    * l_shipmode), how many HIGH-priority vs other orders shipped in
    * one year. One fact scan with the date filter pushed, the orders
    * side supplying only the priority column, CASE-counts folding
    * map-side — the canonical "pivot a priority flag over a join"
    * report.
    */
  def q12ShipmodePriority(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_returnflag"))
      .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy("l_returnflag")

  def q13OrderHistogram(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir)
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** TPC-H Q19 shape — disjunctive predicate pushdown: lineitem ⋈
    * part under an OR of brand/size/quantity conjunct bundles. The
    * plan property this query exists to pin: Catalyst extracts the
    * per-side residue of the disjunction and pushes it THROUGH the
    * join — the part scan receives the brand/size disjunction, the
    * lineitem scan the quantity disjunction (PushExtraPredicate-
    * ThroughJoin) — so each side prunes before the join instead of
    * filtering the full product after it.
    */
  def q19DisjunctiveRevenue(s: SparkSession, dir: String): DataFrame = {
    val bundle =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#4" && col("p_size").between(1, 15) &&
        col("l_quantity").between(20, 30))
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .filter(bundle)
      .groupBy(col("p_brand"))
      .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("p_brand")
  }

  /** Anti join (NOT EXISTS): customers with no orders in 2001. */
  def antiJoin(s: SparkSession, dir: String): DataFrame = {
    val recent = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    Tables.customer(s, dir)
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }

  /** F4/X16 — the reference's blob-housekeeping listing pass
    * (`Azure_datalake_etl/Gonukkad_Merchants.py:144-155`): list the
    * snapshot prefix, skip directory markers (endswith "/"), leave
    * yesterday's file load-eligible, and strip ".csv" from every older
    * snapshot. The listing is synthesized from `nation` (one dir
    * marker + an older and a current dated file per nation) so the
    * filter/rename semantics are oracle-checkable.
    */
  def fileHousekeeping(s: SparkSession, dir: String): DataFrame = {
    val current = "2024-01-02"
    val listing = Tables.nation(s, dir).select(explode(array(
      concat(lit("live/"), col("n_name"), lit("/")),
      concat(lit("live/"), col("n_name"), lit(s"/2024-01-01_snap.csv")),
      concat(lit("live/"), col("n_name"), lit(s"/${current}_snap.csv"))))
      .as("name"))
    listing
      .filter(!col("name").endsWith("/"))       // GM:150: skip dir markers
      .filter(!col("name").contains(current))   // GM:151: keep latest as-is
      .filter(col("name").contains("."))        // GM:153: only real files
      .select(col("name"),
        regexp_replace(col("name"), "\\.csv$", "").as("renamed_to")) // X16
      .orderBy("name")
  }

  /** Deterministic ~5% sample via a key-derived linear-congruential
    * mix modulo a prime — reproducible across runs, engines, and
    * partitionings (unlike df.sample, whose result depends on the
    * partition split). The shape every 100 TB pipeline needs for
    * debug/validation runs: the sample predicate is a pure row-local
    * filter, pushed to the scan, no shuffle until the final rollup.
    * (At scale prefer xxhash64(key) % N — same shape, better mixing;
    * the LCG mix keeps this oracle-replicable.)
    */
  /** Stratified EXACT-N sampling: up to `n` documents per
    * (source, lang) stratum, chosen by a deterministic key-hash order
    * — the class-balanced subset builder (per-language / per-shard
    * quotas) training-data pipelines need where `df.sample` can give
    * neither per-group quotas nor exact counts. One window shuffle on
    * the stratum key; the LCG-mix order (doc_id tie-break) makes the
    * selection reproducible across runs, engines, and partitionings.
    */
  def stratifiedSample(s: SparkSession, dir: String, n: Int = 5): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"), col("lang"))
      .orderBy((col("doc_id") * lit(2654435761L)) % 97, col("doc_id"))
    Tables.documents(s, dir)
      .select(col("source"), col("lang"), col("doc_id"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= n)
      .orderBy("source", "lang", "rk")
  }

  def hashSample(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter((col("l_orderkey") * lit(2654435761L) +
        col("l_linenumber") * lit(40503L)) % 97 < 5)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_sampled"),
        moneySum(col("l_extendedprice")).as("sum_price"))
      .orderBy("l_returnflag")
}
