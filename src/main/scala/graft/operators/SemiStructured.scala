package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.Scalars._

/** Semi-structured JSON operators (SURVEY.md §2.1 S4-S6, §2.6 X3/X6):
  * the REST-response flattening layer. The nested documents are BUILT
  * from the relational testdata (to_json of collected structs — the
  * same shape a DataSource-V2 REST connector would land as a bronze
  * layer), then parsed back with explicit schemas (`from_json`),
  * traversed permissively, exploded, and aggregated. Oracles check the
  * whole round trip against the flat tables.
  */
object SemiStructured {

  private val orderDocSchema = StructType(Seq(
    StructField("okey", LongType),
    StructField("items", ArrayType(StructType(Seq(
      StructField("qty", DoubleType),
      StructField("flag", StringType)))))))

  /** S5/S6 + A1: JSON document → from_json(schema) → explode array of
    * structs → grouped SUM. Mirrors the `multiDailyMetricTimeSeries`
    * unwind (`BP:587-607`) with a full build→parse round trip.
    */
  def jsonFlatten(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.lineitem(s, dir)
      .groupBy("l_orderkey")
      .agg(to_json(struct(col("l_orderkey").as("okey"),
        collect_list(struct(col("l_quantity").as("qty"),
          col("l_returnflag").as("flag"))).as("items"))).as("doc"))
    docs
      .select(from_json(col("doc"), orderDocSchema).as("d"))
      .select(explode(col("d.items")).as("it"))
      .groupBy(col("it.flag").as("flag"))
      .agg(sum(money(col("it.qty"))).cast("double").as("sum_qty"),
        count(lit(1)).as("n_items"))
      .orderBy("flag")
  }

  /** X6/X3: untyped JSON field access with permissive missing keys —
    * `get_json_object` over the free-JSON `events.props` column
    * (guarded dict access, `BP:511`), missing → null → sentinel/0.
    */
  def propsExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        get_json_object(col("props"), "$.missing").as("missing"))
      .groupBy("event_type")
      .agg(sum(col("k")).as("k_sum"),
        count(col("missing")).as("n_missing_present"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  /** S6 struct traversal: typed from_json + nested field paths with
    * null-safe defaults (`categories.primaryCategory.displayName`
    * shape, `BP:560-568`).
    */
  def structTraversal(s: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(StructField("profile", StructType(Seq(
      StructField("name", StringType),
      StructField("meta", StructType(Seq(
        StructField("segment", StringType),
        StructField("uri", StringType)))))))))
    Tables.customer(s, dir)
      .withColumn("doc", to_json(struct(struct(col("c_name").as("name"),
        struct(col("c_mktsegment").as("segment"),
          lit(null).cast("string").as("uri")).as("meta")).as("profile"))))
      .select(col("c_custkey"), from_json(col("doc"), schema).as("d"))
      .select(col("c_custkey"),
        col("d.profile.name").as("name"),
        col("d.profile.meta.segment").as("segment"),
        notFound(col("d.profile.meta.uri")).as("uri"))
      .orderBy("c_custkey")
  }

  /** End-to-end differential test of the GMB performance flattener
    * (`GmbFlattener.flattenPerformance`, reference `main.py:587-615`):
    * deterministic bronze JSON in the exact GMB response shape is
    * BUILT from `events`, pushed through the real build → parse →
    * explode → last-wins → pivot path, and the DuckDB oracle computes
    * the same aggregation directly from `events` — so the whole JSON
    * round trip must be semantics-preserving, not just parse.
    */
  def gmbPerformanceRoundTrip(s: SparkSession, dir: String): DataFrame = {
    val metricOf = when(col("event_type") === "click", "CALL_CLICKS")
      .when(col("event_type") === "view", "WEBSITE_CLICKS")
      .when(col("event_type") === "purchase", "BUSINESS_CONVERSATIONS")
      .when(col("event_type") === "signup",
        "BUSINESS_IMPRESSIONS_DESKTOP_MAPS")
      .otherwise("BUSINESS_DIRECTION_REQUESTS")
    // floor() on both engines (double→int CAST truncates in Spark but
    // ROUNDS in DuckDB — never cast a fractional double cross-engine)
    val perMetric = Tables.events(s, dir)
      .select(col("user_id").as("id"), metricOf.as("metric"),
        col("ts"), floor(col("value")).cast("long").as("v"))
      .groupBy(col("id"), col("metric"))
      .agg(collect_list(struct(
        struct(year(col("ts")).as("year"), month(col("ts")).as("month"),
          dayofmonth(col("ts")).as("day")).as("date"),
        col("v").cast("string").as("value"))).as("dvs"))
    val bronze = perMetric.groupBy("id")
      // one series per metric; sort for a deterministic series order
      // (sum is order-independent inside a series)
      .agg(sort_array(collect_list(struct(col("metric"), col("dvs"))))
        .as("ms"))
      .select(col("id"), to_json(struct(transform(col("ms"), m =>
        struct(array(struct(
          m.getField("metric").as("dailyMetric"),
          struct(m.getField("dvs").as("datedValues")).as("timeSeries")))
          .as("dailyMetricTimeSeries")))
        .as("multiDailyMetricTimeSeries"))).as("doc"))
    GmbFlattener.flattenPerformance(bronze).orderBy("id")
  }

  /** Differential round trip for `GmbFlattener.flattenMedia`
    * (`main.py:631-645`): media JSON built from each customer's
    * orders (order status → mediaItem category), flattened by the
    * real exists→Yes/No path; the oracle computes the flags directly
    * from orders.
    */
  def gmbMediaRoundTrip(s: SparkSession, dir: String): DataFrame = {
    val cat = when(col("o_orderstatus") === "F", "COVER")
      .when(col("o_orderstatus") === "O", "MENU")
      .otherwise("ADDITIONAL")
    val bronze = Tables.orders(s, dir)
      .select(col("o_custkey").as("id"), cat.as("category"))
      .groupBy("id")
      .agg(count(lit(1)).as("n"),
        collect_list(struct(struct(col("category").as("category"))
          .as("locationAssociation"))).as("items"))
      .select(col("id"), to_json(struct(
        col("n").as("totalMediaItemCount"),
        col("items").as("mediaItems"))).as("doc"))
    GmbFlattener.flattenMedia(bronze).orderBy("id")
  }

  /** Differential round trip for `GmbFlattener.flattenVom`
    * (`main.py:675-698`): each customer's VoM JSON is synthesized to
    * exercise one branch of the order-sensitive profile-status chain
    * (c_custkey mod 8 selects the branch; branch 0 also sets a
    * lower-priority field, so priority ORDER is what's under test);
    * the oracle states the expected branch outcomes directly.
    */
  def gmbVomRoundTrip(s: SparkSession, dir: String): DataFrame = {
    val k = pmod(col("c_custkey"), lit(8))
    val doc = to_json(struct(
      when(k === 0,
        struct(lit("BUSINESS_LOCATION_SUSPENDED").as("recommendationReason")))
        .when(k === 1,
          struct(lit("BUSINESS_LOCATION_DISABLED").as("recommendationReason")))
        .as("complyWithGuidelines"),
      // branch 0 ALSO sets this lower-priority field: suspended must
      // win. (Branch 2's doc is replaced wholesale by the explicit-null
      // literal below, so only branch 0 builds the struct form here.)
      when(k === 0, struct(lit("x").as("_placeholder")))
        .as("waitForVoiceOfMerchant"),
      when(k === 3, lit(true)).when(k === 7, lit(true))
        .as("hasVoiceOfMerchant"),
      when(k === 3, lit(true)).when(k === 7, lit(false))
        .as("hasBusinessAuthority"),
      when(k === 4, struct(lit("x").as("_placeholder")))
        .as("resolveOwnershipConflict"),
      when(k === 5 || k === 7, struct(lit(false).as("hasPendingVerification")))
        .as("verify")))
    val bronze = Tables.customer(s, dir)
      .select(col("c_custkey").as("id"),
        // branch 2 ships an EXPLICIT-null waitForVoiceOfMerchant (key
        // present, value null — to_json can't synthesize it): the
        // reference's `in` check must still classify it 'processing'
        when(k === 2, lit("""{"waitForVoiceOfMerchant": null}"""))
          .otherwise(doc).as("doc"))
    GmbFlattener.flattenVom(bronze).orderBy("id")
  }

  /** Differential round trip for `GmbFlattener.flattenLocation`
    * (`main.py:439-568`): location JSON synthesized per customer with
    * key-derived presence/absence of every optional field, so the
    * Not_Found sentinels, the leading-", " address quirk, the
    * empty-vs-absent periods distinction, and duplicate-day last-wins
    * hours are all exercised against a directly-computed oracle.
    */
  def gmbLocationRoundTrip(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
    val key = col("c_custkey")
    val phoneStr = concat(lit("+1-"), key.cast("string"))
    val postal = (key % 100000).cast("string")
    def period(day: String, open: Option[Long], close: Option[Long]) =
      struct(lit(day).as("openDay"),
        open.map(h => struct(lit(h).as("hours")))
          .getOrElse(lit(null)).as("openTime"),
        close.map(h => struct(lit(h).as("hours")))
          .getOrElse(lit(null)).as("closeTime"))
    val doc = to_json(struct(
      col("c_name").as("title"),
      when(key % 7 === 0, concat(lit("SC"), key.cast("string")))
        .as("storeCode"),
      when(key % 2 === 0, struct(
        phoneStr.as("primaryPhone"),
        when(key % 4 === 0,
          array(concat(phoneStr, lit("-a")), concat(phoneStr, lit("-b"))))
          .as("additionalPhones"))).as("phoneNumbers"),
      when(key % 5 === 0, concat(lit("http://ex.com/"), key.cast("string")))
        .as("websiteUri"),
      when(key % 3 =!= 2, struct(
        when(key % 3 === 0, array(col("c_mktsegment"), col("n_name")))
          .as("addressLines"),
        when(key % 2 === 0, col("n_name")).as("locality"),
        lit(null).cast("string").as("administrativeArea"),
        postal.as("postalCode"))).as("storefrontAddress"),
      when(key % 4 === 1, struct(array().cast(
        "array<struct<openDay:string,openTime:struct<hours:bigint>," +
          "closeTime:struct<hours:bigint>>>").as("periods")))
        .when(key % 4 === 2, struct(array(
          period("MONDAY", Some(9L), Some(17L)),
          period("MONDAY", Some(10L), Some(18L))).as("periods")))
        .when(key % 4 === 3, struct(array(
          period("TUESDAY", Some(7L), None),
          period("WEDNESDAY", Some(8L), Some(16L))).as("periods")))
        .as("regularHours"), // key % 4 == 0 → absent
      when(key % 2 === 0, struct(
        struct(col("c_mktsegment").as("displayName"),
          lit(null).cast("string").as("name")).as("primaryCategory"),
        when(key % 4 === 0, array(
          struct(lit("extra").as("name")),
          struct(lit(null).cast("string").as("name"))))
          .as("additionalCategories"))).as("categories"),
      when(key % 5 === 0, struct(
        concat(lit("rev://"), key.cast("string")).as("newReviewUri"),
        lit(null).cast("string").as("mapsUri"))).as("metadata")))
    // every 11th customer ships explicit-null keys (built with string
    // concat — to_json omits nulls): phone/website surface as NULL
    // (key present), the EMPTY additionalPhones array yields null (not
    // a crash), the explicit-null locality renders ", None" in the
    // address like the reference's f-string, and the explicit-null
    // {"name": null} category item COUNTS (key presence) while the
    // bare {} item doesn't
    val explicitNullDoc = concat(
      lit("{\"title\": \""), col("c_name"),
      lit("\", \"websiteUri\": null, " +
        "\"phoneNumbers\": {\"primaryPhone\": null, " +
        "\"additionalPhones\": []}, " +
        "\"storefrontAddress\": {\"locality\": null, " +
        "\"postalCode\": \"9\"}, " +
        "\"categories\": {\"additionalCategories\": " +
        "[{\"name\": null}, {}]}}"))
    GmbFlattener.flattenLocation(
      c.select(key.as("id"),
        when(key % 11 === 0, explicitNullDoc).otherwise(doc).as("doc")))
      .orderBy("id")
  }

  /** Differential round trip for `GmbFlattener.flattenLocalPosts`
    * (`main.py:654-673`): posts built from each customer's orders
    * ('O' status → OFFER), the list sorted (createTime, orderkey) so
    * the reference's keep-FIRST-on-tie argmax is deterministic; the
    * oracle picks the same offer with a window rank.
    */
  def gmbLocalPostsRoundTrip(s: SparkSession, dir: String): DataFrame = {
    val iso = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"
    def dparts(c: org.apache.spark.sql.Column) =
      struct(year(c).as("year"), month(c).as("month"),
        dayofmonth(c).as("day"))
    val post = struct(
      when(col("o_orderstatus") === "O", "OFFER").otherwise("STANDARD")
        .as("topicType"),
      date_format(col("o_orderdate"), iso).as("createTime"),
      date_format(col("o_orderdate") + expr("INTERVAL 1 DAY"), iso)
        .as("updateTime"),
      struct(struct(
        dparts(col("o_orderdate")).as("startDate"),
        dparts(col("o_orderdate") + expr("INTERVAL 7 DAYS")).as("endDate"))
        .as("schedule")).as("event"))
    val bronze = Tables.orders(s, dir)
      .select(col("o_custkey").as("id"),
        struct(date_format(col("o_orderdate"), iso).as("ct"),
          col("o_orderkey").as("okey"), post.as("post")).as("keyed"))
      .groupBy("id")
      .agg(sort_array(collect_list(col("keyed"))).as("sorted"))
      .select(col("id"), to_json(struct(
        expr("transform(sorted, x -> x.post)").as("localPosts"))).as("doc"))
    GmbFlattener.flattenLocalPosts(bronze).orderBy("id")
  }

  /** Row-level quality quarantine — the production answer to the
    * reference's swallowed exceptions (`GM:63-64` prints and continues
    * with empty data): malformed JSON rows are ROUTED, not dropped or
    * fatal. Corruption is synthesized deterministically (every 7th
    * event's props gets trailing garbage) so the oracle can state the
    * expected routing; Spark's side must prove `from_json` actually
    * nulls exactly those rows. Both branches come from one pass —
    * at scale you'd write the quarantine side to a dead-letter path
    * with the same single-scan shape.
    */
  def qualityQuarantine(s: SparkSession, dir: String): DataFrame = {
    // PERMISSIVE from_json yields a struct with null FIELDS on
    // malformed input (never a null struct) — a corrupt-record column
    // is the reliable malformed-row marker
    val propsSchema = StructType(Seq(StructField("k", LongType),
      StructField("_corrupt", StringType)))
    val parseOpts = Map("columnNameOfCorruptRecord" -> "_corrupt")
    Tables.events(s, dir)
      // garbage is PREPENDED: from_json (Jackson) stops at the end of
      // the first JSON value and tolerates trailing junk, so only a
      // leading corruption reliably fails the parse
      .withColumn("raw",
        when(col("event_id") % 7 === 0, concat(lit("x"), col("props")))
          .otherwise(col("props")))
      .withColumn("parsed", from_json(col("raw"), propsSchema, parseOpts))
      .groupBy(col("event_type"))
      .agg(
        count(when(col("parsed._corrupt").isNull, 1)).as("n_good"),
        count(when(col("parsed._corrupt").isNotNull, 1))
          .as("n_quarantined"),
        coalesce(sum(col("parsed").getField("k")), lit(0L)).as("k_sum_good"))
      .orderBy("event_type")
  }

  /** Differential round trip for `GmbFlattener.flattenReviews`
    * (`main.py:618-629`): the rating is synthesized with hundredths
    * in {.01,.02,.03} (never near a .x5 rounding boundary, which
    * Spark and DuckDB may break differently on doubles) and omitted
    * for every 5th customer to exercise the guarded access.
    */
  def gmbReviewsRoundTrip(s: SparkSession, dir: String): DataFrame = {
    val k = col("c_custkey")
    val rating = (k % 40) / lit(10.0) + (k % 3 + 1) / lit(100.0)
    val bronze = Tables.customer(s, dir)
      .select(k.as("id"), to_json(struct(
        when(k % 5 =!= 0, rating).as("averageRating"),
        when(k % 7 =!= 0, k % 1000).as("totalReviewCount"))).as("doc"))
    GmbFlattener.flattenReviews(bronze).orderBy("id")
  }

  /** Differential round trip for `GmbFlattener.flattenServices`
    * (`main.py:646-652`): each order becomes a serviceItem —
    * structured for 'O', free-form for 'F'; 'P' orders split into an
    * EXPLICIT-null key (even orderkey — the key is present, so the
    * reference's `in` check counts it) and a bare `{}` (odd — not
    * counted). Item JSON is built with string concat because to_json
    * omits null fields and could never synthesize the explicit-null
    * case.
    */
  def gmbServicesRoundTrip(s: SparkSession, dir: String): DataFrame = {
    val itemJson =
      when(col("o_orderstatus") === "O",
        concat(lit("""{"structuredServiceItem": {"serviceTypeId": "svc-"""),
          col("o_orderkey").cast("string"), lit("\"}}")))
        .when(col("o_orderstatus") === "F",
          concat(lit("""{"freeFormServiceItem": {"label": "free-"""),
            col("o_orderkey").cast("string"), lit("\"}}")))
        .when(col("o_orderkey") % 2 === 0,
          lit("""{"structuredServiceItem": null}"""))
        .otherwise(lit("{}"))
    val bronze = Tables.orders(s, dir)
      .select(col("o_custkey").as("id"), itemJson.as("item"))
      .groupBy("id")
      .agg(concat(lit("""{"serviceItems": ["""),
        array_join(collect_list(col("item")), ", "), lit("]}")).as("doc"))
    GmbFlattener.flattenServices(bronze).orderBy("id")
  }

  /** Semi-structured access through Spark 4's VARIANT type — the
    * schema-LESS counterpart to `structTraversal`'s typed from_json:
    * `parse_json` shreds the document once into the binary variant
    * encoding, then each `try_variant_get` walks the path at read
    * time with per-path target types; absent paths yield null instead
    * of analysis errors (the guarded-dict-access semantics,
    * `BP:511`, without a declared schema). At scale this is the
    * ingest shape for heterogeneous JSON: parse once, store VARIANT,
    * let every consumer extract its own paths — no
    * lowest-common-denominator schema negotiation. The JSON here is
    * built from `customer` so the oracle replays directly from the
    * flat columns (the round trip is the thing under test).
    */
  def variantPath(s: SparkSession, dir: String): DataFrame = {
    val doc = to_json(struct(
      struct(col("c_name").as("name"),
        struct(col("c_mktsegment").as("segment"),
          col("c_acctbal").as("balance")).as("meta")).as("profile"),
      col("c_custkey").as("id")))
    Tables.customer(s, dir)
      .select(parse_json(doc).as("v"))
      .select(
        try_variant_get(col("v"), "$.id", "long").as("id"),
        try_variant_get(col("v"), "$.profile.meta.segment", "string")
          .as("segment"),
        try_variant_get(col("v"), "$.profile.meta.balance", "double")
          .as("balance"),
        try_variant_get(col("v"), "$.profile.meta.absent", "string")
          .as("missing"))
      .groupBy("segment")
      .agg(count(lit(1)).as("n"),
        graft.functions.Scalars.moneySum(col("balance"))
          .as("total_balance"),
        count(col("missing")).as("n_missing_present"),
        min(col("id")).as("min_id"))
      .orderBy("segment")
  }
}
