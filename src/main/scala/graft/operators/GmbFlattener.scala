package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Scalars._

/** The reference's GMB-API response flattening layer (SURVEY.md §3.2
  * step 4), re-expressed as typed `from_json` + column expressions over
  * a bronze DataFrame of raw JSON strings (`id`, `doc`). Each method
  * reproduces the cited reference derivation exactly, including its
  * quirks:
  *
  *  - location (`buisness_profile_etl/main.py:439-568`): Not_Found
  *    sentinels, Python-style address concatenation (leading ", " kept
  *    when addressLines is empty), hours map that stays Not_Found for
  *    an EMPTY periods array but becomes a (possibly empty) map once
  *    any period exists, additional-category count of dicts with a
  *    "name" key.
  *  - performance (`main.py:587-615`): 4-level explode, non-numeric
  *    values skipped (try_cast), pivot with 0 defaults + derived
  *    totals.
  *  - media (`main.py:631-645`): exists→Yes/No flags.
  *  - localPosts (`main.py:654-673`): offer/promo counts, argmax by
  *    parsed createTime (micros+Z), schedule dates via make_date.
  *  - vom (`main.py:675-698`): the order-sensitive profile-status CASE
  *    chain, incl. `verify.hasPendingVerification` defaulting to TRUE
  *    when absent (so only an explicit false yields
  *    verification_required; `{}` falls through to unexpected_status).
  *  - reviews (`main.py:618-629`): rating rounded to 1 decimal; BOTH
  *    outputs null unless the totalReviewCount key is present (the
  *    reference's coupled guards — nothing defaults to 0).
  *  - services (`main.py:646-652`): counted per matching KEY (an item
  *    carrying both keys counts twice; explicit-null values count,
  *    bare {} items don't).
  *
  * This is the complete set of endpoint payloads the reference
  * actually consumes: the account response is unused (`account_id` is
  * the hardcoded constant at `main.py:483`) and the verification call
  * is commented out (`main.py:569-570`) — both are archive-only (K3).
  * Every flattener is verified two ways: unit specs on FIXTURES.md
  * shapes AND a DuckDB-oracle differential round trip
  * (SemiStructured.gmb*RoundTrip).
  */
object GmbFlattener {

  val locationSchema: StructType = StructType(Seq(
    StructField("title", StringType),
    StructField("storeCode", StringType),
    StructField("phoneNumbers", StructType(Seq(
      StructField("primaryPhone", StringType),
      StructField("additionalPhones", ArrayType(StringType))))),
    StructField("websiteUri", StringType),
    StructField("storefrontAddress", StructType(Seq(
      StructField("addressLines", ArrayType(StringType)),
      StructField("locality", StringType),
      StructField("administrativeArea", StringType),
      StructField("postalCode", StringType)))),
    StructField("regularHours", StructType(Seq(
      StructField("periods", ArrayType(StructType(Seq(
        StructField("openDay", StringType),
        StructField("openTime", StructType(Seq(
          StructField("hours", LongType)))),
        StructField("closeTime", StructType(Seq(
          StructField("hours", LongType))))))))))),
    StructField("categories", StructType(Seq(
      StructField("primaryCategory", StructType(Seq(
        StructField("displayName", StringType),
        StructField("name", StringType)))),
      StructField("additionalCategories", ArrayType(StructType(Seq(
        StructField("name", StringType)))))))),
    StructField("metadata", StructType(Seq(
      StructField("newReviewUri", StringType),
      StructField("mapsUri", StringType))))))

  /** Guard-subtree parse: every subtree whose KEY PRESENCE the
    * flatten tests, captured as its RAW JSON substring (a StringType
    * field in a from_json schema keeps the nested text) in the SAME
    * single parse — so a presence guard scans a short substring with
    * json_object_keys instead of re-walking the whole doc with
    * get_json_object per guard (~10 full-doc scans per row in the
    * round-7 plan). additionalCategories items double as the raw
    * strings the per-item key-presence count needs.
    */
  private val guardSchema: StructType = StructType(Seq(
    StructField("phoneNumbers", StringType),
    StructField("storefrontAddress", StringType),
    StructField("metadata", StringType),
    StructField("categories", StructType(Seq(
      StructField("primaryCategory", StringType),
      StructField("additionalCategories", ArrayType(StringType)))))))

  /** Key-presence test on a pre-extracted raw subtree string: true iff
    * the subtree exists and carries the key (explicit null passes).
    */
  private def keysHas(subtree: Column, key: String): Column =
    coalesce(array_contains(json_object_keys(subtree), key), lit(false))

  /** Python `"".join` + guarded `+=` address build (`main.py:439-456`):
    * parts joined ", "; locality/administrativeArea appended with ", ",
    * postalCode with " "; empty result → Not_Found. Each append is
    * guarded by KEY presence (`'locality' in address`), and the
    * f-string renders an explicit-null value as the literal "None" —
    * so `{"locality": null}` contributes ", None" exactly like the
    * reference, while an absent key contributes nothing.
    */
  private def addressOf(d: Column, rawAddr: Column): Column = {
    def part(prefix: String, key: String): Column =
      when(keysHas(rawAddr, key),
        concat(lit(prefix),
          coalesce(d.getField("storefrontAddress").getField(key),
            lit("None"))))
        .otherwise(lit(""))
    val base = array_join(
      coalesce(d.getField("storefrontAddress").getField("addressLines"),
        array()), ", ")
    val withLoc = concat(base,
      part(", ", "locality"),
      part(", ", "administrativeArea"),
      part(" ", "postalCode"))
    when(length(withLoc) === 0, lit(NotFoundSentinel)).otherwise(withLoc)
  }

  /** Hours map (`main.py:535-546`): Not_Found unless ≥1 period exists;
    * periods missing either time are dropped; serialized sorted for
    * comparability.
    */
  private def hoursOf(d: Column): Column = {
    val periods = d.getField("regularHours").getField("periods")
    val entries = filter(periods, p =>
      p.getField("openTime").getField("hours").isNotNull &&
        p.getField("closeTime").getField("hours").isNotNull)
    // last-wins per day, like the reference's dict assignment
    // (`daywise_hours[day] = ...`) — NOT map_from_entries, whose default
    // duplicate-key policy throws on split hours (two MONDAY periods)
    val days = array_distinct(transform(entries, _.getField("openDay")))
    val serialized = array_join(transform(array_sort(days), day => {
      val lastForDay = element_at(
        filter(entries, p => p.getField("openDay") === day), -1)
      concat(day, lit("="),
        lastForDay.getField("openTime").getField("hours").cast("string"),
        lit("-"),
        lastForDay.getField("closeTime").getField("hours").cast("string"))
    }), ",")
    when(periods.isNull || size(periods) === 0, lit(NotFoundSentinel))
      .otherwise(serialized)
  }

  /** KEY-presence guard mirroring the reference's `'key' in subtree`
    * pattern: true iff the (sub)object exists AND carries the key,
    * regardless of the key's value — an explicit null passes. A
    * missing subtree yields false (the reference would raise on the
    * direct index that fetches the subtree; Not_Found is the sane
    * superset).
    */
  private def keyIn(path: String, key: String): Column = {
    val subtree =
      if (path == "$") col("doc") else get_json_object(col("doc"), path)
    coalesce(array_contains(json_object_keys(subtree), key), lit(false))
  }

  /** location.json → silver columns (`main.py:495-568`). Input: (id,
    * doc) bronze rows. Every guarded field follows the reference's
    * `in` semantics exactly: key absent → Not_Found, key present →
    * the raw value, INCLUDING an explicit null (the reference assigns
    * None there, not 'Not_Found').
    */
  def flattenLocation(bronze: DataFrame): DataFrame = {
    // ATTRIBUTE BARRIER — parse the doc ONCE. Referencing the
    // from_json EXPRESSION from every output column plants a copy per
    // column, and the optimizer's JSON pruning then specializes each
    // copy's schema so codegen subexpression elimination can no longer
    // merge them: the round-7 plan carried 22 JsonToStructs, i.e. 22
    // full JSON scans per row. Materializing the parse as a column of
    // its own projection leaves downstream accesses as
    // GetStructField(attribute) — CollapseProject keeps the barrier
    // because inlining would duplicate a non-cheap expression.
    // Measured: ss_gmb_location 2.5 s → ~0.9 s at sf0.1.
    val parsed = bronze.select(col("id"), col("doc"),
      from_json(col("doc"), locationSchema).as("__d"),
      from_json(col("doc"), guardSchema).as("__g"))
    val d = col("__d")
    val g = col("__g")
    def guarded(sub: Column, key: String, value: Column): Column =
      when(keysHas(sub, key), value).otherwise(lit(NotFoundSentinel))
    parsed.select(col("id"),
      notFound(d.getField("title")).as("business_name"),
      guarded(g.getField("phoneNumbers"), "primaryPhone",
        d.getField("phoneNumbers").getField("primaryPhone")).as("phone"),
      // try_element_at: an EMPTY additionalPhones array passes the
      // key-presence guard, and plain element_at(…, 1) would throw
      // under ANSI mode (the reference ALSO crashes — IndexError — but
      // null is the sane superset of a crash, the convention everywhere
      // else in this file)
      guarded(g.getField("phoneNumbers"), "additionalPhones",
        try_element_at(
          d.getField("phoneNumbers").getField("additionalPhones"),
          lit(1))).as("additional_phone"),
      guarded(col("doc"), "websiteUri", d.getField("websiteUri"))
        .as("website"),
      addressOf(d, g.getField("storefrontAddress")).as("address"),
      guarded(col("doc"), "storeCode", d.getField("storeCode"))
        .as("store_code"),
      hoursOf(d).as("regular_hours"),
      guarded(g.getField("categories").getField("primaryCategory"),
        "displayName",
        d.getField("categories").getField("primaryCategory")
          .getField("displayName")).as("primary_category"),
      // counted per KEY presence (`'name' in category`, main.py:549-553)
      // — an explicit {"name": null} item counts, a bare {} doesn't; a
      // struct-typed parse would conflate the two, so the items are
      // re-parsed as raw JSON strings (the servicesSchema trick) and
      // tested with json_object_keys
      coalesce(size(filter(
        g.getField("categories").getField("additionalCategories"),
        c => array_contains(json_object_keys(c), "name"))), lit(0))
        .as("additional_categories_count"),
      guarded(g.getField("metadata"), "newReviewUri",
        d.getField("metadata").getField("newReviewUri")).as("review_url"),
      guarded(g.getField("metadata"), "mapsUri",
        d.getField("metadata").getField("mapsUri")).as("map_url"))
  }

  val performanceSchema: StructType = StructType(Seq(
    StructField("multiDailyMetricTimeSeries", ArrayType(StructType(Seq(
      StructField("dailyMetricTimeSeries", ArrayType(StructType(Seq(
        StructField("dailyMetric", StringType),
        StructField("timeSeries", StructType(Seq(
          StructField("datedValues", ArrayType(StructType(Seq(
            StructField("date", StructType(Seq(
              StructField("year", IntegerType),
              StructField("month", IntegerType),
              StructField("day", IntegerType)))),
            StructField("value", StringType))))))))))))))))))

  val metricNames: Seq[String] = Seq(
    "WEBSITE_CLICKS", "CALL_CLICKS",
    "BUSINESS_IMPRESSIONS_DESKTOP_MAPS",
    "BUSINESS_IMPRESSIONS_DESKTOP_SEARCH",
    "BUSINESS_IMPRESSIONS_MOBILE_MAPS",
    "BUSINESS_IMPRESSIONS_MOBILE_SEARCH",
    "BUSINESS_CONVERSATIONS", "BUSINESS_DIRECTION_REQUESTS")

  /** performance.json → per-id metric columns + totals
    * (`main.py:587-615`): 3 explodes, try_cast skips non-numeric
    * values, pivot over the fixed metric list with 0 defaults,
    * total_actions / *_impressions / total_impressions arithmetic.
    */
  def flattenPerformance(bronze: DataFrame): DataFrame = {
    // posexplode keeps series order: if the same dailyMetric appears in
    // several series, the reference's `metric_sum[m] = sum` (main.py:605)
    // means the LAST series wins — so sum per series, then keep the
    // last series' sum per metric, not the grand total.
    // _outer explodes throughout: the reference's nested for-loops
    // (main.py:590-607) produce nothing for an empty datedValues, but
    // `metric_sum[m] = sum` still RUNS with sum=0 — so an empty LAST
    // series overwrites an earlier sum with 0, and an id whose series
    // are all empty still surfaces as an all-zero insight row (the
    // pivot's na.fill(0) path). Plain explode would drop both.
    val perSeries = bronze
      .select(col("id"),
        posexplode_outer(from_json(col("doc"), performanceSchema)
          .getField("multiDailyMetricTimeSeries")).as(Seq("p1", "m1")))
      .select(col("id"), col("p1"),
        posexplode_outer(col("m1.dailyMetricTimeSeries")).as(Seq("p2", "m2")))
      .select(col("id"), col("p1"), col("p2"),
        col("m2.dailyMetric").as("metric"),
        explode_outer(col("m2.timeSeries.datedValues")).as("dv"))
      .groupBy("id", "p1", "p2", "metric")
      .agg(coalesce(sum(expr("try_cast(dv.value AS LONG)")), lit(0L))
        .as("series_sum"))
    val lastWins = perSeries
      .groupBy("id", "metric")
      .agg(max(struct(col("p1"), col("p2"), col("series_sum"))).as("m"))
      .select(col("id"), col("metric"), col("m.series_sum").as("v"))
    val pivoted = lastWins.groupBy("id")
      .pivot("metric", metricNames)
      .sum("v")
      .na.fill(0L, metricNames)
    pivoted
      .withColumn("total_actions",
        col("CALL_CLICKS") + col("WEBSITE_CLICKS") +
          col("BUSINESS_DIRECTION_REQUESTS"))
      .withColumn("map_impressions",
        col("BUSINESS_IMPRESSIONS_DESKTOP_MAPS") +
          col("BUSINESS_IMPRESSIONS_MOBILE_MAPS"))
      .withColumn("search_impressions",
        col("BUSINESS_IMPRESSIONS_DESKTOP_SEARCH") +
          col("BUSINESS_IMPRESSIONS_MOBILE_SEARCH"))
      .withColumn("total_impressions",
        col("map_impressions") + col("search_impressions"))
  }

  val mediaSchema: StructType = StructType(Seq(
    StructField("totalMediaItemCount", LongType),
    StructField("mediaItems", ArrayType(StructType(Seq(
      StructField("locationAssociation", StructType(Seq(
        StructField("category", StringType))))))))))

  /** media.json → Yes/No flags + count (`main.py:631-645`). The count
    * is a guarded passthrough with NO 0-default — the reference only
    * assigns it when the key is present (an absent key would hit an
    * unbound local there; null is the sane superset).
    */
  def flattenMedia(bronze: DataFrame): DataFrame = {
    // same attribute barrier as flattenLocation: one parse, not one
    // per output column
    val parsed = bronze.select(col("id"), col("doc"),
      from_json(col("doc"), mediaSchema).as("__d"))
    val d = col("__d")
    def flag(cat: String) = when(coalesce(exists(d.getField("mediaItems"),
      i => i.getField("locationAssociation").getField("category") === cat),
      lit(false)), "Yes").otherwise("No")
    parsed.select(col("id"),
      flag("COVER").as("has_cover"),
      flag("MENU").as("has_menu"),
      when(keyIn("$", "totalMediaItemCount"),
        d.getField("totalMediaItemCount")).as("total_media_item_count"))
  }

  val localPostsSchema: StructType = StructType(Seq(
    StructField("localPosts", ArrayType(StructType(Seq(
      StructField("topicType", StringType),
      StructField("createTime", StringType),
      StructField("updateTime", StringType),
      StructField("event", StructType(Seq(
        StructField("schedule", StructType(Seq(
          StructField("startDate", StructType(Seq(
            StructField("year", IntegerType),
            StructField("month", IntegerType),
            StructField("day", IntegerType)))),
          StructField("endDate", StructType(Seq(
            StructField("year", IntegerType),
            StructField("month", IntegerType),
            StructField("day", IntegerType)))))))))))))),
    StructField("nextPageToken", StringType)))

  private val isoPattern = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"

  /** localPosts.json → offer/promo counts + latest-offer fields
    * (`main.py:654-673`): argmax over parsed createTime, schedule
    * dates via make_date, updateTime truncated to date.
    */
  def flattenLocalPosts(bronze: DataFrame): DataFrame = {
    // attribute barrier (see flattenLocation): parse once; the
    // identical `latest` copies below stay same-shaped over the
    // attribute, so codegen subexpression elimination merges them
    val parsed = bronze.select(col("id"), col("doc"),
      from_json(col("doc"), localPostsSchema)
        .getField("localPosts").as("__posts"))
    val posts = col("__posts")
    val offers = filter(posts, p => p.getField("topicType") === "OFFER")
    // reference keeps the FIRST offer on createTime ties (strict `>`,
    // main.py:662) → tie-break by negated position so array_max prefers
    // the earliest list element among equal createTimes
    val latest = array_max(transform(offers, (p, i) =>
      struct(to_timestamp(p.getField("createTime"), isoPattern).as("ct"),
        (-i).as("negpos"), p.as("post"))))
    parsed.select(col("id"),
      coalesce(size(offers), lit(0)).as("offer_count"),
      coalesce(size(filter(posts,
        p => p.getField("topicType") === "STANDARD")), lit(0))
        .as("promo_count"),
      make_date(
        latest.getField("post").getField("event").getField("schedule")
          .getField("startDate").getField("year"),
        latest.getField("post").getField("event").getField("schedule")
          .getField("startDate").getField("month"),
        latest.getField("post").getField("event").getField("schedule")
          .getField("startDate").getField("day")).as("offer_starts_at"),
      make_date(
        latest.getField("post").getField("event").getField("schedule")
          .getField("endDate").getField("year"),
        latest.getField("post").getField("event").getField("schedule")
          .getField("endDate").getField("month"),
        latest.getField("post").getField("event").getField("schedule")
          .getField("endDate").getField("day")).as("offer_ends_at"),
      to_date(to_timestamp(latest.getField("post").getField("updateTime"),
        isoPattern)).as("offer_updates_at"))
  }

  val reviewsSchema: StructType = StructType(Seq(
    StructField("averageRating", DoubleType),
    StructField("totalReviewCount", LongType)))

  /** reviews.json → rating rollup (`main.py:618-629`). The reference's
    * guards are COUPLED: both outputs default to None and are only
    * assigned inside the `'totalReviewCount' in response` branch — so
    * a payload carrying averageRating but no count surfaces (null,
    * null), and nothing ever defaults to 0. (A count without a rating
    * would hit an unbound local in the reference — here the rating
    * just stays null, the sane superset.)
    *
    * Known rounding-tie divergence: Spark's round() is HALF_UP over
    * the double's shortest decimal form, CPython's round() is
    * half-even over the exact binary value — a rating whose shortest
    * form lands exactly on .x5 (e.g. 4.15) can differ by 0.1. Kept as
    * Spark round() deliberately: the DuckDB oracle shares Spark's
    * behavior on these values, and ties are measure-zero for real
    * aggregated ratings.
    */
  def flattenReviews(bronze: DataFrame): DataFrame = {
    val d = from_json(col("doc"), reviewsSchema)
    val hasCount = keyIn("$", "totalReviewCount")
    bronze.select(col("id"),
      when(hasCount, round(d.getField("averageRating"), 1))
        .as("average_rating"),
      when(hasCount, d.getField("totalReviewCount"))
        .as("total_review_count"))
  }

  /** Items parsed as RAW JSON strings (a StringType field in a
    * from_json schema captures the nested JSON text), so key presence
    * can be tested with json_object_keys — a struct-typed parse would
    * conflate `"structuredServiceItem": null` (key present, reference
    * counts it) with an absent key.
    */
  val servicesSchema: StructType = StructType(Seq(
    StructField("serviceItems", ArrayType(StringType))))

  /** services.json → item count (`main.py:646-652`): the reference
    * iterates each item's KEYS and increments per matching key — so
    * bare `{}` items count 0, explicit-null values count (the Python
    * `in`-style presence), and an item carrying BOTH keys counts
    * TWICE.
    */
  def flattenServices(bronze: DataFrame): DataFrame = {
    val items = from_json(col("doc"), servicesSchema)
      .getField("serviceItems")
    def keyHit(i: Column, k: String): Column =
      when(array_contains(json_object_keys(i), k), 1).otherwise(0)
    bronze.select(col("id"),
      coalesce(aggregate(items, lit(0), (acc, i) =>
        acc + keyHit(i, "structuredServiceItem") +
          keyHit(i, "freeFormServiceItem")), lit(0))
        .as("service_count"))
  }

  // no waitForVoiceOfMerchant field: the 'processing' branch tests raw
  // KEY presence on the doc (keyIn), never the parsed struct
  val vomSchema: StructType = StructType(Seq(
    StructField("complyWithGuidelines", StructType(Seq(
      StructField("recommendationReason", StringType)))),
    StructField("hasVoiceOfMerchant", BooleanType),
    StructField("hasBusinessAuthority", BooleanType),
    StructField("resolveOwnershipConflict", StructType(Seq(
      StructField("_placeholder", StringType)))),
    StructField("verify", StructType(Seq(
      StructField("hasPendingVerification", BooleanType))))))

  /** vom.json → profile_status via the exact priority chain
    * (`main.py:675-698`). Semantics notes:
    *  - 'processing' is a KEY-presence test (`'waitForVoiceOfMerchant'
    *    in response`, `:685`) — an explicit null value still matches,
    *    hence json_object_keys, not a null check on the parsed struct.
    *  - 'duplicate' is a VALUE test (`.get(...) != None`, `:691`) —
    *    explicit null does NOT match; the struct null check is right.
    *  - the reference's 'verified' branch indexes the keys directly
    *    (`:688`) and would raise KeyError when they're absent; this
    *    chain falls through instead (three-valued null && skips the
    *    branch) — the sane superset of a crash.
    */
  def flattenVom(bronze: DataFrame): DataFrame = {
    // attribute barrier (see flattenLocation): parse once
    val parsed = bronze.select(col("id"), col("doc"),
      from_json(col("doc"), vomSchema).as("__d"))
    val d = col("__d")
    val reason = d.getField("complyWithGuidelines")
      .getField("recommendationReason")
    parsed.select(col("id"),
      when(reason === "BUSINESS_LOCATION_SUSPENDED", "suspended")
        .when(reason === "BUSINESS_LOCATION_DISABLED", "location_disabled")
        .when(keyIn("$", "waitForVoiceOfMerchant"), "processing")
        .when(d.getField("hasVoiceOfMerchant") &&
          d.getField("hasBusinessAuthority"), "verified")
        .when(d.getField("resolveOwnershipConflict").isNotNull, "duplicate")
        .when(coalesce(d.getField("verify")
          .getField("hasPendingVerification"), lit(true)) === false,
          "verification_required")
        .otherwise("unexpected_status").as("profile_status"))
  }
}
