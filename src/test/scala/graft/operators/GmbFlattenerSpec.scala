package graft.operators

import graft.SparkSpec

/** Fidelity spec: the FIXTURES.md §B2 JSON shapes (harvested from the
  * reference's consumed fields) through GmbFlattener, asserting the
  * exact reference outputs including edge-case quirks.
  */
class GmbFlattenerSpec extends SparkSpec {

  private def bronze(docs: (Long, String)*) = {
    val s = spark
    import s.implicits._
    docs.toDF("id", "doc")
  }

  private val fullLocation =
    """{"title": "Acme Store", "storeCode": "SC1",
      | "phoneNumbers": {"primaryPhone": "111", "additionalPhones": ["222", "333"]},
      | "websiteUri": "http://acme.example",
      | "storefrontAddress": {"addressLines": ["12 Main St", "Floor 2"],
      |   "locality": "Springfield", "administrativeArea": "IL",
      |   "postalCode": "62704"},
      | "regularHours": {"periods": [
      |   {"openDay": "MONDAY", "openTime": {"hours": 9}, "closeTime": {"hours": 21}},
      |   {"openDay": "TUESDAY", "openTime": {"hours": 9}}]},
      | "categories": {"primaryCategory": {"displayName": "Grocery", "name": "g"},
      |   "additionalCategories": [{"name": "a"}, {"name": "b"}, {}]},
      | "metadata": {"newReviewUri": "http://r", "mapsUri": "http://m"}}"""
      .stripMargin.replace("\n", "")

  test("location: full document flattens to the reference fields") {
    val r = GmbFlattener.flattenLocation(bronze(1L -> fullLocation))
      .collect().head
    assert(r.getAs[String]("business_name") == "Acme Store")
    assert(r.getAs[String]("phone") == "111")
    assert(r.getAs[String]("additional_phone") == "222")
    assert(r.getAs[String]("address") ==
      "12 Main St, Floor 2, Springfield, IL 62704")
    assert(r.getAs[String]("store_code") == "SC1")
    // TUESDAY period lacks closeTime → dropped (main.py:540-543)
    assert(r.getAs[String]("regular_hours") == "MONDAY=9-21")
    assert(r.getAs[String]("primary_category") == "Grocery")
    // the {} entry has no "name" key → not counted (main.py:548-555)
    assert(r.getAs[Int]("additional_categories_count") == 2)
    assert(r.getAs[String]("review_url") == "http://r")
  }

  test("location: absent keys become Not_Found; empty address sentinel") {
    val r = GmbFlattener.flattenLocation(bronze(2L -> "{}")).collect().head
    Seq("business_name", "phone", "additional_phone", "website", "address",
      "store_code", "regular_hours", "primary_category", "review_url",
      "map_url").foreach { c =>
      assert(r.getAs[String](c) == "Not_Found", s"column $c")
    }
    assert(r.getAs[Int]("additional_categories_count") == 0)
  }

  test("location: empty periods array stays Not_Found (loop-indent quirk)") {
    val doc = """{"regularHours": {"periods": []}}"""
    val r = GmbFlattener.flattenLocation(bronze(3L -> doc)).collect().head
    assert(r.getAs[String]("regular_hours") == "Not_Found")
  }

  test("location: locality without addressLines keeps the leading comma") {
    val doc = """{"storefrontAddress": {"locality": "Springfield"}}"""
    val r = GmbFlattener.flattenLocation(bronze(4L -> doc)).collect().head
    assert(r.getAs[String]("address") == ", Springfield")
  }

  test("location: explicit-null locality renders ', None' (f-string parity)") {
    // reference appends f", {address['locality']}" under a KEY-presence
    // guard (main.py:448-454): {"locality": null} → ", None"
    val doc = """{"storefrontAddress": {"locality": null, "postalCode": "9"}}"""
    val r = GmbFlattener.flattenLocation(bronze(6L -> doc)).collect().head
    assert(r.getAs[String]("address") == ", None 9")
  }

  test("location: empty additionalPhones array yields null, not a crash") {
    // the reference raises IndexError here; null is the sane superset
    val doc = """{"phoneNumbers": {"primaryPhone": "1", "additionalPhones": []}}"""
    val r = GmbFlattener.flattenLocation(bronze(7L -> doc)).collect().head
    assert(r.isNullAt(r.fieldIndex("additional_phone")))
  }

  test("location: explicit-null category name still counts (key presence)") {
    // main.py:549-553 counts dicts CARRYING the 'name' key — the value
    // may be null; a bare {} has no key and is skipped
    val doc = """{"categories": {"additionalCategories":
      | [{"name": null}, {}, {"name": "x"}]}}""".stripMargin.replace("\n", "")
    val r = GmbFlattener.flattenLocation(bronze(8L -> doc)).collect().head
    assert(r.getAs[Int]("additional_categories_count") == 2)
  }

  test("location: split hours — duplicate openDay keeps the LAST period") {
    val doc =
      """{"regularHours": {"periods": [
        | {"openDay": "MONDAY", "openTime": {"hours": 9}, "closeTime": {"hours": 12}},
        | {"openDay": "MONDAY", "openTime": {"hours": 17}, "closeTime": {"hours": 21}}
        |]}}""".stripMargin.replace("\n", "")
    val r = GmbFlattener.flattenLocation(bronze(5L -> doc)).collect().head
    // reference dict assignment last-wins (main.py:538-546)
    assert(r.getAs[String]("regular_hours") == "MONDAY=17-21")
  }

  test("performance: duplicate dailyMetric across series — last series wins") {
    val doc =
      """{"multiDailyMetricTimeSeries": [
        | {"dailyMetricTimeSeries": [
        |   {"dailyMetric": "CALL_CLICKS", "timeSeries": {"datedValues": [
        |     {"date": {"year": 2023, "month": 10, "day": 1}, "value": "10"}]}}]},
        | {"dailyMetricTimeSeries": [
        |   {"dailyMetric": "CALL_CLICKS", "timeSeries": {"datedValues": [
        |     {"date": {"year": 2023, "month": 10, "day": 2}, "value": "3"}]}}]}
        |]}""".stripMargin.replace("\n", "")
    val r = GmbFlattener.flattenPerformance(bronze(9L -> doc)).collect().head
    // reference metric_sum[m] = sum overwrites per series (main.py:605)
    assert(r.getAs[Long]("CALL_CLICKS") == 3)
  }

  test("performance: empty LAST series overwrites an earlier sum with 0") {
    val doc =
      """{"multiDailyMetricTimeSeries": [
        | {"dailyMetricTimeSeries": [
        |   {"dailyMetric": "CALL_CLICKS", "timeSeries": {"datedValues": [
        |     {"date": {"year": 2023, "month": 10, "day": 1}, "value": "10"}]}}]},
        | {"dailyMetricTimeSeries": [
        |   {"dailyMetric": "CALL_CLICKS", "timeSeries": {"datedValues": []}}]}
        |]}""".stripMargin.replace("\n", "")
    val r = GmbFlattener.flattenPerformance(bronze(9L -> doc)).collect().head
    // reference runs metric_sum[m] = 0 for the empty series (main.py:605)
    assert(r.getAs[Long]("CALL_CLICKS") == 0)
  }

  test("performance: id with only empty series emits an all-zero row") {
    val doc =
      """{"multiDailyMetricTimeSeries": [{"dailyMetricTimeSeries": [
        | {"dailyMetric": "CALL_CLICKS", "timeSeries": {"datedValues": []}}
        |]}]}""".stripMargin.replace("\n", "")
    val rows = GmbFlattener.flattenPerformance(bronze(3L -> doc)).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("CALL_CLICKS") == 0)
    assert(rows.head.getAs[Long]("total_impressions") == 0)
  }

  test("performance: empty multiDailyMetricTimeSeries still emits a row") {
    val rows = GmbFlattener
      .flattenPerformance(bronze(4L -> """{"multiDailyMetricTimeSeries": []}"""))
      .collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("total_actions") == 0)
  }

  test("reviews: outputs are coupled to the totalReviewCount key") {
    // no count key → BOTH null, never 0 (main.py:619-627 only assigns
    // inside the totalReviewCount branch)
    val r = GmbFlattener.flattenReviews(
      bronze(2L -> """{"averageRating": 4.9}""")).collect().head
    assert(r.isNullAt(r.fieldIndex("average_rating")))
    assert(r.isNullAt(r.fieldIndex("total_review_count")))
    val r2 = GmbFlattener.flattenReviews(
      bronze(3L -> """{"averageRating": 4.27, "totalReviewCount": 12}"""))
      .collect().head
    assert(r2.getAs[Double]("average_rating") == 4.3)
    assert(r2.getAs[Long]("total_review_count") == 12L)
  }

  test("services: bare {} items are not counted (key-presence check)") {
    val doc =
      """{"serviceItems": [
        | {"structuredServiceItem": {"serviceTypeId": "a"}},
        | {"freeFormServiceItem": {"label": "b"}},
        | {"structuredServiceItem": null},
        | {"structuredServiceItem": {"serviceTypeId": "c"},
        |  "freeFormServiceItem": {"label": "d"}},
        | {}
        |]}""".stripMargin.replace("\n", "")
    val r = GmbFlattener.flattenServices(bronze(4L -> doc)).collect().head
    // explicit null still has the KEY → counts (Python `in`); {}
    // doesn't; an item with BOTH keys counts twice (per-key loop)
    assert(r.getAs[Int]("service_count") == 5)
    val empty = GmbFlattener.flattenServices(bronze(5L -> "{}"))
      .collect().head
    assert(empty.getAs[Int]("service_count") == 0)
  }

  test("vom: explicit-null waitForVoiceOfMerchant still means processing") {
    val r = GmbFlattener.flattenVom(
      bronze(6L -> """{"waitForVoiceOfMerchant": null}""")).collect().head
    // reference tests KEY presence ('waitForVoiceOfMerchant' in data)
    assert(r.getAs[String]("profile_status") == "processing")
    // but duplicate is a VALUE test (.get(...) != None): explicit null
    // does NOT match and falls through to unexpected_status
    val r2 = GmbFlattener.flattenVom(
      bronze(7L -> """{"resolveOwnershipConflict": null}""")).collect().head
    assert(r2.getAs[String]("profile_status") == "unexpected_status")
  }

  test("localPosts: createTime tie keeps the FIRST offer (strict >)") {
    val doc =
      """{"localPosts": [
        | {"topicType": "OFFER", "createTime": "2023-11-01T10:00:00.000000Z",
        |  "updateTime": "2023-11-02T10:00:00.000000Z",
        |  "event": {"schedule": {
        |    "startDate": {"year": 2023, "month": 11, "day": 1},
        |    "endDate": {"year": 2023, "month": 11, "day": 2}}}},
        | {"topicType": "OFFER", "createTime": "2023-11-01T10:00:00.000000Z",
        |  "updateTime": "2023-11-09T10:00:00.000000Z",
        |  "event": {"schedule": {
        |    "startDate": {"year": 2023, "month": 11, "day": 8},
        |    "endDate": {"year": 2023, "month": 11, "day": 9}}}}
        |]}""".stripMargin.replace("\n", "")
    val r = GmbFlattener.flattenLocalPosts(bronze(9L -> doc)).collect().head
    assert(r.getAs[java.sql.Date]("offer_starts_at").toString == "2023-11-01")
  }

  test("performance: 4-level unwind, non-numeric skipped, totals") {
    val doc =
      """{"multiDailyMetricTimeSeries": [{"dailyMetricTimeSeries": [
        | {"dailyMetric": "CALL_CLICKS", "timeSeries": {"datedValues": [
        |   {"date": {"year": 2023, "month": 10, "day": 1}, "value": "4"},
        |   {"date": {"year": 2023, "month": 10, "day": 2}},
        |   {"date": {"year": 2023, "month": 10, "day": 3}, "value": "x"}]}},
        | {"dailyMetric": "WEBSITE_CLICKS", "timeSeries": {"datedValues": [
        |   {"date": {"year": 2023, "month": 10, "day": 1}, "value": "7"}]}},
        | {"dailyMetric": "BUSINESS_DIRECTION_REQUESTS", "timeSeries":
        |   {"datedValues": [
        |   {"date": {"year": 2023, "month": 10, "day": 1}, "value": "2"}]}},
        | {"dailyMetric": "BUSINESS_IMPRESSIONS_DESKTOP_MAPS", "timeSeries":
        |   {"datedValues": [
        |   {"date": {"year": 2023, "month": 10, "day": 1}, "value": "10"}]}},
        | {"dailyMetric": "BUSINESS_IMPRESSIONS_MOBILE_MAPS", "timeSeries":
        |   {"datedValues": [
        |   {"date": {"year": 2023, "month": 10, "day": 1}, "value": "5"}]}}
        |]}]}""".stripMargin.replace("\n", "")
    val r = GmbFlattener.flattenPerformance(bronze(1L -> doc))
      .collect().head
    assert(r.getAs[Long]("CALL_CLICKS") == 4) // "x" and missing skipped
    assert(r.getAs[Long]("WEBSITE_CLICKS") == 7)
    assert(r.getAs[Long]("BUSINESS_CONVERSATIONS") == 0) // absent → 0
    assert(r.getAs[Long]("total_actions") == 13)
    assert(r.getAs[Long]("map_impressions") == 15)
    assert(r.getAs[Long]("search_impressions") == 0)
    assert(r.getAs[Long]("total_impressions") == 15)
  }

  test("media: exists flags and count") {
    val doc =
      """{"totalMediaItemCount": 12, "mediaItems": [
        | {"locationAssociation": {"category": "COVER"}},
        | {"locationAssociation": {"category": "ADDITIONAL"}},
        | {"locationAssociation": {}}]}""".stripMargin.replace("\n", "")
    val r = GmbFlattener.flattenMedia(bronze(1L -> doc)).collect().head
    assert(r.getAs[String]("has_cover") == "Yes")
    assert(r.getAs[String]("has_menu") == "No")
    assert(r.getAs[Long]("total_media_item_count") == 12)
  }

  test("localPosts: counts + argmax-by-createTime offer extraction") {
    val doc =
      """{"localPosts": [
        | {"topicType": "OFFER", "createTime": "2023-11-01T10:00:00.000000Z",
        |  "updateTime": "2023-11-02T10:00:00.000000Z",
        |  "event": {"schedule": {
        |    "startDate": {"year": 2023, "month": 11, "day": 1},
        |    "endDate": {"year": 2023, "month": 11, "day": 30}}}},
        | {"topicType": "OFFER", "createTime": "2023-12-05T10:00:00.000000Z",
        |  "updateTime": "2023-12-06T10:00:00.000000Z",
        |  "event": {"schedule": {
        |    "startDate": {"year": 2023, "month": 12, "day": 5},
        |    "endDate": {"year": 2023, "month": 12, "day": 25}}}},
        | {"topicType": "STANDARD", "createTime": "2023-12-31T10:00:00.000000Z"}
        |]}""".stripMargin.replace("\n", "")
    val r = GmbFlattener.flattenLocalPosts(bronze(1L -> doc)).collect().head
    assert(r.getAs[Int]("offer_count") == 2)
    assert(r.getAs[Int]("promo_count") == 1)
    assert(r.getAs[java.sql.Date]("offer_starts_at").toString == "2023-12-05")
    assert(r.getAs[java.sql.Date]("offer_ends_at").toString == "2023-12-25")
    assert(r.getAs[java.sql.Date]("offer_updates_at").toString == "2023-12-06")
  }

  test("vom: exact CASE-chain priorities incl. the default-true quirk") {
    val cases = Seq(
      """{"complyWithGuidelines": {"recommendationReason": "BUSINESS_LOCATION_SUSPENDED"}}""" -> "suspended",
      """{"complyWithGuidelines": {"recommendationReason": "BUSINESS_LOCATION_DISABLED"}}""" -> "location_disabled",
      """{"waitForVoiceOfMerchant": {}}""" -> "processing",
      """{"hasVoiceOfMerchant": true, "hasBusinessAuthority": true}""" -> "verified",
      """{"resolveOwnershipConflict": {}}""" -> "duplicate",
      """{"verify": {"hasPendingVerification": false}}""" -> "verification_required",
      // absent verify key → hasPendingVerification defaults TRUE →
      // NOT verification_required (main.py:694)
      """{}""" -> "unexpected_status",
      """{"verify": {"hasPendingVerification": true}}""" -> "unexpected_status",
      // priority: suspended wins over verified
      """{"complyWithGuidelines": {"recommendationReason": "BUSINESS_LOCATION_SUSPENDED"}, "hasVoiceOfMerchant": true, "hasBusinessAuthority": true}""" -> "suspended")
    val in = bronze(cases.zipWithIndex.map {
      case ((doc, _), i) => i.toLong -> doc
    }: _*)
    val got = GmbFlattener.flattenVom(in).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case ((_, want), i) =>
      assert(got(i.toLong) == want, s"case $i")
    }
  }
}
