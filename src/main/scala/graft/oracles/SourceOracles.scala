package graft.oracles

import graft.oracles.Gen._

/** DuckDB oracle SQL for the source / sink / semi-structured round-trip queries —
  * one entry per SparkEntry.queries key in this family. Moved out
  * of SparkEntry mechanically (round-10 verdict ask #7); the text
  * of every entry is unchanged.
  */
private[graft] object SourceOracles {
  val sql: Map[String, String] = Map(
    "s1_scan_project" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey",
    "f1_digit_filter" ->
      """SELECT c_custkey, id_str, CAST(id_str AS BIGINT) AS id_num
        |FROM (SELECT c_custkey,
        |        trim(regexp_extract(c_name, '#([0-9]+)$', 1)) AS id_str
        |      FROM customer)
        |WHERE id_str IS NOT NULL AND regexp_matches(id_str, '^[0-9]+$')
        |ORDER BY c_custkey""".stripMargin,
    "s3_full_dump" ->
      """SELECT n_nationkey, n_name, n_regionkey,
        | CAST(n_nationkey < 12 AS INT) AS is_low_key
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "s2_jdbc_source" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
        |WHERE s_acctbal > 0 AND s_nationkey IN
        |  (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
        |ORDER BY s_suppkey""".stripMargin,
    "s2_jdbc_agg_pushdown" ->
      // the rollup the DATABASE computes under aggregate pushdown,
      // restated over the parquet seed
      """SELECT s_nationkey,
        | CAST(CAST(SUM(CAST(s_acctbal AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS bal,
        | CAST(COUNT(*) AS BIGINT) AS n,
        | MIN(s_acctbal) AS lo,
        | MAX(s_acctbal) AS hi
        |FROM supplier GROUP BY 1 ORDER BY 1""".stripMargin,
    "sink_infer_csv" ->
      """SELECT c_custkey, c_name,
        | CAST(c_acctbal > 0 AS INT) AS is_positive,
        | CAST(c_acctbal AS DOUBLE) AS c_acctbal
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "sink_orc_roundtrip" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        |FROM supplier WHERE s_acctbal > 0
        |ORDER BY s_suppkey""".stripMargin,
    "sink_xml_roundtrip" ->
      """SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n_nations,
        | MAX(n_name) AS max_name
        |FROM nation GROUP BY 1 ORDER BY 1""".stripMargin,
    "sink_multi_format" ->
      // four format arms of the same table: 4x the rows per region,
      // the same distinct nation keys
      """SELECT n_regionkey, CAST(4 * COUNT(*) AS BIGINT) AS n_rows,
        | CAST(COUNT(DISTINCT n_nationkey) AS BIGINT) AS n_nations
        |FROM nation GROUP BY 1 ORDER BY 1""".stripMargin,
    "sink_zorder" ->
      """SELECT CAST(ts AS DATE) AS day,
        | CAST(COUNT(*) AS BIGINT) AS n_events,
        | CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_value,
        | CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // the versioned-table MERGE applies the same change batch, so the
    // same oracle checks the write -> publish -> read round trip
    "sink_versioned_merge" -> mergeCdcOracle,
    "sink_versioned_cdf" ->
      // v2 rebuilt from the deterministic change law, then the same
      // full-outer diff + classification
      """WITH snap AS (SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders),
        |changes AS (
        |  SELECT o_orderkey, 'U' AS op, 'R' AS c_status,
        |      o_totalprice + CAST(1000.0 AS DOUBLE) AS c_total
        |    FROM snap WHERE o_orderkey % 7 = 0 AND o_orderkey % 11 <> 0
        |  UNION ALL
        |  SELECT o_orderkey, 'D', CAST(NULL AS VARCHAR),
        |      CAST(NULL AS DOUBLE)
        |    FROM snap WHERE o_orderkey % 11 = 0
        |  UNION ALL
        |  SELECT -(o_orderkey + 1), 'I', 'N', CAST(50000.0 AS DOUBLE)
        |    FROM snap WHERE o_orderkey % 13 = 0),
        |merged AS (SELECT COALESCE(s.o_orderkey, c.o_orderkey)
        |      AS o_orderkey,
        |    COALESCE(c.c_status, s.o_orderstatus) AS o_orderstatus,
        |    COALESCE(c.c_total, s.o_totalprice) AS o_totalprice
        |  FROM snap s FULL OUTER JOIN changes c
        |    ON s.o_orderkey = c.o_orderkey
        |  WHERE c.op IS NULL OR c.op <> 'D')
        |SELECT COALESCE(s.o_orderkey, m.o_orderkey) AS o_orderkey,
        |  CASE WHEN s.o_orderkey IS NULL THEN 'insert'
        |       WHEN m.o_orderkey IS NULL THEN 'delete'
        |       ELSE 'update' END AS change_type,
        |  s.o_orderstatus AS old_status, m.o_orderstatus AS new_status,
        |  s.o_totalprice AS old_total, m.o_totalprice AS new_total
        |FROM snap s FULL OUTER JOIN merged m
        |  ON s.o_orderkey = m.o_orderkey
        |WHERE s.o_orderkey IS NULL OR m.o_orderkey IS NULL
        |   OR s.o_orderstatus <> m.o_orderstatus
        |   OR s.o_totalprice <> m.o_totalprice
        |ORDER BY o_orderkey""".stripMargin,
    "sink_versioned_delete" ->
      // the erasure batch removes keys ≡ 3 (mod 10); the post-delete
      // version must equal the surviving predicate over the raw table
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT (c_custkey % 10 = 3)
        |ORDER BY c_custkey""".stripMargin,
    "s4_rest_source" ->
      """WITH ids AS (SELECT unnest(generate_series(0, 3999)) AS id),
        |v AS (SELECT id, CAST(id // 250 AS INT) AS page,
        |        (id * 1103515245 + 12345) % 1000 AS v
        |      FROM ids)
        |SELECT page, CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(CAST(SUM(CAST(v / 10.0 AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS score_sum,
        | CAST(COUNT(CASE WHEN v % 5 = 0 THEN 1 END) AS BIGINT)
        |   AS n_inactive
        |FROM v GROUP BY 1 ORDER BY 1""".stripMargin,
    "s_file_skipping" ->
      // the manifest prune is a pure file-planning optimization — the
      // result must equal the raw slice, which is what DuckDB computes
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        | CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total_value
        |FROM events WHERE user_id BETWEEN 3 AND 7
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "s_partition_prune" ->
      // partition pruning is a planning optimization — the pruned
      // partitioned read must equal the raw daily slice
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        | CAST(COUNT(*) AS BIGINT) AS n_events,
        | CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total_value
        |FROM events
        |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-05' AND DATE '2024-01-11'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "s_hash_sample" ->
      """SELECT l_returnflag,
        | CAST(count(*) AS BIGINT) AS n_sampled,
        | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        |   AS sum_price
        |FROM lineitem
        |WHERE (l_orderkey * 2654435761 + l_linenumber * 40503) % 97 < 5
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "s_stratified_sample" ->
      """SELECT source, lang, doc_id, CAST(rk AS INT) AS rk
        |FROM (SELECT source, lang, doc_id,
        |  ROW_NUMBER() OVER (PARTITION BY source, lang
        |    ORDER BY (doc_id * 2654435761) % 97, doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 5 ORDER BY source, lang, rk""".stripMargin,
    "sink_csv_roundtrip" ->
      "SELECT * FROM nation ORDER BY n_nationkey",
    "sink_json_archive" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        | CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "sink_latest_snapshot" ->
      """SELECT '2024-01-01' AS snapshot_date,
        | CAST(COUNT(*) AS BIGINT) AS n_rows,
        | CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_keys
        |FROM orders""".stripMargin,
    "sink_ctas_promote" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_acctbal > 0 ORDER BY c_custkey""".stripMargin,
    "sink_upsert_by_date" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        | CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "sink_compact" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        | CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_keys
        |FROM orders""".stripMargin,
    "sink_time_travel" ->
      // each committed version is a pure filter of orders, so the
      // as-of read replays as the same filter over the base table
      """SELECT 1 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
        | CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        |   AS total_price
        |FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
        |UNION ALL
        |SELECT 2 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
        | CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        |   AS total_price
        |FROM orders
        |ORDER BY version""".stripMargin,
    "ss_gmb_roundtrip" ->
      """WITH m AS (
        |  SELECT user_id AS id,
        |    CASE event_type
        |      WHEN 'click' THEN 'CALL_CLICKS'
        |      WHEN 'view' THEN 'WEBSITE_CLICKS'
        |      WHEN 'purchase' THEN 'BUSINESS_CONVERSATIONS'
        |      WHEN 'signup' THEN 'BUSINESS_IMPRESSIONS_DESKTOP_MAPS'
        |      ELSE 'BUSINESS_DIRECTION_REQUESTS' END AS metric,
        |    CAST(floor(value) AS BIGINT) AS v
        |  FROM events),
        |p AS (
        |  SELECT id,
        |    CAST(coalesce(SUM(CASE WHEN metric = 'WEBSITE_CLICKS'
        |      THEN v END), 0) AS BIGINT) AS "WEBSITE_CLICKS",
        |    CAST(coalesce(SUM(CASE WHEN metric = 'CALL_CLICKS'
        |      THEN v END), 0) AS BIGINT) AS "CALL_CLICKS",
        |    CAST(coalesce(SUM(CASE WHEN metric =
        |      'BUSINESS_IMPRESSIONS_DESKTOP_MAPS' THEN v END), 0)
        |      AS BIGINT) AS "BUSINESS_IMPRESSIONS_DESKTOP_MAPS",
        |    CAST(coalesce(SUM(CASE WHEN metric =
        |      'BUSINESS_IMPRESSIONS_DESKTOP_SEARCH' THEN v END), 0)
        |      AS BIGINT) AS "BUSINESS_IMPRESSIONS_DESKTOP_SEARCH",
        |    CAST(coalesce(SUM(CASE WHEN metric =
        |      'BUSINESS_IMPRESSIONS_MOBILE_MAPS' THEN v END), 0)
        |      AS BIGINT) AS "BUSINESS_IMPRESSIONS_MOBILE_MAPS",
        |    CAST(coalesce(SUM(CASE WHEN metric =
        |      'BUSINESS_IMPRESSIONS_MOBILE_SEARCH' THEN v END), 0)
        |      AS BIGINT) AS "BUSINESS_IMPRESSIONS_MOBILE_SEARCH",
        |    CAST(coalesce(SUM(CASE WHEN metric = 'BUSINESS_CONVERSATIONS'
        |      THEN v END), 0) AS BIGINT) AS "BUSINESS_CONVERSATIONS",
        |    CAST(coalesce(SUM(CASE WHEN metric =
        |      'BUSINESS_DIRECTION_REQUESTS' THEN v END), 0) AS BIGINT)
        |      AS "BUSINESS_DIRECTION_REQUESTS"
        |  FROM m GROUP BY id)
        |SELECT id, "WEBSITE_CLICKS", "CALL_CLICKS",
        |  "BUSINESS_IMPRESSIONS_DESKTOP_MAPS",
        |  "BUSINESS_IMPRESSIONS_DESKTOP_SEARCH",
        |  "BUSINESS_IMPRESSIONS_MOBILE_MAPS",
        |  "BUSINESS_IMPRESSIONS_MOBILE_SEARCH",
        |  "BUSINESS_CONVERSATIONS", "BUSINESS_DIRECTION_REQUESTS",
        |  "CALL_CLICKS" + "WEBSITE_CLICKS" +
        |    "BUSINESS_DIRECTION_REQUESTS" AS total_actions,
        |  "BUSINESS_IMPRESSIONS_DESKTOP_MAPS" +
        |    "BUSINESS_IMPRESSIONS_MOBILE_MAPS" AS map_impressions,
        |  "BUSINESS_IMPRESSIONS_DESKTOP_SEARCH" +
        |    "BUSINESS_IMPRESSIONS_MOBILE_SEARCH" AS search_impressions,
        |  "BUSINESS_IMPRESSIONS_DESKTOP_MAPS" +
        |    "BUSINESS_IMPRESSIONS_MOBILE_MAPS" +
        |    "BUSINESS_IMPRESSIONS_DESKTOP_SEARCH" +
        |    "BUSINESS_IMPRESSIONS_MOBILE_SEARCH" AS total_impressions
        |FROM p ORDER BY id""".stripMargin,
    "ss_gmb_media" ->
      """SELECT o_custkey AS id,
        | CASE WHEN SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |   > 0 THEN 'Yes' ELSE 'No' END AS has_cover,
        | CASE WHEN SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
        |   > 0 THEN 'Yes' ELSE 'No' END AS has_menu,
        | CAST(COUNT(*) AS BIGINT) AS total_media_item_count
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "ss_gmb_vom" ->
      """SELECT c_custkey AS id,
        | CASE c_custkey % 8
        |   WHEN 0 THEN 'suspended'
        |   WHEN 1 THEN 'location_disabled'
        |   WHEN 2 THEN 'processing'
        |   WHEN 3 THEN 'verified'
        |   WHEN 4 THEN 'duplicate'
        |   WHEN 5 THEN 'verification_required'
        |   WHEN 6 THEN 'unexpected_status'
        |   ELSE 'verification_required' END AS profile_status
        |FROM customer ORDER BY 1""".stripMargin,
    "ss_gmb_location" ->
      """SELECT c_custkey AS id, c_name AS business_name,
        | CASE WHEN c_custkey % 11 = 0 THEN NULL
        |   WHEN c_custkey % 2 = 0
        |   THEN '+1-' || CAST(c_custkey AS VARCHAR)
        |   ELSE 'Not_Found' END AS phone,
        | CASE WHEN c_custkey % 11 = 0 THEN NULL
        |   WHEN c_custkey % 4 = 0
        |   THEN '+1-' || CAST(c_custkey AS VARCHAR) || '-a'
        |   ELSE 'Not_Found' END AS additional_phone,
        | CASE WHEN c_custkey % 11 = 0 THEN NULL
        |   WHEN c_custkey % 5 = 0
        |   THEN 'http://ex.com/' || CAST(c_custkey AS VARCHAR)
        |   ELSE 'Not_Found' END AS website,
        | CASE WHEN c_custkey % 11 = 0 THEN ', None 9'
        |   WHEN c_custkey % 3 = 2 THEN 'Not_Found' ELSE
        |   (CASE WHEN c_custkey % 3 = 0
        |      THEN c_mktsegment || ', ' || n_name ELSE '' END) ||
        |   (CASE WHEN c_custkey % 2 = 0 THEN ', ' || n_name ELSE '' END) ||
        |   ' ' || CAST(c_custkey % 100000 AS VARCHAR) END AS address,
        | CASE WHEN c_custkey % 11 = 0 THEN 'Not_Found'
        |   WHEN c_custkey % 7 = 0
        |   THEN 'SC' || CAST(c_custkey AS VARCHAR)
        |   ELSE 'Not_Found' END AS store_code,
        | CASE WHEN c_custkey % 11 = 0 THEN 'Not_Found'
        |   WHEN c_custkey % 4 = 2 THEN 'MONDAY=10-18'
        |   WHEN c_custkey % 4 = 3 THEN 'WEDNESDAY=8-16'
        |   ELSE 'Not_Found' END AS regular_hours,
        | CASE WHEN c_custkey % 11 = 0 THEN 'Not_Found'
        |   WHEN c_custkey % 2 = 0 THEN c_mktsegment
        |   ELSE 'Not_Found' END AS primary_category,
        | CAST(CASE WHEN c_custkey % 11 = 0 THEN 1
        |   WHEN c_custkey % 4 = 0 THEN 1 ELSE 0 END AS INT)
        |   AS additional_categories_count,
        | CASE WHEN c_custkey % 11 = 0 THEN 'Not_Found'
        |   WHEN c_custkey % 5 = 0
        |   THEN 'rev://' || CAST(c_custkey AS VARCHAR)
        |   ELSE 'Not_Found' END AS review_url,
        | 'Not_Found' AS map_url
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY 1""".stripMargin,
    "ss_gmb_localposts" ->
      """WITH agg AS (
        |  SELECT o_custkey AS id,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
        |      AS INT) AS offer_count,
        |    CAST(SUM(CASE WHEN o_orderstatus <> 'O' THEN 1 ELSE 0 END)
        |      AS INT) AS promo_count
        |  FROM orders GROUP BY 1),
        |best AS (
        |  SELECT id, o_orderdate FROM (
        |    SELECT o_custkey AS id, o_orderdate, o_orderkey,
        |      ROW_NUMBER() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate DESC, o_orderkey ASC) AS rn
        |    FROM orders WHERE o_orderstatus = 'O') WHERE rn = 1)
        |SELECT agg.id, offer_count, promo_count,
        |  CAST(best.o_orderdate AS DATE) AS offer_starts_at,
        |  CAST(best.o_orderdate + INTERVAL 7 DAY AS DATE) AS offer_ends_at,
        |  CAST(best.o_orderdate + INTERVAL 1 DAY AS DATE)
        |    AS offer_updates_at
        |FROM agg LEFT JOIN best ON agg.id = best.id
        |ORDER BY agg.id""".stripMargin,
    "f4_housekeeping" ->
      """SELECT 'live/' || n_name || '/2024-01-01_snap.csv' AS name,
        | 'live/' || n_name || '/2024-01-01_snap' AS renamed_to
        |FROM nation ORDER BY 1""".stripMargin,
    "ss_quarantine" ->
      """SELECT event_type,
        | CAST(SUM(CASE WHEN event_id % 7 <> 0 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_good,
        | CAST(SUM(CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_quarantined,
        | CAST(coalesce(SUM(CASE WHEN event_id % 7 <> 0
        |   THEN CAST(json_extract(props, '$.k') AS BIGINT) END), 0)
        |   AS BIGINT) AS k_sum_good
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "ss_gmb_reviews" ->
      """SELECT c_custkey AS id,
        | CASE WHEN c_custkey % 7 <> 0 AND c_custkey % 5 <> 0
        |   THEN round(CAST((c_custkey % 40) / 10.0 +
        |     (c_custkey % 3 + 1) / 100.0 AS DOUBLE), 1)
        |   ELSE NULL END AS average_rating,
        | CAST(CASE WHEN c_custkey % 7 <> 0 THEN c_custkey % 1000
        |   ELSE NULL END AS BIGINT) AS total_review_count
        |FROM customer ORDER BY 1""".stripMargin,
    "ss_gmb_services" ->
      """SELECT o_custkey AS id,
        | CAST(SUM(CASE WHEN o_orderstatus IN ('O', 'F')
        |   OR (o_orderstatus = 'P' AND o_orderkey % 2 = 0)
        |   THEN 1 ELSE 0 END) AS INT) AS service_count
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "sink_schema_evolution" ->
      """SELECT o_orderstatus,
        | CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(SUM(CASE WHEN year(o_orderdate) >= 1998 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_with_priority,
        | CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "ss_json_flatten" ->
      """SELECT l_returnflag AS flag,
        | CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        | CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "ss_props_extract" ->
      """SELECT event_type,
        | CAST(SUM(CAST(regexp_extract(props, '"k": *([0-9]+)', 1)
        |   AS BIGINT)) AS BIGINT) AS k_sum,
        | CAST(0 AS BIGINT) AS n_missing_present,
        | CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "ss_struct_traversal" ->
      """SELECT c_custkey, c_name AS name, c_mktsegment AS segment,
        | 'Not_Found' AS uri
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "ss_variant_path" ->
      // the variant round trip is the thing under test, so the oracle
      // replays straight from the flat columns; the absent path must
      // contribute nothing (n_missing_present = 0)
      """SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        |   AS total_balance,
        | CAST(0 AS BIGINT) AS n_missing_present,
        | CAST(MIN(c_custkey) AS BIGINT) AS min_id
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
