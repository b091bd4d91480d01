package graft.oracles

import graft.oracles.Gen._

/** DuckDB oracle SQL for the pipeline / scalar-suite / geo / multimodal queries —
  * one entry per SparkEntry.queries key in this family. Moved out
  * of SparkEntry mechanically (round-10 verdict ask #7); the text
  * of every entry is unchanged.
  */
private[graft] object CoreOracles {
  val sql: Map[String, String] = Map(
    "p_shard_rebalance" ->
      // independent argmax path: row_number over (h desc, s desc)
      """WITH ks AS (SELECT c_custkey AS k FROM customer),
        |ex AS (SELECT k, s,
        |    ((k * 2654435761 + s * 2246822519) % 1000000007
        |      * 48271) % 1000000007 AS h
        |  FROM ks, (SELECT unnest(range(17)) AS s)),
        |a16 AS (SELECT k, s AS hrw16 FROM (
        |  SELECT k, s, row_number() OVER (PARTITION BY k
        |    ORDER BY h DESC, s DESC) AS rn FROM ex WHERE s < 16)
        |  WHERE rn = 1),
        |a17 AS (SELECT k, s AS hrw17 FROM (
        |  SELECT k, s, row_number() OVER (PARTITION BY k
        |    ORDER BY h DESC, s DESC) AS rn FROM ex)
        |  WHERE rn = 1),
        |j AS (SELECT a16.k, hrw16, hrw17 FROM a16
        |  JOIN a17 ON a16.k = a17.k)
        |SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(CASE WHEN k % 16 <> k % 17 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS moved_mod,
        |  CAST(sum(CASE WHEN k % 16 <> k % 17 THEN 1 ELSE 0 END)
        |    * 1000000 // count(*) AS BIGINT) AS moved_mod_ppm,
        |  CAST(sum(CASE WHEN hrw16 <> hrw17 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS moved_hrw,
        |  CAST(sum(CASE WHEN hrw16 <> hrw17 THEN 1 ELSE 0 END)
        |    * 1000000 // count(*) AS BIGINT) AS moved_hrw_ppm
        |FROM j""".stripMargin,
    "p_retention_gc" ->
      """WITH v AS (SELECT o_custkey, o_orderkey,
        |    CAST(o_orderdate AS DATE) AS vdate,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY CAST(o_orderdate AS DATE) DESC,
        |        o_orderkey DESC) AS vrank,
        |    max(CAST(o_orderdate AS DATE)) OVER
        |      (PARTITION BY o_custkey) AS newest
        |  FROM orders),
        |f AS (SELECT o_custkey, vdate, vrank <= 2 AS by_count,
        |    vdate >= newest - 365 AS by_time FROM v)
        |SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_versions,
        |  CAST(sum(CASE WHEN by_count OR by_time THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_keep,
        |  CAST(sum(CASE WHEN NOT by_count AND NOT by_time
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_gc,
        |  CAST(sum(CASE WHEN by_time AND NOT by_count
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_by_time_only,
        |  min(CASE WHEN by_count OR by_time THEN vdate END)
        |    AS oldest_kept
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    "x_business_days" ->
      """WITH j AS (SELECT o_orderpriority,
        |    date_diff('day', DATE '1970-01-01',
        |      CAST(o_orderdate AS DATE)) AS ea,
        |    date_diff('day', DATE '1970-01-01',
        |      CAST(l_shipdate AS DATE)) AS eb
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |b AS (SELECT o_orderpriority,
        |    (5 * ((eb + 3) // 7) + least((eb + 3) % 7 + 1, 5))
        |      - (5 * ((ea + 3) // 7) + least((ea + 3) % 7 + 1, 5))
        |      AS bd
        |  FROM j)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CASE WHEN bd >= 0 AND bd <= 5 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_within_sla,
        |  CAST(sum(CASE WHEN bd >= 0 AND bd <= 5 THEN 1 ELSE 0 END)
        |    * 1000000 // count(*) AS BIGINT) AS sla_ppm,
        |  CAST(sum(bd) AS BIGINT) AS bd_sum,
        |  CAST(min(bd) AS BIGINT) AS bd_min,
        |  CAST(max(bd) AS BIGINT) AS bd_max
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "p_snapshot" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        | o_orderdate, o_orderpriority,
        | CAST(o_orderstatus = 'F' AS INT) AS is_fulfilled,
        | CAST(NULL AS VARCHAR) AS geolocation,
        | DATE '2024-01-01' AS snapshot_date
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_acctbal > 0 AND c_name IS NOT NULL)
        |ORDER BY o_orderkey""".stripMargin,
    "p_merge_cdc" -> mergeCdcOracle,
    "p_curriculum" ->
      // direct replay of the bucketed-rank stage cut: global
      // (n_chars, doc_id) rank, stage = (4·(rank−1)) // n, then the
      // per-stage rollup + ppm share — all integer laws
      """WITH r AS (SELECT doc_id, n_chars,
        |    len(string_split_regex(trim(lower(text)), '\s+')) AS n_tok,
        |    row_number() OVER (ORDER BY n_chars, doc_id) AS grn,
        |    count(*) OVER () AS n
        |  FROM documents),
        |s AS (SELECT (4 * (grn - 1)) // n AS stage, n_chars, n_tok
        |  FROM r),
        |g AS (SELECT stage, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(min(n_chars) AS BIGINT) AS min_chars,
        |    CAST(max(n_chars) AS BIGINT) AS max_chars,
        |    CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |  FROM s GROUP BY 1),
        |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot FROM g)
        |SELECT CAST(stage AS BIGINT) AS stage, n_docs, min_chars,
        |  max_chars, n_tokens,
        |  CAST(1000000 * n_tokens // tot AS BIGINT) AS token_share_ppm
        |FROM g, t ORDER BY stage""".stripMargin,
    // direct aggregation over the SURVIVING rows — the incremental
    // merge must equal it exactly (additive count + decimal sum)
    "p_incremental_agg" ->
      """SELECT o_custkey,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        |    AS spend
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1999-01-01'
        |   OR o_orderkey % 10 <> 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "p_preference_pairs" ->
      // text_quality's exact score formula, argmax/argmin replayed as
      // rank windows with the same (score, doc_id) tie-breaks
      """WITH scored AS (SELECT doc_id, source,
        |    round(0.5 * (nd / nw) + 0.5 * least(nw / 100.0, 1.0), 4)
        |      AS score
        |  FROM (SELECT doc_id, source,
        |    CAST(len(string_split_regex(trim(lower(text)), '\s+'))
        |      AS DOUBLE) AS nw,
        |    CAST(len(list_distinct(string_split_regex(trim(lower(text)),
        |      '\s+'))) AS DOUBLE) AS nd
        |   FROM documents)),
        |hi AS (SELECT source, doc_id AS chosen_doc, score AS s_hi FROM (
        |  SELECT source, doc_id, score, row_number() OVER (
        |    PARTITION BY source ORDER BY score DESC, doc_id ASC) AS rn
        |  FROM scored) WHERE rn = 1),
        |lo AS (SELECT source, doc_id AS rejected_doc, score AS s_lo FROM (
        |  SELECT source, doc_id, score, row_number() OVER (
        |    PARTITION BY source ORDER BY score ASC, doc_id ASC) AS rn
        |  FROM scored) WHERE rn = 1)
        |SELECT hi.source, chosen_doc, rejected_doc,
        |  round(s_hi - s_lo, 4) AS score_gap
        |FROM hi JOIN lo ON hi.source = lo.source
        |WHERE s_hi > s_lo ORDER BY hi.source""".stripMargin,
    "p_contrastive_batches" ->
      """SELECT CAST(row_number() OVER (PARTITION BY source
        |    ORDER BY doc_id) - 1 AS BIGINT) AS batch_id,
        |  doc_id, source
        |FROM documents ORDER BY batch_id, source""".stripMargin,
    "p_surrogate_keys" ->
      // the proxy is bucketing-only: the contract is the plain
      // alphabetical dense rank
      """WITH names AS (SELECT DISTINCT p_name AS name FROM part)
        |SELECT name,
        |  CAST(ROW_NUMBER() OVER (ORDER BY name) AS BIGINT)
        |    AS surrogate_key,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM names) AS n_names
        |FROM names ORDER BY name""".stripMargin,
    "p_backfill_plan" ->
      // same derived manifest (every 7th epoch-day a hole, every 5th
      // a 90% partial load), same full-outer classification, same
      // newest-first rank and 30-day batch cap
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n_source,
        |    CAST(SUM(CASE WHEN event_id % 10 <> 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_partial,
        |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS epoch
        |  FROM events GROUP BY 1, 4),
        |man AS (SELECT day,
        |    CASE WHEN epoch % 5 = 0 THEN n_partial ELSE n_source END
        |      AS n_manifest
        |  FROM daily WHERE epoch % 7 <> 3),
        |j AS (SELECT COALESCE(s.day, m.day) AS day, s.n_source,
        |    m.n_manifest,
        |    CASE WHEN s.day IS NULL THEN 'orphan'
        |         WHEN m.day IS NULL THEN 'missing'
        |         WHEN m.n_manifest <> s.n_source THEN 'stale'
        |    END AS status
        |  FROM daily s FULL OUTER JOIN man m ON s.day = m.day),
        |work AS (SELECT day, n_source, n_manifest, status,
        |    CAST(ROW_NUMBER() OVER (ORDER BY day DESC) AS BIGINT)
        |      AS backfill_rank
        |  FROM j WHERE status IS NOT NULL)
        |SELECT day, n_source, n_manifest, status, backfill_rank,
        |  backfill_rank <= 30 AS in_batch
        |FROM work ORDER BY day DESC""".stripMargin,
    "p_quota_fill" ->
      // two rank windows under the same (n_chars desc, doc_id) total
      // order; the fill quota derives from the actual floor count
      """WITH ranked AS (SELECT doc_id, lang, n_chars,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY n_chars DESC, doc_id) AS lr
        |  FROM documents),
        |fl AS (SELECT doc_id, lang, n_chars FROM ranked WHERE lr <= 5),
        |nf AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_floor FROM fl),
        |rest AS (SELECT doc_id, lang, n_chars,
        |    row_number() OVER (ORDER BY n_chars DESC, doc_id) AS grn
        |  FROM ranked WHERE lr > 5)
        |SELECT doc_id, lang, n_chars, 'floor' AS reason FROM fl
        |UNION ALL SELECT doc_id, lang, n_chars, 'fill'
        |FROM rest, nf WHERE grn <= 100 - n_floor
        |ORDER BY doc_id""".stripMargin,
    "p_golden_record" ->
      // same fuzzy-name closure as p_entity_resolution, then every
      // survivorship rule replayed: mode brand (count desc, brand asc),
      // max price, min size
      """WITH RECURSIVE names AS (SELECT DISTINCT p_name AS name FROM part),
        |b AS (SELECT name, list_extract(string_split(name, ' '),
        |    len(string_split(name, ' '))) AS block FROM names),
        |pairs AS (SELECT a.name AS na, bb.name AS nb
        |  FROM b a JOIN b bb ON a.block = bb.block AND a.name < bb.name
        |  WHERE levenshtein(a.name, bb.name) <= 2),
        |edges AS (SELECT na AS src, nb AS dst FROM pairs
        |  UNION ALL SELECT nb, na FROM pairs),
        |reach(src, dst) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |lab AS (SELECT src AS name, MIN(dst) AS canonical_name
        |  FROM reach GROUP BY 1),
        |mem AS (SELECT COALESCE(l.canonical_name, p.p_name)
        |      AS canonical_name,
        |    p.p_brand, p.p_size,
        |    CAST(round(p.p_retailprice * 100) AS BIGINT) AS price_cents
        |  FROM part p LEFT JOIN lab l ON p.p_name = l.name),
        |bm AS (SELECT canonical_name, p_brand,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM mem GROUP BY 1, 2),
        |bmx AS (SELECT canonical_name, p_brand AS mode_brand,
        |    cnt AS brand_n FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY canonical_name
        |        ORDER BY cnt DESC, p_brand) AS rk FROM bm)
        |  WHERE rk = 1),
        |g AS (SELECT canonical_name, CAST(COUNT(*) AS BIGINT) AS n_members,
        |    MAX(price_cents) AS max_price_cents, MIN(p_size) AS min_size
        |  FROM mem GROUP BY 1)
        |SELECT g.canonical_name, g.n_members, g.max_price_cents,
        |  g.min_size, x.mode_brand, x.brand_n
        |FROM g JOIN bmx x USING (canonical_name)
        |ORDER BY g.canonical_name""".stripMargin,
    // Fellegi–Sunter linkage replay: identical blocked pair base,
    // 2³ pattern counts, chained EM CTEs (micro-rounded posteriors,
    // integer M-step numerators) — parameters and weights bit-match
    "p_linkage_fs" -> linkageOracle(2),
    "p_entity_resolution" ->
      """WITH RECURSIVE names AS (SELECT DISTINCT p_name AS name FROM part),
        |b AS (SELECT name, list_extract(string_split(name, ' '),
        |    len(string_split(name, ' '))) AS block FROM names),
        |pairs AS (SELECT a.name AS na, bb.name AS nb
        |  FROM b a JOIN b bb ON a.block = bb.block AND a.name < bb.name
        |  WHERE levenshtein(a.name, bb.name) <= 2),
        |edges AS (SELECT na AS src, nb AS dst FROM pairs
        |  UNION ALL SELECT nb, na FROM pairs),
        |reach(src, dst) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |lab AS (SELECT src AS name, MIN(dst) AS canonical_name
        |  FROM reach GROUP BY 1),
        |resolved AS (SELECT n.name,
        |    COALESCE(l.canonical_name, n.name) AS canonical_name
        |  FROM names n LEFT JOIN lab l ON n.name = l.name),
        |cs AS (SELECT canonical_name, CAST(COUNT(*) AS BIGINT)
        |    AS cluster_size
        |  FROM resolved GROUP BY 1)
        |SELECT r.name, r.canonical_name, cs.cluster_size
        |FROM resolved r JOIN cs USING (canonical_name)
        |ORDER BY r.name""".stripMargin,
    "p_pit_lookup" ->
      // the scd2 interval table rebuilt, then the covering version by
      // ASOF join (round-12: the equi+interval-residual left-join
      // form exceeded 1500 s in DuckDB at sf1.0 — the planner ran the
      // interval residual as a per-cust nested loop; ASOF is the
      // merge-based equivalent, 55x faster at sf0.01 and seconds at
      // sf1.0). Equivalence: non-empty scd2 intervals tile
      // [min valid_from, inf) contiguously per cust, so the covering
      // version IS the greatest valid_from <= shipdate; empty
      // intervals (tied valid_from, where lead() returns the same
      // date) are dropped first, which also makes (cust_id,
      // valid_from) unique — ASOF's pick is then deterministic
      """WITH scd AS (SELECT o_custkey AS cust_id,
        |    o_orderpriority AS attr, o_orderdate AS valid_from,
        |    lead(o_orderdate) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS valid_to
        |  FROM orders),
        |nz AS (SELECT * FROM scd
        |  WHERE valid_to IS NULL OR valid_from < valid_to),
        |pr AS (SELECT l.l_orderkey, l.l_linenumber,
        |    o.o_custkey AS cust_id, l.l_shipdate
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
        |SELECT pr.l_orderkey, pr.l_linenumber, pr.cust_id, pr.l_shipdate,
        |  COALESCE(nz.attr, 'Not_Found') AS attr_at_ship
        |FROM pr ASOF LEFT JOIN nz ON pr.cust_id = nz.cust_id
        |  AND nz.valid_from <= pr.l_shipdate
        |ORDER BY l_orderkey, l_linenumber, l_shipdate""".stripMargin,
    "p_scd2" ->
      """SELECT cust_id, version_key, attr, valid_from, valid_to,
        | CAST(valid_to IS NULL AS INT) AS is_current
        |FROM (SELECT o_custkey AS cust_id, o_orderkey AS version_key,
        |        o_orderpriority AS attr, o_orderdate AS valid_from,
        |        LEAD(o_orderdate) OVER (PARTITION BY o_custkey
        |          ORDER BY o_orderdate, o_orderkey) AS valid_to
        |      FROM orders)
        |ORDER BY cust_id, valid_from, version_key""".stripMargin,
    "p_scd2_merge" ->
      // the FULL rebuild — equality proves the incremental path
      """SELECT cust_id, version_key, attr, valid_from, valid_to,
        | CAST(valid_to IS NULL AS INT) AS is_current
        |FROM (SELECT o_custkey AS cust_id, o_orderkey AS version_key,
        |        o_orderpriority AS attr, o_orderdate AS valid_from,
        |        LEAD(o_orderdate) OVER (PARTITION BY o_custkey
        |          ORDER BY o_orderdate, o_orderkey) AS valid_to
        |      FROM orders)
        |ORDER BY cust_id, valid_from, version_key""".stripMargin,
    "p_corpus_clean" ->
      """WITH scored AS (
        |  SELECT doc_id, text,
        |    CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS INT)
        |      AS n_words,
        |    CAST(len(list_distinct(string_split_regex(trim(lower(text)),
        |      '\s+'))) AS INT) AS n_distinct_words,
        |    CAST(len(regexp_extract_all(text, '\b(the|a|of)\b')) AS INT)
        |      AS s_en,
        |    CAST(len(regexp_extract_all(text, '\b(data|query|row)\b'))
        |      AS INT) AS s_zh,
        |    CAST(len(regexp_extract_all(text, '\b(fast|slow|small)\b'))
        |      AS INT) AS s_de
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, text, n_words,
        |    round(0.5 * (n_distinct_words / n_words) +
        |      0.5 * least(n_words / 100.0, 1.0), 4) AS quality_score
        |  FROM scored
        |  WHERE (CASE WHEN s_en >= s_zh AND s_en >= s_de THEN 'en'
        |              WHEN s_zh >= s_de THEN 'zh' ELSE 'de' END) = 'en'
        |    AND round(0.5 * (n_distinct_words / n_words) +
        |      0.5 * least(n_words / 100.0, 1.0), 4) >= 0.5),
        |keepers AS (SELECT min(doc_id) AS doc_id FROM f GROUP BY text),
        |ek AS (SELECT f.* FROM f JOIN keepers USING (doc_id)),
        |toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS w,
        |    unnest(generate_series(1,
        |      len(string_split_regex(trim(lower(text)), '\s+')))) AS i
        |  FROM ek),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    w || ' ' || lead(w,1) OVER win || ' ' || lead(w,2) OVER win AS s
        |  FROM toks WINDOW win AS (PARTITION BY doc_id ORDER BY i)
        |  QUALIFY lead(w,2) OVER win IS NOT NULL),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |drops AS (
        |  SELECT DISTINCT b_id FROM (
        |    SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_inter
        |    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |    GROUP BY 1, 2) pr
        |  JOIN sz na ON na.doc_id = a_id
        |  JOIN sz nb ON nb.doc_id = b_id
        |  WHERE n_inter / (na.n + nb.n - n_inter) >= 0.8)
        |SELECT doc_id, n_words, quality_score
        |FROM ek WHERE doc_id NOT IN (SELECT b_id FROM drops)
        |ORDER BY doc_id""".stripMargin,
    "p_insight_gold" ->
      """WITH oa AS (
        |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |    CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        |      AS total_spend,
        |    MAX(o_orderstatus) AS max_status
        |  FROM orders GROUP BY 1),
        |lastord AS (
        |  SELECT o_custkey, o_orderdate AS last_orderdate,
        |    o_orderkey AS last_orderkey
        |  FROM (SELECT o_custkey, o_orderdate, o_orderkey,
        |          ROW_NUMBER() OVER (PARTITION BY o_custkey
        |            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |        FROM orders) WHERE rn = 1),
        |ia AS (
        |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_lineitems,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        |      AS total_qty
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1),
        |ea AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
        |      AS BIGINT) AS n_purchases
        |  FROM events GROUP BY 1)
        |SELECT c_custkey, c_name, c_mktsegment, n_name AS nation,
        | r_name AS region,
        | COALESCE(n_orders, 0) AS n_orders,
        | COALESCE(total_spend, 0.0) AS total_spend,
        | last_orderdate,
        | COALESCE(last_orderkey, -1) AS last_orderkey,
        | COALESCE(max_status, 'Not_Found') AS last_status,
        | COALESCE(n_lineitems, 0) AS n_lineitems,
        | COALESCE(total_qty, 0.0) AS total_qty,
        | COALESCE(ea.n_events, 0) AS n_events,
        | COALESCE(ea.n_purchases, 0) AS n_purchases,
        | CASE WHEN COALESCE(ea.n_purchases, 0) > 0 THEN 'Yes' ELSE 'No' END
        |   AS has_purchase,
        | COALESCE(total_spend, 0.0) /
        |   greatest(COALESCE(n_orders, 0), 1) AS avg_order_value,
        | CASE WHEN c_acctbal <= 0 THEN 'suspended'
        |      WHEN COALESCE(n_orders, 0) = 0 THEN 'inactive'
        |      WHEN COALESCE(ea.n_purchases, 0) > 0 THEN 'engaged'
        |      ELSE 'active' END AS profile_status,
        | DATE '2024-01-01' AS data_date
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |LEFT JOIN oa ON oa.o_custkey = c_custkey
        |LEFT JOIN lastord ON lastord.o_custkey = c_custkey
        |LEFT JOIN ia ON ia.o_custkey = c_custkey
        |LEFT JOIN ea ON ea.user_id = c_custkey
        |ORDER BY c_custkey""".stripMargin,
    "x_string_suite" ->
      """SELECT c_custkey, trim(c_name) AS tname,
        | concat_ws(', ', c_name, c_mktsegment) AS name_seg,
        | regexp_replace(c_name, '#[0-9]+$', '') AS name_prefix,
        | string_split(c_name, '#')[1] AS name_part,
        | upper(c_mktsegment) AS seg_upper,
        | substr(c_name, 1, 8) AS name_head,
        | CASE WHEN c_acctbal > 5000 THEN 'high'
        |      WHEN c_acctbal > 0 THEN 'mid' ELSE 'low' END AS bal_band,
        | CAST(c_acctbal > 0 AS INT) AS is_positive
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "x_date_suite" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od,
        | CAST(o_orderdate AS DATE) - 7 AS week_before,
        | strftime(o_orderdate, '%Y-%m-%d') AS od_str,
        | make_date(CAST(year(o_orderdate) AS INT),
        |   CAST(month(o_orderdate) AS INT),
        |   CAST(day(o_orderdate) AS INT)) AS od_rebuilt,
        | CAST(year(o_orderdate) AS INT) AS o_year,
        | CAST(month(o_orderdate) AS INT) AS o_month,
        | CAST(day(o_orderdate) AS INT) AS o_day,
        | CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')
        |   AS INT) AS days_to_2002
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "x11_ts_roundtrip" ->
      """SELECT event_id,
        | strftime(ts, '%Y-%m-%dT%H:%M:%S.%fZ') AS iso,
        | strptime(strftime(ts, '%Y-%m-%dT%H:%M:%S.%fZ'),
        |   '%Y-%m-%dT%H:%M:%S.%fZ') AS parsed
        |FROM events ORDER BY event_id""".stripMargin,
    "x18_kv_parse" ->
      """SELECT event_id, event_type AS evt, CAST(user_id AS BIGINT) AS uid
        |FROM events ORDER BY event_id""".stripMargin,
    "x8_status_case" ->
      """SELECT o_orderkey,
        | CASE WHEN o_orderstatus = 'F' THEN 'fulfilled'
        |      WHEN o_orderpriority LIKE '1%' THEN 'urgent_open'
        |      WHEN o_totalprice > 300000 THEN 'big_open'
        |      WHEN o_orderstatus = 'P' THEN 'processing'
        |      ELSE 'open' END AS status_class
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "x4_address" ->
      """SELECT c_custkey,
        | CASE WHEN length(concat_ws(', ', c_name, n_name, r_name)) = 0
        |      THEN 'Not_Found'
        |      ELSE concat_ws(', ', c_name, n_name, r_name) END AS address
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |ORDER BY c_custkey""".stripMargin,
    "x7_map_construct" ->
      """WITH pc AS (SELECT user_id, event_type,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id,
        | string_agg(event_type || '=' || CAST(cnt AS VARCHAR), ','
        |   ORDER BY event_type) AS type_counts
        |FROM pc GROUP BY user_id ORDER BY user_id""".stripMargin,
    "x_hof_suite" ->
      """WITH per AS (
        |  SELECT l_orderkey,
        |    array_agg(l_quantity ORDER BY l_linenumber, l_quantity)
        |      AS qtys
        |  FROM lineitem GROUP BY 1)
        |SELECT l_orderkey,
        |  CAST(len(qtys) AS BIGINT) AS n_lines,
        |  list_sum(list_transform(qtys, x -> x * 2)) AS doubled_sum,
        |  CAST(len(list_filter(qtys, x -> x >= 25)) AS BIGINT)
        |    AS n_heavy,
        |  CAST(list_contains(qtys, 50.0) AS INT) AS has_max,
        |  list_sum(list_transform(
        |      range(1, CAST(len(qtys) AS BIGINT) + 1),
        |      i -> qtys[i] * i)) AS pos_weighted
        |FROM per ORDER BY l_orderkey""".stripMargin,
    "p_erasure_plan" ->
      """WITH subj AS (SELECT c_custkey AS s FROM customer
        |  WHERE c_custkey % 97 = 0)
        |SELECT 'customer' AS table_name,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_keys
        |FROM customer JOIN subj ON c_custkey = s
        |UNION ALL
        |SELECT 'events', CAST(count(*) AS BIGINT),
        |  CAST(count(DISTINCT user_id) AS BIGINT)
        |FROM events JOIN subj ON user_id = s
        |UNION ALL
        |SELECT 'lineitem_via_orders', CAST(count(*) AS BIGINT),
        |  CAST(count(DISTINCT o_custkey) AS BIGINT)
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN subj ON o_custkey = s
        |UNION ALL
        |SELECT 'orders', CAST(count(*) AS BIGINT),
        |  CAST(count(DISTINCT o_custkey) AS BIGINT)
        |FROM orders JOIN subj ON o_custkey = s
        |ORDER BY table_name""".stripMargin,
    "p_pps_alloc" ->
      """WITH st AS (SELECT event_type,
        |    CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |      AS weight
        |  FROM events GROUP BY 1),
        |t AS (SELECT *, (SELECT sum(weight) FROM st) AS total_w
        |  FROM st),
        |b AS (SELECT event_type, n_rows, weight,
        |    1000 * weight // total_w AS base_seats,
        |    1000 * weight % total_w AS rem FROM t),
        |e AS (SELECT *, row_number() OVER
        |    (ORDER BY rem DESC, event_type) AS rk,
        |    (SELECT 1000 - sum(base_seats) FROM b) AS extra_n FROM b)
        |SELECT event_type, n_rows, weight,
        |  CAST(base_seats AS BIGINT) AS base_seats,
        |  CAST(CASE WHEN rk <= extra_n THEN 1 ELSE 0 END AS BIGINT)
        |    AS extra,
        |  CAST(base_seats + CASE WHEN rk <= extra_n THEN 1 ELSE 0 END
        |    AS BIGINT) AS seats
        |FROM e ORDER BY event_type""".stripMargin,
    "geo_cell_join" ->
      // independent path: the O(n²) brute-force distance scan the
      // grid cells exist to avoid — hash equality proves zero
      // recall loss from the blocking
      """WITH p AS (SELECT c_custkey AS id,
        |    (c_custkey * 2654435761) % 1000000 AS lat,
        |    (c_custkey // 150) * 1000000
        |      + (c_custkey * 2246822519) % 1000000 AS lon
        |  FROM customer)
        |SELECT a.id AS a_id, b.id AS b_id,
        |  (a.lat - b.lat) * (a.lat - b.lat)
        |    + (a.lon - b.lon) * (a.lon - b.lon) AS dist2
        |FROM p a JOIN p b ON a.id < b.id
        |WHERE (a.lat - b.lat) * (a.lat - b.lat)
        |    + (a.lon - b.lon) * (a.lon - b.lon) <= 400000000
        |ORDER BY a_id, b_id""".stripMargin,
    "p_split_leakage_safe" -> leakageSplitOracle,
    "p_diverse_subset" ->
      s"""WITH km AS ($kmeansOracle),
        |q AS (SELECT doc_id, source,
        |    round(0.5 * (n_distinct_words / n_words) +
        |      0.5 * least(n_words / 100.0, 1.0), 4) AS quality_score
        |  FROM (SELECT doc_id, source,
        |    CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS INT)
        |      AS n_words,
        |    CAST(len(list_distinct(string_split_regex(trim(lower(text)),
        |      '\\s+'))) AS INT) AS n_distinct_words
        |  FROM documents))
        |SELECT cluster, CAST(rank AS INT) AS rank, doc_id, source,
        |  quality_score
        |FROM (SELECT km.cluster, q.doc_id, q.source, q.quality_score,
        |        ROW_NUMBER() OVER (PARTITION BY km.cluster
        |          ORDER BY q.quality_score DESC, q.doc_id) AS rank
        |      FROM q JOIN km ON q.doc_id = km.vec_id)
        |WHERE rank <= 3
        |ORDER BY cluster, rank""".stripMargin,
    "mm_decode_meta" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        | CAST(octet_length(encode(text)) % 640 AS INT) AS width,
        | CAST(doc_id % 480 AS INT) AS height,
        | CASE CAST(octet_length(encode(text)) % 3 AS INT)
        |   WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format,
        | hex(encode(substr(text, 1, 8))) AS head_hex,
        | CAST(octet_length(encode(text)) // 16 AS INT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_resize" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) % 640 AS INT) AS width,
        | CAST(doc_id % 480 AS INT) AS height,
        | CAST((octet_length(encode(text)) % 640) // 2 AS INT) AS out_width,
        | CAST((doc_id % 480) // 2 AS INT) AS out_height,
        | CAST((octet_length(encode(text)) + 3) // 4 AS INT)
        |   AS n_sample_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_shard_plan" ->
      // same prefix-sum div assignment (bytes BEFORE the item over
      // the per-source doc order), same shard-grain rollup
      """WITH sz AS (SELECT source, doc_id,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM documents),
        |pre AS (SELECT source, doc_id, n_bytes,
        |    SUM(n_bytes) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - n_bytes AS before
        |  FROM sz)
        |SELECT source, CAST(before // 32768 AS BIGINT) AS shard_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_bytes) AS BIGINT) AS shard_bytes,
        |  CAST(MIN(doc_id) AS BIGINT) AS doc_lo,
        |  CAST(MAX(doc_id) AS BIGINT) AS doc_hi
        |FROM pre GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "p_epoch_shuffle" ->
      // same manifest derivation, same dense index g (shard_id, sk
      // order), same multiplicative permutation law, rank replayed
      // per epoch (h, then source:shard tie-break)
      """WITH sz AS (SELECT source, doc_id,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM documents),
        |pre AS (SELECT source, doc_id, n_bytes,
        |    SUM(n_bytes) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - n_bytes AS before
        |  FROM sz),
        |man AS (SELECT DISTINCT source,
        |    CAST(before // 32768 AS BIGINT) AS shard_id,
        |    source || ':' || CAST(before // 32768 AS BIGINT) AS sk
        |  FROM pre),
        |gi AS (SELECT source, shard_id, sk,
        |    CAST(ROW_NUMBER() OVER (ORDER BY shard_id, sk) AS BIGINT)
        |      AS g
        |  FROM man),
        |e(epoch) AS (VALUES (1), (2), (3)),
        |k AS (SELECT epoch, source, shard_id, sk,
        |    ((g * 3 + epoch) * 2654435761) % 1000000007 AS h
        |  FROM gi CROSS JOIN e)
        |SELECT epoch, source, shard_id, CAST(h AS BIGINT) AS h,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY epoch
        |    ORDER BY h, sk) AS BIGINT) AS position
        |FROM k ORDER BY epoch, position""".stripMargin,
    "mm_payload_neardup" ->
      // candidates: the quantized byte-histogram rank hash replayed
      // bit-for-bit (same LCG index pairs, 1-based lists, BIGINT bit
      // sums); verify: 3-gram Jaccard restricted to the candidates
      """WITH cc AS (
        |  SELECT doc_id,
        |    list_transform(range(26), i -> (length(text) -
        |      length(replace(text, chr(CAST(97 + i AS INT)), ''))) // 8)
        |      AS cs
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    CAST(list_sum(list_transform(range(60), k ->
        |      CASE WHEN cs[CAST(1 + ((k+1) * 2654435761) % 26 AS INT)] >
        |                cs[CAST(1 + (((k+1) * 2654435761) // 26 + k) % 26
        |                  AS INT)]
        |      THEN 1::BIGINT << CAST(k AS INT) ELSE 0 END))
        |      AS BIGINT) AS fingerprint
        |  FROM cc),
        |cand AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.fingerprint
        |  FROM h a JOIN h b
        |    ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id),
        |toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS w,
        |    unnest(generate_series(1,
        |      len(string_split_regex(trim(lower(text)), '\s+')))) AS i
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    w || ' ' || lead(w,1) OVER win || ' ' || lead(w,2) OVER win AS s
        |  FROM toks WINDOW win AS (PARTITION BY doc_id ORDER BY i)
        |  QUALIFY lead(w,2) OVER win IS NOT NULL),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |iv AS (
        |  SELECT doc_a, doc_b, count(*) AS n_inter
        |  FROM cand JOIN sh a ON a.doc_id = doc_a
        |  JOIN sh b ON b.doc_id = doc_b AND a.s = b.s
        |  GROUP BY 1, 2)
        |SELECT c.doc_a, c.doc_b, c.fingerprint,
        |  iv.n_inter / (na.n + nb.n - iv.n_inter) AS jaccard
        |FROM cand c
        |JOIN iv ON iv.doc_a = c.doc_a AND iv.doc_b = c.doc_b
        |JOIN sz na ON na.doc_id = c.doc_a
        |JOIN sz nb ON nb.doc_id = c.doc_b
        |WHERE iv.n_inter / (na.n + nb.n - iv.n_inter) >= 0.5
        |ORDER BY c.doc_a, c.doc_b""".stripMargin,
    "mm_frame_sample" ->
      """SELECT doc_id, CAST(f AS INT) AS frame_no,
        | CAST(f * 16 AS INT) AS byte_offset,
        | hex(encode(substr(text, f * 16 + 1, 1))) AS frame_byte_hex
        |FROM documents, (SELECT unnest(generate_series(0, 3)) AS f)
        |WHERE f < octet_length(encode(text)) // 16
        |ORDER BY doc_id, frame_no""".stripMargin,
    // documents.text is ASCII (octet_length == length over the corpus),
    // so ascii(substr(...)) is exact per-byte extraction; the LEFT JOIN
    // keeps a zero row for zero-length payloads (featureExtract's
    // max(len, 1) divisor emits mean_byte = 0.0 for them)
    "mm_features" ->
      """WITH e AS (
        |  SELECT doc_id, text,
        |         unnest(generate_series(1, length(text))) AS i
        |  FROM documents
        |), b AS (
        |  SELECT doc_id, ascii(substr(text, CAST(i AS INT), 1)) AS bv
        |  FROM e
        |), g AS (
        |  SELECT doc_id,
        |   CAST(sum(CASE WHEN bv < 64 THEN 1 ELSE 0 END) AS BIGINT)
        |     AS hist0,
        |   CAST(sum(CASE WHEN bv >= 64 AND bv < 128 THEN 1 ELSE 0 END)
        |     AS BIGINT) AS hist1,
        |   CAST(sum(CASE WHEN bv >= 128 AND bv < 192 THEN 1 ELSE 0 END)
        |     AS BIGINT) AS hist2,
        |   CAST(sum(CASE WHEN bv >= 192 THEN 1 ELSE 0 END) AS BIGINT)
        |     AS hist3,
        |   CAST(sum(bv) AS DOUBLE) / count(*) AS mean_byte
        |  FROM b GROUP BY doc_id
        |)
        |SELECT d.doc_id,
        | coalesce(hist0, 0) AS hist0, coalesce(hist1, 0) AS hist1,
        | coalesce(hist2, 0) AS hist2, coalesce(hist3, 0) AS hist3,
        | coalesce(mean_byte, 0.0) AS mean_byte
        |FROM documents d LEFT JOIN g ON d.doc_id = g.doc_id
        |ORDER BY d.doc_id""".stripMargin,
  )
}
