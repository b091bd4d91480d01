package graft.oracles

import graft.oracles.Gen._

/** DuckDB oracle SQL for the aggregate-family queries —
  * one entry per SparkEntry.queries key in this family. Moved out
  * of SparkEntry mechanically (round-10 verdict ask #7); the text
  * of every entry is unchanged.
  */
private[graft] object AggOracles {
  val sql: Map[String, String] = Map(
    "agg_funnel_windowed" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS t
        |  FROM events),
        |s AS (SELECT user_id, min(t) AS signup_t FROM ev
        |  WHERE event_type = 'signup' GROUP BY 1),
        |c AS (SELECT s.user_id, min(e.t) AS click_t FROM s
        |  JOIN ev e ON e.user_id = s.user_id
        |    AND e.event_type = 'click' AND e.t >= s.signup_t
        |    AND e.t < s.signup_t + 604800000000 GROUP BY 1),
        |p AS (SELECT c.user_id, min(e.t) AS purchase_t FROM c
        |  JOIN ev e ON e.user_id = c.user_id
        |    AND e.event_type = 'purchase' AND e.t >= c.click_t
        |    AND e.t < c.click_t + 604800000000 GROUP BY 1)
        |SELECT n_signup, n_click_7d, n_purchase_7d,
        |  n_click_7d * 1000000 // n_signup AS conv1_ppm,
        |  n_purchase_7d * 1000000 // n_click_7d AS conv2_ppm
        |FROM (SELECT CAST(count(*) AS BIGINT) AS n_signup FROM s),
        |  (SELECT CAST(count(*) AS BIGINT) AS n_click_7d FROM c),
        |  (SELECT CAST(count(*) AS BIGINT) AS n_purchase_7d FROM p)
        |""".stripMargin,
    "a1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        |   AS sum_base_price,
        | CAST(CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount), 6)
        |   AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
        | CAST(CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount)
        |   * (1 + l_tax), 6) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_charge,
        | CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / COUNT(*)
        |   AS avg_qty,
        | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        |   / COUNT(*) AS avg_price,
        | CAST(COUNT(*) AS BIGINT) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "a1_explode_sum" ->
      """SELECT event_type AS metric,
        | CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS metric_sum,
        | CAST(COUNT(*) AS BIGINT) AS n_points
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "a2_pivot_daily" ->
      """SELECT CAST(ts AS DATE) AS day,
        | CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT)
        |   AS click,
        | CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT)
        |   AS error,
        | CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
        |   AS purchase,
        | CAST(COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT)
        |   AS signup,
        | CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT)
        |   AS view,
        | CAST(COUNT(CASE WHEN event_type IN
        |   ('click','error','purchase','signup','view') THEN 1 END)
        |   AS BIGINT) AS total_events,
        | CAST(COUNT(CASE WHEN event_type IN ('click','purchase') THEN 1 END)
        |   AS BIGINT) AS total_engagement
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "a3_count_if" ->
      """SELECT user_id,
        | CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT)
        |   AS n_click,
        | CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT)
        |   AS n_error,
        | CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "a4_argmax" ->
      """SELECT o_custkey, o_orderdate AS last_orderdate,
        | o_orderkey AS last_orderkey
        |FROM (SELECT o_custkey, o_orderdate, o_orderkey,
        |        ROW_NUMBER() OVER (PARTITION BY o_custkey
        |          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |      FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "a5_count_gate" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS input_rows,
        | CAST(COUNT(*) AS BIGINT) AS output_rows,
        | CAST(1 AS INT) AS gate_passed
        |FROM lineitem""".stripMargin,
    "a6_daily_counts" ->
      """SELECT CAST(ts AS DATE) AS day,
        | CAST(COUNT(*) AS BIGINT) AS n_events,
        | CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "a7_exists_flag" ->
      """SELECT user_id,
        | CASE WHEN MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1
        |   THEN 'Yes' ELSE 'No' END AS has_purchase,
        | CASE WHEN MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) = 1
        |   THEN 'Yes' ELSE 'No' END AS has_error,
        | CAST(COUNT(*) AS BIGINT) AS total_event_count
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "a8_round_avg" ->
      """SELECT c_nationkey,
        | ROUND(CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        |   / COUNT(*), 1) AS avg_acctbal,
        | CAST(COUNT(*) AS BIGINT) AS n_customers
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_kmv_overlap" ->
      // FULL sketch-algebra replay, exact in EVERY regime: the Knuth
      // hash is bit-identical on both engines, so the k-minima, the
      // (k−1)/u_(k) estimates, the union sketch and the Jaccard
      // intersection all replay verbatim (Kmv.estimate/union/
      // intersection mirrored op-for-op; floor(x+0.5) = math.round).
      // Sub-k still degenerates to exact distinct counts. The earlier
      // exact-count oracle assumed the sub-k regime — sf1.0's 129k
      // distinct customers saturated k=16384 and broke it.
      """WITH ua AS (SELECT DISTINCT
        |    CAST(((o_custkey % 2147483648) * 2654435761) % 2147483648
        |      AS DOUBLE) / 2147483648 AS u
        |  FROM orders WHERE o_orderpriority = '1-URGENT'),
        |ub AS (SELECT DISTINCT
        |    CAST(((o_custkey % 2147483648) * 2654435761) % 2147483648
        |      AS DOUBLE) / 2147483648 AS u
        |  FROM orders WHERE o_orderpriority = '2-HIGH'),
        |uu AS (SELECT u FROM ua UNION SELECT u FROM ub),
        |na AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ua),
        |nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ub),
        |xs AS (SELECT u FROM uu ORDER BY u LIMIT 16384),
        |nx AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM xs),
        |bo AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM xs
        |  WHERE u IN (SELECT u FROM ua) AND u IN (SELECT u FROM ub)),
        |est AS (SELECT
        |    CASE WHEN na.n < 16384 THEN CAST(na.n AS DOUBLE)
        |      ELSE CAST(16383 AS DOUBLE) / (SELECT u FROM ua
        |        ORDER BY u LIMIT 1 OFFSET 16383) END AS ea,
        |    CASE WHEN nb.n < 16384 THEN CAST(nb.n AS DOUBLE)
        |      ELSE CAST(16383 AS DOUBLE) / (SELECT u FROM ub
        |        ORDER BY u LIMIT 1 OFFSET 16383) END AS eb,
        |    CASE WHEN nx.n < 16384 THEN CAST(nx.n AS DOUBLE)
        |      ELSE CAST(16383 AS DOUBLE) / (SELECT MAX(u) FROM xs)
        |      END AS eu,
        |    CASE WHEN nx.n < 16384 THEN CAST(bo.n AS DOUBLE)
        |      ELSE (CAST(bo.n AS DOUBLE) / CAST(nx.n AS DOUBLE)) *
        |        (CAST(16383 AS DOUBLE) / (SELECT MAX(u) FROM xs))
        |      END AS ei
        |  FROM na, nb, nx, bo)
        |SELECT CAST(floor(ea + 0.5) AS BIGINT) AS n_urgent,
        |  CAST(floor(eb + 0.5) AS BIGINT) AS n_high,
        |  CAST(floor(eu + 0.5) AS BIGINT) AS n_union,
        |  CAST(floor(ei + 0.5) AS BIGINT) AS n_both
        |FROM est""".stripMargin,
    "agg_weighted_sample" ->
      // replays the Efraimidis–Spirakis keys verbatim: u is a Knuth
      // multiplicative hash in plain integer arithmetic, so both
      // engines derive the IDENTICAL sample; rank-over-key window =
      // the aggregate's top-k (ties impossible: u is injective for
      // id < 2^31 — the 2^31 pre-mask mirrors the Spark side's
      // overflow guard so both engines multiply in BIGINT range)
      """WITH keyed AS (
        |  SELECT event_type, event_id,
        |    ln((CAST(((event_id % 2147483648) * 2654435761)
        |          % 4294967296 AS DOUBLE) + 1.0)
        |        / 4294967297.0) / greatest("value", 1e-6) AS es_key
        |  FROM events),
        |ranked AS (
        |  SELECT event_type, event_id,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY es_key DESC, event_id) AS rk
        |  FROM keyed)
        |SELECT event_type, CAST(rk AS BIGINT) AS rk, event_id
        |FROM ranked WHERE rk <= 20
        |ORDER BY event_type, rk""".stripMargin,
    "agg_cms_pointq" ->
      // exact probe counts replayed; est_ok is the CMS guarantee
      // (est ≥ true always; est ≤ true + ceil(ε·N) only with
      // confidence 0.99 — it HAPPENS to hold for every probe under
      // the fixed seed 42 on this data, which is what makes the
      // literal-true oracle legitimate; changing eps/seed/fixtures
      // can legitimately flip a probe, and CmsPointQuerySpec asserts
      // the same inequality per probe with a failure message that
      // explains the w.h.p. caveat rather than reading as a wrong
      // answer)
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_exact,
        |  TRUE AS est_ok
        |FROM events WHERE user_id % 13 = 0
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "agg_decay_halflife" ->
      // same dyadic 1/256th-unit integer sums; the only float ops are
      // the two post-aggregate divisions (/2^8 exact, /100 rounded
      // once — identical IEEE in both engines)
      """WITH nw AS (SELECT MAX(CAST(ts AS DATE)) AS now_day FROM events),
        |w AS (SELECT event_type,
        |   (CAST(1 AS BIGINT) << CAST(8 - LEAST(
        |      date_diff('day', CAST(ts AS DATE), now_day) // 7, 8)
        |      AS INT)) AS u,
        |   CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events, nw)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(u) AS BIGINT) AS decayed_units,
        |  CAST(SUM(cents * u) AS BIGINT) AS decayed_cent_units,
        |  CAST(SUM(u) AS BIGINT) / 256.0 AS decayed_count,
        |  CAST(SUM(cents * u) AS BIGINT) / 256.0 / 100.0 AS decayed_value
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_cooccurrence" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        | CAST(count(*) AS BIGINT) AS n_users
        |FROM ut a JOIN ut b ON a.user_id = b.user_id
        |  AND a.event_type < b.event_type
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "agg_median_scale" ->
      // rank-based lower median: the value at rank ceil(n/2)
      """SELECT v AS median_price, n AS n_rows FROM (
        |  SELECT o_totalprice AS v,
        |    row_number() OVER (ORDER BY o_totalprice) AS rn,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS n
        |  FROM orders)
        |WHERE rn = CAST(ceil(n / 2.0) AS BIGINT)""".stripMargin,
    "agg_funnel" ->
      """WITH su AS (SELECT user_id, min(ts) AS ts_signup FROM events
        |    WHERE event_type = 'signup' GROUP BY user_id),
        |cl AS (SELECT e.user_id, min(e.ts) AS ts_click FROM events e
        |    JOIN su ON e.user_id = su.user_id AND e.ts > su.ts_signup
        |    WHERE e.event_type = 'click' GROUP BY e.user_id),
        |pu AS (SELECT e.user_id, min(e.ts) AS ts_purchase FROM events e
        |    JOIN cl ON e.user_id = cl.user_id AND e.ts > cl.ts_click
        |    WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT 1 AS stage_ord, 'signup' AS stage,
        |  CAST(count(*) AS BIGINT) AS users FROM su
        |UNION ALL SELECT 2 AS stage_ord, 'click_after_signup' AS stage,
        |  CAST(count(*) AS BIGINT) AS users FROM cl
        |UNION ALL SELECT 3 AS stage_ord, 'purchase_after_click' AS stage,
        |  CAST(count(*) AS BIGINT) AS users FROM pu
        |ORDER BY stage_ord""".stripMargin,
    "agg_cohort" ->
      """WITH w AS (SELECT o_custkey,
        |    date_trunc('month', CAST(o_orderdate AS DATE)) AS omonth,
        |    min(date_trunc('month', CAST(o_orderdate AS DATE)))
        |      OVER (PARTITION BY o_custkey) AS cohort
        |  FROM orders)
        |SELECT cohort,
        |  CAST(date_diff('month', cohort, omonth) AS INTEGER) AS month_offset,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS active_customers
        |FROM w WHERE date_diff('month', cohort, omonth) <= 6
        |GROUP BY cohort, month_offset
        |ORDER BY cohort, month_offset""".stripMargin,
    "agg_quantile_rollup" ->
      """WITH b AS (SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')
        |      AS scope,
        |    LEAST(GREATEST(CAST(floor(o_totalprice / 25000.0) AS INTEGER),
        |      0), 63) AS bin,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM orders GROUP BY 1, 2),
        |n AS (SELECT scope, CAST(SUM(cnt) AS BIGINT) AS n_orders
        |  FROM b GROUP BY scope),
        |tb AS (SELECT bin, CAST(SUM(cnt) AS BIGINT) AS cnt
        |  FROM b GROUP BY bin),
        |allb AS (SELECT b.scope, b.bin, b.cnt, n.n_orders
        |    FROM b JOIN n USING (scope)
        |  UNION ALL SELECT 'TOTAL' AS scope, tb.bin, tb.cnt,
        |    (SELECT CAST(SUM(cnt) AS BIGINT) FROM tb) AS n_orders FROM tb),
        |c AS (SELECT scope, n_orders, bin,
        |    CAST(SUM(cnt) OVER (PARTITION BY scope ORDER BY bin) AS BIGINT)
        |      AS cum
        |  FROM allb WHERE cnt > 0)
        |SELECT scope, n_orders,
        |  (MIN(CASE WHEN cum >= (n_orders + 1) // 2
        |     THEN bin END) + 1) * CAST(25000.0 AS DOUBLE) AS p50_est,
        |  (MIN(CASE WHEN cum >= (19 * n_orders + 1) // 20
        |     THEN bin END) + 1) * CAST(25000.0 AS DOUBLE) AS p95_est
        |FROM c GROUP BY scope, n_orders ORDER BY scope""".stripMargin,
    "agg_weighted_avg" ->
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(CAST(SUM(CAST(l_discount * l_extendedprice AS DECIMAL(18,6))) AS VARCHAR)
        |      AS DOUBLE) /
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        |    AS wavg_discount
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "agg_correlation" ->
      """WITH m AS (SELECT l_returnflag,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(xs) AS BIGINT) AS sx, CAST(SUM(ys) AS BIGINT) AS sy,
        |    CAST(SUM(xs * xs) AS BIGINT) AS sxx,
        |    CAST(SUM(ys * ys) AS BIGINT) AS syy,
        |    CAST(SUM(xs * ys) AS BIGINT) AS sxy
        |  FROM (SELECT l_returnflag,
        |      CAST(round(l_discount * 100) AS BIGINT) AS xs,
        |      CAST(round(l_quantity) AS BIGINT) AS ys
        |    FROM lineitem)
        |  GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |    CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |  sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |    (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
        |      CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS pearson_r,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |    CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |  (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |    CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 100
        |    AS beta_qty_per_discount
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "agg_mode" ->
      """SELECT o_orderstatus, mode_priority, n_rows FROM (
        |  SELECT o_orderstatus, o_orderpriority AS mode_priority,
        |    CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |      ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
        |  FROM orders GROUP BY o_orderstatus, o_orderpriority)
        |WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin,
    "agg_rfm" ->
      // rank-window replay of all three rankings + the same integer
      // quintile-of-rank formula
      """WITH base AS (SELECT o_custkey,
        |    CAST((SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders)
        |      - MAX(CAST(o_orderdate AS DATE)) AS BIGINT) AS recency,
        |    CAST(COUNT(*) AS BIGINT) AS frequency,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) * 100
        |      AS BIGINT) AS monetary_cents
        |  FROM orders GROUP BY 1),
        |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
        |r AS (SELECT o_custkey,
        |    ROW_NUMBER() OVER (ORDER BY recency, o_custkey) AS rr,
        |    ROW_NUMBER() OVER (ORDER BY frequency DESC, o_custkey) AS fr,
        |    ROW_NUMBER() OVER (ORDER BY monetary_cents DESC, o_custkey)
        |      AS mr
        |  FROM base),
        |sc AS (SELECT o_custkey,
        |    CAST(5 - (rr - 1) * 5 // nn.n AS INT) AS r_score,
        |    CAST(5 - (fr - 1) * 5 // nn.n AS INT) AS f_score,
        |    CAST(5 - (mr - 1) * 5 // nn.n AS INT) AS m_score
        |  FROM r CROSS JOIN nn)
        |SELECT r_score, f_score, m_score,
        |  CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  MIN(o_custkey) AS min_custkey
        |FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "agg_wow_retention" ->
      // same Monday-truncated weeks, self-join on week−7, ppm rate
      """WITH uw AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts) AS DATE) AS week FROM events),
        |act AS (SELECT week, CAST(COUNT(*) AS BIGINT) AS n_active
        |  FROM uw GROUP BY 1),
        |ret AS (SELECT c.week, CAST(COUNT(*) AS BIGINT) AS n_retained
        |  FROM uw c JOIN uw p ON p.user_id = c.user_id
        |    AND p.week = c.week - 7
        |  GROUP BY 1)
        |SELECT a.week, a.n_active,
        |  COALESCE(r.n_retained, 0) AS n_retained,
        |  COALESCE(r.n_retained, 0) * 1000000 // a.n_active
        |    AS retention_ppm
        |FROM act a LEFT JOIN ret r USING (week)
        |ORDER BY a.week""".stripMargin,
    "agg_session_paths" ->
      // same micros gap law, session cumsum, 8-event cap, total order
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    epoch_us(ts) AS us FROM events),
        |l AS (SELECT *, lag(us) OVER
        |    (PARTITION BY user_id ORDER BY us, event_id) AS prev_us
        |  FROM e),
        |f AS (SELECT *, CASE WHEN prev_us IS NULL
        |      OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM l),
        |se AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id
        |    ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM f),
        |ranked AS (SELECT user_id, sess, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, sess
        |      ORDER BY us, event_id) AS rn
        |  FROM se),
        |pa AS (SELECT user_id, sess,
        |    string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM ranked WHERE rn <= 8 GROUP BY 1, 2)
        |SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM pa GROUP BY 1
        |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,
    "agg_heavy_change" ->
      // same derived mid-point, conditional halves, total order + cut
      """WITH md AS (SELECT MIN(CAST(ts AS DATE)) + 15 AS mid
        |  FROM events),
        |g AS (SELECT user_id,
        |    CAST(SUM(CASE WHEN CAST(ts AS DATE) < mid
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_before,
        |    CAST(SUM(CASE WHEN CAST(ts AS DATE) >= mid
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_after
        |  FROM events, md GROUP BY 1)
        |SELECT user_id, n_before, n_after, n_after - n_before AS delta
        |FROM g ORDER BY abs(n_after - n_before) DESC, user_id
        |LIMIT 20""".stripMargin,
    "agg_pareto" ->
      // same 1e-4-unit revenue (double product is within 1e-7 of the
      // exact 4-decimal integer, so round() recovers it identically),
      // HUGEINT replay of the decimal floor-div ppm law
      """WITH bb AS (SELECT p_brand AS brand,
        |    CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
        |      * 10000) AS BIGINT)) AS BIGINT) AS rev_u
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1),
        |t AS (SELECT CAST(SUM(rev_u) AS BIGINT) AS total_u FROM bb),
        |c AS (SELECT brand, rev_u,
        |    CAST(SUM(rev_u) OVER (ORDER BY rev_u DESC, brand
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_u
        |  FROM bb)
        |SELECT brand, rev_u, total_u,
        |  CAST(CAST(rev_u AS HUGEINT) * 1000000 // total_u AS BIGINT)
        |    AS share_ppm,
        |  CAST(CAST(cum_u AS HUGEINT) * 1000000 // total_u AS BIGINT)
        |    AS cum_ppm,
        |  CAST(CAST(cum_u - rev_u AS HUGEINT) * 1000000 // total_u
        |    AS BIGINT) < 800000 AS in_head
        |FROM c, t ORDER BY rev_u DESC, brand""".stripMargin,
    "agg_attribution" ->
      // same interval residual, window credit split, and audit columns
      """WITH cl AS (SELECT user_id, ts AS cts, event_id AS click_id
        |  FROM events WHERE event_type = 'click'),
        |pu AS (SELECT user_id, ts AS pts, event_id AS purchase_id
        |  FROM events WHERE event_type = 'purchase'),
        |t AS (SELECT pu.purchase_id, cl.click_id, cl.cts
        |  FROM pu JOIN cl USING (user_id)
        |  WHERE cl.cts < pu.pts AND cl.cts >= pu.pts - INTERVAL 7 DAY),
        |cr AS (SELECT purchase_id, cts,
        |    COUNT(*) OVER (PARTITION BY purchase_id) AS n_touch,
        |    ROW_NUMBER() OVER (PARTITION BY purchase_id
        |      ORDER BY cts, click_id) AS rk
        |  FROM t),
        |cc AS (SELECT CAST(cts AS DATE) AS day,
        |    1000000 // n_touch +
        |      CASE WHEN rk = 1 THEN 1000000 % n_touch ELSE 0 END AS credit
        |  FROM cr),
        |na AS (SELECT CAST(COUNT(DISTINCT purchase_id) AS BIGINT)
        |    AS n_attributed FROM t),
        |np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_purchases FROM pu)
        |SELECT day, CAST(COUNT(*) AS BIGINT) AS n_touches,
        |  CAST(SUM(credit) AS BIGINT) AS credit_ppm,
        |  na.n_attributed, np.n_purchases
        |FROM cc CROSS JOIN na CROSS JOIN np
        |GROUP BY day, na.n_attributed, np.n_purchases
        |ORDER BY day""".stripMargin,
    "agg_sliding_distinct" ->
      // the exact windowed distinct the sketch plane must match in
      // its sub-k regime
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
        |  FROM events),
        |days AS (SELECT DISTINCT day FROM du)
        |SELECT d.day,
        |  CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS n_users_7d
        |FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_transitions" ->
      """WITH seq AS (SELECT user_id, event_type,
        |    lead(event_type, 1) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |adj AS (SELECT event_type AS prev_type, next_type,
        |    CAST(COUNT(*) AS BIGINT) AS n_trans
        |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT prev_type, CAST(SUM(n_trans) AS BIGINT) AS n_from
        |  FROM adj GROUP BY 1)
        |SELECT a.prev_type, a.next_type, a.n_trans, t.n_from,
        |  CAST(a.n_trans AS DOUBLE) / CAST(t.n_from AS DOUBLE) AS p_trans
        |FROM adj a JOIN tot t USING (prev_type)
        |ORDER BY prev_type, next_type""".stripMargin,
    "agg_percentile" ->
      """SELECT o_orderpriority,
        | round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        | round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        | CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_profile" ->
      """WITH s AS (SELECT
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(o_orderkey) AS BIGINT) AS k_nn,
        |  CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS k_nd,
        |  CAST(MIN(o_orderkey) AS VARCHAR) AS k_min,
        |  CAST(MAX(o_orderkey) AS VARCHAR) AS k_max,
        |  CAST(COUNT(o_custkey) AS BIGINT) AS c_nn,
        |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS c_nd,
        |  CAST(MIN(o_custkey) AS VARCHAR) AS c_min,
        |  CAST(MAX(o_custkey) AS VARCHAR) AS c_max,
        |  CAST(COUNT(o_orderstatus) AS BIGINT) AS st_nn,
        |  CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS st_nd,
        |  MIN(o_orderstatus) AS st_min, MAX(o_orderstatus) AS st_max,
        |  CAST(COUNT(o_orderpriority) AS BIGINT) AS p_nn,
        |  CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS p_nd,
        |  MIN(o_orderpriority) AS p_min, MAX(o_orderpriority) AS p_max
        | FROM orders)
        |SELECT n_rows, u.* FROM s, LATERAL (
        |  SELECT 'o_orderkey' AS column_name, k_nn AS n_nonnull,
        |    k_nd AS n_distinct, k_min AS min_value, k_max AS max_value
        |  UNION ALL SELECT 'o_custkey', c_nn, c_nd, c_min, c_max
        |  UNION ALL SELECT 'o_orderstatus', st_nn, st_nd, st_min, st_max
        |  UNION ALL SELECT 'o_orderpriority', p_nn, p_nd, p_min, p_max
        |) u ORDER BY column_name""".stripMargin,
    "agg_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bin,
        | CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_approx_distinct" ->
      """SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        | CAST(count(DISTINCT l_suppkey) AS BIGINT) AS exact_supps,
        | true AS parts_ok, true AS supps_ok FROM lineitem""".stripMargin,
    "agg_bitmap_distinct" ->
      // independent path: DISTINCT counts directly — equality with the
      // OR-folded bitmap words is the exactness proof
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(count(DISTINCT user_id // 32) AS BIGINT) AS n_words,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_bitmap_rollup" ->
      // raw DISTINCTs both planes: per type AND the cross-type union
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY 1
        |UNION ALL
        |SELECT 'TOTAL', CAST(count(DISTINCT user_id) AS BIGINT)
        |FROM events
        |ORDER BY 1""".stripMargin,
    "agg_bitmap_jaccard" ->
      // raw distinct-pair join both planes; AND-merge ≡ intersection
      """WITH s AS (SELECT event_type,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |du AS (SELECT DISTINCT event_type, user_id FROM events),
        |i AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    CAST(count(*) AS BIGINT) AS n_inter
        |  FROM du a JOIN du b ON a.user_id = b.user_id
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b, sa.n AS n_a, sb.n AS n_b, n_inter,
        |  sa.n + sb.n - n_inter AS n_union,
        |  n_inter * 1000000 // (sa.n + sb.n - n_inter)
        |    AS jaccard_ppm,
        |  n_inter * 1000000 // least(sa.n, sb.n) AS overlap_ppm
        |FROM i JOIN s sa ON i.type_a = sa.event_type
        |JOIN s sb ON i.type_b = sb.event_type
        |ORDER BY 1, 2""".stripMargin,
    "agg_aqp_estimate" ->
      """WITH ev AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    (event_id * 2654435761) % 16 = 0 AS in_sample
        |  FROM events),
        |cells AS (SELECT event_type, day, count(*) AS n_cell,
        |    sum(CASE WHEN in_sample THEN 1 ELSE 0 END) AS s_cell
        |  FROM ev GROUP BY 1, 2),
        |days AS (SELECT day, sum(n_cell) AS n_day,
        |    sum(s_cell) AS s_day FROM cells GROUP BY 1),
        |t AS (SELECT event_type,
        |    CAST(sum(n_cell) AS BIGINT) AS n_exact,
        |    CAST(sum(s_cell) AS BIGINT) AS n_sampled,
        |    CAST(sum(CASE WHEN s_day > 0
        |      THEN n_day * s_cell // s_day ELSE 0 END) AS BIGINT)
        |      AS n_est_ratio
        |  FROM cells JOIN days USING (day) GROUP BY 1)
        |SELECT event_type, n_exact, n_sampled,
        |  n_sampled * 16 AS n_est_uniform, n_est_ratio,
        |  abs(n_sampled * 16 - n_exact) * 1000000 // n_exact
        |    AS err_uniform_ppm,
        |  abs(n_est_ratio - n_exact) * 1000000 // n_exact
        |    AS err_ratio_ppm
        |FROM t ORDER BY 1""".stripMargin,
    "agg_sketch_rollup" ->
      """SELECT day, n_events, n_users_exact, true AS est_ok FROM (
        |  SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact
        |  FROM events GROUP BY 1
        |  UNION ALL
        |  SELECT 'TOTAL', CAST(count(*) AS BIGINT),
        |    CAST(count(DISTINCT user_id) AS BIGINT) FROM events
        |) ORDER BY day""".stripMargin,
  )
}
