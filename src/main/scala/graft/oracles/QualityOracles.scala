package graft.oracles

import graft.oracles.Gen._

/** DuckDB oracle SQL for the data-quality, plan-tooling and materialized-view queries —
  * one entry per SparkEntry.queries key in this family. Moved out
  * of SparkEntry mechanically (round-10 verdict ask #7); the text
  * of every entry is unchanged.
  */
private[graft] object QualityOracles {
  val sql: Map[String, String] = Map(
    "dq_fanout_profile" ->
      """WITH pp AS (SELECT o_custkey AS parent,
        |    CAST(count(*) AS BIGINT) AS k FROM orders GROUP BY 1),
        |z AS (SELECT CAST(0 AS BIGINT) AS k,
        |    CAST(count(*) AS BIGINT) AS n_parents
        |  FROM customer
        |  WHERE c_custkey NOT IN (SELECT parent FROM pp)),
        |d0 AS (SELECT k, CAST(count(*) AS BIGINT) AS n_parents
        |  FROM pp GROUP BY 1
        |  UNION ALL SELECT k, n_parents FROM z WHERE n_parents > 0),
        |t AS (SELECT CAST(sum(n_parents) AS BIGINT) AS total_parents,
        |    CAST(sum(k * n_parents) AS BIGINT) AS total_children
        |  FROM d0)
        |SELECT d0.k, n_parents, k * n_parents AS n_children,
        |  total_parents, total_children,
        |  (SELECT k FROM d0 ORDER BY n_parents DESC, k DESC LIMIT 1)
        |    AS mode_k,
        |  CAST(n_parents * 1000000 // total_parents AS BIGINT)
        |    AS share_ppm
        |FROM d0, t ORDER BY k""".stripMargin,
    "dq_k_anonymity" ->
      """WITH cls AS (SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 5000) AS BIGINT) AS bal_band,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM customer GROUP BY 1, 2, 3)
        |SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
        |  CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(min(cnt) AS BIGINT) AS min_class_size,
        |  CAST(sum(CASE WHEN cnt < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_small_classes,
        |  CAST(sum(CASE WHEN cnt < 5 THEN cnt ELSE 0 END) AS BIGINT)
        |    AS rows_at_risk,
        |  CAST(sum(CASE WHEN cnt < 5 THEN cnt ELSE 0 END) * 1000000
        |    // sum(cnt) AS BIGINT) AS suppress_ppm
        |FROM cls""".stripMargin,
    "dq_id_gaps" ->
      """WITH ids AS (SELECT DISTINCT event_type, event_id AS id
        |  FROM events),
        |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_ids,
        |    min(id) AS id_min, max(id) AS id_max,
        |    CAST(max(id) - min(id) + 1 - count(*) AS BIGINT)
        |      AS n_missing
        |  FROM ids GROUP BY 1),
        |g AS (SELECT x.event_type,
        |    CAST(count(*) - 1 AS BIGINT) AS n_gap_runs
        |  FROM ids x LEFT JOIN ids y
        |    ON x.event_type = y.event_type AND x.id = y.id + 1
        |  WHERE y.id IS NULL GROUP BY 1)
        |SELECT st.event_type, n_ids, id_min, id_max, n_missing,
        |  n_gap_runs
        |FROM st JOIN g ON st.event_type = g.event_type
        |ORDER BY 1""".stripMargin,
    "dq_join_card" -> {
      def block(name: String, lsel: String, rsel: String) =
        s"""SELECT '$name' AS join_key, n_left, ndv_left, n_right,
           |  ndv_right, exact_rows,
           |  n_left * n_right
           |    // greatest(ndv_left, ndv_right) AS est_rows,
           |  abs(n_left * n_right
           |      // greatest(ndv_left, ndv_right) - exact_rows)
           |    * 1000000 // exact_rows AS err_ppm
           |FROM
           |  (SELECT CAST(count(*) AS BIGINT) AS n_left,
           |     CAST(count(DISTINCT k) AS BIGINT) AS ndv_left
           |   FROM ($lsel)),
           |  (SELECT CAST(count(*) AS BIGINT) AS n_right,
           |     CAST(count(DISTINCT k) AS BIGINT) AS ndv_right
           |   FROM ($rsel)),
           |  (SELECT CAST(coalesce(sum(cl * cr), 0) AS BIGINT)
           |     AS exact_rows
           |   FROM (SELECT k, count(*) AS cl FROM ($lsel) GROUP BY 1) l
           |   JOIN (SELECT k, count(*) AS cr FROM ($rsel) GROUP BY 1) r
           |   ON l.k = r.k)
           |""".stripMargin
      block("orderkey", "SELECT l_orderkey AS k FROM lineitem",
        "SELECT o_orderkey AS k FROM orders") +
        "UNION ALL " +
        block("partkey", "SELECT l_partkey AS k FROM lineitem",
          "SELECT p_partkey AS k FROM part") +
        "UNION ALL " +
        block("suppkey", "SELECT l_suppkey AS k FROM lineitem",
          "SELECT s_suppkey AS k FROM supplier") +
        "ORDER BY join_key"
    },
    "mv_summary_rewrite" ->
      // computed from the RAW fact: a green row proves the optimizer's
      // summary rewrite returns exactly what the fact scan would
      """SELECT l_returnflag, l_linestatus,
        | CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        |   AS sum_base_price,
        | CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / COUNT(*)
        |   AS avg_qty,
        | CAST(COUNT(*) AS BIGINT) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "mv_incremental_refresh" ->
      // full month-grain recompute from the raw fact: a green row
      // proves initial-load + merged-delta partials equal the direct
      // aggregate, including the month straddling the 1998-06-15
      // cutoff (merged, not appended)
      """SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
        | CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        |   AS sum_base_price,
        | CAST(COUNT(*) AS BIGINT) AS count_order
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "mv_join_delta" ->
      // full O_new ⋈ C_new recompute: a green row proves the
      // retract ∪ re-derive ∪ insert delta algebra lands on exactly
      // the recomputed join view (dimension UPDATE included)
      """WITH cnew AS (SELECT c_custkey,
        |  CASE WHEN c_custkey % 97 = 0 THEN 'PROMOTED'
        |       ELSE c_mktsegment END AS c_mktsegment
        | FROM customer)
        |SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
        | CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        |   AS revenue
        |FROM orders JOIN cnew ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "dq_observed_audit" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_input,
        | CAST(COUNT(CASE WHEN o_totalprice <= 0 THEN 1 END) AS BIGINT)
        |   AS n_nonpos_price,
        | CAST(COUNT(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 END)
        |   AS BIGINT) AS n_bad_status,
        | CAST(COUNT(CASE WHEN o_totalprice > 0 THEN 1 END) AS BIGINT)
        |   AS n_output
        |FROM orders""".stripMargin,
    "dq_expectations" ->
      """WITH r AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_checked,
        |    CAST(COUNT(CASE WHEN NOT COALESCE(o_totalprice > 0, FALSE)
        |      THEN 1 END) AS BIGINT) AS v1,
        |    CAST(COUNT(CASE WHEN NOT COALESCE(o_orderdate IS NOT NULL,
        |      FALSE) THEN 1 END) AS BIGINT) AS v2,
        |    CAST(COUNT(CASE WHEN NOT COALESCE(o_orderstatus IN
        |      ('O','F','P'), FALSE) THEN 1 END) AS BIGINT) AS v3
        |  FROM orders),
        |fk AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_checked,
        |    CAST(COUNT(CASE WHEN c.c_custkey IS NULL THEN 1 END)
        |      AS BIGINT) AS v
        |  FROM orders o LEFT JOIN customer c
        |    ON o.o_custkey = c.c_custkey)
        |SELECT rule, n_checked, n_violations,
        |  CAST(n_violations = 0 AS INT) AS pass
        |FROM (
        |  SELECT 'totalprice_positive' AS rule, n_checked,
        |    v1 AS n_violations FROM r
        |  UNION ALL SELECT 'orderdate_not_null', n_checked, v2 FROM r
        |  UNION ALL SELECT 'status_in_domain', n_checked, v3 FROM r
        |  UNION ALL SELECT 'custkey_resolves', n_checked, v FROM fk)
        |ORDER BY rule""".stripMargin,
    "dq_benford" ->
      // same literal ppm curve, digit from the exact cents string,
      // same integer share law and halved abs-sum distance
      """WITH e(digit, benford_ppm) AS (VALUES
        |  (1, 301030), (2, 176091), (3, 124939), (4, 96910),
        |  (5, 79181), (6, 66947), (7, 57992), (8, 51153), (9, 45757)),
        |c AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100)
        |      AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM c),
        |sh AS (SELECT e.digit, COALESCE(c.n, 0) AS n,
        |    CAST(e.benford_ppm AS BIGINT) AS benford_ppm,
        |    COALESCE(c.n, 0) * 1000000 // t.n_total AS observed_ppm
        |  FROM e LEFT JOIN c USING (digit) CROSS JOIN t),
        |tv AS (SELECT CAST(SUM(abs(observed_ppm - benford_ppm)) // 2
        |    AS BIGINT) AS tvd_vs_benford_ppm FROM sh)
        |SELECT sh.digit, sh.n, sh.benford_ppm, sh.observed_ppm,
        |  tv.tvd_vs_benford_ppm
        |FROM sh CROSS JOIN tv ORDER BY sh.digit""".stripMargin,
    "dq_profile_drift" ->
      // one conditional-aggregation block per profiled column (same
      // slice cut, same ppm div law, same literal thresholds), unioned
      """WITH src AS (SELECT o_orderstatus, o_orderpriority, o_custkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT)
        |      AS o_totalprice_cents,
        |    (o_orderdate < TIMESTAMP '1996-01-01') AS in_a
        |  FROM orders),
        |c1 AS (SELECT o_orderstatus AS v,
        |    SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS cnt_a,
        |    SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS cnt_b
        |  FROM src GROUP BY 1),
        |c2 AS (SELECT o_orderpriority AS v,
        |    SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS cnt_a,
        |    SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS cnt_b
        |  FROM src GROUP BY 1),
        |c3 AS (SELECT o_custkey AS v,
        |    SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS cnt_a,
        |    SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS cnt_b
        |  FROM src GROUP BY 1),
        |c4 AS (SELECT o_totalprice_cents AS v,
        |    SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS cnt_a,
        |    SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS cnt_b
        |  FROM src GROUP BY 1),
        |u AS (
        |  SELECT 'o_orderstatus' AS column_name,
        |    CAST(SUM(cnt_a) AS BIGINT) AS n_a,
        |    CAST(SUM(cnt_b) AS BIGINT) AS n_b,
        |    CAST(COALESCE(SUM(CASE WHEN v IS NULL THEN cnt_a END), 0)
        |      AS BIGINT) AS null_a,
        |    CAST(COALESCE(SUM(CASE WHEN v IS NULL THEN cnt_b END), 0)
        |      AS BIGINT) AS null_b,
        |    CAST(COUNT(CASE WHEN v IS NOT NULL AND cnt_a > 0 THEN 1
        |      END) AS BIGINT) AS ndv_a,
        |    CAST(COUNT(CASE WHEN v IS NOT NULL AND cnt_b > 0 THEN 1
        |      END) AS BIGINT) AS ndv_b FROM c1
        |  UNION ALL
        |  SELECT 'o_orderpriority', CAST(SUM(cnt_a) AS BIGINT),
        |    CAST(SUM(cnt_b) AS BIGINT),
        |    CAST(COALESCE(SUM(CASE WHEN v IS NULL THEN cnt_a END), 0)
        |      AS BIGINT),
        |    CAST(COALESCE(SUM(CASE WHEN v IS NULL THEN cnt_b END), 0)
        |      AS BIGINT),
        |    CAST(COUNT(CASE WHEN v IS NOT NULL AND cnt_a > 0 THEN 1
        |      END) AS BIGINT),
        |    CAST(COUNT(CASE WHEN v IS NOT NULL AND cnt_b > 0 THEN 1
        |      END) AS BIGINT) FROM c2
        |  UNION ALL
        |  SELECT 'o_custkey', CAST(SUM(cnt_a) AS BIGINT),
        |    CAST(SUM(cnt_b) AS BIGINT),
        |    CAST(COALESCE(SUM(CASE WHEN v IS NULL THEN cnt_a END), 0)
        |      AS BIGINT),
        |    CAST(COALESCE(SUM(CASE WHEN v IS NULL THEN cnt_b END), 0)
        |      AS BIGINT),
        |    CAST(COUNT(CASE WHEN v IS NOT NULL AND cnt_a > 0 THEN 1
        |      END) AS BIGINT),
        |    CAST(COUNT(CASE WHEN v IS NOT NULL AND cnt_b > 0 THEN 1
        |      END) AS BIGINT) FROM c3
        |  UNION ALL
        |  SELECT 'o_totalprice_cents', CAST(SUM(cnt_a) AS BIGINT),
        |    CAST(SUM(cnt_b) AS BIGINT),
        |    CAST(COALESCE(SUM(CASE WHEN v IS NULL THEN cnt_a END), 0)
        |      AS BIGINT),
        |    CAST(COALESCE(SUM(CASE WHEN v IS NULL THEN cnt_b END), 0)
        |      AS BIGINT),
        |    CAST(COUNT(CASE WHEN v IS NOT NULL AND cnt_a > 0 THEN 1
        |      END) AS BIGINT),
        |    CAST(COUNT(CASE WHEN v IS NOT NULL AND cnt_b > 0 THEN 1
        |      END) AS BIGINT) FROM c4),
        |d AS (SELECT column_name, n_a, n_b,
        |    null_a * 1000000 // greatest(n_a, 1) AS null_ppm_a,
        |    null_b * 1000000 // greatest(n_b, 1) AS null_ppm_b,
        |    ndv_a, ndv_b,
        |    ndv_a * 1000000 // greatest(n_a, 1) AS ndv_ppm_a,
        |    ndv_b * 1000000 // greatest(n_b, 1) AS ndv_ppm_b
        |  FROM u)
        |SELECT column_name, n_a, n_b, null_ppm_a, null_ppm_b,
        |  null_ppm_b - null_ppm_a AS null_delta_ppm, ndv_a, ndv_b,
        |  ndv_ppm_b - ndv_ppm_a AS ndv_delta_ppm,
        |  (abs(null_ppm_b - null_ppm_a) > 10000 OR
        |   abs(ndv_ppm_b - ndv_ppm_a) > 50000) AS drift_flag
        |FROM d ORDER BY column_name""".stripMargin,
    "dq_late_arrivals" ->
      // same simulated delivery order (multiplicative shuffle), same
      // running max, exact micros diffs, same ceiling-rank p95 law
      """WITH late AS (SELECT event_type, event_id,
        |    MAX(epoch_us(ts)) OVER (PARTITION BY event_type
        |      ORDER BY (event_id * 2654435761) % 100000000, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND
        |      CURRENT ROW) - epoch_us(ts) AS late_us
        |  FROM events),
        |r AS (SELECT event_type, late_us,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY late_us, event_id) AS BIGINT) AS rk,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
        |      AS n_events,
        |    CAST(MAX(late_us) OVER (PARTITION BY event_type)
        |      AS BIGINT) AS max_late_us
        |  FROM late)
        |SELECT event_type, n_events, max_late_us,
        |  CAST(late_us AS BIGINT) AS p95_late_us
        |FROM r WHERE rk = (n_events * 95 + 99) // 100
        |ORDER BY event_type""".stripMargin,
    "dq_dist_drift" ->
      // same ppm share law (integer //) and the same halved abs-sum
      """WITH c AS (SELECT o_orderpriority AS bin,
        |    CAST(COUNT(*) FILTER (o_orderdate < TIMESTAMP '1996-01-01')
        |      AS BIGINT) AS cnt_a,
        |    CAST(COUNT(*) FILTER (o_orderdate >= TIMESTAMP '1996-01-01')
        |      AS BIGINT) AS cnt_b
        |  FROM orders GROUP BY 1),
        |t AS (SELECT CAST(SUM(cnt_a) AS BIGINT) AS n_a,
        |    CAST(SUM(cnt_b) AS BIGINT) AS n_b FROM c),
        |sh AS (SELECT bin, cnt_a, cnt_b,
        |    cnt_a * 1000000 // t.n_a AS p_ppm,
        |    cnt_b * 1000000 // t.n_b AS q_ppm
        |  FROM c CROSS JOIN t),
        |tv AS (SELECT CAST(SUM(abs(p_ppm - q_ppm)) // 2 AS BIGINT)
        |    AS tvd_ppm FROM sh)
        |SELECT sh.bin, sh.cnt_a, sh.cnt_b, sh.p_ppm, sh.q_ppm,
        |  tv.tvd_ppm
        |FROM sh CROSS JOIN tv ORDER BY sh.bin""".stripMargin,
    "dq_order_violations" ->
      // same conditional-min timeline and classification
      """WITH f AS (SELECT user_id,
        |    MIN(CASE WHEN event_type = 'signup' THEN ts END)
        |      AS first_signup,
        |    MIN(CASE WHEN event_type = 'purchase' THEN ts END)
        |      AS first_purchase
        |  FROM events WHERE event_type IN ('signup', 'purchase')
        |  GROUP BY 1),
        |p AS (SELECT * FROM f WHERE first_purchase IS NOT NULL),
        |fl AS (SELECT user_id, first_signup, first_purchase,
        |    CASE WHEN first_signup IS NULL THEN 'no_signup'
        |         WHEN first_purchase < first_signup
        |           THEN 'purchase_before_signup' END AS violation
        |  FROM p),
        |cn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_purchasers,
        |    CAST(COUNT(*) FILTER (violation IS NOT NULL) AS BIGINT)
        |      AS n_violations FROM fl)
        |SELECT fl.user_id, fl.first_signup, fl.first_purchase,
        |  fl.violation, cn.n_purchasers, cn.n_violations
        |FROM fl CROSS JOIN cn WHERE fl.violation IS NOT NULL
        |ORDER BY fl.user_id""".stripMargin,
    "dq_key_discovery" ->
      // one group-count pass per candidate, re-aggregated to
      // (groups, rows, worst multiplicity); integer-only
      """WITH g1 AS (SELECT COUNT(*) AS cnt FROM orders
        |  GROUP BY o_orderkey),
        |g2 AS (SELECT COUNT(*) AS cnt FROM orders GROUP BY o_custkey),
        |g3 AS (SELECT COUNT(*) AS cnt FROM orders GROUP BY o_orderdate),
        |g4 AS (SELECT COUNT(*) AS cnt FROM orders
        |  GROUP BY o_custkey, o_orderdate),
        |g5 AS (SELECT COUNT(*) AS cnt FROM orders
        |  GROUP BY o_custkey, o_orderdate, o_orderstatus)
        |SELECT 'o_orderkey' AS candidate,
        |  CAST(SUM(cnt) AS BIGINT) AS n_rows,
        |  CAST(COUNT(*) AS BIGINT) AS n_groups,
        |  CAST(MAX(cnt) AS BIGINT) AS max_dup, MAX(cnt) = 1 AS is_key
        |FROM g1
        |UNION ALL SELECT 'o_custkey', CAST(SUM(cnt) AS BIGINT),
        |  CAST(COUNT(*) AS BIGINT), CAST(MAX(cnt) AS BIGINT),
        |  MAX(cnt) = 1 FROM g2
        |UNION ALL SELECT 'o_orderdate', CAST(SUM(cnt) AS BIGINT),
        |  CAST(COUNT(*) AS BIGINT), CAST(MAX(cnt) AS BIGINT),
        |  MAX(cnt) = 1 FROM g3
        |UNION ALL SELECT 'o_custkey+o_orderdate',
        |  CAST(SUM(cnt) AS BIGINT), CAST(COUNT(*) AS BIGINT),
        |  CAST(MAX(cnt) AS BIGINT), MAX(cnt) = 1 FROM g4
        |UNION ALL SELECT 'o_custkey+o_orderdate+o_orderstatus',
        |  CAST(SUM(cnt) AS BIGINT), CAST(COUNT(*) AS BIGINT),
        |  CAST(MAX(cnt) AS BIGINT), MAX(cnt) = 1 FROM g5
        |ORDER BY candidate""".stripMargin,
    "dq_volume_anomaly" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1),
        |st AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(n_events) AS BIGINT) AS s1,
        |    CAST(SUM(n_events * n_events) AS BIGINT) AS s2
        |  FROM daily)
        |SELECT day, n_events, s1 / k AS mean_events,
        |  CAST((n_events - s1 / k) * (n_events - s1 / k) >
        |    4.0 * (s2 / k - (s1 / k) * (s1 / k)) AS INT) AS is_anomaly
        |FROM daily, st ORDER BY day""".stripMargin,
    "dq_agreement_kappa" ->
      // same marker argmax as text_lang_id, then the confusion cells,
      // marginals off the cells, and the rational kappa
      """WITH p AS (SELECT lang AS labeled,
        |    CASE WHEN s_en >= s_zh AND s_en >= s_de THEN 'en'
        |         WHEN s_zh >= s_de THEN 'zh' ELSE 'de' END AS predicted
        |  FROM (SELECT lang,
        |      len(regexp_extract_all(text, '\b(the|a|of)\b')) AS s_en,
        |      len(regexp_extract_all(text, '\b(data|query|row)\b'))
        |        AS s_zh,
        |      len(regexp_extract_all(text, '\b(fast|slow|small)\b'))
        |        AS s_de
        |    FROM documents)),
        |cells AS (SELECT labeled, predicted,
        |    CAST(COUNT(*) AS BIGINT) AS n_cell
        |  FROM p GROUP BY 1, 2),
        |r AS (SELECT labeled, CAST(SUM(n_cell) AS BIGINT) AS n_row
        |  FROM cells GROUP BY 1),
        |c AS (SELECT predicted, CAST(SUM(n_cell) AS BIGINT) AS n_col
        |  FROM cells GROUP BY 1),
        |st AS (SELECT
        |    (SELECT CAST(SUM(n_cell) AS BIGINT) FROM cells) AS n,
        |    (SELECT CAST(COALESCE(SUM(n_cell), 0) AS BIGINT)
        |      FROM cells WHERE labeled = predicted) AS sum_diag,
        |    (SELECT CAST(COALESCE(SUM(n_row * n_col), 0) AS BIGINT)
        |      FROM r JOIN c ON r.labeled = c.predicted) AS sum_rc)
        |SELECT cells.labeled, cells.predicted, n_cell, n_row, n_col,
        |  n, sum_diag,
        |  n * sum_diag - sum_rc AS kappa_num,
        |  n * n - sum_rc AS kappa_den,
        |  CAST(n * sum_diag - sum_rc AS DOUBLE) / (n * n - sum_rc)
        |    AS kappa
        |FROM cells JOIN r USING (labeled) JOIN c USING (predicted), st
        |ORDER BY labeled, predicted""".stripMargin,
    "dq_sample_fit" ->
      // same hash-sample law, same Euclidean-split quotient — plain
      // BIGINT ops on both engines (abs first, so // and % agree)
      """WITH cells AS (SELECT event_type,
        |    CAST(COUNT(*) AS BIGINT) AS o1,
        |    CAST(SUM(CASE WHEN ((event_id % 2147483648)
        |      * 2654435761) % 97 < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS o2
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(SUM(o1) AS BIGINT) AS n1,
        |    CAST(SUM(o2) AS BIGINT) AS n2 FROM cells),
        |sp AS (SELECT event_type, o1, o2, n1, n2,
        |    abs(n2 * o1 - n1 * o2) AS d, o1 + o2 AS m
        |  FROM cells, t),
        |q AS (SELECT event_type, o1, o2, n1, n2,
        |    (d // m) * (d // m) * m + 2 * (d // m) * (d % m)
        |      + (d % m) * (d % m) // m AS term_q
        |  FROM sp),
        |c AS (SELECT CAST(SUM(term_q) AS BIGINT) AS sum_q FROM q)
        |SELECT event_type, o1, o2, n1, n2, term_q, sum_q,
        |  CAST(sum_q AS DOUBLE) / (n1 * n2) AS chi2,
        |  CAST(sum_q AS DOUBLE) / (n1 * n2) < 9.488 AS is_fit
        |FROM q, c ORDER BY event_type""".stripMargin,
    "dq_referential" ->
      """SELECT 'customer->nation' AS fk_edge, CAST(count(*) AS BIGINT)
        |  AS n_orphans FROM customer WHERE c_nationkey IS NOT NULL
        |  AND c_nationkey NOT IN (SELECT n_nationkey FROM nation)
        |UNION ALL
        |SELECT 'lineitem->orders', CAST(count(*) AS BIGINT)
        |  FROM lineitem WHERE l_orderkey IS NOT NULL
        |  AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        |UNION ALL
        |SELECT 'nation->region', CAST(count(*) AS BIGINT)
        |  FROM nation WHERE n_regionkey IS NOT NULL
        |  AND n_regionkey NOT IN (SELECT r_regionkey FROM region)
        |UNION ALL
        |SELECT 'orders->customer', CAST(count(*) AS BIGINT)
        |  FROM orders WHERE o_custkey IS NOT NULL
        |  AND o_custkey NOT IN (SELECT c_custkey FROM customer)
        |UNION ALL
        |SELECT 'supplier->nation', CAST(count(*) AS BIGINT)
        |  FROM supplier WHERE s_nationkey IS NOT NULL
        |  AND s_nationkey NOT IN (SELECT n_nationkey FROM nation)
        |ORDER BY fk_edge""".stripMargin,
    "dq_outlier_mad" ->
      // pure integer replay: cents, discrete lower medians via
      // rn = (n+1)//2 (integer div on BOTH sides — a double cast
      // truncates in Spark but rounds in DuckDB), integer flag compare
      """WITH e AS (SELECT event_type,
        |    CAST(round("value" * 100) AS BIGINT) AS vc FROM events),
        |m AS (SELECT event_type, vc AS medc FROM (
        |  SELECT event_type, vc,
        |    row_number() OVER (PARTITION BY event_type ORDER BY vc) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n FROM e)
        |  WHERE rn = (n + 1) // 2),
        |d AS (SELECT e.event_type, abs(vc - medc) AS devc
        |  FROM e JOIN m USING (event_type)),
        |mm AS (SELECT event_type, devc AS madc FROM (
        |  SELECT event_type, devc,
        |    row_number() OVER (PARTITION BY event_type ORDER BY devc) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n FROM d)
        |  WHERE rn = (n + 1) // 2)
        |SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
        |  min(medc) AS med_cents, min(madc) AS mad_cents,
        |  CAST(count(CASE WHEN devc > madc * 3 THEN 1 END) AS BIGINT)
        |    AS n_outliers
        |FROM d JOIN mm USING (event_type) JOIN m USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,
    "dq_outlier_mad_sketch" ->
      // FULL sketch-path replay: the fixed-bin estimate is
      // deterministic SQL — the upper edge of the exact lower
      // median's bin ((LEAST(v // 250, 255) + 1) * 250, by the
      // cumulative-count identity) — so the oracle re-derives the
      // estimates, the sketch-world deviations, the outlier count
      // AND the within-bin agreement booleans; nothing is a literal
      """WITH e AS (SELECT event_type,
        |    CAST(round("value" * 100) AS BIGINT) AS vc FROM events),
        |m AS (SELECT event_type, vc AS medc FROM (
        |  SELECT event_type, vc,
        |    row_number() OVER (PARTITION BY event_type ORDER BY vc) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n FROM e)
        |  WHERE rn = (n + 1) // 2),
        |mest AS (SELECT event_type,
        |    (LEAST(medc // 250, 255) + 1) * 250 AS med_est FROM m),
        |d AS (SELECT e.event_type, vc, abs(vc - med_est) AS devc
        |  FROM e JOIN mest USING (event_type)),
        |dm AS (SELECT event_type, devc AS dmed FROM (
        |  SELECT event_type, devc,
        |    row_number() OVER (PARTITION BY event_type ORDER BY devc) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n FROM d)
        |  WHERE rn = (n + 1) // 2),
        |mmest AS (SELECT event_type,
        |    (LEAST(dmed // 250, 255) + 1) * 250 AS mad_est FROM dm),
        |dx AS (SELECT e.event_type, abs(vc - medc) AS devx
        |  FROM e JOIN m USING (event_type)),
        |mx AS (SELECT event_type, devx AS madc FROM (
        |  SELECT event_type, devx,
        |    row_number() OVER (PARTITION BY event_type ORDER BY devx) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n FROM dx)
        |  WHERE rn = (n + 1) // 2)
        |SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
        |  min(med_est) AS med_est_cents, min(mad_est) AS mad_est_cents,
        |  CAST(count(CASE WHEN devc > mad_est * 3 THEN 1 END) AS BIGINT)
        |    AS n_outliers_sketch,
        |  (min(med_est) - min(medc) BETWEEN 1 AND 250) AS med_within_bin,
        |  (abs(min(mad_est) - min(madc)) <= 500) AS mad_within_2bins
        |FROM d JOIN mmest USING (event_type) JOIN m USING (event_type)
        |  JOIN mx USING (event_type) JOIN mest USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,
    // value-compare classification (the Spark side fingerprints rows;
    // identical classes unless xxhash64 collides)
    "dq_snapshot_diff" ->
      """WITH o AS (SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders),
        |n AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 100.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM o WHERE o_orderkey % 13 <> 0
        |  UNION ALL
        |  SELECT -(o_orderkey + 1), o_orderstatus, o_totalprice
        |  FROM o WHERE o_orderkey % 17 = 0),
        |c AS (SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS k,
        |    CASE WHEN o.o_orderkey IS NULL THEN 'added'
        |         WHEN n.o_orderkey IS NULL THEN 'removed'
        |         WHEN o.o_orderstatus <> n.o_orderstatus
        |           OR o.o_totalprice <> n.o_totalprice THEN 'changed'
        |         ELSE 'unchanged' END AS change
        |  FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey)
        |SELECT change, CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  min(k) AS min_key, max(k) AS max_key
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "plan_lineage" ->
      // hand-derived from Pipelines.insightGold: every output column's
      // physical sources (count(*)-derived columns and literals have
      // none → empty src); a plan refactor that changes the wiring
      // fails the value compare
      """SELECT * FROM (VALUES
        | ('avg_order_value', 'orders.o_totalprice'),
        | ('c_custkey', 'customer.c_custkey'),
        | ('c_mktsegment', 'customer.c_mktsegment'),
        | ('c_name', 'customer.c_name'),
        | ('data_date', ''),
        | ('has_purchase', 'events.event_type'),
        | ('last_orderdate', 'orders.o_orderdate'),
        | ('last_orderdate', 'orders.o_orderkey'),
        | ('last_orderkey', 'orders.o_orderdate'),
        | ('last_orderkey', 'orders.o_orderkey'),
        | ('last_status', 'orders.o_orderstatus'),
        | ('n_events', ''),
        | ('n_lineitems', ''),
        | ('n_orders', ''),
        | ('n_purchases', 'events.event_type'),
        | ('nation', 'nation.n_name'),
        | ('profile_status', 'customer.c_acctbal'),
        | ('profile_status', 'events.event_type'),
        | ('region', 'region.r_name'),
        | ('total_qty', 'lineitem.l_quantity'),
        | ('total_spend', 'orders.o_totalprice')
        |) AS t(out_col, src_col) ORDER BY out_col, src_col""".stripMargin,
    "plan_audit" ->
      // hand-derived from PlanAudit.lintDemo's plan: the UDF filter
      // fires scala-udf AND unconvertible-predicate on its Filter,
      // the rand filter (never offered to the scan) unpushed-filter,
      // the bare-ORDER-BY window one global-window, the crossJoin one
      // cross-product (region is 5 rows at every sf, so the planner's
      // broadcast-nested-loop choice never flips), the final orderBy
      // one global-sort, plus the per-plan exchange-count summary row
      """SELECT * FROM (VALUES
        | ('warn', 'cross-product', 'BroadcastNestedLoopJoin'),
        | ('info', 'exchange-count', 'plan'),
        | ('info', 'global-sort', 'Sort'),
        | ('warn', 'global-window', 'Window'),
        | ('warn', 'scala-udf', 'Filter'),
        | ('info', 'unconvertible-predicate', 'Filter'),
        | ('warn', 'unpushed-filter', 'Filter')
        |) AS t(severity, rule, node) ORDER BY rule, node, severity""".stripMargin,
    "plan_stats_audit" ->
      // ground truth replays; catalog estimates cross as law booleans
      """SELECT col_name,
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders) AS actual_rows,
        |  ndv_exact, true AS rowcount_exact, true AS ndv_in_envelope
        |FROM (
        |  SELECT 'o_custkey' AS col_name,
        |    CAST(count(DISTINCT o_custkey) AS BIGINT) AS ndv_exact
        |  FROM orders
        |  UNION ALL SELECT 'o_orderpriority',
        |    CAST(count(DISTINCT o_orderpriority) AS BIGINT) FROM orders
        |  UNION ALL SELECT 'o_orderstatus',
        |    CAST(count(DISTINCT o_orderstatus) AS BIGINT) FROM orders)
        |ORDER BY col_name""".stripMargin,
    "dq_skew_gini" -> {
      def block(name: String, sel: String) =
        s"""SELECT '$name' AS key_col, n_keys, total_rows, gini_num,
           |  gini_den, gini_num * 1000000 // gini_den AS gini_ppm,
           |  CAST(gini_num AS DOUBLE) / CAST(gini_den AS DOUBLE)
           |    AS gini
           |FROM (
           |  SELECT CAST(max(n) AS BIGINT) AS n_keys,
           |    CAST(sum(cnt) AS BIGINT) AS total_rows,
           |    CAST(2 * sum(i * cnt)
           |      - (max(n) + 1) * sum(cnt) AS BIGINT) AS gini_num,
           |    CAST(max(n) * sum(cnt) AS BIGINT) AS gini_den
           |  FROM (
           |    SELECT cnt, row_number() OVER (ORDER BY cnt, k) AS i,
           |      count(*) OVER () AS n
           |    FROM (SELECT k, count(*) AS cnt FROM ($sel) GROUP BY 1)))
           |""".stripMargin
      block("l_suppkey", "SELECT l_suppkey AS k FROM lineitem") +
        "UNION ALL " +
        block("l_partkey", "SELECT l_partkey AS k FROM lineitem") +
        "UNION ALL " +
        block("user_id", "SELECT user_id AS k FROM events") +
        "ORDER BY key_col"
    },
  )
}
