package graft.oracles

import graft.oracles.Gen._

/** DuckDB oracle SQL for the window / set-op / session-time / advanced-join queries —
  * one entry per SparkEntry.queries key in this family. Moved out
  * of SparkEntry mechanically (round-10 verdict ask #7); the text
  * of every entry is unchanged.
  */
private[graft] object AnalyticsOracles {
  val sql: Map[String, String] = Map(
    "w_pattern_runs" ->
      """WITH daily AS (SELECT event_type,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS eday,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |f AS (SELECT event_type, eday, cnt,
        |    lag(eday) OVER (PARTITION BY event_type ORDER BY eday)
        |      AS pd,
        |    lag(cnt) OVER (PARTITION BY event_type ORDER BY eday)
        |      AS pc
        |  FROM daily),
        |fl AS (SELECT event_type, eday,
        |    (pd = eday - 1 AND cnt < pc) AS declining FROM f),
        |r AS (SELECT event_type, eday - row_number() OVER
        |    (PARTITION BY event_type ORDER BY eday) AS grp
        |  FROM fl WHERE declining),
        |rl AS (SELECT event_type, grp, count(*) AS run_len
        |  FROM r GROUP BY 1, 2),
        |a1 AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(CASE WHEN declining THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_declining_days
        |  FROM fl GROUP BY 1),
        |a2 AS (SELECT event_type,
        |    CAST(max(run_len) AS BIGINT) AS longest_run,
        |    CAST(sum(CASE WHEN run_len >= 3 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_runs_ge3
        |  FROM rl GROUP BY 1)
        |SELECT a1.event_type, n_days, n_declining_days,
        |  CAST(coalesce(longest_run, 0) AS BIGINT) AS longest_run,
        |  CAST(coalesce(n_runs_ge3, 0) AS BIGINT) AS n_runs_ge3
        |FROM a1 LEFT JOIN a2 ON a1.event_type = a2.event_type
        |ORDER BY 1""".stripMargin,
    "st_ohlc" ->
      // independent argmin path: row_number both directions
      """WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    epoch_us(ts) AS t, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |r AS (SELECT event_type, day, cents,
        |    row_number() OVER (PARTITION BY event_type, day
        |      ORDER BY t, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY event_type, day
        |      ORDER BY t DESC, event_id DESC) AS rn_d
        |  FROM e)
        |SELECT event_type, day, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(max(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT)
        |    AS open_cents,
        |  CAST(max(cents) AS BIGINT) AS high_cents,
        |  CAST(min(cents) AS BIGINT) AS low_cents,
        |  CAST(max(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT)
        |    AS close_cents,
        |  CAST(sum(cents) AS BIGINT) AS vol_cents
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "w_topk" ->
      """SELECT o_custkey,
        | CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        |   AS total_spend,
        | CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM orders GROUP BY 1
        |ORDER BY total_spend DESC, o_custkey LIMIT 10""".stripMargin,
    "w_topk_group" ->
      // the window formulation the aggregator replaces — identical
      // rows, including the o_orderkey tie-break
      """SELECT o_orderpriority, rk,
        | CAST(o_totalprice AS DOUBLE) AS o_totalprice, o_orderkey
        |FROM (SELECT o_orderpriority, o_totalprice, o_orderkey,
        |   row_number() OVER (PARTITION BY o_orderpriority
        |     ORDER BY o_totalprice DESC, o_orderkey) AS rk
        | FROM orders)
        |WHERE rk <= 3 ORDER BY 1, 2""".stripMargin,
    "w_running" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        | CAST(ROW_NUMBER() OVER w AS INT) AS order_seq,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
        |     PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |   AS running_spend
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, order_seq""".stripMargin,
    "set_union" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "set_distinct" ->
      "SELECT DISTINCT o_orderpriority FROM orders ORDER BY 1",
    "set_rollup" ->
      """SELECT r_name, n_name, CAST(COUNT(*) AS BIGINT) AS n_customers
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "set_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "set_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "set_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "st_moving_median" ->
      // full sketch-path replay: same bins, same 7-day fan-out, same
      // lower-median rank and upper-bin-edge read-off
      """WITH b AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    LEAST(GREATEST(CAST(floor(o_totalprice / 25000.0) AS INTEGER),
        |      0), 63) AS bin,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM orders GROUP BY 1, 2),
        |days AS (SELECT DISTINCT day FROM b),
        |wb AS (SELECT d.day AS wday, b.bin,
        |    CAST(SUM(b.cnt) AS BIGINT) AS cnt
        |  FROM days d JOIN b ON b.day BETWEEN d.day - 6 AND d.day
        |  GROUP BY 1, 2),
        |c AS (SELECT wday,
        |    CAST(SUM(cnt) OVER (PARTITION BY wday) AS BIGINT) AS n,
        |    bin,
        |    CAST(SUM(cnt) OVER (PARTITION BY wday ORDER BY bin)
        |      AS BIGINT) AS cum
        |  FROM wb WHERE cnt > 0)
        |SELECT wday AS day, n AS n_orders,
        |  (MIN(CASE WHEN cum >= (n + 1) // 2 THEN bin END) + 1)
        |    * CAST(25000.0 AS DOUBLE) AS p50_est
        |FROM c GROUP BY wday, n ORDER BY day""".stripMargin,
    "w_percent_rank" ->
      """WITH spend AS (SELECT o_custkey,
        |    CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        |      AS total_spend
        |  FROM orders GROUP BY o_custkey)
        |SELECT o_custkey, total_spend,
        |  percent_rank() OVER (ORDER BY total_spend, o_custkey)
        |    AS spend_pct_rank,
        |  cume_dist() OVER (ORDER BY total_spend, o_custkey)
        |    AS spend_cume_dist
        |FROM spend ORDER BY o_custkey""".stripMargin,
    "set_unpivot" ->
      """SELECT p_partkey, 'p_size' AS metric,
        |  CAST(p_size AS DOUBLE) AS value FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_retailprice', p_retailprice FROM part
        |ORDER BY p_partkey, metric""".stripMargin,
    "set_union_evolve" ->
      """SELECT o_orderkey, o_totalprice,
        |  CAST(NULL AS VARCHAR) AS o_orderstatus
        |FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01'
        |UNION ALL
        |SELECT o_orderkey, o_totalprice, o_orderstatus
        |FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'
        |ORDER BY o_orderkey""".stripMargin,
    "w_range_frame" ->
      // epoch_us // 1e6 floors to whole seconds like Spark's
      // unix_timestamp; CAST(epoch(ts) AS BIGINT) ROUNDS in DuckDB
      // (truncates in Spark) and flipped one frame-boundary event at
      // sf0.1 — the same divergence class commit 8da9b0f fixed, only
      // visible at the sf where an event lands exactly on a 7-day
      // boundary's half-second
      """SELECT event_id, user_id, ts,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
        |    PARTITION BY user_id
        |    ORDER BY epoch_us(ts) // 1000000
        |    RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
        |  AS DOUBLE) AS trailing_7d_value
        |FROM events
        |ORDER BY user_id, ts, event_id""".stripMargin,
    "st_gap_fill" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_value
        |  FROM events WHERE value >= 250.0 GROUP BY 1),
        |spine AS (SELECT unnest(generate_series(
        |    (SELECT min(day) FROM daily), (SELECT max(day) FROM daily),
        |    INTERVAL 1 DAY)) AS day)
        |SELECT CAST(spine.day AS DATE) AS day,
        |  COALESCE(daily.n_events, 0) AS n_events,
        |  COALESCE(daily.sum_value, 0.0) AS sum_value
        |FROM spine LEFT JOIN daily ON CAST(spine.day AS DATE) = daily.day
        |ORDER BY day""".stripMargin,
    "st_trend" ->
      // triangular day-pair self-join per series, integer sign sum
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(round("value" * 100) AS BIGINT)) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT a.event_type,
        |    CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1
        |      ELSE 0 END AS sgn
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.day < b.day),
        |agg AS (SELECT event_type, CAST(SUM(sgn) AS BIGINT) AS s_stat,
        |    CAST(COUNT(*) AS BIGINT) AS n_pairs
        |  FROM p GROUP BY 1),
        |nd AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
        |  FROM daily GROUP BY 1)
        |SELECT agg.event_type, agg.s_stat, agg.n_pairs, nd.n_days,
        |  CASE WHEN s_stat > 0 THEN 'increasing'
        |       WHEN s_stat < 0 THEN 'decreasing'
        |       ELSE 'none' END AS trend
        |FROM agg JOIN nd USING (event_type)
        |ORDER BY event_type""".stripMargin,
    "st_autocorr" ->
      // same observed-sequence lags and BIGINT moments; the signed
      // square (num/den1)·(|num|/den2) is the sqrt-free IEEE tree
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |lagged AS (
        |  SELECT event_type, 1 AS lag, x, lag(x, 1) OVER
        |    (PARTITION BY event_type ORDER BY day) AS y FROM daily
        |  UNION ALL SELECT event_type, 2, x, lag(x, 2) OVER
        |    (PARTITION BY event_type ORDER BY day) FROM daily
        |  UNION ALL SELECT event_type, 3, x, lag(x, 3) OVER
        |    (PARTITION BY event_type ORDER BY day) FROM daily),
        |m AS (SELECT event_type, lag, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(y * y) AS BIGINT) AS syy
        |  FROM lagged WHERE y IS NOT NULL GROUP BY 1, 2)
        |SELECT event_type, CAST(lag AS INT) AS lag, n,
        |  n * sxy - sx * sy AS num, n * sxx - sx * sx AS den1,
        |  n * syy - sy * sy AS den2,
        |  CASE WHEN n * sxx - sx * sx <> 0 AND n * syy - sy * sy <> 0
        |    THEN ((n * sxy - sx * sy) / (n * sxx - sx * sx))
        |       * (abs(n * sxy - sx * sy) / (n * syy - sy * sy))
        |  END AS acf_sq_signed
        |FROM m ORDER BY event_type, lag""".stripMargin,
    "st_seasonality" ->
      // rational chi-square (7·Σo² − n²)/n; weekday = epoch-day mod 7
      // (both engines' dayofweek() disagree on week start — unused)
      """WITH bd AS (SELECT event_type,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
        |      AS dow,
        |    CAST(COUNT(*) AS BIGINT) AS n_dow
        |  FROM events GROUP BY 1, 2),
        |bt AS (SELECT event_type, CAST(SUM(n_dow) AS BIGINT) AS n,
        |    CAST(SUM(n_dow * n_dow) AS BIGINT) AS so2
        |  FROM bd GROUP BY 1)
        |SELECT bd.event_type, CAST(dow AS INT) AS dow, n_dow, n,
        |  7 * so2 - n * n AS chi2_num,
        |  (7 * so2 - n * n) / n AS chi2,
        |  (7 * so2 - n * n) / n < 12.592 AS is_uniform
        |FROM bd JOIN bt USING (event_type)
        |ORDER BY event_type, dow""".stripMargin,
    "st_decompose" ->
      // same observed-row 7-window, same per-dow moments off the
      // interior, each double one division of the exact integers
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
        |      AS dow
        |  FROM events GROUP BY 1, 2),
        |tr AS (SELECT event_type, day, dow, x,
        |    CAST(SUM(x) OVER w AS BIGINT) AS trend_sum7,
        |    CAST(COUNT(*) OVER w AS BIGINT) AS n_win
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |dt AS (SELECT *, CASE WHEN n_win = 7
        |    THEN 7 * x - trend_sum7 END AS detrend_num FROM tr),
        |se AS (SELECT event_type, dow,
        |    CAST(SUM(detrend_num) AS BIGINT) AS s_num,
        |    CAST(COUNT(*) AS BIGINT) AS s_cnt
        |  FROM dt WHERE detrend_num IS NOT NULL GROUP BY 1, 2)
        |SELECT dt.event_type, dt.day, CAST(dt.dow AS INT) AS dow,
        |  dt.x, dt.trend_sum7, dt.n_win, dt.detrend_num,
        |  se.s_num, se.s_cnt,
        |  CASE WHEN n_win = 7
        |    THEN CAST(trend_sum7 AS DOUBLE) / 7 END AS trend,
        |  CAST(s_num AS DOUBLE) / (7 * s_cnt) AS seasonal,
        |  CAST(s_cnt * detrend_num - s_num AS DOUBLE) / (7 * s_cnt)
        |    AS residual
        |FROM dt LEFT JOIN se
        |  ON dt.event_type = se.event_type AND dt.dow = se.dow
        |ORDER BY dt.event_type, dt.day""".stripMargin,
    "st_cusum" ->
      // same scaled deviation sum n·prefix − t·total in BIGINTs; the
      // argmax replayed by a rank window (abs desc, day asc)
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(round("value" * 100) AS BIGINT)) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |c AS (SELECT event_type, day,
        |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS t,
        |    CAST(SUM(x) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND
        |      CURRENT ROW) AS BIGINT) AS prefix,
        |    CAST(COUNT(*) OVER p AS BIGINT) AS n_days,
        |    CAST(SUM(x) OVER p AS BIGINT) AS total_cents
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day),
        |         p AS (PARTITION BY event_type)),
        |s AS (SELECT event_type, day,
        |    abs(n_days * prefix - t * total_cents) AS a,
        |    n_days, total_cents,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY abs(n_days * prefix - t * total_cents) DESC, day)
        |      AS rk
        |  FROM c)
        |SELECT event_type, day AS change_day, CAST(a AS BIGINT)
        |    AS cusum_peak, n_days, total_cents
        |FROM s WHERE rk = 1 ORDER BY event_type""".stripMargin,
    "st_holt_winters" ->
      // the identical two-variable α=β=½ recursion, walked day-rank
      // by day-rank with a recursive CTE — the same op sequence as
      // Spark's prefix fold, so every level/trend double is
      // bit-identical even past the 53-bit-exact regime (rounding is
      // deterministic when the op sequence is; see holtWinters)
      """WITH RECURSIVE d0 AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(round("value" * 100) AS BIGINT)) AS BIGINT)
        |      AS total_cents
        |  FROM events GROUP BY 1, 2),
        |daily AS (SELECT event_type, day, total_cents,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS t,
        |    CAST(total_cents AS DOUBLE) AS x
        |  FROM d0),
        |hw AS (
        |  SELECT event_type, day, total_cents, t, x,
        |    (x + 0.0 + 0.0) / 2 AS l,
        |    (((x + 0.0 + 0.0) / 2) - 0.0 + 0.0) / 2 AS b
        |  FROM daily WHERE t = 1
        |  UNION ALL
        |  SELECT d.event_type, d.day, d.total_cents, d.t, d.x,
        |    (d.x + hw.l + hw.b) / 2,
        |    (((d.x + hw.l + hw.b) / 2) - hw.l + hw.b) / 2
        |  FROM hw JOIN daily d
        |    ON d.event_type = hw.event_type AND d.t = hw.t + 1)
        |SELECT event_type, day, total_cents, l AS level, b AS trend,
        |  l + b AS forecast_next
        |FROM hw ORDER BY event_type, day""".stripMargin,
    "st_kaplan_meier" ->
      // the identical ppm floor-div survival recurrence, walked
      // duration-rank by duration-rank with a recursive CTE — the
      // same integer op sequence as Spark's sorted-list fold
      """WITH RECURSIVE span AS (SELECT o_custkey,
        |    CAST(MIN(o_orderdate) AS DATE) AS first_d,
        |    CAST(MAX(o_orderdate) AS DATE) AS last_d
        |  FROM orders GROUP BY 1),
        |cut AS (SELECT CAST(MAX(o_orderdate) AS DATE)
        |    - INTERVAL 90 DAY AS c FROM orders),
        |life AS (SELECT
        |    CAST(date_diff('day', first_d, last_d) AS INT) AS t,
        |    CASE WHEN last_d < cut.c THEN 1 ELSE 0 END AS ch
        |  FROM span, cut),
        |g AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n_exit,
        |    CAST(SUM(ch) AS BIGINT) AS d FROM life GROUP BY 1),
        |g2 AS (SELECT t, n_exit, d,
        |    CAST(ROW_NUMBER() OVER (ORDER BY t) AS BIGINT) AS rn
        |  FROM g),
        |nt AS (SELECT CAST(SUM(n_exit) AS BIGINT) AS n_total FROM g),
        |rec AS (
        |  SELECT CAST(0 AS BIGINT) AS rn, CAST(0 AS BIGINT) AS cum,
        |    CAST(1000000 AS BIGINT) AS s
        |  UNION ALL
        |  SELECT g2.rn, rec.cum + g2.n_exit,
        |    CASE WHEN g2.d > 0
        |      THEN (rec.s * ((nt.n_total - rec.cum) - g2.d))
        |        // (nt.n_total - rec.cum)
        |      ELSE rec.s END
        |  FROM rec JOIN g2 ON g2.rn = rec.rn + 1, nt)
        |SELECT g2.t AS t_days,
        |  nt.n_total - (rec.cum - g2.n_exit) AS n_risk,
        |  g2.d AS d_churn, rec.s AS surv_ppm
        |FROM rec JOIN g2 ON g2.rn = rec.rn, nt
        |WHERE g2.d > 0 ORDER BY t_days""".stripMargin,
    "agg_cuped" ->
      // the same exact-BIGINT moments and the identical double op
      // order for theta / effects / rho^2 (see Analytics.cuped)
      """WITH per AS (SELECT user_id,
        |    CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
        |      THEN CAST(round("value") AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
        |      THEN CAST(round("value") AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |pt AS (SELECT x, y,
        |    ((user_id % 2147483648) * 2654435761) % 100 < 50 AS tr
        |  FROM per),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(y * y) AS BIGINT) AS syy,
        |    CAST(SUM(CASE WHEN tr THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
        |    CAST(SUM(CASE WHEN tr THEN x ELSE 0 END) AS BIGINT) AS sx_t,
        |    CAST(SUM(CASE WHEN tr THEN y ELSE 0 END) AS BIGINT) AS sy_t
        |  FROM pt),
        |d AS (SELECT n, n_t AS n_treat, n - n_t AS n_ctrl,
        |    n * sxy - sx * sy AS cov_num,
        |    n * sxx - sx * sx AS var_x_num,
        |    n * syy - sy * sy AS var_y_num,
        |    n_t, sx_t, sy_t, sx, sy
        |  FROM m)
        |SELECT n, n_treat, n_ctrl,
        |  round(CAST(cov_num AS DOUBLE) / CAST(var_x_num AS DOUBLE), 6)
        |    AS theta,
        |  round((CAST(sy_t AS DOUBLE) / CAST(n_t AS DOUBLE) -
        |    CAST(sy - sy_t AS DOUBLE) / CAST(n - n_t AS DOUBLE)), 6)
        |    AS raw_diff,
        |  round((CAST(sy_t AS DOUBLE) / CAST(n_t AS DOUBLE) -
        |    CAST(sy - sy_t AS DOUBLE) / CAST(n - n_t AS DOUBLE)) -
        |    (CAST(cov_num AS DOUBLE) / CAST(var_x_num AS DOUBLE)) *
        |    (CAST(sx_t AS DOUBLE) / CAST(n_t AS DOUBLE) -
        |    CAST(sx - sx_t AS DOUBLE) / CAST(n - n_t AS DOUBLE)), 6)
        |    AS adj_diff,
        |  round(CAST(cov_num AS DOUBLE) * CAST(cov_num AS DOUBLE) /
        |    (CAST(var_x_num AS DOUBLE) * CAST(var_y_num AS DOUBLE)), 6)
        |    AS rho2
        |FROM d""".stripMargin,
    "st_ewma" ->
      // same left fold over the same 10-day frame list: acc/2 + x is
      // an exponent decrement plus an in-mantissa add, so the doubles
      // are bit-identical across engines (see ewmaDaily's scaladoc);
      // list_prepend(0.0) mirrors Spark aggregate's zero seed
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(round("value" * 100) AS BIGINT)) AS BIGINT)
        |      AS total_cents
        |  FROM events GROUP BY 1, 2),
        |fr AS (SELECT event_type, day, total_cents,
        |    list(CAST(total_cents AS DOUBLE)) OVER (
        |      PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS frame
        |  FROM daily)
        |SELECT event_type, day, total_cents,
        |  list_reduce(list_prepend(0.0, frame),
        |    (acc, x) -> acc / 2 + x) AS ewma
        |FROM fr ORDER BY event_type, day""".stripMargin,
    "st_locf" ->
      // LOCF replay: same spine, last_value IGNORE NULLS over the
      // same running frame; integer cents → hash-exact fill
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(round("value" * 100) AS BIGINT)) AS BIGINT)
        |      AS sum_cents
        |  FROM events WHERE "value" >= 250.0 GROUP BY 1, 2),
        |spine AS (SELECT t.event_type, CAST(d.day AS DATE) AS day
        |  FROM (SELECT DISTINCT event_type FROM events) t
        |  CROSS JOIN (SELECT unnest(generate_series(
        |    (SELECT min(CAST(ts AS DATE)) FROM events),
        |    (SELECT max(CAST(ts AS DATE)) FROM events),
        |    INTERVAL 1 DAY)) AS day) d)
        |SELECT s.event_type, s.day,
        |  daily.sum_cents IS NOT NULL AS observed,
        |  last_value(daily.sum_cents IGNORE NULLS) OVER (
        |    PARTITION BY s.event_type ORDER BY s.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS sum_cents_filled
        |FROM spine s LEFT JOIN daily
        |  ON s.event_type = daily.event_type AND s.day = daily.day
        |ORDER BY s.event_type, s.day""".stripMargin,
    "st1_tumbling_daily" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
        | CAST(COUNT(*) AS BIGINT) AS n_events,
        | CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "st2_sliding_7day" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS daily_events
        |  FROM events GROUP BY 1)
        |SELECT day, daily_events,
        | CAST(SUM(daily_events) OVER (
        |     ORDER BY date_diff('day', DATE '1970-01-01', day)
        |     RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
        |   AS trailing_7d_events
        |FROM daily ORDER BY day""".stripMargin,
    "adv_asof_join" ->
      """WITH lastord AS (
        |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.ts,
        | o.o_orderkey AS last_orderkey,
        | o.o_orderdate AS last_orderdate
        |FROM events e
        |ASOF LEFT JOIN lastord o
        |  ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
        |ORDER BY e.event_id""".stripMargin,
    "adv_nearest_join" ->
      // independent path: a raw band filter + row_number argmin under
      // the same (abs_us, ts, id) total order — no day explode
      """WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts
        |    FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, event_id AS click_id, ts AS c_ts
        |    FROM events WHERE event_type = 'click'),
        |cand AS (SELECT p.purchase_id, c.click_id, c.c_ts,
        |    abs(epoch_us(c.c_ts) - epoch_us(p.p_ts)) AS abs_us
        |  FROM p JOIN c ON p.user_id = c.user_id
        |  WHERE abs(epoch_us(c.c_ts) - epoch_us(p.p_ts))
        |    <= 86400000000),
        |best AS (SELECT purchase_id, click_id, c_ts, abs_us,
        |    row_number() OVER (PARTITION BY purchase_id
        |      ORDER BY abs_us, c_ts, click_id) AS rn
        |  FROM cand)
        |SELECT p.purchase_id, p.user_id, p.p_ts AS purchase_ts,
        |  b.click_id, b.c_ts AS click_ts, b.abs_us
        |FROM p LEFT JOIN best b
        |  ON p.purchase_id = b.purchase_id AND b.rn = 1
        |ORDER BY p.purchase_id""".stripMargin,
    "adv_session_window" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts >= lag(ts) OVER w + INTERVAL 2 HOUR
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sessions AS (
        |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged)
        |SELECT user_id, min(ts) AS session_start,
        | max(ts) + INTERVAL 2 HOUR AS session_end,
        | CAST(COUNT(*) AS BIGINT) AS n_events,
        | CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS session_value
        |FROM sessions GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "adv_bucketed_join" ->
      """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_items,
        | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        |   AS total_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "adv_dpp_prune" ->
      // the dim join is semantically the quarter predicate — computed
      // directly here, so a green row proves the DPP'd join exact
      """SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
        | CAST(COUNT(*) AS BIGINT) AS n_orders,
        | CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM orders
        |WHERE year(o_orderdate) = 1996 AND month(o_orderdate) <= 3
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "adv_recursive_cte" ->
      """WITH RECURSIVE chain AS (
        |  SELECT c_custkey, c_custkey AS root, 1 AS depth
        |  FROM customer WHERE c_custkey < 10
        |  UNION ALL
        |  SELECT c.c_custkey, ch.root, ch.depth + 1
        |  FROM customer c
        |  JOIN chain ch
        |    ON CAST(FLOOR(c.c_custkey / 10.0) AS BIGINT) = ch.c_custkey
        |  WHERE c.c_custkey >= 10
        |)
        |SELECT c_custkey, root, depth FROM chain
        |ORDER BY c_custkey""".stripMargin,
    "adv_salted_agg" ->
      """SELECT event_type,
        | CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total_value,
        | CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "adv_skyline" ->
      // independent formulation: the quadratic NOT EXISTS dominance
      // test the engine's bucketed core must agree with exactly
      """WITH p AS (SELECT p_partkey,
        |    CAST(round(p_retailprice * 100) AS BIGINT) AS pc, p_size
        |  FROM part)
        |SELECT 'cheap_small' AS frontier, p_partkey,
        |  pc AS price_cents, p_size
        |FROM p x WHERE NOT EXISTS (SELECT 1 FROM p y
        |  WHERE y.pc <= x.pc AND y.p_size <= x.p_size
        |    AND (y.pc < x.pc OR y.p_size < x.p_size))
        |UNION ALL
        |SELECT 'cheap_large' AS frontier, p_partkey,
        |  pc AS price_cents, p_size
        |FROM p x WHERE NOT EXISTS (SELECT 1 FROM p y
        |  WHERE y.pc <= x.pc AND y.p_size >= x.p_size
        |    AND (y.pc < x.pc OR y.p_size > x.p_size))
        |ORDER BY frontier, p_partkey""".stripMargin,
    "adv_skew_join" ->
      // the runtime split must not change the answer: plain replay of
      // the skewed-key join + rollup (integer cents)
      """WITH f AS (SELECT CASE WHEN user_id % 2 = 0 THEN 0
        |      ELSE user_id END AS k,
        |    CAST(round("value" * 100) AS BIGINT) AS cents FROM events),
        |d AS (SELECT DISTINCT k, k % 7 AS bucket FROM f)
        |SELECT d.bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(cents) AS BIGINT) AS sum_cents
        |FROM f JOIN d ON f.k = d.k
        |GROUP BY d.bucket ORDER BY d.bucket""".stripMargin,
    "adv_interval_join" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
        | CAST(count(e.ts) AS BIGINT) AS n_prior_events,
        | coalesce(CAST(CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE),
        |   0.0) AS prior_value
        |FROM events p LEFT JOIN events e
        |  ON e.user_id = p.user_id AND e.ts < p.ts
        |  AND e.ts >= p.ts - INTERVAL 10 MINUTE
        |WHERE p.event_type = 'purchase'
        |GROUP BY 1, 2 ORDER BY purchase_id""".stripMargin,
    "w_leadlag" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS od,
        | CAST(date_diff('day', lag(CAST(o_orderdate AS DATE), 1) OVER w,
        |   CAST(o_orderdate AS DATE)) AS INT) AS days_since_prev
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "w_streaks" ->
      // the same day − ROW_NUMBER run id; all-integer output
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
        |  FROM events),
        |isl AS (SELECT user_id, d,
        |    d - CAST(ROW_NUMBER() OVER
        |          (PARTITION BY user_id ORDER BY d) AS INT) AS grp
        |  FROM days),
        |runs AS (SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len
        |  FROM isl GROUP BY 1, 2)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_streaks,
        |  MAX(len) AS longest_streak,
        |  CAST(SUM(len) AS BIGINT) AS n_active_days
        |FROM runs GROUP BY 1 ORDER BY user_id""".stripMargin,
    "w_ntile" ->
      """SELECT o_custkey, total_spend,
        | CAST(NTILE(4) OVER (ORDER BY total_spend DESC, o_custkey) AS INT)
        |   AS quartile
        |FROM (SELECT o_custkey,
        |        CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        |          AS total_spend
        |      FROM orders GROUP BY 1)
        |ORDER BY o_custkey""".stripMargin,
    "set_cube" ->
      """SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "st_twap" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |d AS (SELECT user_id, t, cents,
        |    lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
        |      - t AS dt
        |  FROM e),
        |g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(max(t) - min(t) AS BIGINT) AS span_us,
        |    CAST(sum(cents * dt) AS BIGINT) AS wsum,
        |    CAST(sum(cents) AS BIGINT) AS csum
        |  FROM d GROUP BY 1)
        |SELECT user_id, n_events, span_us,
        |  wsum // span_us AS twap_cents,
        |  csum // n_events AS mean_cents
        |FROM g WHERE span_us > 0 ORDER BY 1""".stripMargin,
    "st_yoy" ->
      """WITH monthly AS (SELECT CAST(year(o_orderdate) AS INT) AS y,
        |    CAST(month(o_orderdate) AS INT) AS m,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,6))
        |      * 10000 AS BIGINT)) AS BIGINT) AS rev_u,
        |    CAST(count(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY 1, 2)
        |SELECT c.y, c.m, c.n_orders, c.rev_u,
        |  p.rev_u AS prev_rev_u,
        |  c.rev_u - p.rev_u AS diff_u,
        |  CAST(c.rev_u AS DOUBLE) / CAST(p.rev_u AS DOUBLE)
        |    AS yoy_ratio
        |FROM monthly c LEFT JOIN monthly p
        |  ON c.y - 1 = p.y AND c.m = p.m
        |ORDER BY 1, 2""".stripMargin,
    "st_burstiness" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(x * x) AS BIGINT) AS sx2
        |  FROM d GROUP BY 1)
        |SELECT event_type, n_days, sx,
        |  n_days * sx2 - sx * sx AS fano_num,
        |  (n_days - 1) * sx AS fano_den,
        |  CAST(n_days * sx2 - sx * sx AS DOUBLE)
        |    / CAST((n_days - 1) * sx AS DOUBLE) AS fano
        |FROM g ORDER BY 1""".stripMargin,
    "st_records" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |f AS (SELECT event_type, cnt,
        |    max(cnt) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS pm
        |  FROM d),
        |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(CASE WHEN pm IS NULL OR cnt > pm
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_records
        |  FROM f GROUP BY 1),
        |h AS (SELECT event_type,
        |    CAST(sum(1000000 // (s + 1)) AS BIGINT) AS h_scaled
        |  FROM g, unnest(range(n_days)) AS t(s) GROUP BY 1)
        |SELECT g.event_type, n_days, n_records, h_scaled,
        |  n_records * 1000000 - h_scaled AS excess_scaled
        |FROM g JOIN h ON g.event_type = h.event_type
        |ORDER BY 1""".stripMargin,
    "st_drawdown" ->
      // independent argmax path: row_number under (dd DESC, t, id)
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t,
        |    CASE WHEN event_type = 'purchase'
        |      THEN -CAST(round(value * 100) AS BIGINT)
        |      ELSE CAST(round(value * 100) AS BIGINT) END AS sc
        |  FROM events),
        |b AS (SELECT user_id, event_id, t,
        |    sum(sc) OVER (PARTITION BY user_id ORDER BY t, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS balance
        |  FROM e),
        |p AS (SELECT user_id, event_id, t, balance,
        |    max(balance) OVER (PARTITION BY user_id
        |      ORDER BY t, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - balance AS dd
        |  FROM b),
        |r AS (SELECT user_id, event_id, balance, dd,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY dd DESC, t, event_id) AS rk
        |  FROM p)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(max(balance) AS BIGINT) AS peak_balance,
        |  CAST(min(balance) AS BIGINT) AS trough_balance,
        |  CAST(max(CASE WHEN rk = 1 THEN dd END) AS BIGINT)
        |    AS max_drawdown,
        |  CAST(max(CASE WHEN rk = 1 THEN event_id END) AS BIGINT)
        |    AS dd_event_id
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "st_concurrency" ->
      """WITH ep AS (
        |  SELECT user_id, epoch_us(ts) AS t, 1 AS delta FROM events
        |  UNION ALL
        |  SELECT user_id, epoch_us(ts) + 1800000000, -1 FROM events),
        |r AS (SELECT user_id, sum(delta) OVER (PARTITION BY user_id
        |    ORDER BY t, delta
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open
        |  FROM ep)
        |SELECT user_id, CAST(count(*) // 2 AS BIGINT) AS n_intervals,
        |  CAST(max(open) AS BIGINT) AS max_concurrent
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "st_interval_union" ->
      """WITH iv AS (SELECT user_id, event_id, epoch_us(ts) AS s,
        |    epoch_us(ts) + 1800000000 AS e FROM events),
        |m AS (SELECT user_id, event_id, s, e,
        |    max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        |  FROM iv),
        |isl AS (SELECT user_id, s, e,
        |    sum(CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY s, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS island
        |  FROM m),
        |grp AS (SELECT user_id, island, count(*) AS n_iv,
        |    max(e) - min(s) AS covered
        |  FROM isl GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(n_iv) AS BIGINT) AS n_intervals,
        |  CAST(count(*) AS BIGINT) AS n_islands,
        |  CAST(sum(covered) AS BIGINT) AS covered_us
        |FROM grp GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_did" ->
      // same Knuth top-bit assignment, micro BIGINT cell means
      // (integer div — all positive, so // matches Spark's div), and
      // the identical integer DID (see Analytics.did)
      """WITH c AS (SELECT
        |    ((o_custkey % 2147483648) * 2654435761) % 2147483648
        |      >= 1073741824 AS tr,
        |    o_orderdate >= TIMESTAMP '1998-01-01' AS post,
        |    CAST(round(o_totalprice * 1e6) AS BIGINT) AS micro
        |  FROM orders),
        |cells AS (SELECT tr, post, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(micro) AS BIGINT) AS s FROM c GROUP BY 1, 2),
        |m AS (SELECT tr, post, n, s // n AS mean_micro FROM cells),
        |p AS (SELECT
        |    MAX(CASE WHEN tr AND post THEN mean_micro END) AS m_tp,
        |    MAX(CASE WHEN tr AND NOT post THEN mean_micro END) AS m_t0,
        |    MAX(CASE WHEN NOT tr AND post THEN mean_micro END) AS m_cp,
        |    MAX(CASE WHEN NOT tr AND NOT post THEN mean_micro END)
        |      AS m_c0,
        |    CAST(SUM(CASE WHEN tr THEN n ELSE 0 END) AS BIGINT)
        |      AS n_treat,
        |    CAST(SUM(CASE WHEN NOT tr THEN n ELSE 0 END) AS BIGINT)
        |      AS n_ctrl
        |  FROM m)
        |SELECT n_treat, n_ctrl, m_t0, m_tp, m_c0, m_cp,
        |  (m_tp - m_t0) - (m_cp - m_c0) AS did_micro,
        |  round(CAST((m_tp - m_t0) - (m_cp - m_c0) AS DOUBLE) / 1e6, 6)
        |    AS did
        |FROM p""".stripMargin,
    "st_sprt" ->
      // the identical literal micro-nat weights and bounds; the walk
      // is a pure BIGINT prefix sum on both engines (see
      // Analytics.sprt)
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN "value" >= 50.0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |c AS (SELECT event_type, day, n, x,
        |    CAST(SUM(x * (-133531) + (n - x) * 80043) OVER
        |      (PARTITION BY event_type ORDER BY day) AS BIGINT)
        |      AS llr_micro
        |  FROM daily)
        |SELECT event_type, day, n, x, llr_micro,
        |  CASE WHEN llr_micro >= 2944439 THEN 'accept_h1'
        |    WHEN llr_micro <= -2944439 THEN 'accept_h0'
        |    ELSE 'continue' END AS verdict,
        |  MIN(CASE WHEN abs(llr_micro) >= 2944439 THEN day END) OVER
        |    (PARTITION BY event_type ORDER BY day) AS decided_day
        |FROM c ORDER BY event_type, day""".stripMargin,
    "agg_qte" ->
      // the identical HistSketch bin layout (floor-div 25000, clamp
      // 0..63), per-arm cumulative bin counts, and the integer rank
      // law (p·n + (q−p)) // q — all-positive, so // = Spark's div
      """WITH c AS (SELECT
        |    ((o_custkey % 2147483648) * 2654435761) % 2147483648
        |      >= 1073741824 AS tr,
        |    least(greatest(CAST(floor(o_totalprice / 25000.0) AS INT),
        |      0), 63) AS bin
        |  FROM orders),
        |b AS (SELECT tr, bin, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM c GROUP BY 1, 2),
        |n AS (SELECT tr, CAST(SUM(cnt) AS BIGINT) AS n
        |  FROM b GROUP BY 1),
        |cum AS (SELECT b.tr, b.bin, n.n,
        |    CAST(SUM(b.cnt) OVER (PARTITION BY b.tr ORDER BY b.bin)
        |      AS BIGINT) AS cum
        |  FROM b JOIN n ON b.tr = n.tr),
        |q AS (SELECT tr, n,
        |    (MIN(CASE WHEN cum >= (1 * n + 3) // 4 THEN bin END) + 1)
        |      * CAST(25000.0 AS DOUBLE) AS q25,
        |    (MIN(CASE WHEN cum >= (1 * n + 1) // 2 THEN bin END) + 1)
        |      * CAST(25000.0 AS DOUBLE) AS q50,
        |    (MIN(CASE WHEN cum >= (3 * n + 1) // 4 THEN bin END) + 1)
        |      * CAST(25000.0 AS DOUBLE) AS q75
        |  FROM cum GROUP BY 1, 2),
        |p AS (SELECT
        |    MAX(CASE WHEN tr THEN n END) AS n_treat,
        |    MAX(CASE WHEN NOT tr THEN n END) AS n_ctrl,
        |    MAX(CASE WHEN tr THEN q25 END) AS t25,
        |    MAX(CASE WHEN tr THEN q50 END) AS t50,
        |    MAX(CASE WHEN tr THEN q75 END) AS t75,
        |    MAX(CASE WHEN NOT tr THEN q25 END) AS c25,
        |    MAX(CASE WHEN NOT tr THEN q50 END) AS c50,
        |    MAX(CASE WHEN NOT tr THEN q75 END) AS c75
        |  FROM q)
        |SELECT u.quantile, p.n_treat, p.n_ctrl, u.q_treat, u.q_ctrl,
        |  u.q_treat - u.q_ctrl AS qte
        |FROM p, (SELECT 'p25' AS quantile, t25 AS q_treat,
        |    c25 AS q_ctrl FROM p
        |  UNION ALL SELECT 'p50', t50, c50 FROM p
        |  UNION ALL SELECT 'p75', t75, c75 FROM p) u
        |ORDER BY u.quantile""".stripMargin,
    "agg_winsorized" ->
      // one merged histogram, [p5, p95] upper-bin-edge thresholds,
      // micro BIGINT clamp and integer-div arm means (see
      // Analytics.winsorized)
      """WITH h AS (SELECT
        |    least(greatest(CAST(floor(o_totalprice / 25000.0) AS INT),
        |      0), 63) AS bin
        |  FROM orders),
        |b AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM h GROUP BY 1),
        |nn AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM b),
        |cum AS (SELECT bin, n,
        |    CAST(SUM(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum
        |  FROM b, nn),
        |th AS (SELECT
        |    CAST((MIN(CASE WHEN cum >= (1 * n + 19) // 20
        |      THEN bin END) + 1) * 25000.0 * 1e6 AS BIGINT) AS lo_micro,
        |    CAST((MIN(CASE WHEN cum >= (19 * n + 1) // 20
        |      THEN bin END) + 1) * 25000.0 * 1e6 AS BIGINT) AS hi_micro
        |  FROM cum GROUP BY n),
        |r AS (SELECT
        |    ((o_custkey % 2147483648) * 2654435761) % 2147483648
        |      >= 1073741824 AS tr,
        |    CAST(round(o_totalprice * 1e6) AS BIGINT) AS micro,
        |    th.lo_micro, th.hi_micro
        |  FROM orders, th),
        |g AS (SELECT lo_micro, hi_micro,
        |    CAST(SUM(CASE WHEN tr THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_treat,
        |    CAST(SUM(CASE WHEN NOT tr THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_ctrl,
        |    CAST(SUM(CASE WHEN micro < lo_micro THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_clip_lo,
        |    CAST(SUM(CASE WHEN micro > hi_micro THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_clip_hi,
        |    CAST(SUM(CASE WHEN tr THEN
        |      least(greatest(micro, lo_micro), hi_micro) ELSE 0 END)
        |      AS BIGINT) AS s_t,
        |    CAST(SUM(CASE WHEN NOT tr THEN
        |      least(greatest(micro, lo_micro), hi_micro) ELSE 0 END)
        |      AS BIGINT) AS s_c
        |  FROM r GROUP BY 1, 2)
        |SELECT lo_micro, hi_micro, n_treat, n_ctrl, n_clip_lo,
        |  n_clip_hi, s_t // n_treat AS mean_treat_micro,
        |  s_c // n_ctrl AS mean_ctrl_micro,
        |  s_t // n_treat - s_c // n_ctrl AS effect_micro
        |FROM g""".stripMargin,
    "agg_power_mde" ->
      // exact BIGINT moments, HUGEINT variance numerator (int64
      // wraps at n ≈ 5.4e6 per type) with the VARCHAR hop for its
      // double conversion; the z-sum 1.959964 + 0.841621 is the same
      // precomputed literal 2.801585; sqrt inputs are identical
      // rounded doubles on both engines (see Analytics.powerMde).
      // var_num is emitted as VARCHAR on BOTH sides: HUGEINT vs
      // Spark's DECIMAL(38,0) are value-equal but canonicalize
      // differently in Arrow export — the round-12 driver hash fail
      """WITH e AS (SELECT event_type,
        |    ((user_id % 2147483648) * 2654435761) % 100 < 50 AS tr,
        |    CAST(round("value") AS BIGINT) AS x FROM events),
        |m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN tr THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_treat,
        |    CAST(SUM(x) AS BIGINT) AS sx,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx
        |  FROM e GROUP BY 1)
        |SELECT event_type, n, n_treat, n - n_treat AS n_ctrl,
        |  CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
        |    AS VARCHAR) AS var_num,
        |  round(CAST(CAST(CAST(n AS HUGEINT) * sxx -
        |      CAST(sx AS HUGEINT) * sx AS VARCHAR) AS DOUBLE) /
        |    (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)), 6) AS s2,
        |  round(2.801585 * sqrt(round(CAST(CAST(CAST(n AS HUGEINT) *
        |      sxx - CAST(sx AS HUGEINT) * sx AS VARCHAR) AS DOUBLE) /
        |    (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)), 6)) *
        |    sqrt(2.0 / CAST(least(n_treat, n - n_treat) AS DOUBLE)), 6)
        |    AS mde
        |FROM m ORDER BY event_type""".stripMargin,
    "p_neyman_alloc" ->
      // exact per-stratum moments (HUGEINT variance numerator — the
      // int64 twin wraps at n_h ≈ 9.6e6 per stratum), isqrt σ, floor
      // allocation and largest-remainder top-up ranked by a
      // constant-size self join (see Pipelines.neymanAlloc; all
      // divisors clamped, all operands of // non-negative)
      """WITH s AS (SELECT c_mktsegment AS segment,
        |    CAST(round(c_acctbal) AS BIGINT) AS x FROM customer),
        |m AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    CAST(SUM(x) AS BIGINT) AS sx,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx
        |  FROM s GROUP BY 1),
        |sd AS (SELECT segment, n_rows,
        |    CAST(floor(sqrt(CAST((CAST(n_rows AS HUGEINT) * sxx -
        |      CAST(sx AS HUGEINT) * sx) //
        |      greatest(CAST(n_rows AS HUGEINT) * (n_rows - 1), 1)
        |      AS DOUBLE)))
        |      AS BIGINT) AS sd_est
        |  FROM m),
        |w AS (SELECT segment, n_rows, sd_est,
        |    n_rows * sd_est AS w FROM sd),
        |t AS (SELECT greatest(CAST(SUM(w) AS BIGINT), 1) AS sum_w
        |  FROM w),
        |base AS (SELECT segment, n_rows, sd_est, w,
        |    (1000 * w) // sum_w AS alloc_floor,
        |    (1000 * w) % sum_w AS rem
        |  FROM w, t),
        |l AS (SELECT 1000 - CAST(SUM(alloc_floor) AS BIGINT)
        |    AS leftover FROM base),
        |rk AS (SELECT b.segment, b.n_rows, b.sd_est, b.w,
        |    b.alloc_floor, b.rem, CAST(COUNT(r.segment) AS BIGINT)
        |      AS rk
        |  FROM base b LEFT JOIN base r ON r.rem > b.rem OR
        |    (r.rem = b.rem AND r.segment < b.segment)
        |  GROUP BY 1, 2, 3, 4, 5, 6)
        |SELECT segment, n_rows, sd_est, w, alloc_floor, rem, rk,
        |  alloc_floor + CASE WHEN rk < l.leftover THEN 1 ELSE 0 END
        |    AS n_alloc
        |FROM rk, l ORDER BY segment""".stripMargin,
    "p_psm" ->
      // same caliper bucket join and (dist, control_id) 1-NN total
      // order; att_micro AND both bkt expressions emulate Spark's
      // toward-zero div on possibly-negative operands (x, xt >= 0 on
      // this fixture, but a negative pre-period sum would otherwise
      // silently shift the caliper candidate sets: // floors, div
      // truncates) (see Pipelines.psm)
      """WITH per AS (SELECT user_id,
        |    CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
        |      THEN CAST(round("value") AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
        |      THEN CAST(round("value") AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |pt AS (SELECT user_id, x, y,
        |    ((user_id % 2147483648) * 2654435761) % 100 < 50 AS tr
        |  FROM per),
        |t AS (SELECT user_id AS t_user, x AS xt, y AS yt FROM pt
        |  WHERE tr),
        |c AS (SELECT user_id AS c_user, x AS xc, y AS yc,
        |    CASE WHEN x < 0 THEN -((-x) // 50) ELSE x // 50 END
        |      AS bkt FROM pt WHERE NOT tr),
        |cand AS (SELECT t_user, xt, yt,
        |    (CASE WHEN xt < 0 THEN -((-xt) // 50) ELSE xt // 50 END)
        |      + off AS bkt
        |  FROM t, (SELECT unnest([-1, 0, 1]) AS off) o),
        |j AS (SELECT cd.t_user, cd.xt, cd.yt, c.c_user, c.xc, c.yc,
        |    abs(c.xc - cd.xt) AS d
        |  FROM cand cd JOIN c ON c.bkt = cd.bkt
        |  WHERE abs(c.xc - cd.xt) <= 50),
        |mm AS (SELECT t_user, yt, yc, d,
        |    ROW_NUMBER() OVER (PARTITION BY t_user
        |      ORDER BY d, c_user) AS rn FROM j),
        |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_matched,
        |    CAST(SUM(yt - yc) AS BIGINT) AS sum_dy,
        |    CAST(SUM(d) AS BIGINT) AS sum_dist
        |  FROM mm WHERE rn = 1),
        |nv AS (SELECT
        |    CAST(SUM(CASE WHEN tr THEN y ELSE 0 END) AS BIGINT)
        |      AS sy_t,
        |    CAST(SUM(CASE WHEN tr THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_t,
        |    CAST(SUM(CASE WHEN NOT tr THEN y ELSE 0 END) AS BIGINT)
        |      AS sy_c,
        |    CAST(SUM(CASE WHEN NOT tr THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_c
        |  FROM pt)
        |SELECT n_t AS n_treat, n_c AS n_ctrl, n_matched,
        |  (n_matched * 1000000) // n_t AS match_rate_ppm, sum_dist,
        |  CASE WHEN sum_dy < 0
        |    THEN -((-sum_dy * 1000000) // greatest(n_matched, 1))
        |    ELSE (sum_dy * 1000000) // greatest(n_matched, 1) END
        |    AS att_micro,
        |  round(CAST(sum_dy AS DOUBLE) /
        |    CAST(greatest(n_matched, 1) AS DOUBLE), 6) AS att,
        |  round(CAST(sy_t AS DOUBLE) / CAST(n_t AS DOUBLE) -
        |    CAST(sy_c AS DOUBLE) / CAST(n_c AS DOUBLE), 6)
        |    AS naive_diff
        |FROM agg, nv""".stripMargin,
    "st_group_seq" ->
      // identical literal boundaries and the same fixed double chain
      // over exact cumulative BIGINTs (see Analytics.groupSeq)
      """WITH looks AS (SELECT event_type,
        |    least(CAST((date_part('day', ts) - 1) // 6 AS BIGINT)
        |      + 1, 5) AS look,
        |    CASE WHEN "value" >= 50.0 THEN 1 ELSE 0 END AS r
        |  FROM events),
        |g AS (SELECT event_type, look, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(r) AS BIGINT) AS x FROM looks GROUP BY 1, 2),
        |c AS (SELECT event_type, look, n, x,
        |    CAST(SUM(n) OVER w AS BIGINT) AS cum_n,
        |    CAST(SUM(x) OVER w AS BIGINT) AS cum_x
        |  FROM g WINDOW w AS (PARTITION BY event_type ORDER BY look)),
        |z AS (SELECT event_type, look, n, x, cum_n, cum_x,
        |    round((CAST(cum_x * 1000000 - 370000 * cum_n AS DOUBLE)
        |      / 1e6) / sqrt(CAST(cum_n AS DOUBLE) * 0.2331), 6) AS z,
        |    CAST(CASE look WHEN 1 THEN 4.562 WHEN 2 THEN 3.226
        |      WHEN 3 THEN 2.634 WHEN 4 THEN 2.281 ELSE 2.040 END
        |      AS DOUBLE) AS z_bound
        |  FROM c)
        |SELECT event_type, look, n, x, cum_n, cum_x, z, z_bound,
        |  abs(z) >= z_bound AS crossed,
        |  MIN(CASE WHEN abs(z) >= z_bound THEN look END) OVER
        |    (PARTITION BY event_type ORDER BY look) AS decided_look
        |FROM z ORDER BY event_type, look""".stripMargin,
  )
}
