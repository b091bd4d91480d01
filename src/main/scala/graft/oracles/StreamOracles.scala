package graft.oracles

import graft.oracles.Gen._

/** DuckDB oracle SQL for the structured-streaming analog queries (generator replays) —
  * one entry per SparkEntry.queries key in this family. Moved out
  * of SparkEntry mechanically (round-10 verdict ask #7); the text
  * of every entry is unchanged.
  */
private[graft] object StreamOracles {
  val sql: Map[String, String] = Map(
    "stream_feed_daily" ->
      // DuckDB replay of the deterministic feed generator
      // (FeedSource.tsOf/kindOf/amountOf) + the daily rollup the
      // stream materializes
      """WITH feed AS (
        |  SELECT range AS id,
        |    TIMESTAMP '2024-01-01 00:00:00' + range * INTERVAL 1 MINUTE
        |      AS ts,
        |    CASE WHEN range % 3 = 0 THEN 'credit' ELSE 'debit' END AS kind,
        |    CAST((range * 2654435761) % 100000 AS DOUBLE) / 100.0 AS amount
        |  FROM range(5000))
        |SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(CAST(SUM(CAST(amount AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        |    AS total_amount,
        |  CAST(SUM(CASE WHEN kind = 'credit' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_credit
        |FROM feed GROUP BY 1 ORDER BY 1""".stripMargin,
    "stream_dedup_feed" ->
      // the doubled feed deduplicates back to the generator itself
      """SELECT range AS id,
        |  TIMESTAMP '2024-01-01 00:00:00' + range * INTERVAL 1 MINUTE
        |    AS ts,
        |  CASE WHEN range % 3 = 0 THEN 'credit' ELSE 'debit' END AS kind,
        |  CAST((range * 2654435761) % 100000 AS DOUBLE) / 100.0 AS amount
        |FROM range(5000) ORDER BY id""".stripMargin,
    "stream_pit_enrich" ->
      // ts(id) = base + id minutes ⇒ the interval match reduces to
      // id div 1000; rate and revenue re-derived in exact BIGINTs
      """WITH feed AS (SELECT range AS id,
        |    CASE WHEN range % 3 = 0 THEN 'credit' ELSE 'debit' END AS kind,
        |    (range * 2654435761) % 100000 AS cents,
        |    range // 1000 AS rate_version
        |  FROM range(5000))
        |SELECT kind, CAST(rate_version AS BIGINT) AS rate_version,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(SUM(cents * (100 + 7 * rate_version)) AS BIGINT)
        |    AS revenue_cents
        |FROM feed GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_ewma" ->
      // the identical id-ordered acc/2 + x fold over the generator:
      // every step is an exponent decrement plus an add, so the level
      // is bit-identical (see RunningEwmaProcessor / ewmaDaily)
      """WITH feed AS (
        |  SELECT range AS id,
        |    CASE WHEN range % 3 = 0 THEN 'credit' ELSE 'debit' END AS kind,
        |    CAST((range * 2654435761) % 100000 AS DOUBLE) AS cents
        |  FROM range(5000)),
        |fr AS (SELECT kind, list(cents ORDER BY id) AS xs
        |       FROM feed GROUP BY 1)
        |SELECT kind, list_reduce(list_prepend(0.0, xs),
        |  (acc, x) -> acc / 2 + x) AS ewma
        |FROM fr ORDER BY kind""".stripMargin,
    "stream_cusum" ->
      // the recursion S_t = max(0, S_{t-1} + x - 50000) replayed via
      // its closed form S_t = P_t - least(0, min_{i<=t} P_i)
      // (reflection at zero) — two windows, all BIGINT; peak ties
      // keep the first id (rank cusum DESC, id ASC = the fold's
      // strict >)
      """WITH feed AS (
        |  SELECT range AS id,
        |    CASE WHEN range % 3 = 0 THEN 'credit' ELSE 'debit' END AS kind,
        |    (range * 2654435761) % 100000 AS x
        |  FROM range(5000)),
        |w AS (SELECT kind, id,
        |    SUM(x - 50000) OVER (PARTITION BY kind ORDER BY id) AS p
        |  FROM feed),
        |s AS (SELECT kind, id,
        |    p - least(0, MIN(p) OVER (PARTITION BY kind ORDER BY id))
        |      AS cusum
        |  FROM w),
        |r AS (SELECT kind, id, cusum,
        |    ROW_NUMBER() OVER (PARTITION BY kind
        |      ORDER BY cusum DESC, id) AS rk,
        |    ROW_NUMBER() OVER (PARTITION BY kind ORDER BY id DESC)
        |      AS rlast
        |  FROM s)
        |SELECT kind, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(MAX(CASE WHEN rlast = 1 THEN cusum END) AS BIGINT)
        |    AS cusum,
        |  CAST(MAX(CASE WHEN rk = 1 THEN cusum END) AS BIGINT)
        |    AS cusum_peak,
        |  CAST(MAX(CASE WHEN rk = 1 THEN id END) AS BIGINT) AS peak_id
        |FROM r GROUP BY kind ORDER BY kind""".stripMargin,
    "stream_concurrency" ->
      // generator replay: open(i) = |{j : t_j ≤ t_i < t_j + len_j}|
      // per kind (relative micros — the epoch constant cancels in
      // every comparison); final = intervals outliving the last event
      """WITH feed AS (
        |  SELECT range AS id,
        |    CASE WHEN range % 3 = 0 THEN 'credit' ELSE 'debit' END
        |      AS kind,
        |    range * 60000000 AS t,
        |    (1 + (range * 2654435761) % 30) * 60000000 AS len
        |  FROM range(5000)),
        |o AS (SELECT i.kind, i.id, count(*) AS open
        |  FROM feed i JOIN feed j ON j.kind = i.kind
        |    AND j.t <= i.t AND i.t < j.t + j.len
        |  GROUP BY 1, 2),
        |mx AS (SELECT kind, max(t) AS tl FROM feed GROUP BY 1),
        |fin AS (SELECT f.kind,
        |    CAST(sum(CASE WHEN f.t + f.len > mx.tl THEN 1 ELSE 0 END)
        |      AS BIGINT) AS open_final
        |  FROM feed f JOIN mx ON f.kind = mx.kind GROUP BY 1)
        |SELECT o.kind, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(max(open) AS BIGINT) AS max_open, fin.open_final
        |FROM o JOIN fin ON o.kind = fin.kind
        |GROUP BY o.kind, fin.open_final ORDER BY o.kind""".stripMargin,
    "stream_sliding_distinct" ->
      // generator replay: the retained window set (day > max − 7 per
      // kind) and each day's trailing-7 exact windowed distinct
      """WITH feed AS (
        |  SELECT range AS id,
        |    CASE WHEN range % 3 = 0 THEN 'credit' ELSE 'debit' END AS kind,
        |    CAST(range // 500 AS INT) AS day,
        |    (range * 2654435761) % 100000 % 101 AS user_id
        |  FROM range(5000)),
        |mx AS (SELECT kind, MAX(day) AS maxd FROM feed GROUP BY 1),
        |keep AS (SELECT DISTINCT f.kind, f.day FROM feed f
        |  JOIN mx USING (kind) WHERE f.day > maxd - 7)
        |SELECT k.kind, k.day,
        |  CAST(COUNT(DISTINCT f.user_id) AS BIGINT) AS n_users_7d
        |FROM keep k JOIN feed f ON f.kind = k.kind
        |  AND f.day > k.day - 7 AND f.day <= k.day
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_distinct_running" ->
      // generator replay + plain COUNT(DISTINCT): the streaming KMV
      // runs in its exact sub-k regime (101-user domain, k=1024)
      """WITH feed AS (
        |  SELECT range AS id,
        |    CASE WHEN range % 3 = 0 THEN 'credit' ELSE 'debit' END AS kind,
        |    (range * 2654435761) % 100000 % 101 AS user_id
        |  FROM range(5000))
        |SELECT kind, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM feed GROUP BY 1 ORDER BY 1""".stripMargin,
    "stream_mixture_drift" ->
      // generator replay: the id-bucket domains, integer share ppm,
      // drift vs the uniform 333333 target, alarm at 50000 ppm
      """WITH feed AS (SELECT range AS id,
        |    CASE WHEN range % 10 < 5 THEN 'head'
        |         WHEN range % 10 < 8 THEN 'mid'
        |         ELSE 'tail' END AS domain
        |  FROM range(5000)),
        |c AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_seen
        |  FROM feed GROUP BY 1),
        |t AS (SELECT CAST(sum(n_seen) AS BIGINT) AS n_total FROM c)
        |SELECT domain, n_seen, n_total,
        |  CAST(1000000 * n_seen // n_total AS BIGINT) AS share_ppm,
        |  CAST(333333 AS BIGINT) AS target_ppm,
        |  CAST(abs(1000000 * n_seen // n_total - 333333) AS BIGINT)
        |    AS drift_ppm,
        |  CAST(abs(1000000 * n_seen // n_total - 333333) > 50000
        |    AS INT) AS alarm
        |FROM c, t ORDER BY domain""".stripMargin,
    "stream_weighted_sample" ->
      // generator replay + the same A-ES keys re-derived + a rank
      // window: the streaming reservoir's full-stream drain must
      // equal the batch weighted sample exactly (see
      // agg_weighted_sample for the hash-exactness argument)
      """WITH feed AS (
        |  SELECT range AS id,
        |    CASE WHEN range % 3 = 0 THEN 'credit' ELSE 'debit' END AS kind,
        |    greatest(CAST((range * 2654435761) % 100000 AS DOUBLE) / 100.0,
        |      1e-6) AS w
        |  FROM range(5000)),
        |keyed AS (
        |  SELECT kind, id,
        |    ln((CAST((id * 2654435761) % 4294967296 AS DOUBLE) + 1.0)
        |        / 4294967297.0) / w AS es_key
        |  FROM feed),
        |ranked AS (
        |  SELECT kind, id, row_number() OVER (PARTITION BY kind
        |    ORDER BY es_key DESC, id) AS rk
        |  FROM keyed)
        |SELECT kind, CAST(rk AS BIGINT) AS rk, id
        |FROM ranked WHERE rk <= 20 ORDER BY kind, rk""".stripMargin,
    "stream_heavy_hitters" ->
      // generator replay of the skewed token law; n_heavy_found
      // deliberately re-derives the SAME exact expression as
      // n_heavy_true — MG completeness (every token above the
      // N/(m+1) bar is nominated) makes them equal, so a recall
      // regression hash-mismatches on a replayed number, not a
      // literal. The two bound booleans are deterministic MG laws
      // under the id-ordered fold (oracle: literal true).
      """WITH t AS (
        |  SELECT CASE WHEN range % 3 = 0 THEN 'credit' ELSE 'debit' END
        |      AS kind,
        |    CASE WHEN ((range * 2654435761) % 100000) % 4 <> 0
        |      THEN ((range * 2654435761) % 100000) % 16
        |      ELSE 16 + ((range * 2654435761) % 100000) % 499 END AS tokno
        |  FROM range(5000)),
        |c AS (SELECT kind, tokno, count(*) AS n FROM t GROUP BY 1, 2),
        |tot AS (SELECT kind, CAST(count(*) AS BIGINT) AS n_total
        |  FROM t GROUP BY 1),
        |heavy AS (SELECT c.kind, CAST(count(*) AS BIGINT) AS nh
        |  FROM c JOIN tot USING (kind) WHERE n * 33 > n_total GROUP BY 1)
        |SELECT kind, n_total,
        |  COALESCE(nh, 0) AS n_heavy_true,
        |  COALESCE(nh, 0) AS n_heavy_found,
        |  TRUE AS est_bounds_ok, TRUE AS candidates_bounded
        |FROM tot LEFT JOIN heavy USING (kind) ORDER BY kind""".stripMargin,
    "stream_quantiles" ->
      // the ESTIMATES replay, not just bounds: the sketch read-off is
      // the upper edge of the exact rank element's 400-cent bin (the
      // bin-edge identity), with the same rank law as the batch
      // quantile rollup in integer form — rank(p/q) = (p*n + (q-p)) // q
      """WITH f AS (
        |  SELECT CASE WHEN range % 3 = 0 THEN 'credit' ELSE 'debit' END
        |      AS kind,
        |    (range * 2654435761) % 100000 AS v
        |  FROM range(5000)),
        |r AS (SELECT kind, v,
        |    row_number() OVER (PARTITION BY kind ORDER BY v) AS rn,
        |    CAST(count(*) OVER (PARTITION BY kind) AS BIGINT) AS n
        |  FROM f),
        |sel AS (SELECT kind, n,
        |    MAX(CASE WHEN rn = (n + 1) // 2
        |      THEN v END) AS v50,
        |    MAX(CASE WHEN rn = (19 * n + 1) // 20
        |      THEN v END) AS v95
        |  FROM r GROUP BY kind, n)
        |SELECT kind, n AS n_events,
        |  (LEAST(v50 // 400, 255) + 1) * 400 AS p50_est_cents,
        |  (LEAST(v95 // 400, 255) + 1) * 400 AS p95_est_cents
        |FROM sel ORDER BY kind""".stripMargin,
    "stream_versioned_ingest" ->
      // exactly-once proof: every generated row lands in exactly one
      // committed version, so the all-versions rollup equals the
      // plain generator replay
      """WITH feed AS (
        |  SELECT CASE WHEN range % 3 = 0 THEN 'credit' ELSE 'debit' END
        |      AS kind,
        |    CAST((range * 2654435761) % 100000 AS DOUBLE) / 100.0
        |      AS amount
        |  FROM range(3000))
        |SELECT kind, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(CAST(SUM(CAST(amount AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        |    AS total_amount
        |FROM feed GROUP BY 1 ORDER BY 1""".stripMargin,
    "stream_sessionize" ->
      // generator replay + gaps-and-islands sessionization + the
      // final-watermark cutoff append mode imposes: the feed's max ts
      // is 2024-01-04 11:19 (id 4999), the watermark delay 1 hour, so
      // sessions ending after 2024-01-04 10:19 are still open when
      // the drain terminates and must NOT appear. A new session
      // starts when the gap is >= 2 hours (Spark's session window is
      // [start, last + gap) — an event AT the boundary starts anew);
      // session_end = last event + gap, as in adv_session_window.
      """WITH feed AS (
        |  SELECT range AS id,
        |    TIMESTAMP '2024-01-01 00:00:00' + range * INTERVAL 1 MINUTE
        |      AS ts,
        |    (range * 2654435761) % 100000 % 101 AS user_id,
        |    CAST((range * 2654435761) % 100000 AS DOUBLE) / 100.0
        |      AS amount
        |  FROM range(5000)),
        |marked AS (
        |  SELECT *, CASE WHEN
        |      LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |      OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |        >= INTERVAL 2 HOUR
        |    THEN 1 ELSE 0 END AS new_sess
        |  FROM feed),
        |sessions AS (
        |  SELECT *, SUM(new_sess)
        |    OVER (PARTITION BY user_id ORDER BY ts) AS sid
        |  FROM marked)
        |SELECT user_id, MIN(ts) AS session_start,
        |  MAX(ts) + INTERVAL 2 HOUR AS session_end,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(CAST(SUM(CAST(amount AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        |    AS session_amount
        |FROM sessions GROUP BY user_id, sid
        |HAVING MAX(ts) + INTERVAL 2 HOUR <= TIMESTAMP '2024-01-04 10:19:00'
        |ORDER BY user_id, session_start""".stripMargin,
    "stream_dedup_history" ->
      // generator replay: history = ids ≡ 3 (mod 7), admitted = rest
      """WITH feed AS (SELECT range AS id,
        |    CASE WHEN range % 3 = 0 THEN 'credit' ELSE 'debit' END
        |      AS kind,
        |    (range * 2654435761) % 100000 AS cents
        |  FROM range(5000))
        |SELECT kind, CAST(count(*) AS BIGINT) AS n_admitted,
        |  CAST(sum(cents) AS BIGINT) AS cents_admitted,
        |  CAST(max(id) AS BIGINT) AS max_id
        |FROM feed WHERE id % 7 <> 3 GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
