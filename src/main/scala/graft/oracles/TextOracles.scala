package graft.oracles

import graft.oracles.Gen._

/** DuckDB oracle SQL for the text-analysis / tokenizer / retrieval queries —
  * one entry per SparkEntry.queries key in this family. Moved out
  * of SparkEntry mechanically (round-10 verdict ask #7); the text
  * of every entry is unchanged.
  */
private[graft] object TextOracles {
  val sql: Map[String, String] = Map(
    "text_bpe_train" -> bpeOracle(8),
    "text_train_classifier" -> logregOracle(3),
    "text_classifier_score" -> logregScoreOracle(3),
    "text_calibration_ece" -> calibrationOracle(3),
    "p_active_learning_margin" -> marginOracle(3, 20),
    "text_classifier_auc" -> aucOracle(3),
    "p_conformal_threshold" -> conformalOracle(3),
    "p_label_noise" -> labelNoiseOracle(3),
    "agg_ips_value" -> ipsOracle,
    "agg_dr_value" -> drOracle,
    "p_bradley_terry" -> btOracle(3),
    "p_prior_shift" -> priorShiftOracle(3),
    "text_bpe_apply" -> bpeApplyOracle(8),
    "text_wordpiece_apply" -> wordpieceOracle(8),
    "text_unigram_lm" ->
      // corpus totals replay from the same tokenization; the booleans
      // are deterministic model laws (segmentation-is-a-partition,
      // fertility within [words, chars], vocab bound + char coverage,
      // hard-EM objective monotone) — oracle: literal true
      """WITH w AS (SELECT unnest(string_split_regex(trim(lower(text)),
        |    '\s+')) AS word FROM documents),
        |f AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM w
        |  WHERE word <> '' GROUP BY 1)
        |SELECT CAST(sum(n) AS BIGINT) AS n_words,
        |  CAST(count(*) AS BIGINT) AS n_distinct_words,
        |  CAST(sum(len(word) * n) AS BIGINT) AS n_chars,
        |  TRUE AS all_words_reconstruct, TRUE AS fertility_in_range,
        |  TRUE AS vocab_at_target, TRUE AS em_ll_monotone
        |FROM f""".stripMargin,
    "text_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(string_split_regex(trim(lower(text)),
        |    '\s+')) AS token
        |  FROM documents),
        |cnt AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n
        |        FROM toks GROUP BY token),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM toks)
        |SELECT token, n, CAST(n * 65 > n_total AS INT) AS guaranteed
        |FROM cnt, tot ORDER BY n DESC, token LIMIT 10""".stripMargin,
    "text_winnow" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        | true AS density_in_corridor, true AS long_docs_fingerprinted
        |FROM documents""".stripMargin,
    "text_compression_ratio" ->
      s"""SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
         | CAST(count(*) AS BIGINT) AS n_true_pairs,
         | true AS range_ok, true AS neardup_ratio_close,
         | true AS flag_consistent
         |FROM ($ngramPairSql) t""".stripMargin,
    "text_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS w,
        |    unnest(generate_series(1,
        |      len(string_split_regex(trim(lower(text)), '\s+')))) AS i
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    w || ' ' || lead(w,1) OVER win || ' ' || lead(w,2) OVER win
        |      || ' ' || lead(w,3) OVER win || ' ' || lead(w,4) OVER win
        |      || ' ' || lead(w,5) OVER win || ' ' || lead(w,6) OVER win
        |      || ' ' || lead(w,7) OVER win AS s
        |  FROM toks WINDOW win AS (PARTITION BY doc_id ORDER BY i)
        |  QUALIFY lead(w,7) OVER win IS NOT NULL),
        |bench AS (SELECT doc_id AS bench_doc, s FROM sh
        |          WHERE doc_id % 25 = 0),
        |train AS (SELECT doc_id, s FROM sh WHERE doc_id % 25 <> 0)
        |SELECT t.doc_id,
        |  CAST(COUNT(DISTINCT t.s) AS BIGINT) AS n_shared_ngrams,
        |  CAST(COUNT(DISTINCT b.bench_doc) AS BIGINT) AS n_bench_docs
        |FROM train t JOIN bench b ON t.s = b.s
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_dup_coverage" ->
      // same distinct (doc, 8-gram) space joined verbatim on the
      // shingle string; coverage via the declared div-ppm law
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS ts
        |  FROM documents),
        |sg AS (SELECT DISTINCT doc_id,
        |    array_to_string(ts[i : i + 7], ' ') AS sh
        |  FROM (SELECT doc_id, ts,
        |          unnest(generate_series(1, len(ts) - 7)) AS i
        |        FROM t WHERE len(ts) >= 8)),
        |df AS (SELECT sh, CAST(COUNT(*) AS BIGINT) AS df
        |  FROM sg GROUP BY 1)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
        |  CAST(COUNT(*) FILTER (df > 1) AS BIGINT) AS n_dup,
        |  CAST(COUNT(*) FILTER (df > 1) * 1000000 // COUNT(*)
        |    AS BIGINT) AS dup_ppm
        |FROM sg JOIN df USING (sh)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_phrase_search" ->
      // independent path: direct 3-window slide over each document's
      // token array — proves the index probe equals a corpus scan
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS ts
        |  FROM documents),
        |tri AS (SELECT doc_id, array_to_string(ts[i : i + 2], ' ')
        |      AS phrase
        |  FROM (SELECT doc_id, ts,
        |          unnest(generate_series(1, len(ts) - 2)) AS i
        |        FROM t WHERE len(ts) >= 3)),
        |top AS (SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occ,
        |    CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        |  FROM tri GROUP BY 1 ORDER BY n_occ DESC, phrase LIMIT 10)
        |SELECT phrase, n_occ, n_docs FROM top
        |ORDER BY n_occ DESC, phrase""".stripMargin,
    "text_oov_rate" ->
      // same tokenizer, same (count desc, token) vocab cut, same
      // div-ppm law
      """WITH tf AS (SELECT doc_id, tok AS token,
        |    CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id,
        |      unnest(string_split_regex(trim(lower(text)), '\s+'))
        |        AS tok
        |    FROM documents) GROUP BY 1, 2),
        |vocab AS (SELECT token FROM (
        |    SELECT token, SUM(tf) AS cnt FROM tf GROUP BY 1
        |    ORDER BY cnt DESC, token LIMIT 16))
        |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CASE WHEN v.token IS NULL THEN tf ELSE 0 END)
        |    AS BIGINT) AS n_oov,
        |  CAST(SUM(CASE WHEN v.token IS NULL THEN tf ELSE 0 END)
        |    * 1000000 // SUM(tf) AS BIGINT) AS oov_ppm
        |FROM tf LEFT JOIN vocab v ON tf.token = v.token
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_dup_spans" ->
      // same positional shingles, cross-doc df, islands merge
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS ts
        |  FROM documents),
        |sg AS (SELECT doc_id, i AS pos,
        |    array_to_string(ts[i : i + 7], ' ') AS sh
        |  FROM (SELECT doc_id, ts,
        |          unnest(generate_series(1, len(ts) - 7)) AS i
        |        FROM t WHERE len(ts) >= 8)),
        |df AS (SELECT sh, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        |  FROM sg GROUP BY 1),
        |dup AS (SELECT doc_id, pos FROM sg JOIN df USING (sh)
        |  WHERE df.df > 1),
        |g AS (SELECT doc_id, pos,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
        |      AS grp
        |  FROM dup)
        |SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
        |  CAST(MAX(pos) + 7 AS BIGINT) AS span_end,
        |  CAST(MAX(pos) + 7 - MIN(pos) + 1 AS BIGINT) AS span_tokens
        |FROM g GROUP BY doc_id, grp
        |ORDER BY doc_id, span_start""".stripMargin,
    "text_diversity" ->
      // same pooled term frequencies; both div-ppm laws replayed
      """WITH tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id,
        |      unnest(string_split_regex(trim(lower(text)), '\s+'))
        |        AS tok
        |    FROM documents) GROUP BY 1, 2)
        |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(*) AS BIGINT) AS n_types,
        |  CAST(SUM(tf * tf) AS BIGINT) AS sum_c2,
        |  CAST((SUM(tf) * SUM(tf) - SUM(tf * tf)) * 1000000
        |    // (SUM(tf) * SUM(tf)) AS BIGINT) AS simpson_ppm,
        |  CAST(COUNT(*) * 1000000 // SUM(tf) AS BIGINT) AS ttr_ppm
        |FROM tf GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
        |       FROM toks GROUP BY 1, 2),
        |dfreq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df
        |          FROM tf GROUP BY 1),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
        |    CAST(tf.tf AS DOUBLE) * n.n_docs / dfreq.df AS tfidf
        |  FROM tf JOIN dfreq USING (token) CROSS JOIN n)
        |SELECT doc_id, CAST(rank AS INT) AS rank, token, tf, df, tfidf
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |        ORDER BY tfidf DESC, token) AS rank FROM scored)
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "text_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
        |       FROM toks GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl
        |       FROM tf GROUP BY 1),
        |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |              CAST(SUM(dl) AS BIGINT) AS total_len FROM dl),
        |q(query_id, token) AS (VALUES
        |  ('q1', 'hash'), ('q1', 'join'),
        |  ('q2', 'vector'), ('q2', 'scan'), ('q2', 'filter'),
        |  ('q3', 'spark'), ('q3', 'stream')),
        |dfq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf
        |        WHERE token IN (SELECT token FROM q) GROUP BY 1),
        |sc AS (SELECT q.query_id, tf.doc_id,
        |    CAST(round(((st.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
        |      * (tf.tf * 2.2)
        |      / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
        |          / (CAST(st.total_len AS DOUBLE) / st.n_docs)))
        |      * 1e6) AS BIGINT) AS s
        |  FROM tf JOIN q USING (token) JOIN dfq USING (token)
        |    JOIN dl USING (doc_id) CROSS JOIN st),
        |agg AS (SELECT query_id, doc_id, SUM(s) AS ssum
        |        FROM sc GROUP BY 1, 2)
        |SELECT query_id, CAST(rank AS INT) AS rank, doc_id,
        |  ssum / 1e6 AS score
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |        ORDER BY ssum DESC, doc_id) AS rank FROM agg)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "text_lm_score" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS w,
        |    unnest(generate_series(1,
        |      len(string_split_regex(trim(lower(text)), '\s+')))) AS i
        |  FROM documents),
        |bg AS (SELECT doc_id, w AS w1,
        |         lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2
        |       FROM toks),
        |b AS (SELECT doc_id, w1, w2 FROM bg WHERE w2 IS NOT NULL),
        |c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
        |       FROM b GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1
        |       FROM b GROUP BY 1),
        |sc AS (SELECT b.doc_id,
        |    CAST(round((CAST(c2.c2 AS DOUBLE) / c1.c1) * 1e6) AS BIGINT)
        |      AS s
        |  FROM b JOIN c2 USING (w1, w2) JOIN c1 USING (w1))
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  SUM(s) / (COUNT(*) * 1e6) AS avg_p
        |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_ppl_buckets" ->
      // lmScore's exact rational mean, a rank window on it (desc,
      // doc_id tie-break — the same doubles both engines derive from
      // exact integers), and the integer tercile law
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS w,
        |    unnest(generate_series(1,
        |      len(string_split_regex(trim(lower(text)), '\s+')))) AS i
        |  FROM documents),
        |bg AS (SELECT doc_id, w AS w1,
        |         lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2
        |       FROM toks),
        |b AS (SELECT doc_id, w1, w2 FROM bg WHERE w2 IS NOT NULL),
        |c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
        |       FROM b GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1
        |       FROM b GROUP BY 1),
        |sc AS (SELECT b.doc_id,
        |    CAST(round((CAST(c2.c2 AS DOUBLE) / c1.c1) * 1e6) AS BIGINT)
        |      AS s
        |  FROM b JOIN c2 USING (w1, w2) JOIN c1 USING (w1)),
        |d AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |    SUM(s) / (COUNT(*) * 1e6) AS avg_p
        |  FROM sc GROUP BY 1),
        |r AS (SELECT doc_id, n_bigrams, avg_p,
        |    CAST(ROW_NUMBER() OVER (ORDER BY avg_p DESC, doc_id)
        |      AS BIGINT) AS lm_rank,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS n
        |  FROM d)
        |SELECT doc_id, n_bigrams, avg_p, lm_rank,
        |  CASE (lm_rank - 1) * 3 // n WHEN 0 THEN 'head'
        |    WHEN 1 THEN 'middle' ELSE 'tail' END AS ppl_bucket
        |FROM r ORDER BY doc_id""".stripMargin,
    "text_token_mixture" ->
      """WITH t AS (SELECT doc_id, source,
        |    CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS INT)
        |      AS n_tokens,
        |    (doc_id * 2654435761) % 1000000007 AS mix,
        |    CASE WHEN source = 'src0' THEN 1200
        |         WHEN source = 'src1' THEN 400 ELSE 800 END AS budget
        |  FROM documents)
        |SELECT doc_id, source, n_tokens,
        |  CAST(cum_tokens AS BIGINT) AS cum_tokens, budget
        |FROM (SELECT *, SUM(n_tokens) OVER (PARTITION BY source
        |        ORDER BY mix ROWS UNBOUNDED PRECEDING) AS cum_tokens
        |      FROM t)
        |WHERE cum_tokens - n_tokens < budget
        |ORDER BY doc_id""".stripMargin,
    "text_quality_filter" ->
      """WITH t AS (SELECT doc_id, source,
        |    CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS INT)
        |      AS n_words,
        |    CAST(len(list_distinct(string_split_regex(trim(lower(text)),
        |      '\s+'))) AS INT) AS n_distinct_words
        |  FROM documents),
        |sc AS (SELECT doc_id, source,
        |    round(0.5 * (n_distinct_words / n_words) +
        |      0.5 * least(n_words / 100.0, 1.0), 4) AS quality_score
        |  FROM t)
        |SELECT doc_id, source, quality_score, q_rank
        |FROM (SELECT *, percent_rank() OVER (PARTITION BY source
        |        ORDER BY quality_score, doc_id) AS q_rank,
        |        COUNT(*) OVER (PARTITION BY source) AS n_src FROM sc)
        |WHERE q_rank >= 0.5 OR n_src = 1
        |ORDER BY doc_id""".stripMargin,
    "text_dsir_resample" ->
      // full replay: bigram models from the tokenized stream, scaled-
      // integer mean-probability sums (n cancels in the ratio), the
      // Knuth-hash A-ES keys, and the identical top-32 draw
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS w,
        |    unnest(generate_series(1,
        |      len(string_split_regex(trim(lower(text)), '\s+')))) AS i
        |  FROM documents),
        |bgr AS (SELECT doc_id, w AS w1,
        |         lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2
        |       FROM toks),
        |b AS (SELECT doc_id, w1, w2 FROM bgr WHERE w2 IS NOT NULL),
        |tb AS (SELECT b.doc_id, b.w1, b.w2 FROM b
        |       JOIN documents d ON b.doc_id = d.doc_id
        |       WHERE d.lang = 'en'),
        |p2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2p
        |       FROM b GROUP BY 1, 2),
        |p1 AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1p
        |       FROM b GROUP BY 1),
        |t2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2t
        |       FROM tb GROUP BY 1, 2),
        |t1 AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1t
        |       FROM tb GROUP BY 1),
        |v AS (SELECT CAST(COUNT(DISTINCT w2) AS BIGINT) AS v_sz FROM b),
        |sums AS (SELECT b.doc_id,
        |    CAST(SUM(CAST(round(CAST(p2.c2p + 1 AS DOUBLE)
        |      / (p1.c1p + v.v_sz) * 1e6) AS BIGINT)) AS BIGINT) AS s_p,
        |    CAST(SUM(CAST(round(CAST(COALESCE(t2.c2t, 0) + 1 AS DOUBLE)
        |      / (COALESCE(t1.c1t, 0) + v.v_sz) * 1e6) AS BIGINT))
        |      AS BIGINT) AS s_t
        |  FROM b JOIN p2 USING (w1, w2) JOIN p1 USING (w1)
        |    LEFT JOIN t2 USING (w1, w2) LEFT JOIN t1 USING (w1)
        |    CROSS JOIN v
        |  GROUP BY 1),
        |w0 AS (SELECT doc_id, s_t, s_p,
        |    CAST(s_t AS DOUBLE) / s_p AS weight FROM sums),
        |w2 AS (SELECT *, weight * weight AS ww2 FROM w0),
        |w4 AS (SELECT *, ww2 * ww2 AS ww4 FROM w2),
        |w8 AS (SELECT *, ww4 * ww4 AS ww8 FROM w4),
        |keyed AS (SELECT doc_id, s_t, s_p, weight,
        |    ln((CAST(((doc_id % 2147483648) * 2654435761) % 4294967296
        |          AS DOUBLE) + 1.0) / 4294967297.0)
        |      / greatest(ww8 * ww8, 1e-6) AS es_key
        |  FROM w8),
        |ranked AS (SELECT *, row_number() OVER (ORDER BY es_key DESC,
        |    doc_id) AS rk FROM keyed)
        |SELECT CAST(rk AS BIGINT) AS rk, doc_id, s_t, s_p, weight
        |FROM ranked WHERE rk <= 32 ORDER BY rk""".stripMargin,
    "text_resample" ->
      """WITH t AS (SELECT doc_id, source,
        |    CAST(CASE WHEN source = 'src0' THEN 2.5
        |              WHEN source = 'src1' THEN 0.5
        |              ELSE 1.0 END AS DOUBLE) AS weight,
        |    (doc_id * 2654435761) % 100 AS bucket
        |  FROM documents),
        |c AS (SELECT doc_id, source, weight,
        |    CAST(floor(weight) + CASE WHEN bucket <
        |      (weight - floor(weight)) * 100 THEN 1 ELSE 0 END AS INT)
        |      AS n_copies
        |  FROM t)
        |SELECT doc_id, source, weight, n_copies, CAST(epoch AS INT) AS epoch
        |FROM (SELECT doc_id, source, weight, n_copies,
        |        unnest(generate_series(1, n_copies)) AS epoch
        |      FROM c WHERE n_copies > 0)
        |ORDER BY doc_id, epoch""".stripMargin,
    "text_unicode_norm" ->
      // identical decomposed bytes built in DuckDB (chr(769)/chr(771)
      // are the combining acute/tilde), replayed through its own NFC
      """SELECT doc_id,
        | CAST(length(d_txt) AS INT) AS n_before,
        | CAST(length(nfc_normalize(d_txt)) AS INT) AS n_after,
        | md5(nfc_normalize(d_txt)) AS fp,
        | CAST(length(nfc_normalize(d_txt)) < length(d_txt) AS INT)
        |   AS composed
        |FROM (SELECT doc_id,
        |  substring(text, 1, 20) || 'e' || chr(769) || 'n' || chr(771)
        |    AS d_txt FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "text_token_budget" ->
      """WITH t AS (SELECT doc_id, source,
        |    CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS INT)
        |      AS n_tokens,
        |    CAST(len(list_distinct(string_split_regex(trim(lower(text)),
        |      '\s+'))) AS INT) AS n_distinct_words
        |  FROM documents),
        |q AS (SELECT doc_id, source, n_tokens,
        |    round(0.5 * (n_distinct_words / n_tokens) +
        |      0.5 * least(n_tokens / 100.0, 1.0), 4) AS quality_score
        |  FROM t),
        |c AS (SELECT doc_id, source, n_tokens, quality_score,
        |    CAST(SUM(n_tokens) OVER (PARTITION BY source
        |      ORDER BY quality_score DESC, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM q)
        |SELECT doc_id, source, n_tokens, quality_score, cum_tokens
        |FROM c WHERE cum_tokens <= 600
        |ORDER BY doc_id""".stripMargin,
    "text_span_dedup" ->
      """WITH d AS (SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS ws
        |  FROM documents),
        |s0 AS (SELECT doc_id, ws,
        |    CAST(ceil(len(ws) / 10.0) AS INT) AS n_spans FROM d),
        |sp AS (SELECT doc_id, n_spans,
        |    unnest(list_transform(range(n_spans),
        |      i -> array_to_string(ws[i*10+1 : i*10+10], ' '))) AS span,
        |    CAST(unnest(range(n_spans)) AS INT) AS span_idx
        |  FROM s0),
        |k AS (SELECT doc_id, span_idx, span FROM
        |    (SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(span)
        |        ORDER BY doc_id, span_idx) AS rn FROM sp)
        |  WHERE rn = 1),
        |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |    string_agg(span, ' ' ORDER BY span_idx) AS clean_text
        |  FROM k GROUP BY doc_id)
        |SELECT s0.doc_id, n_spans, COALESCE(n_kept, 0) AS n_kept,
        |  (n_spans - COALESCE(n_kept, 0)) / n_spans AS dup_span_frac,
        |  COALESCE(clean_text, '') AS clean_text
        |FROM s0 LEFT JOIN agg USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "text_repetition" ->
      """WITH b AS (SELECT doc_id, ws,
        |    list_transform(list_zip(ws[1:len(ws)-1], ws[2:len(ws)]),
        |      s -> s[1] || ' ' || s[2]) AS bgs
        |  FROM (SELECT doc_id,
        |          string_split_regex(trim(lower(text)), '\s+') AS ws
        |        FROM documents)),
        |wx AS (SELECT doc_id, MAX(c) AS top_word_n FROM
        |    (SELECT doc_id, word, COUNT(*) AS c
        |     FROM (SELECT doc_id, unnest(ws) AS word FROM b)
        |     GROUP BY 1, 2) GROUP BY 1),
        |bx AS (SELECT doc_id, MAX(c) AS top_bigram_n FROM
        |    (SELECT doc_id, bg, COUNT(*) AS c
        |     FROM (SELECT doc_id, unnest(bgs) AS bg FROM b)
        |     GROUP BY 1, 2) GROUP BY 1)
        |SELECT b.doc_id, CAST(len(ws) AS INT) AS n_words,
        |  CAST(top_word_n AS INT) AS top_word_n,
        |  CAST(len(bgs) AS INT) AS n_bigrams,
        |  CAST(COALESCE(top_bigram_n, 0) AS INT) AS top_bigram_n,
        |  top_word_n / len(ws) AS top_word_frac,
        |  CASE WHEN len(bgs) = 0 THEN 0.0
        |       ELSE top_bigram_n / len(bgs) END AS top_bigram_frac,
        |  CAST(top_word_n / len(ws) <= 0.2 AND
        |    (CASE WHEN len(bgs) = 0 THEN 0.0
        |          ELSE top_bigram_n / len(bgs) END) <= 0.18 AS INT)
        |    AS pass_repetition
        |FROM b JOIN wx USING (doc_id) LEFT JOIN bx USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "text_mixture_temp" ->
      // isqrt = floor(sqrt(BIGINT)) is deterministic cross-engine
      // (IEEE sqrt is correctly rounded; a non-square n is never
      // within an ulp of an integer root), then pure // integer laws
      """WITH d AS (SELECT lang AS domain,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(len(string_split_regex(trim(lower(text)), '\s+')))
        |      AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |w AS (SELECT domain, n_docs, n_tokens,
        |    CAST(floor(sqrt(n_tokens)) AS BIGINT) AS w FROM d),
        |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
        |    CAST(sum(w) AS BIGINT) AS tot_w FROM w)
        |SELECT domain, n_docs, n_tokens, w,
        |  CAST(1000000 * n_tokens // tot_tokens AS BIGINT)
        |    AS natural_ppm,
        |  CAST(1000000 * w // tot_w AS BIGINT) AS sample_ppm,
        |  CAST((1000 * (1000000 * w // tot_w))
        |    // greatest(1000000 * n_tokens // tot_tokens, 1)
        |    AS BIGINT) AS boost_pm,
        |  CAST(100000 * w // tot_w AS BIGINT) AS quota_tokens
        |FROM w, t ORDER BY domain""".stripMargin,
    "text_gopher_quality" ->
      """SELECT doc_id, n_words, sum_word_len, n_symbol_chars,
        |  n_chars_calc, n_alpha_words, stopword_n,
        |  sum_word_len / n_words AS mean_word_len,
        |  n_symbol_chars / n_chars_calc AS symbol_ratio,
        |  n_alpha_words / n_words AS alpha_word_frac,
        |  CAST(n_words BETWEEN 10 AND 1000 AND
        |    sum_word_len / n_words BETWEEN 2.0 AND 12.0 AND
        |    n_symbol_chars / n_chars_calc < 0.1 AND
        |    n_alpha_words / n_words > 0.8 AND
        |    stopword_n >= 1 AS INT) AS pass_gopher
        |FROM (SELECT doc_id,
        |  CAST(len(ws) AS INT) AS n_words,
        |  CAST(list_sum(list_transform(ws, w -> length(w))) AS INT)
        |    AS sum_word_len,
        |  CAST(length(regexp_replace(lower(text), '[a-z0-9\s]', '', 'g'))
        |    AS INT) AS n_symbol_chars,
        |  CAST(length(text) AS INT) AS n_chars_calc,
        |  CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-z]')))
        |    AS INT) AS n_alpha_words,
        |  CAST(len(regexp_extract_all(text, '\b(the|a|of)\b')) AS INT)
        |    AS stopword_n
        |  FROM (SELECT doc_id, text,
        |          string_split_regex(trim(lower(text)), '\s+') AS ws
        |        FROM documents))
        |ORDER BY doc_id""".stripMargin,
    "text_holdout_split" ->
      """SELECT CASE WHEN (doc_id * 2654435761) % 100 < 80 THEN 'train'
        |  WHEN (doc_id * 2654435761) % 100 < 90 THEN 'val'
        |  ELSE 'test' END AS split,
        | lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        | MIN(doc_id) AS min_doc_id
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "text_pii_scrub" ->
      """WITH dirty AS (
        |  SELECT doc_id, text || ' contact user' ||
        |    CAST(doc_id AS VARCHAR) || '@example.com or +1-555-01' ||
        |    CAST(doc_id AS VARCHAR) AS d
        |  FROM documents),
        |scrub AS (
        |  SELECT doc_id, d,
        |    regexp_replace(regexp_replace(d,
        |      '[a-z0-9._]+@[a-z0-9.]+\.[a-z]+', '[EMAIL]', 'g'),
        |      '\+1-555-[0-9]+', '[PHONE]', 'g') AS sc
        |  FROM dirty)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(d,
        |    '[a-z0-9._]+@[a-z0-9.]+\.[a-z]+')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(d, '\+1-555-[0-9]+')) AS INT)
        |    AS n_phones,
        |  CAST(len(d) AS INT) AS len_before,
        |  CAST(len(sc) AS INT) AS len_after,
        |  md5(sc) AS scrubbed_md5
        |FROM scrub ORDER BY doc_id""".stripMargin,
    "text_lang_id" ->
      """SELECT doc_id, labeled_lang, s_en, s_zh, s_de,
        | CASE WHEN s_en >= s_zh AND s_en >= s_de THEN 'en'
        |      WHEN s_zh >= s_de THEN 'zh' ELSE 'de' END AS predicted_lang
        |FROM (SELECT doc_id, lang AS labeled_lang,
        |  CAST(len(regexp_extract_all(text, '\b(the|a|of)\b')) AS INT)
        |    AS s_en,
        |  CAST(len(regexp_extract_all(text, '\b(data|query|row)\b')) AS INT)
        |    AS s_zh,
        |  CAST(len(regexp_extract_all(text, '\b(fast|slow|small)\b')) AS INT)
        |    AS s_de
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      """SELECT doc_id, n_chars_calc, n_words, n_distinct_words,
        | n_distinct_words / n_words AS distinct_ratio,
        | round(0.5 * (n_distinct_words / n_words) +
        |   0.5 * least(n_words / 100.0, 1.0), 4) AS quality_score
        |FROM (SELECT doc_id,
        |  CAST(length(text) AS INT) AS n_chars_calc,
        |  CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS INT)
        |    AS n_words,
        |  CAST(len(list_distinct(string_split_regex(trim(lower(text)),
        |    '\s+'))) AS INT) AS n_distinct_words
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "text_token_count" ->
      """SELECT doc_id,
        | CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS INT)
        |   AS ws_tokens,
        | CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]'))
        |   AS INT) AS bpe_ish_tokens,
        | ((length(text) * 100) //
        |   len(string_split_regex(trim(lower(text)), '\s+'))) / 100.0
        |   AS chars_per_token
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """WITH fp AS (SELECT doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        |      AS fingerprint
        |  FROM documents)
        |SELECT doc_id, fingerprint, CAST(cnt AS BIGINT) AS n_same
        |FROM fp JOIN (SELECT fingerprint AS f2, COUNT(*) AS cnt
        |              FROM fp GROUP BY 1) g ON fingerprint = f2
        |ORDER BY doc_id""".stripMargin,
    "text_vocab" ->
      """SELECT token, CAST(COUNT(*) AS BIGINT) AS n
        |FROM (SELECT unnest(string_split_regex(trim(lower(text)),
        |        '\s+')) AS token
        |      FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 50""".stripMargin,
    "text_vocab_growth" ->
      // same value-range decile law (integer floor; Spark's double
      // truncate agrees — quotient <= 10 so fp error ~1e-15 << 1/den)
      """WITH b AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi
        |  FROM documents),
        |toks AS (SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM toks GROUP BY 1, 2),
        |dp AS (SELECT CAST((doc_id - b.lo) * 10 // (b.hi - b.lo + 1)
        |      AS INT) + 1 AS decile,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs
        |  FROM documents CROSS JOIN b GROUP BY 1),
        |tp AS (SELECT CAST((doc_id - b.lo) * 10 // (b.hi - b.lo + 1)
        |      AS INT) + 1 AS decile,
        |    CAST(SUM(tf) AS BIGINT) AS n_tokens
        |  FROM tf CROSS JOIN b GROUP BY 1),
        |ft AS (SELECT token, MIN(doc_id) AS first_doc FROM tf GROUP BY 1),
        |nt AS (SELECT CAST((first_doc - b.lo) * 10 // (b.hi - b.lo + 1)
        |      AS INT) + 1 AS decile,
        |    CAST(COUNT(*) AS BIGINT) AS new_types
        |  FROM ft CROSS JOIN b GROUP BY 1),
        |pd AS (SELECT dp.decile, dp.n_docs, tp.n_tokens,
        |    COALESCE(nt.new_types, 0) AS new_types
        |  FROM dp JOIN tp USING (decile) LEFT JOIN nt USING (decile))
        |SELECT p.decile, p.n_docs, p.n_tokens, p.new_types,
        |  CAST((SELECT SUM(q.new_types) FROM pd q
        |        WHERE q.decile <= p.decile) AS BIGINT) AS vocab_cumulative
        |FROM pd p ORDER BY p.decile""".stripMargin,
    "text_collocations" ->
      // same staged integer ratio ((n_ab·1e6 div n_a)·N div n_b) and
      // the same (ratio desc, w1, w2) total order
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS w,
        |    unnest(generate_series(1,
        |      len(string_split_regex(trim(lower(text)), '\s+')))) AS i
        |  FROM documents),
        |bgr AS (SELECT doc_id, w AS w1,
        |    lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2
        |  FROM toks),
        |b AS (SELECT w1, w2 FROM bgr WHERE w2 IS NOT NULL),
        |ab AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_ab
        |  FROM b GROUP BY 1, 2 HAVING COUNT(*) >= 5),
        |la AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS n_a
        |  FROM b GROUP BY 1),
        |rb AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n_b
        |  FROM b GROUP BY 1),
        |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM b)
        |SELECT ab.w1, ab.w2, ab.n_ab, la.n_a, rb.n_b,
        |  CAST(((ab.n_ab * 1000000 // la.n_a) * nt.n_total) // rb.n_b
        |    AS BIGINT) AS pmi_ratio_ppm
        |FROM ab JOIN la USING (w1) JOIN rb USING (w2) CROSS JOIN nt
        |ORDER BY pmi_ratio_ppm DESC, w1, w2 LIMIT 50""".stripMargin,
    "text_bigrams" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS w,
        |    unnest(generate_series(1,
        |      len(string_split_regex(trim(lower(text)), '\s+')))) AS i
        |  FROM documents),
        |bg AS (
        |  SELECT w || ' ' || lead(w, 1) OVER
        |    (PARTITION BY doc_id ORDER BY i) AS bigram
        |  FROM toks QUALIFY bigram IS NOT NULL)
        |SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
        |FROM bg GROUP BY 1 ORDER BY n DESC, bigram LIMIT 50""".stripMargin,
    "text_kn_bigram" ->
      // same one-bigram-table derivation; DuckDB's decimal literals
      // stay exact here because the 0.75 discount is dyadic (c−0.75
      // and 0.75·n land on exactly-representable doubles), and `/`
      // promotes to DOUBLE — five IEEE ops in the same tree
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS w,
        |    unnest(generate_series(1,
        |      len(string_split_regex(trim(lower(text)), '\s+')))) AS i
        |  FROM documents),
        |bg AS (
        |  SELECT w AS w1, lead(w, 1) OVER
        |    (PARTITION BY doc_id ORDER BY i) AS w2
        |  FROM toks QUALIFY w2 IS NOT NULL),
        |bc AS (SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY 1, 2),
        |lf AS (SELECT w1, SUM(c) AS cw1, COUNT(*) AS n1w1
        |  FROM bc GROUP BY 1),
        |ct AS (SELECT w2, COUNT(*) AS n1cont FROM bc GROUP BY 1),
        |bt AS (SELECT COUNT(*) AS bt FROM bc)
        |SELECT w1, w2, CAST(c AS BIGINT) AS c,
        |  (c - 0.75) / cw1 + ((0.75 * n1w1) / cw1) * (n1cont / bt)
        |    AS p_kn
        |FROM bc JOIN lf USING (w1) JOIN ct USING (w2), bt
        |WHERE c >= 5 ORDER BY w1, w2""".stripMargin,
    "text_chunk" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
        |  FROM documents WHERE length(trim(text)) > 0),
        |e AS (
        |  SELECT doc_id, ts,
        |    unnest(generate_series(0,
        |      CAST(ceil(len(ts) / 40.0) AS INT) - 1)) AS i
        |  FROM t)
        |SELECT doc_id, CAST(i AS INT) AS chunk_no,
        |  CAST(len(ts[i*40+1 : least(i*40+50, len(ts))]) AS INT)
        |    AS n_chunk_tokens,
        |  md5(array_to_string(ts[i*40+1 : least(i*40+50, len(ts))], ' '))
        |    AS chunk_md5
        |FROM e ORDER BY doc_id, chunk_no""".stripMargin,
    "text_pack" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS INT)
        |      AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |    coalesce(CAST(SUM(n_tokens) OVER (PARTITION BY source
        |      ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) AS cum_before
        |  FROM t)
        |SELECT doc_id, source, n_tokens, cum_before,
        |  cum_before // 512 AS bin_first,
        |  (cum_before + n_tokens - 1) // 512 AS bin_last,
        |  CAST(cum_before // 512 <>
        |    (cum_before + n_tokens - 1) // 512 AS INT) AS spans_boundary
        |FROM c ORDER BY doc_id""".stripMargin,
  )
}
