package graft.oracles

import graft.oracles.Gen._

/** DuckDB oracle SQL for the embedding similarity / ANN / decomposition queries —
  * one entry per SparkEntry.queries key in this family. Moved out
  * of SparkEntry mechanically (round-10 verdict ask #7); the text
  * of every entry is unchanged.
  */
private[graft] object SimOracles {
  val sql: Map[String, String] = Map(
    "sim_random_proj" ->
      """WITH k AS (SELECT CAST(unnest(range(16)) AS INTEGER) AS dim)
        |SELECT e.vec_id, k.dim,
        |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |    list_transform(list_zip(e.embedding, range(len(e.embedding))),
        |      s -> CAST(s[1] AS DOUBLE) *
        |        (1 - 2 * (((((CAST(k.dim AS BIGINT) + 1) * 2654435761
        |            % 1048573 + 1) *
        |          ((CAST(s[2] AS BIGINT) + 1) * 2654435761
        |            % 1048573 + 1)) >> 10) & 1)))),
        |    (a, b) -> a + b) AS val
        |FROM embeddings e CROSS JOIN k
        |ORDER BY vec_id, dim""".stripMargin,
    "sim_corr_matrix" ->
      // exact BIGINT moments (the sf-bounded form of Spark's
      // DECIMAL(38,0)); the float tail (cast, sqrt, divide) mirrors
      // the Spark expression operation-for-operation
      """WITH x AS (SELECT vec_id,
        |    CAST(unnest(range(len(embedding))) AS INTEGER) AS dim,
        |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT)
        |      AS xs
        |  FROM embeddings),
        |p AS (SELECT a.dim AS j, b.dim AS k,
        |    CAST(SUM(a.xs * b.xs) AS BIGINT) AS spp
        |  FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.dim <= b.dim
        |  GROUP BY 1, 2),
        |st AS (SELECT dim, CAST(SUM(xs) AS BIGINT) AS sx,
        |    CAST(SUM(xs * xs) AS BIGINT) AS sqq,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM x GROUP BY dim)
        |SELECT p.j AS dim_a, p.k AS dim_b,
        |  CAST(sa.n * p.spp - sa.sx * sb.sx AS DOUBLE) /
        |    (sqrt(CAST(sa.n * sa.sqq - sa.sx * sa.sx AS DOUBLE)) *
        |     sqrt(CAST(sb.n * sb.sqq - sb.sx * sb.sx AS DOUBLE))) AS corr
        |FROM p JOIN st sa ON sa.dim = p.j JOIN st sb ON sb.dim = p.k
        |ORDER BY dim_a, dim_b""".stripMargin,
    "sim_standardize" ->
      """WITH x AS (SELECT vec_id,
        |    CAST(unnest(range(len(embedding))) AS INTEGER) AS dim,
        |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT)
        |      AS xs
        |  FROM embeddings),
        |st AS (SELECT dim, CAST(SUM(xs) AS BIGINT) AS s1,
        |    CAST(SUM(xs * xs) AS BIGINT) AS s2,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM x GROUP BY dim)
        |SELECT x.vec_id, x.dim,
        |  (CAST(x.xs AS DOUBLE) - CAST(st.s1 AS DOUBLE) / st.n) /
        |    sqrt(CAST(st.s2 AS DOUBLE) / st.n -
        |      (CAST(st.s1 AS DOUBLE) / st.n) *
        |      (CAST(st.s1 AS DOUBLE) / st.n) + 1e-12) AS z
        |FROM x JOIN st USING (dim)
        |ORDER BY vec_id, dim""".stripMargin,
    "sim_ann_lsh" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries,
        | true AS all_probes_answered, true AS sims_exact
        |FROM embeddings WHERE vec_id < 8""".stripMargin,
    "sim_ann_ivf" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, true AS recall_ok
        |FROM embeddings WHERE vec_id < 8""".stripMargin,
    "sim_pq_topk" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, true AS recall_ok
        |FROM embeddings WHERE vec_id < 8""".stripMargin,
    "sim_knn_graph" ->
      // the exact mutual-kNN edge count replays through the same
      // round-3 rank windows (rank by rounded sim DESC, dst — the
      // dedup_cosine-pinned stable currency); the IVF graph's
      // agreement enters as the bound booleans
      """WITH e AS (
        |  SELECT a.vec_id AS src, b.vec_id AS dst,
        |    round(CAST(list_cosine_similarity(a.embedding,
        |      b.embedding) AS DOUBLE), 3) AS sim
        |  FROM embeddings a JOIN embeddings b
        |    ON a.vec_id <> b.vec_id),
        |r AS (SELECT src, dst,
        |    ROW_NUMBER() OVER (PARTITION BY src
        |      ORDER BY sim DESC, dst) AS rk
        |  FROM e),
        |k AS (SELECT src, dst FROM r WHERE rk <= 5),
        |m AS (SELECT x.src FROM k x
        |  JOIN k y ON x.src = y.dst AND x.dst = y.src
        |  WHERE x.src < x.dst)
        |SELECT CAST((SELECT COUNT(*) FROM embeddings) AS BIGINT)
        |    AS n_nodes,
        |  CAST(COUNT(*) AS BIGINT) AS n_edges_exact,
        |  true AS recall_ok, true AS precision_ok
        |FROM m""".stripMargin,
    "sim_ivfpq_topk" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, true AS recall_ok
        |FROM embeddings WHERE vec_id < 8""".stripMargin,
    "sim_quantize" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_vectors, true AS recon_ok
        |FROM embeddings""".stripMargin,
    "sim_pca" ->
      """SELECT CAST(count(*) * 8 AS BIGINT) AS n_proj_rows,
        | true AS orthonormal_ok, true AS eigs_desc_ok,
        | true AS var_matches_eig FROM embeddings""".stripMargin,
    "sim_nn_descent" ->
      // laws only: monotone is a theorem (top-k of a superset),
      // found_any measured true with margin at both verify sfs;
      // the raw hit counts are spec-asserted (IVF-dependent)
      """SELECT CAST(vec_id AS BIGINT) AS vec_id,
        |  true AS monotone_ok, true AS found_any
        |FROM embeddings WHERE vec_id < 8 ORDER BY 1""".stripMargin,
    "sim_nn_descent_curve" ->
      // laws only: per-round monotonicity is a theorem (each round's
      // list is the exact-scored top-k of a superset of the previous
      // round's); the raw per-round hit counts are spec-pinned
      // (NnDescentSpec) because they are IVF-seed-dependent
      """SELECT CAST(vec_id AS BIGINT) AS vec_id,
        |  true AS monotone_r1, true AS monotone_r2, true AS found_any
        |FROM embeddings WHERE vec_id < 8 ORDER BY 1""".stripMargin,
    "sim_mrl_energy" ->
      // same quantized per-element energies, same div-ppm laws
      """WITH el AS (SELECT vec_id,
        |    CAST(unnest(range(len(embedding))) AS INTEGER) AS pos,
        |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000)
        |      AS BIGINT) AS xq
        |  FROM embeddings),
        |pv AS (SELECT vec_id,
        |    CAST(SUM(CASE WHEN pos < 4 THEN xq * xq ELSE 0 END)
        |      AS BIGINT) AS e4,
        |    CAST(SUM(CASE WHEN pos < 16 THEN xq * xq ELSE 0 END)
        |      AS BIGINT) AS e16,
        |    CAST(SUM(xq * xq) AS BIGINT) AS e64
        |  FROM el GROUP BY 1),
        |lv AS (SELECT vec_id, 4 AS dim_level, e4 AS e_d, e64 AS e_full
        |    FROM pv
        |  UNION ALL SELECT vec_id, 16, e16, e64 FROM pv
        |  UNION ALL SELECT vec_id, 64, e64, e64 FROM pv),
        |r AS (SELECT dim_level, e_d * 1000000 // e_full AS ppm
        |  FROM lv WHERE e_full > 0)
        |SELECT CAST(dim_level AS INT) AS dim_level,
        |  CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |  CAST(SUM(ppm) // COUNT(*) AS BIGINT) AS mean_retained_ppm,
        |  CAST(MIN(ppm) AS BIGINT) AS min_retained_ppm,
        |  CAST(MAX(ppm) AS BIGINT) AS max_retained_ppm,
        |  CAST(SUM(CASE WHEN ppm >= 990000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_above_99pct
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "sim_centroids" ->
      """SELECT label, CAST(dim AS INT) AS dim,
        |  SUM(CAST(round(CAST(v AS DOUBLE) * 1e6) AS BIGINT))
        |    / (COUNT(*) * 1e6) AS centroid,
        |  CAST(COUNT(*) AS BIGINT) AS n_vecs
        |FROM (SELECT label, unnest(embedding) AS v,
        |        unnest(range(len(embedding))) AS dim
        |      FROM embeddings)
        |GROUP BY label, dim ORDER BY label, dim""".stripMargin,
    "sim_outlier_gate" ->
      // same 1e3 scaled-integer law, same n·x − Σx residuals (BIGINT
      // throughout; the fourth-power moments ride HUGEINT), same
      // squared 3σ comparison in doubles derived from exact sums
      """WITH x AS (SELECT vec_id, label,
        |    unnest(range(len(embedding))) AS dim,
        |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1e3)
        |      AS BIGINT) AS xs
        |  FROM embeddings),
        |st AS (SELECT label, dim, CAST(SUM(xs) AS BIGINT) AS s1,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM x GROUP BY 1, 2),
        |d2 AS (SELECT vec_id, x.label,
        |    CAST(SUM((n * xs - s1) * (n * xs - s1)) AS BIGINT) AS d2s
        |  FROM x JOIN st ON x.label = st.label AND x.dim = st.dim
        |  GROUP BY 1, 2),
        |lb AS (SELECT label, COUNT(*) AS k,
        |    SUM(CAST(d2s AS HUGEINT)) AS t1,
        |    SUM(CAST(d2s AS HUGEINT) * d2s) AS t2
        |  FROM d2 GROUP BY 1),
        |z AS (SELECT vec_id, d2.label, d2s,
        |    CAST(t1 AS DOUBLE) / k AS mean_d2,
        |    CAST(t2 AS DOUBLE) / k -
        |      (CAST(t1 AS DOUBLE) / k) * (CAST(t1 AS DOUBLE) / k)
        |      AS var_d2
        |  FROM d2 JOIN lb ON d2.label = lb.label)
        |SELECT vec_id, label, d2s,
        |  CAST((d2s - mean_d2) * (d2s - mean_d2) > 9.0 * var_d2
        |    AS INT) AS is_outlier
        |FROM z ORDER BY vec_id""".stripMargin,
    "sim_kmeans" -> kmeansOracle,
    "sim_pq" -> pqOracle(4, 16, 16),
    "sim_topk" ->
      """WITH s AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    round(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 3)
        |      AS sim
        |  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
        |  WHERE a.vec_id < 8)
        |SELECT query_id, neighbor_id, sim, CAST(rank AS INT) AS rank
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |        ORDER BY sim DESC, neighbor_id) AS rank FROM s)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "sim_hybrid_rrf" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
        |       FROM toks GROUP BY 1, 2),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
        |dfreq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df
        |          FROM tf GROUP BY 1),
        |ti AS (SELECT tf.doc_id, tf.token,
        |    CAST(tf.tf AS DOUBLE) * n.n_docs / dfreq.df AS tfidf
        |  FROM tf JOIN dfreq USING (token) CROSS JOIN n),
        |q AS (SELECT doc_id AS query_id, token FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY tfidf DESC, token) AS r
        |    FROM ti WHERE doc_id < 4) WHERE r <= 3),
        |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl
        |       FROM tf GROUP BY 1),
        |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |              CAST(SUM(dl) AS BIGINT) AS total_len FROM dl),
        |dfq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf
        |        WHERE token IN (SELECT token FROM q) GROUP BY 1),
        |sc AS (SELECT q.query_id, tf.doc_id,
        |    CAST(round(((st.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
        |      * (tf.tf * 2.2)
        |      / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
        |          / (CAST(st.total_len AS DOUBLE) / st.n_docs)))
        |      * 1e6) AS BIGINT) AS s
        |  FROM tf JOIN q USING (token) JOIN dfq USING (token)
        |    JOIN dl USING (doc_id) CROSS JOIN st
        |  WHERE tf.doc_id <> q.query_id),
        |lexagg AS (SELECT query_id, doc_id AS cand_id, SUM(s) AS ssum
        |           FROM sc GROUP BY 1, 2),
        |lex AS (SELECT query_id, cand_id, CAST(r AS INT) AS lex_rank
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |          ORDER BY ssum DESC, cand_id) AS r FROM lexagg)
        |  WHERE r <= 20),
        |simsc AS (SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
        |    round(CAST(list_cosine_similarity(a.embedding, b.embedding)
        |      AS DOUBLE), 3) AS sim
        |  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
        |  WHERE a.vec_id < 4),
        |sem AS (SELECT query_id, cand_id, CAST(r AS INT) AS sem_rank
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |          ORDER BY sim DESC, cand_id) AS r FROM simsc)
        |  WHERE r <= 20),
        |fused AS (SELECT COALESCE(lex.query_id, sem.query_id) AS query_id,
        |    COALESCE(lex.cand_id, sem.cand_id) AS cand_id,
        |    lex_rank, sem_rank,
        |    COALESCE(CAST(round(1e6 / (60 + lex_rank)) AS BIGINT), 0)
        |      + COALESCE(CAST(round(1e6 / (60 + sem_rank)) AS BIGINT), 0)
        |      AS fused
        |  FROM lex FULL JOIN sem
        |    ON lex.query_id = sem.query_id AND lex.cand_id = sem.cand_id)
        |SELECT query_id, CAST(r AS INT) AS rank, cand_id, fused,
        |  lex_rank, sem_rank
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |        ORDER BY fused DESC, cand_id) AS r FROM fused)
        |WHERE r <= 5 ORDER BY query_id, rank""".stripMargin,
    "sim_mmr_rerank" ->
      """WITH pool0 AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
        |    CAST(round(CAST(list_cosine_similarity(a.embedding, b.embedding)
        |      AS DOUBLE) * 1000) AS BIGINT) AS rel_m
        |  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
        |  WHERE a.vec_id < 4),
        |pool AS (SELECT query_id, cand_id, rel_m FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY rel_m DESC, cand_id) AS r FROM pool0)
        |  WHERE r <= 20),
        |ps AS (SELECT p.query_id, p.cand_id AS a_cand, q.cand_id AS b_cand,
        |    CAST(round(CAST(list_cosine_similarity(ea.embedding, eb.embedding)
        |      AS DOUBLE) * 1000) AS BIGINT) AS sim_m
        |  FROM pool p JOIN pool q
        |    ON p.query_id = q.query_id AND p.cand_id <> q.cand_id
        |  JOIN embeddings ea ON ea.vec_id = p.cand_id
        |  JOIN embeddings eb ON eb.vec_id = q.cand_id),
        |s1 AS (SELECT query_id, cand_id, rel_m,
        |    CAST(0 AS BIGINT) AS maxsim_m, 700 * rel_m AS score_m
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |          ORDER BY 700 * rel_m DESC, cand_id) AS r FROM pool)
        |  WHERE r = 1),
        |m2 AS (SELECT ps.query_id, ps.a_cand AS cand_id,
        |    MAX(ps.sim_m) AS maxsim_m
        |  FROM ps JOIN s1 ON ps.query_id = s1.query_id
        |    AND ps.b_cand = s1.cand_id GROUP BY 1, 2),
        |s2 AS (SELECT query_id, cand_id, rel_m, maxsim_m, score_m FROM (
        |    SELECT p.query_id, p.cand_id, p.rel_m, m.maxsim_m,
        |      700 * p.rel_m - 300 * m.maxsim_m AS score_m,
        |      ROW_NUMBER() OVER (PARTITION BY p.query_id
        |        ORDER BY 700 * p.rel_m - 300 * m.maxsim_m DESC, p.cand_id)
        |        AS r
        |    FROM pool p JOIN m2 m USING (query_id, cand_id)
        |    WHERE NOT EXISTS (SELECT 1 FROM s1
        |      WHERE s1.query_id = p.query_id AND s1.cand_id = p.cand_id))
        |  WHERE r = 1),
        |sel2 AS (SELECT query_id, cand_id FROM s1
        |  UNION ALL SELECT query_id, cand_id FROM s2),
        |m3 AS (SELECT ps.query_id, ps.a_cand AS cand_id,
        |    MAX(ps.sim_m) AS maxsim_m
        |  FROM ps JOIN sel2 ON ps.query_id = sel2.query_id
        |    AND ps.b_cand = sel2.cand_id GROUP BY 1, 2),
        |s3 AS (SELECT query_id, cand_id, rel_m, maxsim_m, score_m FROM (
        |    SELECT p.query_id, p.cand_id, p.rel_m, m.maxsim_m,
        |      700 * p.rel_m - 300 * m.maxsim_m AS score_m,
        |      ROW_NUMBER() OVER (PARTITION BY p.query_id
        |        ORDER BY 700 * p.rel_m - 300 * m.maxsim_m DESC, p.cand_id)
        |        AS r
        |    FROM pool p JOIN m3 m USING (query_id, cand_id)
        |    WHERE NOT EXISTS (SELECT 1 FROM sel2
        |      WHERE sel2.query_id = p.query_id AND sel2.cand_id = p.cand_id))
        |  WHERE r = 1),
        |sel3 AS (SELECT query_id, cand_id FROM sel2
        |  UNION ALL SELECT query_id, cand_id FROM s3),
        |m4 AS (SELECT ps.query_id, ps.a_cand AS cand_id,
        |    MAX(ps.sim_m) AS maxsim_m
        |  FROM ps JOIN sel3 ON ps.query_id = sel3.query_id
        |    AND ps.b_cand = sel3.cand_id GROUP BY 1, 2),
        |s4 AS (SELECT query_id, cand_id, rel_m, maxsim_m, score_m FROM (
        |    SELECT p.query_id, p.cand_id, p.rel_m, m.maxsim_m,
        |      700 * p.rel_m - 300 * m.maxsim_m AS score_m,
        |      ROW_NUMBER() OVER (PARTITION BY p.query_id
        |        ORDER BY 700 * p.rel_m - 300 * m.maxsim_m DESC, p.cand_id)
        |        AS r
        |    FROM pool p JOIN m4 m USING (query_id, cand_id)
        |    WHERE NOT EXISTS (SELECT 1 FROM sel3
        |      WHERE sel3.query_id = p.query_id AND sel3.cand_id = p.cand_id))
        |  WHERE r = 1),
        |sel4 AS (SELECT query_id, cand_id FROM sel3
        |  UNION ALL SELECT query_id, cand_id FROM s4),
        |m5 AS (SELECT ps.query_id, ps.a_cand AS cand_id,
        |    MAX(ps.sim_m) AS maxsim_m
        |  FROM ps JOIN sel4 ON ps.query_id = sel4.query_id
        |    AND ps.b_cand = sel4.cand_id GROUP BY 1, 2),
        |s5 AS (SELECT query_id, cand_id, rel_m, maxsim_m, score_m FROM (
        |    SELECT p.query_id, p.cand_id, p.rel_m, m.maxsim_m,
        |      700 * p.rel_m - 300 * m.maxsim_m AS score_m,
        |      ROW_NUMBER() OVER (PARTITION BY p.query_id
        |        ORDER BY 700 * p.rel_m - 300 * m.maxsim_m DESC, p.cand_id)
        |        AS r
        |    FROM pool p JOIN m5 m USING (query_id, cand_id)
        |    WHERE NOT EXISTS (SELECT 1 FROM sel4
        |      WHERE sel4.query_id = p.query_id AND sel4.cand_id = p.cand_id))
        |  WHERE r = 1)
        |SELECT query_id, CAST(step AS INT) AS step, cand_id, rel_m,
        |  maxsim_m, score_m
        |FROM (
        |  SELECT *, 1 AS step FROM s1
        |  UNION ALL SELECT *, 2 AS step FROM s2
        |  UNION ALL SELECT *, 3 AS step FROM s3
        |  UNION ALL SELECT *, 4 AS step FROM s4
        |  UNION ALL SELECT *, 5 AS step FROM s5)
        |ORDER BY query_id, step""".stripMargin,
    "sim_hard_negatives" ->
      """WITH s AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS negative_id,
        |    round(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 3)
        |      AS sim
        |  FROM embeddings a JOIN embeddings b
        |    ON b.vec_id <> a.vec_id AND b.label <> a.label
        |  WHERE a.vec_id < 8)
        |SELECT query_id, negative_id, sim, CAST(rank AS INT) AS rank
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |        ORDER BY sim DESC, negative_id) AS rank FROM s)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
  )
}
