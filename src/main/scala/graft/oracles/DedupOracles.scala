package graft.oracles

import graft.oracles.Gen._

/** DuckDB oracle SQL for the near-dup / clustering / survivorship queries —
  * one entry per SparkEntry.queries key in this family. Moved out
  * of SparkEntry mechanically (round-10 verdict ask #7); the text
  * of every entry is unchanged.
  */
private[graft] object DedupOracles {
  val sql: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT min(doc_id) AS keeper_doc_id,
        | CAST(COUNT(*) AS BIGINT) AS n_copies,
        | md5(text) AS content_hash
        |FROM documents GROUP BY text ORDER BY keeper_doc_id""".stripMargin,
    "dedup_ngram_jaccard" -> ngramPairSql,
    "dedup_containment" ->
      // same shingle/pair CTEs, containment score + direction
      """WITH toks AS (
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
        |pr AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, CAST(n_inter AS BIGINT) AS n_inter,
        |  CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b,
        |  n_inter / least(na.n, nb.n) AS containment,
        |  CASE WHEN na.n < nb.n THEN 'a_in_b'
        |       WHEN nb.n < na.n THEN 'b_in_a'
        |       ELSE 'mutual' END AS direction
        |FROM pr
        |JOIN sz na ON na.doc_id = doc_a
        |JOIN sz nb ON nb.doc_id = doc_b
        |WHERE n_inter / least(na.n, nb.n) >= 0.9
        |ORDER BY doc_a, doc_b""".stripMargin,
    // prefix filtering is exact: same oracle as the full-index join
    "dedup_prefix_jaccard" -> ngramPairSql,
    "dedup_prefix_stats" -> prefixStatsSql,
    // --- assertion-form oracles (approx/hash-family queries) ---
    "dedup_minhash" -> pairRecallOracle,
    "dedup_source_overlap" ->
      // full replay: the same 3-gram shingles, the distinct
      // (shingle, source) incidence, the shingle-sharing pair base
      // with sizes, and the integer Jaccard-0.5 test
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS w,
        |    unnest(generate_series(1,
        |      len(string_split_regex(trim(lower(text)), '\s+')))) AS i
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    w || ' ' || lead(w,1) OVER win || ' ' || lead(w,2) OVER win
        |      AS s
        |  FROM toks WINDOW win AS (PARTITION BY doc_id ORDER BY i)
        |  QUALIFY lead(w,2) OVER win IS NOT NULL),
        |ss AS (SELECT DISTINCT sh.s, d.source
        |  FROM sh JOIN documents d USING (doc_id)),
        |shared AS (SELECT a.source AS source_a, b.source AS source_b,
        |    CAST(count(*) AS BIGINT) AS n_shared_shingles
        |  FROM ss a JOIN ss b ON a.s = b.s AND a.source < b.source
        |  GROUP BY 1, 2),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |pr AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    count(*) AS n_inter
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |px AS (SELECT least(da.source, db.source) AS source_a,
        |    greatest(da.source, db.source) AS source_b,
        |    pr.n_inter, sa.n AS n_a, sb.n AS n_b
        |  FROM pr
        |  JOIN documents da ON pr.doc_a = da.doc_id
        |  JOIN documents db ON pr.doc_b = db.doc_id
        |  JOIN sz sa ON pr.doc_a = sa.doc_id
        |  JOIN sz sb ON pr.doc_b = sb.doc_id
        |  WHERE da.source <> db.source),
        |cand AS (SELECT source_a, source_b,
        |    CAST(count(*) AS BIGINT) AS n_cross_pairs,
        |    CAST(sum(CASE WHEN 3 * n_inter >= n_a + n_b
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_neardup_pairs
        |  FROM px GROUP BY 1, 2)
        |SELECT shared.source_a, shared.source_b, n_shared_shingles,
        |  coalesce(n_cross_pairs, 0) AS n_cross_pairs,
        |  coalesce(n_neardup_pairs, 0) AS n_neardup_pairs
        |FROM shared LEFT JOIN cand USING (source_a, source_b)
        |ORDER BY 1, 2""".stripMargin,
    "dedup_simhash_pairs" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_true_pairs,
         | true AS recall_ok, true AS candidates_bounded
         |FROM ($ngramPairSql) t""".stripMargin,
    // budget form (the simhash shape): precision inherently falls
    // with corpus size for fingerprint blocking, the per-doc candidate
    // budget is the scale-invariant health bound
    "dedup_winnow_pairs" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_true_pairs,
         | true AS recall_ok, true AS candidates_bounded
         |FROM ($ngramPairSql) t""".stripMargin,
    "dedup_simhash" ->
      s"""SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
         | CAST(count(*) AS BIGINT) AS n_true_pairs,
         | true AS neardup_hamming_ok, true AS all_docs_signed
         |FROM ($ngramPairSql) t""".stripMargin,
    "dedup_clusters" -> ccClustersOracle,
    // conservation-law assertion (round-12): the violation counts are
    // computed IN-PLAN over the full pair graph and labels — the
    // oracle states the laws (all three counts 0) plus the cheap
    // corpus count, so this gate runs in milliseconds at ANY sf,
    // including the decades where the closure replay is prohibitive
    "dedup_cc_invariants" ->
      """SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents)
        |    AS n_docs,
        |  CAST(0 AS BIGINT) AS n_cross_label_edges,
        |  CAST(0 AS BIGINT) AS n_label_above_member,
        |  CAST(0 AS BIGINT) AS n_rootless_labels""".stripMargin,
    "dedup_bcubed" -> bcubedOracle,
    "dedup_keep_best" -> keepBestOracle,
    // the star-alternation variant computes the SAME clusters
    "dedup_clusters_star" -> ccClustersOracle,
    "dedup_incremental" ->
      """WITH d AS (SELECT doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |  FROM documents),
        |delta AS (SELECT * FROM d WHERE doc_id % 5 = 0),
        |hist AS (SELECT * FROM d WHERE doc_id % 5 <> 0),
        |ex AS (SELECT delta.doc_id, MIN(hist.doc_id) AS e_id
        |       FROM delta JOIN hist USING (fp) GROUP BY 1),
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
        |jc AS (
        |  SELECT a.doc_id AS doc_id, b.doc_id AS hist_id,
        |    count(*) / (na.n + nb.n - count(*)) AS j
        |  FROM sh a JOIN sh b ON a.s = b.s
        |    AND a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
        |  JOIN sz na ON na.doc_id = a.doc_id
        |  JOIN sz nb ON nb.doc_id = b.doc_id
        |  GROUP BY 1, 2, na.n, nb.n
        |  HAVING count(*) / (na.n + nb.n - count(*)) >= 0.5),
        |nr AS (SELECT doc_id, MIN(hist_id) AS near_id,
        |         arg_min(j, hist_id) AS near_j
        |       FROM jc GROUP BY 1)
        |SELECT delta.doc_id,
        |  CASE WHEN ex.e_id IS NOT NULL THEN 'exact'
        |       WHEN nr.near_id IS NOT NULL THEN 'near'
        |       ELSE 'new' END AS verdict,
        |  COALESCE(ex.e_id, nr.near_id) AS match_doc_id,
        |  CASE WHEN ex.e_id IS NULL THEN nr.near_j END AS jaccard
        |FROM delta LEFT JOIN ex USING (doc_id) LEFT JOIN nr USING (doc_id)
        |ORDER BY delta.doc_id""".stripMargin,
    // exact cross (delta->history) near-pair count + delta size
    // replayed; precision-1 (exact-verified candidates) and the
    // banded recall bound are deterministic under the fixed seeds —
    // oracle: literal true (same discipline as the recall assertion
    // queries). Shared by both LSH forms — the persisted bucketed
    // index changes the plan, never the result.
    "dedup_incremental_lsh" -> lshAuditOracle,
    "dedup_lsh_index" -> lshAuditOracle,
    "dedup_semantic" ->
      s"""WITH km AS ($kmeansOracle),
        |j AS (SELECT km.vec_id, km.cluster, km.dist_sq, e.embedding
        |      FROM km JOIN embeddings e USING (vec_id)),
        |p AS (SELECT a.vec_id AS va, a.dist_sq AS da,
        |             b.vec_id AS vb, b.dist_sq AS db
        |      FROM j a JOIN j b
        |        ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        |      WHERE round(CAST(list_cosine_similarity(a.embedding,
        |              b.embedding) AS DOUBLE), 3) >= 0.4),
        |drp AS (SELECT DISTINCT
        |          CASE WHEN da < db THEN va ELSE vb END AS vec_id
        |        FROM p)
        |SELECT km.vec_id, km.cluster,
        |  CAST(CASE WHEN drp.vec_id IS NULL THEN 1 ELSE 0 END AS INT)
        |    AS keep
        |FROM km LEFT JOIN drp USING (vec_id)
        |ORDER BY km.vec_id""".stripMargin,
    "dedup_cosine" ->
      // replays Spark's vector_dot op sequence EXACTLY (float→double
      // per-term products, left-fold accumulation from index 0, the
      // same sqrt'd norms) — DuckDB's native list_cosine_similarity
      // accumulates in a different order, and at sf1.0 one pair's ulp
      // drift flipped the round-3 boundary (0.7275). The native
      // function survives only as a conservative candidate PRE-FILTER
      // (≥ 0.35, a full 0.05 below the 0.3995 decision line — orders
      // of magnitude beyond any accumulation drift), so the exact
      // fold runs on a tiny superset instead of all n² pairs.
      """WITH n AS (SELECT vec_id, embedding,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |m AS (SELECT vec_id, embedding, v,
        |    sqrt(list_reduce(list_transform(v, x -> x * x),
        |      (a, b) -> a + b)) AS nrm
        |  FROM n),
        |cand AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    a.v AS va, b.v AS vb, a.nrm AS na, b.nrm AS nb
        |  FROM m a JOIN m b ON a.vec_id < b.vec_id
        |    AND list_cosine_similarity(a.embedding, b.embedding) >= 0.35),
        |sims AS (SELECT vec_a, vec_b,
        |    round(list_reduce(list_transform(list_zip(va, vb),
        |        s -> s[1] * s[2]), (a, b) -> a + b) / (na * nb), 3)
        |      AS sim
        |  FROM cand)
        |SELECT vec_a, vec_b, sim FROM sims WHERE sim >= 0.4
        |ORDER BY vec_a, vec_b""".stripMargin,
  )
}
