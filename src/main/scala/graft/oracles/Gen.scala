package graft.oracles

/** Generated / shared DuckDB oracle SQL fragments — the iterative-
  * algorithm replays (one CTE pair per round) and multi-consumer CTE
  * bases the per-family oracle objects share. Split out of SparkEntry
  * (round-10 verdict ask #7) purely mechanically; the driver contract
  * is unchanged — SparkEntry.oracleSql is still the single surface.
  */
private[graft] object Gen {
  /** DuckDB replay of Graph.pagerank: the same scaled-integer
    * contribution sums, chained one CTE pair (c_i, r_i) per
    * iteration — generated because the SQL repeats per round.
    */
  def pagerankOracle(iters: Int): String = {
    val base =
      """WITH pair AS MATERIALIZED (SELECT -(l_suppkey + 1) AS supp_node,
        |    o_custkey AS cust_node, CAST(COUNT(*) AS BIGINT) AS w
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |edges AS MATERIALIZED (SELECT supp_node AS src, cust_node AS dst, w FROM pair
        |  UNION ALL SELECT cust_node, supp_node, w FROM pair),
        |deg AS MATERIALIZED (SELECT src, CAST(SUM(w) AS BIGINT) AS outdeg
        |  FROM edges GROUP BY src),
        |nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg),
        |r0 AS MATERIALIZED (SELECT src AS node, CAST(1.0 AS DOUBLE) / nn.n AS rank
        |  FROM deg, nn)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""c$i AS MATERIALIZED (SELECT e.dst,
         |    CAST(round(r.rank * e.w / d.outdeg * 1e12) AS BIGINT) AS c
         |  FROM edges e JOIN r${i - 1} r ON e.src = r.node
         |  JOIN deg d ON e.src = d.src),
         |r$i AS MATERIALIZED (SELECT dst AS node, CAST(0.15 AS DOUBLE) / nn.n +
         |    CAST(0.85 AS DOUBLE) * (CAST(SUM(c) AS BIGINT) / 1e12) AS rank
         |  FROM c$i, nn GROUP BY dst, nn.n)""".stripMargin
    }
    (base +: rounds).mkString(",\n") +
      s"\nSELECT node, rank FROM r$iters ORDER BY node"
  }

  /** DuckDB replay of Graph.personalizedPagerank: same edge chain,
    * seeded teleport via a full outer join per round, identical
    * double operand structure.
    */
  def pprOracle(iters: Int): String = {
    val base =
      """WITH pair AS MATERIALIZED (SELECT -(l_suppkey + 1) AS supp_node,
        |    o_custkey AS cust_node, CAST(COUNT(*) AS BIGINT) AS w
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |edges AS MATERIALIZED (SELECT supp_node AS src, cust_node AS dst, w FROM pair
        |  UNION ALL SELECT cust_node, supp_node, w FROM pair),
        |deg AS MATERIALIZED (SELECT src, CAST(SUM(w) AS BIGINT) AS outdeg
        |  FROM edges GROUP BY src),
        |seeds AS MATERIALIZED (SELECT c_custkey AS node FROM customer
        |  WHERE c_nationkey = 1
        |    AND c_custkey IN (SELECT src FROM deg)),
        |ns AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM seeds),
        |r0 AS MATERIALIZED (SELECT node, CAST(1.0 AS DOUBLE) / ns.n AS rank
        |  FROM seeds, ns)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""c$i AS MATERIALIZED (SELECT e.dst,
         |    CAST(round(r.rank * e.w / d.outdeg * 1e12) AS BIGINT) AS c
         |  FROM edges e JOIN r${i - 1} r ON e.src = r.node
         |  JOIN deg d ON e.src = d.src),
         |w$i AS MATERIALIZED (SELECT dst AS node,
         |    CAST(0.85 AS DOUBLE) * (CAST(SUM(c) AS BIGINT) / 1e12)
         |      AS walk
         |  FROM c$i GROUP BY 1),
         |r$i AS MATERIALIZED (SELECT COALESCE(w.node, s.node) AS node,
         |    CASE WHEN s.node IS NOT NULL
         |      THEN CAST(0.15 AS DOUBLE) / ns.n
         |      ELSE CAST(0.0 AS DOUBLE) END
         |      + COALESCE(w.walk, CAST(0.0 AS DOUBLE)) AS rank
         |  FROM w$i w FULL OUTER JOIN seeds s ON w.node = s.node, ns)"""
        .stripMargin
    }
    (base +: rounds).mkString(",\n") +
      s"""\nSELECT -(node) - 1 AS s_suppkey, rank FROM r$iters
         |WHERE node < 0 ORDER BY rank DESC, s_suppkey LIMIT 20"""
        .stripMargin
  }

  /** DuckDB replay of Graph.labelPropagation: the same edge set, one
    * (score-sum, argmax) CTE pair per synchronous round — exact
    * BIGINT scores + smallest-label tie-break make every round
    * deterministic, so the replay matches label for label.
    */
  def lpaOracle(iters: Int): String = {
    val base =
      """WITH pair AS MATERIALIZED (SELECT -(l_suppkey + 1) AS supp_node,
        |    o_custkey AS cust_node, CAST(COUNT(*) AS BIGINT) AS w
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |edges AS MATERIALIZED (SELECT supp_node AS src, cust_node AS dst, w FROM pair
        |  UNION ALL SELECT cust_node, supp_node, w FROM pair),
        |l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS lbl FROM edges)"""
        .stripMargin
    val rounds = (1 to iters).map { i =>
      s"""s$i AS MATERIALIZED (SELECT e.dst AS node, l.lbl AS lbl,
         |    CAST(SUM(e.w) AS BIGINT) AS score
         |  FROM edges e JOIN l${i - 1} l ON e.src = l.node GROUP BY 1, 2),
         |l$i AS MATERIALIZED (SELECT node, lbl FROM (
         |  SELECT node, lbl, row_number() OVER (PARTITION BY node
         |    ORDER BY score DESC, lbl ASC) AS rn FROM s$i) WHERE rn = 1)"""
        .stripMargin
    }
    (base +: rounds).mkString(",\n") +
      s"\nSELECT node, lbl AS community FROM l$iters ORDER BY node"
  }

  /** DuckDB replay of Graph.modularity: the same synchronous LPA
    * rounds over the UNIPARTITE co-purchase symmetric edges, then
    * the degree/in-weight rollup and the S·sym_in − d² identity;
    * the final division is the same IEEE op.
    */
  def modularityOracle(iters: Int, sample: Boolean = false): String = {
    // sample=true: the ¼-node induced subgraph (both endpoints ≡ 0
    // mod 4) — see Graph.sampledWeighted. The filter is pushed INTO
    // the li CTE (sample nodes BEFORE pairing): exactly equivalent —
    // a surviving pair's co-occurrence count cannot change when
    // other parts drop — and it keeps DuckDB from materializing the
    // full corpus pair aggregate just to throw 15/16 of it away (the
    // above-the-aggregate form OOM'd at sf1.0, the exact blowup the
    // sampled companions exist to sidestep)
    val liFilter = if (sample) " WHERE l_partkey % 4 = 0" else ""
    val base =
      s"""WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem$liFilter),
        |ed AS MATERIALIZED (SELECT x.pk AS a, y.pk AS b,
        |    count(*) AS sup FROM li x
        |  JOIN li y ON x.ok = y.ok AND x.pk < y.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |edges AS MATERIALIZED (SELECT a AS src, b AS dst, sup AS w FROM ed
        |  UNION ALL SELECT b, a, sup FROM ed),
        |l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS lbl FROM edges)"""
        .stripMargin
    val rounds = (1 to iters).map { i =>
      s"""s$i AS MATERIALIZED (SELECT e.dst AS node, l.lbl AS lbl,
         |    CAST(SUM(e.w) AS BIGINT) AS score
         |  FROM edges e JOIN l${i - 1} l ON e.src = l.node GROUP BY 1, 2),
         |l$i AS MATERIALIZED (SELECT node, lbl FROM (
         |  SELECT node, lbl, row_number() OVER (PARTITION BY node
         |    ORDER BY score DESC, lbl ASC) AS rn FROM s$i) WHERE rn = 1)"""
        .stripMargin
    }
    (base +: rounds).mkString(",\n") + s""",
      |deg AS MATERIALIZED (SELECT src AS node, CAST(SUM(w) AS BIGINT) AS k
      |  FROM edges GROUP BY 1),
      |dc AS MATERIALIZED (SELECT l.lbl AS community,
      |    CAST(SUM(d.k) AS BIGINT) AS d_c,
      |    CAST(COUNT(*) AS BIGINT) AS n_nodes
      |  FROM deg d JOIN l$iters l ON d.node = l.node GROUP BY 1),
      |win AS MATERIALIZED (SELECT a.lbl AS community,
      |    CAST(SUM(e.w) AS BIGINT) AS w_in_sym
      |  FROM edges e JOIN l$iters a ON e.src = a.node
      |  JOIN l$iters b ON e.dst = b.node AND a.lbl = b.lbl
      |  GROUP BY 1),
      |tot AS MATERIALIZED (SELECT CAST(SUM(w) AS BIGINT) AS s2m FROM edges),
      |per AS MATERIALIZED (SELECT dc.community, n_nodes, d_c,
      |    CAST(coalesce(w_in_sym, 0) AS BIGINT) AS w_in_sym,
      |    CAST(s2m * coalesce(w_in_sym, 0) - d_c * d_c AS BIGINT)
      |      AS contrib_num, s2m
      |  FROM dc LEFT JOIN win ON dc.community = win.community, tot),
      |q AS MATERIALIZED (SELECT CAST(SUM(contrib_num) AS BIGINT) AS q_num FROM per)
      |SELECT community, n_nodes, d_c, w_in_sym, contrib_num, s2m,
      |  q_num, CAST(q_num AS DOUBLE) / CAST(s2m * s2m AS DOUBLE) AS q
      |FROM per, q ORDER BY community""".stripMargin
  }

  /** DuckDB replay of Similarity.kmeans (two Lloyd iterations with the
    * scaled-int centroid means) — shared: the sim_kmeans oracle and
    * p_diverse_subset's km CTE both use it.
    */
  val kmeansOracle: String =
    """WITH e AS (SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |c1 AS (SELECT CAST(vec_id AS INT) AS ck, v AS cv
      |  FROM e ORDER BY vec_id LIMIT 8),
      |d1 AS (SELECT e.vec_id, e.v, c1.ck,
      |    list_reduce(list_transform(list_zip(e.v, c1.cv),
      |      s -> (s[1]-s[2])*(s[1]-s[2])), (a,b) -> a+b) AS dist
      |  FROM e CROSS JOIN c1),
      |a1 AS (SELECT vec_id, v, ck AS cluster FROM
      |    (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
      |        ORDER BY dist, ck) AS rn FROM d1) WHERE rn = 1),
      |x1 AS (SELECT cluster, CAST(unnest(range(len(v))) AS INT) AS dim,
      |    unnest(v) AS x FROM a1),
      |c2 AS (SELECT cluster AS ck, list(mu ORDER BY dim) AS cv FROM
      |    (SELECT cluster, dim,
      |       SUM(CAST(round(x*1e6) AS BIGINT)) / (COUNT(*)*1e6) AS mu
      |     FROM x1 GROUP BY cluster, dim) GROUP BY cluster),
      |d2 AS (SELECT e.vec_id, c2.ck,
      |    list_reduce(list_transform(list_zip(e.v, c2.cv),
      |      s -> (s[1]-s[2])*(s[1]-s[2])), (a,b) -> a+b) AS dist
      |  FROM e CROSS JOIN c2)
      |SELECT vec_id, ck AS cluster, round(dist, 6) AS dist_sq FROM
      |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
      |      ORDER BY dist, ck) AS rn FROM d2) WHERE rn = 1
      |ORDER BY vec_id""".stripMargin

  /** DuckDB replay of Similarity.pqCodes — one kmeans chain per
    * subspace (generated like the BPE chain; the SQL repeats per
    * subspace): slice the vectors, seed codewords from the first k
    * vectors in vec_id order (code id = seed rank), one scaled-BIGINT
    * mean update, final argmin assignment with the (dist, code)
    * tie-break, per-subspace error rounded to 6 then summed
    * left-to-right — the identical arithmetic the Spark side runs.
    */
  def pqOracle(m: Int, k: Int, subDim: Int): String = {
    val subs = (0 until m).map { j =>
      val lo = j * subDim + 1
      val hi = (j + 1) * subDim
      s"""e$j AS (SELECT vec_id, v[$lo:$hi] AS v FROM e),
         |c${j}a AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1
         |      AS INT) AS ck, v AS cv
         |  FROM e$j ORDER BY vec_id LIMIT $k),
         |d${j}a AS (SELECT s.vec_id, s.v, c.ck,
         |    list_reduce(list_transform(list_zip(s.v, c.cv),
         |      z -> (z[1]-z[2])*(z[1]-z[2])), (a,b) -> a+b) AS dist
         |  FROM e$j s CROSS JOIN c${j}a c),
         |a${j}a AS (SELECT vec_id, v, ck AS cluster FROM
         |    (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |        ORDER BY dist, ck) AS rn FROM d${j}a) WHERE rn = 1),
         |x$j AS (SELECT cluster, CAST(unnest(range(len(v))) AS INT) AS dim,
         |    unnest(v) AS x FROM a${j}a),
         |c${j}b AS (SELECT cluster AS ck, list(mu ORDER BY dim) AS cv FROM
         |    (SELECT cluster, dim,
         |       SUM(CAST(round(x*1e6) AS BIGINT)) / (COUNT(*)*1e6) AS mu
         |     FROM x$j GROUP BY cluster, dim) GROUP BY cluster),
         |d${j}b AS (SELECT s.vec_id, c.ck,
         |    list_reduce(list_transform(list_zip(s.v, c.cv),
         |      z -> (z[1]-z[2])*(z[1]-z[2])), (a,b) -> a+b) AS dist
         |  FROM e$j s CROSS JOIN c${j}b c),
         |a${j}b AS (SELECT vec_id, ck AS code, round(dist, 6) AS err FROM
         |    (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |        ORDER BY dist, ck) AS rn FROM d${j}b) WHERE rn = 1)"""
        .stripMargin
    }
    val codeCols = (0 until m)
      .map(j => s"a${j}b.code AS code_$j").mkString(", ")
    val errSum = (0 until m).map(j => s"a${j}b.err")
      .reduceLeft((a, b) => s"($a + $b)")
    val joins = (1 until m)
      .map(j => s"JOIN a${j}b ON a${j}b.vec_id = a0b.vec_id")
      .mkString("\n")
    s"""WITH e AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |${subs.mkString(",\n")}
       |SELECT a0b.vec_id, $codeCols, $errSum AS recon_err
       |FROM a0b
       |$joins
       |ORDER BY a0b.vec_id""".stripMargin
  }

  /** The shared CTE chain w0..wn / m1..mn of the DuckDB replay of
    * TextAnalysis.bpeTrain — generated because the SQL repeats per
    * merge rank: w_r = word encodings after r merges (original word
    * carried through), m_r = the r-th learned merge. bpeOracle reads
    * the m's; the bpeApply oracle reads wn.
    */
  def bpeChain(n: Int): String = {
    val w0 =
      raw"""w0 AS (SELECT word, '(' ||
           |    array_to_string(string_split(word, ''), ')(') || ')' AS w, n
           |  FROM (SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM
           |         (SELECT unnest(string_split_regex(trim(lower(text)),
           |            '\s+')) AS word FROM documents)
           |        WHERE word != '' GROUP BY word))""".stripMargin
    val rounds = (1 to n).flatMap { r =>
      val m =
        s"""m$r AS (SELECT pair, cnt,
           |    string_split(pair, ' ')[1] AS a, string_split(pair, ' ')[2] AS b
           |  FROM (SELECT pair, SUM(n) AS cnt FROM
           |         (SELECT unnest(list_transform(list_zip(syms[1:len(syms)-1],
           |            syms[2:len(syms)]), s -> s[1] || ' ' || s[2])) AS pair, n
           |          FROM (SELECT string_split(trim(w, '()'), ')(') AS syms,
           |                  n FROM w${r - 1}))
           |        GROUP BY pair)
           |  ORDER BY cnt DESC, pair LIMIT 1)""".stripMargin
      val w =
        s"""w$r AS (SELECT word, replace(w, '(' || m$r.a || ')(' || m$r.b ||
           |    ')', '(' || m$r.a || m$r.b || ')') AS w, n
           |  FROM w${r - 1} CROSS JOIN m$r)""".stripMargin
      Seq(m, w)
    }
    (w0 +: rounds).mkString(",\n")
  }

  /** DuckDB replay of Learn.trainQualityClassifier — the identical
    * chained batch-GD arithmetic (6-decimal-rounded sigmoid, scaled
    * BIGINT gradient sums), so the learned weights hash-match
    * bit-for-bit.
    */
  def logregOracle(iters: Int): String =
    logregChain(iters) +
      s"""
         |SELECT feature, weight_micro FROM (
         |  SELECT 'bias' AS feature,
         |    CAST(round(w0 * 1e6) AS BIGINT) AS weight_micro FROM w$iters
         |  UNION ALL SELECT 'x_chars_h', CAST(round(w1 * 1e6) AS BIGINT)
         |    FROM w$iters
         |  UNION ALL SELECT 'x_src0', CAST(round(w2 * 1e6) AS BIGINT)
         |    FROM w$iters)
         |ORDER BY feature""".stripMargin

  /** Learn.scoreQualityClassifier replay: the same trained chain, the
    * same MICRO-ROUNDED weights re-entering scoring (the trainer's
    * surfaced precision, not the raw doubles), bucketed histogram.
    */
  def logregScoreOracle(iters: Int): String =
    logregChain(iters) +
      s""",
         |wm AS (SELECT CAST(round(w0 * 1e6) AS BIGINT) / 1e6 AS b,
         |    CAST(round(w1 * 1e6) AS BIGINT) / 1e6 AS c,
         |    CAST(round(w2 * 1e6) AS BIGINT) / 1e6 AS ww FROM w$iters),
         |scored AS (SELECT round(CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) +
         |    exp(-(wm.b * CAST(1 AS DOUBLE) +
         |      wm.c * (CAST(n_chars AS DOUBLE) / CAST(100 AS DOUBLE)) +
         |      wm.ww * (CASE WHEN source = 'src0' THEN CAST(1 AS DOUBLE)
         |        ELSE CAST(0 AS DOUBLE) END)))), 6) AS p
         |  FROM documents, wm)
         |SELECT CAST(floor(p * 100) AS INT) AS p_bucket,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CAST(round(p * 1e6) AS BIGINT)) AS BIGINT)
         |    AS p_mass_micro
         |FROM scored GROUP BY 1 ORDER BY 1""".stripMargin

  /** Shared CTE tail: every doc scored by the trained chain's
    * micro-rounded weights — the oracle-side twin of
    * Learn.scoredDocs, reused by the calibration and active-learning
    * replays.
    */
  def logregScoredDocs(iters: Int): String =
    logregChain(iters) +
      s""",
         |wm AS (SELECT CAST(round(w0 * 1e6) AS BIGINT) / 1e6 AS b,
         |    CAST(round(w1 * 1e6) AS BIGINT) / 1e6 AS c,
         |    CAST(round(w2 * 1e6) AS BIGINT) / 1e6 AS ww FROM w$iters),
         |scored AS (SELECT doc_id, lang,
         |    CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT)
         |      ELSE CAST(0 AS BIGINT) END AS y,
         |    round(CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) +
         |      exp(-(wm.b * CAST(1 AS DOUBLE) +
         |        wm.c * (CAST(n_chars AS DOUBLE) / CAST(100 AS DOUBLE)) +
         |        wm.ww * (CASE WHEN source = 'src0' THEN CAST(1 AS DOUBLE)
         |          ELSE CAST(0 AS DOUBLE) END)))), 6) AS p
         |  FROM documents, wm)""".stripMargin

  /** Learn.calibrationEce replay: same 6-decimal sigmoid, 10
    * equal-width bins, exact BIGINT micro-mass and gap per bin.
    */
  def calibrationOracle(iters: Int): String =
    logregScoredDocs(iters) +
      """
        |SELECT bin, n_docs, n_pos, p_mass_micro,
        |  abs(p_mass_micro - n_pos * 1000000) AS gap_micro
        |FROM (
        |  SELECT CAST(least(floor(p * 10), 9) AS INT) AS bin,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(y) AS BIGINT) AS n_pos,
        |    CAST(SUM(CAST(round(p * 1e6) AS BIGINT)) AS BIGINT)
        |      AS p_mass_micro
        |  FROM scored GROUP BY 1)
        |ORDER BY bin""".stripMargin

  /** Learn.activeLearningMargin replay: margin off the same
    * micro-rounded p, per-language ROW_NUMBER with the doc_id
    * tie-break — the window form of the TopKAgg selection.
    */
  def marginOracle(iters: Int, k: Int): String =
    logregScoredDocs(iters) +
      s""",
         |m AS (SELECT lang, doc_id,
         |    abs(CAST(round(p * 1e6) AS BIGINT) - 500000) AS margin_micro,
         |    ROW_NUMBER() OVER (PARTITION BY lang
         |      ORDER BY abs(CAST(round(p * 1e6) AS BIGINT) - 500000),
         |        doc_id) AS rk
         |  FROM scored)
         |SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id, margin_micro
         |FROM m WHERE rk <= $k ORDER BY lang, rk""".stripMargin

  /** Learn.classifierAuc replay: the Mann–Whitney rank statistic over
    * the same 6-decimal scores — distinct-score counts, a prefix sum,
    * the 2·R₊ / U₂ integer identities, one double division.
    */
  def aucOracle(iters: Int): String =
    logregScoredDocs(iters) +
      """,
        |g AS (SELECT CAST(round(p * 1e6) AS BIGINT) AS pm,
        |    CAST(COUNT(*) AS BIGINT) AS c, CAST(SUM(y) AS BIGINT) AS cp
        |  FROM scored GROUP BY 1),
        |r AS (SELECT pm, c, cp, COALESCE(SUM(c) OVER (ORDER BY pm
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    CAST(0 AS BIGINT)) AS prev FROM g),
        |t AS (SELECT CAST(SUM(cp) AS BIGINT) AS n_pos,
        |    CAST(SUM(c - cp) AS BIGINT) AS n_neg,
        |    CAST(SUM(cp * (2 * prev + c + 1)) AS BIGINT) AS r2 FROM r)
        |SELECT n_pos, n_neg,
        |  CAST(r2 - n_pos * (n_pos + 1) AS BIGINT) AS u2,
        |  round(CAST(r2 - n_pos * (n_pos + 1) AS DOUBLE) /
        |    (2.0 * n_pos * n_neg), 6) AS auc
        |FROM t""".stripMargin

  /** Learn.conformalThreshold replay: same calibration split, exact
    * ppm rank ceil, min-nc-clearing-the-rank threshold, holdout
    * coverage — all integer.
    */
  def conformalOracle(iters: Int): String =
    logregScoredDocs(iters) +
      """,
        |sd AS (SELECT doc_id, y,
        |    abs(y * 1000000 - CAST(round(p * 1e6) AS BIGINT)) AS nc
        |  FROM scored),
        |cal AS (SELECT * FROM sd WHERE doc_id % 5 = 0),
        |ev AS (SELECT * FROM sd WHERE doc_id % 5 <> 0),
        |k AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cal,
        |    CAST(((COUNT(*) + 1) * 900000 + 999999) // 1000000
        |      AS BIGINT) AS k_rank FROM cal),
        |r AS (SELECT nc, CAST(COUNT(*) AS BIGINT) AS c,
        |    COALESCE(SUM(COUNT(*)) OVER (ORDER BY nc ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND 1 PRECEDING),
        |      CAST(0 AS BIGINT)) AS prev
        |  FROM cal GROUP BY nc),
        |q AS (SELECT MIN(nc) AS q_micro FROM r, k
        |  WHERE prev + c >= k_rank),
        |cov AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_eval,
        |    CAST(SUM(CASE WHEN nc <= q_micro THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_cov FROM ev, q)
        |SELECT k.n_cal, k.k_rank, q.q_micro, cov.n_eval, cov.n_cov,
        |  CAST((n_cov * 1000000) // n_eval AS BIGINT) AS cov_ppm
        |FROM k, q, cov""".stripMargin

  /** Learn.labelNoise replay: integer-div self-confidence thresholds,
    * the same qualification/argmax CASE, 4-cell joint counts.
    */
  def labelNoiseOracle(iters: Int): String =
    logregScoredDocs(iters) +
      """,
        |sd AS (SELECT doc_id, y, CAST(round(p * 1e6) AS BIGINT) AS pm
        |  FROM scored),
        |th AS (SELECT
        |    SUM(CASE WHEN y = 1 THEN pm END) //
        |      SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS t1,
        |    SUM(CASE WHEN y = 0 THEN 1000000 - pm END) //
        |      SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS t0
        |  FROM sd),
        |conf AS (SELECT y AS given,
        |    CASE WHEN pm >= t1 AND 1000000 - pm >= t0 THEN
        |        CASE WHEN pm >= 1000000 - pm THEN 1 ELSE 0 END
        |      WHEN pm >= t1 THEN 1
        |      WHEN 1000000 - pm >= t0 THEN 0
        |      END AS yhat
        |  FROM sd, th),
        |cells AS (SELECT given, CAST(yhat AS BIGINT) AS yhat,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM conf WHERE yhat IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_confident FROM cells)
        |SELECT given, yhat, n, n_confident,
        |  CAST((n * 1000000) // n_confident AS BIGINT) AS share_ppm,
        |  given <> yhat AS is_noise
        |FROM cells, tot ORDER BY given, yhat""".stripMargin

  /** Learn.ipsOffPolicy replay: the same Knuth-multiplicative
    * propensity, BIGINT importance weights, one double division per
    * estimate.
    */
  val ipsOracle: String =
    """WITH e AS (SELECT event_type,
      |    100000 + ((event_id % 2147483648) * 2654435761) % 800001
      |      AS prop_ppm,
      |    CASE WHEN value >= 50.0 THEN 1 ELSE 0 END AS r
      |  FROM events),
      |w AS (SELECT event_type, r,
      |    CAST(1000000000 // prop_ppm AS BIGINT) AS wk FROM e),
      |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM e)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_logged,
      |  CAST(SUM(r) AS BIGINT) AS n_reward,
      |  CAST(SUM(wk) AS BIGINT) AS sum_w_k,
      |  CAST(SUM(r * wk) AS BIGINT) AS sum_rw_k,
      |  round(CAST(SUM(r * wk) AS DOUBLE) / (n_total * 1000.0), 6)
      |    AS ips_value,
      |  round(CAST(SUM(r * wk) AS DOUBLE) / CAST(SUM(wk) AS DOUBLE), 6)
      |    AS snips_value
      |FROM w, nt GROUP BY event_type, n_total
      |ORDER BY event_type""".stripMargin

  /** Learn.drOffPolicy replay: even-half outcome model, odd-half DR
    * correction, one double division — identical chained BIGINTs.
    */
  val drOracle: String =
    """WITH e AS (SELECT event_type,
      |    100000 + ((event_id % 2147483648) * 2654435761) % 800001
      |      AS prop_ppm,
      |    CASE WHEN "value" >= 50.0 THEN 1 ELSE 0 END AS r,
      |    event_id % 2 = 0 AS model_half
      |  FROM events),
      |w AS (SELECT event_type, r, model_half,
      |    CAST(1000000000 // prop_ppm AS BIGINT) AS wk FROM e),
      |rhat AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_model,
      |    CAST((SUM(r) * 1000000) // greatest(COUNT(*), 1) AS BIGINT)
      |      AS rhat_ppm
      |  FROM w WHERE model_half GROUP BY 1),
      |ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_eval FROM w
      |  WHERE NOT model_half)
      |SELECT w.event_type, rhat.n_model, rhat.rhat_ppm,
      |  CAST(COUNT(*) AS BIGINT) AS n_matched, ne.n_eval,
      |  CAST(SUM(wk * (r * 1000000 - rhat.rhat_ppm)) AS BIGINT)
      |    AS sum_corr,
      |  round(CAST(ne.n_eval * rhat.rhat_ppm * 1000 +
      |      SUM(wk * (r * 1000000 - rhat.rhat_ppm)) AS DOUBLE) /
      |    (CAST(ne.n_eval AS DOUBLE) * 1e9), 6) AS dr_value
      |FROM w JOIN rhat ON w.event_type = rhat.event_type, ne
      |WHERE NOT w.model_half
      |GROUP BY w.event_type, rhat.n_model, rhat.rhat_ppm, ne.n_eval
      |ORDER BY w.event_type""".stripMargin

  /** Learn.priorShift replay: confusion rates on the even half,
    * observed positive share on the odd half, the binary BBSE closed
    * form as the same clamped double chain.
    */
  def priorShiftOracle(iters: Int): String =
    logregScoredDocs(iters) +
      """,
        |sd AS (SELECT doc_id, y,
        |    CAST(round(p * 1e6) AS BIGINT) >= 500000 AS pos
        |  FROM scored),
        |cm AS (SELECT
        |    CAST(SUM(CASE WHEN y = 0 AND NOT pos THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c00,
        |    CAST(SUM(CASE WHEN y = 0 AND pos THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c01,
        |    CAST(SUM(CASE WHEN y = 1 AND NOT pos THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c10,
        |    CAST(SUM(CASE WHEN y = 1 AND pos THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c11
        |  FROM sd WHERE doc_id % 2 = 0),
        |mu AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tgt,
        |    CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS m1
        |  FROM sd WHERE doc_id % 2 = 1)
        |SELECT c00, c01, c10, c11, n_tgt, m1,
        |  (c01 * 1000000) // greatest(c00 + c01, 1) AS fpr_ppm,
        |  (c11 * 1000000) // greatest(c10 + c11, 1) AS tpr_ppm,
        |  (m1 * 1000000) // greatest(n_tgt, 1) AS mu1_ppm,
        |  round(least(greatest(CASE
        |    WHEN c11 * (c00 + c01) = c01 * (c10 + c11) THEN 0.5
        |    ELSE (CAST(m1 AS DOUBLE) / CAST(greatest(n_tgt, 1)
        |        AS DOUBLE) -
        |      CAST(c01 AS DOUBLE) / CAST(greatest(c00 + c01, 1)
        |        AS DOUBLE)) /
        |      (CAST(c11 AS DOUBLE) / CAST(greatest(c10 + c11, 1)
        |        AS DOUBLE) -
        |      CAST(c01 AS DOUBLE) / CAST(greatest(c00 + c01, 1)
        |        AS DOUBLE))
        |    END, CAST(0.0 AS DOUBLE)), CAST(1.0 AS DOUBLE)), 6)
        |    AS w1_est
        |FROM cm, mu""".stripMargin

  /** Dedup.bcubed replay: the closure CTE's per-doc labels with
    * doc-id singletons, exact-text truth classes, and the same ppm
    * integer B³ read-off from the contingency table.
    */
  // lazy: ccPairsLabCte is declared further down this object; a
  // strict val here would interpolate null at init order
  lazy val bcubedOracle: String =
    s"""WITH RECURSIVE $ccPairsLabCte,
       |t0 AS (SELECT text, MIN(doc_id) AS tid FROM documents
       |  GROUP BY 1),
       |asg AS (SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id)
       |    AS cid, t0.tid
       |  FROM documents d LEFT JOIN lab l ON l.doc_id = d.doc_id
       |  JOIN t0 ON t0.text = d.text),
       |ct AS (SELECT cid, tid, CAST(COUNT(*) AS BIGINT) AS n_ct
       |  FROM asg GROUP BY 1, 2),
       |szc AS (SELECT cid, CAST(SUM(n_ct) AS BIGINT) AS size_c
       |  FROM ct GROUP BY 1),
       |szt AS (SELECT tid, CAST(SUM(n_ct) AS BIGINT) AS size_t
       |  FROM ct GROUP BY 1),
       |cells AS (SELECT ct.n_ct, szc.size_c, szt.size_t, ct.cid, ct.tid
       |  FROM ct JOIN szc ON ct.cid = szc.cid
       |  JOIN szt ON ct.tid = szt.tid),
       |a AS (SELECT CAST(SUM(n_ct) AS BIGINT) AS n_docs,
       |    CAST(COUNT(DISTINCT cid) AS BIGINT) AS n_clusters,
       |    CAST(COUNT(DISTINCT tid) AS BIGINT) AS n_truth,
       |    CAST(SUM((n_ct * n_ct * 1000000) // size_c) AS BIGINT) AS sp,
       |    CAST(SUM((n_ct * n_ct * 1000000) // size_t) AS BIGINT) AS sr
       |  FROM cells)
       |SELECT n_docs, n_clusters, n_truth,
       |  sp // n_docs AS precision_ppm, sr // n_docs AS recall_ppm,
       |  (2 * (sp // n_docs) * (sr // n_docs)) //
       |    greatest(sp // n_docs + sr // n_docs, 1) AS f1_ppm
       |FROM a""".stripMargin

  /** Learn.bradleyTerry replay: the identical deterministic pairing,
    * win counts, and two integer MM iterations (every divisor clamped
    * greatest(·,1) on both engines; all operands non-negative, so
    * DuckDB's floor-div // equals Spark's truncating div).
    */
  def btOracle(iters: Int): String =
    logregScoredDocs(iters) +
      """,
        |sd AS (SELECT doc_id, lang, CAST(round(p * 1e6) AS BIGINT) AS pm,
        |    doc_id // 2 AS blk, doc_id % 2 = 1 AS odd FROM scored),
        |comps0 AS (SELECT blk,
        |    MAX(CASE WHEN NOT odd THEN lang END) AS la,
        |    MAX(CASE WHEN NOT odd THEN pm END) AS pa,
        |    MAX(CASE WHEN odd THEN lang END) AS lb,
        |    MAX(CASE WHEN odd THEN pm END) AS pb
        |  FROM sd GROUP BY 1),
        |comps AS (SELECT
        |    CASE WHEN pa > pb THEN la WHEN pb > pa THEN lb
        |      ELSE least(la, lb) END AS winner,
        |    CASE WHEN pa > pb THEN lb WHEN pb > pa THEN la
        |      ELSE greatest(la, lb) END AS loser
        |  FROM comps0
        |  WHERE la IS NOT NULL AND lb IS NOT NULL AND la <> lb),
        |wins AS (SELECT winner AS i, loser AS j,
        |    CAST(COUNT(*) AS BIGINT) AS nw FROM comps GROUP BY 1, 2),
        |dirw AS (SELECT i, j, CAST(SUM(nw) AS BIGINT) AS w_ij FROM (
        |    SELECT i, j, nw FROM wins
        |    UNION ALL SELECT j AS i, i AS j, 0 AS nw FROM wins) u
        |  GROUP BY 1, 2),
        |games AS (SELECT i, j, w_ij,
        |    CAST(SUM(w_ij) OVER (PARTITION BY least(i, j),
        |      greatest(i, j)) AS BIGINT) AS g
        |  FROM dirw),
        |totw AS (SELECT i, CAST(SUM(nw) AS BIGINT) AS wins
        |  FROM wins GROUP BY 1),
        |items AS (SELECT d.i, COALESCE(t.wins, 0) AS wins
        |  FROM (SELECT DISTINCT i FROM games) d
        |  LEFT JOIN totw t ON d.i = t.i),
        |ni AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_items FROM items),
        |wi0 AS (SELECT i, CAST(1000000 AS BIGINT) AS w FROM items),
        |d1 AS (SELECT g.i,
        |    CAST(SUM((g.g * 100000000) // greatest(a.w + b.w, 1))
        |      AS BIGINT) AS denom
        |  FROM games g JOIN wi0 a ON g.i = a.i JOIN wi0 b ON g.j = b.i
        |  GROUP BY 1),
        |r1 AS (SELECT it.i,
        |    (it.wins * 1000000000) // greatest(d1.denom, 1) AS raw
        |  FROM items it JOIN d1 ON it.i = d1.i),
        |s1 AS (SELECT CAST(SUM(raw) AS BIGINT) AS sumraw FROM r1),
        |wi1 AS (SELECT i, CAST((raw * 1000000) //
        |    greatest(sumraw // n_items, 1) AS BIGINT) AS w
        |  FROM r1, s1, ni),
        |d2 AS (SELECT g.i,
        |    CAST(SUM((g.g * 100000000) // greatest(a.w + b.w, 1))
        |      AS BIGINT) AS denom
        |  FROM games g JOIN wi1 a ON g.i = a.i JOIN wi1 b ON g.j = b.i
        |  GROUP BY 1),
        |r2 AS (SELECT it.i,
        |    (it.wins * 1000000000) // greatest(d2.denom, 1) AS raw
        |  FROM items it JOIN d2 ON it.i = d2.i),
        |s2 AS (SELECT CAST(SUM(raw) AS BIGINT) AS sumraw FROM r2),
        |wi2 AS (SELECT i, CAST((raw * 1000000) //
        |    greatest(sumraw // n_items, 1) AS BIGINT) AS w
        |  FROM r2, s2, ni),
        |gi AS (SELECT i, CAST(SUM(g) AS BIGINT) AS games
        |  FROM games GROUP BY 1)
        |SELECT it.i AS lang, gi.games, it.wins,
        |  wi1.w AS w1_ppm, wi2.w AS w2_ppm
        |FROM items it JOIN gi ON it.i = gi.i
        |  JOIN wi1 ON it.i = wi1.i JOIN wi2 ON it.i = wi2.i
        |ORDER BY w2_ppm DESC, lang""".stripMargin

  /** DuckDB replay of Pipelines.linkageFellegiSunter — the identical
    * blocked pair base, 2³ agreement-pattern counts, and chained EM
    * arithmetic (micro-rounded posteriors entering BIGINT sums; the
    * M-step divides exact integers), so the fitted parameters and the
    * final per-pattern weights hash-match bit-for-bit.
    */
  def linkageOracle(iters: Int): String = {
    val base =
      """WITH pp AS (SELECT p_partkey, p_brand,
        |    string_split(p_name, ' ')[1] AS adj,
        |    string_split(p_name, ' ')[-1] AS noun,
        |    p_size, p_type,
        |    CAST(floor(p_retailprice / 10) AS BIGINT) AS pb
        |  FROM part),
        |pat AS (SELECT g_adj, g_brand, g_price,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM (SELECT
        |      CASE WHEN a.adj = b.adj THEN 1 ELSE 0 END AS g_adj,
        |      CASE WHEN a.p_brand = b.p_brand THEN 1 ELSE 0 END AS g_brand,
        |      CASE WHEN a.pb = b.pb THEN 1 ELSE 0 END AS g_price
        |    FROM pp a JOIN pp b
        |      ON a.noun = b.noun AND a.p_size = b.p_size
        |      AND a.p_type = b.p_type AND a.p_partkey < b.p_partkey)
        |  GROUP BY 1, 2, 3),
        |p0 AS (SELECT CAST(0.1 AS DOUBLE) AS p,
        |  CAST(0.9 AS DOUBLE) AS m1, CAST(0.9 AS DOUBLE) AS m2,
        |  CAST(0.9 AS DOUBLE) AS m3,
        |  CAST(0.1 AS DOUBLE) AS u1, CAST(0.1 AS DOUBLE) AS u2,
        |  CAST(0.1 AS DOUBLE) AS u3)""".stripMargin
    // pm/pu as left-assoc three-term products, matching the Scala fold
    def mix(v1: String, v2: String, v3: String) =
      s"""(CASE WHEN g_adj = 1 THEN q.$v1 ELSE 1.0 - q.$v1 END) *
         |      (CASE WHEN g_brand = 1 THEN q.$v2 ELSE 1.0 - q.$v2 END) *
         |      (CASE WHEN g_price = 1 THEN q.$v3 ELSE 1.0 - q.$v3 END)"""
        .stripMargin
    def expanded(prev: String) =
      s"""SELECT pat.g_adj, pat.g_brand, pat.g_price, pat.n, q.p,
         |      ${mix("m1", "m2", "m3")} AS pm,
         |      ${mix("u1", "u2", "u3")} AS pu
         |    FROM pat, $prev q""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""e$i AS (SELECT g_adj, g_brand, g_price, n,
         |    CAST(round(((p * pm) / (p * pm + (1.0 - p) * pu)) * 1e6)
         |      AS BIGINT) AS wmu
         |  FROM (${expanded(s"p${i - 1}")})),
         |s$i AS (SELECT
         |    CAST(SUM(n * wmu) AS BIGINT) AS sw,
         |    CAST(SUM(n) * 1000000 AS BIGINT) AS stot,
         |    CAST(SUM(CASE WHEN g_adj = 1 THEN n * wmu ELSE 0 END)
         |      AS BIGINT) AS ma1,
         |    CAST(SUM(CASE WHEN g_brand = 1 THEN n * wmu ELSE 0 END)
         |      AS BIGINT) AS ma2,
         |    CAST(SUM(CASE WHEN g_price = 1 THEN n * wmu ELSE 0 END)
         |      AS BIGINT) AS ma3,
         |    CAST(SUM(CASE WHEN g_adj = 1 THEN n * (1000000 - wmu)
         |      ELSE 0 END) AS BIGINT) AS ua1,
         |    CAST(SUM(CASE WHEN g_brand = 1 THEN n * (1000000 - wmu)
         |      ELSE 0 END) AS BIGINT) AS ua2,
         |    CAST(SUM(CASE WHEN g_price = 1 THEN n * (1000000 - wmu)
         |      ELSE 0 END) AS BIGINT) AS ua3
         |  FROM e$i),
         |p$i AS (SELECT
         |    CAST(sw AS DOUBLE) / CAST(stot AS DOUBLE) AS p,
         |    CAST(ma1 AS DOUBLE) / CAST(sw AS DOUBLE) AS m1,
         |    CAST(ma2 AS DOUBLE) / CAST(sw AS DOUBLE) AS m2,
         |    CAST(ma3 AS DOUBLE) / CAST(sw AS DOUBLE) AS m3,
         |    CAST(ua1 AS DOUBLE) / CAST(stot - sw AS DOUBLE) AS u1,
         |    CAST(ua2 AS DOUBLE) / CAST(stot - sw AS DOUBLE) AS u2,
         |    CAST(ua3 AS DOUBLE) / CAST(stot - sw AS DOUBLE) AS u3
         |  FROM s$i)""".stripMargin
    }
    (base +: rounds).mkString(",\n") +
      s"""
         |SELECT g_adj, g_brand, g_price, n AS n_pairs,
         |  CAST(round(least(pm / pu, 1e12) * 1e6) AS BIGINT) AS lr_micro,
         |  CAST(round(((p * pm) / (p * pm + (1.0 - p) * pu)) * 1e6)
         |    AS BIGINT) AS posterior_micro,
         |  CAST(round(((p * pm) / (p * pm + (1.0 - p) * pu)) * 1e6)
         |    AS BIGINT) > 500000 AS is_match
         |FROM (${expanded(s"p$iters")})
         |ORDER BY g_adj, g_brand, g_price""".stripMargin
  }

  def logregChain(iters: Int): String = {
    val base =
      """WITH f AS (SELECT CAST(1 AS DOUBLE) AS x0,
        |    CAST(n_chars AS DOUBLE) / CAST(100 AS DOUBLE) AS x1,
        |    CASE WHEN source = 'src0' THEN CAST(1 AS DOUBLE)
        |      ELSE CAST(0 AS DOUBLE) END AS x2,
        |    CASE WHEN lang = 'en' THEN CAST(1 AS DOUBLE)
        |      ELSE CAST(0 AS DOUBLE) END AS y
        |  FROM documents),
        |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM f),
        |w0 AS (SELECT CAST(0 AS DOUBLE) AS w0, CAST(0 AS DOUBLE) AS w1,
        |  CAST(0 AS DOUBLE) AS w2)""".stripMargin
    def contrib(x: String) =
      s"""SUM(CAST(round((round(CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) +
         |      exp(-(w.w0 * f.x0 + w.w1 * f.x1 + w.w2 * f.x2))), 6)
         |      - f.y) * f.$x * 1e9) AS BIGINT))""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""g$i AS (SELECT ${contrib("x0")} AS g0,
         |    ${contrib("x1")} AS g1,
         |    ${contrib("x2")} AS g2
         |  FROM f, w${i - 1} w),
         |w$i AS (SELECT
         |    w.w0 - CAST(0.5 AS DOUBLE) * (g.g0 / 1e9) / nn.c AS w0,
         |    w.w1 - CAST(0.5 AS DOUBLE) * (g.g1 / 1e9) / nn.c AS w1,
         |    w.w2 - CAST(0.5 AS DOUBLE) * (g.g2 / 1e9) / nn.c AS w2
         |  FROM w${i - 1} w, g$i g, nn)""".stripMargin
    }
    (base +: rounds).mkString(",\n")
  }

  /** DuckDB replay of TextAnalysis.wordpieceApply: rebuild the vocab
    * from the merge chain's final encodings (w_n symbols ∪ single
    * chars), compute the LONGEST match per (word, position) with a
    * window argmax (non-recursive — SQL's recursive term cannot
    * aggregate), then walk each word with a recursive CTE that hops
    * `len(best piece)` forward; the visited positions' pieces,
    * weighted by word frequency, are the token counts.
    */
  def wordpieceOracle(n: Int): String =
    s"""WITH RECURSIVE ${bpeChain(n)},
       |vocab AS (
       |  SELECT DISTINCT piece FROM (
       |    SELECT unnest(string_split(trim(w, '()'), ')(')) AS piece
       |    FROM w$n
       |    UNION ALL
       |    SELECT unnest(string_split(word, '')) FROM w0)
       |  WHERE piece != ''),
       |pos AS (SELECT word, n,
       |    unnest(generate_series(1, len(word))) AS p FROM w0),
       |best AS (
       |  SELECT word, n, p, piece FROM (
       |    SELECT pos.word, pos.n, pos.p, v.piece,
       |      ROW_NUMBER() OVER (PARTITION BY pos.word, pos.p
       |        ORDER BY len(v.piece) DESC) AS rk
       |    FROM pos JOIN vocab v
       |      ON substr(pos.word, pos.p, len(v.piece)) = v.piece)
       |  WHERE rk = 1),
       |walk AS (
       |  SELECT word, n, CAST(1 AS BIGINT) AS p FROM w0
       |  UNION ALL
       |  SELECT b.word, b.n, wk.p + len(b.piece)
       |  FROM walk wk JOIN best b ON b.word = wk.word AND b.p = wk.p)
       |SELECT b.piece, CAST(SUM(b.n) AS BIGINT) AS n_tokens
       |FROM walk wk JOIN best b ON b.word = wk.word AND b.p = wk.p
       |GROUP BY 1 ORDER BY n_tokens DESC, piece""".stripMargin

  /** The text_bpe_train oracle: the chain's n learned merges, ranked. */
  def bpeOracle(n: Int): String = {
    val sel = (1 to n).map { r =>
      s"""SELECT $r AS merge_rank, a AS left_sym, b AS right_sym,
         |  CAST(cnt AS BIGINT) AS pair_count FROM m$r""".stripMargin
    }.mkString("\nUNION ALL ")
    "WITH " + bpeChain(n) + "\n" + sel + "\nORDER BY merge_rank"
  }

  /** DuckDB replay of TextAnalysis.bpeApply: final encodings from the
    * chain's wn, joined to the corpus token stream.
    */
  def bpeApplyOracle(n: Int): String =
    s"""WITH ${bpeChain(n)},
       |vocab AS (SELECT word,
       |    CAST(len(string_split(trim(w, '()'), ')(')) AS INT) AS bpe_len
       |  FROM w$n),
       |toks AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)),
       |    '\\s+')) AS word FROM documents)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS ws_tokens,
       |  CAST(SUM(bpe_len) AS BIGINT) AS bpe_tokens,
       |  CAST(SUM(bpe_len) AS BIGINT) / CAST(COUNT(*) AS BIGINT)
       |    AS tokens_per_word
       |FROM toks JOIN vocab USING (word)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  /** Shared by dedup_clusters and dedup_clusters_star: both CC
    * variants must converge to the identical cluster labeling, so one
    * recursive-CTE replay oracles both.
    */
  /** The shared pair-graph + transitive-closure CTE chain (3-gram
    * shingles, Jaccard ≥ 0.5, min-id labels) — prefix of every oracle
    * that replays the near-dup clusters.
    */
  val ccPairsLabCte: String =
    """toks AS (
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
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT doc_a, doc_b FROM pr
      |  JOIN sz na ON na.doc_id = doc_a
      |  JOIN sz nb ON nb.doc_id = doc_b
      |  WHERE n_inter / (na.n + nb.n - n_inter) >= 0.5),
      |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
      |  UNION ALL SELECT doc_b, doc_a FROM pairs),
      |reach(src, dst) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      |lab AS (SELECT src AS doc_id, MIN(dst) AS cluster_id
      |        FROM reach GROUP BY 1)""".stripMargin

  val ccClustersOracle: String =
    s"""WITH RECURSIVE $ccPairsLabCte,
       |cs AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
       |       FROM lab GROUP BY 1)
       |SELECT l.doc_id, l.cluster_id, cs.cluster_size,
       |  CAST(l.doc_id = l.cluster_id AS INT) AS is_keeper
       |FROM lab l JOIN cs ON l.cluster_id = cs.cluster_id
       |ORDER BY l.doc_id""".stripMargin

  /** p_split_leakage_safe oracle: clusters re-derived by the closure
    * CTE, the same masked Knuth bucket on the cluster unit, and the
    * straddle count RECOUNTED from the pair set (must come out 0).
    */
  val leakageSplitOracle: String =
    s"""WITH RECURSIVE $ccPairsLabCte,
       |units AS (SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS unit
       |          FROM documents d LEFT JOIN lab l ON l.doc_id = d.doc_id),
       |asg AS (SELECT doc_id, unit,
       |    CASE WHEN ((unit % 2147483648) * 2654435761) % 100 < 80
       |           THEN 'train'
       |         WHEN ((unit % 2147483648) * 2654435761) % 100 < 90
       |           THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM units),
       |strad AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_straddle
       |  FROM pairs p JOIN asg x ON x.doc_id = p.doc_a
       |  JOIN asg y ON y.doc_id = p.doc_b WHERE x.split <> y.split)
       |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(COUNT(DISTINCT unit) AS BIGINT) AS n_units,
       |  MIN(doc_id) AS min_doc_id, n_straddle
       |FROM asg CROSS JOIN strad
       |GROUP BY split, n_straddle ORDER BY split""".stripMargin

  /** Shared oracle of both incremental-LSH audit forms: the exact
    * delta→history near-pair truth from the ngram CTEs.
    */
  val lshAuditOracle: String =
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
      |jc AS (
      |  SELECT a.doc_id AS doc_id, b.doc_id AS hist_id
      |  FROM sh a JOIN sh b ON a.s = b.s
      |    AND a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
      |  JOIN sz na ON na.doc_id = a.doc_id
      |  JOIN sz nb ON nb.doc_id = b.doc_id
      |  GROUP BY 1, 2, na.n, nb.n
      |  HAVING count(*) / (na.n + nb.n - count(*)) >= 0.5)
      |SELECT
      |  (SELECT CAST(count(*) AS BIGINT) FROM jc) AS n_true_cross_pairs,
      |  (SELECT CAST(count(*) AS BIGINT) FROM documents
      |    WHERE doc_id % 5 = 0) AS n_delta,
      |  TRUE AS recall_ok, TRUE AS all_matches_true""".stripMargin

  /** dedup_keep_best oracle: the recursive-CTE transitive closure
    * (ccClustersOracle's CTE chain) extended with the text_quality
    * score and a per-cluster (quality desc, doc_id) argmax window —
    * the keep-best policy replayed end to end.
    */
  val keepBestOracle: String =
    """WITH RECURSIVE toks AS (
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
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT doc_a, doc_b FROM pr
      |  JOIN sz na ON na.doc_id = doc_a
      |  JOIN sz nb ON nb.doc_id = doc_b
      |  WHERE n_inter / (na.n + nb.n - n_inter) >= 0.5),
      |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
      |  UNION ALL SELECT doc_b, doc_a FROM pairs),
      |reach(src, dst) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      |lab AS (SELECT src AS doc_id, MIN(dst) AS cluster_id
      |        FROM reach GROUP BY 1),
      |cs AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
      |       FROM lab GROUP BY 1),
      |q AS (SELECT doc_id,
      |    round(0.5 * (CAST(len(list_distinct(string_split_regex(
      |        trim(lower(text)), '\s+'))) AS INT)
      |      / CAST(len(string_split_regex(trim(lower(text)), '\s+'))
      |        AS INT))
      |      + 0.5 * least(CAST(len(string_split_regex(trim(lower(text)),
      |        '\s+')) AS INT) / 100.0, 1.0), 4) AS quality_score
      |  FROM documents),
      |keep AS (SELECT cluster_id, doc_id AS keeper_doc_id FROM (
      |    SELECT l.cluster_id, l.doc_id,
      |      row_number() OVER (PARTITION BY l.cluster_id
      |        ORDER BY q.quality_score DESC, l.doc_id) AS rn
      |    FROM lab l JOIN q USING (doc_id)) WHERE rn = 1)
      |SELECT l.doc_id, l.cluster_id, cs.cluster_size, q.quality_score,
      |  k.keeper_doc_id,
      |  CAST(l.doc_id = k.keeper_doc_id AS INT) AS kept
      |FROM lab l JOIN cs USING (cluster_id) JOIN q USING (doc_id)
      |  JOIN keep k USING (cluster_id)
      |ORDER BY l.doc_id""".stripMargin

  /** Shared by p_merge_cdc and sink_versioned_merge: the versioned
    * MERGE applies the identical I/U/D batch (Pipelines.cdcChanges),
    * so one full-outer replay oracles both.
    */
  val mergeCdcOracle: String =
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
      |    FROM snap WHERE o_orderkey % 13 = 0)
      |SELECT COALESCE(s.o_orderkey, c.o_orderkey) AS o_orderkey,
      |  COALESCE(c.c_status, s.o_orderstatus) AS o_orderstatus,
      |  COALESCE(c.c_total, s.o_totalprice) AS o_totalprice
      |FROM snap s FULL OUTER JOIN changes c
      |  ON s.o_orderkey = c.o_orderkey
      |WHERE c.op IS NULL OR c.op <> 'D'
      |ORDER BY o_orderkey""".stripMargin

  /** The exact 3-gram-Jaccard near-dup pair set in DuckDB SQL — the
    * dedup_ngram_jaccard oracle, factored out because the
    * minhash/simhash/winnow RECALL assertions replay its pair COUNT
    * as their oracle-exact column (Assertions.pairRecall).
    */
  val ngramPairSql: String =
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
      |SELECT doc_a, doc_b,
      |  n_inter / (na.n + nb.n - n_inter) AS jaccard
      |FROM pr
      |JOIN sz na ON na.doc_id = doc_a
      |JOIN sz nb ON nb.doc_id = doc_b
      |WHERE n_inter / (na.n + nb.n - n_inter) >= 0.5
      |ORDER BY doc_a, doc_b""".stripMargin

  /** dedup_prefix_stats oracle: the prefix index REBUILT in plain SQL
    * (document frequencies, a rarest-first rank window, prefix length
    * n − ⌈t·n⌉ + 1, the length-filtered self-join) so candidate
    * counts and both comparison booleans replay independently —
    * nothing is a literal-true bound.
    */
  val prefixStatsSql: String =
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
      |  GROUP BY 1, 2),
      |truth AS (SELECT CAST(count(*) AS BIGINT) AS n_true_pairs
      |  FROM pr JOIN sz na ON na.doc_id = doc_a
      |  JOIN sz nb ON nb.doc_id = doc_b
      |  WHERE n_inter / (na.n + nb.n - n_inter) >= 0.5),
      |fullc AS (SELECT CAST(count(*) AS BIGINT) AS n_cand_full
      |  FROM (SELECT DISTINCT a.doc_id, b.doc_id
      |    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id)),
      |dfreq AS (SELECT s, count(*) AS df FROM sh GROUP BY s),
      |ord AS (SELECT sh.doc_id, sh.s,
      |    row_number() OVER (PARTITION BY sh.doc_id
      |      ORDER BY dfreq.df, sh.s) AS r,
      |    count(*) OVER (PARTITION BY sh.doc_id) AS n
      |  FROM sh JOIN dfreq USING (s)),
      |pref AS (SELECT doc_id, s, n, r FROM ord
      |  WHERE r <= n - CAST(ceil(n * 0.5) AS BIGINT) + 1),
      |prefc AS (SELECT CAST(count(*) AS BIGINT) AS n_cand_prefix
      |  FROM (SELECT DISTINCT a.doc_id, b.doc_id
      |    FROM pref a JOIN pref b ON a.s = b.s AND a.doc_id < b.doc_id
      |      AND b.n >= a.n * 0.5 AND a.n >= b.n * 0.5
      |      AND 1 + least(a.n - a.r, b.n - b.r) >=
      |        CAST(ceil(greatest(a.n, b.n) * 0.5) AS BIGINT))),
      |probef AS (SELECT CAST(COALESCE(SUM(df * (df - 1) // 2), 0)
      |    AS BIGINT) AS n_probe_full FROM dfreq),
      |probep AS (SELECT CAST(COALESCE(SUM(df2 * (df2 - 1) // 2), 0)
      |    AS BIGINT) AS n_probe_prefix
      |  FROM (SELECT s, count(*) AS df2 FROM pref GROUP BY s))
      |SELECT n_true_pairs, n_cand_prefix, n_cand_full,
      |  n_probe_prefix, n_probe_full,
      |  (n_cand_prefix < n_cand_full) AS prefix_prunes,
      |  (n_probe_prefix < n_probe_full) AS probe_prunes,
      |  (n_cand_prefix >= n_true_pairs) AS covers_truth
      |FROM truth, prefc, fullc, probep, probef""".stripMargin

  /** Oracle for the pair-recall assertion queries: the truth-pair
    * count replays exactly; the bound booleans replay as `true` —
    * the Spark side computes them for real, so a recall/precision
    * regression hash-mismatches.
    */
  val pairRecallOracle: String =
    s"""SELECT CAST(count(*) AS BIGINT) AS n_true_pairs,
       | true AS recall_ok, true AS precision_ok
       |FROM ($ngramPairSql) t""".stripMargin

}
