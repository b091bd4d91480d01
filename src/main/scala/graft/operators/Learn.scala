package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** In-engine model training primitives. Alongside kmeans (clustering)
  * and the PQ codebooks (quantization), this adds the supervised
  * member of the family: a distributed batch-gradient logistic
  * regression — the shape behind every "train a small quality / lang /
  * toxicity classifier over the corpus" step in an LLM data pipeline
  * (fastText-style linear scorers).
  *
  * Scale design mirrors kmeans:
  *  - each iteration is ONE full codegen pass over the feature
  *    relation producing a d+1-element gradient via partial
  *    aggregation — executors hold O(d) state, nothing per-row;
  *  - the driver holds and updates the d-element weight vector (the
  *    legal iterative-collect shape) and re-broadcasts it as literals
  *    in the next pass's expression;
  *  - iteration count is fixed and small; work per iteration is
  *    embarrassingly parallel over rows.
  *
  * Cross-engine exactness (the kmeans discipline): the sigmoid is
  * rounded to 6 decimals before it enters the gradient (kills
  * last-ulp exp() differences between libm implementations), and
  * per-row gradient contributions are summed as scaled BIGINTs so the
  * total is independent of partitioning/order. The DuckDB oracle
  * replays the identical chained arithmetic (SparkEntry.logregOracle),
  * so the learned weights hash-match bit-for-bit.
  */
object Learn {

  /** Train y = P(lang = 'en') from [bias, n_chars/100, source = src0]
    * over the documents table; returns the learned weights, one row
    * per feature. Deliberately tiny feature space — the point is the
    * distributed-training machinery, exact at any corpus size.
    */
  def trainQualityClassifier(s: SparkSession, dir: String,
      iters: Int = 3, lr: Double = 0.5): DataFrame = {
    val feats = Tables.documents(s, dir).select(
      lit(1.0).as("x0"),
      (col("n_chars") / 100.0).as("x1"),
      when(col("source") === "src0", 1.0).otherwise(0.0).as("x2"),
      when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))
    var w = Array(0.0, 0.0, 0.0)
    for (_ <- 1 to iters) {
      val z = lit(w(0)) * col("x0") + lit(w(1)) * col("x1") +
        lit(w(2)) * col("x2")
      val err = round(lit(1.0) / (lit(1.0) + exp(-z)), 6) - col("y")
      def g(x: Column) = sum(round(err * x * 1e9).cast("long"))
      val r = feats.agg(g(col("x0")).as("g0"), g(col("x1")).as("g1"),
        g(col("x2")).as("g2"), count(lit(1)).as("n")).head()
      val n = r.getLong(3).toDouble
      w = Array.tabulate(3)(i => w(i) - lr * (r.getLong(i) / 1e9) / n)
    }
    import s.implicits._
    // weights surface as micro-scaled BIGINTs THROUGH Spark's round
    // (half-away-from-zero, same as DuckDB's) — double-formatting
    // differences can't leak into the hash compare
    Seq("bias" -> w(0), "x_chars_h" -> w(1), "x_src0" -> w(2))
      .toDF("feature", "w")
      .select(col("feature"),
        round(col("w") * 1e6).cast("long").as("weight_micro"))
      .orderBy("feature")
  }

  /** Inference over the trained model — the batch-scoring half of the
    * train→score pipeline. Weights come back from the trainer as
    * micro-scaled longs, re-enter the plan as literals (a model is
    * O(d) — broadcast-as-constants, never a join), and every row gets
    * a 6-decimal-rounded probability in the same single codegen pass
    * that buckets it. Output is the per-bucket histogram + exact
    * probability mass, so the driver check pins the whole score
    * distribution, not a sample.
    */
  def scoreQualityClassifier(s: SparkSession, dir: String): DataFrame = {
    val w = graft.DriverState
      .collectBounded(trainQualityClassifier(s, dir), 16,
        "scoreQualityClassifier.weights") // O(d), d = 3 features
      .map(r => r.getString(0) -> r.getLong(1) / 1e6).toMap
    val z = lit(w("bias")) * lit(1.0) +
      lit(w("x_chars_h")) * (col("n_chars") / 100.0) +
      lit(w("x_src0")) * when(col("source") === "src0", 1.0).otherwise(0.0)
    val p = round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
    Tables.documents(s, dir)
      .select(floor(p * 100).cast("int").as("p_bucket"), p.as("p"))
      .groupBy("p_bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(round(col("p") * 1e6).cast("long")).as("p_mass_micro"))
      .orderBy("p_bucket")
  }

  /** Mean log-loss of the w-scored model over the same features —
    * spec support for "training actually descended".
    */
  private[operators] def logLoss(s: SparkSession, dir: String,
      w: Seq[Double]): Double = {
    val feats = Tables.documents(s, dir).select(
      lit(1.0).as("x0"), (col("n_chars") / 100.0).as("x1"),
      when(col("source") === "src0", 1.0).otherwise(0.0).as("x2"),
      when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))
    val z = lit(w(0)) * col("x0") + lit(w(1)) * col("x1") +
      lit(w(2)) * col("x2")
    val p = lit(1.0) / (lit(1.0) + exp(-z))
    feats.agg(avg(-(col("y") * log(p) +
      (lit(1.0) - col("y")) * log(lit(1.0) - p)))).head().getDouble(0)
  }

  /** The trained model's 6-decimal-rounded probability column over the
    * documents table — the scoring expression scoreQualityClassifier,
    * calibrationEce and activeLearningMargin all share (micro-rounded
    * weights re-entering as literals, one codegen pass).
    */
  private[operators] def scoredDocs(s: SparkSession, dir: String): DataFrame = {
    val w = graft.DriverState
      .collectBounded(trainQualityClassifier(s, dir), 16,
        "scoredDocs.weights") // O(d), d = 3 features
      .map(r => r.getString(0) -> r.getLong(1) / 1e6).toMap
    val z = lit(w("bias")) * lit(1.0) +
      lit(w("x_chars_h")) * (col("n_chars") / 100.0) +
      lit(w("x_src0")) * when(col("source") === "src0", 1.0).otherwise(0.0)
    Tables.documents(s, dir)
      .withColumn("p", round(lit(1.0) / (lit(1.0) + exp(-z)), 6))
      .withColumn("y",
        when(col("lang") === "en", 1L).otherwise(0L))
  }

  /** Calibration audit of the trained classifier — the reliability
    * diagram behind "can this quality/lang scorer's probabilities be
    * thresholded, or only ranked": 10 equal-width confidence bins,
    * each with its doc count, empirical positive count and predicted
    * probability mass. gap_micro = |Σp − Σy|·10⁶ is the bin's
    * calibration gap; Σ_bins gap_micro / (N·10⁶) is the expected
    * calibration error (the spec pins it; the gate pins every bin).
    *
    * Exactness: p is the trainer's 6-decimal-rounded sigmoid, so the
    * per-bin mass is an exact BIGINT micro-sum (order-free) and the
    * gap is integer arithmetic — no tolerance anywhere. Scale shape:
    * one codegen scoring pass into a 10-group hash aggregate with
    * map-side partials; state is O(bins).
    */
  def calibrationEce(s: SparkSession, dir: String): DataFrame =
    scoredDocs(s, dir)
      .select(least(floor(col("p") * 10), lit(9L)).cast("int").as("bin"),
        col("p"), col("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("y")).as("n_pos"),
        sum(round(col("p") * 1e6).cast("long")).as("p_mass_micro"))
      .withColumn("gap_micro",
        abs(col("p_mass_micro") - col("n_pos") * 1000000L))
      .orderBy("bin")

  /** Bucketed prefix totals over a (micro-value → count) aggregate:
    * adds `prev` = Σ counts over strictly-smaller values, with NO
    * single-partition window. The micro codomain is [0, 10⁶] at any
    * corpus size (6-decimal probabilities), so fixed-width buckets
    * (value div 10⁴ → ≤ 101) are constant-bounded: per-bucket totals
    * collect to an O(101) literal offset map and the running sum is
    * bucket-local — the same legality class as Analytics
    * .withGlobalRank's bucketed rank core.
    */
  private def prefixTotals(g: DataFrame, valCol: String,
      cntCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed = g.withColumn("bkt",
      expr(s"cast($valCol div 10000 as int)"))
    val counts = bucketed.groupBy("bkt")
      .agg(sum(col(cntCol)).as("tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.zip(counts.scanLeft(0L)(_ + _._2))
      .map { case ((b, _), off) => (b, off) }
    val offExpr =
      if (offsets.isEmpty) lit(0L)
      else element_at(map(offsets.toSeq.flatMap {
        case (b, o) => Seq(lit(b), lit(o)) }: _*), col("bkt"))
    val w = Window.partitionBy(col("bkt")).orderBy(col(valCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.withColumn("prev",
      offExpr + coalesce(sum(col(cntCol)).over(w), lit(0L)))
      .drop("bkt")
  }

  /** Exact ROC-AUC of the trained classifier via the Mann–Whitney
    * rank statistic with average-rank tie handling: over the distinct
    * 6-decimal scores, 2·R₊ = Σ cp·(2·prev + c + 1) (cp positives at
    * the score, c total, prev = rows strictly below), and
    * U₂ = 2·R₊ − n₊(n₊+1) counts concordant pairs ×2 — all BIGINT, so
    * the statistic is partition-order-free and the DuckDB replay
    * hash-matches. auc = U₂ / (2·n₊·n₋) is ONE double division over
    * exact integers (the modularity discipline). Scale shape: one
    * scoring pass into a ≤10⁶+1-group aggregate (score codomain, not
    * corpus), bucketed prefix totals, O(1) final row. BIGINT headroom:
    * U₂ < 2³¹ at 10⁵ docs, overflows past ~3·10⁹ docs — at that scale
    * the one sum moves to DECIMAL(38,0), nothing else changes.
    */
  def classifierAuc(s: SparkSession, dir: String): DataFrame = {
    val g = scoredDocs(s, dir)
      .select(round(col("p") * 1e6).cast("long").as("pm"), col("y"))
      .groupBy("pm")
      .agg(count(lit(1)).as("c"), sum(col("y")).as("cp"))
    prefixTotals(g, "pm", "c")
      .agg(sum(col("cp")).as("n_pos"),
        sum(col("c") - col("cp")).as("n_neg"),
        sum(col("cp") * (lit(2L) * col("prev") + col("c") + lit(1L)))
          .as("r2"))
      .select(col("n_pos"), col("n_neg"),
        (col("r2") - col("n_pos") * (col("n_pos") + lit(1L))).as("u2"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        round(col("u2").cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg")), 6).as("auc"))
  }

  /** Split-conformal prediction threshold + holdout coverage — the
    * distribution-free guarantee step before shipping the classifier
    * as a filter: on the calibration split (doc_id ≡ 0 mod 5) the
    * nonconformity score is nc = |y·10⁶ − p_micro|; the threshold is
    * the ⌈(n+1)(1−α)⌉-th smallest nc (α = 0.1, rank in exact ppm
    * integer ceil), found as min{nc : cum ≥ k} over the bucketed
    * prefix totals — never a global sort. Coverage is then measured
    * on the disjoint eval split; split conformal guarantees
    * E[coverage] ≥ 1−α. All columns integer; the two scalar joins are
    * provably-1-row global aggregates (broadcast).
    */
  def conformalThreshold(s: SparkSession, dir: String): DataFrame = {
    val sd = scoredDocs(s, dir)
      .select(col("doc_id"),
        round(col("p") * 1e6).cast("long").as("pm"), col("y"))
      .withColumn("nc", abs(col("y") * lit(1000000L) - col("pm")))
    val cal = sd.filter(col("doc_id") % 5 === 0)
    val ev = sd.filter(col("doc_id") % 5 =!= 0)
    val g = cal.groupBy("nc").agg(count(lit(1)).as("c"))
    val k = g.agg(sum(col("c")).as("n_cal"))
      .select(col("n_cal"),
        expr("((n_cal + 1) * 900000 + 999999) div 1000000").as("k_rank"))
    val q = prefixTotals(g, "nc", "c").crossJoin(k)
      .filter(col("prev") + col("c") >= col("k_rank"))
      .agg(min(col("nc")).as("q_micro"))
    val cov = ev.crossJoin(q)
      .agg(count(lit(1)).as("n_eval"),
        sum(when(col("nc") <= col("q_micro"), 1L).otherwise(0L))
          .as("n_cov"))
    k.crossJoin(q).crossJoin(cov)
      .select(col("n_cal"), col("k_rank"), col("q_micro"),
        col("n_eval"), col("n_cov"),
        expr("(n_cov * 1000000) div n_eval").as("cov_ppm"))
  }

  /** IPS / SNIPS off-policy evaluation over the event log — the
    * counterfactual "what would policy 'always serve action a' be
    * worth" estimate behind ranking/filter-policy iteration without
    * an online test. The logging propensity is a deterministic
    * integer hash of the event id (Knuth multiplicative, the
    * leakage-split discipline) into [0.1, 0.9] ppm-scaled; the
    * importance weight wₖ = 10⁹ div prop_ppm ≈ 10³/p is exact BIGINT
    * per row, so Σw and Σr·w are partition-order-free and the two
    * value estimates are ONE double division each. IPS divides by the
    * full log size (events where the target action was not logged
    * contribute 0); SNIPS self-normalizes by Σw. One pass, one
    * |actions|-group aggregate, a scalar-broadcast total.
    */
  def ipsOffPolicy(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("event_type"),
        (lit(100000L) + (col("event_id") % lit(2147483648L)) *
          lit(2654435761L) % lit(800001L)).as("prop_ppm"),
        when(col("value") >= 50.0, 1L).otherwise(0L).as("r"))
      .withColumn("wk", expr("1000000000 div prop_ppm"))
    e.groupBy("event_type")
      .agg(count(lit(1)).as("n_logged"),
        sum(col("r")).as("n_reward"),
        sum(col("wk")).as("sum_w_k"),
        sum(col("r") * col("wk")).as("sum_rw_k"))
      .crossJoin(e.agg(count(lit(1)).as("n_total")))
      .select(col("event_type"), col("n_logged"), col("n_reward"),
        col("sum_w_k"), col("sum_rw_k"),
        round(col("sum_rw_k").cast("double") /
          (col("n_total") * lit(1000.0)), 6).as("ips_value"),
        round(col("sum_rw_k").cast("double") /
          col("sum_w_k").cast("double"), 6).as("snips_value"))
      .orderBy("event_type")
  }

  /** Confident-learning label-noise matrix (Northcutt's C_{given,pred}
    * joint counts) over the trained classifier — the "which labels are
    * probably wrong" audit before treating lang as ground truth. The
    * self-confidence threshold of class j is the mean class-j
    * probability among docs LABELED j, exact as micro-mass div count;
    * a doc counts toward (given, ŷ) when its class-ŷ probability
    * clears t_ŷ (argmax on double qualification, class 1 on ties);
    * unconfident docs are excluded, per the method. Off-diagonal
    * cells estimate the label-noise mass. One scoring pass, two
    * scalar-broadcast threshold rows, a 4-group aggregate.
    */
  def labelNoise(s: SparkSession, dir: String): DataFrame = {
    val sd = scoredDocs(s, dir)
      .select(col("doc_id"),
        round(col("p") * 1e6).cast("long").as("pm"), col("y"))
    val th = sd.agg(
        sum(when(col("y") === 1, col("pm"))).as("s1"),
        sum(when(col("y") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("y") === 0, lit(1000000L) - col("pm"))).as("s0"),
        sum(when(col("y") === 0, 1L).otherwise(0L)).as("n0"))
      .select(expr("s1 div n1").as("t1"), expr("s0 div n0").as("t0"))
    val conf = sd.crossJoin(th)
      .withColumn("c1", col("pm") >= col("t1"))
      .withColumn("c0", lit(1000000L) - col("pm") >= col("t0"))
      .withColumn("yhat",
        when(col("c1") && col("c0"),
          when(col("pm") >= lit(1000000L) - col("pm"), 1L).otherwise(0L))
          .when(col("c1"), 1L)
          .when(col("c0"), 0L))
      .filter(col("yhat").isNotNull)
    val cells = conf.groupBy(col("y").as("given"), col("yhat"))
      .agg(count(lit(1)).as("n"))
    cells.crossJoin(cells.agg(sum(col("n")).as("n_confident")))
      .select(col("given"), col("yhat"), col("n"), col("n_confident"),
        expr("(n * 1000000) div n_confident").as("share_ppm"),
        (col("given") =!= col("yhat")).as("is_noise"))
      .orderBy("given", "yhat")
  }

  /** Margin-based uncertainty sampling — the active-learning
    * selection step of a labeling pipeline: the k docs per language
    * whose predicted probability sits closest to the 0.5 decision
    * boundary are the ones a labeling budget buys the most model
    * improvement from. margin_micro = |p·10⁶ − 500000| is exact
    * BIGINT off the 6-decimal sigmoid; selection is the mergeable
    * TopKAgg on (−margin, doc_id) — map-side partials cap each task
    * at k rows per language, O(k × tasks) on the wire, never a
    * per-language window sort over the corpus.
    */
  def activeLearningMargin(s: SparkSession, dir: String,
      k: Int = 20): DataFrame = {
    import org.apache.spark.sql.functions.udaf
    val topk = udaf(new graft.functions.TopKAgg(k))
    scoredDocs(s, dir)
      .select(col("lang"), col("doc_id"),
        abs(round(col("p") * 1e6).cast("long") - 500000L)
          .as("margin_micro"))
      .groupBy("lang")
      .agg(topk((-col("margin_micro")).cast("double"), col("doc_id"))
        .as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("lang"), (col("pos") + 1).cast("long").as("rk"),
        col("t._2").as("doc_id"),
        (-col("t._1")).cast("long").as("margin_micro"))
      .orderBy("lang", "rk")
  }

  /** Bradley–Terry strength ranking from pairwise preferences — the
    * aggregate behind reward-model / RLHF preference data: which
    * source population wins head-to-head comparisons. Comparisons are
    * deterministic: consecutive doc ids pair up (block = id div 2),
    * same-language pairs drop, and the higher 6-decimal classifier
    * score wins (ties to the lexicographically smaller language). Two
    * minorization–maximization iterations fit the strengths:
    * w_i ← W_i / Σ_j g_ij/(w_i+w_j), renormalized to mean 10⁶ ppm.
    *
    * Every step is integer: the MM denominator term is
    * (g_ij·10⁸) div (w_i+w_j), the update (W_i·10⁹) div denom, the
    * renormalization (raw·10⁶) div (Σraw div n_items) — all divisors
    * clamped with greatest(·,1) on BOTH engines (the boost_pm
    * discipline), so the oracle replays the chained arithmetic
    * verbatim. Scale: the corpus collapses to an O(langs²) pair-count
    * table in one pass (one groupBy on id div 2 — pairing needs no
    * join); the MM iterations then run DRIVER-SIDE on that collected
    * constant-size table (vocabulary-bounded state, like the trained
    * classifier weights) — nothing downstream of the first aggregate
    * depends on corpus size, and nothing constant-size rides the
    * scheduler.
    */
  def bradleyTerry(s: SparkSession, dir: String): DataFrame = {
    val sd = scoredDocs(s, dir)
      .select(col("doc_id"), col("lang"),
        round(col("p") * 1e6).cast("long").as("pm"))
      .withColumn("blk", expr("doc_id div 2"))
      .withColumn("odd", col("doc_id") % 2 === 1)
    val comps = sd.groupBy("blk")
      .agg(max(when(!col("odd"), col("lang"))).as("la"),
        max(when(!col("odd"), col("pm"))).as("pa"),
        max(when(col("odd"), col("lang"))).as("lb"),
        max(when(col("odd"), col("pm"))).as("pb"))
      .filter(col("la").isNotNull && col("lb").isNotNull &&
        col("la") =!= col("lb"))
      .select(
        when(col("pa") > col("pb"), col("la"))
          .when(col("pb") > col("pa"), col("lb"))
          .otherwise(least(col("la"), col("lb"))).as("winner"),
        when(col("pa") > col("pb"), col("lb"))
          .when(col("pb") > col("pa"), col("la"))
          .otherwise(greatest(col("la"), col("lb"))).as("loser"))
    // POOLED corpus collapse (round-12): wins is the O(langs²) table
    // every downstream branch (games, items, totW, both MM iterations)
    // re-derives — uncached, the logical DAG duplicated the corpus
    // aggregate subtree ~20x and correctness-of-scale rested on AQE
    // exchange reuse deduping identical shuffle subtrees at runtime.
    // Caching makes the single-corpus-scan property structural: one
    // scan+shuffle builds 25-ish rows, everything after reads memory
    // (PlanQualitySpec pins the InMemoryTableScan).
    val wins = graft.CachePool.cached(s, s"learn.btWins:$dir") {
      // localCheckpoint, not bare cache: ~20 downstream branches each
      // replan their whole logical subtree, and with an
      // InMemoryRelation that subtree still CONTAINS the corpus
      // collapse (Catalyst re-canonicalizes it per action — measured
      // as most of the query's wall at sf0.1). The checkpoint cuts
      // the lineage to a flat LogicalRDD, the iterative-op discipline.
      comps.groupBy(col("winner").as("i"), col("loser").as("j"))
        .agg(count(lit(1)).as("nw"))
        .localCheckpoint()
    }
    // MM fixpoint on the COLLECTED O(langs²) table — vocabulary-
    // bounded driver state (≤ |langs|² rows by construction), the
    // trainQualityClassifier discipline (round-12): the corpus-scale
    // work ends at the pooled wins aggregate, and iterating a ≤25-row
    // fixpoint as ~35 distributed stages was pure scheduler latency
    // (measured 5.0 s at sf0.1 for a table that fits in a cache
    // line). All arithmetic is the same clamped integer chain the
    // DataFrame form ran — Long./ on non-negative operands IS
    // Spark's div — so the DuckDB oracle replays it unchanged.
    // bound guard (round-12 verdict ask #6): the collected wins table
    // is ≤ |langs|·(|langs|−1) directed pairs by construction — the
    // language domain is single-digit in every fixture, 4096 covers a
    // 64-language corpus with margin while still failing loudly long
    // before driver memory is at risk if pairing ever regressed to a
    // data-proportional key
    val winRows = graft.DriverState
      .collectBounded(wins, 4096, "bradleyTerry.wins")
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val wMap = winRows.map { case (i, j, nw) => (i, j) -> nw }.toMap
      .withDefaultValue(0L)
    // directed-complete games table: g(i,j) = g(j,i) = wins + losses
    val dirPairs = winRows
      .flatMap { case (i, j, _) => Seq((i, j), (j, i)) }.distinct
    val g = dirPairs
      .map { case (i, j) => (i, j) -> (wMap((i, j)) + wMap((j, i))) }
      .toMap
    val itemsSeq = dirPairs.map(_._1).distinct.sorted
    val adj = dirPairs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val totW = winRows.groupBy(_._1).view
      .mapValues(_.map(_._3).sum).toMap.withDefaultValue(0L)
    val nItems = itemsSeq.size.toLong
    def iterate(w: Map[String, Long]): Map[String, Long] = {
      val raw = itemsSeq.map { i =>
        val denom = adj(i).map(j =>
          g((i, j)) * 100000000L / math.max(w(i) + w(j), 1L)).sum
        i -> totW(i) * 1000000000L / math.max(denom, 1L)
      }.toMap
      val sumraw = raw.values.sum
      itemsSeq.map(i =>
        i -> raw(i) * 1000000L / math.max(sumraw / nItems, 1L)).toMap
    }
    val out: Seq[(String, Long, Long, Long, Long)] =
      if (itemsSeq.isEmpty) Seq.empty
      else {
        val w1 = iterate(itemsSeq.map(_ -> 1000000L).toMap)
        val w2 = iterate(w1)
        itemsSeq.map(i => (i, adj(i).map(j => g((i, j))).sum,
          totW(i), w1(i), w2(i))).toSeq
      }
    import s.implicits._
    out.toDF("lang", "games", "wins", "w1_ppm", "w2_ppm")
      .orderBy(desc("w2_ppm"), col("lang"))
  }

  /** Doubly-robust off-policy value — the variance-reduced upgrade of
    * `ipsOffPolicy`: the even-id half of the log trains a per-action
    * outcome model r̂_a (exact ppm mean), the odd-id half evaluates
    * DR(a) = mean[r̂_a + ρ·(r − r̂_a)·1{a_logged = a}]. The model term
    * anchors the estimate where importance weights are noisy; the
    * correction term keeps it unbiased. Importance weights are the
    * same exact BIGINT wk = 10⁹ div prop_ppm off the Knuth propensity;
    * every sum is BIGINT (correction in micro·wk units) and the final
    * value is one double division — the oracle replays it literally.
    * One scan, two grouped aggregates, one broadcast O(actions) join.
    */
  def drOffPolicy(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("event_type"), col("event_id"),
        (lit(100000L) + (col("event_id") % lit(2147483648L)) *
          lit(2654435761L) % lit(800001L)).as("prop_ppm"),
        when(col("value") >= 50.0, 1L).otherwise(0L).as("r"),
        (col("event_id") % 2 === 0).as("model_half"))
      .withColumn("wk", expr("1000000000 div prop_ppm"))
    val rhat = e.filter(col("model_half"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_model"), sum(col("r")).as("r_model"))
      .select(col("event_type"), col("n_model"),
        expr("(r_model * 1000000) div greatest(n_model, 1)")
          .as("rhat_ppm"))
    val ev = e.filter(!col("model_half"))
    val nEval = ev.agg(count(lit(1)).as("n_eval"))
    ev.join(broadcast(rhat), Seq("event_type"))
      .groupBy(col("event_type"), col("n_model"), col("rhat_ppm"))
      .agg(count(lit(1)).as("n_matched"),
        sum(col("wk") * (col("r") * lit(1000000L) - col("rhat_ppm")))
          .as("sum_corr"))
      .crossJoin(nEval)
      .select(col("event_type"), col("n_model"), col("rhat_ppm"),
        col("n_matched"), col("n_eval"), col("sum_corr"),
        round((col("n_eval") * col("rhat_ppm") * lit(1000L) +
          col("sum_corr")).cast("double") /
          (col("n_eval").cast("double") * 1e9), 6).as("dr_value"))
      .orderBy("event_type")
  }

  /** Label-shift (prior-shift) estimation — binary BBSE / Forman's
    * adjusted count: the deployed corpus rarely keeps the training
    * class balance, and raw classifier outputs inherit the skew. The
    * even-id half supplies the confusion rates (fpr = c01/n0,
    * tpr = c11/n1 at the 0.5 micro threshold), the odd-id half the
    * observed positive-prediction share μ₁; the corrected positive
    * prior is ŵ₁ = (μ₁ − fpr)/(tpr − fpr), clamped to [0, 1].
    *
    * All counts are one grouped pass each; the estimate is a fixed
    * double-op chain over exact BIGINTs with the degenerate
    * tpr = fpr case pinned to 0.5 identically on both engines (the
    * greatest/least clamp discipline). Output is O(1).
    */
  def priorShift(s: SparkSession, dir: String): DataFrame = {
    val sd = scoredDocs(s, dir)
      .select(col("doc_id"), col("y"),
        (round(col("p") * 1e6).cast("long") >= 500000L).as("pos"))
    val cm = sd.filter(col("doc_id") % 2 === 0)
      .agg(
        sum(when(col("y") === 0 && !col("pos"), 1L).otherwise(0L))
          .as("c00"),
        sum(when(col("y") === 0 && col("pos"), 1L).otherwise(0L))
          .as("c01"),
        sum(when(col("y") === 1 && !col("pos"), 1L).otherwise(0L))
          .as("c10"),
        sum(when(col("y") === 1 && col("pos"), 1L).otherwise(0L))
          .as("c11"))
    val mu = sd.filter(col("doc_id") % 2 === 1)
      .agg(count(lit(1)).as("n_tgt"),
        sum(when(col("pos"), 1L).otherwise(0L)).as("m1"))
    cm.crossJoin(mu)
      .select(col("c00"), col("c01"), col("c10"), col("c11"),
        col("n_tgt"), col("m1"),
        expr("(c01 * 1000000) div greatest(c00 + c01, 1)")
          .as("fpr_ppm"),
        expr("(c11 * 1000000) div greatest(c10 + c11, 1)")
          .as("tpr_ppm"),
        expr("(m1 * 1000000) div greatest(n_tgt, 1)").as("mu1_ppm"),
        expr("""round(least(greatest(CASE
          |  WHEN c11 * (c00 + c01) = c01 * (c10 + c11) THEN 0.5
          |  ELSE (cast(m1 as double) / cast(greatest(n_tgt, 1)
          |      as double) -
          |    cast(c01 as double) / cast(greatest(c00 + c01, 1)
          |      as double)) /
          |    (cast(c11 as double) / cast(greatest(c10 + c11, 1)
          |      as double) -
          |    cast(c01 as double) / cast(greatest(c00 + c01, 1)
          |      as double))
          |  END, cast(0.0 as double)), cast(1.0 as double)), 6)
          |""".stripMargin).as("w1_est"))
  }
}
