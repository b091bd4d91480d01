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
    val w = trainQualityClassifier(s, dir).collect()
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
    val w = trainQualityClassifier(s, dir).collect()
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
}
