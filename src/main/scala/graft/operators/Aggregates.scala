package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Scalars._

/** Aggregation operators (SURVEY.md §2.5). Hash aggregates with
  * automatic partial (map-side) combine; pivots use an explicit value
  * list so the plan needs no extra pass to discover labels.
  */
object Aggregates {

  /** A1-style grouped sums with error-tolerant casts (X10): the classic
    * pricing summary over lineitem. `try/except int(value)` (`BP:602-606`)
    * maps to decimal casts that null out rather than fail.
    *
    * The product expressions pre-round to 6 decimals BEFORE the
    * decimal cast: the engines' double→DECIMAL(18,6) casts round the
    * half-boundary differently (Spark HALF_UP on the double's exact
    * expansion; DuckDB by its own scaled rint), and at sf1.0 a few of
    * the 5.8M per-row products land exactly on it — round(x, 6) is
    * the currency both engines already agree on, so the value
    * entering the cast is boundary-free. (Raw 2-decimal columns never
    * sit on a 6-decimal boundary; they cast bare.)
    */
  def pricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        moneySum(round(col("l_extendedprice") * (lit(1) - col("l_discount")),
          6)).as("sum_disc_price"),
        moneySum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax")), 6)).as("sum_charge"),
        moneyAvg(col("l_quantity")).as("avg_qty"),
        moneyAvg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** A1: explode an array-of-structs time series then grouped SUM —
    * the `multiDailyMetricTimeSeries` unwind (`BP:587-607`). The nested
    * shape is built from `events` (collect per user), exploded back, and
    * summed; the oracle checks the algebraic identity against the flat
    * table. The double `value` goes through money() so the sum is
    * order-independent (collect_list order is nondeterministic).
    */
  def explodeSum(s: SparkSession, dir: String): DataFrame = {
    val nested = Tables.events(s, dir)
      .groupBy("user_id")
      .agg(collect_list(struct(col("event_type").as("metric"),
        col("value").as("v"))).as("series"))
    nested
      .select(col("user_id"), explode(col("series")).as("e"))
      .groupBy(col("e.metric").as("metric"))
      .agg(sum(money(col("e.v"))).cast("double").as("metric_sum"),
        count(lit(1)).as("n_points"))
      .orderBy("metric")
  }

  /** A2: pivot metric→columns with 0-defaults + derived totals
    * (`BP:608-615`: `metric_sum.get(m, 0)` then summed "total_*" cols).
    */
  def pivotDaily(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val pivoted = Tables.events(s, dir)
      .withColumn("day", to_date(col("ts")))
      .groupBy("day")
      .pivot("event_type", types)
      .count()
      .na.fill(0L, types)
    pivoted
      .withColumn("total_events",
        types.map(col).reduce(_ + _))
      .withColumn("total_engagement", col("click") + col("purchase"))
      .orderBy("day")
  }

  /** A3: count-if over collected arrays via higher-order functions
    * (`size(filter(...))` — the additional-category / service-item
    * counters, `BP:548-555,646-652`).
    */
  def countIf(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(collect_list(col("event_type")).as("evts"))
      .select(col("user_id"),
        size(filter(col("evts"), _ === "click")).cast("long").as("n_click"),
        size(filter(col("evts"), _ === "error")).cast("long").as("n_error"),
        size(col("evts")).cast("long").as("n_events"))
      .orderBy("user_id")

  /** A4: argmax (latest-by-key) via a single max(struct) aggregate —
    * the latest-offer extraction (`BP:658-673`). max of a struct is
    * lexicographic, giving the row with max (date, key): a partial-agg
    * friendly plan (no window sort shuffle of the full table).
    */
  def argmaxLatest(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_custkey")
      .agg(max(struct(col("o_orderdate"), col("o_orderkey"))).as("m"))
      .select(col("o_custkey"),
        col("m.o_orderdate").as("last_orderdate"),
        col("m.o_orderkey").as("last_orderkey"))
      .orderBy("o_custkey")

  /** A5: row-count reconciliation gate (`BP:717-741`): input row count
    * vs post-transform output row count, computed in one pass.
    */
  def countGate(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .agg(count(lit(1)).as("input_rows"))
      .withColumn("output_rows", col("input_rows"))
      .withColumn("gate_passed",
        (col("input_rows") === col("output_rows")).cast("int"))

  /** A6: daily active count — the audit-log upsert (`BP:20-50`) as a
    * grouped aggregate keyed by day.
    */
  def dailyCounts(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_active_users"))
      .orderBy("day")

  /** A7: existence aggregate → Yes/No flag (`has_cover`/`has_menu`,
    * `BP:631-645`) via HOF `exists` over a collected array.
    */
  def existsFlag(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(collect_list(col("event_type")).as("evts"),
        count(lit(1)).as("total_event_count"))
      .select(col("user_id"),
        when(exists(col("evts"), _ === "purchase"), "Yes").otherwise("No")
          .as("has_purchase"),
        when(exists(col("evts"), _ === "error"), "Yes").otherwise("No")
          .as("has_error"),
        col("total_event_count"))
      .orderBy("user_id")

  /** EXACT global median at scale — histogram select, not a one-task
    * buffer. Spark's `percentile` is exact but buffers every value of
    * a group in one aggregation buffer; with a single global group
    * that is THE scale-killer (one task holds the column). This is
    * the two-phase selection algorithm instead:
    *   1. one scan → (min, max, count) in a single partial-agg pass;
    *   2. one scan → fixed-width bucket histogram (4096 buckets,
    *      partial-agg map-side; the driver receives <=4096 counts and
    *      locates the bucket containing the target rank);
    *   3. one scan, pruned to that bucket's value range (parquet
    *      min/max skipping applies) → the (rank - offset)-th smallest
    *      value inside the bucket via per-partition top-k.
    * Every executor holds O(buckets) state, the driver O(buckets)
    * longs — nothing proportional to the data. O(log_width) extra
    * rounds would shrink the final bucket further if one bucket were
    * still huge (skewed value domains); one level suffices here.
    * Target rank = ceil(n/2) — the lower median, so the answer is an
    * actual data value at any parity and the oracle is rank-stable
    * under ties.
    */
  def exactMedianScale(s: SparkSession, dir: String): DataFrame =
    exactMedianOf(Tables.orders(s, dir).select(col("o_totalprice").as("v")))

  /** The selection over an explicit value relation (column `v`) —
    * separable so specs can drive degenerate domains through the same
    * bucket logic.
    */
  private[operators] def exactMedianOf(vals: DataFrame): DataFrame = {
    val stats = vals.agg(min(col("v")), max(col("v")), count(lit(1))).head()
    require(stats.getLong(2) > 0, "empty relation — no median")
    val (lo, hi, n) = (stats.getDouble(0), stats.getDouble(1),
      stats.getLong(2))
    val k = (n + 1) / 2 // ceil(n/2): lower median
    val nBuckets = 4096
    val width = (hi - lo) / nBuckets
    val bucketOf =
      if (width == 0) lit(0)
      else least(floor((col("v") - lo) / width).cast("int"),
        lit(nBuckets - 1))
    val hist = vals.groupBy(bucketOf.as("b")).agg(count(lit(1)).as("c"))
      .orderBy("b").collect().map(r => r.getInt(0) -> r.getLong(1))
    var cum = 0L
    val (bucket, offset) = hist.collectFirst {
      case (b, c) if { val hit = cum + c >= k; if (!hit) cum += c; hit } =>
        (b, cum)
    }.get
    val rankInBucket = (k - offset).toInt
    // membership MUST be decided by the identical bucket expression the
    // histogram used: re-deriving the range as [lo+b*w, lo+(b+1)*w) can
    // disagree with floor((v-lo)/w) at boundaries under fp rounding,
    // making rankInBucket inconsistent with the filtered set. The
    // widened value range rides along only for parquet min/max skipping.
    val inBucket =
      if (width == 0) vals
      else vals.filter(bucketOf === lit(bucket) &&
        col("v") >= lo + (bucket - 1) * width &&
        col("v") <= lo + (bucket + 2) * width)
    inBucket.orderBy(col("v")).limit(rankInBucket)
      .orderBy(col("v").desc).limit(1)
      .select(col("v").as("median_price"), lit(n).as("n_rows"))
  }

  /** A8 + X9: rating-style rollup with round(x, 1) (`BP:618-629`). */
  def roundAvg(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .groupBy("c_nationkey")
      .agg(round(moneyAvg(col("c_acctbal")), 1).as("avg_acctbal"),
        count(lit(1)).as("n_customers"))
      .orderBy("c_nationkey")

  /** Pairwise co-occurrence (market-basket / tag-affinity): for every
    * pair of event types, how many users produced both. The classic
    * formulation self-joins the (user, type) distinct projection —
    * and because both join branches are the SAME subplan, Spark's
    * ReuseExchange rule materializes the distinct's shuffle ONCE and
    * wires the second branch to it (`ReusedExchange` — pinned in
    * PlanQualitySpec). At 100 TB that reuse halves the heaviest
    * exchange in the query; the `<` on the pair keys keeps the pair
    * space triangular. Output is |types|² rows — tiny at any scale.
    */
  def typeCooccurrence(s: SparkSession, dir: String): DataFrame = {
    val ut = Tables.events(s, dir)
      .select(col("user_id"), col("event_type")).distinct()
    ut.as("a").join(ut.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("type_a", "type_b")
  }

  /** Distinct-count SET ALGEBRA via KMV sketches
    * (graft.functions.KmvSketch): distinct customers per order
    * priority, their union, and their OVERLAP — the
    * audience-intersection question approx_count_distinct (HLL)
    * cannot answer, because HLL registers don't support
    * intersection. One shuffle of ≤ k-double sketches per group; the
    * driver-side set algebra touches kilobytes (the sketch plane,
    * never the data).
    *
    * The uniform hash is the Knuth-multiplicative integer map (the
    * agg_weighted_sample discipline: a bijection on [0, 2³¹), so
    * distinct keys stay distinct) scaled by the exact power-of-two
    * 2⁻³¹ — every u is an exactly-representable double BOTH engines
    * derive bit-for-bit, so the DuckDB oracle replays the k-minima
    * and the ESTIMATES exactly in EVERY regime. That matters at
    * sf1.0+, where 129k distinct customers saturate k = 16384 and the
    * (k−1)/u_(k) estimator takes over from exact counting (the
    * earlier xxhash64 form was only oracle-checkable in the sub-k
    * regime — a fixed-tuning-vs-scale trap the third decade caught).
    * Estimator error at saturation stays ~1/√k (KmvSketchSpec).
    */
  def kmvOverlap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.{Kmv, KmvSketch}
    val k = 16384
    val sketch = udaf(new KmvSketch(k))
    // uniform [0,1): Knuth bijection on [0,2^31), exact 2^-31 scale
    val u = ((col("o_custkey") % lit(2147483648L)) * lit(2654435761L) %
      lit(2147483648L)).cast("double") / lit(2147483648.0)
    val sk = Tables.orders(s, dir)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select(col("o_orderpriority").as("p"), u.as("u"))
      .groupBy("p").agg(sketch(col("u")).as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val (a, b) = (sk("1-URGENT"), sk("2-HIGH"))
    Seq((
      math.round(Kmv.estimate(k, a)),
      math.round(Kmv.estimate(k, b)),
      math.round(Kmv.estimate(k, Kmv.union(k, a, b))),
      math.round(Kmv.intersection(k, a, b))))
      .toDF("n_urgent", "n_high", "n_union", "n_both")
  }

  /** Sliding-window distinct counts from MERGED day sketches:
    * "distinct users in the trailing 7 days, per day" — the rolling
    * engagement metric an exact windowed COUNT(DISTINCT) cannot
    * compute incrementally (distinct is not subtractable, so every
    * day would re-scan its whole window). Sketch plane instead: one
    * KMV sketch per day (ONE corpus shuffle of ≤k-double arrays),
    * then each day's sketch fans out to the ≤7 window ends it serves
    * (day-grain rows — kilobytes), is re-sketched per window (KMV
    * merge = k smallest of the union = re-sketching the retained
    * values, lossless by construction), and the estimate reads off
    * row-locally: exact |sketch| in the sub-k regime (every test sf,
    * so the DuckDB oracle demands equality with the true windowed
    * distinct), (k−1)/max at saturation (~1/√k error,
    * KmvSketchSpec-bounded). A year of dashboard windows at 100 TB
    * reprocesses day sketches, never events.
    */
  def slidingDistinct(s: SparkSession, dir: String, days: Int = 7)
      : DataFrame = {
    import graft.functions.KmvSketch
    val k = 16384
    val sketch = udaf(new KmvSketch(k))
    val u = (xxhash64(col("user_id")).cast("double") /
      lit(math.pow(2, 64))) + lit(0.5)
    val daily = Tables.events(s, dir)
      .select(to_date(col("ts")).as("day"), u.as("u"))
      .groupBy("day").agg(sketch(col("u")).as("sk"))
    daily
      .select(col("day"),
        explode(sequence(lit(0), lit(days - 1))).as("off"), col("sk"))
      .select(date_add(col("day"), col("off")).as("wday"), col("sk"))
      // only windows ending on an OBSERVED day (the trailing frame's
      // natural domain; tiny day-grain semi join)
      .join(daily.select(col("day").as("wday")), Seq("wday"), "left_semi")
      .select(col("wday"), explode(col("sk")).as("u"))
      .groupBy("wday").agg(sketch(col("u")).as("sk7"))
      .select(col("wday").as("day"),
        when(size(col("sk7")) < k, size(col("sk7")).cast("long"))
          .otherwise(round(lit(k - 1) /
            element_at(col("sk7"), k)).cast("long")).as("n_users_7d"))
      .orderBy("day")
  }

  /** Weighted sampling WITHOUT replacement, per group, as one
    * aggregate pass — the training-data subsampling primitive
    * (quality-weighted corpus selection draws documents ∝ weight; here
    * events ∝ `value` per event_type). Efraimidis–Spirakis A-ES: rank
    * every row by key = ln(u)/w (a monotone transform of u^(1/w)) and
    * keep the per-group top-k — provably a weighted sample without
    * replacement. The top-k rides `graft.functions.TopKAgg`, so the
    * map side caps each task at k rows per group and the exchange
    * carries O(k × tasks) per group — a weighted sample of a 100 TB
    * corpus moves kilobytes per group, never the group.
    *
    * u is DETERMINISTIC: a multiplicative Knuth hash of the row id in
    * plain integer arithmetic (((id mod 2³¹)·2654435761) mod 2³², odd
    * multiplier → injective over distinct residues, so u is
    * collision-free for id < 2³¹; larger ids wrap to a shared residue
    * class — still deterministic on both engines, just not unique),
    * replayable verbatim in ANSI SQL — the DuckDB oracle re-derives
    * the identical sample with a rank-over-key window, making a
    * RANDOMIZED operator hash-exact under the gate. The 2³¹ pre-mask
    * is the overflow guard: without it, id·2654435761 exceeds
    * Long.MaxValue past id ≈ 3.47e9, where Spark (non-ANSI) wraps
    * silently but DuckDB BIGINT multiplication raises — a latent
    * engine/oracle divergence; masked, the product tops out at
    * (2³¹−1)·2654435761 ≈ 5.7e18 < 2⁶³−1 in both engines. Keys are
    * continuous with gaps ≫ 1 ulp, so engine-level ln rounding cannot
    * reorder ranks (WeightedSampleSpec pins the ordering margin).
    */
  def weightedSample(s: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val topk = udaf(new graft.functions.TopKAgg(k))
    val u = (pmod(pmod(col("event_id"), lit(2147483648L)) * lit(2654435761L),
      lit(4294967296L))
      .cast("double") + lit(1.0)) / lit(4294967297.0)
    Tables.events(s, dir)
      .select(col("event_type"), col("event_id"),
        // weight clamp: w=0 rows get key ln(u)/1e-6 ≈ -∞ — never
        // sampled, the correct zero-probability semantics (and no
        // ANSI divide-by-zero); the oracle replays the same clamp
        (log(u) / greatest(col("value"), lit(1e-6))).as("es_key"))
      .groupBy("event_type")
      .agg(topk(col("es_key"), col("event_id")).as("top"))
      .select(col("event_type"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("event_type"), (col("pos") + 1).cast("long").as("rk"),
        col("t._2").as("event_id"))
      .orderBy("event_type", "rk")
  }

  /** Frequency POINT QUERIES via Count-Min sketch — the frequency
    * complement of the distinct-count sketches (HLL `sketchRollup`,
    * KMV `kmvOverlap`): "how often did THIS key occur" without a
    * full-vocabulary groupBy, with a deterministic one-sided error
    * guarantee (est ≥ true always; est ≤ true + ε·N w.h.p.). Built on
    * Spark's own `count_min_sketch` aggregate (codegen'd, fixed seed
    * → deterministic), sketched PER DAY then merged on the driver —
    * the mergeability is the point: at 100 TB the daily sketches are
    * kilobytes each, the month rollup is `mergeInPlace` over 30 of
    * them on the sketch plane, and answering a new audit list touches
    * no data at all. The probe set here (user_id ≡ 0 mod 13) stands
    * in for a bounded audit list; its exact counts ride a pushed-down
    * predicate scan, so the verification side scans |probes|' rows,
    * not the corpus. Emitted per probe: the exact count (oracle
    * recomputes it) and the CMS bound verdict (oracle: literal true —
    * w.h.p.-legitimate under the fixed seed, see the oracle note).
    *
    * The verify plane is DISTRIBUTED (round-8 weak flag fixed): the
    * probe rows stay a DataFrame end to end — exact counts aggregate
    * under the pushed-down predicate, and each probe's estimate is the
    * codegen `cms_estimate` expression evaluated executor-side against
    * the merged sketch riding the plan as a ~22 KB literal (the
    * `bloom_might_contain` delivery shape). Driver traffic is
    * O(days): the per-day kilobyte sketches it merges — never a row
    * set that grows with distinct-key count.
    */
  def cmsPointQueries(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.util.sketch.CountMinSketch
    graft.functions.VectorExpressions.ensureRegistered(s)
    val eps = 0.005
    val daily = Tables.events(s, dir)
      .groupBy(col("ts").cast("date").as("day"))
      .agg(count_min_sketch(col("user_id"), lit(eps), lit(0.99),
        lit(42)).as("sk"), count(lit(1)).as("n"))
      .collect()
    val merged = daily.map(r => CountMinSketch.readFrom(
      r.getAs[Array[Byte]]("sk"))).reduce(_.mergeInPlace(_))
    val nTotal = daily.map(_.getAs[Long]("n")).sum
    val bound = math.ceil(eps * nTotal).toLong
    val est = call_function("cms_estimate",
      lit(merged.toByteArray), col("user_id"))
    Tables.events(s, dir)
      .filter(col("user_id") % 13 === 0)
      .groupBy("user_id").agg(count(lit(1)).as("n_exact"))
      .select(col("user_id"), col("n_exact"),
        (est >= col("n_exact") &&
          est <= col("n_exact") + lit(bound)).as("est_ok"))
      .orderBy("user_id")
  }

  /** Exponentially time-decayed counters per event type — the
    * freshness-weighted engagement score behind trending feeds and
    * recency-biased sampling weights: an event contributes
    * 2^-(age_weeks) of a full count, halving per week of age and
    * flooring at 2^-8 (so the tail stays summable, not a vanishing
    * denormal). "Now" is the corpus max timestamp — a 1-row broadcast
    * pre-aggregate, same plane as tfidf's N.
    *
    * Exactness: decay weights are DYADIC — every weight is an integer
    * number of 1/256ths — so the whole aggregate runs in integer
    * arithmetic: each event contributes 2^(8-age_weeks) ∈ [1, 256]
    * units (a shiftleft, no libm pow), cents = floor(value·100)
    * (floor, not round: round-half ties break differently across
    * engines; floor of the identically-rounded product doesn't), and
    * the per-group BIGINT sums are order-independent — deterministic
    * under any partitioning, which a double-accumulating decay sum is
    * NOT. The one division by 256.0 happens after aggregation: two
    * exact-rounded IEEE ops, bit-identical in Spark and DuckDB. The
    * float-free integer columns ride along for the oracle.
    */
  def decayHalflife(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val nowDf = ev.agg(max(col("ts").cast("date")).as("now_day"))
    ev.crossJoin(broadcast(nowDf))
      .withColumn("wk", least(
        expr("datediff(now_day, cast(ts as date)) div 7"), lit(8L)))
      .withColumn("u", expr("shiftleft(1L, cast(8 - wk as int))"))
      .select(col("event_type"), col("u"),
        (floor(col("value") * 100).cast("long") * col("u")).as("cu"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("u")).as("decayed_units"),
        sum(col("cu")).as("decayed_cent_units"))
      .select(col("event_type"), col("n_events"), col("decayed_units"),
        col("decayed_cent_units"),
        (col("decayed_units") / 256.0).as("decayed_count"),
        (col("decayed_cent_units") / 256.0 / 100.0).as("decayed_value"))
      .orderBy("event_type")
  }

  /** Heavy-change detection: the users whose activity moved MOST
    * between the corpus's first and second half — the "what changed"
    * question behind incident triage and drift attribution, where
    * heavy HITTERS (text_heavy_hitters, stream_heavy_hitters) answer
    * only "what is big". The split point derives from the corpus
    * min day (+15d) as a 1-row broadcast, so the query carries no
    * wall-clock literal.
    *
    * One scan, one conditional-count groupBy (both halves in the same
    * aggregate — never two scans + a join), then a
    * TakeOrderedAndProject under the total order (|Δ| desc, user_id):
    * O(k) rows leave each partition. At 100 TB with billions of keys
    * this exact form is the confirm pass; the sketch pass that feeds
    * it candidates is the deltoid/CM-change literature — same shape
    * as cmsPointQueries' sketch plane.
    */
  def heavyChange(s: SparkSession, dir: String, topN: Int = 20)
      : DataFrame = {
    val ev = Tables.events(s, dir)
    val mid = ev.agg(date_add(min(col("ts").cast("date")), 15).as("mid"))
    ev.crossJoin(broadcast(mid))
      .groupBy("user_id")
      .agg(
        sum(when(col("ts").cast("date") < col("mid"), 1L).otherwise(0L))
          .as("n_before"),
        sum(when(col("ts").cast("date") >= col("mid"), 1L).otherwise(0L))
          .as("n_after"))
      .select(col("user_id"), col("n_before"), col("n_after"),
        (col("n_after") - col("n_before")).as("delta"))
      .orderBy(abs(col("delta")).desc, col("user_id"))
      .limit(topN)
  }

  /** Exact distinct counting via bitmap words — the roaring-bitmap /
    * bitmap-index pattern (Druid, ClickHouse, Pinot) expressed in
    * plain Spark: user ids pack into 32-bit words (word = id div 32,
    * bit = id mod 32), the groupBy OR-folds each word map-side, and
    * the distinct count is Σ bit_count(word). Why not count_distinct:
    * that shuffles every distinct (group, id) pair; the bitmap
    * shuffles at most one row per OCCUPIED WORD per group —
    * 32× fewer rows on a dense id domain, and the OR is mergeable so
    * map-side combine does most of the collapsing. 32-bit words dodge
    * both engines' sign-bit traps (Spark's shiftleft into bit 63 goes
    * negative; DuckDB's 1<<63 raises). The DuckDB oracle counts
    * DISTINCT directly — the hash check proves the bitmap plane IS
    * the exact distinct count.
    */
  /** The per-(type, word) OR-folded bitmap table — pooled because it
    * IS the reusable index: bitmapDistinct reads it once,
    * bitmapRollup answers a second distinct question from it without
    * ever rescanning the fact table.
    */
  private def bitmapWords(s: SparkSession, dir: String): DataFrame =
    graft.CachePool.cached(s, s"agg.bitmapWords:$dir") {
      Tables.events(s, dir)
        .select(col("event_type"), expr("user_id div 32").as("word"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT))")
            .as("mask"),
          col("event_id"))
        .groupBy("event_type", "word")
        .agg(bit_or(col("mask")).as("bits"),
          count(lit(1)).as("n_rows"))
    }

  def bitmapDistinct(s: SparkSession, dir: String): DataFrame =
    bitmapWords(s, dir).groupBy("event_type")
      .agg(sum(bit_count(col("bits")).cast("long")).as("n_users"),
        count(lit(1)).as("n_words"),
        sum(col("n_rows")).as("n_events"))
      .orderBy("event_type")

  /** Bitmap-index REUSE: the distinct rollup (per type + TOTAL)
    * answered entirely from the pooled word table — the reason
    * engines persist bitmap indexes: the total is NOT Σ per-type
    * distincts (users span types); it is the bit-OR of the word rows
    * ACROSS types, one |words|-sized groupBy, and the fact table is
    * never touched again. The DuckDB oracle recomputes both planes
    * from raw DISTINCTs, so the hash check proves OR-merge ≡ set
    * union exactly.
    */
  def bitmapRollup(s: SparkSession, dir: String): DataFrame = {
    val words = bitmapWords(s, dir)
    val perType = words.groupBy("event_type")
      .agg(sum(bit_count(col("bits")).cast("long")).as("n_users"))
    val total = words.groupBy("word")
      .agg(bit_or(col("bits")).as("bits"))
      .agg(sum(bit_count(col("bits")).cast("long")).as("n_users"))
      .select(lit("TOTAL").as("event_type"), col("n_users"))
    perType.unionByName(total).orderBy("event_type")
  }

  /** Exact pairwise set algebra from the bitmap index: |A∩B|, |A∪B|,
    * Jaccard and overlap (Szymkiewicz–Simpson) coefficients for every
    * event-type pair, computed by AND/OR-ing the pooled word table —
    * the EXACT plane of the question agg_kmv_overlap answers with
    * sketches, and the second reuse of the index (after
    * agg_bitmap_rollup): the fact table is never rescanned and the
    * pair space is |types|²·|words| word rows, never user rows.
    * Intersection = Σ bit_count(bits_a & bits_b) over the words the
    * INNER join aligns (a word absent from one side ANDs to zero —
    * the join IS the sparsity optimization); union by
    * inclusion–exclusion. Coefficients land by the div-ppm law.
    */
  def bitmapJaccard(s: SparkSession, dir: String): DataFrame = {
    val w = bitmapWords(s, dir).select(col("event_type"), col("word"),
      col("bits"))
    val sizes = w.groupBy("event_type")
      .agg(sum(bit_count(col("bits")).cast("long")).as("n"))
    val inter = w.as("x").join(w.as("y"),
        col("x.word") === col("y.word") &&
          col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("type_a"),
        col("y.event_type").as("type_b"))
      .agg(sum(bit_count(col("x.bits").bitwiseAND(col("y.bits")))
        .cast("long")).as("n_inter"))
      // drop pairs that share words but no users: the oracle's raw
      // distinct-pair join never materializes them
      .filter(col("n_inter") > 0)
    inter
      .join(sizes.select(col("event_type").as("type_a"),
        col("n").as("n_a")), "type_a")
      .join(sizes.select(col("event_type").as("type_b"),
        col("n").as("n_b")), "type_b")
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_inter"),
        (col("n_a") + col("n_b") - col("n_inter")).as("n_union"),
        expr("n_inter * 1000000L div (n_a + n_b - n_inter)")
          .as("jaccard_ppm"),
        expr("n_inter * 1000000L div least(n_a, n_b)")
          .as("overlap_ppm"))
      .orderBy("type_a", "type_b")
  }

  /** Pareto / contribution analysis: revenue share per part brand with
    * cumulative share and the 80% head flag — "which 20% of the
    * catalog carries 80% of revenue", the concentration question
    * behind every prioritization review.
    *
    * Exactness: revenue enters as exact 10⁻⁴-unit BIGINTs —
    * extendedprice·(1−discount) in decimal(18,6)·decimal(18,6) has
    * ≤ 4 decimal places (2+2), so ·10⁴ is integral and the long cast
    * truncates nothing (NOT cents: ·10² leaves 2 live decimals, and
    * Spark truncates a decimal→long cast where DuckDB rounds — the
    * engine trap the 10⁻⁴ scale avoids by construction). Shares land
    * by the div-ppm law with the numerator in decimal(38,0): the
    * corpus total ·10⁶ exceeds BIGINT around sf1, and the decimal
    * floor-division is provably exact (a non-integer quotient sits
    * ≥ 1/total ≥ 10⁻¹⁵ from any integer — far beyond the division's
    * 1e-20-scale rounding; DuckDB replays in HUGEINT). The head flag
    * marks rows whose PRECEDING cumulative share is < 80%: the
    * minimal prefix covering 80% of revenue under the
    * (revenue desc, brand) total order.
    *
    * Shape: one fact-scan groupBy to |brands| rows (map-side
    * combined); the cumulative window is global but runs over the
    * AGGREGATE — p_brand is a 25-value domain at any data scale
    * (domain-bounded, the documented global-window carve-out); the
    * grand total joins back as a 1-row broadcast.
    */
  def pareto(s: SparkSession, dir: String): DataFrame = {
    val byBrand = Tables.lineitem(s, dir)
      .join(Tables.part(s, dir),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg(sum((money(col("l_extendedprice")) *
          (lit(1) - money(col("l_discount"))) * 10000).cast("long"))
        .as("rev_u"))
    val total = byBrand.agg(sum(col("rev_u")).as("total_u"))
    val w = Window.orderBy(col("rev_u").desc, col("brand"))
    def ppm(num: Column): Column =
      floor(num.cast("decimal(38,0)") * lit(1000000) / col("total_u"))
        .cast("long")
    byBrand.crossJoin(broadcast(total))
      .withColumn("cum_u", sum(col("rev_u")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("brand"), col("rev_u"), col("total_u"),
        ppm(col("rev_u")).as("share_ppm"),
        ppm(col("cum_u")).as("cum_ppm"),
        (ppm(col("cum_u") - col("rev_u")) < 800000L).as("in_head"))
      .orderBy(col("rev_u").desc, col("brand"))
  }

  /** Approximate-query-processing audit (the BlinkDB pattern): how
    * well does a 1/16 deterministic hash sample estimate per-type
    * event counts, under two estimators — uniform Horvitz–Thompson
    * (16 × sample count) and the day-stratified RATIO estimator
    * (per day: known day total × the sample's within-day type share,
    * floor division; strata where the sample is empty contribute 0).
    * The stratified form is why AQP engines keep stratum metadata:
    * day totals are cheap partition statistics, and conditioning on
    * them removes the between-day variance component.
    *
    * Everything is replayable integer arithmetic — the sample is a
    * PREDICATE (multiplicative-hash bucket 0 of 16, the fixture
    * convention, decorrelated from id assignment), both estimators
    * are exact functions of it, and the error columns are div-ppm
    * laws — so the DuckDB oracle checks estimates AND errors to the
    * digit. One scan: exact count, sample count, and per-day sample
    * cells all come off the same aggregate tree; at 100 TB the
    * sample predicate would push into the scan of a sample TABLE
    * instead, same plan above it.
    */
  def aqpEstimate(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_type"),
      col("ts").cast("date").as("day"),
      (pmod(col("event_id") * lit(2654435761L), lit(16L)) === 0L)
        .as("in_sample"))
    // one pass: per (type, day) exact and sample counts; the day
    // totals are a WINDOW over the cells aggregate (|types| rows per
    // day partition — bounded), not a re-join, so the whole audit is
    // literally one scan of the fact table
    val cells = ev.groupBy("event_type", "day")
      .agg(count(lit(1)).as("n_cell"),
        sum(when(col("in_sample"), 1L).otherwise(0L)).as("s_cell"))
    val byDay = Window.partitionBy("day")
    val perType = cells
      .withColumn("n_day", sum(col("n_cell")).over(byDay))
      .withColumn("s_day", sum(col("s_cell")).over(byDay))
      .groupBy("event_type")
      .agg(sum(col("n_cell")).as("n_exact"),
        sum(col("s_cell")).as("n_sampled"),
        sum(when(col("s_day") > 0,
          expr("n_day * s_cell div s_day")).otherwise(0L))
          .as("n_est_ratio"))
    perType
      .select(col("event_type"), col("n_exact"), col("n_sampled"),
        (col("n_sampled") * 16L).as("n_est_uniform"),
        col("n_est_ratio"))
      .withColumn("err_uniform_ppm",
        expr("abs(n_est_uniform - n_exact) * 1000000L div n_exact"))
      .withColumn("err_ratio_ppm",
        expr("abs(n_est_ratio - n_exact) * 1000000L div n_exact"))
      .orderBy("event_type")
  }
}
