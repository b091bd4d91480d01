package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class QualitySpec extends SparkSpec {

  test("expectations: one row per rule, clean TPC-H data passes") {
    val out = Quality.expectations(spark, sfDir).collect()
    assert(out.map(_.getAs[String]("rule")).sorted.toSeq ==
      Seq("custkey_resolves", "orderdate_not_null", "status_in_domain",
        "totalprice_positive"))
    val n = Tables.orders(spark, sfDir).count()
    assert(out.forall(_.getAs[Long]("n_checked") == n))
    // the synthetic TPC-H-ish data satisfies every constraint
    assert(out.forall(_.getAs[Long]("n_violations") == 0L))
    assert(out.forall(_.getAs[Int]("pass") == 1))
  }

  test("expectations: corrupted rows are counted, including NULL escapes") {
    // corrupt a copy of orders: one orphan custkey, one negative
    // price, one NULL price (the three-valued-logic escape), one
    // NULL date, one out-of-domain status
    val base = Tables.orders(spark, sfDir)
    val bad = base.limit(5).select(
      monotonically_increasing_id().as("rid"), col("*"))
      .withColumn("o_custkey",
        when(col("rid") === 0, lit(-999L)).otherwise(col("o_custkey")))
      .withColumn("o_totalprice",
        when(col("rid") === 1, lit(-5.0))
          .when(col("rid") === 2, lit(null).cast("double"))
          .otherwise(col("o_totalprice")))
      .withColumn("o_orderdate",
        when(col("rid") === 3, lit(null).cast("timestamp"))
          .otherwise(col("o_orderdate")))
      .withColumn("o_orderstatus",
        when(col("rid") === 4, lit("X")).otherwise(col("o_orderstatus")))
      .drop("rid")
    val out = Quality.expectationsOn(base.unionByName(bad),
      Tables.customer(spark, sfDir)).collect()
      .map(r => r.getAs[String]("rule") ->
        (r.getAs[Long]("n_violations"), r.getAs[Int]("pass"))).toMap
    assert(out("custkey_resolves") == ((1L, 0)))
    assert(out("totalprice_positive") == ((2L, 0))) // negative AND null
    assert(out("orderdate_not_null") == ((1L, 0)))
    assert(out("status_in_domain") == ((1L, 0)))
    val n = Tables.orders(spark, sfDir).count() + 5
    val checked = Quality.expectationsOn(base.unionByName(bad),
      Tables.customer(spark, sfDir)).collect()
    assert(checked.forall(_.getAs[Long]("n_checked") == n))
  }

  test("referentialAudit: clean schema has zero orphans on every edge; " +
    "an injected orphan is counted") {
    val out = Quality.referentialAudit(spark, sfDir).collect()
      .map(r => r.getAs[String]("fk_edge") -> r.getAs[Long]("n_orphans"))
      .toMap
    assert(out.keySet == Set("customer->nation", "lineitem->orders",
      "nation->region", "orders->customer", "supplier->nation"))
    assert(out.values.forall(_ == 0L), s"clean data must audit clean: $out")
    // the nonzero path must surface THROUGH the audit itself: union
    // an impossible child key (custkeys are non-negative) into the
    // audited child table and the edge must report exactly 1 orphan
    import spark.implicits._
    val brokenOrders = graft.Tables.orders(spark, sfDir)
      .select(col("o_custkey"))
      .unionByName(Seq(-12345L).toDF("o_custkey"))
    val audited = Quality.auditEdges(Seq(Quality.FkEdge(
      "orders->customer", brokenOrders, "o_custkey",
      graft.Tables.customer(spark, sfDir), "c_custkey",
      smallParent = false))).collect()
    assert(audited.length == 1 &&
      audited.head.getAs[Long]("n_orphans") == 1L,
      audited.mkString(","))
  }

  test("volumeAnomaly: flags agree with a driver-side z-test recount") {
    val out = Quality.volumeAnomaly(spark, sfDir).collect()
    val counts = out.map(_.getAs[Long]("n_events").toDouble)
    val mean = counts.sum / counts.length
    val variance = counts.map(c => (c - mean) * (c - mean)).sum / counts.length
    out.foreach { r =>
      val n = r.getAs[Long]("n_events").toDouble
      val expect = (n - mean) * (n - mean) > 4.0 * variance
      assert(r.getAs[Int]("is_anomaly") == (if (expect) 1 else 0),
        s"day ${r.get(0)}: n=$n mean=$mean var=$variance")
      assert(math.abs(r.getAs[Double]("mean_events") - mean) < 1e-6)
    }
  }

  test("madOutliers: medians and flags match a driver-side recompute " +
    "on sorted cents") {
    val got = Quality.madOutliers(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val byType = graft.Tables.events(spark, sfDir)
      .select(col("event_type"), round(col("value") * 100).cast("long"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sorted }
    assert(got.keySet == byType.keySet)
    def lowerMed(xs: Seq[Long]): Long = xs((xs.size + 1) / 2 - 1)
    byType.foreach { case (t, xs) =>
      val med = lowerMed(xs)
      val devs = xs.map(x => math.abs(x - med)).sorted
      val mad = lowerMed(devs)
      val flags = devs.count(_ > 3 * mad).toLong
      assert(got(t) == ((xs.size.toLong, med, mad, flags)),
        s"$t: got ${got(t)} expected (${xs.size}, $med, $mad, $flags)")
    }
  }

  test("madOutliersSketch: driver recompute of the sketch path matches, " +
    "agreement-with-exact bounds hold, and the bin layout covers the " +
    "value domain (no clamping)") {
    val W = 250L
    val rows = Quality.madOutliersSketch(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byType = graft.Tables.events(spark, sfDir)
      .select(col("event_type"), round(col("value") * 100).cast("long"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sorted }
    // layout coverage: every value strictly inside the 256-bin span,
    // so the clamp never fires and the one-bin-overshoot LAW applies
    val maxVc = byType.values.map(_.max).max
    assert(maxVc < 256 * W, s"value domain $maxVc exceeds bin span")
    def lowerMed(xs: Seq[Long]): Long = xs((xs.size + 1) / 2 - 1)
    def binEdge(v: Long): Long = (math.min(v / W, 255) + 1) * W
    rows.foreach { r =>
      val t = r.getString(0)
      val xs = byType(t)
      val medX = lowerMed(xs)
      val medEst = binEdge(medX)
      val devEst = xs.map(x => math.abs(x - medEst)).sorted
      val madEst = binEdge(lowerMed(devEst))
      val nOut = devEst.count(_ > 3 * madEst).toLong
      val madX = lowerMed(xs.map(x => math.abs(x - medX)).sorted)
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
        ((xs.size.toLong, medEst, madEst, nOut)),
        s"$t: sketch path diverged from driver replay")
      // the agreement columns are laws of the layout, not tolerances:
      // med overshoots by (0, W]; mad by at most 2W (1-Lipschitz
      // medians under per-row <= W shifts + one read-off overshoot)
      assert(r.getBoolean(5) && medEst - medX >= 1 && medEst - medX <= W)
      assert(r.getBoolean(6) && math.abs(madEst - madX) <= 2 * W)
    }
  }

  test("distributionDrift: ppm shares nearly sum to 1e6 per slice " +
    "(div truncation only), tvd recomputes and is bounded") {
    val rows = Quality.distributionDrift(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val bins = rows.length
    val pSum = rows.map(_._4).sum
    val qSum = rows.map(_._5).sum
    assert(pSum > 1000000L - bins && pSum <= 1000000L, pSum.toString)
    assert(qSum > 1000000L - bins && qSum <= 1000000L, qSum.toString)
    val tvd = rows.head._6
    assert(rows.forall(_._6 == tvd), "tvd must ride every row")
    assert(tvd == rows.map(r => math.abs(r._4 - r._5)).sum / 2)
    assert(tvd >= 0 && tvd <= 1000000L)
  }

  test("benfordAudit: all nine digit rows, literal curve sums to " +
    "exactly 1e6, counts conserve, tvd recomputes") {
    val rows = Quality.benfordAudit(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1 to 9))
    assert(rows.map(_._3).sum == 1000000L, "Benford curve must sum to 1")
    assert(rows.map(_._2).sum ==
      Tables.orders(spark, sfDir).count(), "digit counts conserve")
    val tvd = rows.head._5
    assert(rows.forall(_._5 == tvd))
    assert(tvd == rows.map(r => math.abs(r._4 - r._3)).sum / 2)
    val obsSum = rows.map(_._4).sum
    assert(obsSum > 1000000L - 9 && obsSum <= 1000000L)
  }

  test("profileDrift: per-column counts conserve, ppm laws recompute, " +
    "and clean TPC-H slices raise no null drift") {
    val rows = Quality.profileDrift(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("o_custkey",
      "o_orderpriority", "o_orderstatus", "o_totalprice_cents"))
    val nOrders = Tables.orders(spark, sfDir).count()
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) == nOrders,
        s"${r.getString(0)}: slice counts must conserve")
      // TPC-H carries no NULLs: null ppm and delta are exactly zero
      assert(r.getLong(3) == 0L && r.getLong(4) == 0L && r.getLong(5) == 0L)
      assert(r.getLong(6) > 0L && r.getLong(7) > 0L, "ndv positive")
    }
    // status has ~3 distinct values over 15k rows; custkey is dense —
    // the ndv densities must order that way in both slices
    val byName = rows.map(r => r.getString(0) -> r).toMap
    assert(byName("o_custkey").getLong(6) >
      byName("o_orderstatus").getLong(6))
  }

  test("profileDriftCore: injected nulls and a collapsed id column in " +
    "one slice raise the drift flag with exact ppm deltas") {
    import spark.implicits._
    // slice A: ids 0..99 distinct, x never null
    // slice B: ids all 7 (collapse), x null for half the rows
    val df = ((0 until 100).map(i => (true, i.toLong, Some(i.toLong))) ++
      (0 until 100).map(i => (false, 7L,
        if (i % 2 == 0) None else Some(i.toLong))))
      .toDF("in_a", "id", "x")
    val out = Quality.profileDriftCore(df, col("in_a"),
      Seq("id" -> col("id"), "x" -> col("x")))
      .collect().map(r => r.getString(0) -> r).toMap
    val id = out("id")
    assert(id.getLong(6) == 100L && id.getLong(7) == 1L) // ndv 100 -> 1
    // ndv ppm: 1e6 -> 10000; delta -990000 -> flag
    assert(id.getLong(8) == 10000L - 1000000L && id.getBoolean(9))
    val x = out("x")
    // null ppm: 0 -> 500000; delta 500000 -> flag
    assert(x.getLong(3) == 0L && x.getLong(4) == 500000L &&
      x.getLong(5) == 500000L && x.getBoolean(9))
  }

  test("lateArrivals: max and ceiling-rank p95 disorder match a " +
    "driver-side arrival-order recompute, and the simulated " +
    "delivery order measures real disorder") {
    val evs = Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = evs.groupBy(_._1).map { case (et, rows) =>
      val ordered = rows.sortBy(r => ((r._2 * 2654435761L) %
        100000000L, r._2))
      var runMax = Long.MinValue
      val lates = ordered.map { case (_, _, us) =>
        runMax = math.max(runMax, us); runMax - us
      }
      val sorted = lates.sorted
      val p95 = sorted(((sorted.length * 95 + 99) / 100 - 1).toInt)
      et -> ((lates.length.toLong, lates.max, p95))
    }
    val got = Quality.lateArrivals(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    // the audit is non-trivial under the shuffled delivery order
    assert(got.values.exists(_._2 > 0L), "no disorder measured")
  }

  test("lateArrivalsCore: a hand-built disordered stream yields the " +
    "hand-computed lateness profile; an in-order stream yields zero") {
    import spark.implicits._
    def t(sec: Int) = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(sec))
    // arrival order = event_id; event times: 10, 30, 20, 25, 40 s →
    // lateness 0, 0, 10s, 5s, 0
    val df = Seq((1L, t(10)), (2L, t(30)), (3L, t(20)), (4L, t(25)),
      (5L, t(40)))
      .toDF("event_id", "ts").withColumn("event_type", lit("k"))
    val r = Quality.lateArrivalsCore(df, col("event_id")).collect()
    assert(r.length == 1)
    assert(r.head.getLong(1) == 5L)
    assert(r.head.getLong(2) == 10L * 1000000L) // max = 10 s
    assert(r.head.getLong(3) == 10L * 1000000L) // p95 rank 5 of 5
    val inOrder = Seq((1L, t(1)), (2L, t(2)), (3L, t(3)))
      .toDF("event_id", "ts").withColumn("event_type", lit("k"))
    val r2 = Quality.lateArrivalsCore(inOrder, col("event_id")).collect()
    assert(r2.head.getLong(2) == 0L && r2.head.getLong(3) == 0L)
  }

  test("orderingViolations: flagged set equals a driver-side timeline " +
    "recount and the audit counts are corpus-wide") {
    val rows = Quality.orderingViolations(spark, sfDir).collect()
    val firsts = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("signup", "purchase")).collect()
      .map(r => (r.getLong(2), r.getString(3), r.getTimestamp(1)))
      .groupBy(_._1).view.mapValues { es =>
        (es.filter(_._2 == "signup").map(_._3).sortBy(_.getTime)
           .headOption,
         es.filter(_._2 == "purchase").map(_._3).sortBy(_.getTime)
           .headOption)
      }.toMap
    val expect = firsts.collect {
      case (u, (s, Some(p))) if s.isEmpty || p.before(s.get) =>
        u -> (if (s.isEmpty) "no_signup" else "purchase_before_signup")
    }
    assert(rows.map(r => r.getLong(0) -> r.getString(3)).toMap == expect)
    val purchasers = firsts.count(_._2._2.isDefined)
    rows.foreach { r =>
      assert(r.getLong(4) == purchasers.toLong)
      assert(r.getLong(5) == expect.size.toLong)
    }
  }

  test("keyDiscovery: o_orderkey is the unique key, every candidate " +
    "audits the same row count, composites only refine their parts, " +
    "and groups × worst multiplicity covers the rows (pigeonhole)") {
    val rows = Quality.keyDiscovery(spark, sfDir).collect().map { r =>
      r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))
    }.toMap
    assert(rows.size == 5)
    val nRows = Tables.orders(spark, sfDir).count()
    assert(rows.values.forall(_._1 == nRows))
    // the declared primary key really is one
    val (_, pkGroups, pkDup, pkIsKey) = rows("o_orderkey")
    assert(pkIsKey && pkGroups == nRows && pkDup == 1)
    // adding a column can only split groups finer, never merge them
    assert(rows("o_custkey+o_orderdate")._2 >= rows("o_custkey")._2)
    assert(rows("o_custkey+o_orderdate+o_orderstatus")._2 >=
      rows("o_custkey+o_orderdate")._2)
    rows.values.foreach { case (n, g, m, isKey) =>
      assert(g * m >= n && m >= 1)
      assert(isKey == (m == 1))
    }
  }

  test("agreementKappa: cells/marginals/kappa match a sequential " +
    "recompute off langId's own predictions; kappa law holds") {
    val out = Quality.agreementKappa(spark, sfDir).collect()
    val preds = TextAnalysis.langId(spark, sfDir)
      .select(col("labeled_lang"), col("predicted_lang")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val cells = preds.groupBy(identity).view.mapValues(_.length.toLong)
      .toMap
    val rowM = preds.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val colM = preds.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = preds.length.toLong
    val sumDiag = cells.collect {
      case ((l, p), c) if l == p => c }.sum
    val sumRc = rowM.keySet.intersect(colM.keySet)
      .map(k => rowM(k) * colM(k)).sum
    val num = n * sumDiag - sumRc
    val den = n * n - sumRc
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet ==
      cells.keySet)
    out.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      assert(r.getLong(2) == cells(key))
      assert(r.getLong(3) == rowM(key._1) && r.getLong(4) == colM(key._2))
      assert(r.getLong(5) == n && r.getLong(6) == sumDiag)
      assert(r.getLong(7) == num && r.getLong(8) == den)
      assert(r.getDouble(9) == num.toDouble / den)
    }
    assert(out.map(_.getLong(2)).sum == n) // cells partition the corpus
    assert(num.toDouble / den <= 1.0) // kappa ≤ 1 always
    // perfect-agreement sanity: kappa = 1 iff sum_diag = n
    if (sumDiag == n) assert(num == den)
  }

  test("sampleFit: Euclidean-split quotients equal the exact BigInt " +
    "floor ⌊d²/m⌋; cells match a sequential recount; chi2 law holds") {
    val out = Quality.sampleFit(spark, sfDir).collect()
    val ev = Tables.events(spark, sfDir)
      .select("event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def inSample(id: Long): Boolean =
      ((id % 2147483648L) * 2654435761L) % 97 < 5
    val o1 = ev.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val o2 = ev.filter(e => inSample(e._1)).groupBy(_._2).view
      .mapValues(_.length.toLong).toMap.withDefaultValue(0L)
    val n1 = ev.length.toLong
    val n2 = ev.count(e => inSample(e._1)).toLong
    val termQ = o1.map { case (t, o1k) =>
      val d = BigInt((n2 * o1k - n1 * o2(t)).abs)
      t -> (d * d / (o1k + o2(t))).toLong // exact floor, no split
    }
    val sumQ = termQ.values.sum
    assert(out.length == o1.size)
    out.foreach { r =>
      val t = r.getString(0)
      assert(r.getLong(1) == o1(t) && r.getLong(2) == o2(t))
      assert(r.getLong(3) == n1 && r.getLong(4) == n2)
      assert(r.getLong(5) == termQ(t), s"term_q mismatch for $t")
      assert(r.getLong(6) == sumQ)
      val chi2 = sumQ.toDouble / (n1 * n2)
      assert(r.getDouble(7) == chi2)
      assert(r.getBoolean(8) == (chi2 < 9.488))
    }
    // a ~5% hash sample of a hash-uncorrelated dimension should fit
    assert(out.head.getBoolean(8), "hash sample failed homogeneity")
  }

  test("skewGini: every candidate's Gini replays a sequential " +
    "sorted-counts recompute; range and consistency laws hold") {
    val out = Quality.skewGini(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
    def expect(keys: Array[Long]) = {
      val counts = keys.groupBy(identity).values.map(_.length.toLong)
        .toArray.sorted
      val n = counts.length.toLong
      val sx = counts.sum
      val six = counts.zipWithIndex
        .map { case (x, i) => (i + 1) * x }.sum
      (n, sx, 2 * six - (n + 1) * sx, n * sx)
    }
    val li = Tables.lineitem(spark, sfDir)
      .select("l_suppkey", "l_partkey").collect()
    val uid = Tables.events(spark, sfDir).select("user_id").collect()
      .map(_.getLong(0))
    val byName = Map(
      "l_suppkey" -> expect(li.map(_.getLong(0))),
      "l_partkey" -> expect(li.map(_.getLong(1))),
      "user_id" -> expect(uid))
    assert(out.length == 3)
    out.foreach { case (name, nk, tot, num, den, ppm, g) =>
      val (en, esx, enum_, eden) = byName(name)
      assert((nk, tot, num, den) == (en, esx, enum_, eden), name)
      assert(ppm == num * 1000000L / den && ppm >= 0 && ppm < 1000000L)
      assert(g == num.toDouble / den.toDouble)
    }
  }

  test("idGaps: missing counts and run counts replay a sorted " +
    "sequential scan; arithmetic laws hold") {
    val out = Quality.idGaps(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val ev = Tables.events(spark, sfDir)
      .select("event_type", "event_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byType = ev.groupBy(_._1)
    assert(out.length == byType.size)
    out.foreach { case (t, nIds, lo, hi, miss, runs) =>
      val ids = byType(t).map(_._2).distinct.sorted
      assert(nIds == ids.length && lo == ids.head && hi == ids.last)
      assert(miss == hi - lo + 1 - nIds)
      val expRuns = ids.sliding(2).count {
        case Array(a, b) => b > a + 1; case _ => false }
      assert(runs == expRuns, t)
      assert(runs <= miss) // every run has ≥1 missing id
      assert(miss == 0 == (runs == 0))
    }
    // the per-type slices of a shared dense id space MUST have gaps
    assert(out.map(_._5).sum > 0, "fixture unexpectedly gapless")
  }

  test("fanoutProfile: the distribution replays driver-side; the " +
    "zero class is present and conservation laws hold") {
    val out = Quality.fanoutProfile(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    val custs = Tables.customer(spark, sfDir).select("c_custkey")
      .collect().map(_.getLong(0))
    val ordCnt = Tables.orders(spark, sfDir).select("o_custkey")
      .collect().map(_.getLong(0))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val fanouts = custs.map(c => ordCnt.getOrElse(c, 0L))
    val expect = fanouts.groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    assert(out.map(r => r._1 -> r._2).toMap == expect)
    val totalParents = custs.length.toLong
    val modeK = expect.toSeq.maxBy { case (k, n) => (n, k) }._1
    out.foreach { case (k, np, nc, tp, tc, mk, ppm) =>
      assert(nc == k * np && tp == totalParents)
      assert(tc == ordCnt.values.sum && mk == modeK)
      assert(ppm == np * 1000000L / totalParents)
    }
    // this fixture has no orderless customers, so the zero class is
    // legitimately absent here; classes still partition the parents
    assert(out.map(_._2).sum == totalParents)
  }

  test("fanoutCore: the k = 0 class surfaces orderless parents a " +
    "join-based profile would drop (hand-built frame)") {
    val s = spark
    import s.implicits._
    val parents = Seq(1L, 2L, 3L, 4L, 5L).toDF("parent")
    val children = Seq(1L, 1L, 1L, 2L).toDF("parent") // 3,4,5 orphan
    val out = Quality.fanoutCore(parents, children).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(5), r.getLong(6)))).toMap
    // classes: k=0 ×3, k=1 ×1, k=3 ×1 — mode is the zero class
    assert(out.keySet == Set(0L, 1L, 3L))
    assert(out(0L) == ((3L, 0L, 0L, 600000L)))
    assert(out(1L) == ((1L, 1L, 0L, 200000L)))
    assert(out(3L) == ((1L, 3L, 0L, 200000L)))
  }

  test("kAnonymity: the class landscape replays driver-side; risk " +
    "bounds hold and the audit is non-vacuous") {
    val out = Quality.kAnonymity(spark, sfDir).collect().head
    val rows = Tables.customer(spark, sfDir)
      .select("c_nationkey", "c_mktsegment", "c_acctbal").collect()
      .map(r => (r.getInt(0), r.getString(1),
        math.floor(r.getDouble(2) / 5000).toLong))
    val classes = rows.groupBy(identity).values.map(_.length.toLong)
    val atRisk = classes.filter(_ < 5)
    assert(out.getLong(0) == rows.length.toLong)
    assert(out.getLong(1) == classes.size.toLong)
    assert(out.getLong(2) == classes.min)
    assert(out.getLong(3) == atRisk.size.toLong)
    assert(out.getLong(4) == atRisk.sum)
    assert(out.getLong(5) == atRisk.sum * 1000000L / rows.length)
    // non-vacuous: risk exists. At THIS sf (150 customers) the QI is
    // so fine that EVERY class is < 5 — itself the correct audit
    // verdict ("this quasi-identifier re-identifies everyone in a
    // small population"); the mixed regime shows at sf0.01, where
    // the driver's oracle hash pins the split every round.
    assert(atRisk.sum > 0)
    assert(out.getLong(5) <= 1000000L)
  }

  test("joinCard: exact sizes equal the materialized joins; the CBO " +
    "estimate replays; FK joins make exact = |lineitem|") {
    val out = Quality.joinCard(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7)))
    val li = Tables.lineitem(spark, sfDir)
    val nLi = li.count()
    val byKey = Map(
      "orderkey" -> (li.select("l_orderkey"),
        Tables.orders(spark, sfDir).select("o_orderkey")),
      "partkey" -> (li.select("l_partkey"),
        Tables.part(spark, sfDir).select("p_partkey")),
      "suppkey" -> (li.select("l_suppkey"),
        Tables.supplier(spark, sfDir).select("s_suppkey")))
    assert(out.map(_._1).toSeq == byKey.keys.toSeq.sorted)
    out.foreach { case (name, nl, ndvl, nr, ndvr, exact, est, err) =>
      val (l, r) = byKey(name)
      val lk = l.collect().map(_.getLong(0))
      val rk = r.collect().map(_.getLong(0))
      assert((nl, ndvl) == (lk.length.toLong, lk.distinct.length.toLong))
      assert((nr, ndvr) == (rk.length.toLong, rk.distinct.length.toLong))
      // ground truth: the actually-materialized join size
      val rCnt = rk.groupBy(identity).view.mapValues(_.length).toMap
      val trueSize = lk.map(k => rCnt.getOrElse(k, 0).toLong).sum
      assert(exact == trueSize && exact == nLi) // FK: every line hits
      assert(est == nl * nr / math.max(ndvl, ndvr))
      assert(err == math.abs(est - exact) * 1000000L / exact)
    }
  }
}
