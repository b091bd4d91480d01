package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class AnalyticsSpec extends SparkSpec {

  test("spendStanding: bucketed distributed ranks are BIT-EQUAL to " +
    "the single-window percent_rank/cume_dist formula") {
    import org.apache.spark.sql.expressions.Window
    val df = Analytics.spendStanding(spark, sfDir).cache()
    // the one-window form is fine IN A TEST at spec scale; production
    // plans must not contain it (PlanQualitySpec pins that)
    val w = Window.orderBy(col("total_spend"), col("o_custkey"))
    val ref = df.select(col("o_custkey"),
        percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val got = df.collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    df.unpersist()
    assert(got.size == ref.size && got.nonEmpty)
    got.foreach { case (k, v) =>
      assert(v == ref(k), s"cust $k: $v vs ${ref(k)}")
    }
  }

  test("topCustomers: exactly 10, sorted desc by spend") {
    val rows = Analytics.topCustomers(spark, sfDir).collect()
    assert(rows.length == 10)
    val spends = rows.map(_.getAs[Double]("total_spend"))
    assert(spends.zip(spends.tail).forall { case (a, b) => a >= b })
  }

  test("windowRunning: final running value equals the group total") {
    val out = Analytics.windowRunning(spark, sfDir)
    val lastPerCust = out.groupBy("o_custkey")
      .agg(max(struct(col("order_seq"), col("running_spend"))).as("m"))
      .select(col("o_custkey"), col("m.running_spend").as("final_running"))
    val totals = Tables.orders(spark, sfDir)
      .groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast("decimal(18,6)")).cast("double")
        .as("total"))
    val bad = lastPerCust.join(totals, "o_custkey")
      .filter(abs(col("final_running") - col("total")) > 1e-6)
    assert(bad.count() == 0)
  }

  test("unionNations: distinct union is a set union") {
    val got = Analytics.unionNations(spark, sfDir)
      .collect().map(_.getInt(0)).toSet
    val want = Tables.customer(spark, sfDir).select("c_nationkey")
      .collect().map(_.getInt(0)).toSet ++
      Tables.supplier(spark, sfDir).select("s_nationkey")
        .collect().map(_.getInt(0)).toSet
    assert(got == want)
  }

  test("rollupCustomers: grand total row equals customer count") {
    val out = Analytics.rollupCustomers(spark, sfDir)
    val grand = out.filter(col("r_name").isNull && col("n_name").isNull)
      .collect().head.getAs[Long]("n_customers")
    assert(grand == Tables.customer(spark, sfDir).count())
  }

  test("tumblingDaily: window starts are midnight UTC and counts add up") {
    val out = Analytics.tumblingDaily(spark, sfDir).cache()
    val total = out.agg(sum("n_events")).collect().head.getLong(0)
    assert(total == Tables.events(spark, sfDir).count())
    val nonMidnight = out.filter(
      date_format(col("day_start"), "HH:mm:ss") =!= "00:00:00").count()
    assert(nonMidnight == 0)
  }

  test("approxDistinct: HLL within 5% of exact") {
    val r = Analytics.approxDistinct(spark, sfDir).collect().head
    val exact = r.getAs[Long]("exact_parts").toDouble
    val approx = r.getAs[Long]("approx_parts").toDouble
    assert(math.abs(approx - exact) / exact < 0.05)
  }

  test("sketchRollup: merged day sketches estimate the exact global distinct") {
    val out = Analytics.sketchRollup(spark, sfDir).collect()
      .map(r => r.getAs[String]("day") -> r.getAs[Long]("n_users_est")).toMap
    val events = graft.Tables.events(spark, sfDir)
    val exactTotal = events.select("user_id").distinct().count().toDouble
    assert(math.abs(out("TOTAL") - exactTotal) / exactTotal < 0.05,
      s"est ${out("TOTAL")} vs exact $exactTotal")
    // per-day estimates exist for every day and are near-exact at this
    // cardinality; the union can only see MORE users than any one day
    val days = out.keySet - "TOTAL"
    assert(days.size == events.select(col("ts").cast("date")).distinct().count())
    assert(out.values.forall(_ <= out("TOTAL") * 1.05))
  }

  test("insightGold: one row per customer, engaged implies purchases") {
    val out = Pipelines.insightGold(spark, sfDir).cache()
    assert(out.count() == graft.Tables.customer(spark, sfDir).count())
    val bad = out.filter(col("profile_status") === "engaged" &&
      col("n_purchases") === 0).count()
    assert(bad == 0)
  }

  test("sliding7Day: trailing window ≥ daily count, first day equal") {
    val out = Analytics.sliding7Day(spark, sfDir).orderBy("day").collect()
    assert(out.forall(r =>
      r.getAs[Long]("trailing_7d_events") >= r.getAs[Long]("daily_events")))
    assert(out.head.getAs[Long]("trailing_7d_events") ==
      out.head.getAs[Long]("daily_events"))
  }

  test("funnel: stages shrink monotonically; stage 1 = distinct signup users") {
    val out = Analytics.funnel(spark, sfDir).orderBy("stage_ord").collect()
    assert(out.map(_.getAs[String]("stage")).toSeq ==
      Seq("signup", "click_after_signup", "purchase_after_click"))
    val counts = out.map(_.getAs[Long]("users"))
    assert(counts(0) >= counts(1) && counts(1) >= counts(2),
      s"funnel must narrow: ${counts.toSeq}")
    val signups = graft.Tables.events(spark, sfDir)
      .filter(col("event_type") === "signup")
      .select("user_id").distinct().count()
    assert(counts(0) == signups)
  }

  test("correlation: bit-exact vs a sequential moment recompute, r in " +
    "[-1, 1]") {
    val out = Analytics.correlation(spark, sfDir).collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Long]("n"), r.getAs[Double]("pearson_r"),
          r.getAs[Double]("beta_qty_per_discount"))).toMap
    assert(out.values.forall { case (_, r, _) => r >= -1.0 && r <= 1.0 })
    // independent recompute of one group with the same integer moments
    val rows = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_discount"), col("l_quantity"))
      .collect()
    out.keys.foreach { flag =>
      val g = rows.filter(_.getString(0) == flag)
      val xs = g.map(r => math.round(r.getDouble(1) * 100))
      val ys = g.map(r => math.round(r.getDouble(2)))
      val n = xs.length.toDouble
      val (sx, sy) = (xs.sum.toDouble, ys.sum.toDouble)
      val sxx = xs.map(x => x * x).sum.toDouble
      val syy = ys.map(y => y * y).sum.toDouble
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum.toDouble
      val covN = n * sxy - sx * sy
      val r = covN / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      assert(out(flag)._1 == g.length)
      assert(out(flag)._2 == r, s"$flag: ${out(flag)._2} vs $r")
      assert(out(flag)._3 == covN / (n * sxx - sx * sx) * 100)
    }
  }

  test("gapFill: spine is contiguous, gaps become explicit zeros") {
    val out = Analytics.gapFill(spark, sfDir).orderBy("day").collect()
    val days = out.map(_.getAs[java.sql.Date]("day").toLocalDate)
    // contiguous daily spine from min to max active day
    days.sliding(2).foreach { case Array(a, b) =>
      assert(b == a.plusDays(1), s"gap in spine at $a -> $b")
    }
    // the sparse threshold really produces gap days, and they carry
    // explicit zeros (not dropped rows)
    val zeros = out.filter(_.getAs[Long]("n_events") == 0L)
    assert(zeros.nonEmpty, "expected at least one filled gap day at sf0.001")
    assert(zeros.forall(_.getAs[Double]("sum_value") == 0.0))
    // conservation: filled days sum to the unfilled aggregate
    val active = graft.Tables.events(spark, sfDir)
      .filter(col("value") >= 250.0).count()
    assert(out.map(_.getAs[Long]("n_events")).sum == active)
  }

  test("cohortRetention: offset-0 count is the cohort size and the max") {
    val out = Analytics.cohortRetention(spark, sfDir).collect()
      .groupBy(_.getAs[java.sql.Date]("cohort"))
    out.foreach { case (_, rows) =>
      val byOff = rows.map(r => r.getAs[Int]("month_offset") ->
        r.getAs[Long]("active_customers")).toMap
      assert(byOff.contains(0), "every cohort retains itself at offset 0")
      assert(byOff.values.forall(_ <= byOff(0)),
        "no offset can exceed the cohort size")
    }
    // cohort sizes partition the customer base: offset-0 counts sum to
    // the number of distinct ordering customers
    val sizes = out.values.flatten
      .filter(_.getAs[Int]("month_offset") == 0)
      .map(_.getAs[Long]("active_customers")).sum
    val custs = graft.Tables.orders(spark, sfDir)
      .select("o_custkey").distinct().count()
    assert(sizes == custs)
  }

  test("ewmaDaily: bit-exact vs a Scala replay of the bounded fold; " +
    "recursion ewma_d = ewma_{d-1}/2 + x_d holds inside the window") {
    val rows = Analytics.ewmaDaily(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDate(1).toString,
        r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (t, series) =>
      val ordered = series.sortBy(_._2)
      val totals = ordered.map(_._3.toDouble)
      ordered.zipWithIndex.foreach { case ((_, day, _, ewma), i) =>
        // the exact same left fold over the same 10-value frame —
        // equality is BITWISE, the power-of-two-decay guarantee
        val want = totals.slice(math.max(0, i - 9), i + 1)
          .foldLeft(0.0)((acc, x) => acc / 2 + x)
        assert(ewma == want, s"$t $day: $ewma != $want")
        // and the textbook recursion while the frame isn't truncated
        if (i > 0 && i <= 9) {
          val prev = ordered(i - 1)._4
          assert(ewma == prev / 2 + totals(i))
        }
      }
    }
  }

  test("holtWinters: bit-exact vs a Scala replay of the two-variable " +
    "α=β=½ recursion from (0,0); forecast_next = level + trend") {
    val rows = Analytics.holtWinters(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (t, series) =>
      var l = 0.0
      var b = 0.0
      series.sortBy(_._2).foreach { case (_, day, cents, level, trend, fc) =>
        // the identical op sequence as the in-plan fold — equality is
        // BITWISE (deterministic rounding of a deterministic op order)
        val l2 = (cents.toDouble + l + b) / 2
        val b2 = (l2 - l + b) / 2
        l = l2; b = b2
        assert(level == l, s"$t $day level: $level != $l")
        assert(trend == b, s"$t $day trend: $trend != $b")
        assert(fc == l + b, s"$t $day forecast")
      }
    }
  }

  test("locfFill: filled value = most recent observation at-or-before " +
    "the day; null only before a series' first observation") {
    val rows = Analytics.locfFill(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getBoolean(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (_, series) =>
      val ordered = series.sortBy(_._2)
      var carried: Option[Long] = None
      ordered.foreach { case (t, day, observed, filled) =>
        if (observed) {
          assert(filled.isDefined, s"$t $day observed but null fill")
          carried = filled
        } else {
          assert(filled == carried, s"$t $day: fill $filled != last " +
            s"observation $carried")
        }
      }
    }
  }

  test("streaks: per-user runs match a brute-force day-walk replay") {
    val got = Analytics.streaks(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // independent replay: walk each user's sorted distinct epoch days
    // and count runs directly (no window trick)
    val days = Tables.events(spark, sfDir)
      .select(col("user_id"), datediff(col("ts").cast("date"),
        lit("1970-01-01").cast("date")).as("ep"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toList)
    assert(got.nonEmpty && got.size == days.size)
    days.foreach { case (u, ds) =>
      val runs = ds.foldLeft(List.empty[(Int, Long)]) {
        case ((prev, len) :: t, d) if d == prev + 1 => (d, len + 1) :: t
        case (acc, d) => (d, 1L) :: acc
      }.map(_._2)
      val expect = (runs.size.toLong, runs.max, runs.sum)
      assert(got(u) == expect, s"user $u: ${got(u)} vs $expect")
    }
  }

  test("movingMedian: every window estimate is within one bin width " +
    "of the exact trailing median and counts conserve") {
    val got = Analytics.movingMedian(spark, sfDir).collect()
      .map(r => r.getDate(0).toLocalDate -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val rows = Tables.orders(spark, sfDir)
      .select(col("o_orderdate").cast("date"), col("o_totalprice"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getDouble(1)))
    val days = rows.map(_._1).distinct
    assert(got.size == days.length && got.nonEmpty)
    days.foreach { d =>
      val win = rows.filter { case (dd, _) =>
        !dd.isAfter(d) && !dd.isBefore(d.minusDays(6)) }.map(_._2).sorted
      val (n, est) = got(d)
      assert(n == win.length.toLong, s"$d count")
      val exact = win((win.length - 1) / 2) // lower median
      assert(math.abs(est - exact) <= 25000.0,
        s"$d: est $est vs exact $exact")
    }
  }

  test("wowRetention: retained is a subset of active, first week " +
    "retains zero, and the rate recomputes from the counts") {
    val rows = Analytics.wowRetention(spark, sfDir).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    assert(rows.nonEmpty)
    assert(rows.head._3 == 0L, "no week precedes the first")
    rows.foreach { case (_, active, retained, ppm) =>
      assert(retained <= active)
      assert(ppm == retained * 1000000L / active)
    }
    // independent recount from distinct (user, week) pairs
    val uw = Tables.events(spark, sfDir)
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("w"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    rows.foreach { case (w, active, retained, _) =>
      val cur = uw.filter(_._2 == w).map(_._1).toSet
      val prev = uw.filter(_._2 == w.minusDays(7)).map(_._1).toSet
      assert(active == cur.size && retained == (cur & prev).size,
        s"$w: ($active,$retained) vs (${cur.size},${(cur & prev).size})")
    }
  }

  test("rfmSegments: customers conserve, scores live in 1..5, and " +
    "every dimension's marginal is an exact quintile split") {
    val cells = Analytics.rfmSegments(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    val total = cells.map(_._4).sum
    val nCust = Tables.orders(spark, sfDir)
      .select("o_custkey").distinct().count()
    assert(total == nCust, "customers not conserved across cells")
    cells.foreach { case (r, f, m, _) =>
      assert(r >= 1 && r <= 5 && f >= 1 && f <= 5 && m >= 1 && m <= 5)
    }
    // rank-quintile law: each score s gets the ranks in one fifth —
    // marginal size is within 1 of n/5 for every dimension
    def marginal(pick: ((Int, Int, Int, Long)) => Int) =
      cells.groupBy(pick).view.mapValues(_.map(_._4).sum)
    for (dim <- Seq(marginal(_._1), marginal(_._2), marginal(_._3))) {
      assert(dim.keySet == (1 to 5).toSet, dim.toMap.toString)
      dim.foreach { case (s, n) =>
        assert(math.abs(n - nCust / 5.0) <= 1.0, s"score $s: $n")
      }
    }
  }

  test("sessionPaths: session count conserves against a driver-side " +
    "gap walk, and every path draws from the event-type alphabet") {
    // un-truncated surface: all paths, so n_sessions must conserve
    val all = Analytics.sessionPaths(spark, sfDir, topN = 1000000)
      .collect()
    val types = Tables.events(spark, sfDir)
      .select("event_type").distinct().collect()
      .map(_.getString(0)).toSet
    all.foreach { r =>
      val steps = r.getString(0).split(">")
      assert(steps.length <= 8, "path cap violated")
      assert(steps.forall(types), s"unknown step in ${r.getString(0)}")
      assert(r.getLong(2) <= r.getLong(1), "more users than sessions")
    }
    // independent session count: walk each user's (us, id) sequence
    val seqs = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val totalSessions = seqs.values.map { rows =>
      val ordered = rows.sortBy(r => (r._2, r._3)).map(_._2)
      1 + ordered.zip(ordered.tail)
        .count { case (a, b) => b - a > 30L * 60 * 1000000 }
    }.sum
    assert(all.map(_.getLong(1)).sum == totalSessions.toLong,
      "session conservation broken")
  }

  test("trendTest: S matches a brute pairwise recount and respects " +
    "the algebraic bounds |S| <= n_pairs = n(n-1)/2") {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("x"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate,
        r.getLong(2))).groupBy(_._1)
    val got = Analytics.trendTest(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(got.size == daily.size && got.nonEmpty)
    daily.foreach { case (et, rows) =>
      val xs = rows.sortBy(_._2).map(_._3)
      val n = xs.length
      var s = 0L
      for (i <- 0 until n; j <- i + 1 until n)
        s += java.lang.Long.signum(xs(j) - xs(i))
      val pairs = n.toLong * (n - 1) / 2
      val dir = if (s > 0) "increasing" else if (s < 0) "decreasing"
        else "none"
      assert(got(et) == (s, pairs, n.toLong, dir),
        s"$et: ${got(et)} vs ($s, $pairs, $n, $dir)")
      assert(math.abs(s) <= pairs)
    }
  }

  test("attribution: credit conserves exactly — sum over days equals " +
    "1e6 x attributed purchases — and coverage columns are consistent") {
    val rows = Analytics.attribution(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val nAttr = rows.head.getLong(3)
    val nPurch = rows.head.getLong(4)
    assert(nAttr <= nPurch && nAttr > 0)
    assert(rows.map(_.getLong(2)).sum == 1000000L * nAttr,
      "credit not conserved: the div/mod split leaked units")
    // every purchase credits at most its own 1e6; touches positive
    rows.foreach { r => assert(r.getLong(1) > 0 && r.getLong(2) > 0) }
  }

  test("cusumCore: a hand-built level shift peaks exactly at the last " +
    "pre-shift day with the closed-form scaled deviation") {
    val s = spark
    import s.implicits._
    import java.sql.Date
    // 10 days at 100 cents then 10 at 200: C'_t = n·prefix_t − t·total
    // peaks (in |·|) at t=10 with |20·1000 − 10·3000| = 10000
    val series = (1 to 20).map { t =>
      ("shift", Date.valueOf(f"2024-01-$t%02d"), if (t <= 10) 100L else 200L)
    } ++ (1 to 5).map { t => // flat series: every C'_t = 0, argmax=first day
      ("flat", Date.valueOf(f"2024-02-$t%02d"), 50L)
    }
    val out = Analytics.cusumCore(series.toDF("event_type", "day", "x"))
      .collect().map(r => r.getString(0) ->
        (r.getDate(1).toString, r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out("shift") == ("2024-01-10", 10000L, 20L, 3000L), out.toString)
    assert(out("flat") == ("2024-02-01", 0L, 5L, 250L), out.toString)
  }

  test("cusum: production peaks match a driver-side brute replay") {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("x"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getLong(2))).groupBy(_._1)
    val got = Analytics.cusumChangePoint(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDate(1).toString, r.getLong(2)))
      .toMap
    assert(got.size == daily.size && got.nonEmpty)
    daily.foreach { case (et, rows) =>
      val xs = rows.sortBy(_._2).map(x => (x._2, x._3))
      val n = xs.length.toLong
      val total = xs.map(_._2).sum
      var prefix = 0L
      val cs = xs.zipWithIndex.map { case ((d, x), i) =>
        prefix += x
        (d, math.abs(n * prefix - (i + 1) * total))
      }
      val best = cs.minBy { case (d, a) => (-a, d) }
      assert(got(et) == best, s"$et: ${got(et)} vs $best")
    }
  }

  test("streaks: a run is maximal — extending any longest streak by " +
    "one day on either side leaves the day set") {
    // structural sanity on the operator's own output: total active
    // days bound the longest streak, and streak counts partition them
    Analytics.streaks(spark, sfDir).collect().foreach { r =>
      val (n, longest, active) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(longest >= 1 && longest <= active)
      assert(n >= 1 && n <= active)
      // n runs of total length `active`, max run `longest`:
      // active <= n * longest
      assert(active <= n * longest)
    }
  }

  test("autocorr: moments and the signed square match a sequential " +
    "recompute exactly; |r·|r|| ≤ 1 (Cauchy–Schwarz)") {
    val out = Analytics.autocorr(spark, sfDir).collect()
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("x"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2.toEpochDay).map(_._3)).toMap
    val expect = (for {
      (t, xs) <- daily.toSeq
      k <- 1 to 3 if xs.length > k
    } yield {
      val pairs = xs.drop(k).zip(xs.dropRight(k)) // (x_t, x_{t-k})
      val n = pairs.length.toLong
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val num = n * sxy - sx * sy
      val d1 = n * sxx - sx * sx; val d2 = n * syy - sy * sy
      (t, k) -> (n, num, d1, d2,
        if (d1 != 0 && d2 != 0)
          Some((num.toDouble / d1) * (math.abs(num).toDouble / d2))
        else None)
    }).toMap
    assert(out.map(r => (r.getString(0), r.getInt(1))).toSet ==
      expect.keySet)
    out.foreach { r =>
      val (n, num, d1, d2, acf) = expect((r.getString(0), r.getInt(1)))
      assert(r.getLong(2) == n && r.getLong(3) == num)
      assert(r.getLong(4) == d1 && r.getLong(5) == d2)
      acf match {
        case Some(a) =>
          assert(r.getDouble(6) == a)
          assert(math.abs(a) <= 1.0 + 1e-12)
        case None => assert(r.isNullAt(6))
      }
    }
  }

  test("seasonality: chi-square numerator matches the per-dow counts, " +
    "cells sum to n, chi2 ≥ 0, dow indices stay in [0, 7)") {
    val rows = Analytics.seasonality(spark, sfDir).collect()
    val cells = rows.map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    assert(cells.keys.forall { case (_, d) => d >= 0 && d < 7 })
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      val n = rs.head.getLong(3)
      assert(rs.map(_.getLong(2)).sum == n, s"$t cells don't sum to n")
      val so2 = rs.map(r => r.getLong(2) * r.getLong(2)).sum
      val chiNum = 7 * so2 - n * n
      assert(rs.forall(_.getLong(4) == chiNum))
      assert(chiNum >= 0, s"$t chi2_num $chiNum < 0") // Cauchy–Schwarz
      rs.foreach { r =>
        assert(r.getDouble(5) == chiNum.toDouble / n)
        assert(r.getBoolean(6) == (chiNum.toDouble / n < 12.592))
      }
    }
  }

  test("decompose: integer components match a sequential recompute; " +
    "the exact identity 7·s_cnt·x = s_cnt·trend_sum7 + s_num + " +
    "resid_num holds on every interior day") {
    val rows = Analytics.decompose(spark, sfDir).collect()
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2.toEpochDay)).toMap
    // sequential replay of the 7-row centered window per type
    val trendMap = daily.flatMap { case (t, xs) =>
      xs.indices.map { i =>
        val lo = math.max(0, i - 3); val hi = math.min(xs.length - 1, i + 3)
        val win = (lo to hi).map(j => xs(j)._3)
        (t, xs(i)._2) -> (xs(i)._3, win.sum, win.length.toLong)
      }
    }
    rows.foreach { r =>
      val key = (r.getString(0), r.getDate(1).toLocalDate)
      val (x, ts7, nw) = trendMap(key)
      assert(r.getLong(3) == x && r.getLong(4) == ts7 && r.getLong(5) == nw)
      val dow = Math.floorMod(key._2.toEpochDay, 7L)
      assert(r.getInt(2) == dow)
      if (nw == 7) {
        assert(r.getLong(6) == 7 * x - ts7)
        val (sNum, sCnt) = (r.getLong(7), r.getLong(8))
        val residNum = sCnt * (7 * x - ts7) - sNum
        // the decomposition identity, exactly in integers
        assert(7 * sCnt * x == sCnt * ts7 + sNum + residNum)
        // each double is one division of the integers
        assert(r.getDouble(9) == ts7.toDouble / 7)
        assert(r.getDouble(10) == sNum.toDouble / (7 * sCnt))
        assert(r.getDouble(11) == residNum.toDouble / (7 * sCnt))
      } else assert(r.isNullAt(6) && r.isNullAt(9))
    }
    // per-(type, dow) seasonal moments really are the interior sums
    rows.filter(!_.isNullAt(6))
      .groupBy(r => (r.getString(0), r.getInt(2))).foreach {
        case (_, rs) =>
          assert(rs.map(_.getLong(7)).distinct.length == 1)
          assert(rs.head.getLong(7) == rs.map(_.getLong(6)).sum)
          assert(rs.head.getLong(8) == rs.length.toLong)
      }
  }

  private def eventStartsUs(): Map[Long, Array[Long]] = {
    def us(x: Any): Long = x match {
      case t: java.sql.Timestamp =>
        t.getTime * 1000L + (t.getNanos / 1000) % 1000
      case t: java.time.LocalDateTime =>
        t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          t.getNano / 1000
      case t: java.time.Instant =>
        t.getEpochSecond * 1000000L + t.getNano / 1000
    }
    Tables.events(spark, sfDir).select("user_id", "ts").collect()
      .map(r => (r.getLong(0), us(r.get(1))))
      .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).sorted }
  }

  test("concurrency: per-user max open intervals replays a sequential " +
    "sweep; bounds hold") {
    val out = Analytics.concurrency(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = eventStartsUs()
    assert(out.length == byUser.size)
    out.foreach { case (u, nIv, maxC) =>
      val starts = byUser(u)
      assert(nIv == starts.length)
      // sequential sweep: sort endpoints, ends before starts at ties
      val eps = starts.flatMap(t =>
        Seq((t, 1L), (t + 1800000000L, -1L))).sortBy(e => (e._1, e._2))
      var open = 0L; var best = 0L
      eps.foreach { case (_, d) => open += d; best = math.max(best, open) }
      assert(maxC == best, s"user $u")
      assert(maxC >= 1 && maxC <= nIv)
    }
  }

  test("intervalUnion: covered time replays a sequential coalesce; " +
    "island and coverage bounds hold") {
    val out = Analytics.intervalUnion(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byUser = eventStartsUs()
    assert(out.length == byUser.size)
    out.foreach { case (u, nIv, nIsl, covered) =>
      val starts = byUser(u)
      assert(nIv == starts.length)
      // sequential coalesce over sorted starts (fixed 30-min length)
      var islands = 0L; var cov = 0L
      var curS = 0L; var curE = Long.MinValue
      starts.foreach { t =>
        if (t > curE) {
          if (curE != Long.MinValue) cov += curE - curS
          islands += 1; curS = t; curE = t + 1800000000L
        } else curE = math.max(curE, t + 1800000000L)
      }
      if (curE != Long.MinValue) cov += curE - curS
      assert(nIsl == islands && covered == cov, s"user $u")
      assert(covered >= 1800000000L && covered <= 1800000000L * nIv)
      assert(nIsl <= nIv)
    }
  }

  test("ohlcBars: every bar replays a sequential recompute; " +
    "low ≤ open/close ≤ high laws hold") {
    val out = Analytics.ohlcBars(spark, sfDir).collect()
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts").cast("date").as("day"),
        unix_micros(col("ts")).as("t"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents")).collect()
      .map(r => ((r.getString(0), r.getDate(1).toLocalDate),
        (r.getLong(2), r.getLong(3), r.getLong(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(out.length == ev.size)
    out.foreach { r =>
      val rows = ev((r.getString(0), r.getDate(1).toLocalDate))
      val (n, open, high, low, close, vol) = (r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))
      assert(n == rows.length)
      assert(open == rows.minBy(x => (x._1, x._2))._3)
      assert(close == rows.maxBy(x => (x._1, x._2))._3)
      assert(high == rows.map(_._3).max && low == rows.map(_._3).min)
      assert(vol == rows.map(_._3).sum)
      assert(low <= open && open <= high && low <= close && close <= high)
    }
  }

  test("funnelWindowed: stage sets replay an anchored-window " +
    "sequential pass; counts monotone; the window constraint bites") {
    val out = Analytics.funnelWindowed(spark, sfDir).collect().head
    val week = 7L * 86400000000L
    def us(x: Any): Long = x match {
      case t: java.sql.Timestamp =>
        t.getTime * 1000L + (t.getNanos / 1000) % 1000
      case t: java.time.LocalDateTime =>
        t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          t.getNano / 1000
    }
    val ev = Tables.events(spark, sfDir)
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), us(r.get(2))))
    def byType(t: String) = ev.filter(_._2 == t).groupBy(_._1)
      .view.mapValues(_.map(_._3).sorted).toMap
    val (su, cl, pu) = (byType("signup"), byType("click"),
      byType("purchase"))
    val clickT = su.flatMap { case (u, ss) =>
      val s0 = ss.min
      cl.getOrElse(u, Array.empty[Long])
        .filter(t => t >= s0 && t < s0 + week)
        .minOption.map(u -> _)
    }
    val purchT = clickT.flatMap { case (u, c0) =>
      pu.getOrElse(u, Array.empty[Long])
        .filter(t => t >= c0 && t < c0 + week)
        .minOption.map(u -> _)
    }
    assert(out.getLong(0) == su.size)
    assert(out.getLong(1) == clickT.size)
    assert(out.getLong(2) == purchT.size)
    assert(out.getLong(3) == clickT.size.toLong * 1000000L / su.size)
    assert(out.getLong(4) ==
      purchT.size.toLong * 1000000L / clickT.size)
    assert(su.size >= clickT.size && clickT.size >= purchT.size)
    // window ⊆ unwindowed always; at this tiny sf every clicker
    // happens to click within 7d, so the strict bite lives at the
    // gate's sf instead (sf0.01: 144 windowed < 150 unwindowed —
    // the oracle hash pins that distinction every round)
    val unwindowedClicks = su.keys.count(u =>
      cl.getOrElse(u, Array.empty[Long]).exists(_ >= su(u).min))
    assert(clickT.size <= unwindowedClicks)
  }

  test("patternRuns: run statistics replay a sequential calendar " +
    "walk; gaps break runs; laws hold") {
    val out = Analytics.patternRuns(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val daily = Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts").cast("date").as("d"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate))
      .groupBy(_._1).view.mapValues(
        _.groupBy(_._2.toEpochDay).view.mapValues(_.length.toLong)
          .toMap).toMap
    assert(out.length == daily.size)
    out.foreach { case (t, nDays, nDecl, longest, nGe3) =>
      val cnts = daily(t).toSeq.sortBy(_._1)
      assert(nDays == cnts.length)
      // sequential walk: declining iff previous CALENDAR day present
      // and strictly larger
      val decl = cnts.sliding(2).map {
        case Seq((d1, c1), (d2, c2)) => (d2, d2 == d1 + 1 && c2 < c1)
        case _ => (0L, false)
      }.toSeq
      assert(nDecl == decl.count(_._2))
      var runs = List.empty[Long]; var cur = 0L; var prevD = Long.MinValue
      decl.filter(_._2).foreach { case (d, _) =>
        if (d == prevD + 1) cur += 1 else { if (cur > 0) runs ::= cur; cur = 1 }
        prevD = d
      }
      if (cur > 0) runs ::= cur
      assert(longest == (if (runs.isEmpty) 0L else runs.max), t)
      assert(nGe3 == runs.count(_ >= 3).toLong, t)
      assert(nDecl == runs.sum)
      assert(longest <= nDecl && nGe3 * 3 <= nDecl)
    }
  }

  test("twap: the step integral replays sequentially; the " +
    "time-weighted and arithmetic means genuinely diverge somewhere") {
    val out = Analytics.twap(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    def us(x: Any): Long = x match {
      case t: java.sql.Timestamp =>
        t.getTime * 1000L + (t.getNanos / 1000) % 1000
      case t: java.time.LocalDateTime =>
        t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          t.getNano / 1000
    }
    val ev = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "ts", "value").collect()
      .map(r => (r.getLong(0), (us(r.get(2)), r.getLong(1),
        BigDecimal(r.getDouble(3) * 100)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(x => (x._1, x._2)))
      .toMap
    assert(out.length == ev.count(_._2.map(_._1).distinct.length > 1))
    out.foreach { case (u, n, span, tw, mean) =>
      val rows = ev(u)
      assert(n == rows.length)
      assert(span == rows.last._1 - rows.head._1)
      val wsum = rows.sliding(2).collect {
        case Array((t1, _, c1), (t2, _, _)) => c1 * (t2 - t1)
      }.foldLeft(0L)(_ + _)
      assert(tw == wsum / span, s"user $u")
      assert(mean == rows.map(_._3).sum / n)
      // both means live inside the value range
      assert(tw >= rows.map(_._3).min && tw <= rows.map(_._3).max)
    }
    assert(out.exists(r => r._4 != r._5),
      "TWAP never differs from the arithmetic mean — vacuous")
  }

  test("drawdown: the running-max walk replays sequentially; the " +
    "argmax keeps the FIRST attaining event; range laws hold") {
    val out = Analytics.drawdown(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    def us(x: Any): Long = x match {
      case t: java.sql.Timestamp =>
        t.getTime * 1000L + (t.getNanos / 1000) % 1000
      case t: java.time.LocalDateTime =>
        t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          t.getNano / 1000
    }
    val ev = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "ts", "event_type", "value")
      .collect()
      .map { r =>
        val c = BigDecimal(r.getDouble(4) * 100)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        (r.getLong(0), (us(r.get(2)), r.getLong(1),
          if (r.getString(3) == "purchase") -c else c))
      }
      .groupBy(_._1).view
      .mapValues(_.map(_._2).sortBy(x => (x._1, x._2))).toMap
    assert(out.length == ev.size)
    out.foreach { case (u, n, peakB, troughB, maxDd, ddId) =>
      val rows = ev(u)
      var bal = 0L; var peak = Long.MinValue
      var bestDd = Long.MinValue; var bestId = -1L
      var minB = Long.MaxValue; var maxB = Long.MinValue
      rows.foreach { case (_, id, sc) =>
        bal += sc; peak = math.max(peak, bal)
        minB = math.min(minB, bal); maxB = math.max(maxB, bal)
        val dd = peak - bal
        if (dd > bestDd) { bestDd = dd; bestId = id } // strict >: first
      }
      assert(n == rows.length)
      assert((peakB, troughB) == (maxB, minB))
      assert(maxDd == bestDd && ddId == bestId, s"user $u")
      assert(maxDd >= 0 && maxDd <= maxB - minB)
    }
    assert(out.exists(_._5 > 0), "no user ever draws down — vacuous")
  }

  test("yoyGrowth: the self-join alignment replays; the first year " +
    "has null priors; ratios are the exact-integer quotient") {
    val out = Analytics.yoyGrowth(spark, sfDir).collect()
    val monthly = Tables.orders(spark, sfDir)
      .select(year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"), col("o_totalprice"))
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)),
        BigDecimal(r.getDouble(2)).setScale(6,
          BigDecimal.RoundingMode.HALF_UP) * 10000))
      .groupBy(_._1).view
      .mapValues(rs => (rs.length.toLong,
        rs.map(_._2.toBigInt.toLong).sum)).toMap
    assert(out.length == monthly.size)
    out.foreach { r =>
      val key = (r.getInt(0), r.getInt(1))
      val (n, rev) = monthly(key)
      assert(r.getLong(2) == n && r.getLong(3) == rev)
      monthly.get((key._1 - 1, key._2)) match {
        case Some((_, prev)) =>
          assert(r.getLong(4) == prev)
          assert(r.getLong(5) == rev - prev)
          assert(r.getDouble(6) == rev.toDouble / prev.toDouble)
        case None => assert(r.isNullAt(4) && r.isNullAt(5))
      }
    }
    assert(out.count(_.isNullAt(4)) >= 1) // a first year exists
    assert(out.exists(r => !r.isNullAt(5) && r.getLong(5) < 0) ||
      out.exists(r => !r.isNullAt(5) && r.getLong(5) > 0))
  }

  test("burstiness: Fano moments replay; the daily-count series is " +
    "super-Poisson or sub-Poisson somewhere, never degenerate") {
    val out = Analytics.burstiness(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    val daily = Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts").cast("date").as("d"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate))
      .groupBy(_._1).view.mapValues(
        _.groupBy(_._2).values.map(_.length.toLong).toSeq).toMap
    assert(out.length == daily.size)
    out.foreach { case (t, nd, sx, num, den, f) =>
      val xs = daily(t)
      assert(nd == xs.length && sx == xs.sum)
      assert(num == nd * xs.map(x => x * x).sum - sx * sx)
      assert(den == (nd - 1) * sx)
      assert(f == num.toDouble / den.toDouble)
      assert(f >= 0) // a variance ratio
    }
    assert(out.exists(r => math.abs(r._6 - 1.0) > 0.01),
      "every series exactly Poisson — fixture suspiciously regular")
  }

  test("recordsTest: record walk and scaled harmonic replay " +
    "sequentially; bounds hold") {
    val out = Analytics.recordsTest(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val daily = Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts").cast("date").as("d"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate))
      .groupBy(_._1).view.mapValues(
        _.groupBy(_._2).toSeq.sortBy(_._1.toEpochDay)
          .map(_._2.length.toLong)).toMap
    assert(out.length == daily.size)
    out.foreach { case (t, nDays, nRec, h, excess) =>
      val xs = daily(t)
      assert(nDays == xs.length)
      var mx = Long.MinValue; var rec = 0L
      xs.foreach { x => if (x > mx) { rec += 1; mx = x } }
      assert(nRec == rec, t)
      assert(h == (1L to nDays).map(1000000L / _).sum)
      assert(excess == nRec * 1000000L - h)
      assert(nRec >= 1 && nRec <= nDays) // day 1 is always a record
    }
  }
}
