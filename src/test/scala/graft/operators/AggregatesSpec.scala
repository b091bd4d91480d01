package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class AggregatesSpec extends SparkSpec {

  test("explodeSum: nest→explode→sum equals the direct flat aggregate") {
    val viaExplode = Aggregates.explodeSum(spark, sfDir)
      .select("metric", "n_points").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Tables.events(spark, sfDir)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaExplode == direct)
  }

  test("pivotDaily: pivoted per-type counts sum to total_events") {
    val bad = Aggregates.pivotDaily(spark, sfDir)
      .filter(col("click") + col("error") + col("purchase") +
        col("signup") + col("view") =!= col("total_events"))
      .count()
    assert(bad == 0)
  }

  test("countIf: HOF counts match conditional aggregation") {
    val hof = Aggregates.countIf(spark, sfDir)
    val direct = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(count(when(col("event_type") === "click", 1)).as("n_click_d"))
    val joined = hof.join(direct, "user_id")
      .filter(col("n_click") =!= col("n_click_d"))
    assert(joined.count() == 0)
  }

  test("argmaxLatest: max(struct) agrees with window row_number") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val viaWindow = Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey").as("last_orderkey"))
    val viaAgg = Aggregates.argmaxLatest(spark, sfDir)
      .select("o_custkey", "last_orderkey")
    assert(viaAgg.except(viaWindow).count() == 0)
    assert(viaWindow.except(viaAgg).count() == 0)
  }

  test("countGate: reconciliation passes on an identity transform") {
    val row = Aggregates.countGate(spark, sfDir).collect().head
    assert(row.getAs[Long]("input_rows") == row.getAs[Long]("output_rows"))
    assert(row.getAs[Int]("gate_passed") == 1)
  }

  test("existsFlag: Yes/No flags match per-user event sets") {
    val out = Aggregates.existsFlag(spark, sfDir)
    val purchasers = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    val flagged = out.filter(col("has_purchase") === "Yes")
      .select("user_id").collect().map(_.getLong(0)).toSet
    assert(flagged == purchasers)
  }

  test("roundAvg: one decimal place, bounded by min/max") {
    val out = Aggregates.roundAvg(spark, sfDir).collect()
    out.foreach { r =>
      val v = r.getAs[Double]("avg_acctbal")
      assert((v * 10).round / 10.0 == v)
    }
  }

  test("exactMedianScale equals the single-buffer percentile answer " +
    "without ever buffering the column on one task") {
    val row = Aggregates.exactMedianScale(spark, sfDir).head()
    val n = row.getAs[Long]("n_rows")
    // ground truth: the value at rank ceil(n/2) by a global sort
    val expected = graft.Tables.orders(spark, sfDir)
      .select(col("o_totalprice")).orderBy("o_totalprice")
      .limit(((n + 1) / 2).toInt).orderBy(col("o_totalprice").desc)
      .head().getDouble(0)
    assert(row.getAs[Double]("median_price") == expected)
  }

  test("exactMedianScale: degenerate domains through the real bucket " +
    "logic — constant column (zero width), even count, single row") {
    val s = spark
    import s.implicits._
    // all-equal values force width == 0 — the guard path must still
    // select the value rather than divide by zero
    val const = Aggregates.exactMedianOf(Seq.fill(7)(42.5).toDF("v")).head()
    assert(const.getAs[Double]("median_price") == 42.5)
    assert(const.getAs[Long]("n_rows") == 7L)
    // even count: lower median (rank ceil(n/2) = 2 of 1,2,3,4 → 2)
    val even = Aggregates.exactMedianOf(
      Seq(4.0, 1.0, 3.0, 2.0).toDF("v")).head()
    assert(even.getAs[Double]("median_price") == 2.0)
    // single row
    val one = Aggregates.exactMedianOf(Seq(9.9).toDF("v")).head()
    assert(one.getAs[Double]("median_price") == 9.9)
  }

  test("exactMedianOf: phase-3 membership uses the HISTOGRAM's bucket " +
    "expression, so boundary-sitting values cannot change bucket " +
    "between passes") {
    val s = spark
    import s.implicits._
    // every value lands exactly on a bucket edge (width divides values),
    // plus fp-hostile domains: thirds, and a near-degenerate width where
    // lo + b*width arithmetic loses precision
    val domains: Seq[Seq[Double]] = Seq(
      (0 to 4096).flatMap(i => Seq(i.toDouble, i.toDouble)),
      (0 to 9999).map(i => 0.1 + i * (1.0 / 3.0)),
      Seq.fill(5000)(1e-9) ++ Seq.fill(5001)(1e-9 + 1e-17))
    domains.foreach { xs =>
      val want = xs.sorted.apply((xs.size + 1) / 2 - 1) // lower median
      val got = Aggregates.exactMedianOf(xs.toDF("v")).head()
      assert(got.getAs[Double]("median_price") == want,
        s"n=${xs.size} want=$want got=$got")
      assert(got.getAs[Long]("n_rows") == xs.size.toLong)
    }
  }

  test("slidingDistinct: sub-k window estimates equal an exact " +
    "trailing-7-day recount, one row per observed day") {
    val got = Aggregates.slidingDistinct(spark, sfDir).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // brute exact: per (day, user) distinct pairs, window recount
    val du = Tables.events(spark, sfDir)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct().collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val days = du.map(_._1).distinct
    assert(got.size == days.length && got.nonEmpty)
    days.foreach { d =>
      val exact = du.filter { case (dd, _) =>
        !dd.isAfter(d) && !dd.isBefore(d.minusDays(6))
      }.map(_._2).distinct.length.toLong
      assert(got(d.toString) == exact, s"$d: ${got(d.toString)} vs $exact")
    }
    // the trailing window can only see MORE than any single day
    val dailyExact = du.groupBy(_._1).view.mapValues(_.length.toLong)
    days.foreach { d =>
      assert(got(d.toString) >= dailyExact(d))
    }
  }

  test("decayHalflife: distributed dyadic-unit sums equal a sequential " +
    "recompute exactly; units bounded by [n, 256·n]; the derived " +
    "doubles are the integer sums divided once") {
    val out = Aggregates.decayHalflife(spark, sfDir).collect()
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts").cast("date").as("d"),
        col("value"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getDouble(2)))
    val now = ev.map(_._2.toEpochDay).max
    val seq = ev.groupBy(_._1).map { case (t, rs) =>
      val us = rs.map { case (_, d, v) =>
        val wk = math.min((now - d.toEpochDay) / 7, 8L)
        val u = 1L << (8 - wk).toInt
        (u, math.floor(v * 100).toLong * u)
      }
      t -> (rs.length.toLong, us.map(_._1).sum, us.map(_._2).sum)
    }
    assert(out.map(_.getString(0)).toSet == seq.keySet)
    out.foreach { r =>
      val (n, du, dcu) = seq(r.getString(0))
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == du, s"${r.getString(0)} units")
      assert(r.getLong(3) == dcu, s"${r.getString(0)} cent units")
      assert(du >= n && du <= 256 * n)
      assert(r.getDouble(4) == du / 256.0)
      assert(r.getDouble(5) == dcu / 256.0 / 100.0)
    }
  }

  test("heavyChange: top-20 equals a sequential recompute under the " +
    "(|Δ| desc, user_id) total order; halves partition each user's " +
    "events exactly") {
    val out = Aggregates.heavyChange(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts").cast("date").as("d")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val mid = ev.map(_._2.toEpochDay).min + 15
    val expect = ev.groupBy(_._1).map { case (u, rs) =>
      val before = rs.count(_._2.toEpochDay < mid).toLong
      val after = rs.size - before
      (u, before, after, after - before)
    }.toSeq.sortBy { case (u, _, _, d) => (-math.abs(d), u) }.take(20)
    assert(out.toSeq == expect)
    out.foreach { case (_, b, a, d) => assert(d == a - b) }
  }

  test("pareto: revenue units and ppm shares match a BigDecimal " +
    "sequential recompute; cumulative/head laws hold") {
    val out = Aggregates.pareto(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    val rows = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("l_extendedprice"), col("l_discount"))
      .collect()
    val byBrand = rows.groupBy(_.getString(0)).view.mapValues(_.map {
      r =>
        // the decimal(18,6) casts, replayed with the same HALF_UP
        val ep = BigDecimal(r.getDouble(1))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        val di = BigDecimal(r.getDouble(2))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        (ep * (BigDecimal(1) - di) * 10000).toBigInt.toLong
    }.sum).toMap
    val total = byBrand.values.sum
    val ordered = byBrand.toSeq.sortBy { case (b, v) => (-v, b) }
    var cum = 0L
    val expect = ordered.map { case (b, v) =>
      val prev = cum; cum += v
      def ppm(x: Long) = (BigInt(x) * 1000000 / total).toLong
      (b, v, total, ppm(v), ppm(cum), ppm(prev) < 800000L)
    }
    assert(out.toSeq == expect)
    assert(cum == total) // shares exhaust the corpus
    assert(out.last._5 == 1000000L) // last cumulative share is 100%
    // the head is a prefix: once a row leaves the head, none return
    assert(!out.map(_._6).dropWhile(identity).contains(true))
    assert(out.head._6) // the top brand is always in the head
  }

  test("bitmapDistinct: OR-folded words reproduce the exact distinct " +
    "count, occupied-word count, and event totals per type") {
    val out = Aggregates.bitmapDistinct(spark, sfDir).collect()
    val ev = Tables.events(spark, sfDir)
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byType = ev.groupBy(_._1)
    assert(out.length == byType.size)
    assert(out.map(_.getString(0)).toSeq ==
      out.map(_.getString(0)).toSeq.sorted)
    out.foreach { r =>
      val rows = byType(r.getString(0))
      assert(r.getAs[Long]("n_users") == rows.map(_._2).distinct.length)
      assert(r.getAs[Long]("n_words") ==
        rows.map(_._2 / 32).distinct.length)
      assert(r.getAs[Long]("n_events") == rows.length)
      // the compression claim: never more words than users
      assert(r.getAs[Long]("n_words") <= r.getAs[Long]("n_users"))
    }
  }

  test("bitmapRollup: the TOTAL row is the true cross-type union " +
    "(OR-merge ≡ set union), bounded by the per-type rows") {
    val out = Aggregates.bitmapRollup(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ev = Tables.events(spark, sfDir)
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val perType = ev.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.toSet).toMap
    perType.foreach { case (t, us) => assert(out(t) == us.size) }
    val union = perType.values.reduce(_ ++ _)
    assert(out("TOTAL") == union.size)
    // union bounds: ≥ any single type, ≤ Σ types (users span types)
    assert(out("TOTAL") >= perType.values.map(_.size).max)
    assert(out("TOTAL") <= perType.values.map(_.size).sum)
    assert(out("TOTAL") < perType.values.map(_.size.toLong).sum,
      "no user spans two types — union law vacuous")
  }

  test("bitmapJaccard: every pair's intersection/union/coefficients " +
    "replay from driver-side sets; AND-merge ≡ set intersection") {
    val out = Aggregates.bitmapJaccard(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7)))).toMap
    val sets = Tables.events(spark, sfDir)
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val types = sets.keys.toSeq.sorted
    val expect = (for {
      a <- types; b <- types if a < b
      inter = (sets(a) & sets(b)).size.toLong if inter > 0
    } yield {
      val (na, nb) = (sets(a).size.toLong, sets(b).size.toLong)
      val uni = na + nb - inter
      (a, b) -> ((na, nb, inter, uni, inter * 1000000L / uni,
        inter * 1000000L / math.min(na, nb)))
    }).toMap
    assert(out == expect)
    // laws: inter ≤ min, union ≥ max, overlap ≥ jaccard
    out.values.foreach { case (na, nb, i, u, j, o) =>
      assert(i <= math.min(na, nb) && u >= math.max(na, nb))
      assert(o >= j && j >= 0 && o <= 1000000L)
    }
    assert(out.nonEmpty)
  }

  test("aqpEstimate: both estimators replay sequentially; the ratio " +
    "estimator conditions on exact day totals") {
    val out = Aggregates.aqpEstimate(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts").cast("date").as("d"),
        col("event_id")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate,
        r.getLong(2) * 2654435761L % 16 == 0))
    val types = ev.map(_._1).distinct.sorted
    assert(out.map(_._1).toSeq == types.toSeq)
    val dayTotals = ev.groupBy(_._2).map { case (d, rs) =>
      d -> (rs.length.toLong, rs.count(_._3).toLong) }
    out.foreach { case (t, nExact, nSampled, estU, estR, errU, errR) =>
      val rows = ev.filter(_._1 == t)
      assert(nExact == rows.length)
      assert(nSampled == rows.count(_._3))
      assert(estU == nSampled * 16)
      val expR = rows.groupBy(_._2).map { case (d, rs) =>
        val (nDay, sDay) = dayTotals(d)
        if (sDay > 0) nDay * rs.count(_._3) / sDay else 0L
      }.sum
      assert(estR == expR, t)
      assert(errU == math.abs(estU - nExact) * 1000000L / nExact)
      assert(errR == math.abs(estR - nExact) * 1000000L / nExact)
    }
  }
}
