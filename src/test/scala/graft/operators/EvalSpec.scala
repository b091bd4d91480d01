package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The model-evaluation plane over the trained classifier (AUC,
  * conformal coverage, label noise) and the event log (off-policy
  * value): each operator's distributed form is checked against an
  * independent brute-force replay at sf0.001 — exactness vs DuckDB is
  * the driver oracle's job, these pin the STATISTICS' definitions.
  */
class EvalSpec extends SparkSpec {

  test("classifierAuc equals the brute-force pair count (ties at half " +
    "weight), and the rank identity holds") {
    val row = Learn.classifierAuc(spark, sfDir).collect().head
    val (nPos, nNeg, u2, auc) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getDouble(3))
    // brute force over the collected scores: U2 = 2*#(p+ > p-) + #ties
    val ps = Learn.scoredDocs(spark, sfDir)
      .select(round(col("p") * 1e6).cast("long"), col("y")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pos = ps.filter(_._2 == 1L).map(_._1)
    val neg = ps.filter(_._2 == 0L).map(_._1)
    assert(nPos == pos.length && nNeg == neg.length)
    val u2Brute = pos.map(pp =>
      2L * neg.count(pn => pp > pn) + neg.count(pn => pp == pn)).sum
    assert(u2 == u2Brute, s"u2 $u2 != brute $u2Brute")
    assert(auc >= 0.0 && auc <= 1.0)
    // the operator surfaces auc rounded to 6 decimals
    assert(math.abs(auc - u2.toDouble / (2.0 * nPos * nNeg)) <= 5e-7)
  }

  test("conformalThreshold: q is the minimal calibration score whose " +
    "cumulative count clears the exact rank; holdout coverage is the " +
    "recount") {
    val row = Learn.conformalThreshold(spark, sfDir).collect().head
    val (nCal, kRank, q, nEval, nCov, covPpm) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getLong(4), row.getLong(5))
    val sd = Learn.scoredDocs(spark, sfDir)
      .select(col("doc_id"),
        abs(col("y") * 1000000L - round(col("p") * 1e6).cast("long"))
          .as("nc"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cal = sd.filter(_._1 % 5 == 0).map(_._2).sorted
    val ev = sd.filter(_._1 % 5 != 0).map(_._2)
    assert(nCal == cal.length && nEval == ev.length)
    val kWant = ((nCal + 1) * 900000L + 999999L) / 1000000L
    assert(kRank == kWant)
    assert(q == cal(kRank.toInt - 1), "q is not the k-th smallest nc")
    assert(nCov == ev.count(_ <= q))
    assert(covPpm == nCov * 1000000L / nEval)
    // split-conformal delivers ~1-alpha coverage; generous band for
    // the finite fixture
    assert(covPpm >= 800000L, s"coverage collapsed: $covPpm ppm")
  }

  test("ipsOffPolicy: estimates equal the driver replay; SNIPS is a " +
    "weight-normalized mean in [0,1]") {
    val got = Learn.ipsOffPolicy(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(got.nonEmpty)
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val nTotal = ev.length.toLong
    val byType = ev.groupBy(_._2)
    got.foreach { case (t, nLog, nRew, sumW, sumRw, ips, snips) =>
      val rows = byType(t)
      assert(nLog == rows.length)
      val rep = rows.map { case (id, _, v) =>
        val prop = 100000L + ((id % 2147483648L) * 2654435761L) % 800001L
        val wk = 1000000000L / prop
        val r = if (v >= 50.0) 1L else 0L
        (r, wk)
      }
      assert(nRew == rep.map(_._1).sum)
      assert(sumW == rep.map(_._2).sum)
      assert(sumRw == rep.map(p => p._1 * p._2).sum)
      assert(math.abs(ips - sumRw.toDouble / (nTotal * 1000.0)) < 1e-6)
      assert(math.abs(snips - sumRw.toDouble / sumW.toDouble) < 1e-6)
      assert(snips >= 0.0 && snips <= 1.0)
    }
  }

  test("kaplanMeier: risk sets recount from the raw spans; the ppm " +
    "recurrence replays; the curve is monotone non-increasing") {
    val km = Analytics.kaplanMeier(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(km.nonEmpty)
    assert(km.map(_._1).toSeq == km.map(_._1).toSeq.sorted)
    assert(km.map(_._4).toSeq == km.map(_._4).toSeq.sorted.reverse,
      "survival not monotone non-increasing")
    km.foreach { case (_, nRisk, d, s) =>
      assert(d >= 1 && d <= nRisk); assert(s >= 0 && s <= 1000000L)
    }
    // independent replay from the per-customer spans
    val o = graft.Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(min(to_date(col("o_orderdate"))).as("f"),
        max(to_date(col("o_orderdate"))).as("l"))
      .select(datediff(col("l"), col("f")).as("dur"), col("l"))
      .collect().map(r => (r.getInt(0), r.getDate(1)))
    val cut = graft.Tables.orders(spark, sfDir)
      .agg(date_sub(max(to_date(col("o_orderdate"))), 90)).collect()
      .head.getDate(0)
    val n = o.length.toLong
    val byDur = o.groupBy(_._1).map { case (t, rs) =>
      (t, rs.length.toLong,
        rs.count(_._2.toLocalDate.isBefore(cut.toLocalDate)).toLong)
    }.toSeq.sortBy(_._1)
    var cum = 0L; var s = 1000000L
    val want = byDur.flatMap { case (t, nExit, d) =>
      val nRisk = n - cum
      cum += nExit
      if (d > 0) { s = s * (nRisk - d) / nRisk; Some((t, nRisk, d, s)) }
      else None
    }
    assert(km.toSeq == want)
  }

  test("cuped: moments replay from the per-user sums; adjusted effect " +
    "is raw minus theta times the covariate gap; rho2 in [0,1]") {
    val row = Analytics.cuped(spark, sfDir).collect().head
    val (n, nT, nC) = (row.getLong(0), row.getLong(1), row.getLong(2))
    val (theta, raw, adj, rho2) = (row.getDouble(3), row.getDouble(4),
      row.getDouble(5), row.getDouble(6))
    assert(n == nT + nC && nT > 0 && nC > 0)
    assert(rho2 >= 0.0 && rho2 <= 1.0)
    // replay from collected per-user (x, y, tr)
    val per = graft.Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(sum(when(col("ts") < lit("2024-01-16").cast("timestamp"),
        round(col("value")).cast("long")).otherwise(0L)).as("x"),
        sum(when(col("ts") >= lit("2024-01-16").cast("timestamp"),
          round(col("value")).cast("long")).otherwise(0L)).as("y"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .map { case (u, x, y) =>
        (x, y, (u % 2147483648L) * 2654435761L % 100L < 50L) }
    val (sx, sy) = (per.map(_._1).sum, per.map(_._2).sum)
    val sxy = per.map(p => p._1 * p._2).sum
    val sxx = per.map(p => p._1 * p._1).sum
    val covN = n * sxy - sx * sy; val varXN = n * sxx - sx * sx
    assert(math.abs(theta - covN.toDouble / varXN) <= 5e-7)
    val t = per.filter(_._3); val c = per.filterNot(_._3)
    assert(nT == t.length && nC == c.length)
    val yDiff = t.map(_._2).sum.toDouble / t.length -
      c.map(_._2).sum.toDouble / c.length
    val xDiff = t.map(_._1).sum.toDouble / t.length -
      c.map(_._1).sum.toDouble / c.length
    assert(math.abs(raw - yDiff) <= 5e-7)
    assert(math.abs(adj - (yDiff - covN.toDouble / varXN * xDiff)) <= 1e-6)
  }

  test("labelNoise: thresholds are the integer-div class means; cells " +
    "partition the confident set; shares sum to ~1e6") {
    val cells = Learn.labelNoise(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(cells.nonEmpty)
    val nConf = cells.head._4
    assert(cells.map(_._3).sum == nConf,
      "cells do not partition the confident set")
    val shareSum = cells.map(_._5).sum
    assert(shareSum > 1000000L - cells.length && shareSum <= 1000000L,
      s"shares sum to $shareSum")
    cells.foreach { case (g, yh, _, _, _, noise) =>
      assert(noise == (g != yh))
      assert(g == 0L || g == 1L); assert(yh == 0L || yh == 1L)
    }
    // replay: thresholds + qualification + argmax on the collected docs
    val sd = Learn.scoredDocs(spark, sfDir)
      .select(round(col("p") * 1e6).cast("long"), col("y")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val p1 = sd.filter(_._2 == 1L); val p0 = sd.filter(_._2 == 0L)
    val t1 = p1.map(_._1).sum / p1.length
    val t0 = p0.map(p => 1000000L - p._1).sum / p0.length
    val rep = sd.flatMap { case (pm, y) =>
      val c1 = pm >= t1; val c0 = 1000000L - pm >= t0
      val yh = if (c1 && c0) Some(if (pm >= 1000000L - pm) 1L else 0L)
        else if (c1) Some(1L) else if (c0) Some(0L) else None
      yh.map(v => (y, v))
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(cells.map(c => (c._1, c._2) -> c._3).toMap == rep)
  }

  test("did: cell means and the DID replay from the raw orders; " +
    "assignment partitions the order set") {
    val row = Analytics.did(spark, sfDir).collect().head
    val (nT, nC, mT0, mTp, mC0, mCp, didMicro, did) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getLong(4), row.getLong(5), row.getLong(6), row.getDouble(7))
    val os = graft.Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderdate").cast("string"),
        col("o_totalprice")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(nT + nC == os.length)
    def cell(tr: Boolean, post: Boolean): Long = {
      val xs = os.filter { case (ck, d, _) =>
        (((ck % 2147483648L) * 2654435761L % 2147483648L)
          >= 1073741824L) == tr && (d >= "1998-01-01") == post
      }.map(o => math.round(o._3 * 1e6))
      xs.sum / xs.length
    }
    assert(mT0 == cell(tr = true, post = false))
    assert(mTp == cell(tr = true, post = true))
    assert(mC0 == cell(tr = false, post = false))
    assert(mCp == cell(tr = false, post = true))
    assert(didMicro == (mTp - mT0) - (mCp - mC0))
    assert(math.abs(did - didMicro.toDouble / 1e6) <= 5e-7)
  }

  test("sprt: the llr walk is the literal-weight prefix sum per type; " +
    "verdicts follow the bounds; decided_day is the first crossing") {
    val rows = Analytics.sprt(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5),
        Option(r.getDate(6)).map(_.toString)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, days) =>
      val sorted = days.sortBy(_._2)
      var cum = 0L
      var firstCross: Option[String] = None
      sorted.foreach { case (_, day, n, x, llr, verdict, decided) =>
        cum += x * -133531L + (n - x) * 80043L
        assert(llr == cum, s"llr mismatch on $day: $llr vs $cum")
        val want = if (cum >= 2944439L) "accept_h1"
          else if (cum <= -2944439L) "accept_h0" else "continue"
        assert(verdict == want)
        if (firstCross.isEmpty && math.abs(cum) >= 2944439L)
          firstCross = Some(day)
        assert(decided == firstCross, s"decided_day on $day")
      }
    }
  }

  test("drOffPolicy: outcome model from the even half, correction from " +
    "the odd half; the DR value replays exactly") {
    val got = Learn.drOffPolicy(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(got.nonEmpty)
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val nEval = ev.count(_._1 % 2 == 1).toLong
    got.foreach { case (t, nModel, rhat, nMatched, nE, sumCorr, dr) =>
      val mine = ev.filter(_._2 == t)
      val model = mine.filter(_._1 % 2 == 0)
      assert(nModel == model.length && nE == nEval)
      val rhatRep =
        model.count(_._3 >= 50.0).toLong * 1000000L / model.length
      assert(rhat == rhatRep)
      val eval = mine.filter(_._1 % 2 == 1)
      assert(nMatched == eval.length)
      val corr = eval.map { case (id, _, v) =>
        val prop = 100000L + ((id % 2147483648L) * 2654435761L) % 800001L
        val wk = 1000000000L / prop
        wk * ((if (v >= 50.0) 1L else 0L) * 1000000L - rhat)
      }.sum
      assert(sumCorr == corr)
      val want = (nEval * rhat * 1000L + corr).toDouble / (nEval * 1e9)
      assert(math.abs(dr - want) <= 5e-7)
      // the model term anchors DR near the conversion-rate scale
      assert(dr > -0.5 && dr < 1.5, s"DR off the rails: $dr")
    }
  }

  test("bradleyTerry: wins/games replay from the deterministic " +
    "pairing; both integer MM iterations replay; a strictly dominant " +
    "lang outranks a strictly dominated one") {
    val got = Learn.bradleyTerry(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    val sd = Learn.scoredDocs(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        round(col("p") * 1e6).cast("long")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val comps = sd.groupBy(_._1 / 2).values.toSeq
      .filter(_.length == 2)
      .map(_.sortBy(_._1))
      .map { pair =>
        val (_, la, pa) = pair(0); val (_, lb, pb) = pair(1)
        if (pa > pb) (la, lb) else if (pb > pa) (lb, la)
        else if (la < lb) (la, lb) else (lb, la)
      }
      .filter(p => p._1 != p._2)
    val wins = comps.groupBy(identity).view.mapValues(_.length.toLong)
      .toMap
    val games = wins.toSeq
      .flatMap { case ((i, j), n) => Seq(((i, j), n), ((j, i), n)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val items = games.keys.map(_._1).toSeq.distinct.sorted
    val totW = items.map(i =>
      i -> wins.collect { case ((w, _), n) if w == i => n }.sum).toMap
    got.foreach { case (lang, g, w, _, _) =>
      assert(g == games.collect { case ((i, _), n) if i == lang => n }.sum)
      assert(w == totW(lang))
    }
    def iter(wm: Map[String, Long]): Map[String, Long] = {
      val raw = items.map { i =>
        val denom = items.filter(_ != i).map { j =>
          games.get((i, j)).fold(0L)(g =>
            g * 100000000L / math.max(wm(i) + wm(j), 1L))
        }.sum
        i -> totW(i) * 1000000000L / math.max(denom, 1L)
      }.toMap
      val sumraw = raw.values.sum
      raw.view.mapValues(r =>
        r * 1000000L / math.max(sumraw / items.length, 1L)).toMap
    }
    val w1 = iter(items.map(_ -> 1000000L).toMap)
    val w2 = iter(w1)
    got.foreach { case (lang, _, _, g1, g2) =>
      assert(g1 == w1(lang), s"w1 mismatch for $lang")
      assert(g2 == w2(lang), s"w2 mismatch for $lang")
    }
    // ranking sanity: if some lang never wins and another never loses,
    // the undefeated one carries the larger strength
    val undef = items.filter(i => totW(i) > 0 &&
      totW(i) == games.collect { case ((a, _), n) if a == i => n }.sum)
    val winless = items.filter(i => totW(i) == 0)
    for (u <- undef; l <- winless) assert(w2(u) > w2(l))
  }

  private def ordersArmed = graft.Tables.orders(spark, sfDir)
    .select(col("o_custkey"), col("o_totalprice")).collect()
    .map { r =>
      val tr = (r.getLong(0) % 2147483648L) * 2654435761L %
        2147483648L >= 1073741824L
      (tr, r.getDouble(1))
    }

  test("qte: per-arm histogram quantiles replay at the integer ranks; " +
    "each arm's estimate is within one bin of the exact quantile") {
    val rows = Analytics.qte(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.map(_._1).toSeq == Seq("p25", "p50", "p75"))
    val os = ordersArmed
    def armQ(tr: Boolean, p: Int, q: Int): Double = {
      val bins = os.filter(_._1 == tr)
        .map(o => math.min(math.max((o._2 / 25000.0).toInt, 0), 63))
      val n = bins.length.toLong
      val rank = (p * n + (q - p)) / q
      val cnt = bins.groupBy(identity).view.mapValues(_.length.toLong)
      var cum = 0L
      (0 to 63).collectFirst {
        case b if { cum += cnt.getOrElse(b, 0L); cum >= rank } =>
          (b + 1) * 25000.0
      }.get
    }
    val pq = Map("p25" -> (1, 4), "p50" -> (1, 2), "p75" -> (3, 4))
    rows.foreach { case (lbl, nT, nC, qt, qc, d) =>
      assert(nT == os.count(_._1) && nC == os.count(!_._1))
      val (p, q) = pq(lbl)
      assert(qt == armQ(tr = true, p, q) && qc == armQ(tr = false, p, q))
      assert(d == qt - qc)
      // sketch contract: estimate within one bin width of the exact
      // order statistic, per arm
      for (tr <- Seq(true, false)) {
        val xs = os.filter(_._1 == tr).map(_._2).sorted
        val n = xs.length.toLong
        val exact = xs(((p * n + (q - p)) / q - 1).toInt)
        val est = if (tr) qt else qc
        assert(est >= exact && est - exact <= 25000.0,
          s"$lbl tr=$tr est $est vs exact $exact")
      }
    }
  }

  test("winsorized: thresholds are the [p5,p95] bin edges; clamp " +
    "counts and arm means replay; clamping tightens the spread") {
    val r = Analytics.winsorized(spark, sfDir).collect().head
    val (lo, hi, nT, nC, nLo, nHi, mT, mC, eff) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8))
    val os = ordersArmed
    val bins = os.map(o => math.min(math.max((o._2 / 25000.0).toInt, 0), 63))
    val n = bins.length.toLong
    val cnt = bins.groupBy(identity).view.mapValues(_.length.toLong)
    def edge(p: Int, q: Int): Long = {
      val rank = (p * n + (q - p)) / q
      var cum = 0L
      (0 to 63).collectFirst {
        case b if { cum += cnt.getOrElse(b, 0L); cum >= rank } =>
          ((b + 1) * 25000.0 * 1e6).toLong
      }.get
    }
    assert(lo == edge(1, 20) && hi == edge(19, 20))
    val micro = os.map(o => (o._1, math.round(o._2 * 1e6)))
    assert(nLo == micro.count(_._2 < lo) && nHi == micro.count(_._2 > hi))
    def mean(tr: Boolean): Long = {
      val xs = micro.filter(_._1 == tr)
        .map(m => math.min(math.max(m._2, lo), hi))
      xs.sum / xs.length
    }
    assert(nT == micro.count(_._1) && nC == micro.count(!_._1))
    assert(mT == mean(tr = true) && mC == mean(tr = false))
    assert(eff == mT - mC)
    assert(nLo + nHi < n, "clamp should not swallow the distribution")
  }

  test("powerMde: moments replay; the MDE chain matches the literal " +
    "z-sum formula on the conservative arm size") {
    val rows = Analytics.powerMde(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), BigInt(r.getString(4)),
        r.getDouble(5), r.getDouble(6)))
    // hash-stable emission (round-12 driver gate): the wide variance
    // numerator rides as a plain digit string — no sign, no exponent,
    // no leading zeros — so both engines' Arrow exports are identical
    rows.foreach { case (_, _, _, _, v, _, _) =>
      assert(v >= 0, "variance numerator must be non-negative") }
    assert(Analytics.powerMde(spark, sfDir).schema("var_num").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(rows.nonEmpty)
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    rows.foreach { case (t, n, nT, nC, varNum, s2, mde) =>
      val mine = ev.filter(_._1 == t)
      val xs = mine.map(e => math.round(e._3))
      assert(n == xs.length)
      val rep = mine.count(e =>
        (e._2 % 2147483648L) * 2654435761L % 100L < 50L)
      assert(nT == rep && nC == n - rep)
      val (sx, sxx) = (xs.sum, xs.map(x => x * x).sum)
      // widened replay: the decimal(38,0) var_num must equal the
      // arbitrary-precision product, not the int64-wrapped one
      assert(varNum == BigInt(n) * BigInt(sxx) - BigInt(sx) * BigInt(sx))
      val s2rep = math.rint(varNum.toDouble / (n.toDouble * (n - 1).toDouble)
        * 1e6) / 1e6
      assert(s2 == s2rep)
      val want = math.rint(2.801585 * math.sqrt(s2rep) *
        math.sqrt(2.0 / math.min(nT, nC).toDouble) * 1e6) / 1e6
      assert(math.abs(mde - want) <= 1e-6, s"$t mde $mde vs $want")
      assert(mde > 0.0)
    }
  }

  test("neymanAlloc: moments/isqrt/floor-allocation replay; the " +
    "budget is spent exactly; bigger N·σ never gets less") {
    // schema pin (round-12 verdict item 1's twin check): every output
    // column except the key is BIGINT on BOTH engines — the widened
    // HUGEINT/DECIMAL arithmetic is internal only, so no wide-integer
    // physical type can reach the driver's hash (see powerMde's
    // var_num for what happens when one does)
    val nSchema = Pipelines.neymanAlloc(spark, sfDir).schema
    nSchema.fields.filter(_.name != "segment").foreach(f =>
      assert(f.dataType == org.apache.spark.sql.types.LongType,
        s"${f.name}: ${f.dataType}"))
    val rows = Pipelines.neymanAlloc(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7)))
    assert(rows.map(_._8).sum == 1000L, "budget not exactly spent")
    val cs = graft.Tables.customer(spark, sfDir)
      .select(col("c_mktsegment"), col("c_acctbal")).collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1))))
    rows.foreach { case (seg, nRows, sd, w, fl, rem, _, _) =>
      val xs = cs.filter(_._1 == seg).map(_._2)
      assert(nRows == xs.length)
      val (sx, sxx) = (xs.sum, xs.map(x => x * x).sum)
      val s2 = (nRows * sxx - sx * sx) /
        math.max(nRows * (nRows - 1), 1L)
      assert(sd == math.floor(math.sqrt(s2.toDouble)).toLong)
      assert(w == nRows * sd)
      val sumW = math.max(rows.map(_._4).sum, 1L)
      assert(fl == 1000L * w / sumW && rem == 1000L * w % sumW)
    }
    for (a <- rows; b <- rows if a._4 > b._4)
      assert(a._8 >= b._8, s"${a._1} outweighs ${b._1} but got less")
  }

  test("psm: the caliper 1-NN match replays brute-force (dist then " +
    "control-id tie-break); ATT and the naive diff replay") {
    val r = Pipelines.psm(spark, sfDir).collect().head
    val (nT, nC, nM, rate, sumD, attMicro, att, naive) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7))
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts").cast("string"), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val per = ev.groupBy(_._1).map { case (u, rows) =>
      val x = rows.filter(_._2 < "2024-01-16").map(e => math.round(e._3)).sum
      val y = rows.filter(_._2 >= "2024-01-16").map(e => math.round(e._3)).sum
      (u, x, y, (u % 2147483648L) * 2654435761L % 100L < 50L)
    }.toSeq
    val t = per.filter(_._4); val c = per.filterNot(_._4)
    assert(nT == t.length && nC == c.length)
    val matches = t.flatMap { case (_, xt, yt, _) =>
      val inCal = c.filter(cc => math.abs(cc._2 - xt) <= 50L)
      if (inCal.isEmpty) None
      else {
        val best = inCal.minBy(cc => (math.abs(cc._2 - xt), cc._1))
        Some((yt, best._3, math.abs(best._2 - xt)))
      }
    }
    assert(nM == matches.length)
    assert(rate == nM * 1000000L / nT)
    assert(sumD == matches.map(_._3).sum)
    val dy = matches.map(m => m._1 - m._2).sum
    assert(attMicro == dy * 1000000L / math.max(nM, 1L))
    assert(math.abs(att - dy.toDouble / math.max(nM, 1L)) <= 5e-7)
    val nvWant = t.map(_._3).sum.toDouble / t.length -
      c.map(_._3).sum.toDouble / c.length
    assert(math.abs(naive - nvWant) <= 5e-7)
    // matching balances the covariate by construction: every matched
    // pair differs by at most the caliper
    assert(matches.forall(_._3 <= 50L))
  }

  test("priorShift: confusion rates and the BBSE closed form replay; " +
    "the corrected prior is a proper probability") {
    val r = Learn.priorShift(spark, sfDir).collect().head
    val (c00, c01, c10, c11, nT, m1) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    val (fpr, tpr, mu1, w1) =
      (r.getLong(6), r.getLong(7), r.getLong(8), r.getDouble(9))
    val sd = Learn.scoredDocs(spark, sfDir)
      .select(col("doc_id"), col("y"),
        round(col("p") * 1e6).cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2) >= 500000L))
    val v = sd.filter(_._1 % 2 == 0); val tg = sd.filter(_._1 % 2 == 1)
    assert(c00 == v.count(d => d._2 == 0 && !d._3))
    assert(c01 == v.count(d => d._2 == 0 && d._3))
    assert(c10 == v.count(d => d._2 == 1 && !d._3))
    assert(c11 == v.count(d => d._2 == 1 && d._3))
    assert(nT == tg.length && m1 == tg.count(_._3))
    assert(fpr == c01 * 1000000L / math.max(c00 + c01, 1L))
    assert(tpr == c11 * 1000000L / math.max(c10 + c11, 1L))
    assert(mu1 == m1 * 1000000L / math.max(nT, 1L))
    val raw =
      if (c11 * (c00 + c01) == c01 * (c10 + c11)) 0.5
      else (m1.toDouble / nT - c01.toDouble / (c00 + c01)) /
        (c11.toDouble / (c10 + c11) - c01.toDouble / (c00 + c01))
    val want = math.rint(math.min(math.max(raw, 0.0), 1.0) * 1e6) / 1e6
    assert(math.abs(w1 - want) <= 1e-6)
    assert(w1 >= 0.0 && w1 <= 1.0)
  }

  test("groupSeq: cumulative look counts and the z chain replay; " +
    "boundaries are monotone decreasing; decided_look is the first " +
    "crossing") {
    val rows = Analytics.groupSeq(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6),
        r.getDouble(7), r.getBoolean(8),
        if (r.isNullAt(9)) None else Some(r.getLong(9))))
    assert(rows.nonEmpty)
    val bounds = Map(1L -> 4.562, 2L -> 3.226, 3L -> 2.634,
      4L -> 2.281, 5L -> 2.040)
    rows.groupBy(_._1).foreach { case (_, ls) =>
      val sorted = ls.sortBy(_._2)
      var (cn, cx) = (0L, 0L)
      var first: Option[Long] = None
      sorted.foreach { case (_, look, n, x, cumN, cumX, z, zb, cr, dec) =>
        cn += n; cx += x
        assert(cumN == cn && cumX == cx)
        val want = math.rint((cx * 1000000L - 370000L * cn).toDouble /
          1e6 / math.sqrt(cn.toDouble * 0.2331) * 1e6) / 1e6
        assert(math.abs(z - want) <= 1e-6)
        assert(look >= 1L && look <= 5L, s"look $look outside 1..5")
        assert(zb == bounds(look))
        assert(cr == (math.abs(z) >= zb))
        if (first.isEmpty && cr) first = Some(look)
        assert(dec == first)
      }
    }
    // conservative early, nominal late: the boundary sequence is
    // strictly decreasing in look order
    val seq = (1L to 5L).map(bounds)
    assert(seq.zip(seq.tail).forall { case (a, b) => a > b },
      s"boundaries not strictly decreasing: $seq")
  }

  test("bcubed: the contingency read-off replays from per-doc " +
    "cluster/truth assignments; metrics are proper ppm fractions and " +
    "recall is perfect when clusters refine truth") {
    val r = Dedup.bcubed(spark, sfDir).collect().head
    val (nD, nCl, nTr, p, rc, f1) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(nD == docs.length)
    val tid = docs.groupBy(_._2).values
      .flatMap(g => g.map(d => d._1 -> g.map(_._1).min)).toMap
    // predicted labels via the operator's own pooled CC table
    val cid = graft.operators.Dedup
      .nearDupClusters(spark, sfDir)
      .select(col("doc_id"), col("cluster_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val asg = docs.map(d => (cid.getOrElse(d._1, d._1), tid(d._1)))
    val ct = asg.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val szc = asg.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val szt = asg.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val sp = ct.map { case ((c, _), n) => n * n * 1000000L / szc(c) }.sum
    val sr = ct.map { case ((_, t), n) => n * n * 1000000L / szt(t) }.sum
    assert(nCl == szc.size && nTr == szt.size)
    assert(p == sp / nD && rc == sr / nD)
    assert(f1 == 2L * p * rc / math.max(p + rc, 1L))
    assert(p > 0 && p <= 1000000L && rc > 0 && rc <= 1000000L)
    // exact-dup classes are (by the fixture) a refinement of the
    // near-dup clusters, so every truth class sits inside one
    // cluster => per-doc recall is 1 for those docs; bound loosely
    assert(rc >= p || rc >= 500000L)
  }
}
