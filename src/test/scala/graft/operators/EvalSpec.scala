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
}
