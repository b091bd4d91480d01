package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Corpus-curation selectors: duplicate-n-gram coverage (the
  * RefinedWeb boilerplate metric) and the two-level quota fill
  * (per-language floor + global quality remainder). Both are
  * deterministic total-order selections, so the specs replay them
  * sequentially and demand exact equality.
  */
class CurationSpec extends SparkSpec {

  test("dupCoverage: per-doc counts match a sequential shingle " +
    "recompute; coverage obeys the div-ppm law and its bounds") {
    val out = TextAnalysis.dupCoverage(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // sequential recompute with the same tokenizer and 8-gram window
    val shingles = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect().flatMap { r =>
        val ts = r.getString(1).trim.toLowerCase.split("\\s+", -1)
        if (ts.length >= 8)
          ts.sliding(8).map(w => r.getLong(0) -> w.mkString(" ")).toSet
        else Set.empty[(Long, String)]
      }
    val df = shingles.groupBy(_._2).view.mapValues(_.length).toMap
    val expect = shingles.groupBy(_._1).map { case (d, ss) =>
      val n = ss.length.toLong
      val dup = ss.count(s => df(s._2) > 1).toLong
      d -> (n, dup, dup * 1000000L / n)
    }
    assert(out.keySet == expect.keySet)
    out.foreach { case (d, (n, dup, ppm)) =>
      assert((n, dup, ppm) == expect(d), s"doc $d")
      assert(dup <= n && ppm >= 0 && ppm <= 1000000L)
    }
  }

  test("quotaFill: exactly the budget when supply allows, every " +
    "language keeps its floor, and the fill is the globally best " +
    "leftovers — sequential replay exact") {
    val out = Pipelines.quotaFill(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3)))
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // sequential replay: per-lang top-5, then global best remainder
    val byLang = docs.groupBy(_._2).view.mapValues(
      _.sortBy(d => (-d._3, d._1))).toMap
    val floor = byLang.values.flatMap(_.take(5)).toSet
    val fillQuota = 100 - floor.size
    val fill = docs.filterNot(floor)
      .sortBy(d => (-d._3, d._1)).take(fillQuota).toSet
    val expect =
      floor.map(d => (d._1, d._2, d._3, "floor")) ++
        fill.map(d => (d._1, d._2, d._3, "fill"))
    assert(out.toSet == expect)
    assert(out.length == math.min(100, docs.length))
    assert(out.map(_._1).distinct.length == out.length) // no doc twice
    // floor guarantee: every language with ≥ 5 docs shows ≥ 5 rows
    byLang.foreach { case (lang, ds) =>
      val kept = out.count(_._2 == lang)
      assert(kept >= math.min(5, ds.length), s"$lang starved: $kept")
    }
  }

  test("phraseSearch: the index-probe answers equal a direct " +
    "sequential trigram slide; top-10 cut deterministic") {
    val out = TextAnalysis.phraseSearch(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val tris = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect().flatMap { r =>
        val ts = r.getString(1).trim.toLowerCase.split("\\s+", -1)
        if (ts.length >= 3)
          ts.sliding(3).map(w => r.getLong(0) -> w.mkString(" ")).toSeq
        else Seq.empty[(Long, String)]
      }
    val expect = tris.groupBy(_._2).view.mapValues { occ =>
      (occ.length.toLong, occ.map(_._1).distinct.length.toLong)
    }.toSeq.map { case (p, (n, d)) => (p, n, d) }
      .sortBy { case (p, n, _) => (-n, p) }.take(10)
    assert(out.toSeq == expect)
    out.foreach { case (p, n, d) =>
      assert(p.split(" ").length == 3 && d <= n)
    }
  }

  test("oovRate: per-doc OOV mass matches a sequential recompute " +
    "against the top-16 vocabulary; ppm law and bounds hold") {
    val out = TextAnalysis.oovRate(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val toks = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect().map { r =>
        r.getLong(0) -> r.getString(1).trim.toLowerCase.split("\\s+", -1)
      }
    val corpus = toks.flatMap(_._2).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val vocab = corpus.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(16).map(_._1).toSet
    val expect = toks.map { case (d, ts) =>
      val oov = ts.count(t => !vocab(t)).toLong
      d -> (ts.length.toLong, oov, oov * 1000000L / ts.length)
    }.toMap
    assert(out == expect)
    out.values.foreach { case (n, oov, ppm) =>
      assert(oov <= n && ppm >= 0 && ppm <= 1000000L)
    }
    // the fixture vocabulary is larger than 16, so OOV mass is real
    assert(out.values.map(_._2).sum > 0)
  }

  test("dupSpans: spans equal a sequential islands recompute, are " +
    "disjoint and maximal, and their shingle mass reconciles with a " +
    "direct duplicated-position count") {
    val out = TextAnalysis.dupSpans(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // sequential recompute: positional shingles, cross-doc df, islands
    val pos = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect().flatMap { r =>
        val ts = r.getString(1).trim.toLowerCase.split("\\s+", -1)
        if (ts.length >= 8)
          ts.sliding(8).zipWithIndex.map { case (w, i) =>
            (r.getLong(0), i + 1L, w.mkString(" ")) }.toSeq
        else Seq.empty[(Long, Long, String)]
      }
    val docsPerSh = pos.map(p => (p._3, p._1)).distinct
      .groupBy(_._1).view.mapValues(_.length).toMap
    val dup = pos.filter(p => docsPerSh(p._3) > 1).map(p => (p._1, p._2))
    val expect = dup.groupBy(_._1).toSeq.flatMap { case (d, ps) =>
      val sorted = ps.map(_._2).sorted
      // islands: split where the gap exceeds 1
      sorted.foldLeft(List.empty[(Long, Long)]) {
        case ((s, e) :: tail, p) if p == e + 1 => (s, p) :: tail
        case (acc, p) => (p, p) :: acc
      }.reverse.map { case (s, e) => (d, s, e + 7, e + 7 - s + 1) }
    }.sortBy(t => (t._1, t._2))
    assert(out.toSeq == expect)
    // disjoint + maximal: consecutive spans of a doc leave a gap
    out.groupBy(_._1).values.foreach { spans =>
      spans.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) => assert(s2 > e1 + 1)
        case _ =>
      }
    }
    // mass law: Σ (span_tokens − 7) = duplicated shingle positions
    assert(out.map(_._4 - 7).sum == dup.length)
    out.foreach { case (_, s, e, n) =>
      assert(n == e - s + 1 && n >= 8) // every span ≥ one full 8-gram
    }
  }

  test("diversity: Simpson and TTR ppm match a sequential recompute; " +
    "bounds and degenerate laws hold") {
    val out = TextAnalysis.diversity(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val toks = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect().map { r =>
        r.getLong(0) -> r.getString(1).trim.toLowerCase.split("\\s+", -1)
      }
    val expect = toks.map { case (d, ts) =>
      val n = ts.length.toLong
      val counts = ts.groupBy(identity).map(_._2.length.toLong)
      val c2 = counts.map(c => c * c).sum
      d -> (n, counts.size.toLong, c2,
        (n * n - c2) * 1000000L / (n * n), counts.size * 1000000L / n)
    }.toMap
    assert(out == expect)
    out.values.foreach { case (n, d, c2, simpson, ttr) =>
      assert(simpson >= 0 && simpson < 1000000L) // can never reach 1
      assert(ttr >= 0 && ttr <= 1000000L && d <= n)
      assert(c2 >= n) // Σc² ≥ n (Cauchy–Schwarz with all-ones)
      // single-type doc ⇒ simpson = 0, full-diversity ⇒ ttr = 1e6
      if (d == 1) assert(simpson == 0L)
      if (d == n) assert(ttr == 1000000L)
    }
  }

  test("shardRebalance: both movement counts replay sequentially; " +
    "HRW moves exactly the keys shard 16 wins, far fewer than mod") {
    val out = Pipelines.shardRebalance(spark, sfDir).collect().head
    val keys = Tables.customer(spark, sfDir)
      .select("c_custkey").collect().map(_.getLong(0))
    def h(k: Long, s: Long): Long =
      (k * 2654435761L + s * 2246822519L) % 1000000007L *
        48271L % 1000000007L
    def hrw(k: Long, shards: Int): Long =
      (0L until shards.toLong).maxBy(s => (h(k, s), s))
    val movedMod = keys.count(k => k % 16 != k % 17).toLong
    val movedHrw = keys.count(k => hrw(k, 16) != hrw(k, 17)).toLong
    assert(out.getLong(0) == keys.length.toLong)
    assert(out.getLong(1) == movedMod)
    assert(out.getLong(3) == movedHrw)
    assert(out.getLong(2) == movedMod * 1000000L / keys.length)
    assert(out.getLong(4) == movedHrw * 1000000L / keys.length)
    // minimal-disruption law: a key moves under HRW iff the NEW
    // shard wins it — argmax over a superset changes only then
    keys.foreach { k =>
      if (hrw(k, 16) != hrw(k, 17)) assert(hrw(k, 17) == 16L)
    }
    assert(movedHrw < movedMod, "HRW lost its minimal-disruption edge")
    // and the expected magnitudes: ~1/17 vs ~15/16
    assert(movedHrw.toDouble / keys.length < 0.2)
    assert(movedMod.toDouble / keys.length > 0.8)
  }

  test("retentionGc: keep/gc partition replays the policy " +
    "sequentially; conservation and floor laws hold") {
    val out = Pipelines.retentionGc(spark, sfDir).collect()
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date")).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getDate(2).toLocalDate.toEpochDay))
      .groupBy(_._1)
    assert(out.length == orders.size)
    var gcTotal = 0L
    out.foreach { r =>
      val vs = orders(r.getLong(0))
        .sortBy(v => (-v._3, -v._2)) // newest first, id tiebreak
      val newest = vs.map(_._3).max
      val kept = vs.zipWithIndex.filter { case ((_, _, d), i) =>
        i < 2 || d >= newest - 365 }
      assert(r.getLong(1) == vs.length)
      assert(r.getLong(2) == kept.length)
      assert(r.getLong(3) == vs.length - kept.length)
      assert(r.getLong(4) == kept.count { case ((_, _, d), i) =>
        i >= 2 && d >= newest - 365 })
      assert(r.getDate(5).toLocalDate.toEpochDay ==
        kept.map(_._1._3).min)
      // floor: at least min(2, n) versions always survive
      assert(r.getLong(2) >= math.min(2, vs.length).toLong)
      gcTotal += r.getLong(3)
    }
    assert(gcTotal > 0, "policy never reclaims anything — vacuous")
  }

  test("erasurePlan: every table's work list replays from driver-side " +
    "joins; the transitive hop reaches rows no column match could") {
    val out = Pipelines.erasurePlan(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val subj = Tables.customer(spark, sfDir).select("c_custkey")
      .collect().map(_.getLong(0)).filter(_ % 97 == 0).toSet
    assert(subj.nonEmpty)
    val orders = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val subjOrders = orders.filter(o => subj(o._2)).toMap
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey")
      .collect().map(_.getLong(0))
    val ev = Tables.events(spark, sfDir).select("user_id")
      .collect().map(_.getLong(0))
    assert(out("customer") == ((subj.size.toLong, subj.size.toLong)))
    val so = orders.filter(o => subj(o._2))
    assert(out("orders") ==
      ((so.length.toLong, so.map(_._2).distinct.length.toLong)))
    val se = ev.filter(subj)
    assert(out("events") ==
      ((se.length.toLong, se.distinct.length.toLong)))
    val sl = li.filter(subjOrders.contains)
    assert(out("lineitem_via_orders") == ((sl.length.toLong,
      sl.map(subjOrders).distinct.length.toLong)))
    // the transitive hop is load-bearing: lineitem rows exist for
    // the subjects even though lineitem carries no customer column
    assert(sl.nonEmpty)
  }

  test("ppsAlloc: Hamilton apportionment replays sequentially; the " +
    "budget is exhausted exactly and the quota property holds") {
    val out = Pipelines.ppsAlloc(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("c")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val weights = ev.groupBy(_._1).view
      .mapValues(rs => (rs.length.toLong, rs.map(_._2).sum)).toMap
    val totalW = weights.values.map(_._2).sum
    val base = weights.view.mapValues { case (_, w) =>
      (1000L * w / totalW, 1000L * w % totalW) }.toMap
    val extraN = 1000L - base.values.map(_._1).sum
    val extras = base.toSeq.sortBy { case (t, (_, r)) => (-r, t) }
      .take(extraN.toInt).map(_._1).toSet
    assert(out.length == weights.size)
    out.foreach { case (t, n, w, bs, ex, seats) =>
      assert((n, w) == weights(t))
      assert(bs == base(t)._1)
      assert(ex == (if (extras(t)) 1L else 0L))
      assert(seats == bs + ex)
      // quota property: floor(quota) ≤ seats ≤ ceil(quota)
      val quotaFloor = 1000L * w / totalW
      assert(seats == quotaFloor || seats == quotaFloor + 1)
    }
    assert(out.map(_._6).sum == 1000L) // budget exhausted exactly
    assert(extraN > 0, "no remainder seats — apportionment vacuous")
  }
}
