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
}
