package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Specs for the LLM-data-pipeline operators (SURVEY.md §2.10):
  * dedup family cross-consistency, similarity search sanity, text
  * analysis, multimodal plumbing.
  */
class NorthStarSpec extends SparkSpec {

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("dedup_exact: no planted exact duplicates in testdata") {
    val out = Dedup.exact(spark, sfDir)
    assert(out.filter(col("n_copies") > 1).count() == 0)
    assert(out.count() == Tables.documents(spark, sfDir).count())
  }

  test("minhash+LSH recovers nearly all exact-Jaccard near-dup pairs") {
    val exact = pairSet(Dedup.ngramJaccard(spark, sfDir))
    val mh = pairSet(Dedup.minhashPairs(spark, sfDir))
    assert(exact.nonEmpty) // planted near-dups exist
    assert(mh.subsetOf(exact)) // candidates are jaccard-verified
    assert(mh.size >= (exact.size * 0.8).toInt)
  }

  test("simhash pairs cover most high-Jaccard pairs") {
    val exact = pairSet(Dedup.ngramJaccard(spark, sfDir))
    val sh = pairSet(Dedup.simhashPairs(spark, sfDir))
    val recall = exact.intersect(sh).size.toDouble / exact.size
    assert(recall >= 0.5, s"simhash recall $recall")
  }

  test("simhash signature is deterministic across runs") {
    val a = Dedup.simhash(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Dedup.simhash(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("bruteForceTopK: 5 ranked neighbors per probe, sims descending") {
    val rows = Similarity.bruteForceTopK(spark, sfDir).collect()
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 8)
    byQuery.values.foreach { rs =>
      assert(rs.length == 5)
      val sims = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
      assert(rs.forall(r =>
        r.getAs[Long]("neighbor_id") != r.getAs[Long]("query_id")))
    }
  }

  test("annLsh: sims agree with brute force on shared (query, neighbor)") {
    val bf = Similarity.bruteForceTopK(spark, sfDir, k = 100).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("sim")).toMap
    val ann = Similarity.annLsh(spark, sfDir).collect()
    assert(ann.nonEmpty)
    ann.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      bf.get(key).foreach(s => assert(s == r.getAs[Double]("sim")))
    }
  }

  test("annIvf: retrieved sims exact vs brute force; lists partition corpus") {
    val bf = Similarity.bruteForceTopK(spark, sfDir, k = 499).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("sim")).toMap
    val ivf = Similarity.annIvf(spark, sfDir).collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      assert(bf(key) == r.getAs[Double]("sim"))
    }
  }

  test("knnGraph: the exact graph equals a driver-side mutual top-5 " +
    "recompute, and IVF edges are a well-formed subgraph of true " +
    "cosines") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def cos3(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      // same rounding family as Spark's round(): half-up on the
      // double quotient
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val sims = (for {
      (u, uv) <- vecs; (v, vv) <- vecs if u != v
    } yield (u, v) -> cos3(uv, vv)).toMap
    val topk = vecs.map { case (u, _) =>
      u -> vecs.collect { case (v, _) if v != u => v }
        .sortBy(v => (-sims((u, v)), v)).take(5).toSet
    }.toMap
    val expected = (for {
      (u, _) <- vecs; v <- topk(u)
      if u < v && topk(v).contains(u)
    } yield (u, v, sims((u, v)))).toSet
    val exact = Similarity.knnGraph(spark, sfDir, restricted = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(exact == expected, "exact mutual-kNN graph must equal the " +
      s"driver recompute (got ${exact.size} vs ${expected.size})")
    val ivf = Similarity.knnGraph(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(ivf.nonEmpty)
    assert(ivf.map(e => (e._1, e._2)).distinct.length == ivf.length)
    ivf.foreach { case (a, b, s) =>
      assert(a < b, "canonical edge orientation")
      assert(s == sims((a, b)), s"edge ($a,$b) must carry the true " +
        s"round-3 cosine: $s vs ${sims((a, b))}")
    }
  }

  test("pqCodes: Lloyd update never increases distortion; codes " +
    "stay in [0, k); compression is real (m codes per vector)") {
    def meanErr(iters: Int): Double = {
      val rows = Similarity.pqCodes(spark, sfDir, iters = iters).collect()
      rows.foreach { r =>
        (1 to 4).foreach { j =>
          val c = r.getInt(j)
          assert(c >= 0 && c < 16, s"code $c out of range")
        }
      }
      rows.map(_.getDouble(5)).sum / rows.length
    }
    val e1 = meanErr(1) // seed codebooks only
    val e2 = meanErr(2) // + one Lloyd update
    // Lloyd monotonicity (assignment and mean steps each non-increase
    // total squared error); 1e-6 slack for the scaled-integer means
    assert(e2 <= e1 + 1e-6, s"distortion rose: $e1 -> $e2")
  }

  test("pqTopK: ADC ranking recalls most exact-L2 neighbors") {
    val s = spark
    val got = Similarity.pqTopK(s, sfDir).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    // exact L2 ground truth, computed directly (spec scale)
    val vecs = graft.Tables.embeddings(s, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
    val exact = vecs.filter(_._1 < 8).map { case (q, qv) =>
      q -> vecs.filter(_._1 != q)
        .map { case (c, cv) =>
          c -> qv.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum }
        .sortBy { case (c, d) => (d, c) }.take(5).map(_._1).toSet
    }.toMap
    assert(got.keySet == exact.keySet)
    val recall = got.map { case (q, ns) =>
      (ns & exact(q)).size.toDouble / 5 }.sum / got.size
    info(f"PQ ADC recall@5 = $recall%.2f")
    assert(recall >= 0.5, f"recall $recall%.2f below bound")
  }

  test("ivfPqTopK: cell-restricted ADC stays consistent with exact L2 " +
    "and with the unrestricted PQ search") {
    val s = spark
    val got = Similarity.ivfPqTopK(s, sfDir).collect()
    assert(got.nonEmpty)
    val ivfpq = got.groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    // both searches rerank EXACT, so any (query, neighbor) pair they
    // share must carry the identical distance — catches a books/LUT
    // drift between the two paths
    val gotDist = got.map(r =>
      (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val pqRows = Similarity.pqTopK(s, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val common = gotDist.keySet & pqRows.keySet
    assert(common.nonEmpty)
    common.foreach { k =>
      assert(gotDist(k) == pqRows(k), s"exact rerank disagrees on $k")
    }
    // and the coarse restriction keeps useful recall vs exact L2
    val vecs = graft.Tables.embeddings(s, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
    val exact = vecs.filter(_._1 < 8).map { case (q, qv) =>
      q -> vecs.filter(_._1 != q)
        .map { case (c, cv) =>
          c -> qv.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum }
        .sortBy { case (c, d) => (d, c) }.take(5).map(_._1).toSet
    }.toMap
    val recall = ivfpq.map { case (q, ns) =>
      (ns & exact(q)).size.toDouble / 5 }.sum / ivfpq.size
    info(f"IVFPQ recall@5 = $recall%.2f")
    assert(recall >= 0.45, f"recall $recall%.2f below bound " +
      "(deterministic fixture; 0.65 measured with 3-cell multi-probe)")
  }

  test("langId: predictions drawn from the marker-language set") {
    val langs = TextAnalysis.langId(spark, sfDir)
      .select("predicted_lang").distinct()
      .collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "zh", "de")))
  }

  test("qualityScore bounded in [0,1]; tokenCount positive") {
    val q = TextAnalysis.qualityScore(spark, sfDir).collect()
    assert(q.forall { r =>
      val v = r.getAs[Double]("quality_score"); v >= 0.0 && v <= 1.0
    })
    val t = TextAnalysis.tokenCount(spark, sfDir).collect()
    assert(t.forall(_.getAs[Int]("ws_tokens") > 0))
    assert(t.forall(r =>
      r.getAs[Int]("bpe_ish_tokens") >= r.getAs[Int]("ws_tokens")))
  }

  test("fingerprint matches JVM md5 of the normalized text") {
    val row = Tables.documents(spark, sfDir)
      .select("doc_id", "text").orderBy("doc_id").limit(1).collect().head
    val normalized = row.getString(1).trim.toLowerCase
      .replaceAll("\\s+", " ")
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(normalized.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val got = TextAnalysis.fingerprint(spark, sfDir)
      .filter(col("doc_id") === row.getLong(0))
      .collect().head.getAs[String]("fingerprint")
    assert(got == digest)
  }

  test("winnow fingerprints are position-robust: prefix keeps most fps") {
    import graft.functions.Winnow64
    val base = "the quick brown fox jumps over the lazy dog and runs far away"
    val shifted = "PREFIX " + base
    val a = Winnow64.fingerprints(base, 12, 6).toSet
    val b = Winnow64.fingerprints(shifted.toLowerCase, 12, 6).toSet
    assert(a.nonEmpty)
    val overlap = a.intersect(b).size.toDouble / a.size
    assert(overlap >= 0.7, s"overlap $overlap")
  }

  test("winnow short path agrees with the windowed path (unsigned min)") {
    import graft.functions.Winnow64
    val k = 12; val w = 6
    // n chars → n-k+1 rolling hashes; pick n so the short path fires
    // (exactly w hashes), then extend by one char so the windowed path
    // fires — its first window covers the same w hashes, so the short
    // path's single fingerprint must reappear
    val base = "abcdefghijklmnopq" // 17 chars → 6 hashes at k=12
    assert(base.length - k + 1 == w)
    val short = Winnow64.fingerprints(base, k, w)
    assert(short.length == 1)
    val windowed = Winnow64.fingerprints(base + "r", k, w)
    assert(windowed.contains(short.head))
    // returned array is unsigned-sorted
    val ws = windowed.toSeq
    assert(ws == ws.sortWith((a, b) =>
      java.lang.Long.compareUnsigned(a, b) < 0))
  }

  test("winnowPairs recovers most planted near-dup pairs") {
    val exact = pairSet(Dedup.ngramJaccard(spark, sfDir))
    val winnow = TextAnalysis.winnowPairs(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(winnow).size.toDouble / exact.size
    assert(recall >= 0.5, s"winnow recall $recall")
  }

  test("connectedComponents: transitive chains collapse to min-id labels") {
    val s = spark
    import s.implicits._
    // chain 1-2-3-4 (1~2, 2~3, 3~4 without 1~4), pair 7-9, singleton-free
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 9L))
      .toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      7L -> 7L, 9L -> 7L))
  }

  test("connectedComponents: 64-node chain converges (pointer doubling)") {
    val s = spark
    import s.implicits._
    // worst case for plain min-propagation: a single chain, diameter
    // 63 — pointer doubling must still converge in few rounds, and
    // every node must land on the chain's min id
    val chain = (100L until 163L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 64)
    assert(labels.values.forall(_ == 100L))
  }

  test("nearDupClusters: consistent with ngramJaccard pairs") {
    val clusters = Dedup.nearDupClusters(spark, sfDir).collect()
    val byDoc = clusters.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    // every jaccard pair lands in one cluster; keeper is the min id
    pairSet(Dedup.ngramJaccard(spark, sfDir)).foreach { case (a, b) =>
      assert(byDoc(a) == byDoc(b), s"pair ($a,$b) split across clusters")
      assert(byDoc(a) <= a && byDoc(a) <= b)
    }
    clusters.foreach { r =>
      assert((r.getAs[Long]("doc_id") == r.getAs[Long]("cluster_id")) ==
        (r.getAs[Int]("is_keeper") == 1))
    }
  }

  test("tfidf: ranks are 1..k per doc, scores non-increasing, df sane") {
    val rows = TextAnalysis.tfidf(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("doc_id")).values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq ==
        (1 to sorted.length).toSeq)
      val scores = sorted.map(_.getAs[Double]("tfidf"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    // a term in every doc scores tf * 1.0 — never outranks rarer terms
    // with equal tf; df is bounded by the corpus size
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    assert(rows.forall(r => r.getAs[Long]("df") <= nDocs))
  }

  test("piiScrub: injected PII found and byte-exactly removed") {
    val rows = TextAnalysis.piiScrub(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Int]("n_emails") == 1)
      assert(r.getAs[Int]("n_phones") == 1)
      assert(r.getAs[Int]("len_after") < r.getAs[Int]("len_before"))
    }
  }

  test("mm decode stub: byte counts match n_chars (ASCII), hex reversible") {
    val out = Multimodal.decodeMeta(spark, sfDir)
      .join(Tables.documents(spark, sfDir), "doc_id")
    assert(out.filter(col("n_bytes") =!= col("n_chars")).count() == 0)
    val r = out.orderBy("doc_id").limit(1).collect().head
    val decoded = r.getAs[String]("head_hex").grouped(2)
      .map(Integer.parseInt(_, 16).toChar).mkString
    assert(r.getAs[String]("text").startsWith(decoded))
  }

  test("featureExtract: histogram bins sum to byte count, mean in range") {
    val out = Multimodal.featureExtract(spark, sfDir)
      .join(Tables.documents(spark, sfDir), "doc_id")
    val bad = out.filter(
      col("hist0") + col("hist1") + col("hist2") + col("hist3") =!=
        col("n_chars"))
      .count()
    assert(bad == 0) // ASCII text: bytes == chars
    val r = out.orderBy("doc_id").limit(1).collect().head
    val m = r.getAs[Double]("mean_byte")
    assert(m > 0 && m < 256)
  }

  test("resize: output dims are half the decoded dims") {
    val bad = Multimodal.resize(spark, sfDir)
      .filter(col("out_width") =!= (col("width") / 2).cast("int") ||
        col("out_height") =!= (col("height") / 2).cast("int"))
      .count()
    assert(bad == 0)
  }

  test("frameSample: ≤4 frames per doc at stride 16") {
    val out = Multimodal.frameSample(spark, sfDir)
    val counts = out.groupBy("doc_id").count()
    assert(counts.filter(col("count") > 4).count() == 0)
    assert(out.filter(col("byte_offset") % 16 =!= 0).count() == 0)
  }

  test("shardPlan: manifest equals a driver-side sequential packer " +
    "replay; bytes conserve; shards never overflow target by more " +
    "than one item; id ranges are disjoint and ordered") {
    val target = 4096L // small target so multiple shards per source
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"),
        octet_length(col("text")).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      var before = 0L
      rows.sortBy(_._2).map { case (_, id, n) =>
        val shard = before / target; before += n; (src, shard, id, n)
      }.toSeq
    }.groupBy(t => (t._1, t._2)).map { case ((src, sh), items) =>
      (src, sh, items.length.toLong, items.map(_._4).sum,
        items.map(_._3).min, items.map(_._3).max)
    }.toSet
    val got = Multimodal.shardPlan(spark, sfDir, target).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSet == expected)
    // conservation + per-shard overflow bound (< target + max item)
    val bySource = got.groupBy(_._1)
    docs.groupBy(_._1).foreach { case (src, rows) =>
      assert(bySource(src).map(_._4).sum == rows.map(_._3).sum)
    }
    val maxItem = docs.map(_._3).max
    got.foreach { case (_, _, nd, bytes, _, _) =>
      assert(nd > 0 && bytes < target + maxItem)
    }
    // disjoint, ordered id ranges within a source
    bySource.values.foreach { shards =>
      shards.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) => assert(a._6 < b._5)
        case _ =>
      }
    }
  }

  test("epochShuffle: every epoch is a full permutation of the " +
    "manifest, the permutation key recomputes row-locally, and " +
    "epochs actually reorder") {
    val manifest = Multimodal.shardPlan(spark, sfDir)
      .select(col("source"), col("shard_id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val rows = Multimodal.epochShuffle(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet == Set(1, 2, 3))
    byEpoch.foreach { case (e, es) =>
      assert(es.map(x => (x._2, x._3)).toSet == manifest,
        s"epoch $e must cover the manifest exactly")
      assert(es.map(_._5).sorted.toSeq == (1L to manifest.size).toSeq,
        s"epoch $e positions must be a dense permutation")
      // the permutation key recomputes from the dense (shard_id, sk)
      // index — the multiplicative law, epoch in the multiplicand
      val g = manifest.toSeq
        .sortBy { case (src, sh) => (sh, s"$src:$sh") }.zipWithIndex
        .map { case (k, i) => k -> (i + 1L) }.toMap
      es.foreach { case (_, src, sh, h, _) =>
        val want = ((g((src, sh)) * 3L + e) * 2654435761L) % 1000000007L
        assert(h == want, s"permutation key law broke for ($src, $sh)")
      }
    }
    // decorrelation: at least two epochs order some shard pair
    // differently (with >= 2 shards this fails only if all three
    // hash orders coincide — astronomically unlikely by construction)
    val orderOf = byEpoch.view.mapValues(_.sortBy(_._5)
      .map(x => (x._2, x._3)).toSeq).toMap
    assert(manifest.size < 2 || orderOf(1) != orderOf(2) ||
      orderOf(2) != orderOf(3))
  }

  test("repetition: sorted-run top counts equal explode-groupBy max counts") {
    val rep = TextAnalysis.repetition(spark, sfDir)
    // independent derivation of the same statistic through the
    // shuffle-based plan the operator deliberately avoids
    val viaGroupBy = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("doc_id", "w").count()
      .groupBy("doc_id").agg(max("count").as("expect_top"))
    val bad = rep.join(viaGroupBy, "doc_id")
      .filter(col("top_word_n") =!= col("expect_top")).count()
    assert(bad == 0)
    val rows = rep.collect()
    assert(rows.forall(r => r.getAs[Int]("n_bigrams") ==
      r.getAs[Int]("n_words") - 1))
    assert(rows.forall { r =>
      val f = r.getAs[Double]("top_word_frac"); f > 0.0 && f <= 1.0
    })
  }

  test("gopherQuality: sub-signals consistent; word-soup corpus all-alpha") {
    val g = TextAnalysis.gopherQuality(spark, sfDir).collect()
    assert(g.nonEmpty)
    assert(g.forall { r =>
      val mwl = r.getAs[Double]("mean_word_len"); mwl >= 1.0 && mwl <= 20.0
    })
    // the synthetic corpus is lowercase word soup: no symbols, every
    // word alphabetic — the gate must agree with that ground truth
    assert(g.forall(_.getAs[Double]("symbol_ratio") == 0.0))
    assert(g.forall(_.getAs[Double]("alpha_word_frac") == 1.0))
    assert(g.forall { r =>
      val expect = if (r.getAs[Int]("n_words") >= 10 &&
        r.getAs[Int]("n_words") <= 1000 &&
        r.getAs[Double]("mean_word_len") >= 2.0 &&
        r.getAs[Double]("mean_word_len") <= 12.0 &&
        r.getAs[Int]("stopword_n") >= 1) 1 else 0
      r.getAs[Int]("pass_gopher") == expect
    })
  }

  test("incremental: verdicts partition the delta; near matches agree with jaccardPairs") {
    val inc = Dedup.incremental(spark, sfDir).collect()
    val deltaN = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 5 === 0).count()
    assert(inc.length == deltaN) // one verdict per delta doc, no dupes
    assert(inc.map(_.getAs[Long]("doc_id")).distinct.length == inc.length)
    // no exact dups are planted in testdata → verdicts are near/new only
    assert(inc.forall(r => Set("near", "new")(r.getAs[String]("verdict"))))
    val nearSet = inc.filter(_.getAs[String]("verdict") == "near")
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("match_doc_id"))
      .toSet
    // every near verdict is backed by a cross (delta, history) jaccard
    // pair, and every delta doc in such a pair gets a near verdict
    val cross = pairSet(Dedup.ngramJaccard(spark, sfDir))
      .flatMap { case (a, b) =>
        if (a % 5 == 0 && b % 5 != 0) Some(a -> b)
        else if (b % 5 == 0 && a % 5 != 0) Some(b -> a) else None
      }
    assert(nearSet.map(_._1) == cross.map(_._1))
    assert(nearSet.forall { case (d, h) => cross.contains(d -> h) })
    // partner is the SMALLEST qualifying history doc
    assert(nearSet.forall { case (d, h) =>
      h == cross.filter(_._1 == d).map(_._2).min
    })
  }

  test("tokenMixture: budgets respected, every source represented, deterministic") {
    val m = TextAnalysis.tokenMixture(spark, sfDir)
    val rows = m.collect()
    val bySource = rows.groupBy(_.getAs[String]("source"))
    val allSources = Tables.documents(spark, sfDir)
      .select("source").distinct().count()
    assert(bySource.size == allSources) // boundary doc keeps each source alive
    bySource.foreach { case (_, rs) =>
      val budget = rs.head.getAs[Int]("budget")
      val total = rs.map(_.getAs[Int]("n_tokens")).sum
      val maxDoc = rs.map(_.getAs[Int]("n_tokens")).max
      // total may overshoot only by the single boundary doc
      assert(total - maxDoc < budget, s"budget $budget total $total")
    }
    val again = TextAnalysis.tokenMixture(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq ==
      again.map(_.getAs[Long]("doc_id")).toSeq)
  }

  test("qualityFilter: keeps each source's top half by score, threshold per source") {
    val kept = TextAnalysis.qualityFilter(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir)
    val perSource = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keptBySource = kept.groupBy(_.getAs[String]("source"))
    // every source survives the gate (per-domain thresholding, not an
    // absolute cutoff), keeping roughly — never less than — half
    assert(keptBySource.keySet == perSource.keySet)
    keptBySource.foreach { case (src, rs) =>
      val frac = rs.length.toDouble / perSource(src)
      assert(frac >= 0.5 && frac <= 0.7, s"$src kept $frac")
    }
    // the gate is a quantile: every kept score >= every dropped score
    // within the same source
    val dropped = docs.select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filterNot { case (id, _) => kept.exists(_.getAs[Long]("doc_id") == id) }
    val minKept = kept.groupBy(_.getAs[String]("source"))
      .map { case (s, rs) => s -> rs.map(_.getAs[Double]("quality_score")).min }
    val scores = TextAnalysis.qualityScore(spark, sfDir)
      .select(col("doc_id"), col("quality_score")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    dropped.foreach { case (id, src) =>
      assert(scores(id) <= minKept(src), s"dropped $id outscores kept in $src")
    }
  }

  test("resample: copy counts follow source weights; epochs are dense") {
    val r = TextAnalysis.resample(spark, sfDir).collect()
    val byDoc = r.groupBy(_.getAs[Long]("doc_id"))
    // epochs are 1..n_copies with no gaps
    byDoc.foreach { case (_, rs) =>
      val n = rs.head.getAs[Int]("n_copies")
      assert(rs.map(_.getAs[Int]("epoch")).sorted.toSeq == (1 to n))
    }
    // copy counts are an exact deterministic function of (doc_id,
    // source) — recompute them independently and compare (a tolerance
    // band here would pass even with a broken fractional-epoch hash)
    val expected = Tables.documents(spark, sfDir)
      .select("doc_id", "source").collect().flatMap { x =>
        val id = x.getLong(0)
        val w = x.getString(1) match {
          case "src0" => 2.5; case "src1" => 0.5; case _ => 1.0
        }
        val bucket = (id * 2654435761L) % 100
        val n = w.toInt + (if (bucket < (w - w.floor) * 100) 1 else 0)
        if (n > 0) Some(id -> n) else None
      }.toMap
    val actual = byDoc.map { case (id, rs) =>
      id -> rs.head.getAs[Int]("n_copies") }
    assert(actual == expected)
    // deterministic across runs
    val again = TextAnalysis.resample(spark, sfDir).collect()
    assert(r.map(x => (x.getAs[Long]("doc_id"), x.getAs[Int]("epoch"))).toSeq ==
      again.map(x => (x.getAs[Long]("doc_id"), x.getAs[Int]("epoch"))).toSeq)
  }

  test("spanDedup: first occurrences survive, repeats are cut, text rebuilds") {
    val out = TextAnalysis.spanDedup(spark, sfDir).collect()
    val byDoc = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    // every doc row present; kept <= total; clean_text word count
    // equals whole kept spans except possibly one short tail span
    out.foreach { r =>
      val (n, k) = (r.getAs[Int]("n_spans"), r.getAs[Long]("n_kept"))
      assert(k <= n && n > 0)
      val words = r.getAs[String]("clean_text") match {
        case "" => 0; case t => t.split(" ").length
      }
      assert(words <= k * 10 && words > (k - 1) * 10 - 1,
        s"doc ${r.getAs[Long]("doc_id")}: $words words for $k spans")
    }
    // corpus-wide: every span string survives exactly once. Re-chunking
    // the cleaned text reproduces the kept spans exactly — every span
    // is 10 tokens except a doc's trailing one, so cuts never shift
    // window alignment of later spans
    val sp = TextAnalysis.tokens(col("clean_text"))
    val dupSurvivors = TextAnalysis.spanDedup(spark, sfDir)
      .filter(col("clean_text") =!= "")
      .select(explode(transform(
        sequence(lit(0), ceil(size(sp) / lit(10.0)).cast("int") - 1),
        i => array_join(slice(sp, i * 10 + 1, lit(10)), " "))).as("span"))
      .groupBy("span").count().filter(col("count") > 1).count()
    assert(dupSurvivors == 0, s"$dupSurvivors spans survived twice")
    // and some dedup actually happened at this SF (planted near-dups
    // share whole spans)
    assert(out.exists(_.getAs[Double]("dup_span_frac") > 0))
  }

  test("kmeans: every vector assigned once; assignment is the argmin; " +
      "iterating does not worsen mean distance") {
    val out = Similarity.kmeans(spark, sfDir).collect()
    val n = Tables.embeddings(spark, sfDir).count()
    assert(out.length == n)
    assert(out.map(_.getAs[Long]("vec_id")).distinct.length == n)
    val clusters = out.map(_.getAs[Int]("cluster")).distinct
    assert(clusters.length > 1 && clusters.forall(c => c >= 0 && c < 8))
    // Lloyd monotonicity: 2 iterations can't be worse than 1 on the
    // mean squared distance (each step is a coordinate descent)
    def meanDist(iters: Int) =
      Similarity.kmeans(spark, sfDir, iters = iters)
        .agg(avg(col("dist_sq"))).head.getDouble(0)
    // slack covers the scaled-int centroid rounding (≤5e-7/coord)
    assert(meanDist(2) <= meanDist(1) + 1e-3)
    // deterministic across runs
    val again = Similarity.kmeans(spark, sfDir).collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      again.map(r => (r.getLong(0), r.getInt(1))).toSeq)
  }

  test("bpeTrain: merge counts non-increasing in effect, later merges can " +
      "use earlier outputs, deterministic") {
    val m = TextAnalysis.bpeTrain(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.length == 8)
    assert(m.map(_._1).toSeq == (1 to 8))
    assert(m.forall(_._4 > 0))
    // each learned symbol is composed of earlier symbols: every
    // multi-char side must equal some earlier merge's concatenation
    val known = scala.collection.mutable.Set[String]()
    m.foreach { case (_, a, b, _) =>
      for (s <- Seq(a, b) if s.length > 1)
        assert(known.contains(s), s"symbol $s not built by earlier merges")
      known += (a + b)
    }
    // determinism via the greedy-prefix property: a fresh 7-merge
    // training run (different pool key, so NOT a cache hit — a plain
    // re-call would just read the pooled merges back) must reproduce
    // the first 7 merges of the 8-merge run exactly
    val prefix = TextAnalysis.bpeTrain(spark, sfDir, nMerges = 7).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(prefix.toSeq == m.toSeq.take(7))
  }

  test("bpeApply: every doc covered; token counts between words and chars; " +
      "merges only ever shrink the count") {
    val out = TextAnalysis.bpeApply(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir)
    assert(out.length == docs.count())
    val charCounts = docs.select(col("doc_id"),
      length(regexp_replace(lower(trim(col("text"))), "\\s+", ""))
        .as("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.foreach { r =>
      val (ws, bpe) = (r.getAs[Long]("ws_tokens"), r.getAs[Long]("bpe_tokens"))
      // BPE tokens: at least one per word, at most one per character
      assert(bpe >= ws, s"doc ${r.getLong(0)}: $bpe < $ws words")
      assert(bpe <= charCounts(r.getLong(0)),
        s"doc ${r.getLong(0)}: $bpe > chars")
      assert(r.getAs[Double]("tokens_per_word") == bpe.toDouble / ws)
    }
    // 8 merges must compress at least SOME docs below 1 token/char
    val total = out.map(_.getAs[Long]("bpe_tokens")).sum
    assert(total < charCounts.values.map(_.toLong).sum)
  }

  test("hardNegatives: never same label or self; sims agree with brute force") {
    val labels = Tables.embeddings(spark, sfDir)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val hn = Similarity.hardNegatives(spark, sfDir).collect()
    assert(hn.nonEmpty)
    hn.foreach { r =>
      val (q, n) = (r.getAs[Long]("query_id"), r.getAs[Long]("negative_id"))
      assert(n != q)
      assert(labels(n) != labels(q), s"negative $n shares label with $q")
    }
    // a hard negative's sim must match the full-corpus ranking's sim
    // for the same (query, neighbor) pair
    val bf = Similarity.bruteForceTopK(spark, sfDir, k = 499).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("sim")).toMap
    hn.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("negative_id"))
      assert(bf(key) == r.getAs[Double]("sim"))
    }
    // and it must be the TOP different-label sims: nothing excluded
    // from the negatives outranks the worst kept one per query
    hn.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      val worstKept = rs.map(_.getAs[Double]("sim")).min
      val excludedBetter = bf.collect {
        case ((`q`, n), sim) if labels(n) != labels(q) &&
          sim > worstKept && !rs.exists(_.getAs[Long]("negative_id") == n) => n
      }
      assert(excludedBetter.isEmpty,
        s"query $q missed harder negatives: $excludedBetter")
    }
  }

  test("diverseSubset: top-quality docs per kmeans cluster, all clusters hit") {
    val sub = Pipelines.diverseSubset(spark, sfDir).collect()
    val km = Similarity.kmeans(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byCluster = sub.groupBy(_.getAs[Int]("cluster"))
    assert(byCluster.keySet == km.values.toSet) // every cluster represented
    byCluster.foreach { case (c, rs) =>
      assert(rs.length <= 3)
      // members really belong to the cluster, ranked by quality desc
      rs.foreach(r => assert(km(r.getAs[Long]("doc_id")) == c))
      val qs = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("quality_score"))
      assert(qs.zip(qs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("semanticDedup: drops are exactly the closer-to-centroid members " +
      "of within-cluster near-dup pairs") {
    val out = Similarity.semanticDedup(spark, sfDir).collect()
    val km = Similarity.kmeans(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    assert(out.length == km.size) // every vector classified exactly once
    val dropped = out.collect {
      case r if r.getAs[Int]("keep") == 0 => r.getAs[Long]("vec_id")
    }.toSet
    assert(dropped.nonEmpty)
    // cosineNearDup is the FULL >= 0.4 pair set (oracle-checked);
    // semanticDedup must drop one member of each within-cluster pair —
    // the one closer to its centroid — and nothing else
    val within = Similarity.cosineNearDup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => km(a)._1 == km(b)._1 }
    assert(within.nonEmpty)
    val expected = within.map { case (a, b) =>
      if (km(a)._2 < km(b)._2) a else b
    }.toSet
    assert(dropped == expected)
  }

  test("bm25: ranked hits per query, scores positive descending, every " +
      "hit contains a query term") {
    val terms = Map(
      "q1" -> Set("hash", "join"),
      "q2" -> Set("vector", "scan", "filter"),
      "q3" -> Set("spark", "stream"))
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.toLowerCase.split("\\s+").toSet).toMap
    val byQ = TextAnalysis.bm25(spark, sfDir).collect()
      .groupBy(_.getAs[String]("query_id"))
    assert(byQ.keySet == terms.keySet)
    byQ.foreach { case (q, rs) =>
      assert(rs.length == 5)
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to 5))
      val scores = sorted.map(_.getAs[Double]("score"))
      assert(scores.forall(_ > 0))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      sorted.foreach { r =>
        val tok = docs(r.getAs[Long]("doc_id"))
        assert(tok.intersect(terms(q)).nonEmpty,
          s"rank-${r.getAs[Int]("rank")} hit for $q has no query term")
      }
    }
  }

  test("hybridRrf: ranks 1..5 per probe, fused = recomputed RRF " +
      "contributions, sem leg agrees rank-for-rank with bruteForceTopK") {
    val out = TextAnalysis.hybridRrf(spark, sfDir).collect()
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L))
    def contrib(r: org.apache.spark.sql.Row, c: String): Long =
      if (r.isNullAt(r.fieldIndex(c))) 0L
      else math.round(1e6 / (60 + r.getAs[Int](c)))
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to 5))
      val fused = sorted.map(_.getAs[Long]("fused"))
      assert(fused.zip(fused.tail).forall { case (a, b) => a >= b })
      sorted.foreach { r =>
        val want = contrib(r, "lex_rank") + contrib(r, "sem_rank")
        assert(r.getAs[Long]("fused") == want,
          s"query $q cand ${r.getAs[Long]("cand_id")}: fused " +
            s"${r.getAs[Long]("fused")} != $want")
        assert(!r.isNullAt(r.fieldIndex("lex_rank")) ||
          !r.isNullAt(r.fieldIndex("sem_rank")))
      }
    }
    // the semantic leg is the bruteForceTopK ranking (same rounded
    // cosine, same tie-break): any emitted sem_rank <= 5 must appear
    // in the exact top-k at exactly that rank
    val topk = Similarity.bruteForceTopK(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
        -> r.getAs[Int]("rank")).toMap
    out.filter(r => !r.isNullAt(r.fieldIndex("sem_rank")) &&
        r.getAs[Int]("sem_rank") <= 5)
      .foreach { r =>
        val key = (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))
        assert(topk.get(key).contains(r.getAs[Int]("sem_rank")),
          s"$key: sem_rank ${r.getAs[Int]("sem_rank")} not in topk")
      }
  }

  test("mmrRerank: 5 distinct picks per probe, greedy scores " +
      "non-increasing, components consistent, step 1 = relevance top-1") {
    val out = Similarity.mmrRerank(spark, sfDir).collect()
    val emb = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def relM(a: Array[Float], b: Array[Float]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      java.math.BigDecimal.valueOf(dot / (math.sqrt(na) * math.sqrt(nb))
        * 1000).setScale(0, java.math.RoundingMode.HALF_UP).longValue
    }
    val topk = Similarity.bruteForceTopK(spark, sfDir).collect()
      .filter(r => r.getAs[Int]("rank") == 1)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id"))
      .toMap
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L))
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("step"))
      assert(sorted.map(_.getAs[Int]("step")).toSeq == (1 to 5))
      val cands = sorted.map(_.getAs[Long]("cand_id"))
      assert(cands.distinct.length == 5)
      // greedy property: each candidate's score only decays as the
      // selected set grows, so the chosen scores are non-increasing
      val scores = sorted.map(_.getAs[Long]("score_m"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      sorted.foreach { r =>
        assert(r.getAs[Long]("score_m") == 700L * r.getAs[Long]("rel_m")
          - 300L * r.getAs[Long]("maxsim_m"))
      }
      assert(sorted.head.getAs[Long]("maxsim_m") == 0L)
      assert(cands.head == topk(q), s"probe $q: step 1 not the rel top-1")
      // maxsim_m really is the max pairwise sim to the prior picks
      // (recomputed from the raw vectors; ±1 milli absorbs any
      // accumulation-order ulp vs the codegen kernel)
      sorted.zipWithIndex.drop(1).foreach { case (r, i) =>
        val prev = cands.take(i)
        val want = prev.map(p => relM(emb(r.getAs[Long]("cand_id")),
          emb(p))).max
        assert(math.abs(r.getAs[Long]("maxsim_m") - want) <= 1,
          s"probe $q step ${i + 1}: maxsim ${r.getAs[Long]("maxsim_m")}" +
            s" != recomputed $want")
      }
    }
  }

  test("containmentPairs: score = inter/min(sizes) and >= Jaccard; " +
      "direction matches the size relation; every J >= 0.9 pair appears") {
    val cont = Dedup.containmentPairs(spark, sfDir).collect()
    assert(cont.nonEmpty)
    cont.foreach { r =>
      val (ni, na, nb) = (r.getAs[Long]("n_inter"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"))
      val c = r.getAs[Double]("containment")
      assert(c == ni.toDouble / math.min(na, nb))
      assert(c >= 0.9 && c <= 1.0 + 1e-12)
      val jac = ni.toDouble / (na + nb - ni)
      assert(c >= jac)
      val dir = r.getAs[String]("direction")
      assert(if (na < nb) dir == "a_in_b"
        else if (nb < na) dir == "b_in_a" else dir == "mutual")
    }
    // J >= 0.9 forces containment >= 0.9, so those pairs must appear
    val contKeys = cont.map(r => (r.getAs[Long]("doc_a"),
      r.getAs[Long]("doc_b"))).toSet
    val highJ = Dedup.ngramJaccard(spark, sfDir).collect()
      .filter(_.getAs[Double]("jaccard") >= 0.9)
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(highJ.forall(contKeys.contains))
  }

  test("dsirResample: 32 distinct docs, weight = s_t/s_p, sample " +
      "enriched in the target domain vs the corpus base rate") {
    val out = TextAnalysis.dsirResample(spark, sfDir).collect()
    assert(out.length == 32)
    assert(out.map(_.getAs[Long]("rk")).toSeq == (1L to 32L))
    val ids = out.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length == 32)
    out.foreach { r =>
      val (st, sp) = (r.getAs[Long]("s_t"), r.getAs[Long]("s_p"))
      assert(sp > 0)
      assert(r.getAs[Double]("weight") == st.toDouble / sp)
      // add-one smoothing floors every bigram at p >= 1/(c1+V) > 0
      assert(st > 0, s"doc ${r.getAs[Long]("doc_id")} sampled with s_t=0")
    }
    // the selection pressure is the operator's purpose: weighting by
    // the target/proposal likelihood ratio must tilt the sample
    // toward the target domain relative to the corpus base rate
    val langOf = Tables.documents(spark, sfDir)
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val sampleEn = ids.count(langOf(_) == "en").toDouble / ids.length
    val baseEn = langOf.values.count(_ == "en").toDouble / langOf.size
    assert(sampleEn > baseEn,
      s"sample en-fraction $sampleEn not above base rate $baseEn")
  }

  test("lmScore: one row per multi-token doc; n_bigrams = tokens - 1; " +
      "mean probability in (0, 1]") {
    val nTok = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(split(lower(trim(col("text"))), "\\s+")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val out = TextAnalysis.lmScore(spark, sfDir).collect()
    assert(out.length == nTok.count(_._2 >= 2))
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_bigrams") == nTok(id) - 1)
      val p = r.getAs[Double]("avg_p")
      assert(p > 0.0 && p <= 1.0, s"doc $id avg_p $p out of range")
    }
  }

  test("perplexityBuckets: terciles partition the scored set near-" +
    "evenly, ranks are the (avg_p desc, doc_id) permutation, and " +
    "bucket score ranges never interleave") {
    val rows = TextAnalysis.perplexityBuckets(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getLong(3),
        r.getString(4)))
    val n = rows.length
    assert(n == TextAnalysis.lmScore(spark, sfDir).count())
    // lm_rank is exactly the (avg_p desc, doc_id asc) permutation
    val expected = rows.sortBy { case (id, p, _, _) => (-p, id) }
      .zipWithIndex.map { case ((id, _, _, _), i) => id -> (i + 1L) }
      .toMap
    rows.foreach { case (id, _, rk, _) => assert(rk == expected(id)) }
    // tercile sizes within 1 of n/3 and the integer law replays
    val sizes = rows.groupBy(_._4).view.mapValues(_.length).toMap
    assert(sizes.keySet == Set("head", "middle", "tail"))
    sizes.values.foreach(sz =>
      assert(math.abs(sz - n / 3.0) <= 1.0, s"uneven terciles: $sizes"))
    rows.foreach { case (_, _, rk, b) =>
      val want = Seq("head", "middle", "tail")(((rk - 1) * 3 / n).toInt)
      assert(b == want)
    }
    // quality ordering: worst head score >= best tail score
    val headMin = rows.filter(_._4 == "head").map(_._2).min
    val tailMax = rows.filter(_._4 == "tail").map(_._2).max
    assert(headMin >= tailMax)
  }

  test("outlierGate: a planted far vector flags, its tight cluster " +
    "does not, and the corpus gate matches a driver-side replay of " +
    "the integer law") {
    import spark.implicits._
    // label 0: 20 near-identical vectors + one corrupt (zeroed-ish)
    val rows = (0 until 20).flatMap { i =>
      Seq((i.toLong, 0, 0, 0.5 + i * 1e-4), (i.toLong, 0, 1, -0.5))
    } ++ Seq((99L, 0, 0, 0.0), (99L, 0, 1, 0.0))
    val out = Similarity.outlierGateCore(
      rows.toDF("vec_id", "label", "dim", "v")).collect()
      .map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(out(99L) == 1, "the planted corrupt vector must flag")
    assert((0 until 20).forall(i => out(i.toLong) == 0),
      "the tight cluster must not flag")
    // corpus replay: same scaled-integer residual + squared 3-sigma law
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(v => math.round(v.toDouble * 1e3)).toArray))
    val byLabel = vecs.groupBy(_._2)
    val expected = byLabel.toSeq.flatMap { case (_, vs) =>
      val n = vs.length.toLong
      val dims = vs.head._3.length
      val s1 = Array.tabulate(dims)(d => vs.map(_._3(d)).sum)
      val d2s = vs.map { case (id, _, xs) =>
        id -> (0 until dims).map { d =>
          val e = n * xs(d) - s1(d); e * e }.sum
      }
      val k = d2s.length
      val mean = d2s.map(x => BigDecimal(x._2)).sum.toDouble / k
      val vr = d2s.map(x => BigDecimal(x._2) * BigDecimal(x._2))
        .sum.toDouble / k - mean * mean
      d2s.toSeq.map { case (id, d2) =>
        id -> ((d2, if ((d2 - mean) * (d2 - mean) > 9.0 * vr) 1 else 0))
      }
    }.toMap
    val got = Similarity.outlierGate(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getInt(3)))).toMap
    assert(got == expected)
  }

  test("labelCentroids: one row per (label, dim); mean within value range") {
    val c = Similarity.labelCentroids(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val nLabels = emb.select("label").distinct().count()
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    assert(c.count() == nLabels * dim)
    // each centroid lies within [min, max] of its label's values at
    // that dim (mean containment), checked against an independent
    // posexplode derivation
    val bounds = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg(min("v").as("lo"), max("v").as("hi"))
    val bad = c.join(bounds, Seq("label", "dim"))
      .filter(col("centroid") < col("lo") - 1e-6 ||
        col("centroid") > col("hi") + 1e-6)
      .count()
    assert(bad == 0)
  }

  test("vocabGrowth: docs and types conserve, the cumulative curve is " +
    "monotone, and the final point is the whole vocabulary") {
    val rows = TextAnalysis.vocabGrowth(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    assert(rows.nonEmpty && rows.forall(r => r._1 >= 1 && r._1 <= 10))
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_._2).sum == nDocs, "docs not conserved")
    val vocab = Tables.documents(spark, sfDir)
      .select(explode(TextAnalysis.tokens(col("text"))).as("t"))
      .distinct().count()
    assert(rows.map(_._4).sum == vocab, "types not conserved")
    assert(rows.last._5 == vocab, "final cumulative != vocabulary")
    val cums = rows.map(_._5)
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    // each decile's new types can't exceed its token volume
    rows.foreach { r => assert(r._4 <= r._3) }
  }

  test("collocations: min-count floor holds, the staged integer ratio " +
    "recomputes from the emitted counts, and top bigrams outscore " +
    "their unigram-rate prediction") {
    val rows = TextAnalysis.collocations(spark, sfDir).collect()
    assert(rows.length > 0 && rows.length <= 50)
    val nTotal = {
      // recompute N the way the operator defines it (all bigrams)
      import spark.implicits._
      Tables.documents(spark, sfDir)
        .select(TextAnalysis.tokens(col("text")).as("ts"))
        .filter(size(col("ts")) > 1)
        .agg(sum(size(col("ts")) - 1)).head.getLong(0)
    }
    rows.foreach { r =>
      val (ab, a, b, ppm) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(ab >= 5, "min-count floor violated")
      assert(ppm == (ab * 1000000L / a) * nTotal / b,
        s"${r.getString(0)} ${r.getString(1)}: ratio mismatch")
      // PMI > 0 for every surfaced collocation: observed co-occurrence
      // beats the independence prediction
      assert(ppm > 1000000L, s"ratio $ppm not above independence")
    }
    val ppms = rows.map(_.getLong(5))
    assert(ppms.zip(ppms.tail).forall { case (x, y) => x >= y },
      "not sorted by ratio")
  }
}
