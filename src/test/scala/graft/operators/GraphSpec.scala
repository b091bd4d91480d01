package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** PageRank contract: mass conservation, positivity, and EXACT
  * equality with an independent driver-side recompute that mirrors
  * the scaled-integer contribution arithmetic — the distributed loop
  * must be bit-identical to the sequential definition, which is what
  * makes the DuckDB oracle able to replay it.
  */
class GraphSpec extends SparkSpec {

  test("pagerank: mass ≈ 1, all positive, exact vs sequential recompute") {
    val out = Graph.pagerank(spark, sfDir).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Double]("rank")).toMap
    assert(out.values.forall(_ > 0.0))
    val mass = out.values.sum
    assert(math.abs(mass - 1.0) < 1e-6, s"rank mass $mass")

    // independent sequential recompute with the same integer scaling
    val pair = graft.Tables.lineitem(spark, sfDir)
      .join(graft.Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy((-(col("l_suppkey") + 1)).as("s"), col("o_custkey").as("c"))
      .agg(count(lit(1)).as("w")).collect()
      .map(r => (r.getAs[Long]("s"), r.getAs[Long]("c"), r.getAs[Long]("w")))
    val edges = pair.flatMap { case (s, c, w) => Seq((s, c, w), (c, s, w)) }
    val outdeg = edges.groupBy(_._1).map { case (k, es) =>
      k -> es.map(_._3).sum
    }
    val n = outdeg.size
    var rank = outdeg.keys.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 3) {
      val sums = scala.collection.mutable.Map.empty[Long, Long]
      edges.foreach { case (src, dst, w) =>
        val contrib = math.round(rank(src) * w / outdeg(src) * 1e12)
        sums(dst) = sums.getOrElse(dst, 0L) + contrib
      }
      rank = sums.map { case (k, s) =>
        k -> (0.15 / n + 0.85 * (s / 1e12))
      }.toMap
    }
    assert(out.keySet == rank.keySet)
    out.foreach { case (k, v) =>
      assert(v == rank(k), s"node $k: distributed $v vs sequential ${rank(k)}")
    }
  }

  test("triangleCount: degree-ordered orientation equals the naive " +
    "id-ordered 3-join, and a hand-built graph counts exactly") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // production path vs a naive recount on the DENSE (minSupport=1)
    // graph — thousands of triangles at the spec sf, so orientation
    // bugs can't hide in a sparse fixture
    val e = Graph.coPurchaseEdges(s, sfDir, minSupport = 1).cache()
    val row = Graph.triangleCountEdges(e).head
    val naive = e.as("e1")
      .join(e.as("e2"), col("e2.a") === col("e1.b"))
      .join(e.as("e3"), col("e3.a") === col("e1.a") &&
        col("e3.b") === col("e2.b"))
      .count()
    assert(naive > 0, "fixture too sparse to prove anything")
    assert(row.getLong(0) == naive, s"${row.getLong(0)} vs $naive")
    assert(row.getLong(1) == e.count())
    e.unpersist()
    // exact count on a known graph through the PRODUCTION path: K4
    // holds C(4,3)=4 triangles; the pendant edge closes nothing
    val k4 = (for {
      i <- 0 to 3; j <- 0 to 3 if i < j
    } yield (i.toLong, j.toLong)) :+ (3L, 9L)
    val tiny = Graph.triangleCountEdges(k4.toDF("a", "b")).head
    assert(tiny.getLong(0) == 4L, tiny.toString)
    assert(tiny.getLong(1) == 7L && tiny.getLong(2) == 5L, tiny.toString)
  }

  test("labelPropagation: a total labeling that coarsens, labels are " +
    "node ids, and rounds actually propagate") {
    val lpa = Graph.labelPropagation(spark, sfDir)
    val nodes = Graph.pagerank(spark, sfDir).select("node")
    // every node labeled exactly once, with an existing node's id
    assert(lpa.count() == nodes.count())
    assert(lpa.select("node").except(nodes).count() == 0)
    assert(lpa.select(col("community").as("node"))
      .except(nodes).count() == 0)
    // propagation coarsens: strictly fewer communities than nodes
    // (l0 = identity labeling; any shared neighborhood merges labels)
    val nComm = lpa.select("community").distinct().count()
    assert(nComm < nodes.count() && nComm > 1, s"n_communities=$nComm")
    // round-for-round determinism vs an independent engine is the
    // driver gate's job (lpaOracle replays each round in DuckDB)
  }

  test("kcoreEdges: pendants peel in round 1, the exposed chain node " +
    "in round 2, the clique survives with its exact degrees") {
    val s = spark
    import s.implicits._
    // K6 on 1..6; two pendants per clique node (101..112); a 2-chain
    // 6-201-202. Degrees: clique 7 (node 6: 8), pendants/202: 1,
    // 201: 2 → n=20, lower median 1, k=2. Round 1 peels the 13
    // degree-1 nodes, EXPOSING 201 (now degree 1); round 2 peels it;
    // round 3 is stable — the cascade is the thing under test.
    val clique = for {
      a <- 1L to 6L; b <- 1L to 6L if a != b
    } yield (a, b)
    val pendants = (0 until 12).flatMap { i =>
      val owner = (i / 2) + 1L; val p = 101L + i
      Seq((owner, p), (p, owner))
    }
    val chain = Seq((6L, 201L), (201L, 6L), (201L, 202L), (202L, 201L))
    val sym = (clique ++ pendants ++ chain).toDF("src", "dst")
    val out = Graph.kcoreEdges(sym, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == (1L to 6L).map(_ -> 5L).toMap, out.toString)
    // one round is NOT enough: 201 survives it (degree 2 at entry)
    // and only round 1's peel exposes it at degree 1 — the
    // bounded-round form must really iterate to remove it
    val after1 = Graph.kcoreEdges(sym, rounds = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after1.keySet == (1L to 6L).toSet + 201L, after1.toString)
    assert(after1(201L) == 1L && after1(6L) == 6L, after1.toString)
  }

  test("personalizedPagerank: supplier top-20 is rank-ordered, keys " +
    "resolve, and seeded teleport shifts mass vs the uniform rank") {
    val rows = Graph.personalizedPagerank(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val ranks = rows.map(_.getDouble(1))
    assert(ranks.forall(_ > 0.0))
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b })
    val supp = Tables.supplier(spark, sfDir)
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    rows.foreach(r => assert(supp(r.getLong(0))))
    // personalization must matter: the PPR supplier ordering is not
    // just the global pagerank ordering restricted to suppliers
    // (identical orderings would mean the seed set did nothing)
    val globalTop = Graph.pagerank(spark, sfDir).collect()
      .filter(_.getLong(0) < 0)
      .map(r => (-r.getLong(0) - 1, r.getDouble(1)))
      .sortBy { case (k, v) => (-v, k) }.take(rows.length).map(_._1)
    assert(!rows.map(_.getLong(0)).sameElements(globalTop),
      "seeded ranking degenerated to the global ordering")
  }

  test("linkPredictionEdges: path/star/triangle fixtures score exactly, " +
    "and no predicted pair is an existing edge") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // path 1-2-3: one non-adjacent pair (1,3) through center 2
    // (deg 2 → 500000); star 10-{11,12,13}: C(3,2) leaf pairs through
    // the deg-3 hub (333333); triangle 20-21-22: fully adjacent, no
    // predictions. Disjoint components keep the cases independent.
    val e = Seq((1L, 2L), (2L, 3L),
      (10L, 11L), (10L, 12L), (10L, 13L),
      (20L, 21L), (20L, 22L), (21L, 22L)).toDF("a", "b")
    val got = Graph.linkPredictionEdges(e, 100).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val expect = Map(
      (1L, 3L) -> (1L, 500000L),
      (11L, 12L) -> (1L, 333333L),
      (11L, 13L) -> (1L, 333333L),
      (12L, 13L) -> (1L, 333333L))
    assert(got == expect, s"$got")
    // production path: predictions disjoint from the edge set, scores
    // positive, output respects the declared total order
    val rows = Graph.linkPrediction(s, sfDir).collect()
    assert(rows.nonEmpty)
    val edges = Graph.coPurchaseEdges(s, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      assert(!edges.contains((r.getLong(0), r.getLong(1))))
      assert(r.getLong(3) > 0 && r.getLong(2) >= 1)
    }
    val keys = rows.map(r => (-r.getLong(3), r.getLong(0), r.getLong(1)))
    assert(keys.sameElements(keys.sorted), "output not in declared order")
  }

  test("bfsHopsEdges: chain fixture distances are hop-exact, two seeds " +
    "take the min, and the 4th hop stays unreached at rounds=3") {
    val s = spark
    import s.implicits._
    // chain 50-1-2-3-4-5 with a second seed 100 hanging off node 3:
    // seeds are the % 50 == 0 nodes (50, 100)
    val e = Seq((1L, 50L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (3L, 100L)).toDF("a", "b")
    val out = Graph.bfsHopsEdges(e, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(50L -> 0, 100L -> 0, 1L -> 1, 3L -> 1,
      2L -> 2, 4L -> 2, 5L -> 3))
    // one round fewer → the frontier stops a hop earlier, nothing else
    // moves (level-synchronous rounds are monotone)
    val short = Graph.bfsHopsEdges(e, rounds = 2).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(short == out - 5L)
  }

  test("bfsHops: dist 0 is exactly the seed set, and every deeper " +
    "node's closest neighbor is one hop nearer (triangle property)") {
    val out = Graph.bfsHops(spark, sfDir)
    val e = Graph.coPurchaseEdges(spark, sfDir)
    val sym = e.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(e.select(col("b").as("src"), col("a").as("dst")))
    val seeds = sym.select(col("src").as("node")).distinct()
      .filter(col("node") % 50 === 0).collect().map(_.getLong(0)).toSet
    val dist = out.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(dist.filter(_._2 == 0).keySet == seeds)
    assert(dist.values.forall(d => d >= 0 && d <= 3))
    // min neighbor distance of every non-seed reached node = dist - 1
    val nbrMin = sym.join(out.withColumnRenamed("node", "src")
        .withColumnRenamed("dist", "sd"), Seq("src"))
      .groupBy(col("dst").as("node")).agg(min(col("sd")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    dist.filter(_._2 > 0).foreach { case (n, d) =>
      assert(nbrMin(n) == d - 1, s"node $n dist $d minNbr ${nbrMin(n)}")
    }
  }

  test("sampled companions: the ¼-node induced subgraph drives the " +
    "SAME operators — kcoreSample equals kcoreEdges on the hand-" +
    "filtered edge set, and every emitted node is a sampled node") {
    val e = Graph.coPurchaseEdges(spark, sfDir)
      .filter(pmod(col("a"), lit(4)) === 0 && pmod(col("b"), lit(4)) === 0)
    val sym = e.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(e.select(col("b").as("src"), col("a").as("dst")))
    val kc = Graph.kcoreSample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val manual = Graph.kcoreEdges(sym, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(kc.toSeq == manual.toSeq)
    assert(kc.forall(_._1 % 4 == 0))
    val bf = Graph.bfsHopsSample(spark, sfDir).collect()
    assert(bf.nonEmpty && bf.forall(_.getLong(0) % 4 == 0))
    // the induced subgraph is a SUBSET of the full graph, so sampled
    // BFS distances can never undercut the full graph's (fewer paths)
    val full = Graph.bfsHops(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    bf.foreach { r =>
      val (n, d) = (r.getLong(0), r.getInt(1))
      full.get(n).foreach(fd => assert(d >= fd,
        s"node $n sampled dist $d < full dist $fd"))
    }
    val md = Graph.modularitySample(spark, sfDir).collect()
    assert(md.nonEmpty && md.forall(_.getLong(0) % 4 == 0))
  }

  test("itemCf: top-5 lists equal a sequential recompute of the cos² " +
    "ppm law; scores bounded by 1e6; lists symmetric in the pair set") {
    val out = Graph.itemCf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getInt(6)))
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val cnt = li.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairs = li.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length)
        yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 2).toMap
    val sym = pairs.toSeq.flatMap { case ((a, b), s) =>
      Seq((a, b, s), (b, a, s)) }
    val scored = sym.map { case (a, b, s) =>
      val c2 = (BigInt(s) * s * 1000000 / (BigInt(cnt(a)) * cnt(b)))
        .toLong
      (a, b, s, cnt(a), cnt(b), c2)
    }
    val expect = scored.groupBy(_._1).toSeq.flatMap { case (_, cs) =>
      cs.sortBy(c => (-c._6, -c._3, c._2)).take(5).zipWithIndex
        .map { case ((a, b, s, ca, cb, c2), i) =>
          (a, b, s, ca, cb, c2, i + 1) }
    }.sortBy(t => (t._1, t._7))
    assert(out.toSeq == expect)
    out.foreach { case (_, _, s, ca, cb, c2, _) =>
      assert(c2 <= 1000000L && c2 >= 0)
      assert(s <= math.min(ca, cb)) // co-occurrence bounded by counts
    }
  }

  test("modularity: per-community numerators replay from a full " +
    "driver-side LPA + rollup; conservation and range laws hold") {
    val out = Graph.modularity(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getDouble(7)))
    // co-purchase symmetric edge list rebuilt driver-side
    val und = Graph.coPurchaseWeighted(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sym = und ++ und.map(e => (e._2, e._1, e._3))
    // synchronous LPA replay, 3 rounds, same tie rule
    var lbl = sym.map(_._1).distinct.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      lbl = sym.groupBy(_._2).view.mapValues { es =>
        es.groupBy(e => lbl(e._1)).view.mapValues(_.map(_._3).sum)
          .toSeq.minBy { case (l, sc) => (-sc, l) }._1
      }.toMap
    }
    val s2m = sym.map(_._3).sum
    val degByComm = sym.groupBy(e => lbl(e._1)).view
      .mapValues(es => (es.map(_._3).sum,
        es.map(_._1).distinct.length.toLong)).toMap
    val winByComm = sym.filter(e => lbl(e._1) == lbl(e._2))
      .groupBy(e => lbl(e._1)).view.mapValues(_.map(_._3).sum).toMap
    assert(out.length == degByComm.size)
    var qNum = 0L
    out.foreach { case (c, n, dc, win, contrib, s, _, _) =>
      val (ed, en) = degByComm(c)
      assert((dc, n) == (ed, en), s"community $c")
      assert(win == winByComm.getOrElse(c, 0L))
      assert(s == s2m && contrib == s2m * win - dc * dc)
      qNum += contrib
    }
    out.foreach { case (_, _, _, _, _, s, qn, q) =>
      assert(qn == qNum && q == qNum.toDouble / (s * s).toDouble)
    }
    // conservation: degrees and in-weights both partition the total
    assert(degByComm.values.map(_._1).sum == s2m)
    assert(winByComm.values.sum <= s2m)
    // a uniform co-occurrence graph has ALMOST no structure — the
    // honest verdict is small-positive Q, not a large one
    val q = out.head._8
    assert(q > 0 && q < 0.1, s"Q out of the structureless band: $q")
  }

  test("localClusteringEdges: hand graph (one triangle + one " +
    "pendant) gets corner-exact coefficients; incidence sums to " +
    "3× the global count on the production graph") {
    val s = spark
    import s.implicits._
    // triangle 1-2-3 with pendant 4 on node 1
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L)).toDF("a", "b")
    val out = Graph.localClusteringEdges(e).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    // node 1: deg 3, 1 triangle, lcc = 1/3; nodes 2,3: deg 2, 1 tri,
    // lcc = 1; node 4: deg 1 → defined 0
    assert(out(1L) == ((3L, 1L, 333333L)))
    assert(out(2L) == ((2L, 1L, 1000000L)))
    assert(out(3L) == ((2L, 1L, 1000000L)))
    assert(out(4L) == ((1L, 0L, 0L)))
    // production law: Σ per-node triangles = 3 · global triangles
    val perNode = Graph.localClustering(spark, sfDir).collect()
      .map(_.getLong(2)).sum
    val global = Graph.triangleCount(spark, sfDir).collect()
      .head.getLong(0)
    assert(perNode == 3 * global)
  }

  test("ssspEdges: a cheap 2-edge path beats an expensive direct " +
    "edge; the ≤-rounds invariant caps path length") {
    val s = spark
    import s.implicits._
    // seed 50; edge weights are 1e6 div sup:
    //   50-1 sup 1 (w 1e6), 50-2 sup 10 (w 1e5), 2-1 sup 10 (w 1e5)
    //   1-3 sup 10 (w 1e5): 3 is reachable in 3 edges via 50-2-1-3
    //   3-4 sup 10: 4 needs 4 edges on the cheap path, 0 direct —
    //   at rounds=3 its best ≤3-edge path goes 50-1-3-4 (1e6+2e5)
    val e = Seq((50L, 1L, 1L), (50L, 2L, 10L), (2L, 1L, 10L),
      (1L, 3L, 10L), (3L, 4L, 10L)).toDF("a", "b", "sup")
    val out = Graph.ssspEdges(e, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(50L -> 0L, 2L -> 100000L, 1L -> 200000L,
      3L -> 300000L, 4L -> 1200000L))
    // one more round relaxes 4 onto the all-cheap path
    val more = Graph.ssspEdges(e, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(more == out + (4L -> 400000L))
  }

  test("sssp: seeds at 0; reach set equals BFS ≤3 hops; every " +
    "distance is within [minW·hops, maxW·hops] of its BFS hop count") {
    val dist = Graph.sssp(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hops = Graph.bfsHops(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(dist.keySet == hops.keySet) // positive weights: same reach
    assert(dist.filter(_._2 == 0L).keySet ==
      hops.filter(_._2 == 0).keySet)
    dist.foreach { case (n, d) =>
      val h = hops(n).toLong
      // any path has ≥ h edges, each edge weight ∈ [1, 500000]
      assert(d >= h && (h == 0 || d >= 1), s"node $n")
      if (h > 0) assert(d <= 500000L * 3, s"node $n") // ≤3 edges used
    }
  }
}
