package graft.operators

import graft.SparkSpec

/** Large-star/small-star vs label propagation connected components:
  * identical fixpoints on every graph shape, and on the adversarial
  * 100-node chain the star alternation converges in O(log n) rounds
  * where PLAIN one-hop propagation needs O(diameter) — the failure
  * mode both production variants (star, and propagation WITH pointer
  * doubling) are built to avoid, pinned here as executable numbers.
  */
class CCStarSpec extends SparkSpec {

  private def labelsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("100-node chain: same fixpoint; star is log-round like " +
    "doubling, and far below the plain-propagation diameter bound") {
    val s = spark
    import s.implicits._
    val chain = (0L until 99L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (plain, plainRounds) =
      Dedup.ccPropagation(chain, shortcut = false)
    val (prop, propRounds) = Dedup.ccPropagation(chain)
    val (star, starRounds) = Dedup.ccStar(chain)
    val want = (0L until 100L).map(_ -> 0L).toMap
    assert(labelsOf(plain) == want)
    assert(labelsOf(prop) == want)
    assert(labelsOf(star) == want)
    // one hop per round without doubling: the whole 99-edge diameter
    assert(plainRounds >= 99, s"plain=$plainRounds")
    // both production variants are exponentially faster; they track
    // each other within a round on every measured chain length
    assert(starRounds <= 8, s"star=$starRounds")
    assert(propRounds <= 8, s"propagation=$propRounds")
    assert(starRounds < plainRounds / 10,
      s"star=$starRounds plain=$plainRounds")
  }

  test("randomized graphs: both variants equal a sequential " +
    "union-find ground truth (8 seeds)") {
    val s = spark
    import s.implicits._
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      val n = 30 + rnd.nextInt(40)
      val m = rnd.nextInt(2 * n)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        // sequential union-find with min-label resolution
        val parent = Array.tabulate(n.toInt)(identity)
        def find(x: Int): Int =
          if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a.toInt), find(b.toInt))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val touched = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val want = touched.map { v =>
          // min-label = min node id in the component restricted to
          // pair-connected nodes; with union-by-min, find() IS the min
          v -> find(v.toInt).toLong
        }.toMap
        val df = edges.toDF("doc_a", "doc_b")
        val prop = labelsOf(Dedup.connectedComponents(df))
        val star = labelsOf(Dedup.connectedComponentsStar(df))
        assert(prop == want, s"seed=$seed propagation diverged")
        assert(star == want, s"seed=$seed star diverged")
      }
    }
  }

  test("mixed shapes (star hubs, triangles, isolated pairs): " +
    "identical components from both variants") {
    val s = spark
    import s.implicits._
    val edges = (
      // hub 10 with spokes 11..30
      (11L to 30L).map(v => (10L, v)) ++
      // triangle with a redundant edge
      Seq((50L, 51L), (51L, 52L), (50L, 52L), (52L, 50L)) ++
      // isolated pair + a self-loop that must not create a component
      Seq((70L, 71L), (80L, 80L)) ++
      // chain fragment merging into the hub via one bridge
      Seq((31L, 32L), (32L, 33L), (33L, 10L))
    ).toDF("doc_a", "doc_b")
    val prop = labelsOf(Dedup.connectedComponents(edges))
    val star = labelsOf(Dedup.connectedComponentsStar(edges))
    assert(prop == star, s"prop=$prop star=$star")
    // spot semantics: the hub+chain component labels to 10
    assert(star(33L) == 10L && star(11L) == 10L)
    assert(star(70L) == 70L && star(71L) == 70L)
  }

  test("ccInvariants: the in-plan conservation laws hold on the " +
    "fixture corpus — all three violation counts zero, n_docs exact") {
    val r = Dedup.ccInvariants(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r.head
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    assert(row.getAs[Long]("n_docs") == nDocs)
    assert(row.getAs[Long]("n_cross_label_edges") == 0L)
    assert(row.getAs[Long]("n_label_above_member") == 0L)
    assert(row.getAs[Long]("n_rootless_labels") == 0L)
  }
}
