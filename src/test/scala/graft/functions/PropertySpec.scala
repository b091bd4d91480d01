package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Property-based invariants (SURVEY.md §5.3). Uses raw ScalaCheck
  * generators with fixed seeds (the scalatest-scalacheck bridge is not
  * in the offline cache), so runs are deterministic.
  */
class PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("moneySum is order-independent (exact decimal accumulation)") {
    val s = spark
    import s.implicits._
    val gen = Gen.listOfN(40, Gen.chooseNum(-9999999L, 9999999L))
    samples(gen, 10).foreach { cents =>
      val xs = cents.map(_ / 100.0) // 2-decimal money values
      val a = xs.toDF("v").agg(Scalars.moneySum(col("v"))).head.getDouble(0)
      val b = scala.util.Random.shuffle(xs).toDF("v")
        .agg(Scalars.moneySum(col("v"))).head.getDouble(0)
      assert(a == b) // bitwise equal, not approx
    }
  }

  test("normalizeBooleans is idempotent and preserves truth") {
    val s = spark
    import s.implicits._
    val gen = Gen.listOfN(20, Gen.option(Gen.oneOf(true, false)))
    samples(gen, 10).filter(_.nonEmpty).foreach { bs =>
      val df = bs.zipWithIndex.map { case (b, i) => (i, b) }
        .toDF("id", "flag")
      val twice = Scalars.normalizeBooleans(Scalars.normalizeBooleans(df))
      val got = twice.orderBy("id").collect()
        .map(r => Option(r.get(1)).map(_.asInstanceOf[Int])).toSeq
      val want = bs.map(_.map(b => if (b) 1 else 0))
      assert(got == want)
    }
  }

  test("word_shingles matches a straightforward Scala reference impl") {
    val s = spark
    import s.implicits._
    VectorExpressions.ensureRegistered(s)
    val word = Gen.oneOf("the", "a", "fast", "row", "data", "scan", "key")
    val gen = for {
      ws <- Gen.listOfN(12, word)
      k <- Gen.chooseNum(1, 4)
    } yield (ws, k)
    samples(gen, 20).foreach { case (ws, k) =>
      val text = ws.mkString(" ")
      val want =
        if (ws.size < k) Set.empty[String]
        else ws.sliding(k).filter(_.size == k)
          .map(_.mkString(" ")).toSet
      val got = Seq(text).toDF("t")
        .select(call_function("word_shingles", col("t"), lit(k)))
        .head.getSeq[String](0).toSet
      assert(got == want, s"k=$k ws=$ws")
    }
  }

  test("pairCounts equals the naive self-join intersection counts") {
    val s = spark
    import s.implicits._
    // random (id, key) tables with duplicate keys across ids — the
    // group-expand rewrite must agree with the classic self-equi-join
    val gen = Gen.listOfN(60, for {
      id <- Gen.chooseNum(0L, 9L)
      key <- Gen.oneOf("k1", "k2", "k3", "k4", "k5")
    } yield (id, key))
    samples(gen, 8).foreach { rows =>
      val distinctRows = rows.distinct // one (id, key) row per pair
      val df = distinctRows.toDF("doc_id", "sh")
      val naive = df.as("a")
        .join(df.as("b"), col("a.sh") === col("b.sh") &&
          col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("x"), col("b.doc_id").as("y"))
        .agg(count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      // cap=default → all buckets take the group-expand path here;
      // cap=2 → every bucket takes the hot-bucket codegen join path;
      // cap=4 → buckets split across BOTH paths and the union must
      // still count exactly. All three must be byte-identical.
      Seq(64, 2, 4).foreach { cap =>
        val fast = graft.operators.Dedup.pairCounts(df, "sh", "doc_id", cap)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
        assert(fast == naive, s"cap=$cap")
      }
    }
  }

  test("normalizeBooleans never changes the row count") {
    val s = spark
    import s.implicits._
    samples(Gen.chooseNum(0, 50), 10).foreach { n =>
      val df = (0 until n).map(i => (i.toLong, i % 2 == 0)).toDF("id", "b")
      assert(Scalars.normalizeBooleans(df).count() == n.toLong)
    }
  }

  // ---- mergeable-aggregator partition-invariance -----------------
  // The law Spark's partial aggregation RELIES on: for ANY split of
  // the input into partitions, folding each part with reduce() and
  // combining with merge() must finish() to the same value as one
  // sequential fold. A sketch that silently violates it returns
  // different answers at different parallelism — the worst kind of
  // distributed bug (green at local[1], wrong on the cluster).

  /** Samples with an explicit seed base — lets callers draw DISTINCT
    * deterministic streams (the default `samples` always starts at 42).
    */
  private def samplesAt[A](g: Gen[A], n: Int, seedBase: Long): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(seedBase + i)))

  /** Random ordered split of xs into 1..5 contiguous parts; seedOff
    * varies the generator stream so each caller exercises different
    * splits (it was previously ignored — all three partition-invariance
    * tests drew identical splits).
    */
  private def splitsOf[A](xs: List[A], seedOff: Int): Seq[Seq[List[A]]] =
    samplesAt(Gen.chooseNum(1, 5), 4, 42L + 1000L * seedOff)
      .zipWithIndex.map { case (nParts, i) =>
      val cuts = samplesAt(Gen.chooseNum(0, xs.size), nParts - 1,
        42L + 1000L * seedOff + 17L * (i + 1)).sorted.distinct
      (0 +: cuts :+ xs.size).sliding(2).map {
        case Seq(a, b) => xs.slice(a, b)
      }.toSeq
    }

  test("KmvSketch: partition-invariant under any split + merge order; " +
    "exact below k") {
    val agg = new KmvSketch(16)
    val gen = Gen.listOfN(60, Gen.chooseNum(1L, 40L))
    samples(gen, 8).foreach { ids =>
      // the same hash→[0,1) map the production sketch applies
      val xs = ids.map(_ % 1000 / 1000.0 + 1e-9).toList
      val whole = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
      splitsOf(xs, 7).foreach { parts =>
        val partials = parts.map(_.foldLeft(agg.zero)(agg.reduce))
        val lr = agg.finish(partials.foldLeft(agg.zero)(agg.merge))
        val rl = agg.finish(partials.reverse.foldLeft(agg.zero)(agg.merge))
        assert(lr == whole && rl == whole, s"parts=${parts.map(_.size)}")
      }
      // exact regime: ndv ≤ k ⇒ the estimate IS the distinct count
      val ndv = xs.distinct.size
      if (ndv <= 16) assert(Kmv.estimate(16, whole) == ndv.toDouble)
    }
  }

  test("TopKAgg: partition-invariant; equals the naive global top-k " +
    "under the (-value, id) order") {
    val agg = new TopKAgg(5)
    val gen = Gen.listOfN(40, Gen.chooseNum(0L, 99L))
    samples(gen, 8).zipWithIndex.foreach { case (vs, i) =>
      val xs = vs.zipWithIndex
        .map { case (v, id) => (v.toDouble, id.toLong) }.toList
      val whole = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
      val naive = xs.sortBy { case (v, id) => (-v, id) }.take(5)
      assert(whole == naive)
      splitsOf(xs, 13).foreach { parts =>
        val partials = parts.map(_.foldLeft(agg.zero)(agg.reduce))
        assert(agg.finish(partials.foldLeft(agg.zero)(agg.merge)) == naive,
          s"parts=${parts.map(_.size)}")
      }
    }
  }

  test("HistSketchAgg: merge is elementwise sum — partition-invariant " +
    "and count-preserving, clamped bins included") {
    val agg = new HistSketchAgg(8, 10.0)
    val gen = Gen.listOfN(50, Gen.chooseNum(-30.0, 130.0))
    samples(gen, 8).foreach { vs =>
      val xs = vs.toList
      val whole = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
      assert(whole.sum == xs.size.toLong, "a value fell out of the bins")
      splitsOf(xs, 29).foreach { parts =>
        val partials = parts.map(_.foldLeft(agg.zero)(agg.reduce))
        val merged = agg.finish(partials.foldLeft(agg.zero)(agg.merge))
        assert(merged.toSeq == whole.toSeq, s"parts=${parts.map(_.size)}")
      }
    }
  }
}
