package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Degenerate-input behavior of the reusable operator cores: a
  * library user feeds these arbitrary DataFrames, and "empty in,
  * empty (or zero-row aggregate) out — never a crash" is part of the
  * contract. The fixed-table queries can't exercise these paths.
  */
class EdgeCaseSpec extends SparkSpec {

  test("pairCounts: empty and single-member groups produce no pairs") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(String, Long)].toDF("k", "id")
    assert(Dedup.pairCounts(empty, "k", "id").count() == 0)
    val singles = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("k", "id")
    assert(Dedup.pairCounts(singles, "k", "id").count() == 0)
    // duplicate (id, key) rows never yield self-pairs
    val dup = Seq(("a", 1L), ("a", 1L)).toDF("k", "id")
    assert(Dedup.pairCounts(dup, "k", "id").count() == 0)
  }

  test("connected components (both variants): empty edges, self-loops") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.connectedComponents(empty).count() == 0)
    assert(Dedup.connectedComponentsStar(empty).count() == 0)
    // a graph of only self-loops: every node labels itself
    val loops = Seq((1L, 1L), (2L, 2L)).toDF("doc_a", "doc_b")
    val star = Dedup.connectedComponentsStar(loops).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == Map(1L -> 1L, 2L -> 2L))
  }

  test("triangleCountEdges: empty and triangle-free graphs count zero") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    val r0 = Graph.triangleCountEdges(empty).head
    assert(r0.getLong(0) == 0 && r0.getLong(1) == 0 && r0.getLong(2) == 0)
    // a path graph has wedges but no closures
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val r1 = Graph.triangleCountEdges(path).head
    assert(r1.getLong(0) == 0 && r1.getLong(1) == 3 && r1.getLong(2) == 4)
  }

  test("versioned mergeInto: all-delete batch commits an empty version") {
    val s = spark
    import s.implicits._
    val t = s"/tmp/graft_sinks/spec_edge_ver_${System.nanoTime()}"
    try {
      Versioned.commit(Seq((1L, "x")).toDF("k", "v"), t)
      Versioned.mergeInto(s, t,
        Seq((1L, "D", null)).toDF("k", "op", "c_v"), "k")
      assert(Versioned.read(s, t).count() == 0)
      assert(Versioned.read(s, t, Some(1)).count() == 1)
    } finally {
      val p = new org.apache.hadoop.fs.Path(t)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("diffOn: empty sides classify wholesale; identical sides are " +
    "all unchanged") {
    val s = spark
    import s.implicits._
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val none = Seq.empty[(Long, String)].toDF("k", "v")
    def classes(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(classes(Quality.diffOn(none, a, "k", Seq("v"))) ==
      Map("added" -> 2L))
    assert(classes(Quality.diffOn(a, none, "k", Seq("v"))) ==
      Map("removed" -> 2L))
    assert(classes(Quality.diffOn(a, a, "k", Seq("v"))) ==
      Map("unchanged" -> 2L))
    assert(Quality.diffOn(none, none, "k", Seq("v")).count() == 0)
  }
}
