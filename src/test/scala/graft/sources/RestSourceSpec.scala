package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RestSourceSpec extends SparkSpec {

  private def load(pages: Int, pageSize: Int) =
    spark.read.format("graft.sources.RestSource")
      .option("pages", pages.toString)
      .option("pageSize", pageSize.toString)
      .load()

  test("one InputPartition per page, pages × pageSize rows") {
    val df = load(4, 50)
    assert(df.count() == 200)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.select("page").distinct().count() == 4)
  }

  test("payload is the documented pure function of id") {
    val rows = load(2, 10).orderBy("id").collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("id")
      val v = RestSource.valueOf(id)
      assert(r.getAs[Double]("score") == v / 10.0)
      assert(r.getAs[String]("status") ==
        (if (v % 5 == 0) "inactive" else "active"))
      assert(r.getAs[Int]("page") == (id / 10).toInt)
    }
  }

  test("column pruning reaches the reader") {
    val pruned = load(2, 10).select("id")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head
    assert(scan.schema.fieldNames.toSeq == Seq("id"))
  }
}
