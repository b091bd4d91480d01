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

  test("token chain discovers the unknown page count until exhaustion") {
    val server = new FakeRestServer(5, 10)
    val walked = Iterator.iterate(server.firstToken)(
      _.flatMap(server.nextToken)).takeWhile(_.isDefined).map(_.get).toList
    assert(walked.length == 5) // count discovered, never configured
    assert(walked.map(server.pageIndexOf) == List(0, 1, 2, 3, 4))
    assert(walked.distinct == walked) // tokens are unique
    assert(server.nextToken(walked.last).isEmpty) // exhaustion
    // and the scan's partitioning agrees with the walk
    assert(load(5, 10).rdd.getNumPartitions == 5)
  }

  test("empty collection: no first token, zero rows, zero partitions") {
    val server = new FakeRestServer(0, 10)
    assert(server.firstToken.isEmpty)
    assert(load(0, 10).count() == 0)
  }

  test("oauth: one exchange per token generation, stale tokens rejected") {
    val server = new FakeRestServer(12, 5) // ttl 4 → generations 0,1,2
    RestAuthCache.reset()
    assert(load(12, 5).count() == 60) // reads all 12 pages
    assert(RestAuthCache.exchanges.get() == 3) // NOT one per page/task
    // server-side expiry: generation-0 token is stale for page 4
    val gen0 = server.exchangeToken(server.refreshToken, 0)
    assert(server.validateAccess(gen0, 3))
    assert(!server.validateAccess(gen0, 4))
    // only the real refresh credential can mint access tokens
    intercept[IllegalArgumentException] {
      server.exchangeToken("wrong-refresh", 0)
    }
    RestAuthCache.reset() // leave no cross-test state
  }

  test("tokens are deterministic across walks (resumable discovery)") {
    val a = new FakeRestServer(3, 7)
    val b = new FakeRestServer(3, 7)
    assert(a.firstToken == b.firstToken)
    assert(a.nextToken(a.firstToken.get) == b.nextToken(b.firstToken.get))
  }
}
