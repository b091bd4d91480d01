package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for operator specs. Uses sf0.001 so the
  * whole suite stays fast; correctness at sf0.01 is the driver's
  * DuckDB-oracle gate (tools/check.py mirrors it).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSpec.session

  override def afterAll(): Unit = () // session shared across suites
}

object SparkSpec {
  // the same factory the driver mains use — test sessions must not
  // drift from the configs the library requires (Sessions.configure)
  lazy val session: SparkSession = {
    val s = Sessions.local(4, "graft-test")
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
