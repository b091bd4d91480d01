package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextExpressionsSpec extends SparkSpec {

  test("nfc_normalize composes decomposed sequences, passes NFC text " +
    "through untouched, and is idempotent") {
    TextExpressions.ensureRegistered(spark)
    val s = spark
    import s.implicits._
    val df = Seq(
      ("ascii only", "ascii only"),
      ("café", "café"), // e + combining acute → é
      ("mañana", "mañana"), // n + combining tilde → ñ
      ("é", "é")) // already composed: unchanged
      .toDF("raw", "expected")
      .withColumn("norm", expr("nfc_normalize(raw)"))
      .withColumn("norm2", expr("nfc_normalize(norm)"))
    assert(df.filter(col("norm") =!= col("expected")).count() == 0)
    assert(df.filter(col("norm2") =!= col("norm")).count() == 0)
    // null-safe
    val n = Seq(Option.empty[String]).toDF("raw")
      .withColumn("norm", expr("nfc_normalize(raw)"))
    assert(n.head().isNullAt(1))
  }

  test("nfc_normalize rejects non-string input at analysis time") {
    TextExpressions.ensureRegistered(spark)
    val s = spark
    import s.implicits._
    val err = intercept[Exception] {
      Seq(1).toDF("i").selectExpr("nfc_normalize(i)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("string") ||
      err.getMessage.contains("DATATYPE_MISMATCH"), err.getMessage)
  }
}
