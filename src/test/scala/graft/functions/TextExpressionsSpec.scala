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

  test("deflate_ratio: repetitive < prose < random ordering, bounds, " +
    "empty/null edges, and invariance under repartitioning") {
    TextExpressions.ensureRegistered(spark)
    val s = spark
    import s.implicits._
    val rep = "spam ham " * 200
    val prose = (1 to 200).map(i => s"word$i token${i * 7 % 13}")
      .mkString(" ")
    // deterministic pseudo-random bytes: LCG over printable ASCII
    val rand = {
      var x = 12345L
      (1 to 1600).map { _ =>
        x = (x * 6364136223846793005L + 1442695040888963407L)
        (33 + Math.floorMod(x, 94L)).toChar
      }.mkString
    }
    val df = Seq(("rep", rep), ("prose", prose), ("rand", rand))
      .toDF("kind", "t")
      .withColumn("r", expr("deflate_ratio(t)"))
    val m = df.collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(m("rep") < m("prose") && m("prose") < m("rand"), m.toString)
    assert(m.values.forall(v => v > 0.0 && v < 1.5), m.toString)
    // empty string defined as 1.0 (no content, no signal); null stays null
    val e = Seq("").toDF("t").selectExpr("deflate_ratio(t)").head()
    assert(e.getDouble(0) == 1.0)
    assert(Seq(Option.empty[String]).toDF("t")
      .selectExpr("deflate_ratio(t)").head().isNullAt(0))
    // pure function of the text: same corpus, different partitioning,
    // identical per-doc results (the rows-only driver check's
    // cross-consistency anchor)
    val a = graft.operators.TextAnalysis.compressionRatio(spark, sfDir)
      .collect().toSeq
    val b = graft.operators.TextAnalysis.compressionRatio(spark, sfDir)
      .repartition(7).orderBy("doc_id").collect().toSeq
    assert(a == b)
    // corpus sanity: word-soup docs sit in a plausible band
    assert(a.forall { r =>
      val v = r.getAs[Double]("compression_ratio"); v > 0.1 && v < 1.2 })
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
