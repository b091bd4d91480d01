package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native string-normalization expressions for the text-pipeline
  * surface. Codegen'd (one static JVM call per row inside
  * whole-stage codegen) — the alternative, a Scala UDF, breaks the
  * codegen span and serializes through the UDF boundary on every row
  * of a 100 TB corpus.
  */
object TextExpressions {

  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // register-if-absent: createOrReplace on every query entry logs a
    // spurious "replaced a previously registered function" WARN per run
    def once(name: String, b: Seq[Expression] => Expression): Unit =
      if (!reg.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, b, "built-in")
    once("nfc_normalize", es => NfcNormalize(es.head))
    once("deflate_ratio", es => DeflateRatio(es.head))
  }
}

/** Unicode NFC normalization (canonical composition) — the
  * dedup/fingerprint prerequisite for multilingual corpora: visually
  * identical strings with different codepoint sequences ("é" composed
  * vs "e"+U+0301) must hash identically or every downstream exact
  * fingerprint treats them as distinct documents. NFC (not NFKC):
  * canonical equivalence only, no compatibility folding that would
  * change content ("ﬁ" staying distinct from "fi" is intentional —
  * folding is a modeling choice, normalization is not).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize expects string, got ${t.simpleString}")
    }

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.eval(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.NfcNormalize$$.MODULE$$.eval($s);")

  override protected def withNewChildInternal(nc: Expression): Expression =
    copy(child = nc)
}

object NfcNormalize {
  def eval(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: already-NFC text (the overwhelmingly common case)
    // skips the allocation entirely
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** DEFLATE compression ratio of the UTF-8 bytes (compressed/raw) —
  * the repetition/quality proxy several published pretraining
  * pipelines gate on: highly repetitive or templated text compresses
  * far below prose, near-random text approaches (or exceeds) 1.
  * Row-local and codegen'd; one Deflater per call (Deflater instances
  * are not thread-safe, and rows of one task are sequential anyway —
  * the allocation is dwarfed by the compression work itself).
  * Fixed level 6 and the raw-bytes denominator make the score a pure
  * function of the text. No SQL-engine oracle can restate DEFLATE, so
  * the driver records rows-only and TextExpressionsSpec pins the
  * cross-consistency properties (bounds, repetitive < prose < random
  * ordering, partitioning invariance).
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"deflate_ratio expects string, got ${t.simpleString}")
    }

  override def nullSafeEval(s: Any): Any =
    DeflateRatio.eval(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.DeflateRatio$$.MODULE$$.eval($s);")

  override protected def withNewChildInternal(nc: Expression): Expression =
    copy(child = nc)
}

object DeflateRatio {
  def eval(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.isEmpty) return 1.0
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](1024)
      var compressed = 0L
      while (!d.finished()) compressed += d.deflate(buf)
      compressed.toDouble / raw.length
    } finally d.end()
  }
}
