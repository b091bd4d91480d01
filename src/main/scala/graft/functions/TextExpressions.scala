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
    reg.createOrReplaceTempFunction("nfc_normalize",
      es => NfcNormalize(es.head), "built-in")
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
