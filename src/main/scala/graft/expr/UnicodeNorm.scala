package graft.expr

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a NATIVE codegen expression — the text
  * canonicalization every multilingual corpus pass needs before hashing
  * or dedup (the same logical content arrives as precomposed `é` U+00E9
  * from one crawler and as `e` + combining U+0301 from another; every
  * downstream hash/shingle/exact-dedup operator treats those as
  * different documents unless the corpus is normalized first).
  *
  * Spark ships no normalization builtin, and the lazy path — a Scala
  * UDF over `Normalizer.normalize` — would break whole-stage codegen
  * for the entire scan stage. A `UnaryExpression` with `doGenCode`
  * keeps the scan fused; the fast path below skips the (allocating)
  * normalizer entirely for ASCII-only strings, which at crawl scale is
  * the overwhelming majority of rows.
  *
  * NFC is the right form for dedup canonicalization: composition is
  * the web's dominant encoding, and Unicode's normalization stability
  * policy guarantees NFC of assigned code points never changes between
  * versions — so the engine (ICU-less JDK) and any oracle engine
  * (DuckDB's `nfc_normalize`, ICU) agree bit-for-bit.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize needs string, got ${t.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.NfcNormalize$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def compute(s: UTF8String): UTF8String = {
    // ASCII bytes are NFC-invariant by construction — skip the String
    // round-trip (numBytes == number of chars implies pure ASCII in
    // UTF-8, the common fast path Spark's own string ops use)
    val bytes = s.numBytes()
    if (bytes == s.numChars()) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def nfc(c: Column): Column =
    GraftColumnBridge.column(NfcNormalize(GraftColumnBridge.expression(c)))
}
