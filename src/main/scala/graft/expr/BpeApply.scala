package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Apply a learned BPE merge table to one document in a single scan-native
  * pass: normalize whitespace (trim + collapse, the
  * [[graft.ops.TextOps.bpeMerges]] staging), then fuse each merge in
  * TABLE ORDER with leftmost non-overlapping ` a b ` → ` a+b ` literal
  * replacement — byte-for-byte the rewrite the induction loop applies
  * per round, so encode∘induce reproduces the induction's final corpus
  * exactly.
  *
  * Why an expression and not a fold of N `replace` columns: the fold is
  * correct for a handful of merges, but a production merge table has
  * tens of thousands of entries — folded `replace` calls nest the
  * codegen tree N deep and overflow the JVM's 64 KB method limit long
  * before that. Here the table rides along ONCE as a reference object
  * (broadcast with the serialized expression, not per row) and the
  * per-row work is a tight Java loop over it, keeping the operator
  * inside whole-stage codegen at any table size.
  */
case class BpeApply(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_apply needs string, got ${other.catalogString}")
    }

  // space-padded search/replacement literals, precomputed once per task
  @transient private lazy val table: Array[(String, String)] =
    merges.iterator.map { case (pair, merged) =>
      (s" $pair ", s" $merged ")
    }.toArray

  def compute(s: UTF8String): UTF8String = {
    var t = " " + s.toString.trim.replaceAll(" +", " ") + " "
    var i = 0
    while (i < table.length) {
      t = t.replace(table(i)._1, table(i)._2)
      i += 1
    }
    UTF8String.fromString(t.trim)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeApply", this, classOf[BpeApply].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApply =
    copy(child = newChild)
}

object BpeApply {
  def apply(text: Column, merges: Seq[(String, String)]): Column =
    GraftColumnBridge.column(
      BpeApply(GraftColumnBridge.expression(text), merges))
}
