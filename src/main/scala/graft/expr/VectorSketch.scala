package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 64-bit random-hyperplane sign sketch for cosine LSH (Charikar): bit j =
  * sign of the projection of the vector onto a deterministic Rademacher
  * (+1/-1) direction derived from `Hash64.mix(j * P + i)`. Hamming
  * distance between sketches estimates angular distance, so equal 16-bit
  * bands recall cosine-close pairs. One pass per row, no shuffle, native
  * codegen — the sketch cost at 100 TB is a scan. */
case class SignSketch64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sign_sketch64 needs array<double>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    SignSketch64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.SignSketch64$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SignSketch64 =
    copy(child = newChild)
}

object SignSketch64 {
  private final val P = 0x9e3779b97f4a7c15L

  /** Rademacher sign of hyperplane `j` at dimension `i` — the single
    * definition shared by the execution path below and the DuckDB oracle
    * generator ([[graft.queries.DedupQueries]]), so the SQL replica can
    * never drift from the engine. */
  def sign(j: Int, i: Int): Double =
    if ((Hash64.mix(j.toLong * P + i) & 1L) == 1L) 1.0 else -1.0

  def compute(vec: ArrayData): Long = {
    val n = vec.numElements()
    var out = 0L
    var j = 0
    while (j < 64) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (!vec.isNullAt(i)) {
          acc += vec.getDouble(i) * sign(j, i)
        }
        i += 1
      }
      if (acc > 0.0) out |= (1L << j)
      j += 1
    }
    out
  }

  def sketch(c: Column): Column =
    GraftColumnBridge.column(SignSketch64(GraftColumnBridge.expression(c)))
}
