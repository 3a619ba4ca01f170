package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Hilbert-curve index of a 2-D point: maps (x, y) with `bits`-bit
  * coordinates to its position `d` along the order-`bits` Hilbert curve.
  * The other space-filling layout key beside Z-order
  * ([[graft.ops.LayoutOps.zValue2]]): the Hilbert curve never jumps —
  * consecutive d are always grid neighbors — so file tiles cut from
  * equal d-ranges have strictly better worst-case locality than Z
  * tiles, which matters when rectangle queries straddle the Z-curve's
  * long diagonal seams. Iceberg/Delta expose exactly this choice
  * (`ZORDER` vs Hilbert clustering); the layout gates measure the
  * pruning difference on the same rectangle.
  *
  * Semantics are the classic per-level rotate-and-accumulate walk
  * (quadrant digit `(3·rx) xor ry`, then reflect+swap on the lower
  * quadrants), top level first — a fixed chain of integer ops per
  * level, so the DuckDB oracle replays it as `bits` chained CTE stages
  * bit-for-bit. Inputs must lie in [0, 2^bits); the expression masks
  * the low `bits` bits defensively so an out-of-range coordinate can't
  * corrupt neighboring levels.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"bits=$bits out of range [1, 31]")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType | IntegerType, LongType | IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hilbert_index needs two integral columns, got " +
            s"(${l.catalogString}, ${r.catalogString})")
    }

  private def toLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int  => i.toLong
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex.compute(toLong(a), toLong(b), bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expr.HilbertIndex$$.MODULE$$.compute((long)$a, (long)$b, $bits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {

  /** xy → d along the order-`bits` Hilbert curve. Top level (s =
    * 2^(bits-1)) first, halving to s = 1: accumulate the quadrant
    * digit, then rotate/reflect the frame for the next level. */
  def compute(x0: Long, y0: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  def index(x: Column, y: Column, bits: Int): Column =
    GraftColumnBridge.column(HilbertIndex(
      GraftColumnBridge.expression(x), GraftColumnBridge.expression(y),
      bits))

  /** The oracle replica: `bits` chained CTE stages of pure integer
    * CASE/mask arithmetic, one per curve level, ending in a stage that
    * exposes column `d`. `from` must provide columns `x` and `y`
    * (already in range); stages are named `h0..h<bits>` with
    * per-stage-suffixed columns so no engine's lateral alias rules can
    * rebind them. Generated HERE, beside the loop it mirrors, so the
    * two cannot drift apart silently. */
  def stagedSql(from: String, bits: Int, carryCols: Seq[String]): String = {
    val carry = carryCols.map(c => s", $c").mkString
    val init =
      s"h0 AS (SELECT x AS x0, y AS y0, CAST(0 AS BIGINT) AS d0$carry FROM $from)"
    val stages = (0 until bits).map { k =>
      val s = 1L << (bits - 1 - k) // this stage's level size
      val i = k // previous suffix
      val o = k + 1 // this suffix
      // rx/ry from the PREVIOUS stage's coordinates; quadrant digit via
      // CASE (values 0..3) instead of relying on an engine xor operator
      val rxSet = s"(x$i & $s) > 0"
      val rySet = s"(y$i & $s) > 0"
      s"""h$o AS (SELECT
         |  d$i + ${s * s} * (CASE
         |    WHEN ($rxSet) AND NOT ($rySet) THEN 3
         |    WHEN ($rxSet) AND ($rySet) THEN 2
         |    WHEN ($rySet) THEN 1 ELSE 0 END) AS d$o,
         |  CASE WHEN ($rySet) THEN x$i
         |       WHEN ($rxSet) THEN ${s - 1} - y$i
         |       ELSE y$i END AS x$o,
         |  CASE WHEN ($rySet) THEN y$i
         |       WHEN ($rxSet) THEN ${s - 1} - x$i
         |       ELSE x$i END AS y$o$carry
         |FROM h$i)""".stripMargin
    }
    val fin =
      s"hil AS (SELECT d$bits AS d$carry FROM h$bits)"
    (init +: stages :+ fin).mkString(",\n")
  }
}
