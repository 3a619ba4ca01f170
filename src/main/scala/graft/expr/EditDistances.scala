package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unrestricted Damerau-Levenshtein distance: minimum number of
  * insertions, deletions, substitutions, and transpositions of two
  * ADJACENT characters that turn `left` into `right` — the edit metric
  * record-linkage pipelines score name/title pairs with, because human
  * typos are dominated by swapped neighbors that plain Levenshtein
  * counts twice ("recieve" is 1 swap, not 2 edits).
  *
  * UNRESTRICTED means a substring may be edited after a transposition
  * ("CA" → "ABC" = 2), matching DuckDB's `damerau_levenshtein` — the
  * oracle the `linkage_damerau_pairs` gate replays — rather than the
  * cheaper optimal-string-alignment variant (which gives 3 there and is
  * NOT a metric). Spark ships `levenshtein` but no Damerau variant;
  * this fills that hole as a native codegen expression.
  *
  * Cost: O(|a|·|b|) time and space per pair — intended for SHORT keys
  * (names, titles, SKUs) after blocking, not document bodies; both
  * inputs are capped at [[DamerauLevenshtein.MaxLen]] code units to
  * keep a skewed row from allocating an unbounded matrix. Operates on
  * UTF-16 code units (exact for ASCII and the whole BMP).
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"damerau_levenshtein needs (string, string), got " +
            s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expr.DamerauLevenshtein$$.MODULE$$.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {

  /** Per-side length cap (code units): a pair of 512-char keys already
    * costs a 514×514 int matrix (~1 MB transient); anything longer is
    * not a linkage key. Longer inputs fail loudly rather than quietly
    * OOMing an executor. */
  val MaxLen = 512

  def compute(l: UTF8String, r: UTF8String): Int = {
    val a = l.toString
    val b = r.toString
    val n = a.length
    val m = b.length
    require(n <= MaxLen && m <= MaxLen,
      s"damerau_levenshtein input exceeds $MaxLen chars ($n, $m) — " +
        "block/truncate linkage keys first")
    if (n == 0) return m
    if (m == 0) return n
    // Lowe's "distance with adjacent transpositions": (n+2)x(m+2)
    // matrix with a sentinel row/column at maxdist, plus the
    // last-occurrence map `da` and in-row marker `db` that let a
    // transposition bridge the (i-k-1)+(j-l-1) skipped characters.
    val inf = n + m
    val d = Array.ofDim[Int](n + 2, m + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= n) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= m) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    val da = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= n) {
      var db = 0
      j = 1
      while (j <= m) {
        val k: Int = {
          val v = da.get(b.charAt(j - 1))
          if (v == null) 0 else v.intValue()
        }
        val lPrev = db
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) { db = j; 0 }
          else 1
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trans = d(k)(lPrev) + (i - k - 1) + 1 + (j - lPrev - 1)
        d(i + 1)(j + 1) =
          math.min(math.min(sub, ins), math.min(del, trans))
        j += 1
      }
      da.put(a.charAt(i - 1), i)
      i += 1
    }
    d(n + 1)(m + 1)
  }

  def dist(a: Column, b: Column): Column =
    GraftColumnBridge.column(DamerauLevenshtein(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
