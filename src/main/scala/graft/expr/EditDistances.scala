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

/** Jaro (and, with `winkler = true`, Jaro-Winkler) string similarity —
  * the scaled-match scorer probabilistic record linkage (Fellegi-Sunter
  * pipelines) weighs name fields with: match count inside the sliding
  * half-length window, halved transposition count, and for Winkler the
  * shared-prefix boost `j + ℓ·0.1·(1−j)` (ℓ ≤ 4) applied when j > 0.7.
  *
  * Exactness: floating arithmetic here is ORDER-SENSITIVE, so the
  * operation order is pinned to `((m/|a| + m/|b|) + (m−t)/m) / 3` and
  * `j + (ℓ·0.1)·(1−j)` — fuzz-verified bit-identical to DuckDB's native
  * `jaro_similarity`/`jaro_winkler_similarity` over 50k random pairs
  * (the `linkage_jaro_winkler` gate re-proves it on every run against
  * DuckDB as an independent second implementation). Edge order matters:
  * either side empty → 0.0 BEFORE the equal-strings → 1.0 shortcut
  * (so "" vs "" scores 0.0, as DuckDB defines it).
  *
  * O(|a|·|b|) worst-case window scan per pair — same short-key,
  * post-blocking discipline as [[DamerauLevenshtein]], same
  * [[DamerauLevenshtein.MaxLen]] cap. UTF-16 code units.
  */
case class JaroSimilarity(
    left: Expression, right: Expression, winkler: Boolean)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"jaro similarity needs (string, string), got " +
            s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroSimilarity.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], winkler)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expr.JaroSimilarity$$.MODULE$$.compute($a, $b, $winkler)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroSimilarity =
    copy(left = newLeft, right = newRight)
}

object JaroSimilarity {

  def compute(l: UTF8String, r: UTF8String, winkler: Boolean): Double = {
    val a = l.toString
    val b = r.toString
    val la = a.length
    val lb = b.length
    require(la <= DamerauLevenshtein.MaxLen && lb <= DamerauLevenshtein.MaxLen,
      s"jaro input exceeds ${DamerauLevenshtein.MaxLen} chars ($la, $lb)")
    if (la == 0 || lb == 0) return 0.0
    if (a == b) return 1.0
    val md0 = math.max(la, lb) / 2 - 1
    val md = if (md0 < 0) 0 else md0
    val fa = new Array[Boolean](la)
    val fb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - md)
      val hi = math.min(i + md + 1, lb)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!fb(j) && a.charAt(i) == b.charAt(j)) {
          fa(i) = true; fb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (fa(i)) {
        while (!fb(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    // pinned op order — see scaladoc
    val jaro = (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3
    if (!winkler || jaro <= 0.7) return jaro
    var prefix = 0
    val maxP = math.min(4, math.min(la, lb))
    while (prefix < maxP && a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1 - jaro)
  }

  def jaro(a: Column, b: Column): Column =
    GraftColumnBridge.column(JaroSimilarity(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b),
      winkler = false))

  def jaroWinkler(a: Column, b: Column): Column =
    GraftColumnBridge.column(JaroSimilarity(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b),
      winkler = true))
}
