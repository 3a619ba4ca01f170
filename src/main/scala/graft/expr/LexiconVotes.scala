package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-lexicon token-vote counts in ONE pass over the token array:
  * `votes[i]` = number of tokens present in lexicon `i` (duplicates
  * count). Replaces the `filter(toks, _.isin(lex))`-per-lexicon shape,
  * which is a CodegenFallback higher-order function that re-evaluates the
  * embedded `split` once per element per lexicon — the interpreted-path
  * blowup documented in PERF.md. Here the token array materializes once
  * and each token is one hash-map probe covering ALL lexicons, so cost is
  * O(tokens), independent of lexicon count and size — which is what makes
  * real (hundreds-of-words) lexicons affordable at 100 TB scan scale. */
case class LexiconVotes(child: Expression, lexicons: Seq[Seq[String]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lexicon_votes needs array<string>, got ${other.catalogString}")
    }

  // word -> per-lexicon increment vector (a word may sit in many lexicons)
  @transient private lazy val table: java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    lexicons.zipWithIndex.foreach { case (lex, i) =>
      lex.foreach { w =>
        val k = UTF8String.fromString(w)
        var inc = m.get(k)
        if (inc == null) { inc = new Array[Int](lexicons.size); m.put(k, inc) }
        inc(i) += 1
      }
    }
    m
  }

  /** The raw vote vector — shared with [[LexiconBest]]. */
  private[expr] def computeRaw(arr: ArrayData): Array[Int] = {
    val votes = new Array[Int](lexicons.size)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val inc = table.get(arr.getUTF8String(i))
        if (inc != null) {
          var j = 0
          while (j < votes.length) { votes(j) += inc(j); j += 1 }
        }
      }
      i += 1
    }
    votes
  }

  def compute(arr: ArrayData): ArrayData =
    new GenericArrayData(computeRaw(arr).map(v => Int.box(v): Any))

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lexiconVotes", this,
      classOf[LexiconVotes].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): LexiconVotes =
    copy(child = newChild)
}

object LexiconVotes {
  def votes(tokens: Column, lexicons: Seq[Seq[String]]): Column =
    GraftColumnBridge.column(
      LexiconVotes(GraftColumnBridge.expression(tokens), lexicons))

  def best(tokens: Column, lexicons: Seq[Seq[String]],
      labels: Seq[String]): Column =
    GraftColumnBridge.column(
      LexiconBest(GraftColumnBridge.expression(tokens), lexicons, labels))
}

/** The vote-and-argmax fused into one pass: returns `labels(i)` for the
  * FIRST lexicon with the strictly-highest vote count (ties keep the
  * earlier label) — the exact semantics of folding
  * `when(v_i > best, label_i)` over [[LexiconVotes]] output in label
  * order, without the folded when-chain's combinatorial re-evaluation:
  * each `when` branch references the running best TWICE, so by five
  * lexicons the votes subtree (array materialize + every probe) is
  * duplicated ~2^4 times per row unless common-subexpression elimination
  * rescues it — measured 1.3 s of a 1.7 s query at sf0.1. One fused pass
  * is O(tokens) flat. */
case class LexiconBest(
    child: Expression, lexicons: Seq[Seq[String]], labels: Seq[String])
    extends UnaryExpression {
  require(labels.length == lexicons.length, "one label per lexicon")

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lexicon_best needs array<string>, got ${other.catalogString}")
    }

  @transient private lazy val votesExpr = LexiconVotes(child, lexicons)
  @transient private lazy val labelStrs: Array[UTF8String] =
    labels.map(UTF8String.fromString).toArray

  def compute(arr: ArrayData): UTF8String = {
    val votes = votesExpr.computeRaw(arr)
    var best = 0
    var i = 1
    while (i < votes.length) {
      if (votes(i) > votes(best)) best = i
      i += 1
    }
    labelStrs(best)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lexiconBest", this,
      classOf[LexiconBest].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): LexiconBest =
    copy(child = newChild)
}
