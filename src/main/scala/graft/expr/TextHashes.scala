package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Self-contained 64-bit string hash (FNV-1a with a splitmix64 finalizer):
  * deterministic across JVMs/executors, no dependency on Spark's internal
  * hash utilities. Used by SimHash and the winnowing fingerprint. */
object Hash64 {
  def hashBytes(b: Array[Byte], seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < b.length) {
      h ^= (b(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    mix(h)
  }

  def mix(x0: Long): Long = {
    var x = x0
    x ^= (x >>> 30); x *= 0xbf58476d1ce4e5b9L
    x ^= (x >>> 27); x *= 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Mixed FNV hash of the k bytes starting at `i` — the ONE k-gram hash
    * both [[Fingerprint64]] and [[WinnowSet]] select from (they must stay
    * bit-identical: the global-min invariant and the shared SQL oracle
    * replica depend on it). */
  def gramHash(b: Array[Byte], i: Int, k: Int): Long = {
    var h = 0xcbf29ce484222325L
    var j = i
    while (j < i + k) { h ^= (b(j) & 0xffL); h *= 0x100000001b3L; j += 1 }
    mix(h)
  }
}

/** 64-bit SimHash over a token array: each token hashes to 64 bits; bit i
  * of the result is the sign of the sum over tokens of (+1 if token bit i
  * set else -1). Near-duplicate documents differ in few bits (small
  * Hamming distance). A native expression keeps this a single pass per
  * row inside whole-stage codegen — no explode, no 64-way aggregation.
  * (Semantics per Charikar's SimHash; the reference has no equivalent —
  * this is a north-star scale operator, SURVEY §7.4.) */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 needs array<string>, got ${child.dataType.catalogString}")
    }
  }

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.SimHash64$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def compute(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = Hash64.hashBytes(tokens.getUTF8String(i).getBytes, 0L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}

/** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken's MOSS
  * scheme): 64-bit rolling k-gram hashes over the raw bytes, minimum per
  * sliding window — here reduced to the global minimum k-gram hash plus
  * the document hash, packed as a struct-free single long (min k-gram
  * hash). Robust to content reordering at window scale, cheap at 100 TB
  * (one pass, no shuffle). */
case class Fingerprint64(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    Fingerprint64.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.Fingerprint64$$.MODULE$$.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
    copy(child = newChild)
}

object Fingerprint64 {
  def compute(s: UTF8String, k: Int): Long = {
    val b = s.getBytes
    if (b.length == 0) return 0L
    if (b.length <= k) return Hash64.hashBytes(b, 1L)
    var min = Long.MaxValue
    var i = 0
    while (i + k <= b.length) {
      val m = Hash64.gramHash(b, i, k)
      if (m < min) min = m
      i += 1
    }
    min
  }
}

/** Full winnowing fingerprint SET (Schleimer/Wilkerson/Aiken), natively:
  * per k-byte gram position a mixed FNV hash, minimum per sliding window
  * of `w` grams, distinct minima sorted ascending — all in ONE pass per
  * row inside codegen. The declarative formulation
  * ([[graft.ops.TextOps.winnowFingerprints]]) explodes one row per gram
  * position and shuffles them through a per-document window: a ~500x row
  * inflation that at 100 TB dominates the job. This expression is the
  * scan-only production path — no explode, no shuffle, same semantics —
  * and because the gram hash is [[Hash64]], the `text_winnow_native` gate
  * oracles it bit-exactly via the SQL hash replica
  * ([[graft.queries.Hash64Oracle]]). Short documents (<= k bytes) yield
  * the single seed-1 whole-text hash, matching [[Fingerprint64]]'s short
  * branch; empty/missing text yields an empty set. */
case class WinnowSet(child: Expression, k: Int, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_set needs string, got ${other.catalogString}")
    }
  }

  override def nullSafeEval(input: Any): Any =
    WinnowSet.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.WinnowSet$$.MODULE$$.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowSet =
    copy(child = newChild)
}

object WinnowSet {
  def compute(s: UTF8String, k: Int, w: Int): ArrayData = {
    val b = s.getBytes
    if (b.length == 0)
      return new GenericArrayData(Array.empty[Long])
    if (b.length <= k)
      return new GenericArrayData(Array(Hash64.hashBytes(b, 1L)))
    val ng = b.length - k + 1
    val hs = new Array[Long](ng)
    var i = 0
    while (i < ng) { hs(i) = Hash64.gramHash(b, i, k); i += 1 }
    // windows start at 1..max(ng-w+1, 1); a document with fewer than w
    // grams gets one window over all of them (the md5 yardstick's guard).
    // Primitive arrays + sort + in-place dedup — this runs per row of the
    // scan, so no boxing, no tree nodes (w is tiny, the O(ng*w) rescan is
    // cheaper than a deque's bookkeeping).
    val nWin = math.max(ng - w + 1, 1)
    val mins = new Array[Long](nWin)
    i = 0
    while (i < nWin) {
      var min = hs(i)
      var j = i + 1
      val end = math.min(i + w, ng)
      while (j < end) { if (hs(j) < min) min = hs(j); j += 1 }
      mins(i) = min
      i += 1
    }
    java.util.Arrays.sort(mins)
    var n = 0
    i = 0
    while (i < nWin) {
      if (i == 0 || mins(i) != mins(i - 1)) { mins(n) = mins(i); n += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(mins, n))
  }
}

/** Whole-string [[Hash64]] (seed 0) as a codegen'd scalar — the hashed
  * feature bucketing primitive (DSIR-style hashed n-gram features): one
  * deterministic long per string, replayable by the same FNV+mix SQL
  * replica ([[graft.queries.Hash64Oracle]]) that oracles SimHash. */
case class StringHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hash64 needs string, got ${child.dataType.catalogString}")
    }
  }

  override def nullSafeEval(input: Any): Any =
    StringHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.StringHash64$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): StringHash64 =
    copy(child = newChild)
}

object StringHash64 {
  def compute(s: UTF8String): Long = Hash64.hashBytes(s.getBytes, 0L)
}

object TextHashFunctions {
  def simhash64(c: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(c)))

  def hash64(c: Column): Column =
    GraftColumnBridge.column(StringHash64(GraftColumnBridge.expression(c)))

  def fingerprint64(c: Column, k: Int = 8): Column =
    GraftColumnBridge.column(Fingerprint64(GraftColumnBridge.expression(c), k))

  def winnowSet(c: Column, k: Int = 8, w: Int = 4): Column =
    GraftColumnBridge.column(WinnowSet(GraftColumnBridge.expression(c), k, w))
}
