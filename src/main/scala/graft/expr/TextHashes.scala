package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
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
      // polynomial rolling window hashed through the finalizer
      var h = 0xcbf29ce484222325L
      var j = i
      while (j < i + k) { h ^= (b(j) & 0xffL); h *= 0x100000001b3L; j += 1 }
      val m = Hash64.mix(h)
      if (m < min) min = m
      i += 1
    }
    min
  }
}

object TextHashFunctions {
  def simhash64(c: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(c)))

  def fingerprint64(c: Column, k: Int = 8): Column =
    GraftColumnBridge.column(Fingerprint64(GraftColumnBridge.expression(c), k))
}
