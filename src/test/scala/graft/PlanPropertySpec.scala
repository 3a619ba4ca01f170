package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-level invariants over seeded random inputs (SURVEY §5): dedupe
  * idempotence — clean(clean(x)) == clean(x), the pipeline's core
  * incremental property — and union-accumulate monotonicity. */
class PlanPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("keep-last dedupe is idempotent and picks max-ordinal per key") {
    import spark.implicits._
    val rnd = new Random(42)
    for (_ <- 1 to 5) {
      val pairs = List.fill(60)((rnd.nextInt(10).toLong + 1, rnd.nextInt(100).toLong))
      val df = pairs.zipWithIndex
        .map { case ((k, v), ord) => (k, v, ord.toLong) }
        .toDF("k", "v", "ord")
      val once = pipeline.Transform.dedupeKeepLast(df, Seq("k"), col("ord"))
      val twice = pipeline.Transform.dedupeKeepLast(once, Seq("k"), col("ord"))
      val a = once.collect().map(_.toSeq).toSet
      assert(a == twice.collect().map(_.toSeq).toSet)
      val expect = pairs.zipWithIndex
        .groupBy(_._1._1).values
        .map(_.maxBy(_._2))
        .map { case ((k, v), ord) => Seq[Any](k, v, ord.toLong) }
        .toSet
      assert(a == expect)
    }
  }

  test("union-accumulate never loses existing keys; existing rows win") {
    import spark.implicits._
    val rnd = new Random(7)
    for (_ <- 1 to 3) {
      val existing = List.fill(15)((s"u${rnd.nextInt(12)}", s"old${rnd.nextInt(99)}"))
        .toDF("user_id", "user_login").dropDuplicates("user_id")
      val incomingIssues = List.fill(15)(s"u${rnd.nextInt(20)}")
        .map(k => (k, s"new_$k", k, s"new_$k"))
        .toDF("author_id", "author_login", "assignee_id", "assignee_login")
      val acc = pipeline.Transform.cleanUsers(incomingIssues, Some(existing))
      val eMap = existing.as[(String, String)].collect().toMap
      val accMap = acc.as[(String, String)].collect().toMap
      // monotone: every existing key survives...
      assert(eMap.keySet.subsetOf(accMap.keySet))
      // ...with its existing value (dimension upsert: first wins)
      eMap.foreach { case (k, v) => assert(accMap(k) == v) }
    }
  }
}
