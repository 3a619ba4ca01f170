package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.{Fingerprint64, NamespacedUuid, SimHash64, WinnowSet}

/** The deployment-grade SQL surface: [[SparkTestSession]] builds its
  * session with `spark.sql.extensions=graft.GraftExtensions` — nothing
  * here calls `GraftFunctions.register` — so every assertion below is the
  * config-only path a SQL-first cluster user gets. */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("uuid5 via SQL reproduces the reference GUID vectors") {
    // same fixed vectors as NamespacedUuidSpec, reference guid_gen.py
    val rows = spark.sql(
      s"""SELECT uuid5('${NamespacedUuid.NsUser}', 'yasinduksiye1212-stack') AS u,
         |  uuid5('${NamespacedUuid.NsOwner}', 'microsoft') AS o""".stripMargin).head()
    assert(rows.getString(0) == "780d978c-ab7e-58dc-8428-1a8c0a39f43c")
    assert(rows.getString(1) == "0dd58109-d16c-5fac-9308-c895180d7869")
  }

  test("every injected function is SQL-callable without register()") {
    val r = spark.sql(
      """SELECT simhash64(array('a','b')) AS sh,
        |  fingerprint64('hello world of data') AS fp,
        |  winnow_set('hello world of data', 8, 4) AS ws,
        |  dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
        |  sign_sketch64(array(0.5d, -0.5d)) AS sk,
        |  lexicon_votes(array('the','der','the'),
        |    array(array('the','and'), array('der','und'))) AS lv,
        |  lexicon_best(array('the','der','the'),
        |    array(array('the','and'), array('der','und')),
        |    array('en','de')) AS lb,
        |  bpe_apply('x a b y a b c', array(array('a b', 'a+b'),
        |    array('a+b c', 'a+b+c'))) AS bpe""".stripMargin).head()
    assert(r.getLong(0) == SimHash64.compute(new GenericArrayData(
      Array[Any](UTF8String.fromString("a"), UTF8String.fromString("b")))))
    assert(r.getLong(1) ==
      Fingerprint64.compute(UTF8String.fromString("hello world of data"), 8))
    val expectWs = {
      val a = WinnowSet.compute(UTF8String.fromString("hello world of data"), 8, 4)
      (0 until a.numElements()).map(a.getLong)
    }
    assert(r.getSeq[Long](2) == expectWs)
    assert(r.getDouble(3) == 11.0)
    assert(r.getSeq[Int](5) == Seq(2, 1))
    assert(r.getString(6) == "en")
    // leftmost non-overlapping fusion; the round-1 fused token then
    // participates in the round-2 merge (that is what makes it BPE)
    assert(r.getString(7) == "x a+b y a+b+c")
  }

  test("injected functions survive newSession() — they are session-blueprint, not temp") {
    val child = spark.newSession()
    val u = child.sql(
      s"SELECT uuid5('${NamespacedUuid.NsUser}', 'yasinduksiye1212-stack') AS u")
      .head().getString(0)
    assert(u == "780d978c-ab7e-58dc-8428-1a8c0a39f43c")
    assert(child.sql("SELECT winnow_set('abc') AS w").head().getSeq[Long](0).nonEmpty)
  }

  test("native winnow_set in SQL agrees with the declarative gate plan") {
    import spark.implicits._
    val docs = Seq("the quick brown fox jumps over the lazy dog",
      "a tiny doc", "").toDF("text")
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      "SELECT text, winnow_set(text, 8, 4) AS ws FROM ext_docs")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val viaColumn = docs
      .select($"text", graft.expr.TextHashFunctions.winnowSet($"text", 8, 4).as("ws"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(viaSql == viaColumn)
  }

  test("config-literal arguments reject non-literals loudly") {
    import spark.implicits._
    Seq(("ns", "x")).toDF("ns", "s").createOrReplaceTempView("ext_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT uuid5(ns, s) FROM ext_bad").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal"))
  }
}
