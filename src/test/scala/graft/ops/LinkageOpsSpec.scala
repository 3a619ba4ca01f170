package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Blocked fuzzy matching: candidate recall across blocking passes and
  * the exactness of the distance verify. */
class LinkageOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val people = Seq(
    (1L, "ann smith"), (2L, "ann smyth"),  // differ at pos 7 (suffix block)
    (3L, "bob jones"), (4L, "rob jones"),  // differ at pos 1 (prefix block)
    (5L, "eve adams"), (6L, "zoe woods")   // unrelated
  ).toDF("id", "name")

  test("each single blocking pass misses pairs the two-pass union finds") {
    val prefix = substring(col("name"), 1, 3)
    val suffix = substring(col("name"), 6, 4)
    def pairs(keys: Seq[org.apache.spark.sql.Column]) =
      LinkageOps.blockedFuzzyPairs(people, "id", "name", keys, maxDistance = 2)
        .select("a", "b").as[(Long, Long)].collect().toSet
    val byPrefix = pairs(Seq(prefix))
    val bySuffix = pairs(Seq(suffix))
    val both = pairs(Seq(prefix, suffix))
    assert(byPrefix == Set((1L, 2L)), "prefix block: smith/smyth share 'ann'")
    assert(bySuffix == Set((3L, 4L)), "suffix block: bob/rob share 'jones'")
    assert(both == Set((1L, 2L), (3L, 4L)),
      "the union must recover what each single pass misses")
  }

  test("distance verify is exact and the cutoff is strict") {
    val all = LinkageOps.blockedFuzzyPairs(
        people, "id", "name", Seq(lit(1)), maxDistance = 9)
      .as[(Long, Long, String, String, Int)].collect()
      .map { case (a, b, _, _, dst) => (a, b) -> dst }.toMap
    assert(all((1L, 2L)) == 1 && all((3L, 4L)) == 1)
    assert(all((5L, 6L)) == 6, "eve adams -> zoe woods is 6 edits")
    val cut = LinkageOps.blockedFuzzyPairs(
        people, "id", "name", Seq(lit(1)), maxDistance = 1)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(cut == Set((1L, 2L), (3L, 4L)))
  }

  test("damerauLevenshtein: unrestricted variant on the textbook cases") {
    import graft.expr.DamerauLevenshtein.compute
    def dl(a: String, b: String) =
      compute(org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
    assert(dl("", "") == 0 && dl("", "abc") == 3 && dl("abc", "") == 3)
    assert(dl("kitten", "sitting") == 3) // pure Levenshtein agrees
    assert(dl("recieve", "receive") == 1) // one adjacent swap, not 2
    // the OSA-vs-unrestricted distinguisher: CA -> AC -> ABC
    assert(dl("CA", "ABC") == 2, "OSA would say 3; DuckDB says 2")
    assert(dl("a cat", "an act") == 2)
    assert(dl("abcdef", "abcdef") == 0)
    // symmetry (DL is a metric, unlike OSA)
    assert(dl("ABC", "CA") == 2 && dl("banana", "ananas") ==
      dl("ananas", "banana"))
  }

  test("blockedDamerauPairs: in-block pairs only, strict cutoff, a < b") {
    val df = Seq(
      (1L, "anna smith", "x"), (2L, "anna smiht", "x"), // swap: dist 1
      (3L, "bob jones", "x"), (4L, "completely other", "y"))
      .toDF("id", "name", "blk")
    val got = LinkageOps
      .blockedDamerauPairs(df, "id", "name", col("blk"), maxDist = 2)
      .as[(Long, Long, String, String, Int)].collect().toSeq
    assert(got == Seq((1L, 2L, "anna smith", "anna smiht", 1)))
  }

  test("jaroSimilarity: textbook values, edge order, boost threshold") {
    import graft.expr.JaroSimilarity.compute
    def u(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    def j(a: String, b: String) = compute(u(a), u(b), winkler = false)
    def w(a: String, b: String) = compute(u(a), u(b), winkler = true)
    // the classic Winkler paper pairs (values = DuckDB's exact doubles)
    assert(j("MARTHA", "MARHTA") == 0.9444444444444445)
    assert(w("MARTHA", "MARHTA") == 0.9611111111111111)
    assert(j("DIXON", "DICKSONX") == 0.7666666666666666)
    assert(w("DIXON", "DICKSONX") == 0.8133333333333332)
    // empty beats equal: "" vs "" is 0, not 1 (DuckDB's edge order)
    assert(j("", "") == 0.0 && w("", "") == 0.0 && j("abc", "") == 0.0)
    assert(j("abc", "abc") == 1.0 && w("abc", "abc") == 1.0)
    // no prefix boost at or below jaro 0.7, even with a shared prefix
    val lo = j("apqrst", "azzzzz")
    assert(lo <= 0.7 && w("apqrst", "azzzzz") == lo)
    // no shared prefix: winkler degenerates to jaro
    assert(w("CRATE", "TRACE") == j("CRATE", "TRACE"))
  }

  test("blockedJaroWinklerPairs: threshold keeps only the near-identical pair") {
    val df = Seq(
      (1L, "anna smith", "x"), (2L, "anna smiht", "x"),
      (3L, "unrelated name", "x"))
      .toDF("id", "name", "blk")
    val got = LinkageOps
      .blockedJaroWinklerPairs(df, "id", "name", col("blk"), minSim = 0.9)
      .select("a", "b").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L)))
  }

  test("damerau_levenshtein SQL surface matches the expression") {
    val r = spark.sql(
      "SELECT damerau_levenshtein('CA', 'ABC') AS d1, " +
        "damerau_levenshtein('recieve', 'receive') AS d2").collect().head
    assert(r.getInt(0) == 2 && r.getInt(1) == 1)
  }
}
