package graft.expr

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Vectors from the reference pipeline's committed outputs (FIXTURES.md
  * A.3): uuid5(uuid5(NAMESPACE_DNS, "github.<entity>"), natural_key). */
class NamespacedUuidSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def eval(c: org.apache.spark.sql.Column): String = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("u")).head().getString(0)
  }

  test("namespace derivation matches RFC uuid5(NAMESPACE_DNS, label)") {
    assert(NamespacedUuid.NsOwner == "490252121eae5359b9c1eacbe2725a37")
  }

  test("owner key: microsoft") {
    assert(eval(GraftFunctions.ownerKey(lit("microsoft")))
      == "0dd58109-d16c-5fac-9308-c895180d7869")
  }

  test("repo key: microsoft|.github") {
    assert(eval(GraftFunctions.repoKey(lit("microsoft|.github")))
      == "ed35ef31-1edc-5cd0-a250-d62d346f2a86")
  }

  test("branch key: .github|DragosDanielBoia-patch-1") {
    assert(eval(GraftFunctions.branchKey(lit(".github|DragosDanielBoia-patch-1")))
      == "007f7c0f-6276-5eae-a8db-e292f7ff3916")
  }

  test("issue key: .github|449") {
    assert(eval(GraftFunctions.issueKey(lit(".github|449")))
      == "da33bf29-9415-5d28-8475-d5dd2093296e")
  }

  test("user key: yasinduksiye1212-stack") {
    assert(eval(GraftFunctions.userKey(lit("yasinduksiye1212-stack")))
      == "780d978c-ab7e-58dc-8428-1a8c0a39f43c")
  }

  test("null input yields null, non-null is 36-char canonical") {
    import spark.implicits._
    val df = Seq(Some("a"), None).toDF("s")
      .select(GraftFunctions.userKey(col("s")).as("u"))
    val rows = df.collect()
    assert(rows.count(_.isNullAt(0)) == 1)
    val u = rows.find(!_.isNullAt(0)).get.getString(0)
    assert(u.length == 36 && u(14) == '5')
  }

  test("SQL registration works and matches Column API") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq("k").toDF("s").createOrReplaceTempView("t_uuid")
    val viaSql = spark
      .sql(s"SELECT uuid5('${NamespacedUuid.NsUser}', s) AS u FROM t_uuid")
      .head().getString(0)
    assert(viaSql == eval(GraftFunctions.userKey(lit("k"))))
  }

  test("all native expressions are SQL-callable") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT simhash64(array('a','b')) AS sh,
        |  fingerprint64('hello world of data', 8) AS fp,
        |  dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
        |  sign_sketch64(array(0.5d, -0.5d)) AS sk""".stripMargin).head()
    assert(r.getLong(0) == SimHash64.compute(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString("a"),
          org.apache.spark.unsafe.types.UTF8String.fromString("b")))))
    assert(r.getLong(1) == Fingerprint64.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("hello world of data"), 8))
    assert(r.getDouble(2) == 11.0)
    val _ = r.getLong(3) // deterministic; existence + type is the contract
  }

  test("determinism under codegen: same key twice in one plan") {
    import spark.implicits._
    val df = Seq("x", "y", "x").toDF("s")
      .select(col("s"), GraftFunctions.repoKey(col("s")).as("u"))
    val m = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m.size == 2)
    assert(df.distinct().count() == 2)
  }
}
