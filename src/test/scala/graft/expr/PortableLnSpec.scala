package graft.expr

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The explicit-algorithm ln: exact identities, accuracy vs the native
  * log, and the SQL-surface registration. Bit-parity with the DuckDB
  * replica is proven by the `profile_mutual_info` gate. */
class PortableLnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("exact identities: ln(1)=0, powers of two are e*ln2 exactly") {
    assert(PortableLnRatio.compute(1, 1) == 0.0)
    assert(PortableLnRatio.compute(7, 7) == 0.0) // a==b → m=1, t=0
    assert(PortableLnRatio.compute(1, 2) == -PortableLnRatio.Ln2)
    assert(PortableLnRatio.compute(8, 1) == 3 * PortableLnRatio.Ln2)
    assert(PortableLnRatio.compute(1024, 4) == 8 * PortableLnRatio.Ln2)
  }

  test("accuracy: within 8 ulps of the reduction scale vs Math.log") {
    // absolute error rides ulp(e·ln2 + ln m)'s LARGEST term, so when
    // the two cancel the bound is relative to 1+|ref|, not |ref|
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 20000) {
      val b = 1 + rnd.nextInt(1000000)
      val a = 1 + rnd.nextInt(1000000)
      val got = PortableLnRatio.compute(a, b)
      val ref = Math.log(a.toDouble / b.toDouble)
      assert(math.abs(got - ref) <= 8 * Math.ulp(1.0 + math.abs(ref)),
        s"ln($a/$b): got $got, ref $ref")
    }
  }

  test("big operands: a.toDouble rounding path, still finite and close") {
    val a = Long.MaxValue / 3
    val got = PortableLnRatio.compute(a, 7)
    val ref = Math.log(a.toDouble / 7.0)
    assert(math.abs(got - ref) <= 8 * Math.ulp(1.0 + math.abs(ref)))
  }

  test("domain guard: non-positive inputs fail loudly") {
    intercept[IllegalArgumentException](PortableLnRatio.compute(0, 5))
    intercept[IllegalArgumentException](PortableLnRatio.compute(5, -1))
  }

  test("SQL surface: portable_ln(a, b) registered and codegen-evaluated") {
    val r = spark.sql(
      "SELECT portable_ln(10, 4) AS v, portable_ln(1, 2) AS w")
      .collect().head
    assert(r.getDouble(0) == PortableLnRatio.compute(10, 4))
    assert(r.getDouble(1) == -PortableLnRatio.Ln2)
  }
}
