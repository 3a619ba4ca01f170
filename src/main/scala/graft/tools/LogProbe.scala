package graft.tools

/** One-off probe: does the JVM agree with glibc (DuckDB's libm) on
  * `ln(k/n)` for random rationals? Compares both `Math.log` (HotSpot
  * intrinsic) and `StrictMath.log` (fdlibm) against reference values
  * produced by CPython (glibc). Decides which log the exact-oracle
  * gates may use. */
object LogProbe {
  def main(args: Array[String]): Unit = {
    val src = scala.io.Source.fromFile("/tmp/lnprobe.txt")
    var n = 0; var badMath = 0; var badStrict = 0
    for (line <- src.getLines()) {
      val Array(ks, ns, ref) = line.split(" ")
      val v = ks.toDouble / ns.toDouble
      val expect = java.lang.Double.parseDouble(ref)
      n += 1
      if (java.lang.Double.doubleToLongBits(Math.log(v)) !=
        java.lang.Double.doubleToLongBits(expect)) badMath += 1
      if (java.lang.Double.doubleToLongBits(StrictMath.log(v)) !=
        java.lang.Double.doubleToLongBits(expect)) badStrict += 1
    }
    src.close()
    println(s"n=$n mathLogMismatch=$badMath strictLogMismatch=$badStrict")
  }
}
