package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.tools.GateTaskMetrics

/** The runtime twin of PlanGuardSpec: per-gate shuffle-byte attribution
  * ([[GateTaskMetrics]], published by Bench) must catch a plan regression
  * that wall time cannot — the whole reason bytes are in the BENCH
  * artifact. */
class GateMetricsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("a deliberately-regressed join plan moves shuffle bytes where wall time is noise") {
    val listener = new GateTaskMetrics
    spark.sparkContext.addSparkListener(listener)
    try {
      import spark.implicits._
      val fact = spark.range(200000L)
        .select(col("id"), (col("id") % 100L).as("k"))
      val dim = spark.range(100L)
        .select(col("id").as("k"), (col("id") * 7L).as("v"))

      // HEALTHY plan: broadcast-hash join — the fact side never shuffles.
      val good = fact.join(broadcast(dim), "k").select(sum("v"))
      // DELIBERATE REGRESSION: the same join forced to shuffle both
      // sides (merge hint beats the broadcast decision) — the class of
      // regression a silently-oversized dim table causes at 100 TB.
      val bad = fact.hint("merge").join(dim.hint("merge"), "k")
        .select(sum("v"))

      listener.setGate("join_good")
      val t0 = System.nanoTime(); good.collect()
      val wallGood = (System.nanoTime() - t0) / 1e9
      listener.setGate("join_bad")
      val t1 = System.nanoTime(); bad.collect()
      val wallBad = (System.nanoTime() - t1) / 1e9
      listener.quiesce()

      val snap = listener.snapshot
      val (srGood, swGood) =
        (snap("join_good")._1 + snap("join_good")._2, snap("join_good")._2)
      val (srBad, swBad) =
        (snap("join_bad")._1 + snap("join_bad")._2, snap("join_bad")._2)
      info(f"good: shuffle=${srGood}B wall=$wallGood%.3fs; " +
        f"bad: shuffle=${srBad}B wall=$wallBad%.3fs")
      // the broadcast plan shuffles only the final 1-row partial agg
      // (~hundreds of bytes); the regressed plan shuffles the 200k-row
      // fact side for the sort-merge join (~50 kB even after the
      // sequential-id columns compress) — two orders of magnitude, not
      // a noise-band delta
      assert(swBad > swGood * 50 && swBad > 20000L,
        s"regressed plan must write orders more shuffle: $swBad vs $swGood")
      // wall time at this scale is millisecond noise — the regression is
      // NOT reliably visible there (often the broadcast plan is even
      // slower at tiny scale); bytes are the signal. No wall assert: the
      // point is that none would be sound.
      assert(snap("join_good")._6 > 0 && snap("join_bad")._6 > 0,
        "both gates must have attributed tasks")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
    }
  }
}
