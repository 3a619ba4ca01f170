package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for the round-8 statistical/sketch gates: the
  * scale arguments in their scaladoc (one keyed shuffle for the moment
  * sums, bin-sized state for the histogram quantiles, no pair blow-up in
  * the co-occurrence self-join) are asserted here so a refactor that
  * silently degrades the plan fails a test, not a 100 TB run. */
class SketchStatPlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    Registry.queryMap(name)(spark, sf).queryExecution.executedPlan.toString

  private def countOf(hay: String, needle: String): Int =
    needle.r.findAllMatchIn(hay).size

  test("regression: moment sums ride ONE l_returnflag exchange") {
    val p = plan("stat_regression_per_key")
    assert(countOf(p, "Exchange hashpartitioning\\(l_returnflag") == 1,
      s"all five moment sums must share one keyed shuffle:\n$p")
    // partial aggregation must run map-side before that exchange
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
  }

  test("binned quantiles: no global row sort — only the 9-row output sort") {
    val p = plan("sketch_quantile_binned")
    assert(countOf(p, "Exchange rangepartitioning") <= 1,
      s"the only range exchange allowed is the tiny final orderBy:\n$p")
    assert(p.contains("hashpartitioning(l_returnflag"),
      s"bin counts must aggregate on a keyed shuffle:\n$p")
  }

  test("forward/backward fill share ONE user exchange") {
    val p = plan("window_forward_fill")
    assert(countOf(p, "Exchange hashpartitioning\\(user_id") == 1,
      s"LOCF and NOCB must ride the same user shuffle:\n$p")
  }

  test("co-occurrence: keyed self-join, never a cartesian/nested-loop") {
    val p = plan("text_cooccurrence")
    assert(!p.contains("CartesianProduct"),
      s"pair generation must stay keyed by doc_id:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"pair generation must stay keyed by doc_id:\n$p")
  }
}
