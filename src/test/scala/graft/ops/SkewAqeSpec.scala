package graft.ops

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Documents when users need [[SkewOps]] at all: AQE's runtime skew-join
  * splitting handles a pathologically hot JOIN key on the un-salted plan
  * (this spec), so the manual salt is insurance for (a) aggregate skew —
  * AQE only splits join partitions — and (b) engines/paths where AQE is
  * off. The salted and un-salted joins must agree bit-for-bit either way
  * (also asserted through the `skew_salted_join` gate's oracle). */
class SkewAqeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("AQE skew-join splits the hot key's partition on the un-salted join") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.forceApply",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> util.Try(conf.get(k)).toOption).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.forceApply", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // test-sized thresholds: a partition is "skewed" past 64 KiB and
      // 2x the median, and splits aim at 16 KiB chunks
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16384")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // keep the dim side out of broadcast so the join actually shuffles
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      // 120k rows, ~92% on key 1 — the pathological key SkewOps salts
      val big = spark.range(120000L)
        .select(
          when(col("id") % 13 =!= 0, lit(1L)).otherwise(col("id") % 5).as("k"),
          concat(lit("payload_"), col("id")).as("v"))
      val small = Seq((0L, "d0"), (1L, "d1"), (2L, "d2"), (3L, "d3"), (4L, "d4"))
        .toDF("k", "d")

      val joined = big.join(small, "k")
      // execute THIS Dataset's QueryExecution: the adaptive plan only
      // finalizes (and marks skew handling) after actual execution —
      // a fresh count() plan would leave `joined`'s own plan unexecuted
      assert(joined.collect().length == 120000,
        "inner join on a complete dim keeps every row")

      // the AQE final plan must have split the hot partition: Spark marks
      // the join node and the skew-split reader in the executed plan
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case other => other.toString
      }
      assert(finalPlan.contains("skew=true"),
        s"expected AQE to mark the sort-merge join skew-handled:\n$finalPlan")

      // and the un-salted AQE result agrees with the manual salt exactly
      val viaAqe = joined.groupBy("k").count().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val viaSalt = SkewOps.saltedJoin(big, small, "k")
        .groupBy("k").count().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaAqe == viaSalt)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("saltCols disambiguator spreads bit-identical duplicate rows") {
    // the documented trade-off of a pure content salt: a hot key made of
    // IDENTICAL rows collapses into one bucket. With a stable unique id
    // passed as saltCols, the same rows spread — and the aggregate is
    // unchanged either way.
    val dup = spark.range(1024L)
      .select(lit(1L).as("k"), lit(2.5).as("v"), col("id").as("row_id"))
    val buckets = 16

    val fullRowSalt = dup.drop("row_id")
    val collapsed = fullRowSalt
      .select(SkewOps.contentSalt(fullRowSalt, buckets, Nil).as("s"))
      .distinct().count()
    assert(collapsed == 1, "identical rows share one content-salt bucket")

    val spread = dup
      .select(SkewOps.contentSalt(dup, buckets, Seq("row_id")).as("s"))
      .distinct().count()
    assert(spread == buckets, "id-based salt uses every bucket")

    val direct = dup.groupBy("k").agg(
      count(lit(1)).as("n_rows"),
      sum(col("v").cast("decimal(18,4)")).cast("double").as("total_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = SkewOps.saltedCountSum(dup, "k", "v", buckets, Seq("row_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == direct)
  }
}
