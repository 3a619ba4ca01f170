package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.T

/** Bisect the slow star join: which piece costs the time? */
object Profile2 {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.001"
    val spark = SparkSession
      .builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STEP $name n=$n t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }

    for (_ <- 1 to 2) {
      time("read_li_count")(T(spark, d, "lineitem").count())
      time("li_supp_join") {
        T(spark, d, "lineitem")
          .join(broadcast(T(spark, d, "supplier").select("s_suppkey", "s_nationkey")),
            col("l_suppkey") === col("s_suppkey")).count()
      }
      time("li_supp_join_nobc") {
        T(spark, d, "lineitem")
          .join(T(spark, d, "supplier").select("s_suppkey", "s_nationkey"),
            col("l_suppkey") === col("s_suppkey")).count()
      }
      time("full_star") {
        T(spark, d, "lineitem")
          .join(broadcast(T(spark, d, "supplier").select("s_suppkey", "s_nationkey")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(T(spark, d, "nation")), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(T(spark, d, "region")), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name")
          .agg(count(lit(1)).as("n_items"))
          .count()
      }
      time("groupby_only") {
        T(spark, d, "lineitem").groupBy("l_returnflag").agg(count(lit(1))).count()
      }
      time("orderby") {
        T(spark, d, "orders").orderBy("o_orderkey").count()
      }
    }
    spark.stop()
  }
}
