package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.T

/** Does session state degrade across repeated registry-style executions? */
object Profile4 {
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

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"P4 $name t=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    def star() =
      T(spark, d, "lineitem")
        .join(broadcast(T(spark, d, "supplier").select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(T(spark, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(T(spark, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_items"))
        .count()

    for (i <- 1 to 6) {
      time(s"star_$i")(star())
      time(s"plain_count_$i")(
        spark.read.parquet(s"$d/lineitem.parquet").count())
    }
    spark.stop()
  }
}
