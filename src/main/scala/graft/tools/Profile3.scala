package graft.tools

import org.apache.spark.sql.SparkSession

/** Raw Spark micro-costs: job scheduling, codegen, parquet scan. */
object Profile3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession
      .builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"MICRO $name t=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    for (i <- 1 to 3) {
      time(s"range_count_$i")(spark.range(1000000).count())
      time(s"emptyRDD_$i")(spark.sparkContext.parallelize(1 to 8, 8).count())
      val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      time(s"parquet_count_$i")(df.count())
      time(s"parquet_count_again_$i")(df.count())
      time(s"parquet_agg_$i") {
        import org.apache.spark.sql.functions._
        df.groupBy("l_returnflag").agg(count(lit(1))).collect()
      }
    }
    spark.stop()
  }
}
