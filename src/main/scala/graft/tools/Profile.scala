package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Registry

/** Scratch profiler: runs the whole registry twice in one JVM to separate
  * one-time (codegen/JIT/catalog) cost from steady-state cost. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession
      .builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (round <- 1 to 2) {
      val t0 = System.nanoTime()
      val per = Registry.all.map { q =>
        val s = System.nanoTime()
        q.fn(spark, sfDir).count()
        q.name -> (System.nanoTime() - s) / 1e9
      }
      println(
        f"ROUND $round total=${(System.nanoTime() - t0) / 1e9}%.1f slowest=" +
          per.sortBy(-_._2).take(5)
            .map { case (n, t) => f"$n=$t%.1f" }.mkString(","))
    }
    spark.stop()
  }
}
