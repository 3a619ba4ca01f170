package graft.tools

import java.io.PrintWriter

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.T

/** Self-dumping profiler: if a step exceeds 4s, dump all thread stacks. */
object Profile5 {
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

    @volatile var dumped = 0
    def time(name: String)(f: => Any): Unit = {
      @volatile var done = false
      val watcher = new Thread(() => {
        Thread.sleep(4000)
        if (!done && dumped < 3) {
          dumped += 1
          val pw = new PrintWriter(s"/tmp/selfdump_${name}_$dumped.txt")
          import scala.jdk.CollectionConverters._
          Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
            pw.println(s"--- ${t.getName} ${t.getState}")
            st.foreach(e => pw.println(s"    $e"))
          }
          pw.close()
          println(s"DUMPED $name")
        }
      })
      watcher.setDaemon(true)
      watcher.start()
      val t0 = System.nanoTime()
      f
      done = true
      println(f"P5 $name t=${(System.nanoTime() - t0) / 1e9}%.3f")
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

    for (i <- 1 to 8) time(s"star_$i")(star())
    spark.stop()
  }
}
