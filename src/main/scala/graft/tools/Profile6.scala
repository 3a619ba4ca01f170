package graft.tools

import java.io.PrintWriter
import java.lang.management.ManagementFactory

import org.apache.spark.sql.SparkSession

import graft.Registry

/** Reproduce Bench-session degradation: run the registry at sf0.1 twice,
  * log per-query time + cumulative GC time, self-dump stacks if a query
  * exceeds 30s. */
object Profile6 {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }

    @volatile var dumped = 0
    for (round <- 1 to 2) {
      Registry.all.foreach { q =>
        @volatile var done = false
        val name = q.name
        val watcher = new Thread(() => {
          Thread.sleep(30000)
          if (!done && dumped < 2) {
            dumped += 1
            val pw = new PrintWriter(s"/tmp/p6dump_${name}_$round.txt")
            import scala.jdk.CollectionConverters._
            Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
              pw.println(s"--- ${t.getName} ${t.getState}")
              st.foreach(e => pw.println(s"    $e"))
            }
            pw.close()
            println(s"P6DUMPED $name round=$round")
          }
        })
        watcher.setDaemon(true)
        watcher.start()
        val g0 = gcMillis
        val t0 = System.nanoTime()
        try q.fn(spark, d).count() catch { case e: Throwable =>
          println(s"P6ERR $name ${e.getMessage.take(100)}") }
        done = true
        val dt = (System.nanoTime() - t0) / 1e9
        if (dt > 2.0)
          println(f"P6 r$round $name t=$dt%.1f gc=${gcMillis - g0}ms " +
            f"threads=${Thread.activeCount()}")
      }
      println(s"P6 ROUND $round done")
    }
    spark.stop()
  }
}
