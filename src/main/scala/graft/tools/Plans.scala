package graft.tools

import java.io.PrintWriter

import org.apache.spark.sql.SparkSession

import graft.Registry

/** Dump the formatted physical plan of every registered query — the
  * review loop for pushdown/broadcast/codegen (run after adding or
  * changing operators; see PERF.md). */
object Plans {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/plans"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // sql_native_surface plans via the injected SQL functions
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(out).mkdirs()
    Registry.all.foreach { q =>
      try {
        val df = q.fn(spark, d)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val pw = new PrintWriter(s"$out/${q.name}.txt")
        pw.println(plan)
        pw.close()
      } catch {
        case e: Throwable => println(s"PLANERR ${q.name}: ${e.getMessage}")
      }
    }
    println(s"plans written to $out")
    spark.stop()
  }
}
