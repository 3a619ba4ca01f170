package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the PageRank gate's stages (not part of the
  * library surface; used to attribute iteration cost). */
object ProfilePr {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pr] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (rep <- 1 to 3) {
      println(s"--- rep $rep")
      val orders = spark.read.parquet(s"$d/orders.parquet")
      val li = spark.read.parquet(s"$d/lineitem.parquet")
      val e = orders.join(li, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      time("edges distinct count")(e.count())
      val eDeg = e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
        .repartition(col("src"))
        .persist()
      time("eDeg persist count")(eDeg.count())
      val nodes = e.select(col("src").as("id")).union(e.select(col("dst").as("id")))
        .distinct().repartition(col("id")).persist()
      time("nodes persist count")(nodes.count())
      var ranks = nodes.select(col("id"), lit(1000000L).as("r"))
      for (i <- 1 to 3) {
        val contrib = eDeg.join(ranks.withColumnRenamed("id", "src"), "src")
          .select(col("dst"), expr("r div outdeg").as("c"))
          .groupBy("dst").agg(sum("c").as("c"))
        ranks = nodes.join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left_outer")
          .select(col("id"), (lit(150000L) + expr("(85L * coalesce(c, 0L)) div 100L")).as("r"))
        ranks = time(s"round $i checkpoint")(ranks.localCheckpoint(true))
      }
      eDeg.unpersist(); nodes.unpersist()
    }
    spark.stop()
  }
}
