package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** End-to-end: full pipeline over the reference's committed raw fixtures,
  * run twice — outputs must match the reference counts and be identical
  * across re-runs (the pipeline's core incremental invariant). */
class RunnerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val rawDir = "/root/reference/data/raw_data"

  test("full run produces reference row counts; re-run is idempotent") {
    val outDir = Files.createTempDirectory("graft_runner").toString
    val ts = lit("2026-02-02 18:38:47").cast("timestamp")

    // Audits must ride the write jobs as Observation metrics (SURVEY §4) —
    // no job may originate from a count() in Runner (the reference's
    // len(df) double-scan audit, transform.py:121,140).
    val countJobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
        if (site.contains("count at") && site.contains("Runner"))
          countJobs.incrementAndGet()
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val audits1 = Runner.run(spark, rawDir, outDir, ts)
    Thread.sleep(2000) // listener bus is async; let job-start events drain
    spark.sparkContext.removeSparkListener(listener)
    assert(countJobs.get() == 0,
      s"audits spawned ${countJobs.get()} count() scan jobs — must be observe()-only")
    val byEntity = audits1.map(a => a.entity -> a.rowsOut).toMap
    assert(byEntity("repos") == 300)
    assert(byEntity("owners") == 1)
    assert(byEntity("branches") == 2628)

    val repos1 = spark.read.parquet(s"$outDir/repos_clean").collect().toSet

    val audits2 = Runner.run(spark, rawDir, outDir, ts)
    assert(audits2.map(a => a.entity -> a.rowsOut).toMap == byEntity)
    val repos2 = spark.read.parquet(s"$outDir/repos_clean").collect().toSet
    assert(repos1 == repos2, "re-run must reproduce identical clean output")

    // rotation: after the second run the backup generation exists and is
    // itself the first run's output
    val backup = spark.read.parquet(s"$outDir/repos_clean_backup").collect().toSet
    assert(backup == repos1)
  }
}
