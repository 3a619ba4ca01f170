package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end pipeline orchestration: the reference's module-level run
  * (transform.py:492-497) as one idempotent function. Order preserved —
  * repos → owners → branches → issues → users — because owners accumulate
  * from repos and users from issues; unlike the reference, the ordering is
  * explicit here rather than an import side effect.
  *
  * Re-runs are idempotent by construction: deterministic uuid5 keys, keep-
  * last dedupe, and union-accumulate dimensions that read their own
  * previous output (the reference's `self.users_df` instance state, made
  * durable). Every entity write goes through the one-generation rotation
  * sink and reports before/after row counts (the A1/A3 audits). */
object Runner {

  final case class Audit(entity: String, rowsIn: Long, rowsOut: Long)

  private def readIfExists(spark: SparkSession, dir: String): Option[DataFrame] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(dir)) else None
  }

  private def rawOrNone(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): Option[DataFrame] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else Some(Transform.withIngestOrd(
      spark.read.schema(schema).option("multiLine", "true").json(path)))
  }

  /** Run the full clean layer over a raw directory. Returns audits in
    * execution order. */
  def run(
      spark: SparkSession,
      rawDir: String,
      outDir: String,
      ingestedAt: Column = current_timestamp()): Seq[Audit] = {

    var audits = Vector.empty[Audit]
    def sink(entity: String, rowsIn: Long, df: DataFrame): DataFrame = {
      Sinks.writeParquetWithRotation(df, s"$outDir/${entity}_clean")
      val out = spark.read.parquet(s"$outDir/${entity}_clean")
      audits :+= Audit(entity, rowsIn, out.count())
      out
    }

    val reposRaw = rawOrNone(spark, s"$rawDir/repos_raw.json", Schemas.reposRaw)
      .getOrElse(sys.error(s"missing $rawDir/repos_raw.json"))
    val reposClean = sink("repos", reposRaw.count(),
      Transform.cleanRepos(reposRaw))

    val owners = sink("owners", reposClean.count(),
      Transform.cleanOwners(reposClean,
        readIfExists(spark, s"$outDir/owners_clean_backup")))

    rawOrNone(spark, s"$rawDir/branches_raw.json", Schemas.branchesRaw)
      .foreach { braw =>
        sink("branches", braw.count(),
          Transform.cleanBranches(braw, reposClean, ingestedAt))
      }

    rawOrNone(spark, s"$rawDir/issues_raw.json", Schemas.issuesRaw)
      .foreach { iraw =>
        val issuesClean = sink("issues", iraw.count(),
          Transform.cleanIssues(iraw, reposClean))
        sink("users", issuesClean.count(),
          Transform.cleanUsers(issuesClean,
            readIfExists(spark, s"$outDir/users_clean_backup")))
      }

    val _ = owners
    audits
  }

  /** CLI: run over the reference's committed raw fixtures. */
  def main(args: Array[String]): Unit = {
    val rawDir = if (args.nonEmpty) args(0) else "/root/reference/data/raw_data"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_pipeline_out"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val audits = run(spark, rawDir, outDir)
    audits.foreach(a =>
      println(s"AUDIT ${a.entity}: in=${a.rowsIn} out=${a.rowsOut} " +
        s"dropped=${a.rowsIn - a.rowsOut}"))
    spark.stop()
  }
}
