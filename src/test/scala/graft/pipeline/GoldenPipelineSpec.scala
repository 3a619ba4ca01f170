package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Golden parity: run the rebuilt transforms over the reference's own
  * committed raw JSON (data/raw_data/) and compare against its committed
  * clean CSVs (data/clean_data/) — 300 repos, 1 owner, 2628 branches per
  * BASELINE.md. Issues raw is absent from the snapshot
  * (.MISSING_LARGE_BLOBS), so issue semantics are covered by a synthetic
  * fixture in PipelineSemanticsSpec instead. */
class GoldenPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val rawDir = "/root/reference/data/raw_data"
  private val cleanDir = "/root/reference/data/clean_data"

  private def readRaw(name: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    Transform.withIngestOrd(
      spark.read.schema(schema).option("multiLine", "true").json(s"$rawDir/$name"))

  private def readGolden(name: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      .csv(s"$cleanDir/$name")

  private lazy val reposClean =
    Transform.cleanRepos(readRaw("repos_raw.json", Schemas.reposRaw))

  test("cleanRepos matches the reference's committed output exactly") {
    val golden = readGolden("repos_clean.csv").select(
      col("repo_id"),
      col("github_repo_id").cast("long"),
      col("repo_name"),
      col("full_name"),
      col("description"),
      col("topics"),
      col("language"),
      col("owner_id"),
      col("github_owner_id").cast("long"),
      col("owner_login"),
      col("visibility"),
      col("private").cast("int"),
      col("disabled").cast("int"),
      col("fork").cast("int"),
      col("archived").cast("int"),
      col("default_branch"),
      col("stargazers_count").cast("long"),
      col("watchers_count").cast("long"),
      col("forks_count").cast("long"),
      col("forks").cast("long"),
      col("open_issues_count").cast("long"),
      col("created_at").cast("timestamp"),
      col("updated_at").cast("timestamp"),
      col("pushed_at").cast("timestamp"))

    val mine = reposClean.select(golden.columns.map(col): _*)
    assert(mine.count() == 300)
    assert(golden.count() == 300)
    assert(mine.exceptAll(golden).isEmpty, "rows we produced that golden lacks")
    assert(golden.exceptAll(mine).isEmpty, "golden rows we failed to produce")
  }

  test("cleanOwners derives the single accumulated owner") {
    val owners = Transform.cleanOwners(reposClean)
    val rows = owners.collect()
    assert(rows.length == 1)
    assert(rows.head.getString(0) == "0dd58109-d16c-5fac-9308-c895180d7869")
    assert(rows.head.getString(1) == "microsoft")
  }

  test("cleanBranches matches the reference's committed output exactly") {
    val branches = Transform.cleanBranches(
      readRaw("branches_raw.json", Schemas.branchesRaw),
      reposClean,
      ingestedAt = lit("2026-02-02 18:38:47").cast("timestamp"))
    val golden = readGolden("branches_clean.csv").select(
      col("branch_id"),
      col("branch_name"),
      col("protected").cast("int"),
      col("commit_sha"),
      col("repo_id"))
    val mine = branches.select(golden.columns.map(col): _*)
    assert(mine.count() == 2628)
    assert(mine.exceptAll(golden).isEmpty)
    assert(golden.exceptAll(mine).isEmpty)
  }

  test("keep-last dedupe is idempotent (incremental invariant)") {
    val raw = readRaw("repos_raw.json", Schemas.reposRaw)
    val once = Transform.cleanRepos(raw)
    // re-cleaning the already-clean output through the dedupe path
    // changes nothing: same keys, same rows
    val again = Transform.dedupeKeepLast(once, Seq("github_repo_id"), lit(0))
    assert(again.count() == once.count())
  }
}
