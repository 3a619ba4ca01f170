package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** File sinks with the reference's one-generation backup rotation
  * (extract.py:23-34, transform.py:41-55): delete old backup, rename
  * current to backup, write new. Spark writes directories, not files, so
  * the rotation swaps directories via Hadoop FileSystem renames — atomic
  * on HDFS-like stores, and exactly the generation semantics the reference
  * gets from os.rename. */
object Sinks {

  def rotate(spark: SparkSession, dir: String): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val current = new Path(dir)
    val backup = new Path(dir + "_backup")
    if (fs.exists(current)) {
      if (fs.exists(backup)) fs.delete(backup, true)
      fs.rename(current, backup)
    }
  }

  /** Parquet is the engine-native clean-layer format. */
  def writeParquetWithRotation(df: DataFrame, dir: String): Unit = {
    rotate(df.sparkSession, dir)
    df.write.mode("overwrite").parquet(dir)
  }

  /** CSV for reference-faithful clean output (transform.py:41-55 wrote
    * CSV); header on, UTF-8, same rotation. */
  def writeCsvWithRotation(df: DataFrame, dir: String): Unit = {
    rotate(df.sparkSession, dir)
    df.write.mode("overwrite").option("header", "true").csv(dir)
  }

  /** Raw-layer JSON sink (extract.py:23-34 wrote pretty JSON). */
  def writeJsonWithRotation(df: DataFrame, dir: String): Unit = {
    rotate(df.sparkSession, dir)
    df.write.mode("overwrite").json(dir)
  }

  /** ORC with the same rotation contract — for warehouses standardized
    * on ORC (Hive-lineage stacks) rather than parquet; Spark's reader
    * gives ORC the same pushdown/pruning treatment, asserted in
    * SinksExtractSpec. */
  def writeOrcWithRotation(df: DataFrame, dir: String): Unit = {
    rotate(df.sparkSession, dir)
    df.write.mode("overwrite").orc(dir)
  }

  /** Key-matched MERGE/upsert into a parquet warehouse table — the
    * reference's intended load (load.py:57 "githubIDs … can be dropped"
    * TODO; PK/UNIQUE DDL at migrations/001_core_schema.sql:46-66), which
    * it never shipped. Semantics: incoming rows replace same-key existing
    * rows and append new keys; existing rows with unmatched keys survive.
    * Because keys are deterministic (uuid5 over natural keys), re-merging
    * the same batch is a no-op — the pipeline's idempotence invariant,
    * asserted in SinksMergeSpec.
    *
    * Shape at 100 TB: one left-anti shuffle join keyed on the merge key.
    * On a real warehouse, bucket the table by the key so the anti join
    * co-locates without re-shuffling the big side, or hand the same
    * staging frame to a MERGE-capable store (Delta/Iceberg/JDBC MERGE);
    * the rotation keeps one previous generation either way. */
  /** The MERGE plan itself, storage-free: incoming rows replace same-key
    * existing rows, new keys append, unmatched existing keys survive.
    * Idempotent by construction — `mergeFrames(mergeFrames(b, u), u)` ≡
    * `mergeFrames(b, u)` (the anti-join removes exactly the rows the
    * union re-adds) — which is what makes at-least-once re-delivery safe;
    * gated read-only as `merge_upsert_idempotent`. One left-anti shuffle
    * join keyed on the merge key. */
  def mergeFrames(
      existing: DataFrame, incoming: DataFrame, keyCols: Seq[String]): DataFrame =
    existing
      .join(incoming.select(keyCols.map(incoming(_)): _*).distinct(),
        keyCols, "left_anti")
      .unionByName(incoming)

  def mergeParquetOnKey(
      incoming: DataFrame, dir: String, keyCols: Seq[String]): DataFrame = {
    val spark = incoming.sparkSession
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // A death between rotate and rename on a previous call leaves `dir`
    // missing with the previous generation intact in `dir_backup`;
    // re-merge into that instead of silently reinitializing from the
    // incoming batch (which would drop every unmatched existing key).
    val existing =
      if (fs.exists(new Path(dir))) Some(spark.read.parquet(dir))
      else if (fs.exists(new Path(dir + "_backup")))
        Some(spark.read.parquet(dir + "_backup"))
      else None
    val merged =
      existing.fold(incoming)(mergeFrames(_, incoming, keyCols))
    // Materialize before rotating: the merged plan reads the directory the
    // rotation is about to rename.
    val staged = dir + "_staging"
    merged.write.mode("overwrite").parquet(staged)
    rotate(spark, dir)
    fs.rename(new Path(staged), new Path(dir))
    spark.read.parquet(dir)
  }

  /** Hive-style partitioned parquet layout: one directory per value of
    * the partition columns. Low-cardinality filter columns (event type,
    * ingest date, language) become partition pruning at read time — the
    * scan never opens non-matching directories, which at 100 TB turns
    * "scan everything, filter later" into "list three directories".
    * Pruning is asserted in SinksExtractSpec (PartitionFilters reach the
    * scan node). Pair with [[writeBucketedTable]]: partition by the
    * coarse filter axis, bucket by the join key. */
  def writePartitioned(
      df: DataFrame, dir: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(dir)

  /** Bucketed warehouse table: pre-shuffles rows into `buckets` files per
    * partition keyed by `key` (sorted within buckets), so every later join
    * or aggregation on `key` between co-bucketed tables plans with NO
    * exchange — at 100 TB the difference between each join re-shuffling
    * the fact table and none of them shuffling at all. Asserted in
    * SinksExtractSpec: a join of two co-bucketed tables contains no
    * Exchange node. Spark bucketing requires a table catalog entry, so
    * this sink is saveAsTable-based with an optional external path. */
  def writeBucketedTable(
      df: DataFrame, table: String, key: String, buckets: Int,
      path: Option[String] = None): Unit = {
    val w0 = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
    path.fold(w0)(p => w0.option("path", p)).saveAsTable(table)
  }

  /** Compact a parquet directory's small files into ~`targetRowsPerFile`
    * files — the maintenance pass every incremental sink needs: streaming
    * micro-batches and per-run MERGE staging each write a few rows per
    * file, and at 100 TB a scan's task count (and the NameNode/liststore
    * load) is proportional to FILE count, not data size. Reads once,
    * `repartitionByRange` on `sortCol` (so per-file min/max stats stay
    * tight — compaction is also the moment layout clustering happens,
    * cf. [[graft.ops.LayoutOps]]), writes staged, then swaps via the
    * usual one-generation rotation. Returns the new file count. */
  def compactParquet(
      spark: SparkSession, dir: String, targetRowsPerFile: Long,
      sortCol: String): Int = {
    import org.apache.spark.sql.functions.col
    val df = spark.read.parquet(dir)
    val rows = df.count()
    val nFiles = math.max(1, math.ceil(rows.toDouble / targetRowsPerFile).toInt)
    val staged = dir + "_staging"
    df.repartitionByRange(nFiles, col(sortCol))
      .write.mode("overwrite").parquet(staged)
    rotate(spark, dir)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new Path(staged), new Path(dir))
    nFiles
  }

  /** JDBC sink in FK dependency order, github-id lineage columns dropped
    * before load per the reference's own TODO (load.py:57). Idempotence
    * comes from deterministic keys: overwrite (or stage + MERGE on stores
    * that support it) always converges to the same rows. */
  def writeJdbc(
      tables: Seq[(String, DataFrame)],
      url: String,
      props: java.util.Properties): Unit =
    tables.foreach { case (name, df) =>
      val lineage = df.columns.filter(_.startsWith("github_"))
      df.drop(lineage: _*)
        .write.mode("overwrite").jdbc(url, name, props)
    }

  /** Per-store SQL for the staged key-matched upsert ([[mergeJdbc]]):
    * `mergeSql` merges a staging table into the target on the key
    * columns, `createLike` bootstraps an empty target shaped like the
    * staging table. */
  trait JdbcMergeDialect extends Serializable {
    def mergeSql(target: String, staging: String,
        cols: Seq[String], keyCols: Seq[String]): String
    def createLike(target: String, staging: String): String
  }

  /** The reference's actual load target was SQL Server (load.py:25-55,
    * conn_str `ODBC Driver 17 for SQL Server`); this is the T-SQL MERGE
    * that target would run. Env-blocked here (no SQL Server), so the
    * statement text is unit-pinned while [[AnsiMergeDialect]] proves the
    * execution path end-to-end on embedded Derby. */
  object TsqlMergeDialect extends JdbcMergeDialect {
    def mergeSql(target: String, staging: String,
        cols: Seq[String], keyCols: Seq[String]): String = {
      val on = keyCols.map(k => s"t.[$k] = s.[$k]").mkString(" AND ")
      val nonKeys = cols.filterNot(keyCols.contains)
      val matched =
        if (nonKeys.isEmpty) ""
        else "WHEN MATCHED THEN UPDATE SET " +
          nonKeys.map(c => s"t.[$c] = s.[$c]").mkString(", ") + " "
      s"MERGE INTO [$target] AS t USING [$staging] AS s ON $on " +
        matched +
        s"WHEN NOT MATCHED THEN INSERT (${cols.map(c => s"[$c]").mkString(", ")}) " +
        s"VALUES (${cols.map(c => s"s.[$c]").mkString(", ")});"
    }
    def createLike(target: String, staging: String): String =
      s"SELECT * INTO [$target] FROM [$staging] WHERE 1 = 0"
  }

  /** ANSI MERGE (Derby 10.11+, PostgreSQL 15+, ...): same statement shape
    * with double-quoted identifiers — Spark's JDBC writer creates staging
    * columns as quoted (case-exact) names, so unquoted references would
    * case-fold and miss them. This is the dialect the Derby round-trip
    * test executes for real. */
  object AnsiMergeDialect extends JdbcMergeDialect {
    private def q(c: String) = "\"" + c + "\""
    def mergeSql(target: String, staging: String,
        cols: Seq[String], keyCols: Seq[String]): String = {
      val on = keyCols.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
      val nonKeys = cols.filterNot(keyCols.contains)
      val matched =
        if (nonKeys.isEmpty) ""
        else "WHEN MATCHED THEN UPDATE SET " +
          nonKeys.map(c => s"${q(c)} = s.${q(c)}").mkString(", ") + " "
      s"MERGE INTO $target t USING $staging s ON $on " +
        matched +
        s"WHEN NOT MATCHED THEN INSERT (${cols.map(q).mkString(", ")}) " +
        s"VALUES (${cols.map(c => s"s.${q(c)}").mkString(", ")})"
    }
    def createLike(target: String, staging: String): String =
      s"CREATE TABLE $target AS SELECT * FROM $staging WITH NO DATA"
  }

  /** Staged JDBC MERGE: write the (lineage-dropped) batch to
    * `<table>_staging`, run the dialect's MERGE into the target (bootstrap
    * an empty target on first load), drop the staging table. This is the
    * idempotent warehouse load the reference intended — same-key rows
    * update, new keys insert, unmatched keys survive — pushed down to the
    * store instead of re-written wholesale, which at warehouse scale is
    * the difference between shipping a delta and re-shipping the table. */
  def mergeJdbc(
      df: DataFrame, table: String, keyCols: Seq[String],
      url: String, props: java.util.Properties,
      dialect: JdbcMergeDialect = AnsiMergeDialect): Unit = {
    val lineage = df.columns.filter(_.startsWith("github_"))
    val clean = df.drop(lineage: _*)
    val staging = table + "_staging"
    clean.write.mode("overwrite").jdbc(url, staging, props)
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val exists = JdbcMeta.tableExists(conn, table)
      val stmt = conn.createStatement()
      try {
        if (!exists) stmt.executeUpdate(dialect.createLike(table, staging))
        stmt.executeUpdate(
          dialect.mergeSql(table, staging, clean.columns.toSeq, keyCols))
        stmt.executeUpdate(s"DROP TABLE $staging")
      } finally stmt.close()
    } finally conn.close()
  }
}
