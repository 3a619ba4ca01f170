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
    val merged =
      if (!fs.exists(new Path(dir))) incoming
      else mergeFrames(spark.read.parquet(dir), incoming, keyCols)
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
}
