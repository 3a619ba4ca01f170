package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Drives the streaming pipeline synchronously with MemoryStream — two
  * micro-batches with overlapping keys prove the incremental upsert
  * semantics (new keys emitted once, replays suppressed). */
class IncrementalPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("streaming dedupe emits each key once across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val df = input.toDF().toDF("user_id", "login", "ts")
    val deduped = IncrementalPipeline.streamingDedupe(
      df, Seq("user_id"), "ts", "1 hour")
    // dropDuplicates includes the event-time col in the key to stay
    // watermark-compatible; identical replays carry identical ts
    val q = deduped.writeStream
      .format("memory").queryName("dedupe_out")
      .outputMode(OutputMode.Append).start()
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    input.addData((1L, "alice", t0), (2L, "bob", t0))
    q.processAllAvailable()
    input.addData((1L, "alice", t0), (3L, "carol", t0)) // 1 is a replay
    q.processAllAvailable()
    val rows = spark.sql("SELECT user_id FROM dedupe_out")
      .as[Long].collect().sorted.toSeq
    q.stop()
    assert(rows == Seq(1L, 2L, 3L))
  }

  test("stream-static dedupe drops re-ingests of already-curated content") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the curated base: fingerprints of documents already in the corpus
    val base = Seq(("fp_a", 1L), ("fp_b", 2L)).toDF("fp", "base_doc")
    val input = MemoryStream[(String, String)]
    val df = input.toDF().toDF("fp", "text")
    val fresh = IncrementalPipeline.streamingDedupeAgainstBase(df, base, "fp")
    val q = fresh.writeStream
      .format("memory").queryName("base_dedupe_out")
      .outputMode(OutputMode.Append).start()
    input.addData(("fp_a", "known doc"), ("fp_c", "new doc"))
    q.processAllAvailable()
    input.addData(("fp_b", "known doc 2"), ("fp_d", "new doc 2"))
    q.processAllAvailable()
    val rows = spark.sql("SELECT fp FROM base_dedupe_out")
      .as[String].collect().sorted.toSeq
    q.stop()
    // only content absent from the base survives to ingestion
    assert(rows == Seq("fp_c", "fp_d"))
  }

  test("dedupeWithinWatermark collapses re-stamped replays; plain dedupe can't") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val df = input.toDF().toDF("user_id", "name", "ts")
    val deduped = IncrementalPipeline.streamingDedupeWithinWatermark(
      df, Seq("user_id"), "ts", "1 hour")
    val q = deduped.writeStream
      .format("memory").queryName("dedupe_wm_out")
      .outputMode(OutputMode.Append).start()
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2026-01-01 00:00:07")
    input.addData((1L, "alice", t0), (2L, "bob", t0))
    q.processAllAvailable()
    // user 1 re-delivered with a RE-STAMPED event time: key-only dedupe
    // must drop it (the (key, ts) variant would emit it again)
    input.addData((1L, "alice", t1), (3L, "carol", t0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT user_id FROM dedupe_wm_out")
      .as[Long].collect().sorted.toSeq
    q.stop()
    assert(rows == Seq(1L, 2L, 3L))
  }

  test("session windows merge gap-close events and close on watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s"2026-01-01 $s")
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val df = input.toDF().toDF("user_id", "ts")
    val sessions = IncrementalPipeline.sessionCounts(
      df, "ts", "user_id", gap = "5 minutes", watermark = "0 seconds")
    val q = sessions.writeStream
      .format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    // user 1: two events 2 min apart (one session), then a 10-min gap
    // (new session). user 2: one event.
    input.addData(
      (1L, ts("00:00:00")), (1L, ts("00:02:00")), (1L, ts("00:12:00")),
      (2L, ts("00:01:00")))
    q.processAllAvailable()
    // advance the watermark far past every session end so they all close
    input.addData((9L, ts("03:00:00")))
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT user_id, session_start, n_events FROM sess_out")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString.substring(11, 16),
        r.getLong(2)))
      .toSet
    q.stop()
    assert(rows == Set(
      (1L, "00:00", 2L),   // 00:00 + 00:02 merged (2-min gap < 5)
      (1L, "00:12", 1L),   // 10-min gap opened a new session
      (2L, "00:01", 1L)))
  }

  test("windowed counts aggregate a replayed batch exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val counts = IncrementalPipeline.windowedCounts(
      df, "ts", "10 minutes", "10 minutes", "1 hour")
    val q = counts.writeStream
      .format("memory").queryName("win_out")
      .outputMode(OutputMode.Complete).start()
    val t = java.sql.Timestamp.valueOf("2026-01-01 00:05:00")
    input.addData((t, "click", 1.0), (t, "click", 2.0), (t, "view", 5.0))
    q.processAllAvailable()
    val out = spark.sql("SELECT event_type, n, total_value FROM win_out")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    q.stop()
    assert(out == Set(("click", 2L, 3.0), ("view", 1L, 5.0)))
  }

  test("SLIDING windowed counts assign one event to every overlapping frame") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    // 10-minute windows sliding every 5: an event at 00:07 lands in
    // [00:00,00:10) AND [00:05,00:15).
    val counts = IncrementalPipeline.windowedCounts(
      df, "ts", "10 minutes", "5 minutes", "1 hour")
    val q = counts.writeStream
      .format("memory").queryName("win_slide_out")
      .outputMode(OutputMode.Complete).start()
    input.addData((java.sql.Timestamp.valueOf("2026-01-01 00:07:00"), "click", 1.0))
    q.processAllAvailable()
    val out = spark.sql("SELECT window.start, n FROM win_slide_out")
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSet
    q.stop()
    assert(out == Set(
      ("2026-01-01 00:00:00.0", 1L), ("2026-01-01 00:05:00.0", 1L)))
  }

  test("streaming merge sink upserts each micro-batch; replays converge") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_stream_merge").toString
    val input = MemoryStream[(Long, String, String)]
    val df = input.toDF().toDF("user_id", "login", "gen")
    // AvailableNow would terminate on the initially-empty MemoryStream;
    // drive the micro-batches explicitly instead
    val q = IncrementalPipeline
      .toMergeSink(df, s"$dir/users", s"$dir/ckpt", Seq("user_id"),
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    input.addData((1L, "alice", "b1"), (2L, "bob", "b1"))
    q.processAllAvailable()
    // batch 2: updates key 2, adds key 3, replays key 1 unchanged
    input.addData((2L, "bob", "b2"), (3L, "carol", "b2"), (1L, "alice", "b1"))
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(s"$dir/users").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(out == Set((1L, "alice", "b1"), (2L, "bob", "b2"),
      (3L, "carol", "b2")))
  }

  test("streaming SCD2 sink versions the dimension across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_scd2").toString
    val input = MemoryStream[(Long, String, Long)]
    val df = input.toDF().toDF("id", "v", "ord")
    val ts = (batchId: Long) =>
      java.sql.Timestamp.valueOf(s"2026-01-0${batchId + 1} 00:00:00")
    val q = IncrementalPipeline
      .toScd2Sink(df, s"$dir/dim", s"$dir/ckpt", Seq("id"), Seq("v"), ts,
        ordinalCol = Some("ord"),
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    // batch 0: two keys; key 1 arrives twice — keep-last on the ordinal
    input.addData((1L, "stale", 1L), (1L, "a", 2L), (2L, "b", 3L))
    q.processAllAvailable()
    // batch 1: key 1 changes (close + reopen), key 2 replays unchanged
    // (no-op), key 3 is new
    input.addData((1L, "A", 4L), (2L, "b", 5L), (3L, "c", 6L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(s"$dir/dim")
      .select(col("id"), col("v"), col("valid_from").cast("string"),
        col("valid_to").cast("string"))
      .as[(Long, String, String, Option[String])].collect().toSet
    val t1 = "2026-01-01 00:00:00"
    val t2 = "2026-01-02 00:00:00"
    assert(rows == Set(
      (1L, "a", t1, Some(t2)), // closed at batch-1 effective ts
      (1L, "A", t2, None),     // reopened generation
      (2L, "b", t1, None),     // unchanged replay never grows history
      (3L, "c", t2, None)))    // appended new key
    // one rotation generation retained (batch-0 dim: keys 1 and 2 open)
    assert(spark.read.parquet(s"$dir/dim_backup").count() == 2)

    // --- crash-window recovery: the swap is write staged -> rotate
    // (dim -> dim_backup) -> rename(staged -> dim). Simulate a death
    // between rotate and rename: current generation gone, backup intact.
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    hfs.delete(new org.apache.hadoop.fs.Path(s"$dir/dim_backup"), true)
    hfs.rename(new org.apache.hadoop.fs.Path(s"$dir/dim"),
      new org.apache.hadoop.fs.Path(s"$dir/dim_backup"))
    // recovery pass delivers one change (key 2 -> b2) at t3; without
    // backup recovery the sink would silently reinitialize from this
    // batch alone, losing all closed history and keys 1 and 3
    val input2 = MemoryStream[(Long, String, Long)]
    val ts3 = (_: Long) => java.sql.Timestamp.valueOf("2026-01-03 00:00:00")
    val q2 = IncrementalPipeline
      .toScd2Sink(input2.toDF().toDF("id", "v", "ord"),
        s"$dir/dim", s"$dir/ckpt2", Seq("id"), Seq("v"), ts3,
        ordinalCol = Some("ord"),
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    input2.addData((2L, "b2", 7L))
    q2.processAllAvailable()
    q2.stop()
    val t3 = "2026-01-03 00:00:00"
    val recovered = spark.read.parquet(s"$dir/dim")
      .select(col("id"), col("v"), col("valid_from").cast("string"),
        col("valid_to").cast("string"))
      .as[(Long, String, String, Option[String])].collect().toSet
    assert(recovered == Set(
      (1L, "a", t1, Some(t2)), // closed history survived the crash window
      (1L, "A", t2, None),
      (2L, "b", t1, Some(t3)), // closed by the recovery batch
      (2L, "b2", t3, None),
      (3L, "c", t2, None)))
  }

  test("stream-stream interval join matches within tolerance, bounded state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, String)]
    val clicks = MemoryStream[(Long, String)]
    val impDf = imps.toDF().toDF("ad_id", "ts")
      .select(col("ad_id"), col("ts").cast("timestamp").as("imp_time"))
    val clickDf = clicks.toDF().toDF("ad_id", "ts")
      .select(col("ad_id"), col("ts").cast("timestamp").as("click_time"))
    val joined = IncrementalPipeline.intervalJoin(
      clickDf, "click_time", impDf, "imp_time",
      "ad_id", "10 MINUTES", "30 minutes")
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    imps.addData((1L, "2026-01-01 10:00:00"), (2L, "2026-01-01 10:00:00"))
    clicks.addData(
      (1L, "2026-01-01 10:05:00"), // within 10 min of ad 1's impression
      (1L, "2026-01-01 11:00:00"), // too late: outside the interval
      (3L, "2026-01-01 10:05:00")) // no impression at all
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("attrib")
      .select(col("ad_id"), col("click_time").cast("string"),
        col("imp_time").cast("string"))
      .as[(Long, String, String)].collect().toSet
    assert(rows == Set(
      (1L, "2026-01-01 10:05:00", "2026-01-01 10:00:00")))

    // the common naming collision — BOTH streams call their event time
    // "ts" — must resolve, and the colliding right column must come out
    // renamed (right_ts) so downstream select-by-name stays unambiguous
    val imps2 = MemoryStream[(Long, String)]
    val clicks2 = MemoryStream[(Long, String)]
    def ts(df: org.apache.spark.sql.DataFrame) = df.toDF("ad_id", "s")
      .select(col("ad_id"), col("s").cast("timestamp").as("ts"))
    val joined2 = IncrementalPipeline.intervalJoin(
      ts(clicks2.toDF()), "ts", ts(imps2.toDF()), "ts",
      "ad_id", "10 MINUTES", "30 minutes")
    assert(joined2.columns.toSeq == Seq("ad_id", "ts", "right_ts"))
    val q2 = joined2.writeStream.format("memory").queryName("attrib2")
      .outputMode("append").start()
    imps2.addData((7L, "2026-01-01 10:00:00"))
    clicks2.addData((7L, "2026-01-01 10:01:00"))
    q2.processAllAvailable()
    q2.stop()
    val row2 = spark.table("attrib2")
      .select(col("ad_id"), col("ts").cast("string"),
        col("right_ts").cast("string")) // select-by-name must not throw
      .as[(Long, String, String)].collect().toSet
    assert(row2 == Set((7L, "2026-01-01 10:01:00", "2026-01-01 10:00:00")))
  }

  test("file-source stream processes a raw directory as micro-batches") {
    val dir = Files.createTempDirectory("graft_stream").toString
    val out = Files.createTempDirectory("graft_stream_out").toString
    val cp = Files.createTempDirectory("graft_stream_cp").toString
    Files.writeString(java.nio.file.Path.of(dir, "batch1.json"),
      """[{"name": "main", "protected": true,
        |  "repo_name": "r1", "commit": {"sha": "a", "url": "u"}}]""".stripMargin)
    val stream = IncrementalPipeline.rawStream(
      spark, dir, graft.pipeline.Schemas.branchesRaw)
    val q = IncrementalPipeline
      .toParquetSink(stream.select("name", "repo_name"), out, cp).start()
    q.processAllAvailable()
    q.stop()
    assert(spark.read.parquet(out).count() == 1)
  }

  test("crash recovery: restart from checkpoint is exactly-once and byte-stable") {
    val dir = Files.createTempDirectory("graft_crash_src").toString
    val out = Files.createTempDirectory("graft_crash_out").toString
    val cp = Files.createTempDirectory("graft_crash_cp").toString
    def branch(name: String, repo: String): String =
      s"""{"name": "$name", "protected": false,
         |  "repo_name": "$repo", "commit": {"sha": "s", "url": "u"}}""".stripMargin
    def runOnce(): Unit = {
      // a fresh query object each time — only the checkpoint carries state,
      // exactly like a new driver process after a crash
      val q = IncrementalPipeline.toParquetSink(
        IncrementalPipeline
          .rawStream(spark, dir, graft.pipeline.Schemas.branchesRaw)
          .select("name", "repo_name"),
        out, cp).start()
      q.processAllAvailable()
      q.stop()
    }
    def rows(): Seq[(String, String)] =
      spark.read.parquet(out).select("name", "repo_name")
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    // every file under out/ (data AND _spark_metadata commit log) by hash —
    // "byte-identical" means the restart may not rewrite or duplicate any
    def fingerprint(): Map[String, String] = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      def walk(p: java.io.File): Seq[java.io.File] =
        if (p.isDirectory) p.listFiles().toSeq.flatMap(walk) else Seq(p)
      walk(new java.io.File(out))
        .filterNot(_.getName.startsWith(".")) // in-progress CRC/temp files
        .map { f =>
          f.getPath -> md.digest(Files.readAllBytes(f.toPath))
            .map("%02x".format(_)).mkString
        }.toMap
    }

    Files.writeString(java.nio.file.Path.of(dir, "b1.json"),
      s"[${branch("main", "r1")}, ${branch("dev", "r1")}]")
    runOnce() // batch 1 commits, then the query "crashes" (stops)
    assert(rows() == Seq(("dev", "r1"), ("main", "r1")))

    // data lands while the pipeline is down; b1.json is still in the
    // source directory — a re-scan would double it
    Files.writeString(java.nio.file.Path.of(dir, "b2.json"),
      s"[${branch("main", "r2")}]")
    runOnce() // restart from checkpoint: must process ONLY b2
    assert(rows() == Seq(("dev", "r1"), ("main", "r1"), ("main", "r2")),
      "restart reprocessed a committed batch or dropped the crash-window file")

    // idle restart: no new input -> the sink must not rewrite a byte
    val fp = fingerprint()
    runOnce()
    assert(fingerprint() == fp, "idle restart mutated the committed output")
    assert(rows() == Seq(("dev", "r1"), ("main", "r1"), ("main", "r2")))
  }

  test("composed incremental-dedup ingest loop: 3 micro-batches ≡ sequential full recompute; replay converges") {
    import graft.ops.{DedupOps, GraphOps, IncrementalOps}
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_inc_e2e").toString

    // 20-token docs sharing a 19-token family stem: same-family Jaccard
    // = 17/19 ≈ 0.89 ≥ 0.8, cross-family 0
    def doc(family: String, id: Long): (Long, String) =
      (id, (0 until 19).map(i => s"$family$i").mkString(" ") + s" tail$id")
    val b0 = Seq(doc("a", 0), doc("a", 2), doc("b", 10), doc("c", 12))
    val b1 = Seq(doc("a", 1), doc("b", 11), doc("d", 20))
    // doc 5 joins family b with an id BELOW the sitting representative
    // 10 — the representative-flip case; doc 12 is a re-ingest the
    // corpus front door must drop
    val b2 = Seq(doc("b", 5), doc("a", 3), doc("c", 12))

    val input = MemoryStream[(Long, String)]
    val ts = (batchId: Long) =>
      java.sql.Timestamp.valueOf(s"2026-01-0${batchId + 1} 00:00:00")
    val q = IncrementalPipeline
      .toIncrementalDedupSink(input.toDF().toDF("id", "text"), "id", "text",
        s"$dir/state", s"$dir/ckpt", k = 3, threshold = 0.8, ts,
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    for (b <- Seq(b0, b1, b2)) { input.addData(b: _*); q.processAllAvailable() }
    q.stop()

    // the batch-gate equivalent: per batch, labels recomputed FROM
    // SCRATCH over the cumulative corpus, folded through the same SCD2
    def fullState(docs: Seq[(Long, String)]) = {
      val df = docs.toDF("id", "text")
      val labels = GraphOps.withSingletons(
        GraphOps.connectedComponents(
          DedupOps.ngramJaccardPairs(df, "id", "text", k = 3,
            threshold = 0.8).select("a", "b"), "a", "b"),
        df, "id")
      labels.select(col("id").as("doc_id"), col("component"),
        (col("id") === col("component")).cast("int").as("kept"))
    }
    var expected = fullState(b0)
      .withColumn("valid_from", lit(ts(0))).withColumn("valid_to",
        lit(null).cast("timestamp"))
    for ((b, i) <- Seq(b1, b2).zipWithIndex)
      expected = IncrementalOps.scdType2Apply(expected,
        fullState((Seq(b0, b1, b2).take(i + 2)).flatten.distinct),
        Seq("doc_id"), Seq("component", "kept"), lit(ts(i + 1)))

    def dimRows(): Set[(Long, Long, Int, String, Option[String])] =
      spark.read.parquet(s"$dir/state/dim")
        .select(col("doc_id"), col("component"), col("kept"),
          col("valid_from").cast("string"), col("valid_to").cast("string"))
        .as[(Long, Long, Int, String, Option[String])].collect().toSet
    val got = dimRows()
    val exp = expected
      .select(col("doc_id"), col("component"), col("kept"),
        col("valid_from").cast("string"), col("valid_to").cast("string"))
      .as[(Long, Long, Int, String, Option[String])].collect().toSet
    assert(got == exp, "streamed-incremental dim diverged from sequential full recompute")
    // spot-check the interesting histories: doc 10's representative flip
    // closed its open row at t3 and reopened under component 5, kept 0
    val t1 = "2026-01-01 00:00:00"; val t3 = "2026-01-03 00:00:00"
    assert(got.contains((10L, 10L, 1, t1, Some(t3))))
    assert(got.contains((10L, 5L, 0, t3, None)))
    assert(got.contains((12L, 12L, 1, t1, None)), "re-ingest grew history")

    // crash-recovery replay: batch 2 re-delivered on a fresh checkpoint
    // — the corpus front door drops every doc, the loop no-ops, and all
    // three state artifacts stay IDENTICAL
    def labelRows() = spark.read.parquet(s"$dir/state/labels")
      .as[(Long, Long)].collect().toSet
    def corpusRows() = spark.read.parquet(s"$dir/state/corpus")
      .as[(Long, String)].collect().toSet
    val (d0, l0, c0) = (dimRows(), labelRows(), corpusRows())
    val input2 = MemoryStream[(Long, String)]
    val q2 = IncrementalPipeline
      .toIncrementalDedupSink(input2.toDF().toDF("id", "text"), "id", "text",
        s"$dir/state", s"$dir/ckpt2", k = 3, threshold = 0.8,
        _ => java.sql.Timestamp.valueOf("2026-01-09 00:00:00"),
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    input2.addData(b2: _*)
    q2.processAllAvailable()
    q2.stop()
    assert(dimRows() == d0, "replayed batch forked the dimension")
    assert(labelRows() == l0 && corpusRows() == c0,
      "replayed batch forked labels or corpus")
  }
}
