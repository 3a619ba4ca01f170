package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** CDC snapshot diff + Type-2 SCD semantics: null-safe change detection,
  * immutable closed history, and batch-re-delivery idempotence. */
class IncrementalOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("snapshotDiff classifies insert/update/delete, null-safely") {
    val oldSnap = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, Option.empty[String]),
      (4L, Some("d"))
    ).toDF("id", "v")
    val newSnap = Seq(
      (1L, Some("a")),            // unchanged → dropped
      (2L, Option.empty[String]), // b → NULL must be an update
      (3L, Some("c")),            // NULL → c must be an update
      (5L, Some("e"))             // insert; 4 deleted
    ).toDF("id", "v")
    val got = IncrementalOps
      .snapshotDiff(oldSnap, newSnap, Seq("id"), Seq("v"))
      .select("id", "change_type").as[(Long, String)].collect().toMap
    assert(got == Map(2L -> "update", 3L -> "update",
      4L -> "delete", 5L -> "insert"))
    val withU = IncrementalOps
      .snapshotDiff(oldSnap, newSnap, Seq("id"), Seq("v"), keepUnchanged = true)
      .select("id", "change_type").as[(Long, String)].collect().toMap
    assert(withU(1L) == "unchanged" && withU.size == 5)
  }

  test("scdType2Apply: close-and-reopen, append, no-op, history immutable") {
    val t0 = "2024-01-01 00:00:00"
    val t1 = "2025-01-01 00:00:00"
    val dim = Seq(
      (1L, "a", Some(t0), Option.empty[String]), // will change
      (2L, "b", Some(t0), Option.empty[String]), // batch equal → no-op
      (3L, "c", Some(t0), Option.empty[String]), // not in batch → untouched
      (1L, "a0", Some("2023-01-01 00:00:00"), Some(t0)) // closed history
    ).toDF("id", "v", "valid_from", "valid_to")
      .select(col("id"), col("v"), col("valid_from").cast("timestamp"),
        col("valid_to").cast("timestamp"))
    val batch = Seq((1L, "A"), (2L, "b"), (9L, "z")).toDF("id", "v")
    val out = IncrementalOps.scdType2Apply(
      dim, batch, Seq("id"), Seq("v"), lit(t1).cast("timestamp"))
    val rows = out
      .select(col("id"), col("v"), col("valid_from").cast("string"),
        col("valid_to").cast("string"))
      .as[(Long, String, String, Option[String])].collect().toSet
    assert(rows == Set(
      (1L, "a0", "2023-01-01 00:00:00", Some(t0)), // untouched closed row
      (1L, "a", t0, Some(t1)),                     // closed at effective ts
      (1L, "A", t1, None),                         // reopened from batch
      (2L, "b", t0, None),                         // equal batch → no-op
      (3L, "c", t0, None),                         // unseen key → untouched
      (9L, "z", t1, None)))                        // new key appended

    // idempotence: re-applying the same batch must not grow history
    val again = IncrementalOps.scdType2Apply(
      out, batch, Seq("id"), Seq("v"), lit(t1).cast("timestamp"))
    assert(again.count() == out.count(),
      "re-delivered batch must be a no-op on an up-to-date dimension")
  }

  test("reconstruction: applying the diff to the old snapshot yields the new one") {
    // 200 random-ish keys; new snapshot deletes %5, mutates %3, inserts 50
    val oldSnap = (0 until 200).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val newSnap = ((0 until 200).filter(_ % 5 != 0)
      .map(i => (i.toLong, if (i % 3 == 0) s"V$i" else s"v$i")) ++
      (1000 until 1050).map(i => (i.toLong, s"n$i"))).toDF("id", "v")
    val diff = IncrementalOps.snapshotDiff(oldSnap, newSnap, Seq("id"), Seq("v"))
    // apply: drop deleted+updated keys from old, add back new values
    val changedKeys = diff.filter(col("change_type") =!= "insert").select("id")
    val rebuilt = oldSnap.join(changedKeys, Seq("id"), "left_anti")
      .unionByName(diff.filter(col("change_type") =!= "delete")
        .select(col("id"), col("new_v").as("v")))
    assert(rebuilt.as[(Long, String)].collect().toSet ==
      newSnap.as[(Long, String)].collect().toSet,
      "old + diff must reconstruct new exactly — the CDC contract")
  }

  test("edge inputs: empty snapshots and empty batches degrade to identity") {
    val schema = "id BIGINT, v STRING"
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(schema))
    val some = Seq((1L, "a")).toDF("id", "v")
    // empty old → everything is an insert; empty new → everything deleted
    assert(IncrementalOps.snapshotDiff(empty, some, Seq("id"), Seq("v"))
      .select("change_type").as[String].collect().toSeq == Seq("insert"))
    assert(IncrementalOps.snapshotDiff(some, empty, Seq("id"), Seq("v"))
      .select("change_type").as[String].collect().toSeq == Seq("delete"))
    assert(IncrementalOps.snapshotDiff(empty, empty, Seq("id"), Seq("v"))
      .count() == 0)
    // empty batch leaves a dimension untouched
    val dim = Seq((1L, "a", "2024-01-01 00:00:00", null: String))
      .toDF("id", "v", "valid_from", "valid_to")
      .select(col("id"), col("v"), col("valid_from").cast("timestamp"),
        col("valid_to").cast("timestamp"))
    val out = IncrementalOps.scdType2Apply(dim, empty, Seq("id"), Seq("v"),
      lit("2025-01-01 00:00:00").cast("timestamp"))
    assert(out.collect().toSeq == dim.collect().toSeq)
  }

  test("incrementalAggUpdate: delta refresh equals full recompute, " +
      "moves dirty both groups, emptied groups vanish") {
    import spark.implicits._
    // prev: g1 = {r1, r2}, g2 = {r3}, g3 = {r4} (will be emptied), g4 = {}
    val prev = Seq(
      (1L, "g1", 10.0), (2L, "g1", 20.0), (3L, "g2", 30.0), (4L, "g3", 40.0))
      .toDF("id", "g", "v")
    // new: r2 moves g1 -> g2, r4 (all of g3) deleted, r5 arrives in new
    // group g4, r1 updates in place
    val next = Seq(
      (1L, "g1", 11.0), (2L, "g2", 20.0), (5L, "g4", 50.0))
      .toDF("id", "g", "v")
    def aggs = Seq(count(lit(1)).as("n"), sum(col("v")).as("total"))
    val prevAgg = prev.groupBy("g").agg(aggs.head, aggs.tail: _*)
    val diff = IncrementalOps.snapshotDiff(prev, next, Seq("id"), Seq("g", "v"))
    val touched = IncrementalOps.touchedGroups(diff, "g")
    // every group is dirty here (g1 update+move-out, g2 move-in, g3
    // emptied, g4 new); a second case below exercises pass-through
    assert(touched.as[String].collect().toSet == Set("g1", "g2", "g3", "g4"))
    val out = IncrementalOps
      .incrementalAggUpdate(prevAgg, next, touched, Seq("g"), aggs)
    val full = next.groupBy("g").agg(aggs.head, aggs.tail: _*)
    assert(out.collect().toSet == full.collect().toSet)
    assert(!out.select("g").as[String].collect().contains("g3"),
      "a group that lost every row must vanish")

    // untouched groups flow through from prevAgg without recompute: diff
    // against an identical snapshot touches nothing and keeps prevAgg
    val noDiff = IncrementalOps.snapshotDiff(prev, prev, Seq("id"), Seq("g", "v"))
    val none = IncrementalOps.touchedGroups(noDiff, "g")
    val same = IncrementalOps
      .incrementalAggUpdate(prevAgg, prev, none, Seq("g"), aggs)
    assert(same.collect().toSet == prevAgg.collect().toSet)
    // plan shape: pass-through is an anti join, recompute is a semi join
    val plan = same.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftAnti") && plan.contains("LeftSemi"), plan)
  }

  test("incrementalAggUpdate refreshes the NULL-valued group too") {
    import spark.implicits._
    // Spark aggregates NULL as a real group; a delta touching it must
    // refresh it (null-safe joins), and an insert's absent old side must
    // NOT be mistaken for the NULL group (change_type-based selection)
    val prev = Seq((1L, Option("g1"), 10.0), (2L, Option.empty[String], 20.0),
      (3L, Option.empty[String], 30.0)).toDF("id", "g", "v")
    // row 3 leaves the NULL group; row 4 is inserted into g2
    val next = Seq((1L, Option("g1"), 10.0), (2L, Option.empty[String], 20.0),
      (4L, Option("g2"), 40.0)).toDF("id", "g", "v")
    def aggs = Seq(count(lit(1)).as("n"), sum(col("v")).as("total"))
    val prevAgg = prev.groupBy("g").agg(aggs.head, aggs.tail: _*)
    val diff = IncrementalOps.snapshotDiff(prev, next, Seq("id"), Seq("g", "v"))
    val touched = IncrementalOps.touchedGroups(diff, "g")
    assert(touched.collect().map(r => Option(r.getString(0))).toSet ==
      Set(None, Some("g2")), "NULL group dirty, g1 untouched")
    val out = IncrementalOps
      .incrementalAggUpdate(prevAgg, next, touched, Seq("g"), aggs)
    val full = next.groupBy("g").agg(aggs.head, aggs.tail: _*)
    assert(out.collect().toSet == full.collect().toSet,
      "the NULL group's aggregate must refresh, not stay stale")
  }

  test("scd2Compact: merges adjacent identical runs, keeps gaps/changes; idempotent") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val dim = Seq(
      // key 1: three adjacent identical versions, last open → ONE open row
      (1L, "a", ts("2024-01-01 00:00:00"), ts("2024-03-01 00:00:00")),
      (1L, "a", ts("2024-03-01 00:00:00"), ts("2024-06-01 00:00:00")),
      (1L, "a", ts("2024-06-01 00:00:00"), null),
      // key 2: attribute change blocks the merge
      (2L, "x", ts("2024-01-01 00:00:00"), ts("2024-06-01 00:00:00")),
      (2L, "y", ts("2024-06-01 00:00:00"), null),
      // key 3: identical attrs but a GAP — the absence is preserved
      (3L, "g", ts("2021-01-01 00:00:00"), ts("2021-06-01 00:00:00")),
      (3L, "g", ts("2024-01-01 00:00:00"), null))
      .toDF("k", "attr", "valid_from", "valid_to")
    def run(df: org.apache.spark.sql.DataFrame) =
      IncrementalOps.scd2Compact(df, Seq("k"), Seq("attr"))
    val out = run(dim)
    val got = out
      .as[(Long, String, java.sql.Timestamp, Option[java.sql.Timestamp])]
      .collect().toSet
    assert(got == Set(
      (1L, "a", ts("2024-01-01 00:00:00"), None),
      (2L, "x", ts("2024-01-01 00:00:00"), Some(ts("2024-06-01 00:00:00"))),
      (2L, "y", ts("2024-06-01 00:00:00"), None),
      (3L, "g", ts("2021-01-01 00:00:00"), Some(ts("2021-06-01 00:00:00"))),
      (3L, "g", ts("2024-01-01 00:00:00"), None)))
    val again = run(out)
      .as[(Long, String, java.sql.Timestamp, Option[java.sql.Timestamp])]
      .collect().toSet
    assert(again == got, "compaction must be idempotent")
  }

  test("scd2Compact == scalar run-merge model on random histories") {
    import spark.implicits._
    val rnd = new scala.util.Random(2024)
    def ts(day: Int) = new java.sql.Timestamp(day.toLong * 86400000L)
    // random histories: per key, 1-6 chronological versions; each next
    // version starts AT the previous end (adjacent) or after a gap;
    // attrs drawn from a 2-letter alphabet so identical-adjacent runs
    // are common; the last version is open with probability ~1/2
    val rows = (1L to 25L).flatMap { k =>
      var day = rnd.nextInt(5)
      val n = 1 + rnd.nextInt(6)
      (1 to n).map { i =>
        val from = day
        val dur = 1 + rnd.nextInt(4)
        day = from + dur + (if (rnd.nextBoolean()) 0 else 1 + rnd.nextInt(3))
        val open = i == n && rnd.nextBoolean()
        (k, if (rnd.nextBoolean()) "a" else "b", ts(from),
          if (open) null else ts(from + dur))
      }
    }
    val dim = rows.toDF("k", "attr", "valid_from", "valid_to")
    // scalar model: sort by valid_from, merge where attrs equal AND
    // prev end == next start (an open prev can never be mid-history
    // here by construction)
    val oracle = rows.groupBy(_._1).flatMap { case (k, vs) =>
      val sorted = vs.sortBy(_._3.getTime)
      val runs = sorted.foldLeft(
        Vector.empty[(String, java.sql.Timestamp, java.sql.Timestamp)]) {
        case (acc, (_, a, f, t)) =>
          acc.lastOption match {
            case Some((pa, pf, pt)) if pa == a && pt != null && pt == f =>
              acc.init :+ ((pa, pf, t))
            case _ => acc :+ ((a, f, t))
          }
      }
      runs.map { case (a, f, t) => (k, a, f, Option(t)) }
    }.toSet
    val got = IncrementalOps.scd2Compact(dim, Seq("k"), Seq("attr"))
      .as[(Long, String, java.sql.Timestamp, Option[java.sql.Timestamp])]
      .collect().toSet
    assert(got == oracle)
  }
}
