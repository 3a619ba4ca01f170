package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle over the same
  * parquet tables. Column names/order and row order must agree between
  * the two — the driver hash-compares values after sorting columns by
  * name, and every query here also fixes a deterministic ORDER BY so the
  * compare is stable regardless of hash granularity.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object Registry {
  /** All registered queries, contributed per module. */
  def all: Seq[Q] =
    queries.RelationalQueries.all ++
      queries.PipelineQueries.all ++
      queries.DedupQueries.all ++
      queries.SimilarityQueries.all ++
      queries.TextQueries.all ++
      queries.MultimodalQueries.all ++
      queries.AdvancedQueries.all ++
      queries.AnalyticsQueries.all ++
      queries.BehaviorQueries.all ++
      queries.CorpusQueries.all ++
      queries.GraphQueries.all ++
      queries.IncrementalQueries.all ++
      queries.SketchQueries.all ++
      queries.LayoutQueries.all ++
      queries.ProfilingQueries.all ++
      queries.LinkageQueries.all ++
      queries.EvalQueries.all

  def queryMap: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleMap: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

/** Table loader for the driver testdata layout: `<dir>/<name>.parquet`.
  *
  * Loaded relations are memoized per (session, dir, table). Re-planning a
  * fresh `spark.read.parquet` for every query would re-list files and —
  * worse — re-broadcast a `SerializableConfiguration` per scan, whose Java
  * serialization gzips every Hadoop conf entry (thousands of short-lived
  * `Deflater` Cleaner registrations per query). Reusing the analyzed
  * relation keeps one scan node per table per session, exactly as a
  * long-lived service or notebook session would on a real cluster.
  */
object T {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def apply(s: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent((s, dir, name), { case (s, dir, name) =>
      if (name == "events") loadEvents(s, dir)
      else s.read.parquet(s"$dir/$name.parquet")
    })

  /** Driver-generated `events.parquet` files have carried `ts` in three
    * physical encodings across testdata generations: TIMESTAMP(NANOS)
    * (which Spark 4 rejects outright without `nanosAsLong`),
    * TIMESTAMP(MICROS) tz-naive (which Spark 4 infers as TIMESTAMP_NTZ),
    * and plain instant timestamps. Normalize all three to a session-tz
    * TimestampType — every query and every DuckDB oracle treats `ts` as
    * a UTC instant, and Verify/Bench pin the session timezone to UTC, so
    * NTZ→LTZ cast and nanos÷1000 both reproduce identical instants.
    */
  private def loadEvents(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType => // nanos surfaced as raw INT64: lossless for this data
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000L")))
      case TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(TimestampType))
      case _ => raw
    }
  }
}
