package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Skew-safe aggregation: two-phase salted groupBy. Phase one groups by
  * (key, salt) so a hot key's rows spread over `buckets` reducers; phase
  * two combines the partial aggregates per key. Counts and DECIMAL sums
  * re-associate exactly, so the result is identical to the direct
  * groupBy — asserted by the shared oracle. AQE's skew handling covers
  * joins; aggregate skew on a pathological key still wants the explicit
  * salt at 100 TB.
  *
  * The salt is a CONTENT hash of the whole row, never
  * `spark_partition_id`/`monotonically_increasing_id`: those change when
  * a lost map task recomputes after a fetch failure, silently moving rows
  * between already-fetched reduce partitions (double-counted or dropped
  * rows — the classic nondeterministic-shuffle-key bug). The trade-off is
  * that bit-identical duplicate rows share a salt bucket; when the data
  * carries a stable unique id, pass it as `saltCols` and the salt hashes
  * THAT instead, spreading even identical-content rows. Without one, a
  * corpus whose hot key is millions of IDENTICAL rows should exact-dedup
  * (or count-compress) first, which is the cheaper plan anyway. */
object SkewOps {

  /** Deterministic per-row salt, stable across retries, repartitioning,
    * and re-runs: hash of `saltCols` when given (a stable unique id
    * spreads bit-identical duplicate rows too), else of every column. */
  private[ops] def contentSalt(
      df: DataFrame, buckets: Int, saltCols: Seq[String]): Column = {
    val basis = if (saltCols.nonEmpty) saltCols else df.columns.toSeq
    pmod(xxhash64(basis.map(col): _*), lit(buckets.toLong))
  }

  def saltedCountSum(
      df: DataFrame, key: String, valueCol: String,
      buckets: Int = 16, saltCols: Seq[String] = Nil): DataFrame = {
    val salted = df.withColumn("_salt", contentSalt(df, buckets, saltCols))
    val partial = salted
      .groupBy(col(key), col("_salt"))
      .agg(
        count(lit(1)).as("_n"),
        sum(col(valueCol).cast(DecimalType(18, 4))).as("_s"))
    partial
      .groupBy(col(key))
      .agg(
        sum(col("_n")).as("n_rows"),
        sum(col("_s")).cast(DoubleType).as("total_value"))
  }

  /** Salted join for a skewed key: replicate the small side `buckets`
    * times, salt the big side, join on (key, salt). */
  def saltedJoin(
      big: DataFrame, small: DataFrame, key: String,
      buckets: Int = 16, saltCols: Seq[String] = Nil): DataFrame = {
    val bigSalted = big.withColumn("_salt", contentSalt(big, buckets, saltCols))
    val smallReplicated = small
      .withColumn("_salt", explode(sequence(lit(0L), lit(buckets - 1L))))
    bigSalted.join(smallReplicated, Seq(key, "_salt")).drop("_salt")
  }
}
