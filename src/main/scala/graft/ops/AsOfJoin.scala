package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * `rightTime <= leftTime` on the same key — the standard event/state
  * alignment operator Spark lacks natively.
  *
  * Implemented as union + one ordered window per key (the linear plan):
  * both sides land in a single shuffle keyed by the join key, sorted by
  * (time, side) with right rows first at equal timestamps, and one
  * last-non-null window over a presence STRUCT carries the newest right
  * payload forward to the left rows it covers (struct non-nullness marks
  * "a right row", so NULL payload values propagate correctly). Cost is one shuffle + one sort — never a range cross
  * join, and skew maps to key skew (saltable). This is preference-order
  * (a) from the build rules: composed from built-ins because the
  * semantics fit exactly; no custom SparkPlan needed. */
object AsOfJoin {

  /** @param left      left (probe) side
    * @param right     right (state) side; should be unique per (key, time)
    *                  — pre-aggregate if not, or ties resolve arbitrarily
    * @param key       equi-join key column present on both sides
    * @param leftTime  event-time column on the left
    * @param rightTime event-time column on the right
    * @param payload   right-side columns to carry (renamed as given)
    */
  def asOf(
      left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      payload: Seq[(String, String)]): DataFrame =
    asOfImpl(left, right, key, leftTime, rightTime, payload,
      forward = false)

  /** Forward as-of: for each left row, the EARLIEST right row with
    * `rightTime >= leftTime` on the same key — the mirror of [[asOf]]
    * (next state change, time-to-next-event, response attribution).
    * Same single-shuffle union + one ordered window plan; only the
    * carry direction flips (first-non-null over the FOLLOWING frame,
    * with right rows ordered after left rows at equal timestamps so
    * ">=" stays inclusive). */
  def asOfForward(
      left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      payload: Seq[(String, String)]): DataFrame =
    asOfImpl(left, right, key, leftTime, rightTime, payload,
      forward = true)

  private def asOfImpl(
      left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      payload: Seq[(String, String)], forward: Boolean): DataFrame = {

    val leftCols = left.columns
    // ALL payload columns ride in ONE struct whose non-nullness marks "a
    // right row": last(_, ignoreNulls) must skip only the left rows' empty
    // slots, never a right row whose payload VALUE is legitimately NULL —
    // per-column ignoreNulls would carry a stale older value over the
    // newest (NULL-valued) state.
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map { case (from, to) =>
        org.apache.spark.sql.types.StructField(
          to, right.schema(from).dataType, nullable = true)
      })
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_p", lit(null).cast(payloadType))
    val r0 = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .withColumn("_p",
        struct(payload.map { case (from, to) => col(from).as(to) }: _*))
    // align schemas: right gets null left cols
    val rAligned = leftCols.foldLeft(r0) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    val unionCols = ((leftCols.toSeq :+ key).distinct ++ Seq("_t", "_side", "_p")).distinct
    val unioned = l.select(unionCols.map(col): _*)
      .unionByName(rAligned.select(unionCols.map(col): _*))

    // Backward: right rows sort BEFORE left rows at equal time and the
    // newest prior payload carries forward ("<=" inclusive). Forward:
    // right rows sort AFTER left rows at equal time and the earliest
    // following payload carries back (">=" inclusive).
    val carried =
      if (forward) {
        val w = Window.partitionBy(key)
          .orderBy(col("_t").asc, col("_side").desc)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        unioned.withColumn("_c",
          first(col("_p"), ignoreNulls = true).over(w))
      } else {
        val w = Window.partitionBy(key)
          .orderBy(col("_t").asc, col("_side").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        unioned.withColumn("_c",
          last(col("_p"), ignoreNulls = true).over(w))
      }

    carried.filter(col("_side") === 1)
      .select(leftCols.toSeq.map(col) ++
        payload.map { case (_, to) => col(s"_c.$to").as(to) }: _*)
  }
}
