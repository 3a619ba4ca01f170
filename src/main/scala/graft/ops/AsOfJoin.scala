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
  * (time, side) with right rows first at equal timestamps, and a
  * last-non-null window carries each right payload forward to the left
  * rows it covers. Cost is one shuffle + one sort — never a range cross
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
      payload: Seq[(String, String)]): DataFrame = {

    val leftCols = left.columns
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
    val r0 = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
    // align schemas: left gets null payload slots, right gets null left cols
    val lAligned = payload.foldLeft(l) { case (df, (from, to)) =>
      val _ = from
      df.withColumn(s"_p_$to", lit(null).cast(right.schema(from).dataType))
    }
    val rAligned = leftCols.foldLeft(
      payload.foldLeft(r0) { case (df, (from, to)) =>
        df.withColumn(s"_p_$to", col(from))
      }) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    val unionCols = (leftCols.toSeq :+ key).distinct ++
      Seq("_t", "_side") ++ payload.map { case (_, to) => s"_p_$to" }
    val unioned = lAligned.select(unionCols.distinct.map(col): _*)
      .unionByName(rAligned.select(unionCols.distinct.map(col): _*))

    // right rows sort before left rows at equal time => "<=" semantics
    val w = Window.partitionBy(key).orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned) { case (df, (_, to)) =>
      df.withColumn(s"_c_$to", last(col(s"_p_$to"), ignoreNulls = true).over(w))
    }

    val out = carried.filter(col("_side") === 1)
    payload.foldLeft(out) { case (df, (_, to)) =>
      df.withColumn(to, col(s"_c_$to"))
    }.select((leftCols.toSeq ++ payload.map(_._2)).map(col): _*)
  }
}
