package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column <-> Expression converters —
  * the standard pattern for libraries that ship native Catalyst
  * expressions (Spark's own connectors do the same). */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Catalyst statistics from a FRESH QueryExecution over the frame's
    * logical plan. `df.queryExecution...stats` memoizes per plan
    * instance, so a Dataset whose stats were first read before its
    * cache materialized reports the pre-materialization ESTIMATE
    * forever (for a range-derived text frame that can be ~15× under
    * actual bytes — string columns estimate at default width). A fresh
    * execution re-runs cache substitution, so a materialized
    * InMemoryRelation reports its ACTUAL built size. Plan-only
    * (driver-side optimizer pass, no job). */
  def freshOptimizedStats(
      df: Dataset[_]): catalyst.plans.logical.Statistics = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    spark.sessionState.executePlan(df.queryExecution.logical)
      .optimizedPlan.stats
  }
}
