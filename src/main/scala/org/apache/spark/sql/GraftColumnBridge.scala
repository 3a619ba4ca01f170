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

  /** CAP the `originStats` a checkpointed Dataset's `LogicalRDD` leaf
    * carries (Spark copies the pre-checkpoint plan's estimated stats onto
    * the leaf). For a SELF-REFERENCING iteration — every graft fixpoint:
    * round r's plan joins round r−1's pinned frame against itself, so the
    * size-only stats visitor multiplies the leaf estimate by itself —
    * uncapped origin stats make `sizeInBytes` SQUARE per round: with a
    * Long.MaxValue-seeded estimate that is 10^(19·2^r), the optimizer's
    * BigInt math slows exponentially (driver-side, per round) and
    * `java.math.BigInteger` hard-overflows near round 25 — found by the
    * diameter-1200 SCC spec, whose ~22 shortcutted label rounds plus peel
    * joins crossed it. Capping at each pin kills the compounding (the
    * within-round product is bounded by cap², reset at the next pin)
    * while a genuinely small pinned frame KEEPS its realistic estimate —
    * stripping stats entirely was measured to cost hitsUnits 4× at 500k
    * (the half-round node⋈raw joins fell from broadcast-hash to
    * sort-merge once the pinned side estimated at the Long.Max default).
    * No-op for non-LogicalRDD plans and for estimates under the cap. */
  private val StatsCap = BigInt(1) << 60
  def withCappedOriginStats(df: Dataset[Row]): Dataset[Row] = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    cdf.queryExecution.logical match {
      case l: execution.LogicalRDD =>
        // `originStats` has no public accessor; `l.stats` IS what the
        // planner reads off this leaf (origin stats when present, the
        // session default otherwise), so cap that and re-seat it.
        val s = l.stats
        if (s.sizeInBytes <= StatsCap && s.rowCount.forall(_ <= StatsCap)) df
        else classic.Dataset.ofRows(cdf.sparkSession,
          new execution.LogicalRDD(l.output, l.rdd, l.outputPartitioning,
            l.outputOrdering, l.isStreaming, l.stream)(
            cdf.sparkSession,
            Some(catalyst.plans.logical.Statistics(
              sizeInBytes = s.sizeInBytes.min(StatsCap),
              rowCount = s.rowCount.map(_.min(StatsCap)),
              attributeStats = s.attributeStats,
              isRuntime = s.isRuntime)),
            // keep the origin-derived constraints (inferred not-null /
            // filter facts) the pinned leaf already carries — dropping
            // them to None would trade the stats fix for a plan-quality
            // regression on every capped fixpoint frame
            Some(l.constraints)))
      case _ => df
    }
  }
}
