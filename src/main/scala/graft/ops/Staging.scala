package graft.ops

import org.apache.spark.sql.DataFrame

/** The lineage-truncating stage pin every iterative/staged operator uses
  * (graph fixpoints, BPE rounds, range-staged global sums): a round's
  * output references its input more than once, so carrying logical plans
  * across rounds grows them exponentially — each round is pinned to
  * materialized blocks instead.
  *
  * Two modes, one flag:
  *  - default: `localCheckpoint(eager = true)` — executor-local blocks,
  *    no filesystem round trip; right at local[*] and for short-lived
  *    iterations, but NOT resilient to executor loss (a lost executor
  *    invalidates the blocks and kills a deep iteration).
  *  - `spark.graft.reliableCheckpoints=true` (plus a
  *    `SparkContext.setCheckpointDir`): every pin becomes a reliable
  *    `checkpoint(eager = true)` to the checkpoint filesystem — the
  *    cluster-mode hardening for long iterations on preemptible
  *    executors. Same semantics, same plan truncation; only the block
  *    durability changes, which is why the spec re-runs the iterative
  *    operators under this mode and asserts identical results.
  */
object Staging {
  val ReliableKey = "spark.graft.reliableCheckpoints"

  def pin(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val reliable = spark.conf.getOption(ReliableKey).exists(_.toBoolean)
    if (reliable) {
      require(spark.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableKey=true requires SparkContext.setCheckpointDir " +
          "(the reliable checkpoint filesystem)")
      df.checkpoint(true)
    } else df.localCheckpoint(true)
  }

  /** `df.stagePin()` — drop-in for `df.localCheckpoint(true)` honoring
    * the reliable-checkpoint flag. */
  implicit class StagedDf(private val df: DataFrame) extends AnyVal {
    def stagePin(): DataFrame = pin(df)
  }
}
