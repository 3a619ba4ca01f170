package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Statistical aggregates built for cross-engine reproducibility.
  *
  * Spark's own corr()/covar_samp()/regr_* accumulate doubles in scan
  * order, so their low bits differ run-to-run (and engine-to-engine) —
  * unusable under a hash-compare gate and a silent nondeterminism in any
  * pipeline that diffs its own outputs. The operators here quantize the
  * measures to integers first (caller-chosen fixed-point scale), so every
  * moment sum is exact, mergeable map-side like any other keyed
  * aggregate, and the closed forms are evaluated once on the exact sums
  * (IEEE ops + correctly-rounded sqrt → bit-equal anywhere). */
object StatOps {

  /** Per-group least-squares regression (slope, intercept) and Pearson r
    * of `yCol` on `xCol`, computed from integer moment sums after
    * flooring both measures times `scale` (scale=1 → whole units).
    * One keyed shuffle with map-side partials; 5 sums + a count per
    * group; closed forms on the driver-visible aggregate row — never a
    * second pass over the data. Gate: `stat_regression_per_key`.
    * At 100 TB widen the sums to DECIMAL(38,0) if n·(scale·max)² can
    * pass 2^63. */
  def quantizedRegression(
      df: DataFrame, groupCol: String, xCol: String, yCol: String,
      scale: Double = 1.0): DataFrame = {
    val qi = floor(col(xCol) * scale).cast("long")
    val pi = floor(col(yCol) * scale).cast("long")
    df.select(col(groupCol), qi.as("qi"), pi.as("pi"))
      .groupBy(groupCol)
      .agg(
        count(lit(1)).as("n"),
        sum(col("qi")).as("sx"), sum(col("pi")).as("sy"),
        sum(col("qi") * col("pi")).as("sxy"),
        sum(col("qi") * col("qi")).as("sxx"),
        sum(col("pi") * col("pi")).as("syy"))
      .select(col(groupCol), col("n"),
        col("n").cast("double").as("nd"),
        col("sx").cast("double").as("sxd"),
        col("sy").cast("double").as("syd"),
        col("sxy").cast("double").as("sxyd"),
        col("sxx").cast("double").as("sxxd"),
        col("syy").cast("double").as("syyd"))
      .withColumn("cov", col("nd") * col("sxyd") - col("sxd") * col("syd"))
      .withColumn("var_x", col("nd") * col("sxxd") - col("sxd") * col("sxd"))
      .withColumn("var_y", col("nd") * col("syyd") - col("syd") * col("syd"))
      .select(col(groupCol), col("n"),
        (col("cov") / col("var_x")).as("slope"),
        ((col("syd") - (col("cov") / col("var_x")) * col("sxd")) /
          col("nd")).as("intercept"),
        (col("cov") / sqrt(col("var_x") * col("var_y"))).as("r"))
  }
}
