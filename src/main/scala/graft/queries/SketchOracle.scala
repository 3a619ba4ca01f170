package graft.queries

/** DuckDB replica of the engine's 64-bit sign sketch + 8x8 banding, shared
  * by every LSH gate oracle (`dedup_embedding_lsh`, `sim_topk_lsh`). The
  * Rademacher sign matrix is emitted into the SQL from
  * [[graft.expr.SignSketch64.sign]] — the single sign definition the
  * engine executes — and each sketch bit is recomputed with
  * `list_dot_product`, whose sequential fold matches the engine's loop bit
  * for bit. The oracle therefore reproduces candidate generation exactly:
  * the banded *operator* is gated, not just its overlap with an
  * exhaustive baseline. */
private[queries] object SketchOracle {

  /** 64 VALUES rows `(j, signs_j::DOUBLE[])`. */
  def signRowsSql: String =
    (0 until 64).map { j =>
      val signs = (0 until 64)
        .map(i => if (graft.expr.SignSketch64.sign(j, i) > 0) "1" else "-1")
        .mkString(",")
      s"($j, [$signs]::DOUBLE[])"
    }.mkString(",\n")

  /** CTE chain `signs, e, bits, bands` over `embeddings`: `e(vec_id, v)`,
    * `bands(vec_id, band, bh)` with band = j/8 and bh = the 8 bits of the
    * band as an integer — identical to `shiftright(sketch, band*8) & 0xff`
    * on the engine side. Embed as `WITH $bandsCtes, ...`. */
  def bandsCtes: String =
    s"""signs(j, s) AS (VALUES
       |$signRowsSql),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |bits AS (
       |  SELECT e.vec_id, signs.j,
       |    CASE WHEN list_dot_product(e.v, signs.s) > 0.0 THEN 1 ELSE 0 END AS bit
       |  FROM e CROSS JOIN signs),
       |bands AS (
       |  SELECT vec_id, j // 8 AS band, SUM(bit << (j % 8)) AS bh
       |  FROM bits GROUP BY 1, 2)""".stripMargin
}
