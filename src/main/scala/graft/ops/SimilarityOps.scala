package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.expr.SignSketch64

/** Similarity search over an embedding column (SURVEY §7.4).
  *
  * Baseline: brute-force cosine top-k — exact, one wide join; right answer
  * at verification scale and the yardstick for recall.
  *
  * Scale path: random-hyperplane LSH. Each vector gets a 64-bit sign
  * sketch (native expression, one pass); Hamming-close sketches ≈
  * cosine-close vectors, so candidate generation groups on 16-bit sketch
  * bands (linear, shuffle-friendly) and only candidates pay the exact
  * cosine re-rank. At 100 TB the all-pairs join is impossible; the banded
  * join is `O(docs × bands)` with bounded bucket width.
  */
object SimilarityOps {

  /** Exact double dot product; sequential fold = deterministic bits.
    * Native expression — see [[graft.expr.DotProduct]]. */
  def dot(a: Column, b: Column): Column = graft.expr.DotProduct.dot(a, b)

  def withNorm(df: DataFrame): DataFrame =
    df.withColumn("nrm", sqrt(dot(col("v"), col("v"))))

  /** Exact top-k neighbors for each query vector (brute force).
    * Deterministic: ties broken by neighbor id. */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = withNorm(queries.select(
      col(idCol).as("qid"), col(vecCol).cast(ArrayType(DoubleType)).as("v")))
      .withColumnRenamed("v", "qv").withColumnRenamed("nrm", "qn")
    val c = withNorm(corpus.select(
      col(idCol).as("nid"), col(vecCol).cast(ArrayType(DoubleType)).as("v")))
      .withColumnRenamed("v", "cv").withColumnRenamed("nrm", "cn")
    val scored = q.crossJoin(c)
      .filter(col("qid") =!= col("nid"))
      .withColumn("cosine", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("qid")
      .orderBy(col("cosine").desc, col("nid").asc)
    scored
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid", "cosine")
  }

  /** 64-bit sign sketch per vector (see [[graft.expr.SignSketch64]]). */
  def withSketch(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("sketch",
      SignSketch64.sketch(col(vecCol).cast(ArrayType(DoubleType))))

  /** LSH top-k: candidates share any 8-bit sketch band with the query;
    * exact cosine re-ranks candidates. 8 bands x 8 bits keeps candidate
    * sets non-degenerate even for near-orthogonal corpora (P[band match]
    * = 2^-8 per band at cos~0, rising steeply with cosine); recall < 1 by
    * construction — measured against bruteForceTopK in tests. */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    def banded(df: DataFrame, side: String) =
      withSketch(df.select(col(idCol).as(side),
        col(vecCol).cast(ArrayType(DoubleType)).as(s"v_$side")), s"v_$side")
        .select(col(side), col(s"v_$side"),
          explode(array((0 until 8).map(i =>
            struct(lit(i).as("band"),
              shiftright(col("sketch"), i * 8)
                .bitwiseAND(lit(0xffL)).as("bh"))): _*)).as("b"))
        .select(col(side), col(s"v_$side"), col("b.band"), col("b.bh"))

    val q = banded(queries, "qid")
    val c = banded(corpus, "nid")
    val cands = q.join(c, Seq("band", "bh"))
      .filter(col("qid") =!= col("nid"))
      .select("qid", "v_qid", "nid", "v_nid")
      .distinct()
    val scored = cands
      .withColumn("qn", sqrt(dot(col("v_qid"), col("v_qid"))))
      .withColumn("cn", sqrt(dot(col("v_nid"), col("v_nid"))))
      .withColumn("cosine",
        dot(col("v_qid"), col("v_nid")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("qid")
      .orderBy(col("cosine").desc, col("nid").asc)
    scored
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid", "cosine")
  }
}
