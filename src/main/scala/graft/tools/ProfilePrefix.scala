package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.T
import graft.ops.DedupOps

/** Phase-by-phase timing of the prefix-filter Jaccard join on the
  * bench corpus — which of the ~12 stages carries the wall time. */
object ProfilePrefix {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }

    val docs = T(spark, d, "documents")
    val threshold = 0.8
    // warm the scan
    docs.count()

    val sh = DedupOps.shingles(docs, "doc_id", "text", 3)
    t("shingles")(sh.count())
    val freq = sh.groupBy("shingle").agg(count(lit(1)).as("f"))
    t("freq")(freq.count())
    val w = Window.partitionBy("doc_id").orderBy(col("f"), col("shingle"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val prefix = sh.join(freq, "shingle")
      .withColumn("pos", row_number().over(w))
      .join(sizes, "doc_id")
      .filter(col("pos") <= col("n") - ceil(lit(threshold) * col("n")) + lit(1))
      .select(col("doc_id"), col("shingle"), col("pos"), col("n"))
    t("prefix (join+window)")(prefix.count())
    val cands = prefix.select(col("doc_id").as("a"), col("shingle"),
        col("pos").as("pa"), col("n").as("na"))
      .join(prefix.select(col("doc_id").as("b"), col("shingle"),
        col("pos").as("pb"), col("n").as("nb")), "shingle")
      .filter(col("a") < col("b"))
      .filter(lit(1) + least(col("na") - col("pa"), col("nb") - col("pb")) >=
        ceil(lit(threshold / (1 + threshold)) * (col("na") + col("nb"))))
      .select("a", "b").distinct()
    t("candidates")(cands.count())
    t("full op, 1st")(DedupOps.prefixFilterJaccardPairs(
      docs, "doc_id", "text", 3, threshold).count())
    t("full op, 2nd")(DedupOps.prefixFilterJaccardPairs(
      docs, "doc_id", "text", 3, threshold).count())
    spark.stop()
  }
}
