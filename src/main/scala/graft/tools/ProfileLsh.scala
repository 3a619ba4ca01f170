package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.T
import graft.ops.DedupOps

object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"LSH $name n=$n t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    val docs = T(spark, d, "documents")
    val sh = DedupOps.shingles(docs, "doc_id", "text", 3)
    time("shingles")(sh.count())
    val sigs = DedupOps.minhashSignatures(sh, "doc_id")
    time("signatures")(sigs.count())
    val cands = DedupOps.minhashLshCandidates(sigs, "doc_id")
    time("candidates")(cands.count())
    time("full_pairs")(
      DedupOps.minhashLshPairs(docs, "doc_id", "text", 3, 0.8).count())
    time("exact_jaccard")(
      DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8).count())
    spark.stop()
  }
}
