package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for a training-data pipeline, all built from
  * codegen'd `functions._` primitives so they stay inside whole-stage
  * codegen at 100 TB: token counting, quality scoring, language-ID by
  * lexicon vote, and hash fingerprints (see graft.expr.TextHashes).
  * (North-star operators per SURVEY §7.4 — the reference itself has no
  * text analytics.) */
object TextOps {

  /** Whitespace tokens; the BPE-ish variant splits punctuation off too. */
  def tokens(text: Column): Column = split(text, " +")

  /** Sub-word-ish tokenization: split on non-alphanumerics, drop empties —
    * a deterministic stand-in for a BPE pass with the same plumbing. */
  def tokensBpeIsh(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Quality signals: all exact-integer ratios so results reproduce
    * bit-identically in any engine (counts divided as doubles). */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nTok = size(toks)
    val nChar = length(t)
    val alnum = length(regexp_replace(t, "[^a-zA-Z0-9]", ""))
    val stop = size(filter(toks, w => w.isin(Stopwords: _*)))
    df.withColumn("n_tokens", nTok)
      .withColumn("n_chars", nChar)
      .withColumn("alpha_ratio",
        alnum.cast(DoubleType) / greatest(nChar, lit(1)).cast(DoubleType))
      .withColumn("stopword_ratio",
        stop.cast(DoubleType) / greatest(nTok, lit(1)).cast(DoubleType))
      .withColumn("mean_token_len",
        (nChar - (nTok - lit(1))).cast(DoubleType) /
          greatest(nTok, lit(1)).cast(DoubleType))
  }

  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "on", "for")

  /** Tiny per-language lexicons for the vote-based language-ID heuristic.
    * Deterministic and fully SQL-expressible (the DuckDB oracle runs the
    * same votes). Real deployments swap in larger wordlists — the operator
    * shape (one pass, no shuffle, argmax over per-language token votes)
    * is the point. */
  val Lexicons: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist", "ein", "mit"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "que", "pour"),
    "zh" -> Seq("de5", "shi4", "bu4", "le5", "zai4", "ren2", "you3", "wo3"))

  /** Vote per language = tokens present in that language's lexicon
    * (duplicates count). Winner = max votes, ties broken by language
    * order — deterministic, expressible in ANSI-ish SQL. */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val votes = Lexicons.map { case (lang, lex) =>
      lang -> size(filter(toks, w => w.isin(lex: _*)))
    }
    // fold: keep the first language with the strictly-highest vote count
    votes.tail.foldLeft((lit(votes.head._1), votes.head._2)) {
      case ((bestLang, bestVotes), (lang, v)) =>
        (when(v > bestVotes, lit(lang)).otherwise(bestLang),
          when(v > bestVotes, v).otherwise(bestVotes))
    }._1
  }
}
