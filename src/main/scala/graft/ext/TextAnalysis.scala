package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines
  * (SURVEY.md §7.5): tokenization, quality scoring, language-ID heuristic,
  * fingerprinting. All pure column expressions — codegen'd, no UDFs, scale
  * linearly with a single scan of the documents table.
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish regex token stream: letter runs, digit runs, single other
    * non-space chars.
    */
  val TokenRegex = "[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

  def regexTokens(text: Column): Column =
    regexp_extract_all(text, lit(TokenRegex), lit(0))

  /** Small deterministic stopword list for quality/lang heuristics. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it")

  def stopwordCount(toks: Column): Column =
    size(filter(toks, t => t.isin(Stopwords.map(x => x: Any): _*)))

  /** Word n-gram shingles (space-joined), 1-indexed positions. Empty when
    * the document has fewer than n tokens (Spark's `sequence` would count
    * DOWN for start > stop, so guard explicitly).
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*)))
      .otherwise(array().cast("array<string>"))
}
