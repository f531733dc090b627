package graft.functions

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Text-quality / language-ID / token-counting operators for a training-
  * data pipeline — all built-ins (codegen'd), no UDFs in the hot path.
  */
object TextAnalysis {

  private val enStops = Seq("the", "and", "of", "to", "in", "is", "that", "for")
  private val deStops = Seq("der", "die", "das", "und", "ist", "nicht", "von", "mit")
  private val frStops = Seq("le", "la", "les", "et", "est", "pas", "des", "une")

  // native single-pass set-membership count: the former
  // size(filter(tokens, t => s1===t || … || s8===t)) chain was a
  // CodegenFallback higher-order function — an interpreted 8-comparison
  // tree per token, ×3 languages in langId. Identical counts (byte-equal
  // string comparison, null tokens dropped by both forms).
  private def stopHits(tokens: Column, stops: Seq[String]): Column =
    graft.spark.StopHits.col(tokens, stops)

  /** Whitespace tokens + a BPE-ish subword count (runs of letters, digits,
    * or single punctuation — a cheap proxy for BPE token counts).
    */
  def withTokenCounts(docs: DataFrame, textCol: String = "text"): DataFrame = {
    docs
      .withColumn("ws_tokens", size(split(col(textCol), " ", -1)))
      // maximal alphanumeric runs + maximal non-alnum-non-space runs — the
      // lookahead-free form is RE2-compatible, so the DuckDB oracle can run
      // the byte-identical regex
      .withColumn("bpe_ish_tokens",
        size(regexp_extract_all(col(textCol),
          lit("[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]+"), lit(0))))
  }

  /** Quality-score features: length, punctuation ratio, stopword ratio,
    * mean word length, alpha ratio — the classic web-text filters.
    */
  def qualityFeatures(docs: DataFrame, textCol: String = "text"): DataFrame = {
    // tokenization and the codepoint count are hoisted into their own
    // columns so each runs ONCE per row: inlined, the split regex ran 5×
    // and length(text) 6× per row (CollapseProject keeps multi-referenced
    // non-cheap aliases in their own Project)
    val toks = col("__toks")
    val len = col("__len")
    docs
      .withColumn("__toks", split(lower(col(textCol)), "\\s+", -1))
      .withColumn("__len", length(col(textCol)))
      .withColumn("n_chars_m", len)
      .withColumn("n_tokens", size(toks))
      .withColumn("punct_ratio",
        (len -
          length(regexp_replace(col(textCol), "[\\p{Punct}]", ""))).cast("double") /
          greatest(len, lit(1)))
      .withColumn("stopword_ratio",
        stopHits(toks, enStops).cast("double") / greatest(size(toks), lit(1)))
      .withColumn("mean_word_len",
        (len - size(toks) + 1).cast("double") /
          greatest(size(toks), lit(1)))
      .withColumn("alpha_ratio",
        length(regexp_replace(col(textCol), "[^a-zA-Z]", "")).cast("double") /
          greatest(len, lit(1)))
      .withColumn("quality_ok",
        col("n_tokens") >= 5 && col("punct_ratio") < 0.3 && col("alpha_ratio") > 0.5)
      .drop("__toks", "__len")
  }

  /** N-gram-heuristic language ID over en/de/fr stopword hit counts. */
  def langId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    // one tokenization per row (see qualityFeatures): inlined, the split
    // regex ran once per language
    val toks = col("__toks")
    docs
      .withColumn("__toks", split(lower(col(textCol)), "\\s+", -1))
      .withColumn("en_hits", stopHits(toks, enStops))
      .withColumn("de_hits", stopHits(toks, deStops))
      .withColumn("fr_hits", stopHits(toks, frStops))
      .withColumn("lang_guess",
        when(col("en_hits") >= col("de_hits") && col("en_hits") >= col("fr_hits") &&
          col("en_hits") > 0, "en")
          .when(col("de_hits") >= col("fr_hits") && col("de_hits") > 0, "de")
          .when(col("fr_hits") > 0, "fr")
          .otherwise("unknown"))
      .drop("__toks")
  }
}
