package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text analysis for large-scale training-data pipelines: tokenization,
  * quality scoring, language ID, fingerprinting. All operators are
  * composed from codegen'd builtin expressions (no UDFs) and are
  * row-local — they scale linearly with no shuffle; a 100 TB corpus is
  * a map-only pass.
  */
object TextOps {

  /** whitespace tokens of trimmed text; empty text → empty array */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: whitespace tokens plus intra-token
    * splits on case/digit/punct boundaries (a cheap proxy for tokenizer
    * budget accounting when no vocab is loaded). */
  def subwordCountEstimate(text: Column): Column =
    size(filter(split(trim(text),
      "\\s+|(?<=[a-z])(?=[A-Z])|(?<=[A-Za-z])(?=[0-9])|(?<=[0-9])(?=[A-Za-z])"),
      t => length(t) > 0))

  def charCount(text: Column): Column = length(text)

  /** fraction of characters that are ASCII punctuation */
  def punctRatio(text: Column): Column = {
    val len = length(text)
    when(len === 0, 0.0).otherwise(
      (len - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast(DoubleType) / len)
  }

  val defaultStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "on", "for", "with")

  /** fraction of tokens that are stopwords */
  def stopwordRatio(text: Column, stopwords: Seq[String] = defaultStopwords): Column = {
    val toks = tokens(lower(text))
    val sw = array(stopwords.map(lit): _*)
    when(size(toks) === 0, 0.0).otherwise(
      size(filter(toks, t => array_contains(sw, t))).cast(DoubleType) / size(toks))
  }

  /** mean token length */
  def meanTokenLength(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, 0.0).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast(DoubleType) / size(toks))
  }

  /** Composite quality score in [0,1]: favors mid-length documents with
    * low punctuation noise and a natural stopword ratio — the standard
    * cheap pre-filter in front of expensive model-based scoring. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast(DoubleType)
    val lengthScore = least(nTok / 50.0, lit(1.0))
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 5.0)
    val swr = stopwordRatio(text)
    val swScore = lit(1.0) - abs(swr - 0.4)
    greatest(lit(0.0), least(lit(1.0),
      lengthScore * 0.4 + punctScore * 0.3 + swScore * 0.3))
  }

  /** Deterministic n-gram/marker language heuristic: CJK codepoints win
    * outright; otherwise the language whose marker-word hit count is
    * highest (ties resolve in fixed priority order); no hits → 'unknown'. */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    def hits(words: Seq[String]): Column =
      size(filter(toks, t => array_contains(array(words.map(lit): _*), t)))
    val en = hits(Seq("the", "and", "of", "is", "a"))
    val de = hits(Seq("der", "die", "und", "das", "ist"))
    val fr = hits(Seq("le", "la", "et", "les", "est"))
    val es = hits(Seq("el", "los", "y", "las", "es"))
    when(text.rlike("[\\x{4e00}-\\x{9fff}]"), "zh")
      .when(en >= de && en >= fr && en >= es && en > 0, "en")
      .when(de >= fr && de >= es && de > 0, "de")
      .when(fr >= es && fr > 0, "fr")
      .when(es > 0, "es")
      .otherwise("unknown")
  }

  /** canonical content fingerprint: md5 of lowercased,
    * whitespace-collapsed text — the exact-dedup key */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Rolling polynomial hash over tokens (documents sharing long token
    * runs collide): h = (h * 1000003 + tokenValue) mod (2^31-1).
    * Modular fold keeps every step in range under ANSI mode. */
  def rollingTokenHash(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (h, t) => pmod(h * 1000003L + (xxhash64(t) % 1000000007L + 1000000007L) % 1000000007L,
        lit(2147483647L)))

  /** word n-gram shingles (n consecutive tokens joined by one space);
    * docs shorter than n tokens fall back to a single whole-text shingle */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Standard per-document profile used by the gate queries. */
  def profile(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col("*"),
      tokenCount(t).as("n_tokens"),
      charCount(t).as("n_chars_computed"),
      round(punctRatio(t), 6).as("punct_ratio"),
      round(stopwordRatio(t), 6).as("stopword_ratio"),
      round(meanTokenLength(t), 6).as("mean_token_len"),
      langId(t).as("lang_pred"),
      fingerprint(t).as("fp"))
  }
}
