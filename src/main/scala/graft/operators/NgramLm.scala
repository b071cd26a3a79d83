package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.TextExprs

/** Stupid-backoff n-gram language model scoring (Brants et al. 2007,
  * "Large Language Models in Machine Translation" §4) — the
  * CCNet-style perplexity filter: train gram counts on a reference
  * corpus, score every document by its per-token backoff probability,
  * keep documents whose perplexity sits in the accepted band. This is
  * the model-based quality gate real curation pipelines run between
  * the heuristic battery (C4/Gopher) and dedup.
  *
  * Scoring rule (bigram model, the shipped order):
  *   - context seen:    S(w|v)   = c2(v w) / c1(v)
  *   - context unseen:  S(w|v)   = α · c1(w)⁺ / N        (α = 0.4)
  *   - document start:  S(w)     = c1(w)⁺ / N            (no α — the
  *     penalty applies to backing OFF an existing context, not to a
  *     position that never had one)
  * where ⁺ floors unseen unigrams at count 1 (same +1-floor stance as
  * the BM25 idf), N = total training tokens. Document score =
  * 10^(−avg log₁₀ S) — classic perplexity, lower = more fluent.
  *
  * Scale shape (the 100 TB contract):
  *   - gram construction is ROW-LOCAL (struct arrays built inside one
  *     projection, then one explode) — no per-doc window, no shuffle
  *     before the count aggregations;
  *   - counts cost one shuffle each (c1, c2), pruned by `minCount`
  *     BEFORE any join — a pruned LM is bounded by vocabulary, not by
  *     corpus, so the scoring joins broadcast in practice (AQE decides;
  *     un-pruned counts degrade to shuffle joins, never to all-pairs);
  *   - scoring pre-aggregates to (doc, v, w, tf) so repeated bigrams
  *     join once and the average is tf-weighted (the ADVICE-r8
  *     lm-quality shuffle-diet pattern);
  *   - N crosses as a one-row broadcast.
  *
  * Tokenization is the engine-wide contract: lowered `\s+` splits
  * ([[TextExprs.tokens]] ≡ DuckDB `string_split_regex(lower(trim(t)),
  * '\s+')` non-empty), so oracle replays are exact.
  */
object NgramLm {

  /** (doc_id, n_tokens, ppl) for every row of `df`; `train` defaults
    * to scoring corpus itself (the self-scored fluency baseline).
    * Deterministic; empty documents score ppl 0.0 with 0 tokens. */
  def perplexity(df: DataFrame, textCol: String, idCol: String,
      train: Option[DataFrame] = None, trainTextCol: Option[String] = None,
      alpha: Double = 0.4, minCount: Long = 1): DataFrame = {

    val trainDf = train.getOrElse(df)
    val trainText = trainTextCol.getOrElse(textCol)

    // ---- training counts: one row-local explode, two count shuffles
    val trainToks = trainDf
      .select(TextExprs.tokens(col(trainText), lower = true).as("l"))
      .where(size(col("l")) > 0)
    val c1 = trainToks.select(explode(col("l")).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c"))
      .where(col("c") >= minCount)
    val n = c1.agg(sum(col("c")).as("n")) // one row
    val c2 = trainToks
      .select(explode(bigramPairs(col("l"))).as("t"))
      .where(col("t.prev").isNotNull)
      .select(concat_ws(" ", col("t.prev"), col("t.w")).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c"))
      .where(col("c") >= minCount)

    // ---- scoring stream, pre-aggregated to (doc, v, w, tf)
    val pairs = df
      .select(col(idCol).as("doc_id"),
        TextExprs.tokens(col(textCol), lower = true).as("l"))
      .where(size(col("l")) > 0)
      .select(col("doc_id"), explode(bigramPairs(col("l"))).as("t"))
      .groupBy(col("doc_id"), col("t.w").as("w"), col("t.prev").as("prev"))
      .agg(count(lit(1)).as("tf"))

    val s = // per-position backoff probability
      when(col("prev").isNotNull && col("c2c").isNotNull,
        col("c2c").cast(DoubleType) / col("c1prev").cast(DoubleType))
        .when(col("prev").isNotNull,
          lit(alpha) * coalesce(col("c1w"), lit(1L)).cast(DoubleType) /
            col("n").cast(DoubleType))
        .otherwise(coalesce(col("c1w"), lit(1L)).cast(DoubleType) /
          col("n").cast(DoubleType))

    val c2r = c2.select(col("g").as("g2"), col("c").as("c2c"))
    val c1p = c1.select(col("g").as("gp"), col("c").as("c1prev"))
    val c1w = c1.select(col("g").as("gw"), col("c").as("c1w"))
    val scored = pairs
      .join(c2r, concat_ws(" ", col("prev"), col("w")) === col("g2"), "left")
      .drop("g2")
      .join(c1p, col("prev") === col("gp"), "left")
      .drop("gp")
      .join(c1w, col("w") === col("gw"), "left")
      .drop("gw")
      .crossJoin(broadcast(n))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        (sum(col("tf").cast(DoubleType) * log10(s)) /
          sum(col("tf")).cast(DoubleType)).as("avg_log"))

    df.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(coalesce(pow(lit(10.0), -col("avg_log")), lit(0.0)), 4).as("ppl"))
  }

  /** keep rows whose perplexity is within (minPpl, maxPpl] — CCNet
    * buckets by LM score; empty docs (ppl 0) fall below every band */
  def perplexityFilter(df: DataFrame, textCol: String, idCol: String,
      maxPpl: Double, minPpl: Double = 0.0,
      train: Option[DataFrame] = None, alpha: Double = 0.4,
      minCount: Long = 1): DataFrame = {
    val scoredDf = perplexity(df, textCol, idCol, train, None, alpha, minCount)
      .where(col("ppl") > minPpl && col("ppl") <= maxPpl)
      .select(col("doc_id"))
    df.join(scoredDf, df(idCol) === scoredDf("doc_id"), "left_semi")
  }

  /** row-local (w, prev) structs for every token position — built in
    * ONE projection and exploded once, so the token array is never
    * duplicated per output row and no per-doc window shuffle exists.
    * prev is null at position 0 (document start). */
  private def bigramPairs(l: Column): Column =
    transform(sequence(lit(1), size(l)),
      i => struct(element_at(l, i).as("w"),
        when(i > 1, element_at(l, i - 1)).as("prev")))
}
