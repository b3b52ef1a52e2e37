package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring — the CCNet-style
  * quality signal: train a bigram LM on the corpus itself, then score
  * each document's cross-entropy / perplexity under it. Low-perplexity
  * docs read like the corpus; high-perplexity docs are boilerplate,
  * tables, or noise — the standard pretraining quality filter when no
  * external KenLM model is available.
  *
  * Scale shape (the part that must survive 100 TB):
  *  - Training is one exploded groupBy over (w1, w2) with partial
  *    aggregation — mergeable counts, fixed-width string keys, no
  *    driver state. Context counts c(w1) re-aggregate from the bigram
  *    table (vocab-sized), not from the raw corpus.
  *  - Scoring joins each document's bigram multiset against the count
  *    table. That join stays a SHUFFLE join by design: a web-scale
  *    bigram vocabulary is billions of rows and must never be
  *    broadcast; AQE may still choose broadcast when a small corpus
  *    makes the model tiny.
  *  - The only driver-held value is the scalar vocabulary size.
  *
  * Smoothing is add-k over the corpus vocabulary:
  * p(w2 | w1) = (c(w1,w2) + k) / (c(w1) + k·V).
  */
object LanguageModel {

  /** Per-document bigram multiset `(id, w1, w2, m)` over lowercased
    * whitespace tokens; documents with fewer than 2 tokens drop out
    * (they have no bigrams to score).
    */
  private def bigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("__lt", TextFunctions.tokens(lower(col(textCol))))
      .filter(size(col("__lt")) >= 2)
      .select(col(idCol),
        explode(expr(
          "transform(sequence(0, size(__lt) - 2), i -> named_struct('w1', __lt[i], 'w2', __lt[i + 1]))"
        )).as("__b"))
      .select(col(idCol), col("__b.w1").as("w1"), col("__b.w2").as("w2"))
      .groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("m"))

  /** Train on `docs` and score every document of `docs`:
    * `(id, n_bigrams, cross_entropy, ppl)` — cross-entropy in nats,
    * `ppl = exp(H)`. One pass builds the per-doc multiset; counts and
    * scores reuse it, so the corpus is tokenized exactly once.
    */
  def bigramPerplexity(docs: DataFrame, idCol: String, textCol: String,
      k: Double = 0.5): DataFrame = {
    require(k > 0, "smoothing k must be positive")
    val m = bigrams(docs, idCol, textCol)
    val c12 = m.groupBy(col("w1"), col("w2")).agg(sum(col("m")).as("c12"))
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    // vocabulary over all tokens (not just bigram contexts): the scalar
    // V is the single driver-held model parameter
    val vocab = docs
      .select(explode(TextFunctions.tokens(lower(col(textCol)))).as("__tok"))
      .agg(countDistinct(col("__tok")))
      .head().getLong(0)
    val scored = m
      .join(c12, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .withColumn("lp",
        log((col("c12") + lit(k)) / (col("c1") + lit(k * vocab))))
    scored.groupBy(col(idCol))
      .agg(sum(col("m")).as("n_bigrams"),
        (-sum(col("m") * col("lp")) / sum(col("m"))).as("__h"))
      .select(col(idCol), col("n_bigrams"),
        col("__h").as("cross_entropy"),
        exp(col("__h")).as("ppl"))
  }
}
