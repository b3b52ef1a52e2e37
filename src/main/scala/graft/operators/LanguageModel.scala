package graft.operators

import graft.core.Scratch
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

  /** Per-document bigram multiset `(id, w1, w2, m)` from pre-tokenized
    * docs `(id, __lt)`; documents with fewer than 2 tokens drop out
    * (they have no bigrams to score).
    */
  private def bigrams(toks: DataFrame, idCol: String): DataFrame =
    toks
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
    * `ppl = exp(H)`.
    *
    * The corpus is tokenized EXACTLY once, enforced by materialization
    * (not just plan sharing, which Catalyst does not deduplicate across
    * action boundaries): the token arrays go to scratch parquet and feed
    * both the bigram build and the vocabulary scalar; the per-doc
    * multiset `m` — the heaviest subtree, consumed three times (directly
    * by the scoring join and transitively via c12 and c1) — is
    * materialized too, so each consumer re-reads a small parquet instead
    * of re-running tokenize+explode+groupBy. At 100 TB both
    * intermediates are corpus-proportional one-pass writes that replace
    * three corpus-wide recomputations.
    */
  def bigramPerplexity(docs: DataFrame, idCol: String, textCol: String,
      k: Double = 0.5): DataFrame = {
    require(k > 0, "smoothing k must be positive")
    val key = s"$idCol|$textCol|${Scratch.planKey(docs)}"
    val toks = Scratch.materialize(
      docs.select(col(idCol), TextFunctions.tokens(lower(col(textCol))).as("__lt")),
      "lm_toks", key)
    val m = Scratch.materialize(bigrams(toks, idCol), "lm_bigrams", key)
    val c12 = m.groupBy(col("w1"), col("w2")).agg(sum(col("m")).as("c12"))
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    // vocabulary over all tokens (not just bigram contexts): the scalar
    // V is the single driver-held model parameter
    val vocab = toks
      .select(explode(col("__lt")).as("__tok"))
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

  /** BPE tokenizer training (Sennrich et al. 2016): learn `numMerges`
    * byte-pair merges from corpus word frequencies — the corpus-level
    * job behind every subword tokenizer. The industry shape: ONE corpus
    * pass builds the word-frequency table, then training iterates on
    * that table alone (top `vocabWords` words by count), never touching
    * the corpus again. Each iteration counts adjacent symbol pairs
    * weighted by word count (overlapping positions count, the standard
    * convention), picks the argmax pair with a (count DESC, pair)
    * tie-break, and merges it greedily left-to-right in every word.
    *
    * Scale shape: the corpus pass is a partial-aggregated token count +
    * distributed top-V — the ONLY Spark job. The top-V table is
    * model-sized by definition (vocabWords rows: 300 here, ≤~1M in a
    * production trainer), so it is collected once and the merge loop
    * runs driver-local over it, the standard tokenizer-trainer shape —
    * the earlier one-Spark-aggregation-per-merge design was 32k jobs at
    * a production vocab regardless of data size. The per-iteration
    * local recount is O(V·avg_len); a 1M-word × 32k-merge run would
    * upgrade it to incremental pair-count deltas + a heap (pure driver
    * code, no plan change).
    *
    * Determinism: symbol strings are sentinel-framed (U+001F around
    * every symbol) so a merge pattern can only match at symbol
    * boundaries, and `replace` is greedy-left-nonoverlapping in both
    * this engine and the oracle's. Words are restricted to `[a-z]+`
    * (post-lowercase) so the sentinel and the `</w>` end-of-word marker
    * can't collide with symbol text.
    *
    * Returns the learned merge table: (merge_rank, lhs, rhs, pair_count).
    */
  /** Train-once memo: the model is a handful of tuples and training is
    * deterministic in the key, so the second consumer in a session
    * (t_bpe_encode trains, t_bpe_merges reads back -- or vice versa)
    * must not replay the iteration loop.
    */
  private val bpeCache =
    new graft.core.BoundedMemo[String, Seq[(Int, String, String, Long)]](64)

  /** The one-corpus-pass word-frequency table, memoized separately from
    * the merges so consumers training DIFFERENT merge counts over the
    * same corpus (t_bpe_merges at 64, t_bpe_encode at 8) share the
    * single Spark job; the local merge loop re-derives from it in
    * microseconds.
    */
  private val bpeWordsCache =
    new graft.core.BoundedMemo[String, Array[(String, Long)]](64)

  def bpeTrain(docs: DataFrame, idCol: String, textCol: String,
      vocabWords: Int, numMerges: Int): DataFrame = {
    require(vocabWords > 0, "vocabWords must be positive")
    require(numMerges > 0, "numMerges must be positive")
    val planK = Scratch.planKey(docs)
    val key = s"bpe|$idCol|$textCol|$vocabWords|$numMerges|$planK"
    val merges = bpeCache.getOrElseUpdate(key, {
      val words = bpeWordsCache.getOrElseUpdate(
        s"bpewords|$idCol|$textCol|$vocabWords|$planK",
        docs.select(explode(TextFunctions.tokens(lower(col(textCol)))).as("w"))
          .filter(col("w").rlike("^[a-z]+$"))
          .groupBy(col("w")).agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("w")).limit(vocabWords)
          .collect().map(r => (r.getString(0), r.getLong(1))))
      trainMergesLocal(words, numMerges)
    })
    val spark = docs.sparkSession
    import spark.implicits._
    merges.toDF("merge_rank", "lhs", "rhs", "pair_count")
  }

  /** Driver-local merge loop over the collected top-V table. Each
    * iteration: count adjacent symbol pairs weighted by word count
    * (overlapping positions count), argmax with the (count DESC, lhs,
    * rhs) tie-break — plain code-unit string order, identical to
    * Spark's and DuckDB's binary collation on these ASCII symbols —
    * then a greedy left-to-right non-overlapping merge in every word
    * (exactly what the sentinel-framed `replace` the encoder and the
    * SQL oracle run does). Stops early if no pair remains, matching the
    * oracle's empty-CTE tail.
    */
  private def trainMergesLocal(words: Array[(String, Long)],
      numMerges: Int): Seq[(Int, String, String, Long)] = {
    val syms: Array[Array[String]] =
      words.map { case (w, _) => w.split("").toArray :+ "</w>" }
    val wc: Array[Long] = words.map(_._2)
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var i = 1
    var exhausted = false
    while (i <= numMerges && !exhausted) {
      val pc = new java.util.HashMap[(String, String), Long]()
      var wi = 0
      while (wi < syms.length) {
        val s = syms(wi); val c = wc(wi)
        var j = 0
        while (j < s.length - 1) {
          pc.merge((s(j), s(j + 1)), c, (x, y) => java.lang.Long.sum(x, y))
          j += 1
        }
        wi += 1
      }
      if (pc.isEmpty) exhausted = true
      else {
        var bestA: String = null; var bestB: String = null; var bestC = -1L
        pc.forEach { (pair, cnt) =>
          val better = cnt > bestC || (cnt == bestC && {
            val ca = pair._1.compareTo(bestA)
            ca < 0 || (ca == 0 && pair._2.compareTo(bestB) < 0)
          })
          if (better) { bestA = pair._1; bestB = pair._2; bestC = cnt }
        }
        merges += ((i, bestA, bestB, bestC))
        wi = 0
        while (wi < syms.length) {
          val s = syms(wi)
          var has = false
          var j = 0
          while (!has && j < s.length - 1) {
            has = s(j) == bestA && s(j + 1) == bestB; j += 1
          }
          if (has) {
            val out = scala.collection.mutable.ArrayBuffer[String]()
            j = 0
            while (j < s.length) {
              if (j < s.length - 1 && s(j) == bestA && s(j + 1) == bestB) {
                out += bestA + bestB; j += 2
              } else { out += s(j); j += 1 }
            }
            syms(wi) = out.toArray
          }
          wi += 1
        }
        i += 1
      }
    }
    merges.toSeq
  }

  /** BPE encoding — the inference side of [[bpeTrain]]: segment every
    * document's `[a-z]+` words by replaying the learned merges in rank
    * order (same sentinel-framed greedy `replace` the trainer used, so
    * encode ∘ train is self-consistent). Map-only: the merge table is a
    * plan literal (tokenizer models are KBs — never a join), the whole
    * kernel is one codegen'd expression chain per row; this is the
    * shape that tokenizes a 100 TB corpus.
    *
    * Returns (idCol, n_words, n_subwords, seg_fp) — seg_fp an md5 of
    * the canonical rendering (subwords `+`-joined within a word, words
    * space-joined), so a value check covers the exact segmentation.
    */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val SEP = "\u001f"
    val toks = filter(TextFunctions.tokens(lower(col(textCol))),
      w => w.rlike("^[a-z]+$"))
    val segmented = transform(toks, w => {
      val wrapped = concat(lit(SEP),
        concat_ws(SEP + SEP, concat(split(w, ""), array(lit("</w>")))),
        lit(SEP))
      merges.foldLeft(wrapped) { case (c, (a, b)) =>
        call_function("replace", c,
          lit(SEP + a + SEP + SEP + b + SEP), lit(SEP + a + b + SEP))
      }
    })
    docs.select(col(idCol), segmented.as("__seg"))
      .select(col(idCol),
        size(col("__seg")).cast("long").as("n_words"),
        coalesce(aggregate(col("__seg"), lit(0L),
          (acc, s) => acc + size(split(
            call_function("btrim", s, lit(SEP)), SEP + SEP))), lit(0L))
          .as("n_subwords"),
        md5(concat_ws(" ", transform(col("__seg"), s =>
          call_function("replace",
            call_function("btrim", s, lit(SEP)),
            lit(SEP + SEP), lit("+"))))).as("seg_fp"))
  }

  /** PMI collocation mining (Church & Hanks 1990): score every adjacent
    * word pair by pointwise mutual information
    * `ln( p(w1,w2) / (p(w1)·p(w2)) )` with p from exact corpus counts
    * (unigrams over tokens, joints over adjacent bigrams), keep pairs
    * seen ≥ `minCount` times, return the `topK` by PMI — the classic
    * fixed-phrase detector ("new york"-style collocations) a tokenizer-
    * training or phrase-mining pass runs over the whole corpus.
    *
    * Scale shape: tokens are materialized once to scratch; unigram and
    * bigram count tables (vocab-sized, partial-aggregated) are
    * materialized too, because the scoring join consumes each twice and
    * the totals row once — re-reads of a vocab-sized parquet instead of
    * three corpus re-tokenizations. The top-k is `orderBy.limit`
    * (distributed heaps), ranked by the 6-decimal-rounded PMI with a
    * (w1, w2) tie-break so a libm ulp can't flip a rank; the rank
    * window afterwards touches `topK` rows only.
    *
    * Returns (w1, w2, c12, pmi, rank).
    */
  def pmiCollocations(docs: DataFrame, idCol: String, textCol: String,
      minCount: Long, topK: Int): DataFrame = {
    require(minCount >= 1, "minCount must be at least 1")
    require(topK > 0, "topK must be positive")
    val key = s"pmi|$idCol|$textCol|${Scratch.planKey(docs)}"
    val toks = Scratch.materialize(
      docs.select(col(idCol), TextFunctions.tokens(lower(col(textCol))).as("__lt")),
      "pmi_toks", key)
    val uni = Scratch.materialize(
      toks.select(explode(col("__lt")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c")),
      "pmi_uni", key)
    val big = Scratch.materialize(
      toks.filter(size(col("__lt")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(__lt) - 2), i -> named_struct('w1', __lt[i], 'w2', __lt[i + 1]))"
        )).as("__b"))
        .select(col("__b.w1").as("w1"), col("__b.w2").as("w2"))
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12")),
      "pmi_big", key)
    val totals = uni.agg(sum(col("c")).cast("double").as("n_tok"))
      .crossJoin(big.agg(sum(col("c12")).cast("double").as("n_big")))
    val scored = big.filter(col("c12") >= minCount)
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
      .crossJoin(broadcast(totals))
      // one fixed expression shape in both engines: products before the
      // division, ln last, round to 6 before ranking
      .withColumn("pmi", round(log(
        (col("c12").cast("double") * col("n_tok") * col("n_tok")) /
          (col("n_big") * col("c1").cast("double") * col("c2").cast("double"))), 6))
    val top = scored.select(col("w1"), col("w2"), col("c12"), col("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
    top.withColumn("rank", row_number().over(w))
  }
}
