package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model- and rule-based document quality filters for LLM training-data
  * curation — the filters that run BETWEEN raw crawl and dedup in a
  * production corpus build:
  *
  *  - [[c4LineClean]] — C4-style line-level cleaning (Raffel et al.
  *    2020 §2.2's public heuristics: terminal punctuation, minimum line
  *    length, boilerplate phrases, page-level code/placeholder drops).
  *  - [[dsirWeights]] — hashed-n-gram importance weights (the DSIR
  *    recipe, Xie et al. 2023: score every raw document by how
  *    target-like its hashed unigram distribution is).
  *  - [[hashedLinearQuality]] — a fastText-shaped linear quality
  *    classifier over hashed bag-of-words features (the "model-based
  *    quality filter" slot; weights here are a deterministic function
  *    of the bucket id so the oracle can replay inference — a trained
  *    model would ship its weights as a broadcast table in the same
  *    plan shape).
  *
  * Scale notes: c4LineClean and hashedLinearQuality are map-only /
  * map-plus-one-partial-agg — they stream at any corpus size.
  * dsirWeights makes two corpus passes (bucket histogram, per-doc
  * scoring); its model state is a `buckets`-row table joined back by
  * broadcast, so nothing driver-side grows with the corpus.
  */
object QualityFilters {

  private def toks(textCol: Column): Column = TextFunctions.tokens(lower(textCol))

  /** 60-bit md5-window hash → bucket id in [0, buckets). Same
    * cross-engine-reproducible family as [[graft.functions.Md5Hash]]:
    * DuckDB twin `('0x' || substr(md5(x), 1, 15))::BIGINT % buckets`.
    */
  private def bucketOf(tok: Column, buckets: Int): Column =
    pmod(conv(substring(md5(tok), 1, 15), 16, 10).cast("long"), lit(buckets.toLong))

  /** C4-style line cleaning. Line keep rules (all public, from the C4
    * construction): the line (trimmed) must end in terminal punctuation
    * (`. ! ? "`), carry at least `minLineWords` whitespace words, and
    * contain none of `lineBlock` (case-insensitive). Page drop rules:
    * any line containing any of `pageBlock` (the reference heuristics
    * drop whole pages for "lorem ipsum" placeholders and `{` code
    * leakage) kills the document.
    *
    * Returns one row per document:
    * `(id, n_lines, n_kept_lines, keep_page, clean_text)` —
    * `clean_text` is the kept lines re-joined with `\n`, null when the
    * page is dropped. Pure codegen'd column algebra over the line
    * array: map-only, no shuffle, no UDF — the 100 TB shape for a
    * per-document rewrite.
    */
  def c4LineClean(docs: DataFrame, idCol: String, textCol: String,
      minLineWords: Int = 4,
      lineBlock: Seq[String] = Seq("javascript", "cookie"),
      pageBlock: Seq[String] = Seq("lorem ipsum", "{")): DataFrame = {
    val lines = split(col(textCol), "\n")
    def lineBlocked(l: Column): Column =
      lineBlock.map(p => lower(l).contains(p)).reduce(_ || _)
    def lineKept(l: Column): Column =
      trim(l).rlike("[.!?\"]$") &&
        size(TextFunctions.tokens(l)) >= minLineWords && !lineBlocked(l)
    val pageBad = pageBlock
      .map(p => exists(lines, l => lower(l).contains(p)))
      .reduce(_ || _)
    // kept is materialized ONCE in its own projection: lambda-bearing
    // expressions are excluded from Spark's subexpression elimination,
    // so inlining filter(lines, lineKept) into all three outputs would
    // re-run the per-line regex + tokenize 3× per document (and
    // CollapseProject won't merge a multiply-referenced non-cheap
    // alias, so the split survives optimization).
    docs.select(col(idCol), size(lines).cast("long").as("n_lines"),
        pageBad.as("__bad"), filter(lines, lineKept _).as("__kept"))
      .select(
        col(idCol),
        col("n_lines"),
        size(col("__kept")).cast("long").as("n_kept_lines"),
        (!col("__bad") && size(col("__kept")) > 0).as("keep_page"),
        when(!col("__bad"), array_join(col("__kept"), "\n")).as("clean_text"))
  }

  /** DSIR-style importance weights: per-document average log-ratio of
    * target vs raw hashed-unigram bucket probabilities,
    * `score(d) = (1/|d|) Σ_tok log(p_target[b(tok)] / p_raw[b(tok)])`,
    * with add-one smoothing on both histograms. Documents resembling
    * the `isTarget` slice score positive; importance resampling keeps a
    * sample weighted by these scores (the deterministic sampler is
    * [[CorpusStats.weightedSample]] downstream).
    *
    * Plan shape: ONE corpus tokenize feeds both histograms via a
    * conditional partial aggregation (no second pass for the target
    * slice); the `buckets`-row log-ratio table and the 1-row totals are
    * model-sized broadcasts; per-doc scoring is one shuffle on the doc
    * id. The per-bucket log-ratio is rounded to 6 digits and held as
    * INTEGER MICRO-UNITS so the per-doc sum is EXACT (order-independent)
    * and no decimal→double cast is needed before the final division —
    * double summation (and decimal→double casting) drift by 1 ulp
    * between engines.
    *
    * Returns `(id, n_tokens, dsir_score)` — one row per document with
    * at least one token.
    */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 256): DataFrame = {
    val tok = docs
      .select(col(idCol).as("__id"), isTarget.as("__t"),
        explode(toks(col(textCol))).as("__tok"))
      .select(col("__id"), col("__t"), bucketOf(col("__tok"), buckets).as("__b"))
    val db = tok.groupBy(col("__id"), col("__b"))
      .agg(count(lit(1)).as("c"), max(col("__t")).as("__t"))
    // bucket histogram from the per-(doc, bucket) counts — the corpus
    // is bucketed once; this second agg runs over the already-shrunk
    // (doc × bucket) relation, not the raw token stream
    val hist = db.groupBy(col("__b"))
      .agg(sum(col("c")).as("n_raw"),
        sum(when(col("__t"), col("c")).otherwise(0L)).as("n_tgt"))
    val totals = hist.agg(sum(col("n_raw")).as("tot_raw"), sum(col("n_tgt")).as("tot_tgt"))
    val lr = hist.crossJoin(broadcast(totals))
      .select(col("__b"),
        round(
          log((col("n_tgt") + lit(1.0)) / (col("tot_tgt") + lit(buckets.toDouble))) -
            log((col("n_raw") + lit(1.0)) / (col("tot_raw") + lit(buckets.toDouble))),
          6).as("lr6"))
      .select(col("__b"), round(col("lr6") * lit(1000000.0)).cast("long").as("lr"))
    db.join(broadcast(lr), Seq("__b"))
      .groupBy(col("__id"))
      .agg(sum(col("c")).as("n_tokens"), sum(col("c") * col("lr")).as("__sum"))
      .select(col("__id").as(idCol), col("n_tokens"),
        round((col("__sum").cast("double") / lit(1000000.0)) /
          col("n_tokens").cast("double"), 6).as("dsir_score"))
  }

  /** Token-distribution drift report: per-group KL divergence between
    * the group's hashed-unigram distribution and the whole corpus's —
    * the mixture-drift monitor a pipeline runs when a new crawl
    * snapshot or source lands (`KL(p_group ‖ p_corpus)` over hashed
    * token buckets, add-one smoothed). Near-zero = the group looks like
    * the corpus; large = vocabulary drift worth a look.
    *
    * Plan shape: one tokenize → per-(group, bucket) partial-agg counts;
    * the corpus histogram derives from the group histogram (sum over
    * groups — `groups × buckets` rows, not a second corpus pass); KL
    * sums over the FULL group × bucket grid (model-sized), not just the
    * observed support — under add-one smoothing the unobserved buckets
    * carry positive mass, and dropping them biases KL negative; the
    * per-bucket KL term is rounded to integer micro-nats so the
    * per-group sum is exact and order-independent.
    *
    * Returns `(group, n_tokens, kl_divergence)` — KL in nats, one row
    * per group.
    */
  def tokenDriftReport(docs: DataFrame, textCol: String, groupCol: Column,
      buckets: Int = 256): DataFrame = {
    val tok = docs
      .select(groupCol.as("__g"), explode(toks(col(textCol))).as("__tok"))
      .select(col("__g"), bucketOf(col("__tok"), buckets).as("__b"))
    val gb = tok.groupBy(col("__g"), col("__b")).agg(count(lit(1)).as("c"))
    val gt = gb.groupBy(col("__g")).agg(sum(col("c")).as("tg"))
    val corpus = gb.groupBy(col("__b")).agg(sum(col("c")).as("cc"))
    val tot = corpus.agg(sum(col("cc")).as("tc"))
    val b = lit(buckets.toDouble)
    val pg = (col("c") + lit(1.0)) / (col("tg") + b)
    val pc = (col("cc") + lit(1.0)) / (col("tc") + b)
    gt.select(col("__g"), col("tg"), // groups × ALL-buckets grid
        explode(sequence(lit(0L), lit(buckets - 1L))).as("__b"))
      .join(broadcast(corpus), Seq("__b"), "left_outer")
      .na.fill(0L, Seq("cc"))
      .join(gb, Seq("__g", "__b"), "left_outer")
      .na.fill(0L, Seq("c"))
      .crossJoin(broadcast(tot))
      .select(col("__g"), col("tg"),
        round(pg * log(pg / pc) * lit(1000000.0)).cast("long").as("term"))
      .groupBy(col("__g"))
      .agg(max(col("tg")).as("n_tokens"), sum(col("term")).as("__kl"))
      .select(col("__g").as("group"), col("n_tokens"),
        round(col("__kl").cast("double") / lit(1000000.0), 6).as("kl_divergence"))
  }

  /** Hashed-linear quality classifier (the fastText inference shape):
    * tokens hash into `buckets` bag-of-words features, the score is
    * `bias + Σ_b tf_b · w_b` with tf the within-doc bucket frequency,
    * and the keep decision is `sigmoid(score) ≥ 0.5`. Weights are a
    * deterministic ±1 pseudo-random function of the bucket id
    * (md5-window, so the oracle replays inference exactly); swapping in
    * trained weights changes ONE projected expression — or a broadcast
    * weight-table join for vocabularies too wide for a literal.
    *
    * Plan shape: tokenize → bucket → per-token weight as pure column
    * algebra → ONE partial-aggregated shuffle on the doc id (summing
    * per-token weights directly equals the Σ_b tf_b·w_b formulation
    * exactly because the sums are integer milli-units — and saves the
    * per-(doc, bucket) pre-aggregation's second exchange; pinned by
    * PlanAuditSpec). No driver state, no UDF; weights only become
    * doubles in the final per-doc division.
    *
    * Returns `(id, n_tokens, score, prob, keep)` per document with at
    * least one token.
    */
  def hashedLinearQuality(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int = 512, bias: Double = -0.1): DataFrame = {
    val tok = docs
      .select(col(idCol).as("__id"), explode(toks(col(textCol))).as("__tok"))
      .select(col("__id"), bucketOf(col("__tok"), buckets).as("__b"))
    // w_b ∈ {-1000..1000} milli-units, a fixed pseudo-weight per bucket
    val wMilli = pmod(conv(substring(md5(concat(lit("w"), col("__b"))), 1, 15), 16, 10)
      .cast("long"), lit(2001L)) - lit(1000L)
    val score = lit(bias) +
      (col("__sum").cast("double") / lit(1000.0)) / col("n_tokens").cast("double")
    tok.select(col("__id"), wMilli.as("w"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("w")).as("__sum"))
      .select(col("__id").as(idCol), col("n_tokens"),
        round(score, 6).as("score"),
        round(lit(1.0) / (lit(1.0) + exp(-round(score, 6))), 6).as("prob"),
        (round(score, 6) >= 0).as("keep"))
  }
}
