package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level statistics for LLM training-data curation: repetition
  * quality rules (Gopher-style), corpus TF-IDF, and cross-document span
  * dedup. These are the operators that only make sense over the WHOLE
  * corpus (global document frequencies, cross-doc span counts) — unlike
  * the per-document metrics in [[graft.functions.TextFunctions]].
  *
  * Scale notes: every aggregation here is partial-aggregatable (token
  * and span counts combine map-side before the shuffle); the only wide
  * exchanges are on token/span hash keys, which are uniformly
  * distributed by construction. Nothing is collected to the driver.
  */
object CorpusStats {

  /** Lowercased whitespace tokens of `textCol`, shared by the metrics. */
  private def toks(textCol: Column): Column = TextFunctions.tokens(lower(textCol))

  /** Gopher-style repetition/quality signals per document (public rules
    * from the Gopher corpus-filtering appendix — fraction of tokens in
    * the most common token / 2-gram, unique-token fraction): documents
    * dominated by a few repeated tokens are boilerplate or spam.
    *
    * Returns one row per input document:
    * (id, n_tokens, frac_unique, top_token_frac, top_bigram_frac, keep)
    * with keep = top_token_frac ≤ maxTopTokenFrac AND frac_unique ≥
    * minUniqueFrac. Zero-token documents keep=false.
    */
  def gopherQuality(docs: DataFrame, idCol: String, textCol: String,
      maxTopTokenFrac: Double = 0.1, minUniqueFrac: Double = 0.4): DataFrame = {
    val base = docs.select(col(idCol), toks(col(textCol)).as("__lt"))
    val tokCounts = base
      .select(col(idCol), explode(col("__lt")).as("__w"))
      .groupBy(idCol, "__w").agg(count(lit(1)).as("__c"))
    val uni = tokCounts.groupBy(idCol).agg(
      sum("__c").as("n_tokens"), max("__c").as("__top_c"),
      count(lit(1)).as("__n_uniq"))
    // adjacent (non-distinct) bigrams; docs under 2 tokens have none
    val bigrams = base
      .select(col(idCol), explode(when(size(col("__lt")) >= 2,
        transform(sequence(lit(1), size(col("__lt")) - 1),
          i => concat_ws(" ", element_at(col("__lt"), i), element_at(col("__lt"), i + 1))))
        .otherwise(array())).as("__b"))
      .groupBy(idCol, "__b").agg(count(lit(1)).as("__c"))
      .groupBy(idCol).agg(max("__c").as("__top_b"), sum("__c").as("__n_bi"))
    val fu = col("__n_uniq").cast("double") / col("n_tokens")
    val ft = col("__top_c").cast("double") / col("n_tokens")
    val fb = col("__top_b").cast("double") / col("__n_bi")
    docs.select(col(idCol))
      .join(uni, Seq(idCol), "left_outer")
      .join(bigrams, Seq(idCol), "left_outer")
      .select(
        col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(coalesce(fu, lit(0.0)), 6).as("frac_unique"),
        round(coalesce(ft, lit(0.0)), 6).as("top_token_frac"),
        round(coalesce(fb, lit(0.0)), 6).as("top_bigram_frac"),
        coalesce(ft <= maxTopTokenFrac && fu >= minUniqueFrac, lit(false)).as("keep"))
  }

  /** Corpus TF-IDF: per document, the top-k tokens by tf·ln(N/df) where
    * df counts documents containing the token and N is the corpus size.
    * The document-frequency join is left to AQE: on a web corpus the
    * whitespace-token vocabulary (typos, URLs, IDs) can reach billions
    * of distinct terms, so a forced broadcast would bet the driver's
    * memory on it — AQE broadcasts when dfreq is actually small and
    * shuffle-joins on term (uniform hash keys) when it isn't. Ties
    * break on the token string, so ranks are deterministic.
    */
  def tfIdfTopK(docs: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    val tf = docs.select(col(idCol), explode(toks(col(textCol))).as("term"))
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("__df"))
    val n = docs.select(count(lit(1)).as("__n"))
    val w = Window.partitionBy(idCol).orderBy(col("tfidf").desc, col("term").asc)
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf", col("tf") * log(col("__n").cast("double") / col("__df")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), round(col("tfidf"), 6).as("tfidf"),
        col("rank").cast("long").as("rank"))
  }

  /** Okapi BM25 retrieval (Robertson & Walker; the Lucene-standard
    * non-negative IDF variant): for each query, the top-`k` documents by
    * `Σ_{t∈q} idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b + b·|d|/avgdl))`
    * with `idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))`. Query terms are
    * DISTINCT (binary query-side tf, the common retrieval convention).
    * This is the lexical-retrieval primitive next to [[tfIdfTopK]] — the
    * sparse half of a RAG/hard-negative mining stack (the dense half is
    * [[Similarity]]'s ANN).
    *
    * Scale shape: one corpus-wide (doc, term) shuffle builds tf; doc
    * lengths and document frequencies re-aggregate from that table (its
    * size, not the corpus's); query terms broadcast (query sets are
    * model-sized); the df join is left to AQE exactly like tfIdfTopK
    * (billion-term vocabularies must not be forced broadcast); the
    * top-k is a per-query row_number window over candidate docs only.
    *
    * Determinism: per-term scores are rounded to 6 decimals and summed
    * in exact micro-unit integers (sum order cannot perturb the total),
    * and ranking orders by that integer with a doc-id tie-break — a
    * libm ulp cannot flip a rank. Returns
    * (query_id, doc_id, score, rank), score = micro-sum / 1e6.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qIdCol: String, qTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, "k must be positive")
    // tf is consumed four times (candidate join, doc lengths, document
    // frequencies, corpus totals) — materialize the one tokenize+groupBy
    // pass instead of re-running it per consumer (same contract as the
    // bigram-LM trainer's scratch)
    val tf = graft.core.Scratch.materialize(
      docs.select(col(idCol).as("__doc"), explode(toks(col(textCol))).as("term"))
        .groupBy("__doc", "term").agg(count(lit(1)).as("tf")),
      "bm25_tf", s"$idCol|$textCol|$k1|$b|${graft.core.Scratch.planKey(docs)}")
    val docLen = tf.groupBy("__doc").agg(sum("tf").as("dl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("__df"))
    val stats = docs.agg(count(lit(1)).as("__n"))
      .crossJoin(docLen.agg(sum(col("dl")).as("__tl")))
    val qTerms = queries.select(col(qIdCol).as("query_id"),
      explode(array_distinct(toks(col(qTextCol)))).as("term"))
    val avgdl = col("__tl").cast("double") / col("__n").cast("double")
    val idf = log(lit(1.0) +
      (col("__n").cast("double") - col("__df").cast("double") + lit(0.5)) /
        (col("__df").cast("double") + lit(0.5)))
    val tfd = col("tf").cast("double")
    val term = idf * tfd * lit(k1 + 1.0) /
      (tfd + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    val scored = tf
      .join(broadcast(qTerms), Seq("term"))
      .join(dfreq, Seq("term"))
      .join(docLen, Seq("__doc"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("__doc"),
        round(round(term, 6) * lit(1e6)).cast("long").as("__micro"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__s").desc, col("__doc").asc)
    scored.groupBy(col("query_id"), col("__doc"))
      .agg(sum(col("__micro")).as("__s"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("__doc").as("doc_id"),
        round(col("__s").cast("double") / lit(1e6), 6).as("score"),
        col("rank").cast("long").as("rank"))
  }

  /** Cross-document span dedup stats: distinct word `n`-gram spans per
    * document (md5-window hashed — 8-byte shuffle keys the DuckDB oracle
    * can recompute, never span strings), counted across the corpus with
    * ONE exchange (a count window over the span hash, not a
    * re-aggregate + self-join). Returns per document:
    * (id, n_spans, n_shared_spans, shared_frac) where a span is shared
    * when it appears in more than one document — the C4/RefinedWeb-style
    * signal for cross-doc boilerplate.
    */
  /** Distinct word-`n`-gram span hashes per document: one row per
    * (id, 8-byte md5-window hash). Shared by [[spanDedupStats]] and
    * [[decontaminate]]; hashing keeps shuffle keys fixed-width and lets
    * the DuckDB oracle recompute them.
    */
  private def spanHashes(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    // coalesce: under ANSI size(NULL) is NULL, which would skip the
    // empty guard; a NULL-text doc must emit zero spans like an empty
    // one (the DuckDB twin's `len(lt) > 0` filters NULL the same way)
    val lt = coalesce(toks(col(textCol)), array().cast("array<string>"))
    val idx = sequence(lit(0), greatest(size(lt) - lit(n), lit(0)))
    // Zero-token documents emit NO spans (not one md5('') span — that
    // would make every pair of empty docs count as "shared" and flag
    // every empty doc as benchmark-contaminated); docs shorter than n
    // emit their single partial span.
    val spans = when(size(lt) <= 0, array().cast("array<string>"))
      .otherwise(array_distinct(transform(idx, i => concat_ws(" ", slice(lt, i + 1, lit(n))))))
    docs.select(col(idCol), explode(spans).as("__sp"))
      .select(col(idCol),
        expr("CAST(conv(substring(md5(__sp), 1, 15), 16, 10) AS BIGINT)").as("__h"))
  }

  def spanDedupStats(docs: DataFrame, idCol: String, textCol: String, n: Int = 8): DataFrame = {
    val hashed = spanHashes(docs, idCol, textCol, n)
    val withCount = hashed
      .withColumn("__nd", count(lit(1)).over(Window.partitionBy("__h")))
    val perDoc = withCount.groupBy(idCol).agg(
      count(lit(1)).as("n_spans"),
      sum(when(col("__nd") > 1, 1L).otherwise(0L)).as("n_shared_spans"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left_outer")
      .select(
        col(idCol),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_shared_spans"), lit(0L)).as("n_shared_spans"),
        round(coalesce(col("n_shared_spans").cast("double") / col("n_spans"), lit(0.0)), 6)
          .as("shared_frac"))
  }

  /** Benchmark decontamination (the GPT-3/PaLM-style eval-overlap check):
    * flag corpus documents sharing any word `n`-gram with the benchmark
    * set. Returns one row per corpus document:
    * (id, n_spans, n_benchmark_spans, contaminated).
    *
    * The benchmark side is eval-suite sized (thousands of documents, not
    * billions), so its distinct span-hash set broadcasts and the corpus
    * side needs one scan + one per-document aggregation — no shuffle of
    * span strings, no join ordering risk at 100 TB.
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 8): DataFrame = {
    val benchSpans = broadcast(
      spanHashes(benchmark, idCol, textCol, n).select(col("__h")).distinct())
    val perDoc = spanHashes(corpus, idCol, textCol, n)
      .join(benchSpans.withColumn("__inb", lit(1)), Seq("__h"), "left_outer")
      .groupBy(idCol).agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("__inb").isNotNull, 1L).otherwise(0L)).as("n_benchmark_spans"))
    corpus.select(col(idCol))
      .join(perDoc, Seq(idCol), "left_outer")
      .select(
        col(idCol),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_benchmark_spans"), lit(0L)).as("n_benchmark_spans"),
        coalesce(col("n_benchmark_spans") > 0, lit(false)).as("contaminated"))
  }

  /** PII redaction (the C4/CCNet-style pre-training scrub): replace
    * emails, North-American phone numbers, and dotted-quad IPs with
    * `[EMAIL]`/`[PHONE]`/`[IP]` markers and count each class per
    * document. Pure `regexp_replace`/`regexp_count` Columns — codegen'd,
    * map-only, no shuffle at any corpus size. The patterns avoid
    * lookarounds so Java regex (Spark) and RE2 (the DuckDB oracle)
    * match identically. Emails are replaced before IPs so a digit-quad
    * inside a rewritten email domain can't double-redact; counts are
    * taken on the ORIGINAL text for the same reason.
    */
  def piiScrub(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
    val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val t = col(textCol)
    docs.select(
      col(idCol),
      regexp_replace(regexp_replace(regexp_replace(
        t, email, "[EMAIL]"), phone, "[PHONE]"), ip, "[IP]").as("clean_text"),
      coalesce(regexp_count(t, lit(email)).cast("long"), lit(0L)).as("n_emails"),
      coalesce(regexp_count(t, lit(phone)).cast("long"), lit(0L)).as("n_phones"),
      coalesce(regexp_count(t, lit(ip)).cast("long"), lit(0L)).as("n_ips"))
  }

  /** Within-document repetition removal (the RefinedWeb/MassiveText
    * intra-doc dedup step): chunk each document into fixed `k`-token
    * units and keep the first occurrence of each distinct unit.
    * Deterministic fixed-width chunking (not sentence splitting) so the
    * operation is reproducible across engines and scales; per-row array
    * algebra only — map-only, no shuffle. `array_distinct` preserves
    * first-occurrence order, which is the keep-first semantic.
    * Returns (id, clean_text, n_chunks, n_removed).
    */
  def dedupChunks(docs: DataFrame, idCol: String, textCol: String, k: Int = 10): DataFrame = {
    require(k > 0, "chunk size must be positive")
    // coalesce: under ANSI size(NULL) is NULL (not -1), which would
    // sneak NULL-text docs past the empty guard into the chunk builder
    val lt = coalesce(toks(col(textCol)), array().cast("array<string>"))
    val nChunks = ceil(size(lt).cast("double") / k).cast("int")
    val chunks = when(size(lt) <= 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), nChunks - 1),
        i => concat_ws(" ", slice(lt, i * k + 1, lit(k)))))
    // staged projections: the chunking pass and the distinct pass are
    // interpreted higher-order expressions referenced more than once, so
    // each gets its own alias (CollapseProject keeps multiply-referenced
    // non-trivial aliases un-inlined — one evaluation each)
    docs.select(col(idCol), chunks.as("__ch"))
      .select(col(idCol), col("__ch"), array_distinct(col("__ch")).as("__kept"))
      .select(
        col(idCol),
        concat_ws(" ", col("__kept")).as("clean_text"),
        size(col("__ch")).cast("long").as("n_chunks"),
        (size(col("__ch")) - size(col("__kept"))).cast("long").as("n_removed"))
  }

  /** Sequence packing (the GPT-style concat-and-chunk step that turns a
    * curated corpus into fixed-budget training sequences): documents are
    * concatenated in `orderCol` order within each `shardCol` group, the
    * token stream is cut every `packTokens` tokens, and each document
    * reports the pack(s) its tokens land in — one output row per
    * (document, pack) with the in-pack slice. Documents may straddle a
    * pack boundary, exactly like the real packing step.
    *
    * Scale shape: one window (cumulative token count) per shard + an
    * explode bounded by tokens/packTokens — no joins, no driver state.
    * The shard column (source file / date bucket) is what bounds window
    * width at 100 TB; packing is deterministic given (shard, order), so
    * re-runs and engines agree. Zero-token documents land in no pack.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      shardCol: String, orderCol: String, packTokens: Int): DataFrame = {
    require(packTokens > 0, "pack size must be positive")
    val counted = docs.select(col(shardCol).as("shard"), col(orderCol).as("__ord"),
      col(idCol), coalesce(size(toks(col(textCol))), lit(0)).cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("shard")).orderBy(col("__ord"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val offs = counted
      .withColumn("end_off", sum(col("n_tokens")).over(w))
      .withColumn("start_off", col("end_off") - col("n_tokens"))
      .filter(col("n_tokens") > 0)
      // integer `div`, not floor(double /): cumulative per-shard token
      // offsets past 2^53 would lose exactness under double division —
      // a silent caveat for an operator pitched at 100 TB corpora.
      .withColumn("first_pack", expr(s"start_off div $packTokens"))
      .withColumn("last_pack", expr(s"(end_off - 1) div $packTokens"))
    offs.select(col("shard"), col(idCol), col("n_tokens"),
      col("start_off"), col("end_off"),
      explode(sequence(col("first_pack"), col("last_pack"))).as("pack_id"))
      .select(col("shard"), col(idCol), col("pack_id"), col("n_tokens"),
        // the slice of THIS document that lands in THIS pack
        (greatest(col("start_off"), col("pack_id") * packTokens)
          - col("start_off")).as("doc_slice_start"),
        (least(col("end_off"), (col("pack_id") + 1) * packTokens)
          - col("start_off")).as("doc_slice_end"))
  }

  /** Overlapping token-window chunking — the retrieval/context-window
    * preprocessing step: split each document into windows of
    * `windowTokens` whitespace tokens advancing by `strideTokens`
    * (stride < window ⇒ overlap). Chunk count is
    * `1 + max(0, ceil((n - window) / stride))`, so every token is
    * covered and only the final chunk may run short — the Hugging-Face
    * `return_overflowing_tokens` convention.
    *
    * Map-only: tokenize + per-row bounded explode, no shuffle, no
    * driver state — embarrassingly parallel at any corpus size. Chunk
    * ids are per-document, so re-chunking is reproducible under any
    * partitioning. Empty documents emit one empty chunk (chunk_id 0),
    * keeping doc_id coverage total.
    *
    * Returns (idCol, chunk_id, n_tokens, chunk_text).
    */
  def chunkTokenWindows(docs: DataFrame, idCol: String, textCol: String,
      windowTokens: Int, strideTokens: Int): DataFrame = {
    require(windowTokens > 0, "window must be positive")
    require(strideTokens > 0 && strideTokens <= windowTokens,
      "stride must be in (0, window]")
    val t = docs.select(col(idCol),
      TextFunctions.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", coalesce(size(col("__toks")), lit(0)).cast("long"))
      .withColumn("__nc", lit(1L) + greatest(lit(0L),
        ceil((col("__n") - lit(windowTokens)).cast("double") / strideTokens).cast("long")))
    t.select(col(idCol), col("__toks"), col("__n"),
      explode(sequence(lit(0L), col("__nc") - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        least(lit(windowTokens.toLong), col("__n") - col("chunk_id") * strideTokens)
          .as("n_tokens"),
        concat_ws(" ",
          slice(col("__toks"), (col("chunk_id") * strideTokens + 1).cast("int"),
            lit(windowTokens))).as("chunk_text"))
  }

  /** C4-style blocklist scrub: drop blocklisted tokens from each
    * document. Returns (id, clean_text, n_tokens, n_removed). The
    * blocklist is a literal array in the plan (codegen'd `array_contains`
    * per token — no UDF, no broadcast needed at any corpus size).
    */
  def blocklistScrub(docs: DataFrame, idCol: String, textCol: String,
      blocklist: Seq[String]): DataFrame = {
    val bl = typedLit(blocklist.map(_.toLowerCase))
    val lt = toks(col(textCol))
    val kept = filter(lt, t => !array_contains(bl, t))
    docs.select(
      col(idCol),
      concat_ws(" ", kept).as("clean_text"),
      size(lt).cast("long").as("n_tokens"),
      (size(lt) - size(kept)).cast("long").as("n_removed"))
  }

  /** The `depth` Kirsch–Mitzenmacher cell coordinates of a token:
    * row d hashes to `(h1 + d·h2) mod width`, with (h1, h2) the MD5
    * windows the dedup stack uses ([[graft.functions.Md5Hash]]) — so a
    * DuckDB oracle can rebuild the identical sketch. h1 < 2⁶⁰ and
    * h2 < 2⁵⁶, so `h1 + d·h2` stays far from Long overflow for any
    * practical depth (ANSI mode would throw on wrap). Pure Column
    * algebra — codegen'd, no UDF.
    */
  private def cmsCells(tok: Column, depth: Int, width: Int): Column = {
    val m = md5(tok)
    val h1 = conv(substring(m, 1, 15), 16, 10).cast("long")
    val h2 = conv(substring(m, 16, 14), 16, 10).cast("long")
    transform(sequence(lit(0), lit(depth - 1)),
      d => struct(d.cast("int").as("d"), pmod(h1 + d * h2, lit(width.toLong)).as("w")))
  }

  /** Count–Min sketch of the corpus token frequencies: a fixed
    * `depth × width` grid of counters built in ONE pass (explode tokens
    * → explode the depth cells → one partial-aggregated count). The
    * sketch is the 100 TB answer to "how often does X occur" when the
    * exact per-key table is itself too big: memory is O(depth·width)
    * REGARDLESS of corpus size or cardinality, estimates never
    * undercount, and sketches of corpus shards merge by cell-wise
    * addition (partial aggregation IS the merge). Returns sparse
    * (d, w, cnt) cells — zero cells are implicit.
    */
  def cmsSketch(docs: DataFrame, textCol: String,
      depth: Int = 4, width: Int = 1024): DataFrame =
    docs.select(explode(toks(col(textCol))).as("tok"))
      .select(explode(cmsCells(col("tok"), depth, width)).as("c"))
      .groupBy(col("c.d").as("d"), col("c.w").as("w"))
      .agg(count(lit(1)).as("cnt"))

  /** Domain-mixture resampling: select the largest corpus subset whose
    * domain shares hit `weights` exactly (up to flooring). The classic
    * pretraining-mix operation — "rebalance this crawl to 40% web /
    * 30% wiki / …" — solved by scaling: λ = min over weighted domains
    * of available/target, per-domain quota = ⌊λ·target⌋, then each
    * domain keeps its quota in deterministic md5-of-id order, so
    * membership is a pure function of the ids — reproducible at any
    * partitioning and auditable by any engine (same property as
    * t_split_assign).
    *
    * Scale: availability counts are domain-cardinality (a model-sized
    * driver collect, like k-means centroids); quotas broadcast back.
    * Exact quotas need a per-domain rank — ONE shuffle on the domain
    * key; if a single domain's row count exceeds a task's sort budget
    * at extreme scale, the stateless alternative is a hash-rate filter
    * `h % M < rate·M` (approximate quota, zero shuffle) — this
    * implementation keeps the exact contract. Domains absent from
    * `weights` are dropped; weighted domains absent from the corpus
    * would make the mix infeasible and throw.
    */
  def mixtureResample(docs: DataFrame, idCol: String, domainCol: String,
      weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val avail = docs.groupBy(col(domainCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => String.valueOf(r.get(0)) -> r.getLong(1)).toMap
    val missing = weights.keySet -- avail.keySet
    require(missing.isEmpty, s"weighted domains absent from corpus: $missing")
    val lambda = weights.map { case (dom, t) => avail(dom).toDouble / t }.min
    val quotas = weights.toSeq.map { case (dom, t) =>
      (dom, math.floor(lambda * t).toLong) }
    val quotaDf = quotas.toDF(domainCol, "__quota")
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol)).orderBy(h, col(idCol))
    docs.join(broadcast(quotaDf), Seq(domainCol))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= col("__quota"))
      .drop("__quota", "__rk")
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-ES,
    * Inf. Proc. Letters 2006): item i gets key −ln(uᵢ)/wᵢ and the n
    * SMALLEST keys are the sample — inclusion probability proportional
    * to weight, drawn in one pass with no rejection loop. uᵢ is a
    * deterministic md5-window uniform of the id (the house trick every
    * sampler here uses), so membership is a pure function of (id,
    * weight, n): reproducible at any partitioning and replayable by the
    * oracle. Keys are rounded to 12 decimals before ranking (id
    * tie-break) so a last-ulp libm difference between engines can't
    * flip a rank.
    *
    * Scale shape: map-side key computation + distributed top-n
    * (`orderBy.limit` plans TakeOrderedAndProject — per-partition heaps,
    * no global sort); the rank window afterwards runs on n rows only.
    * The 100 TB use: quality-weighted corpus subsampling where w =
    * quality score or token count.
    *
    * Returns (idCol, weightCol, key, rank), rank 1..n by ascending key.
    */
  def weightedSample(docs: DataFrame, idCol: String, weightCol: String,
      n: Int): DataFrame = {
    require(n > 0, "sample size must be positive")
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val u = (pmod(h, lit(1000000000L)).cast("double") + 0.5) / 1e9
    val key = round(-log(u) / col(weightCol), 12)
    val top = docs
      .filter(col(weightCol) > 0)
      .select(col(idCol), col(weightCol), key.as("key"))
      .orderBy(col("key").asc, col(idCol).asc)
      .limit(n)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("key").asc, col(idCol).asc)
    top.withColumn("rank", row_number().over(w))
  }

  /** HyperLogLog registers over a column: `(idx, rho)` with
    * idx = top `p` bits of a 60-bit md5-derived hash and rho = leading-
    * zero rank of the remaining bits — ONE partial-aggregated max per
    * register, so sketches of shards merge by register-wise max exactly
    * like CMS cells merge by addition. Like the other sketches, the
    * md5-window hash makes the whole register grid deterministic and
    * replayable by any engine (the oracle rebuilds it bit-for-bit in
    * SQL), where a library HLL's internal hash would be unverifiable.
    * Memory is O(2^p) regardless of cardinality — the 100 TB answer to
    * COUNT(DISTINCT) when the key set itself doesn't fit anywhere.
    */
  def hllRegisters(df: DataFrame, valueCol: Column, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"p=$p out of range")
    val rest = 60 - p
    val h = conv(substring(md5(valueCol.cast("string")), 1, 15), 16, 10).cast("long")
    // rho via bin()-string length, not floor(log2(double)): for r > 0,
    // floor(log2 r) = length(bin(r)) - 1 in exact integer logic, immune
    // to the libm ulp differences that make floor(log2(2^k)) engine-
    // dependent right at the power-of-two boundaries registers live on.
    df.select(h.as("__h"))
      .select(shiftright(col("__h"), rest).as("idx"),
        (col("__h").bitwiseAND(lit((1L << rest) - 1))).as("__r"))
      .select(col("idx"),
        when(col("__r") === 0, lit(rest + 1))
          .otherwise(lit(rest + 1) - length(bin(col("__r"))))
          .cast("int").as("rho"))
      .groupBy(col("idx"))
      .agg(max(col("rho")).as("rho"))
  }

  /** Flajolet's HLL estimate from [[hllRegisters]]: harmonic mean over
    * all 2^p registers (absent register = 0 → 2⁰ term), with the
    * small-range linear-counting correction. Returns one row
    * `(m, n_present, est)`. The harmonic sum Σ 2^-rho is accumulated as
    * the EXACT integer Σ 2^(maxRho - rho) (each term a power of two,
    * total < 2^61) and scaled to double once at the end — a float sum
    * would round differently per aggregation order, breaking replay;
    * after that the estimate is one fixed IEEE expression any engine
    * reproduces bit-for-bit.
    */
  def hllEstimate(registers: DataFrame, p: Int = 8): DataFrame = {
    val m = 1 << p
    val maxRho = 60 - p + 1
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val scale = math.pow(2.0, maxRho)
    registers
      .agg(count(lit(1)).as("n_present"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $maxRho - rho)")).as("__si"))
      .select(lit(m).as("m"), col("n_present"),
        (lit(alpha * m.toDouble * m) /
          (col("__si").cast("double") / lit(scale) +
            (lit(m) - col("n_present")))).as("__e"),
        (lit(m) - col("n_present")).cast("double").as("__z"))
      .select(col("m"), col("n_present"),
        when(col("__e") <= lit(2.5 * m) && col("__z") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("__z")))
          .otherwise(col("__e")).as("est"))
  }

  /** Per-group [[hllRegisters]]: `(grp, idx, rho)` — the register grid
    * keyed by group, one partial-aggregated max per (group, register).
    * A billion-group COUNT(DISTINCT) becomes one shuffle of
    * 2^p-rows-per-group sketch rows that merge by register-wise max.
    */
  def hllRegistersBy(df: DataFrame, groupCol: Column, valueCol: Column,
      p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"p=$p out of range")
    val rest = 60 - p
    val h = conv(substring(md5(valueCol.cast("string")), 1, 15), 16, 10).cast("long")
    df.select(groupCol.as("grp"), h.as("__h"))
      .select(col("grp"), shiftright(col("__h"), rest).as("idx"),
        (col("__h").bitwiseAND(lit((1L << rest) - 1))).as("__r"))
      .select(col("grp"), col("idx"),
        when(col("__r") === 0, lit(rest + 1))
          .otherwise(lit(rest + 1) - length(bin(col("__r"))))
          .cast("int").as("rho"))
      .groupBy(col("grp"), col("idx"))
      .agg(max(col("rho")).as("rho"))
  }

  /** Per-group [[hllEstimate]]: `(grp, m, n_present, est)` — the same
    * exact-integer harmonic sum and linear-counting correction, one row
    * per group.
    */
  def hllEstimateBy(registers: DataFrame, p: Int = 8): DataFrame = {
    val m = 1 << p
    val maxRho = 60 - p + 1
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val scale = math.pow(2.0, maxRho)
    registers
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_present"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $maxRho - rho)")).as("__si"))
      .select(col("grp"), lit(m).as("m"), col("n_present"),
        (lit(alpha * m.toDouble * m) /
          (col("__si").cast("double") / lit(scale) +
            (lit(m) - col("n_present")))).as("__e"),
        (lit(m) - col("n_present")).cast("double").as("__z"))
      .select(col("grp"), col("m"), col("n_present"),
        when(col("__e") <= lit(2.5 * m) && col("__z") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("__z")))
          .otherwise(col("__e")).as("est"))
  }

  /** Point estimates from a [[cmsSketch]]: est(token) = min over the
    * depth rows of that token's cell counts (absent cell = 0). The
    * sketch is tiny (≤ depth·width rows) and broadcasts; probes stream.
    * CMS guarantees est ≥ true count.
    */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, tokenCol: String,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    val cells = probes
      .select(col(tokenCol).as("token"))
      .select(col("token"), explode(cmsCells(lower(col("token")), depth, width)).as("c"))
      .select(col("token"), col("c.d").as("d"), col("c.w").as("w"))
    cells.join(broadcast(sketch), Seq("d", "w"), "left_outer")
      .groupBy(col("token"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
  }

  /** Per-group [[cmsSketch]]: one `depth × width` grid per group value
    * (sparse `(grp, d, w, cnt)` rows), still one corpus pass and still
    * partial-aggregatable — the per-group frequency monitor when the
    * exact per-(group, token) table is too big. Memory is
    * O(groups · depth · width); grids of corpus shards merge cell-wise
    * like the global sketch. Completes the grouped-sketch family next
    * to [[hllRegistersBy]] and [[Sketches.histogramBy]].
    */
  def cmsSketchBy(docs: DataFrame, groupCol: Column, textCol: String,
      depth: Int = 4, width: Int = 1024): DataFrame =
    docs.select(groupCol.as("grp"), explode(toks(col(textCol))).as("tok"))
      .select(col("grp"), explode(cmsCells(col("tok"), depth, width)).as("c"))
      .groupBy(col("grp"), col("c.d").as("d"), col("c.w").as("w"))
      .agg(count(lit(1)).as("cnt"))

  /** Per-group point estimates: min over the depth rows of each group's
    * grid for every (group, probe token) pair — over the FULL
    * group × probe-cell grid, because a group whose grid lacks one of
    * the token's cells must estimate 0, not the min of the cells it
    * does have. Probes × groups is model-sized; the sketch broadcasts. */
  def cmsEstimateBy(sketch: DataFrame, probes: DataFrame, tokenCol: String,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    val cells = probes
      .select(col(tokenCol).as("token"))
      .select(col("token"), explode(cmsCells(lower(col("token")), depth, width)).as("c"))
      .select(col("token"), col("c.d").as("d"), col("c.w").as("w"))
    val groups = sketch.select(col("grp")).distinct()
    cells.crossJoin(broadcast(groups))
      .join(broadcast(sketch), Seq("grp", "d", "w"), "left_outer")
      .groupBy(col("grp"), col("token"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
  }

  /** Training-mixture report per domain/source: document and token
    * counts, token share, and the mixture's Shannon entropy (nats) —
    * the one-look summary of how a corpus is balanced before sampling
    * weights are chosen. Entropy terms −p·ln(p) are rounded to
    * micro-nat LONGs per domain and summed exactly, so the scalar is
    * partition-order free; the per-domain share divides exact token
    * counts once. One partial-aggregatable shuffle on the domain key;
    * the domain table itself is model-sized (every downstream step is
    * a window over it).
    */
  def domainMixReport(docs: DataFrame, domainCol: Column, textCol: String): DataFrame = {
    val counts = docs
      .select(domainCol.as("domain"), size(toks(col(textCol))).as("__nt"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__nt").cast("long")).as("n_tokens"))
    val w = Window.partitionBy()
    val withTotal = counts.withColumn("__tot", sum(col("n_tokens")).over(w))
    val share = col("n_tokens").cast("double") / col("__tot").cast("double")
    withTotal
      .withColumn("token_share", share)
      .withColumn("__ent_term",
        round(when(col("n_tokens") > 0, -share * log(share)).otherwise(lit(0.0)) *
          lit(1000000.0), 0).cast("long"))
      .withColumn("mix_entropy",
        sum(col("__ent_term")).over(w).cast("double") / lit(1000000.0))
      .select(col("domain"), col("n_docs"), col("n_tokens"),
        col("token_share"), col("mix_entropy"))
  }

  /** Zipf-law slope of the token-frequency distribution per group — the
    * corpus-health diagnostic (natural text sits near slope ≈ −1;
    * template/boilerplate-heavy or synthetic slices drift off it, so a
    * per-source slope report flags degenerate slices before training).
    *
    * Least-squares fit of ln(freq) ~ ln(rank) over each group's top
    * `topRanks` tokens (rank by count desc, token asc — deterministic).
    * Numeric policy: each regression term (x, y, x², xy in nano/pico
    * units) is rounded to an integer LONG per row, so the four sums are
    * exact and partial-aggregatable in any partition order; the slope
    * divides the exact sums once at the end. One token-count shuffle +
    * one bounded (groups × topRanks) window — at 100 TB the count agg
    * is the only corpus-sized exchange, and it map-combines.
    */
  def zipfSlope(docs: DataFrame, groupCol: Column, textCol: String,
      topRanks: Int = 100): DataFrame = {
    require(topRanks >= 3, s"topRanks=$topRanks needs >= 3 points to fit")
    val counts = docs
      .select(groupCol.as("grp"), explode(toks(col(textCol))).as("tok"))
      .groupBy(col("grp"), col("tok")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("c").desc, col("tok"))
    val ranked = counts.withColumn("r", row_number().over(w))
      .filter(col("r") <= topRanks)
    val x = log(col("r").cast("double"))
    val y = log(col("c").cast("double"))
    val terms = ranked.select(col("grp"),
      round(x * lit(1e9), 0).cast("long").as("tx"),
      round(y * lit(1e9), 0).cast("long").as("ty"),
      round(x * x * lit(1e12), 0).cast("long").as("txx"),
      round(x * y * lit(1e12), 0).cast("long").as("txy"))
    terms.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("tx")).as("sx"), sum(col("ty")).as("sy"),
        sum(col("txx")).as("sxx"), sum(col("txy")).as("sxy"))
      .filter(col("n") >= 3)
      .withColumn("slope",
        (col("n").cast("double") * (col("sxy").cast("double") / lit(1e12)) -
          (col("sx").cast("double") / lit(1e9)) * (col("sy").cast("double") / lit(1e9))) /
          (col("n").cast("double") * (col("sxx").cast("double") / lit(1e12)) -
            (col("sx").cast("double") / lit(1e9)) * (col("sx").cast("double") / lit(1e9))))
      .select(col("grp"), col("n"), col("slope"))
  }

  /** Token-balanced training-shard assignment — boustrophedon ("snake")
    * placement over the exact global (tokens desc, id asc) order: the
    * r-th heaviest document (1-based rank) lands in shard
    * `(r-1) mod S` on even rounds of S and `S-1 - (r-1) mod S` on odd
    * rounds, so each round deals one document to every shard and
    * consecutive rounds pair heavy positions with light ones. This is
    * the distributed stand-in for greedy LPT bin packing (whose every
    * placement depends on current bin loads — inherently serial):
    * placement is a pure function of the global rank, shard DOC counts
    * differ by at most one, and token-mass imbalance is bounded by the
    * per-round spreads (≤ a couple of max-document-sizes; the
    * OperatorsSpec property pins it). The rank comes from
    * [[GlobalRank.withGlobalRank]] — one range shuffle, never a
    * single-partition window — and the snake arithmetic is a map.
    *
    * Returns (idCol, tokensCol (long), ord = 1-based global rank,
    * shard ∈ [0, shards)).
    */
  def tokenBalancedShards(docs: DataFrame, idCol: String, tokensCol: String,
      shards: Int): DataFrame = {
    require(shards > 0, "shards must be positive")
    val ranked = GlobalRank.withGlobalRank(
      docs.select(col(idCol), col(tokensCol).cast("long").as(tokensCol)),
      Seq(col(tokensCol).desc, col(idCol)), "ord")
    val round = expr(s"(ord - 1) div $shards")
    val pos = expr(s"(ord - 1) % $shards")
    ranked.withColumn("shard",
      when(pmod(round, lit(2)) === 0, pos)
        .otherwise(lit(shards - 1) - pos).cast("int"))
  }
}
