package graft.queries

import graft.core.Tables
import graft.operators.{CorpusStats, LanguageModel, Sketches}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-level curation operators ([[graft.operators.CorpusStats]])
  * exercised on the `documents` table: Gopher-style repetition quality
  * rules, corpus TF-IDF, cross-document span dedup.
  */
object CorpusQueries {
  private type Q = (SparkSession, String) => DataFrame

  /** Corpus-trained bigram-LM perplexity ledger, once per session
    * (r16): t_bigram_ppl RETURNS it and t_ccnet_buckets partitions by
    * it — the identical `bigramPerplexity(scatter(docs), k=0.5)` call —
    * yet each query re-trained the LM and re-scored the corpus. One
    * scratch-parquet pass serves both (the realistic shape anyway: a
    * scoring job writes the ppl ledger once; every consumer reads it). */
  private val pplMemo =
    new graft.core.BoundedMemo[(SparkSession, String), DataFrame](8)
  private def bigramPplShared(s: SparkSession, d: String): DataFrame = {
    pplMemo.evictIf((k, _) => k._1.sparkContext.isStopped)
    pplMemo.getOrElseUpdate((s, d), graft.core.Scratch.materialize(
      LanguageModel.bigramPerplexity(
        Tables.scatter(Tables.documents(s, d)), "doc_id", "text", k = 0.5),
      "bigram_ppl", d))
  }

  val queries: Map[String, Q] = Map(
    "t_gopher_quality" -> ((s, d) =>
      CorpusStats.gopherQuality(Tables.scatter(Tables.documents(s, d)), "doc_id", "text")
        .orderBy(col("doc_id"))),

    "t_tfidf_topk" -> ((s, d) =>
      CorpusStats.tfIdfTopK(Tables.scatter(Tables.documents(s, d)), "doc_id", "text", k = 3)
        .orderBy(col("doc_id"), col("rank"))),

    // BM25 lexical retrieval: queries are the first-5-token prefixes of
    // the doc_id % 97 == 1 documents (self-retrieval — the shape hard-
    // negative mining and RAG recall checks run); top-5 docs per query
    // with Lucene-variant idf, micro-unit-exact score sums, and
    // integer-ranked ordering.
    "t_bm25_topk" -> ((s, d) => {
      // query set pinned to the base id range (doc_id < 100000 covers
      // every driver SF) so retrieval cost scales with the CORPUS, not
      // quadratically with corpus × query count, when the same query
      // runs over ScaleUp-replicated data
      val qs = Tables.documents(s, d)
        .filter(col("doc_id") % 97 === 1 && col("doc_id") < 100000)
        .select(col("doc_id").as("query_id"),
          concat_ws(" ", slice(
            graft.functions.TextFunctions.tokens(lower(col("text"))), 1, 5)).as("qtext"))
      CorpusStats.bm25TopK(Tables.scatter(Tables.documents(s, d)), "doc_id", "text",
          qs, "query_id", "qtext", k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    "dd_span_dedup" -> ((s, d) =>
      CorpusStats.spanDedupStats(Tables.scatter(Tables.documents(s, d)), "doc_id", "text", n = 8)
        .orderBy(col("doc_id"))),

    // Benchmark decontamination: the "benchmark" is the deterministic
    // doc_id % 37 slice of the corpus — eval-suite-sized, and its
    // self-overlap guarantees known-contaminated rows at every SF.
    "t_decontaminate" -> ((s, d) =>
      CorpusStats.decontaminate(
        Tables.scatter(Tables.documents(s, d)),
        Tables.documents(s, d).filter(col("doc_id") % 37 === 0),
        "doc_id", "text", n = 8)
        .orderBy(col("doc_id"))),

    "t_blocklist_scrub" -> ((s, d) =>
      CorpusStats.blocklistScrub(Tables.scatter(Tables.documents(s, d)),
        "doc_id", "text", blocklist = Seq("the", "and", "of", "to", "a"))
        .orderBy(col("doc_id"))),

    // PII scrub over a deterministically PII-injected corpus (the
    // synthetic documents carry no emails/phones/IPs, so each doc gets a
    // doc_id-keyed specimen appended — the oracle injects identically,
    // making redaction and counts value-checkable at every SF).
    "t_pii_scrub" -> ((s, d) => {
      val injected = Tables.scatter(Tables.documents(s, d)).withColumn("text2",
        concat(col("text"),
          when(pmod(col("doc_id"), lit(3)) === 0,
            concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
            .when(pmod(col("doc_id"), lit(3)) === 1,
              lit(" call 555-123-4567 or 555-000-1111"))
            .otherwise(concat(lit(" server at 10.0."),
              pmod(col("doc_id"), lit(256)), lit(".7")))))
      CorpusStats.piiScrub(injected, "doc_id", "text2").orderBy(col("doc_id"))
    }),

    // Sequence packing: concat docs per source in doc_id order, cut the
    // token stream every 128 tokens; one row per (doc, pack) with the
    // in-pack slice — straddling docs emit a row per touched pack.
    "t_pack_sequences" -> ((s, d) =>
      CorpusStats.packSequences(Tables.scatter(Tables.documents(s, d)),
        "doc_id", "text", shardCol = "source", orderCol = "doc_id", packTokens = 128)
        .orderBy(col("shard"), col("doc_id"), col("pack_id"))),

    // Within-doc repetition removal; each doc's first 10-token chunk is
    // prepended so every (≥10-token) document provably contains one
    // exact repeat — chunk 0 and chunk 1 coincide by construction.
    "dd_within_doc_dedup" -> ((s, d) => {
      val lt = graft.functions.TextFunctions.tokens(lower(col("text")))
      val injected = Tables.scatter(Tables.documents(s, d)).withColumn("text2",
        concat_ws(" ", concat_ws(" ", slice(lt, 1, 10)), col("text")))
      CorpusStats.dedupChunks(injected, "doc_id", "text2", k = 10)
        .orderBy(col("doc_id"))
    }),

    // Count–Min sketch: one-pass fixed-memory token-frequency sketch
    // (4×1024 grid, MD5-window KM hashes) probed with the stopword
    // vocabulary; exact counts alongside show the overestimate. The
    // sketch grid is deterministic, so the oracle rebuilds it cell by
    // cell and the estimates hash-match exactly.
    // Corpus-trained bigram-LM scoring (CCNet-style quality signal):
    // docs below ~2 tokens have no bigrams and drop out by contract.
    "t_bigram_ppl" -> ((s, d) =>
      bigramPplShared(s, d)
        .select(col("doc_id"), col("n_bigrams"),
          round(col("cross_entropy"), 6).as("cross_entropy"),
          round(col("ppl"), 6).as("ppl"))
        .orderBy(col("doc_id"))),

    // CCNet's head/middle/tail corpus partition (Wenzek et al. 2020):
    // per-LANGUAGE perplexity terciles of the corpus-trained bigram LM.
    // The tercile cuts come from the mergeable per-group histogram
    // sketch (one partial-agg shuffle of sketch-sized rows, per-group
    // interpolation over ≤ nBins rows) — never a per-language global
    // sort, which is the 100 TB shape CCNet itself needs — and the
    // bucket label is a broadcast join + map. round6 ppl is
    // bit-identical cross-engine, the bin floor and the interpolated
    // cut expression replay exactly, so bucket labels compare
    // value-level. Docs under 2 tokens have no bigrams and drop out by
    // the t_bigram_ppl contract.
    "t_ccnet_buckets" -> ((s, d) => {
      // materialize the scored ledger once: the histogram pass and the
      // final label join both consume it (the realistic shape anyway —
      // a scoring job writes the ppl ledger, the partition is a second
      // job over it)
      val ppl = graft.core.Scratch.materialize(
        bigramPplShared(s, d)
          .select(col("doc_id"), round(col("ppl"), 6).as("ppl"))
          .join(Tables.documents(s, d).select(col("doc_id"), col("lang")),
            Seq("doc_id")),
        "ccnet_ppl", d)
      val hist = Sketches.histogramBy(ppl, col("lang"), col("ppl"),
        lo = 0.0, hi = 2000.0, nBins = 1000)
      val cuts = Sketches.histQuantilesBy(hist, Seq(1.0 / 3, 2.0 / 3),
          0.0, 2000.0, nBins = 1000)
        .groupBy(col("grp").as("lang"))
        .agg(min(when(col("q") < 0.5, col("est"))).as("c33"),
          min(when(col("q") >= 0.5, col("est"))).as("c67"))
      ppl.join(broadcast(cuts), Seq("lang"))
        .select(col("doc_id"), col("lang"), col("ppl"),
          when(col("ppl") <= col("c33"), lit("head"))
            .when(col("ppl") <= col("c67"), lit("middle"))
            .otherwise(lit("tail")).as("bucket"))
        .orderBy(col("doc_id"))
    }),

    // BPE tokenizer training: 64 merges learned from the top-300 word
    // frequencies (one corpus pass, then a driver-local merge loop — the
    // production trainer shape); the oracle replays every iteration
    // (pair count → argmax → greedy merge) so each learned merge is
    // value-checked.
    "t_bpe_merges" -> ((s, d) =>
      LanguageModel.bpeTrain(
          Tables.scatter(Tables.documents(s, d)), "doc_id", "text",
          vocabWords = 300, numMerges = 64)
        .orderBy(col("merge_rank"))),

    // The production curation pipeline as ONE composed query: injected
    // duplicate slice → exact dedup (content-fingerprint canonical) →
    // Gopher quality gate → per-source yield report. Proves the
    // operators compose the way the real corpus build runs them; the
    // oracle recomputes every stage.
    "t_curation_pipeline" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val base = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("n_chars"), col("text"))
      val dups = Tables.documents(s, d).filter(col("doc_id") % 37 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("source"),
          col("n_chars"), col("text"))
      val inp = Tables.scatter(base.unionAll(dups))
      val fps = inp.select(col("doc_id"), col("source"), col("n_chars"),
        graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
      val canon = fps.withColumn("__rn", row_number().over(
          Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
        .filter(col("__rn") === 1)
      val quality = CorpusStats
        .gopherQuality(Tables.scatter(Tables.documents(s, d)), "doc_id", "text")
        .select(col("doc_id"), col("keep"))
      canon.join(quality, Seq("doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_unique"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("keep"), col("n_chars")).otherwise(0L)).as("kept_chars"))
        .join(inp.groupBy(col("source")).agg(count(lit(1)).as("n_input")), Seq("source"))
        .select(col("source"), col("n_input"), col("n_unique"),
          col("n_kept"), col("kept_chars"))
        .orderBy(col("source"))
    }),

    // BPE encoding: segment the corpus with the 8 merges learned by
    // t_bpe_merges (train → collect the KB-sized model → map-only
    // encode). The oracle re-derives the same merges and replays the
    // same greedy replaces, so n_subwords and the segmentation
    // fingerprint are value-checked per document.
    "t_bpe_encode" -> ((s, d) => {
      val merges = LanguageModel.bpeTrain(
          Tables.scatter(Tables.documents(s, d)), "doc_id", "text",
          vocabWords = 300, numMerges = 8)
        .orderBy(col("merge_rank")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      LanguageModel.bpeEncode(Tables.scatter(Tables.documents(s, d)),
          "doc_id", "text", merges)
        .orderBy(col("doc_id"))
    }),

    // PMI collocation mining: top fixed phrases by pointwise mutual
    // information over exact corpus counts (pairs seen ≥ 5 times).
    "t_pmi_bigrams" -> ((s, d) =>
      LanguageModel.pmiCollocations(
          Tables.scatter(Tables.documents(s, d)), "doc_id", "text",
          minCount = 5L, topK = 100)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy(col("rank"))),

    // Pretraining-mix rebalance: largest subset hitting the target
    // language shares, membership pinned per language by id checksums.
    "t_mixture_resample" -> ((s, d) => {
      val kept = CorpusStats.mixtureResample(Tables.documents(s, d), "doc_id", "lang",
        Map("en" -> 0.4, "fr" -> 0.2, "de" -> 0.15, "es" -> 0.15, "zh" -> 0.1))
      kept.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), min(col("doc_id")).as("first_id"),
          sum(col("doc_id")).as("id_sum"))
        .withColumn("share", round(col("n_kept") /
          sum(col("n_kept")).over(org.apache.spark.sql.expressions.Window
            .partitionBy()), 6))
        .orderBy(col("lang"))
    }),

    // Deterministic HLL over the corpus vocabulary: estimate and exact
    // distinct in one row (the exact side doubles as the error witness).
    "t_hll_distinct" -> ((s, d) => {
      val toks = Tables.scatter(Tables.documents(s, d))
        .select(explode(
          graft.functions.TextFunctions.tokens(lower(col("text")))).as("tok"))
      val est = CorpusStats.hllEstimate(
        CorpusStats.hllRegisters(toks, col("tok"), p = 8), p = 8)
      est.crossJoin(toks.agg(countDistinct(col("tok")).as("exact_distinct")))
        .select(col("m"), col("n_present"),
          round(col("est"), 6).as("est"), col("exact_distinct"))
    }),

    // Pack purity: after sequence packing, how language-pure is each
    // pack? Token-weighted language shares per pack, dominant language
    // by (tokens, lang) tie-break — the mixing metric a pretraining
    // pipeline reports after packing.
    "t_pack_purity" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val packs = CorpusStats.packSequences(
        Tables.scatter(Tables.documents(s, d)), "doc_id", "text",
        "source", "doc_id", packTokens = 128)
      val langs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
      val perLang = packs.join(langs, Seq("doc_id"))
        .withColumn("slice_tokens", col("doc_slice_end") - col("doc_slice_start"))
        .groupBy(col("shard"), col("pack_id"), col("lang"))
        .agg(sum(col("slice_tokens")).as("lang_tokens"))
      val w = Window.partitionBy(col("shard"), col("pack_id"))
      val rankW = w.orderBy(col("lang_tokens").desc, col("lang").desc)
      perLang
        .withColumn("pack_tokens", sum(col("lang_tokens")).over(w))
        .withColumn("__rn", row_number().over(rankW))
        .filter(col("__rn") === 1)
        .select(col("shard"), col("pack_id"), col("pack_tokens"),
          col("lang").as("dominant_lang"),
          round(col("lang_tokens").cast("double") / col("pack_tokens"), 6).as("purity"))
        .orderBy(col("shard"), col("pack_id"))
    }),

    // Grouped HLL: distinct users per event type from per-group register
    // grids — COUNT(DISTINCT) per group in one sketch-row shuffle, with
    // the exact witness joined alongside.
    "t_hll_grouped" -> ((s, d) => {
      val regs = CorpusStats.hllRegistersBy(Tables.events(s, d),
        col("event_type"), col("user_id"), p = 8)
      val est = CorpusStats.hllEstimateBy(regs, p = 8)
      val exact = Tables.events(s, d).groupBy(col("event_type").as("grp"))
        .agg(countDistinct(col("user_id")).as("exact_distinct"))
      est.join(exact, Seq("grp"))
        .select(col("grp").as("event_type"), col("m"), col("n_present"),
          round(col("est"), 6).as("est"), col("exact_distinct"))
        .orderBy(col("event_type"))
    }),

    // Bloom-filter membership at corpus scale: build over the bigram
    // shingles of the blocklist slice (doc_id % 37 — the decontaminate
    // fixture trick; bigrams because the synthetic corpus has a
    // 31-token vocabulary but ~900 distinct bigrams, so non-member
    // probes exist at every SF), probe the whole corpus's bigrams
    // map-only, and emit the positive set with its exact-membership
    // witness. mBits = 2048 deliberately overloads the filter (~460
    // members × 5 hashes) so exact_member = false rows — real false
    // positives — appear at every SF; the oracle replays them from the
    // same MD5-window double hashes.
    "t_bloom_blocklist" -> ((s, d) => {
      val tf = graft.functions.TextFunctions
      val block = Tables.documents(s, d)
        .filter(pmod(col("doc_id"), lit(37)) === 0)
        .select(explode(tf.wordShingles(col("text"), 2)).as("bg")).distinct()
      val sketch = Sketches.bloomBuild(block, col("bg"), mBits = 2048, k = 5)
      val probes = Tables.scatter(Tables.documents(s, d))
        .select(explode(tf.wordShingles(col("text"), 2)).as("bg")).distinct()
      val exact = Tables.documents(s, d)
        .filter(pmod(col("doc_id"), lit(37)) === 0)
        .select(explode(tf.wordShingles(col("text"), 2)).as("bg")).distinct()
        .withColumn("__ex", lit(true))
      Sketches.bloomMightContain(sketch, probes, col("bg"),
        mBits = 2048, k = 5)
        .filter(col("might_contain"))
        .join(exact, Seq("bg"), "left")
        .select(col("bg"), coalesce(col("__ex"), lit(false)).as("exact_member"))
        .orderBy(col("bg"))
    }),

    // Histogram-sketch quantiles of per-doc token counts: fixed 64-bin
    // grid over [0, 512), linear interpolation inside the landing bin —
    // percentiles without a global sort, bins shard-mergeable.
    "t_hist_quantiles" -> ((s, d) => {
      val tf = graft.functions.TextFunctions
      val lens = Tables.scatter(Tables.documents(s, d))
        .select(tf.tokenCount(col("text")).as("n"))
      val h = Sketches.histogram(lens, col("n"), lo = 0.0, hi = 512.0, nBins = 64)
      Sketches.histQuantiles(h, Seq(0.25, 0.5, 0.9, 0.99), 0.0, 512.0, 64)
        .select(col("q"), round(col("est"), 6).as("est"))
        .orderBy(col("q"))
    }),

    // Per-source length quantiles from the grouped histogram sketch —
    // the shape that answers "p50/p95 doc length per domain" over a
    // billion-group corpus in one sketch-row shuffle.
    "t_hist_grouped_quantiles" -> ((s, d) => {
      val h = Sketches.histogramBy(Tables.documents(s, d),
        col("source"), col("n_chars"), lo = 0.0, hi = 1024.0, nBins = 64)
      Sketches.histQuantilesBy(h, Seq(0.5, 0.9, 0.99), 0.0, 1024.0, 64)
        .select(col("grp").as("source"), col("q"), round(col("est"), 6).as("est"))
        .orderBy(col("source"), col("q"))
    }),

    "t_cms_counts" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.scatter(Tables.documents(s, d))
      val sketch = CorpusStats.cmsSketch(docs, "text", depth = 4, width = 1024)
      val probes = graft.functions.TextFunctions.englishStopwords.toDF("token")
      val exact = docs
        .select(explode(graft.functions.TextFunctions.tokens(lower(col("text")))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("exact_count"))
      CorpusStats.cmsEstimate(sketch, probes, "token", depth = 4, width = 1024)
        .join(exact, Seq("token"), "left_outer")
        .select(col("token"), col("est_count"),
          coalesce(col("exact_count"), lit(0L)).as("exact_count"))
        .orderBy(col("token"))
    }),

    // Grouped CMS: one 4×512 grid per source, probed with the stopword
    // vocabulary per source, exact counts as the witness — the
    // per-group frequency monitor, completing the grouped-sketch family
    // (HLL / histogram / CMS).
    "t_cms_grouped" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.scatter(Tables.documents(s, d))
      val sketch = CorpusStats.cmsSketchBy(docs, col("source"), "text",
        depth = 4, width = 512)
      val probes = graft.functions.TextFunctions.englishStopwords.toDF("token")
      val exact = docs
        .select(col("source").as("grp"),
          explode(graft.functions.TextFunctions.tokens(lower(col("text")))).as("token"))
        .groupBy(col("grp"), col("token")).agg(count(lit(1)).as("exact_count"))
      CorpusStats.cmsEstimateBy(sketch, probes, "token", depth = 4, width = 512)
        .join(exact, Seq("grp", "token"), "left_outer")
        .select(col("grp").as("source"), col("token"), col("est_count"),
          coalesce(col("exact_count"), lit(0L)).as("exact_count"))
        .orderBy(col("source"), col("token"))
    }))

  private val toksLower =
    """list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> len(x) > 0)"""

  import Oracles.jr6

  private val cmsStops = graft.functions.TextFunctions.englishStopwords
    .map(w => s"'$w'").mkString("[", ", ", "]")

  /** One BPE training iteration as CTEs: adjacent-pair counts over the
    * current symbolization `prev`, argmax with (count DESC, pair)
    * tie-break, greedy sentinel-framed merge. chr(31) = the U+001F
    * sentinel [[graft.operators.LanguageModel.bpeTrain]] frames symbols
    * with.
    *
    * `w$i`/`best$i` are MATERIALIZED: each is referenced twice by the
    * next iteration, so DuckDB's default CTE inlining doubles the
    * expanded tree per level — fine at 8 merges, an exponential
    * scan-count blowup ("Too many open files" on the base parquet) at
    * 64. Materializing pins each level to one evaluation.
    */
  private def bpeIter(prev: String, i: Int): String =
    s"""p$i AS (SELECT l[x] AS a, l[x + 1] AS b, c FROM (
       |    SELECT c, l, unnest(range(1, len(l))) AS x FROM (
       |      SELECT c, string_split(trim(s, chr(31)), chr(31) || chr(31)) AS l
       |      FROM $prev) q0) q1),
       |best$i AS MATERIALIZED (SELECT a, b, cnt FROM (
       |    SELECT a, b, CAST(sum(c) AS BIGINT) AS cnt,
       |      row_number() OVER (ORDER BY sum(c) DESC, a, b) AS rn
       |    FROM p$i GROUP BY a, b) z WHERE rn = 1),
       |w$i AS MATERIALIZED (SELECT w, c,
       |    replace(s, chr(31) || a || chr(31) || chr(31) || b || chr(31),
       |      chr(31) || a || b || chr(31)) AS s
       |  FROM w${i - 1} CROSS JOIN best$i)""".stripMargin

  /** The 8-merge replay applied to a wrapped word `$w` (nested greedy
    * replaces, innermost = merge 1), correlated to best1..best8 rows.
    */
  private def bpeApply(w: String): String =
    (1 to 8).foldLeft(
      s"chr(31) || array_to_string(list_append(string_split($w, ''), '</w>'), chr(31) || chr(31)) || chr(31)"
    )((acc, i) =>
      s"replace($acc, chr(31) || b$i.a || chr(31) || chr(31) || b$i.b || chr(31), chr(31) || b$i.a || b$i.b || chr(31))")

  val oracleSql: Map[String, String] = Map(
    "t_bpe_encode" ->
      s"""WITH w0 AS (SELECT w, c,
         |    chr(31) || array_to_string(list_append(string_split(w, ''), '</w>'),
         |      chr(31) || chr(31)) || chr(31) AS s
         |  FROM (SELECT tok AS w, CAST(count(*) AS BIGINT) AS c
         |    FROM (SELECT unnest($toksLower) AS tok FROM documents) u
         |    WHERE regexp_matches(tok, '^[a-z]+${"$"}')
         |    GROUP BY 1 ORDER BY c DESC, w LIMIT 300) t),
         |${(1 to 8).map(i => bpeIter(s"w${i - 1}", i)).mkString(",\n")},
         |enc AS (SELECT doc_id,
         |    list_transform(
         |      list_filter($toksLower, x -> regexp_matches(x, '^[a-z]+${"$"}')),
         |      w -> ${bpeApply("w")}) AS seg
         |  FROM documents ${(1 to 8).map(i => s"CROSS JOIN best$i b$i").mkString(" ")})
         |SELECT doc_id, CAST(len(seg) AS BIGINT) AS n_words,
         |  CAST(coalesce(list_sum(list_transform(seg,
         |    s -> len(string_split(trim(s, chr(31)), chr(31) || chr(31))))), 0) AS BIGINT)
         |    AS n_subwords,
         |  md5(array_to_string(list_transform(seg,
         |    s -> replace(trim(s, chr(31)), chr(31) || chr(31), '+')), ' ')) AS seg_fp
         |FROM enc ORDER BY doc_id""".stripMargin,

    // Pipeline oracle: replay dedup over base ∪ injected-duplicate
    // slice, the Gopher keep rule, and the per-source rollup.
    "t_curation_pipeline" ->
      s"""WITH inp AS (
         |  SELECT doc_id, source, n_chars, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS doc_id, source, n_chars, text
         |  FROM documents WHERE doc_id % 37 = 0),
         |fp AS (SELECT doc_id, source, n_chars,
         |    md5(array_to_string($toksLower, ' ')) AS fp FROM inp),
         |canon AS (SELECT doc_id, source, n_chars FROM (
         |    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
         |    FROM fp) z WHERE rn = 1),
         |t AS (SELECT doc_id, $toksLower AS lt FROM documents),
         |tok AS (SELECT doc_id, unnest(lt) AS w FROM t),
         |tc AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2),
         |uni AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |    max(c) AS top_c, count(*) AS n_uniq FROM tc GROUP BY 1),
         |k AS (SELECT d.doc_id,
         |    coalesce(CAST(uni.top_c AS DOUBLE) / uni.n_tokens <= 0.1
         |      AND CAST(uni.n_uniq AS DOUBLE) / uni.n_tokens >= 0.4, false) AS keep
         |  FROM documents d LEFT JOIN uni ON uni.doc_id = d.doc_id)
         |SELECT c.source,
         |  (SELECT CAST(count(*) AS BIGINT) FROM inp i WHERE i.source = c.source) AS n_input,
         |  CAST(count(*) AS BIGINT) AS n_unique,
         |  CAST(coalesce(sum(CASE WHEN k.keep THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_kept,
         |  CAST(coalesce(sum(CASE WHEN k.keep THEN c.n_chars ELSE 0 END), 0) AS BIGINT) AS kept_chars
         |FROM canon c JOIN k ON k.doc_id = c.doc_id
         |GROUP BY c.source ORDER BY c.source""".stripMargin,

    "t_bpe_merges" ->
      s"""WITH w0 AS (SELECT w, c,
         |    chr(31) || array_to_string(list_append(string_split(w, ''), '</w>'),
         |      chr(31) || chr(31)) || chr(31) AS s
         |  FROM (SELECT tok AS w, CAST(count(*) AS BIGINT) AS c
         |    FROM (SELECT unnest($toksLower) AS tok FROM documents) u
         |    WHERE regexp_matches(tok, '^[a-z]+${"$"}')
         |    GROUP BY 1 ORDER BY c DESC, w LIMIT 300) t),
         |${(1 to 64).map(i => bpeIter(s"w${i - 1}", i)).mkString(",\n")}
         |${(1 to 64).map(i =>
             s"SELECT $i AS merge_rank, a AS lhs, b AS rhs, cnt AS pair_count FROM best$i")
             .mkString("\n UNION ALL ")}
         |ORDER BY merge_rank""".stripMargin,
    // Rebuild the identical 4×1024 CMS grid (same MD5-window
    // Kirsch–Mitzenmacher hashes, same mod), then replay the min-of-4
    // point estimates and the exact counts.
    "t_cms_grouped" ->
      s"""WITH toks AS (SELECT source AS grp, unnest($toksLower) AS tok FROM documents),
         |th AS (SELECT grp, tok,
         |    ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h1,
         |    ('0x' || substr(md5(tok), 16, 14))::BIGINT AS h2 FROM toks),
         |cells AS (SELECT grp, r.range AS d, (h1 + r.range * h2) % 512 AS w
         |  FROM th, range(0, 4) r),
         |sketch AS (SELECT grp, d, w, count(*) AS cnt FROM cells GROUP BY 1, 2, 3),
         |probes AS (SELECT unnest($cmsStops) AS token),
         |pc AS (SELECT token, r.range AS d,
         |    (('0x' || substr(md5(token), 1, 15))::BIGINT
         |     + r.range * ('0x' || substr(md5(token), 16, 14))::BIGINT) % 512 AS w
         |  FROM probes, range(0, 4) r),
         |grid AS (SELECT g.grp, pc.token, pc.d, pc.w
         |  FROM pc CROSS JOIN (SELECT DISTINCT grp FROM sketch) g),
         |est AS (SELECT grp, token, min(coalesce(cnt, 0)) AS est_count
         |  FROM grid LEFT JOIN sketch USING (grp, d, w) GROUP BY 1, 2),
         |ex AS (SELECT grp, tok AS token, count(*) AS exact_count
         |  FROM toks GROUP BY 1, 2)
         |SELECT e.grp AS source, e.token, CAST(e.est_count AS BIGINT) AS est_count,
         |  CAST(coalesce(x.exact_count, 0) AS BIGINT) AS exact_count
         |FROM est e LEFT JOIN ex x USING (grp, token)
         |ORDER BY source, token""".stripMargin,

    "t_cms_counts" ->
      s"""WITH toks AS (SELECT unnest($toksLower) AS tok FROM documents),
         |th AS (SELECT tok,
         |    ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h1,
         |    ('0x' || substr(md5(tok), 16, 14))::BIGINT AS h2 FROM toks),
         |cells AS (SELECT r.range AS d, (h1 + r.range * h2) % 1024 AS w
         |  FROM th, range(0, 4) r),
         |sketch AS (SELECT d, w, count(*) AS cnt FROM cells GROUP BY 1, 2),
         |probes AS (SELECT unnest($cmsStops) AS token),
         |pc AS (SELECT token, r.range AS d,
         |    (('0x' || substr(md5(token), 1, 15))::BIGINT
         |     + r.range * ('0x' || substr(md5(token), 16, 14))::BIGINT) % 1024 AS w
         |  FROM probes, range(0, 4) r),
         |est AS (SELECT token, min(coalesce(cnt, 0)) AS est_count
         |  FROM pc LEFT JOIN sketch USING (d, w) GROUP BY token),
         |ex AS (SELECT tok AS token, count(*) AS exact_count FROM toks GROUP BY 1)
         |SELECT e.token, CAST(e.est_count AS BIGINT) AS est_count,
         |  CAST(coalesce(x.exact_count, 0) AS BIGINT) AS exact_count
         |FROM est e LEFT JOIN ex x USING (token)
         |ORDER BY token""".stripMargin,
    // Bloom oracle: rebuild the word/bit grid from the same
    // Kirsch–Mitzenmacher MD5-window hashes (63 bits per word — the
    // sign bit stays clear on both engines), then replay every probe.
    // Bigram extraction mirrors wordShingles(text, 2): window starts
    // 0..max(len-2, 0), slices clamped, so 1-token docs contribute
    // their lone token.
    "t_bloom_blocklist" ->
      s"""WITH t AS (SELECT doc_id, $toksLower AS lt FROM documents),
         |bl AS (SELECT DISTINCT unnest(list_transform(
         |      range(0, greatest(len(lt) - 2, 0) + 1),
         |      i -> array_to_string(lt[i + 1 : i + 2], ' '))) AS bg
         |  FROM t WHERE doc_id % 37 = 0),
         |bp AS (SELECT (('0x' || substr(md5(bg), 1, 15))::BIGINT
         |      + i.range * ('0x' || substr(md5(bg), 16, 14))::BIGINT) % 2048 AS p
         |  FROM bl, range(0, 5) i),
         |wd AS (SELECT p // 63 AS word,
         |    bit_or(1::BIGINT << CAST(p % 63 AS INT)) AS bits
         |  FROM bp GROUP BY 1),
         |pr AS (SELECT DISTINCT unnest(list_transform(
         |      range(0, greatest(len(lt) - 2, 0) + 1),
         |      i -> array_to_string(lt[i + 1 : i + 2], ' '))) AS bg
         |  FROM t),
         |pp AS (SELECT bg, (('0x' || substr(md5(bg), 1, 15))::BIGINT
         |      + i.range * ('0x' || substr(md5(bg), 16, 14))::BIGINT) % 2048 AS p
         |  FROM pr, range(0, 5) i),
         |hits AS (SELECT bg,
         |    bool_and((coalesce(w.bits, 0) & (1::BIGINT << CAST(p % 63 AS INT))) <> 0) AS might
         |  FROM pp LEFT JOIN wd w ON w.word = p // 63
         |  GROUP BY bg)
         |SELECT h.bg, (bl.bg IS NOT NULL) AS exact_member
         |FROM hits h LEFT JOIN bl ON bl.bg = h.bg
         |WHERE h.might
         |ORDER BY h.bg""".stripMargin,

    // Histogram-quantile oracle: identical bin arithmetic (w = 8.0),
    // cumulative counts over present bins, interpolate in the landing
    // bin.
    "t_hist_quantiles" ->
      s"""WITH lens AS (SELECT CAST(len($toksLower) AS DOUBLE) AS x FROM documents),
         |b AS (SELECT CAST(least(greatest(floor((x - 0.0) / 8.0), 0.0), 63.0) AS INT) AS bin
         |  FROM lens),
         |h AS (SELECT bin, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY 1),
         |c AS (SELECT bin, cnt, sum(cnt) OVER (ORDER BY bin) AS cum FROM h),
         |tot AS (SELECT max(cum) AS n FROM c),
         |qs AS (SELECT unnest([0.25::DOUBLE, 0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS q),
         |pick AS (SELECT q, bin, cnt, cum - cnt AS prev,
         |    q * (SELECT n FROM tot) AS target,
         |    row_number() OVER (PARTITION BY q ORDER BY bin) AS rn
         |  FROM qs JOIN c ON cum >= q * (SELECT n FROM tot))
         |SELECT q, ${jr6("0.0 + 8.0 * (bin + (target - prev) / cnt)")} AS est
         |FROM pick WHERE rn = 1 ORDER BY q""".stripMargin,

    "t_hist_grouped_quantiles" ->
      s"""WITH b AS (SELECT source AS grp,
         |    CAST(least(greatest(floor((CAST(n_chars AS DOUBLE) - 0.0) / 16.0), 0.0), 63.0) AS INT) AS bin
         |  FROM documents),
         |h AS (SELECT grp, bin, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY 1, 2),
         |c AS (SELECT grp, bin, cnt,
         |    sum(cnt) OVER (PARTITION BY grp ORDER BY bin) AS cum FROM h),
         |tot AS (SELECT grp, max(cum) AS n FROM c GROUP BY 1),
         |qs AS (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS q),
         |pick AS (SELECT c.grp, q, bin, cnt, cum - cnt AS prev,
         |    q * tot.n AS target,
         |    row_number() OVER (PARTITION BY c.grp, q ORDER BY bin) AS rn
         |  FROM qs CROSS JOIN c JOIN tot ON tot.grp = c.grp
         |  WHERE cum >= q * tot.n)
         |SELECT grp AS source, q, ${jr6("0.0 + 16.0 * (bin + (target - prev) / cnt)")} AS est
         |FROM pick WHERE rn = 1 ORDER BY source, q""".stripMargin,

    "t_hll_distinct" ->
      s"""WITH toks AS (SELECT unnest($toksLower) AS tok FROM documents),
         |h AS (SELECT ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks),
         |r AS (SELECT h >> 52 AS idx,
         |    CASE WHEN (h & 4503599627370495) = 0 THEN 53
         |         ELSE 53 - CAST(length(bin(h & 4503599627370495)) AS INT)
         |    END AS rho
         |  FROM h),
         |regs AS (SELECT idx, max(rho) AS rho FROM r GROUP BY 1),
         |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_present,
         |    sum(1::BIGINT << (53 - rho)) AS si FROM regs),
         |est AS (SELECT n_present,
         |    (0.7213 / (1.0 + 1.079 / 256)) * 256 * 256 /
         |      (CAST(si AS DOUBLE) / 9007199254740992.0 + (256 - n_present)) AS e,
         |    CAST(256 - n_present AS DOUBLE) AS z
         |  FROM agg)
         |SELECT CAST(256 AS INT) AS m, n_present,
         |  ${jr6("CASE WHEN e <= 640.0 AND z > 0 THEN 256.0 * ln(256.0 / z) ELSE e END")} AS est,
         |  (SELECT CAST(count(DISTINCT tok) AS BIGINT) FROM toks) AS exact_distinct
         |FROM est""".stripMargin,

    "t_hll_grouped" ->
      s"""WITH h AS (SELECT event_type AS grp,
         |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
         |  FROM events),
         |r AS (SELECT grp, h >> 52 AS idx,
         |    CASE WHEN (h & 4503599627370495) = 0 THEN 53
         |         ELSE 53 - CAST(length(bin(h & 4503599627370495)) AS INT)
         |    END AS rho
         |  FROM h),
         |regs AS (SELECT grp, idx, max(rho) AS rho FROM r GROUP BY 1, 2),
         |agg AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_present,
         |    sum(1::BIGINT << (53 - rho)) AS si FROM regs GROUP BY 1),
         |est AS (SELECT grp, n_present,
         |    (0.7213 / (1.0 + 1.079 / 256)) * 256 * 256 /
         |      (CAST(si AS DOUBLE) / 9007199254740992.0 + (256 - n_present)) AS e,
         |    CAST(256 - n_present AS DOUBLE) AS z
         |  FROM agg),
         |ex AS (SELECT event_type AS grp, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
         |  FROM events GROUP BY 1)
         |SELECT est.grp AS event_type, CAST(256 AS INT) AS m, n_present,
         |  ${jr6("CASE WHEN e <= 640.0 AND z > 0 THEN 256.0 * ln(256.0 / z) ELSE e END")} AS est,
         |  exact_distinct
         |FROM est JOIN ex ON ex.grp = est.grp
         |ORDER BY event_type""".stripMargin,

    "t_bigram_ppl" ->
      s"""WITH t AS (SELECT doc_id, $toksLower AS lt FROM documents),
         |m AS (
         |  SELECT doc_id, b.w1 AS w1, b.w2 AS w2, CAST(count(*) AS BIGINT) AS m
         |  FROM (SELECT doc_id, unnest(list_transform(range(0, len(lt) - 1),
         |      i -> struct_pack(w1 := lt[i + 1], w2 := lt[i + 2]))) AS b
         |    FROM t WHERE len(lt) >= 2)
         |  GROUP BY 1, 2, 3),
         |c12 AS (SELECT w1, w2, sum(m) AS c12 FROM m GROUP BY 1, 2),
         |c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY 1),
         |v AS (SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v
         |  FROM (SELECT unnest(lt) AS tok FROM t)),
         |s AS (
         |  SELECT m.doc_id, m.m,
         |    ln((c12.c12 + 0.5) / (c1.c1 + 0.5 * v.v)) AS lp
         |  FROM m JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v),
         |agg AS (
         |  SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams,
         |    -sum(m * lp) / sum(m) AS h
         |  FROM s GROUP BY 1)
         |SELECT doc_id, n_bigrams, ${jr6("h")} AS cross_entropy,
         |  ${jr6("exp(h)")} AS ppl
         |FROM agg ORDER BY doc_id""".stripMargin,

    // CCNet-bucket replay: the t_bigram_ppl chain feeding the grouped-
    // histogram tercile interpolation (t_hist_grouped_quantiles idiom)
    // and the label CASE — cuts are the identical IEEE expression on
    // both sides, so the comparisons agree exactly.
    "t_ccnet_buckets" ->
      s"""WITH t AS (SELECT doc_id, $toksLower AS lt FROM documents),
         |m AS (
         |  SELECT doc_id, b.w1 AS w1, b.w2 AS w2, CAST(count(*) AS BIGINT) AS m
         |  FROM (SELECT doc_id, unnest(list_transform(range(0, len(lt) - 1),
         |      i -> struct_pack(w1 := lt[i + 1], w2 := lt[i + 2]))) AS b
         |    FROM t WHERE len(lt) >= 2)
         |  GROUP BY 1, 2, 3),
         |c12 AS (SELECT w1, w2, sum(m) AS c12 FROM m GROUP BY 1, 2),
         |c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY 1),
         |v AS (SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v
         |  FROM (SELECT unnest(lt) AS tok FROM t)),
         |s AS (
         |  SELECT m.doc_id, m.m,
         |    ln((c12.c12 + 0.5) / (c1.c1 + 0.5 * v.v)) AS lp
         |  FROM m JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v),
         |agg AS (SELECT doc_id, -sum(m * lp) / sum(m) AS h FROM s GROUP BY 1),
         |p AS (SELECT a.doc_id, d.lang, ${jr6("exp(a.h)")} AS ppl
         |  FROM agg a JOIN documents d USING (doc_id)),
         |b2 AS (SELECT lang,
         |    CAST(least(greatest(floor((ppl - 0.0) / 2.0), 0.0), 999.0) AS INT) AS bin
         |  FROM p),
         |h2 AS (SELECT lang, bin, CAST(count(*) AS BIGINT) AS cnt FROM b2 GROUP BY 1, 2),
         |c AS (SELECT lang, bin, cnt,
         |    sum(cnt) OVER (PARTITION BY lang ORDER BY bin) AS cum FROM h2),
         |tot AS (SELECT lang, max(cum) AS n FROM c GROUP BY 1),
         |qs AS (SELECT unnest([(1.0/3)::DOUBLE, (2.0/3)::DOUBLE]) AS q),
         |pick AS (SELECT c.lang, q, bin, cnt, cum - cnt AS prev, q * tot.n AS target,
         |    row_number() OVER (PARTITION BY c.lang, q ORDER BY bin) AS rn
         |  FROM qs CROSS JOIN c JOIN tot ON tot.lang = c.lang
         |  WHERE cum >= q * tot.n),
         |cuts AS (SELECT lang,
         |    min(CASE WHEN q < 0.5 THEN 0.0 + 2.0 * (bin + (target - prev) / cnt) END) AS c33,
         |    min(CASE WHEN q >= 0.5 THEN 0.0 + 2.0 * (bin + (target - prev) / cnt) END) AS c67
         |  FROM pick WHERE rn = 1 GROUP BY 1)
         |SELECT p.doc_id, p.lang, p.ppl,
         |  CASE WHEN p.ppl <= cuts.c33 THEN 'head'
         |       WHEN p.ppl <= cuts.c67 THEN 'middle' ELSE 'tail' END AS bucket
         |FROM p JOIN cuts USING (lang) ORDER BY p.doc_id""".stripMargin,

    "t_pmi_bigrams" ->
      s"""WITH t AS (SELECT doc_id, $toksLower AS lt FROM documents),
         |uni AS (SELECT tok AS w, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT unnest(lt) AS tok FROM t) GROUP BY 1),
         |big AS (SELECT b.w1 AS w1, b.w2 AS w2, CAST(count(*) AS BIGINT) AS c12
         |  FROM (SELECT unnest(list_transform(range(0, len(lt) - 1),
         |      i -> struct_pack(w1 := lt[i + 1], w2 := lt[i + 2]))) AS b
         |    FROM t WHERE len(lt) >= 2)
         |  GROUP BY 1, 2),
         |tot AS (SELECT (SELECT CAST(sum(c) AS DOUBLE) FROM uni) AS n_tok,
         |               (SELECT CAST(sum(c12) AS DOUBLE) FROM big) AS n_big),
         |s AS (SELECT big.w1, big.w2, big.c12,
         |    round(ln((CAST(big.c12 AS DOUBLE) * tot.n_tok * tot.n_tok) /
         |      (tot.n_big * CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE))), 6) AS pmi
         |  FROM big
         |  JOIN uni u1 ON u1.w = big.w1
         |  JOIN uni u2 ON u2.w = big.w2
         |  CROSS JOIN tot
         |  WHERE big.c12 >= 5),
         |r AS (SELECT w1, w2, c12, pmi,
         |    row_number() OVER (ORDER BY pmi DESC, w1, w2) AS rank FROM s)
         |SELECT w1, w2, c12, pmi, rank FROM r WHERE rank <= 100
         |ORDER BY rank""".stripMargin,

    "t_mixture_resample" ->
      s"""WITH wts(lang, t) AS (VALUES
         |    ('en', 0.4), ('fr', 0.2), ('de', 0.15), ('es', 0.15), ('zh', 0.1)),
         |cnt AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n
         |  FROM documents GROUP BY 1),
         |lam AS (SELECT min(n / t) AS lam FROM cnt JOIN wts USING (lang)),
         |q AS (SELECT lang, CAST(floor(lam * t) AS BIGINT) AS quota
         |  FROM wts CROSS JOIN lam),
         |r AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
         |    ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
         |      doc_id) AS rk
         |  FROM documents),
         |kept AS (SELECT r.doc_id, r.lang
         |  FROM r JOIN q USING (lang) WHERE rk <= quota),
         |g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
         |    min(doc_id) AS first_id, CAST(sum(doc_id) AS BIGINT) AS id_sum
         |  FROM kept GROUP BY 1)
         |SELECT lang, n_kept, first_id, id_sum,
         |  ${jr6("CAST(n_kept AS DOUBLE) / (SELECT sum(n_kept) FROM g)")} AS share
         |FROM g ORDER BY lang""".stripMargin,

    "t_gopher_quality" ->
      s"""WITH t AS (SELECT doc_id, $toksLower AS lt FROM documents),
         |tok AS (SELECT doc_id, unnest(lt) AS w FROM t),
         |tc AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2),
         |uni AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |    max(c) AS top_c, count(*) AS n_uniq FROM tc GROUP BY 1),
         |bg AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(lt), 1)),
         |    i -> lt[i] || ' ' || lt[i + 1])) AS b FROM t WHERE len(lt) >= 2),
         |bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
         |bi AS (SELECT doc_id, max(c) AS top_b, CAST(sum(c) AS BIGINT) AS n_bi FROM bc GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(uni.n_tokens, 0) AS n_tokens,
         |  ${jr6("coalesce(CAST(uni.n_uniq AS DOUBLE) / uni.n_tokens, 0.0)")} AS frac_unique,
         |  ${jr6("coalesce(CAST(uni.top_c AS DOUBLE) / uni.n_tokens, 0.0)")} AS top_token_frac,
         |  ${jr6("coalesce(CAST(bi.top_b AS DOUBLE) / bi.n_bi, 0.0)")} AS top_bigram_frac,
         |  coalesce(CAST(uni.top_c AS DOUBLE) / uni.n_tokens <= 0.1
         |    AND CAST(uni.n_uniq AS DOUBLE) / uni.n_tokens >= 0.4, false) AS keep
         |FROM documents d
         |LEFT JOIN uni ON uni.doc_id = d.doc_id
         |LEFT JOIN bi ON bi.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "t_tfidf_topk" ->
      s"""WITH t AS (SELECT doc_id, $toksLower AS lt FROM documents),
         |tok AS (SELECT doc_id, unnest(lt) AS term FROM t),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
         |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n FROM documents),
         |scored AS (
         |  SELECT tf.doc_id, tf.term,
         |    tf.tf * ln(CAST(n.n AS DOUBLE) / dfreq.df) AS tfidf
         |  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
         |ranked AS (
         |  SELECT doc_id, term, tfidf,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
         |  FROM scored)
         |SELECT doc_id, term, ${jr6("tfidf")} AS tfidf, CAST(rank AS BIGINT) AS rank
         |FROM ranked WHERE rank <= 3
         |ORDER BY doc_id, rank""".stripMargin,

    // BM25 replay: identical expression shape (products before the
    // division, ln innermost, every constant CAST AS DOUBLE so DuckDB
    // doesn't fold decimal literals exactly), per-term jr6 rounding into
    // micro-unit integers, integer-ordered ranking.
    "t_bm25_topk" ->
      s"""WITH tf AS (SELECT doc_id AS doc, term, count(*) AS tf FROM (
         |    SELECT doc_id, unnest($toksLower) AS term FROM documents) u
         |  GROUP BY 1, 2),
         |dl AS (SELECT doc, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
         |dfr AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |st AS (SELECT (SELECT count(*) FROM documents) AS n,
         |  (SELECT sum(dl) FROM dl) AS tl),
         |q AS (SELECT doc_id AS query_id,
         |    unnest(list_distinct(($toksLower)[1:5])) AS term
         |  FROM documents WHERE doc_id % 97 = 1 AND doc_id < 100000),
         |sc AS (SELECT q.query_id, tf.doc,
         |    CAST(round(${Oracles.jr6(
                 """ln(CAST(1.0 AS DOUBLE)
                   | + (CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE))
                   |   / (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
                   | * CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE)
                   | / (CAST(tf AS DOUBLE) + CAST(1.2 AS DOUBLE)
                   |    * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE)
                   |       * CAST(dl AS DOUBLE)
                   |       / (CAST(tl AS DOUBLE) / CAST(n AS DOUBLE))))"""
                   .stripMargin.replace("\n", " "))} * 1000000.0) AS BIGINT) AS micro
         |  FROM tf JOIN q USING (term) JOIN dfr USING (term)
         |  JOIN dl USING (doc) CROSS JOIN st),
         |agg AS (SELECT query_id, doc, CAST(sum(micro) AS BIGINT) AS s
         |  FROM sc GROUP BY 1, 2),
         |r AS (SELECT query_id, doc AS doc_id, s,
         |    row_number() OVER (PARTITION BY query_id ORDER BY s DESC, doc) AS rank
         |  FROM agg)
         |SELECT query_id, doc_id,
         |  ${Oracles.jr6("CAST(s AS DOUBLE) / 1000000.0")} AS score,
         |  CAST(rank AS BIGINT) AS rank
         |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "dd_span_dedup" ->
      s"""WITH t AS (SELECT doc_id, $toksLower AS lt FROM documents),
         |sp AS (SELECT doc_id, unnest(list_distinct(list_transform(
         |    range(0, greatest(len(lt) - 8, 0) + 1),
         |    i -> array_to_string(lt[i + 1:i + 8], ' ')))) AS s
         |  FROM t WHERE len(lt) > 0),
         |h AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM sp),
         |wc AS (SELECT doc_id, count(*) OVER (PARTITION BY h) AS nd FROM h),
         |perdoc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         |    CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_spans
         |  FROM wc GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(p.n_spans, 0) AS n_spans,
         |  coalesce(p.n_shared_spans, 0) AS n_shared_spans,
         |  ${jr6("coalesce(CAST(p.n_shared_spans AS DOUBLE) / p.n_spans, 0.0)")} AS shared_frac
         |FROM documents d LEFT JOIN perdoc p ON p.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "t_decontaminate" ->
      s"""WITH t AS (SELECT doc_id, $toksLower AS lt FROM documents),
         |sp AS (SELECT doc_id, unnest(list_distinct(list_transform(
         |    range(0, greatest(len(lt) - 8, 0) + 1),
         |    i -> array_to_string(lt[i + 1:i + 8], ' ')))) AS s
         |  FROM t WHERE len(lt) > 0),
         |h AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM sp),
         |bh AS (SELECT DISTINCT h FROM h WHERE doc_id % 37 = 0),
         |perdoc AS (
         |  SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         |    CAST(sum(CASE WHEN bh.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_benchmark_spans
         |  FROM h a LEFT JOIN bh ON bh.h = a.h
         |  GROUP BY a.doc_id)
         |SELECT d.doc_id,
         |  coalesce(p.n_spans, 0) AS n_spans,
         |  coalesce(p.n_benchmark_spans, 0) AS n_benchmark_spans,
         |  coalesce(p.n_benchmark_spans > 0, false) AS contaminated
         |FROM documents d LEFT JOIN perdoc p ON p.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "t_blocklist_scrub" ->
      s"""WITH t AS (SELECT doc_id, $toksLower AS lt FROM documents),
         |k AS (SELECT doc_id, lt,
         |    list_filter(lt, x -> NOT list_contains(['the', 'and', 'of', 'to', 'a'], x)) AS kept
         |  FROM t)
         |SELECT doc_id,
         |  array_to_string(kept, ' ') AS clean_text,
         |  CAST(len(lt) AS BIGINT) AS n_tokens,
         |  CAST(len(lt) - len(kept) AS BIGINT) AS n_removed
         |FROM k ORDER BY doc_id""".stripMargin,

    "t_pack_sequences" ->
      s"""WITH t AS (SELECT source AS shard, doc_id,
         |    CAST(coalesce(len($toksLower), 0) AS BIGINT) AS n_tokens
         |  FROM documents),
         |o AS (SELECT shard, doc_id, n_tokens,
         |    CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS end_off
         |  FROM t),
         |f AS (SELECT shard, doc_id, n_tokens, end_off,
         |    end_off - n_tokens AS start_off,
         |    (end_off - n_tokens) // 128 AS first_pack,
         |    (end_off - 1) // 128 AS last_pack
         |  FROM o WHERE n_tokens > 0),
         |e AS (SELECT shard, doc_id, n_tokens, start_off, end_off,
         |    unnest(range(first_pack, last_pack + 1)) AS pack_id
         |  FROM f)
         |SELECT shard, doc_id, pack_id, n_tokens,
         |  greatest(start_off, pack_id * 128) - start_off AS doc_slice_start,
         |  least(end_off, (pack_id + 1) * 128) - start_off AS doc_slice_end
         |FROM e ORDER BY shard, doc_id, pack_id""".stripMargin,

    // Pack-purity oracle: the t_pack_sequences replay joined to langs,
    // token-weighted shares, dominant by (tokens DESC, lang DESC).
    "t_pack_purity" ->
      s"""WITH t AS (SELECT source AS shard, doc_id,
         |    CAST(coalesce(len($toksLower), 0) AS BIGINT) AS n_tokens
         |  FROM documents),
         |o AS (SELECT shard, doc_id, n_tokens,
         |    CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS end_off
         |  FROM t),
         |f AS (SELECT shard, doc_id, n_tokens, end_off,
         |    end_off - n_tokens AS start_off,
         |    (end_off - n_tokens) // 128 AS first_pack,
         |    (end_off - 1) // 128 AS last_pack
         |  FROM o WHERE n_tokens > 0),
         |e AS (SELECT shard, doc_id, start_off, end_off,
         |    unnest(range(first_pack, last_pack + 1)) AS pack_id
         |  FROM f),
         |sl AS (SELECT e.shard, e.pack_id, d.lang,
         |    least(end_off, (pack_id + 1) * 128) - greatest(start_off, pack_id * 128) AS slice_tokens
         |  FROM e JOIN documents d USING (doc_id)),
         |g AS (SELECT shard, pack_id, lang,
         |    CAST(sum(slice_tokens) AS BIGINT) AS lang_tokens
         |  FROM sl GROUP BY 1, 2, 3),
         |d2 AS (SELECT shard, pack_id, lang, lang_tokens,
         |    CAST(sum(lang_tokens) OVER (PARTITION BY shard, pack_id) AS BIGINT) AS pack_tokens,
         |    row_number() OVER (PARTITION BY shard, pack_id
         |      ORDER BY lang_tokens DESC, lang DESC) AS rn
         |  FROM g)
         |SELECT shard, pack_id, pack_tokens, lang AS dominant_lang,
         |  round(CAST(lang_tokens AS DOUBLE) / pack_tokens, 6) AS purity
         |FROM d2 WHERE rn = 1 ORDER BY shard, pack_id""".stripMargin,

    "t_pii_scrub" ->
      """WITH t AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id || '@example.com'
        |         WHEN doc_id % 3 = 1 THEN ' call 555-123-4567 or 555-000-1111'
        |         ELSE ' server at 10.0.' || (doc_id % 256) || '.7' END AS t2
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(t2,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |    '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g') AS clean_text,
        |  coalesce(CAST(len(regexp_extract_all(t2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT), 0) AS n_emails,
        |  coalesce(CAST(len(regexp_extract_all(t2, '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT), 0) AS n_phones,
        |  coalesce(CAST(len(regexp_extract_all(t2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT), 0) AS n_ips
        |FROM t ORDER BY doc_id""".stripMargin,

    "dd_within_doc_dedup" ->
      s"""WITH base AS (SELECT doc_id, $toksLower AS lt0 FROM documents),
         |inj AS (SELECT doc_id,
         |    list_concat(lt0[1:10], lt0) AS lt
         |  FROM base),
         |c AS (SELECT doc_id, u.i AS i, u.chunk AS chunk FROM (
         |  SELECT doc_id, unnest(list_transform(
         |      range(0, CAST(ceil(len(lt) / 10.0) AS INT)),
         |      i -> struct_pack(i := i,
         |        chunk := array_to_string(lt[i * 10 + 1 : i * 10 + 10], ' ')))) AS u
         |  FROM inj WHERE len(lt) > 0) x),
         |f AS (SELECT doc_id, chunk, min(i) AS fi FROM c GROUP BY 1, 2),
         |agg AS (SELECT doc_id,
         |    string_agg(chunk, ' ' ORDER BY fi) AS clean_text,
         |    CAST(count(*) AS BIGINT) AS n_kept
         |  FROM f GROUP BY 1),
         |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks FROM c GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(agg.clean_text, '') AS clean_text,
         |  coalesce(tot.n_chunks, 0) AS n_chunks,
         |  coalesce(tot.n_chunks - agg.n_kept, 0) AS n_removed
         |FROM documents d
         |LEFT JOIN agg ON agg.doc_id = d.doc_id
         |LEFT JOIN tot ON tot.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin)
}
