package graft.queries

import graft.core.Tables
import graft.operators.QualityFilters
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model- and rule-based quality filters
  * ([[graft.operators.QualityFilters]]) on the `documents` table:
  * C4-style line cleaning, DSIR importance weights, hashed linear
  * classifier inference.
  */
object QualityQueries {
  private type Q = (SparkSession, String) => DataFrame

  /** Shared bitext fixtures (r16): the zh/de embedding table (one
    * corpus embedding pass) and the EXACT margin mine at the audited
    * operating point (k=4, minMargin=1). v_bitext_margin RETURNS the
    * mined frame and v_bitext_recall measures two ANN points against
    * the same frame; without the memo each query re-ran the corpus
    * embedding AND the quadratic exact kernel — the board paid the
    * most expensive computation in the family twice (guide §1.2: don't
    * compute things twice before tuning anything). Scratch-parquet per
    * session, same discipline as `minhashPairsShared`. */
  /** Shared hashed document embedding (dim 32, doubles) — the corpus
    * text→vector pass consumed by v_doc_knn_hashed, dd_doc_semdedup,
    * the hard-negative family and (lang-joined) the bitext family;
    * without the memo each of them re-tokenized and re-hashed the
    * corpus. One scratch-parquet write per session. */
  private val docEmbMemo =
    new graft.core.BoundedMemo[(SparkSession, String), DataFrame](8)
  private def docEmbShared(s: SparkSession, d: String): DataFrame = {
    docEmbMemo.evictIf((k, _) => k._1.sparkContext.isStopped)
    docEmbMemo.getOrElseUpdate((s, d), graft.core.Scratch.materialize(
      graft.operators.Similarity.hashedDocEmbedding(
          Tables.documents(s, d), "doc_id", "text", dim = 32)
        .select(col("doc_id"),
          transform(col("vec"), x => x.cast("double")).as("v")),
      "doc_emb32", d))
  }

  private val bitextMemo = new graft.core.BoundedMemo[
    (SparkSession, String), (DataFrame, DataFrame, DataFrame)](8)
  private def bitextShared(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame) = {
    bitextMemo.evictIf((k, _) => k._1.sparkContext.isStopped)
    bitextMemo.getOrElseUpdate((s, d), {
      import graft.operators.Similarity
      val docs = Tables.documents(s, d)
      val e = graft.core.Scratch.materialize(
        docEmbShared(s, d)
          .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
          .select(col("doc_id"), col("lang"), col("v")),
        "bitext_emb", d)
      val src = e.filter(col("lang") === "zh").select(col("doc_id"), col("v"))
      val tgt = e.filter(col("lang") === "de").select(col("doc_id"), col("v"))
      val exact = graft.core.Scratch.materialize(
        Similarity.marginBitextMine(src, tgt, "doc_id", "v", "doc_id", "v",
          k = 4, minMargin = 1.0),
        "bitext_exact_full", d)
      (src, tgt, exact)
    })
  }

  /** Shared hard-negative fixtures (r16): the hashed-embedding table
    * and the EXACT mid-rank band (ranks 4..8 of the top-8, build side
    * flipped — anchors broadcast, corpus streams: the scale-correct
    * kernel v_hardneg_recall documents). v_hard_negatives returns this
    * band; v_hardneg_recall measures the IVF-served band against it —
    * one exact pass serves both queries. */
  private val hardnegMemo = new graft.core.BoundedMemo[
    (SparkSession, String), (DataFrame, DataFrame)](8)
  private def hardnegShared(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    hardnegMemo.evictIf((k, _) => k._1.sparkContext.isStopped)
    hardnegMemo.getOrElseUpdate((s, d), {
      import graft.operators.Similarity
      val e = docEmbShared(s, d)
      val anchors = e.filter(col("doc_id") < 20)
      val band = graft.core.Scratch.materialize(
        Similarity.bruteForceTopK(anchors, e, "doc_id", "v", "doc_id", "v",
            k = 8, broadcastCorpus = false, rankRound = Some(6))
          .filter(col("rank") >= 4),
        "hardneg_exact_band", d)
      (e, band)
    })
  }

  val queries: Map[String, Q] = Map(
    // C4-style line cleaning over a deterministically line-injected
    // corpus (the synthetic docs are single-line, so each gets the one
    // real line with terminal punctuation plus doc_id-keyed specimen
    // lines: a javascript/cookie boilerplate line, a lorem-ipsum
    // placeholder, a `{` code line, a too-short line, and an
    // unterminated call-to-action — exercising every rule; the oracle
    // injects identically).
    "t_c4_line_clean" -> ((s, d) => {
      val injected = Tables.scatter(Tables.documents(s, d)).withColumn("text2",
        concat(col("text"), lit("."),
          when(pmod(col("doc_id"), lit(4)) === 0,
            lit("\nplease enable javascript and cookies to continue."))
            .when(pmod(col("doc_id"), lit(4)) === 1,
              lit("\nlorem ipsum dolor sit amet."))
            .when(pmod(col("doc_id"), lit(4)) === 2,
              lit("\nif (x) { return y; }"))
            .otherwise(lit("\nok fine.")),
          lit("\nshare this article now today everyone")))
      QualityFilters.c4LineClean(injected, "doc_id", "text2")
        .orderBy(col("doc_id"))
    }),

    // DSIR importance weights with lang='en' as the target slice: docs
    // whose hashed-unigram distribution looks English-like score
    // positive. 256 buckets; the oracle rebuilds both histograms and
    // every per-bucket log-ratio.
    "t_dsir_weights" -> ((s, d) =>
      QualityFilters.dsirWeights(Tables.scatter(Tables.documents(s, d)),
        "doc_id", "text", isTarget = col("lang") === "en", buckets = 256)
        .orderBy(col("doc_id"))),

    // Hashed linear quality classifier: fastText-shaped sigmoid over
    // 512 hashed bag-of-words features with deterministic pseudo-
    // weights; the oracle replays the hash, the weight formula, and
    // the inference arithmetic per document.
    "t_linear_quality" -> ((s, d) =>
      QualityFilters.hashedLinearQuality(Tables.scatter(Tables.documents(s, d)),
        "doc_id", "text", buckets = 512)
        .orderBy(col("doc_id"))),

    // Token-distribution drift: KL(source ‖ corpus) over hashed-unigram
    // buckets per source — the mixture-drift monitor. The oracle
    // rebuilds both histograms, the full source × support grid, and
    // every micro-nat KL term.
    "t_token_drift" -> ((s, d) =>
      QualityFilters.tokenDriftReport(Tables.scatter(Tables.documents(s, d)),
        "text", groupCol = col("source"), buckets = 256)
        .orderBy(col("group"))),

    // Feature-hashed document embeddings: 32-dim signed-count vectors
    // straight from text (integer components — fingerprint-exact), with
    // the L2 norm as the floating witness.
    "t_hashed_embed" -> ((s, d) =>
      graft.operators.Similarity.hashedDocEmbedding(
          Tables.scatter(Tables.documents(s, d)), "doc_id", "text", dim = 32)
        .select(col("doc_id"), col("n_tokens"),
          md5(array_join(col("vec"), "-")).as("vec_fp"),
          round(graft.functions.VectorFunctions.norm(
            transform(col("vec"), x => x.cast("double"))), 6).as("norm"))
        .orderBy(col("doc_id"))),

    // The text→vector loop closed: exact top-3 cosine neighbors among
    // DOCUMENTS using the in-engine hashed embeddings — the whole
    // retrieval stack with no external model. Integer vectors make
    // every dot product exact, so the oracle replays embedding and
    // search bit-for-bit.
    "v_doc_knn_hashed" -> ((s, d) => {
      import graft.operators.Similarity
      // the shared materialized embedding (one corpus pass per session;
      // both kNN sides read the same scratch table)
      val e = docEmbShared(s, d)
      Similarity.bruteForceTopK(e.filter(col("doc_id") < 20), e,
        "doc_id", "v", "doc_id", "v", k = 3, rankRound = Some(6))
        .withColumn("rank", col("rank").cast("long"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Cross-lingual parallel-pair mining — the LASER/CCMatrix margin
    // construction over the in-engine hashed embeddings: zh sources vs
    // de targets, k=4 neighborhoods both directions, ratio margin,
    // forward-max keep at margin ≥ 1 (strictly closer than the
    // neighborhood mean — the hub-demoting cutoff a raw cosine
    // threshold lacks). Integer vectors + micro-unit cosine
    // quantization make every neighborhood sum and the margin ratio
    // exact longs/ratios — DuckDB replays the whole pipeline
    // value-level.
    "v_bitext_margin" -> ((s, d) =>
      // the exact mine at the audited point, shared with
      // v_bitext_recall's ground-truth band (one kernel run per session)
      bitextShared(s, d)._3.orderBy(col("src_id"))),

    // The ANN-backed miner measuring itself against the exact kernel —
    // the v_recall_report composition for bitext mining: the SAME
    // corpus, k and margin cutoff mined twice, exact broadcast kNN vs
    // marginBitextMineIvf (both kNN directions through ivfSearch, 8
    // deterministic low-id coarse cells per side, nprobe=6). IVF kNN
    // has recall < 1 AND perturbs the neighborhood means the margin
    // divides by, so mined-pair recall is the honest end-to-end number
    // (not per-neighbor recall). Counts are exact longs; the recall
    // ratio is floor-micro quantized — value-level replay.
    "v_bitext_recall" -> ((s, d) => {
      import graft.operators.Similarity
      // Each mined set is MATERIALIZED before the count/intersection
      // algebra: settingRow references every set 2-3× (count + semi
      // join), and the exact kernel is quadratic by semantics — at
      // sf10 (75k × 70k sides, ~16 min for one evaluation) the lazy
      // plan re-ran it per reference and the audit took hours instead
      // of minutes. Found by the r14 full sf10 board. r16: the exact
      // kernel run itself is shared with v_bitext_margin (bitextShared).
      val (src, tgt, exactFull) = bitextShared(s, d)
      val exact = exactFull.select(col("src_id"), col("tgt_id"))
      val srcCent = src.orderBy(col("doc_id")).limit(8)
        .select(col("doc_id").as("cent_id"), col("v").as("cv"))
      val tgtCent = tgt.orderBy(col("doc_id")).limit(8)
        .select(col("doc_id").as("cent_id"), col("v").as("cv"))
      val ann = graft.core.Scratch.materialize(
        Similarity.marginBitextMineIvf(src, tgt,
            "doc_id", "v", "doc_id", "v", k = 4, minMargin = 1.0,
            srcCent, tgtCent, "cent_id", "cv", nprobe = 6)
          .select(col("src_id"), col("tgt_id")),
        "bitext_ann_fixed", d)
      // auto = the DERIVED point (r14): ⌈√N⌉ cells per side, nprobe
      // MEASURED per direction by ivfCalibrateNprobe's cell-rank
      // histogram at a 95% target — the LSH auto discipline applied to
      // IVF. Rides next to the fixed hand-set point it replaced
      // (ivf_c8_p6, recall 0.89/0.88 at sf0.01/0.1).
      val annAuto = graft.core.Scratch.materialize(
        Similarity.marginBitextMineIvfAuto(src, tgt,
            "doc_id", "v", "doc_id", "v", k = 4, minMargin = 1.0)
          .select(col("src_id"), col("tgt_id")),
        "bitext_ann_auto", d)
      def r6(x: org.apache.spark.sql.Column) =
        floor(x * lit(1e6) + lit(0.5)) / lit(1e6)
      def settingRow(setting: String, mined: DataFrame): DataFrame = {
        val hit = exact.join(mined, Seq("src_id", "tgt_id"), "left_semi")
        exact.agg(count(lit(1)).as("n_exact"))
          .crossJoin(mined.agg(count(lit(1)).as("n_ann")))
          .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
          .select(lit(setting).as("setting"),
            col("n_exact"), col("n_ann"), col("n_hit"),
            when(col("n_exact") > 0, r6(col("n_hit").cast("double") /
              col("n_exact").cast("double"))).as("recall"))
      }
      settingRow("auto", annAuto)
        .unionByName(settingRow("ivf_c8_p6", ann))
        .orderBy(col("setting"))
    }),

    // Contrastive-training negative sampling: k deterministic
    // pseudo-random non-self partners per anchor (md5 of anchor:slot
    // mod corpus size, +1 skip on self-collision) — reproducible at any
    // partitioning, like the split/sample family.
    "t_negative_sample" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.agg(count(lit(1)).as("n"))
      docs.crossJoin(broadcast(n))
        .select(col("doc_id"), col("n"),
          explode(sequence(lit(0L), lit(3L))).as("neg_rank"))
        .withColumn("__h",
          pmod(conv(substring(md5(concat(col("doc_id"), lit(":"), col("neg_rank"))),
            1, 15), 16, 10).cast("long"), col("n")))
        .select(col("doc_id"), col("neg_rank"),
          when(col("__h") === col("doc_id"), pmod(col("__h") + 1, col("n")))
            .otherwise(col("__h")).as("neg_id"))
        .orderBy(col("doc_id"), col("neg_rank"))
    }),

    // Hard-negative mining: the near-but-not-nearest band of the exact
    // cosine ranking (ranks 4..8) over the hashed embeddings — the
    // negatives that actually teach a contrastive model.
    "v_hard_negatives" -> ((s, d) =>
      // the exact mid-rank band, shared with v_hardneg_recall's ground
      // truth (rank semantics are round-6 + id tie-break, so the band
      // is identical whichever join side builds — the shared kernel
      // runs build-side-flipped, the scale-correct form)
      hardnegShared(s, d)._2
        .withColumn("rank", col("rank").cast("long"))
        .orderBy(col("query_id"), col("rank"))),

    // The ANN-SERVED twin of v_hard_negatives, measuring itself (the
    // v_recall_report discipline): the same mid-rank band (exact ranks
    // 4..8) mined twice — once exactly with the build side FLIPPED
    // (anchors stream-joined against the corpus: the 20-row side is the
    // one to broadcast; corpus-side broadcast is what made the exact
    // query 69×/decade at sf10) and once through the DERIVED IVF point
    // (⌈√N⌉ lowest-id coarse cells capped at 1024 — the
    // marginBitextMineAuto cell budget — with nprobe MEASURED by
    // ivfCalibrateNprobe's cell-rank histogram at a 95% target). The
    // recall row is the honest end-to-end number a negative-mining
    // deployment reads before trusting the served band; the derived
    // nprobe rides in the row so the calibration itself is oracled.
    "v_hardneg_recall" -> ((s, d) => {
      import graft.operators.Similarity
      // one exact band per session, shared with v_hard_negatives
      val (e, band) = hardnegShared(s, d)
      val anchors = e.filter(col("doc_id") < 20)
      val exact = band.select(col("query_id"), col("neighbor_id"))
      val n = e.count()
      val nCells = math.min(1024, math.max(1,
        math.ceil(math.sqrt(n.toDouble)).toInt))
      val cents = e.orderBy(col("doc_id")).limit(nCells)
        .select(col("doc_id").as("cent_id"), col("v").as("cv"))
      val np = Similarity.ivfCalibrateNprobe(anchors, e, "doc_id", "v",
        "doc_id", "v", cents, "cent_id", "cv", k = 8)
      val ann = graft.core.Scratch.materialize(
        Similarity.ivfSearch(anchors, e, "doc_id", "v", "doc_id", "v",
            cents, "cent_id", "cv", nprobe = np, k = 8, rankRound = Some(6))
          .filter(col("rank") >= 4)
          .select(col("query_id"), col("neighbor_id")),
        "hardneg_ann", d)
      def r6(x: org.apache.spark.sql.Column) =
        floor(x * lit(1e6) + lit(0.5)) / lit(1e6)
      val hit = exact.join(ann, Seq("query_id", "neighbor_id"), "left_semi")
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(ann.agg(count(lit(1)).as("n_ann")))
        .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
        .select(lit("ivf_auto").as("setting"), lit(np.toLong).as("nprobe"),
          col("n_exact"), col("n_ann"), col("n_hit"),
          when(col("n_exact") > 0, r6(col("n_hit").cast("double") /
            col("n_exact").cast("double"))).as("recall"))
    }),

    // SemDeDup on RAW TEXT: hashed embeddings → IVF-cell blocking →
    // within-cell cosine dedup, every stage in-engine. Integer vectors
    // make the cell assignment and the ≥ eps comparisons exact, so the
    // oracle replays the full chain.
    "dd_doc_semdedup" -> ((s, d) => {
      import graft.operators.{Dedup, Similarity}
      // the shared materialized embedding (one corpus pass per session)
      val e = docEmbShared(s, d)
      val cents = e.filter(col("doc_id") < 8)
        .select(col("doc_id").as("cent_id"), col("v").as("cv"))
      Dedup.semDedup(e, "doc_id", "v", cents, "cent_id", "cv", eps = 0.9)
        .orderBy(col("doc_id"))
    }),

    // Zipf slope of the per-language token-frequency curve — the
    // corpus-health check (natural text ≈ −1; boilerplate/synthetic
    // slices drift). Exact-integer regression sums; see
    // [[graft.operators.CorpusStats.zipfSlope]].
    "t_zipf_slope" -> ((s, d) =>
      graft.operators.CorpusStats.zipfSlope(
          Tables.scatter(Tables.documents(s, d)), col("lang"), "text",
          topRanks = 100)
        .select(col("grp").as("lang"), col("n"), round(col("slope"), 6).as("slope"))
        .orderBy(col("lang"))),

    // Per-source training-mixture report: token share + mixture Shannon
    // entropy — the balance summary read before choosing sampling
    // weights. Exact long counts; micro-nat entropy terms.
    "t_domain_mix" -> ((s, d) =>
      graft.operators.CorpusStats.domainMixReport(
          Tables.scatter(Tables.documents(s, d)), col("source"), "text")
        .select(col("domain").as("source"), col("n_docs"), col("n_tokens"),
          round(col("token_share"), 6).as("token_share"),
          round(col("mix_entropy"), 6).as("mix_entropy"))
        .orderBy(col("source")))
  )

  private val toksLower =
    """list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> len(x) > 0)"""

  import Oracles.jr6

  val oracleSql: Map[String, String] = Map(
    "t_c4_line_clean" ->
      s"""WITH inj AS (SELECT doc_id, text || '.' ||
         |    CASE CAST(doc_id % 4 AS INT)
         |      WHEN 0 THEN chr(10) || 'please enable javascript and cookies to continue.'
         |      WHEN 1 THEN chr(10) || 'lorem ipsum dolor sit amet.'
         |      WHEN 2 THEN chr(10) || 'if (x) { return y; }'
         |      ELSE chr(10) || 'ok fine.'
         |    END || chr(10) || 'share this article now today everyone' AS t2
         |  FROM documents),
         |ls AS (SELECT doc_id, string_split(t2, chr(10)) AS ls FROM inj),
         |k AS (SELECT doc_id, ls,
         |    list_filter(ls, l -> regexp_matches(trim(l), '[.!?"]$$')
         |      AND len(list_filter(regexp_split_to_array(trim(l), '\\s+'), x -> len(x) > 0)) >= 4
         |      AND NOT contains(lower(l), 'javascript')
         |      AND NOT contains(lower(l), 'cookie')) AS kept,
         |    (len(list_filter(ls, l -> contains(lower(l), 'lorem ipsum'))) > 0
         |      OR len(list_filter(ls, l -> contains(lower(l), '{'))) > 0) AS pagebad
         |  FROM ls)
         |SELECT doc_id,
         |  CAST(len(ls) AS BIGINT) AS n_lines,
         |  CAST(len(kept) AS BIGINT) AS n_kept_lines,
         |  (NOT pagebad AND len(kept) > 0) AS keep_page,
         |  CASE WHEN NOT pagebad THEN array_to_string(kept, chr(10)) END AS clean_text
         |FROM k ORDER BY doc_id""".stripMargin,

    "t_dsir_weights" ->
      s"""WITH t AS (SELECT doc_id, lang = 'en' AS tgt, $toksLower AS lt FROM documents),
         |tok AS (SELECT doc_id, tgt, unnest(lt) AS w FROM t),
         |tb AS (SELECT doc_id, tgt,
         |    ('0x' || substr(md5(w), 1, 15))::BIGINT % 256 AS b FROM tok),
         |db AS (SELECT doc_id, b, bool_or(tgt) AS tgt, count(*) AS c
         |  FROM tb GROUP BY 1, 2),
         |hist AS (SELECT b, sum(c) AS n_raw,
         |    sum(CASE WHEN tgt THEN c ELSE 0 END) AS n_tgt FROM db GROUP BY 1),
         |tot AS (SELECT sum(n_raw) AS tr, sum(n_tgt) AS tt FROM hist),
         |lr AS (SELECT b,
         |    CAST(round(${jr6("ln((n_tgt + 1.0) / (tt + 256.0)) - ln((n_raw + 1.0) / (tr + 256.0))")}
         |      * 1000000.0) AS BIGINT) AS lr
         |  FROM hist CROSS JOIN tot),
         |agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |    CAST(sum(c * lr) AS BIGINT) AS s2
         |  FROM db JOIN lr USING (b) GROUP BY 1)
         |SELECT doc_id, n_tokens,
         |  ${jr6("(CAST(s2 AS DOUBLE) / 1000000.0) / CAST(n_tokens AS DOUBLE)")} AS dsir_score
         |FROM agg ORDER BY doc_id""".stripMargin,

    "t_linear_quality" ->
      s"""WITH t AS (SELECT doc_id, $toksLower AS lt FROM documents),
         |tok AS (SELECT doc_id, unnest(lt) AS w FROM t),
         |tb AS (SELECT doc_id,
         |    ('0x' || substr(md5(w), 1, 15))::BIGINT % 512 AS b FROM tok),
         |db AS (SELECT doc_id, b, count(*) AS c FROM tb GROUP BY 1, 2),
         |wt AS (SELECT doc_id, c,
         |    ('0x' || substr(md5('w' || CAST(b AS VARCHAR)), 1, 15))::BIGINT % 2001
         |      - 1000 AS w
         |  FROM db),
         |agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |    CAST(sum(c * w) AS BIGINT) AS s2 FROM wt GROUP BY 1),
         |sc AS (SELECT doc_id, n_tokens,
         |    -0.1 + (CAST(s2 AS DOUBLE) / 1000.0) / CAST(n_tokens AS DOUBLE) AS s
         |  FROM agg)
         |SELECT doc_id, n_tokens, ${jr6("s")} AS score,
         |  ${jr6(s"1.0 / (1.0 + exp(-${jr6("s")}))")} AS prob,
         |  ${jr6("s")} >= 0 AS keep
         |FROM sc ORDER BY doc_id""".stripMargin,

    "t_token_drift" ->
      s"""WITH t AS (SELECT source AS g, $toksLower AS lt FROM documents),
         |tok AS (SELECT g, unnest(lt) AS w FROM t),
         |tb AS (SELECT g, ('0x' || substr(md5(w), 1, 15))::BIGINT % 256 AS b FROM tok),
         |gb AS (SELECT g, b, count(*) AS c FROM tb GROUP BY 1, 2),
         |gt AS (SELECT g, sum(c) AS tg FROM gb GROUP BY 1),
         |corpus AS (SELECT b, sum(c) AS cc FROM gb GROUP BY 1),
         |tot AS (SELECT sum(cc) AS tc FROM corpus),
         |bb AS (SELECT range AS b FROM range(0, 256)),
         |grid AS (SELECT gt.g, gt.tg, bb.b, coalesce(corpus.cc, 0) AS cc,
         |    coalesce(gb.c, 0) AS c
         |  FROM gt CROSS JOIN bb
         |  LEFT JOIN corpus ON corpus.b = bb.b
         |  LEFT JOIN gb ON gb.g = gt.g AND gb.b = bb.b),
         |term AS (SELECT g, tg,
         |    CAST(round(((c + 1.0) / (tg + 256.0))
         |      * ln(((c + 1.0) / (tg + 256.0)) / ((cc + 1.0) / (tc + 256.0)))
         |      * 1000000.0) AS BIGINT) AS term
         |  FROM grid CROSS JOIN tot),
         |agg AS (SELECT g, CAST(max(tg) AS BIGINT) AS n_tokens,
         |    CAST(sum(term) AS BIGINT) AS kl FROM term GROUP BY 1)
         |SELECT g AS "group", n_tokens,
         |  ${jr6("CAST(kl AS DOUBLE) / 1000000.0")} AS kl_divergence
         |FROM agg ORDER BY g""".stripMargin,

    "t_hashed_embed" ->
      s"""$hashedVecCtes
         |nt AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens
         |  FROM cells GROUP BY 1)
         |SELECT v.doc_id, nt.n_tokens,
         |  md5(array_to_string(v.vec, '-')) AS vec_fp,
         |  ${jr6("sqrt(list_sum(list_transform(v.vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))")} AS norm
         |FROM vecs v JOIN nt USING (doc_id) ORDER BY v.doc_id""".stripMargin,

    // Bitext-margin replay: both kNN directions (rank by round(cos,6),
    // id tie-break), micro-unit cosine sums per neighborhood, the
    // 2k·cos/(sf+st) exact-long margin ratio, forward-max keep. Every
    // intermediate is either an exact integer or a ratio of identical
    // doubles, so the compare is value-level. (CTE helpers shared with
    // the v_bitext_recall replay.)
    "v_bitext_margin" ->
      s"""$hashedVecCtes
         |$bitextSideCtes,
         |${bitextKnnCtes("",
             "srcv q JOIN tgtv c ON q.doc_id <> c.doc_id",
             "tgtv q JOIN srcv c ON q.doc_id <> c.doc_id")},
         |${bitextMinedCtes("")}
         |SELECT src_id, tgt_id, cosine, margin FROM mined
         |ORDER BY src_id""".stripMargin,

    // v_bitext_recall replay: the exact-mined set (the CTEs above) next
    // to a full IVF-kNN replay — per-side low-id coarse centroids,
    // sqrt-L2 nearest-cell assignment (cid tie-break), nprobe=6 probe
    // cells per query, within-cell kNN, the same margin fold — then
    // exact-long counts and a floor-micro recall ratio.
    "v_bitext_recall" ->
      s"""$hashedVecCtes
         |$bitextSideCtes,
         |${bitextKnnCtes("",
             "srcv q JOIN tgtv c ON q.doc_id <> c.doc_id",
             "tgtv q JOIN srcv c ON q.doc_id <> c.doc_id")},
         |${bitextMinedCtes("")},
         |$bitextIvfCtes,
         |${bitextKnnCtes("_iv",
             """fprobe p JOIN srcv q ON q.doc_id = p.qid
               |    JOIN tcell tc ON tc.cell = p.cell
               |    JOIN tgtv c ON c.doc_id = tc.doc_id""".stripMargin,
             """bprobe p JOIN tgtv q ON q.doc_id = p.qid
               |    JOIN scell sc ON sc.cell = p.cell
               |    JOIN srcv c ON c.doc_id = sc.doc_id""".stripMargin)},
         |${bitextMinedCtes("_iv")},
         |$bitextIvfAutoCtes,
         |${bitextKnnCtes("_av",
             """fprobea p JOIN srcv q ON q.doc_id = p.qid
               |    JOIN tcella tc ON tc.cell = p.cell
               |    JOIN tgtv c ON c.doc_id = tc.doc_id""".stripMargin,
             """bprobea p JOIN tgtv q ON q.doc_id = p.qid
               |    JOIN scella sc ON sc.cell = p.cell
               |    JOIN srcv c ON c.doc_id = sc.doc_id""".stripMargin)},
         |${bitextMinedCtes("_av")}
         |SELECT setting, n_exact, n_ann, n_hit,
         |  CASE WHEN n_exact > 0 THEN
         |    floor(CAST(n_hit AS DOUBLE) / CAST(n_exact AS DOUBLE) * 1e6 + 0.5) / 1e6
         |  END AS recall
         |FROM (
         |  SELECT 'auto' AS setting,
         |    (SELECT CAST(count(*) AS BIGINT) FROM mined) AS n_exact,
         |    (SELECT CAST(count(*) AS BIGINT) FROM mined_av) AS n_ann,
         |    (SELECT CAST(count(*) AS BIGINT) FROM
         |      (SELECT src_id, tgt_id FROM mined INTERSECT
         |       SELECT src_id, tgt_id FROM mined_av) h) AS n_hit
         |  UNION ALL
         |  SELECT 'ivf_c8_p6' AS setting,
         |    (SELECT CAST(count(*) AS BIGINT) FROM mined) AS n_exact,
         |    (SELECT CAST(count(*) AS BIGINT) FROM mined_iv) AS n_ann,
         |    (SELECT CAST(count(*) AS BIGINT) FROM
         |      (SELECT src_id, tgt_id FROM mined INTERSECT
         |       SELECT src_id, tgt_id FROM mined_iv) h) AS n_hit) x
         |ORDER BY setting""".stripMargin,

    "v_doc_knn_hashed" ->
      s"""$hashedVecCtes
         |s AS (
         |  SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
         |    CASE WHEN sqrt(list_sum(list_transform(q.vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         |        * sqrt(list_sum(list_transform(c.vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) > 0
         |      THEN list_sum(list_transform(range(1, 33),
         |          i -> CAST(q.vec[i] AS DOUBLE) * CAST(c.vec[i] AS DOUBLE))) /
         |        (sqrt(list_sum(list_transform(q.vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         |          * sqrt(list_sum(list_transform(c.vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
         |      ELSE 0.0 END AS cos_raw
         |  FROM (SELECT * FROM vecs WHERE doc_id < 20) q
         |  JOIN vecs c ON q.doc_id <> c.doc_id)
         |SELECT query_id, neighbor_id, cosine, rank FROM (
         |  SELECT query_id, neighbor_id, round(cos_raw, 6) AS cosine,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY round(cos_raw, 6) DESC, neighbor_id ASC) AS rank
         |  FROM s) t
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

    "t_negative_sample" ->
      s"""WITH n AS (SELECT count(*) AS n FROM documents),
         |g AS (SELECT d.doc_id, r.range AS neg_rank, n.n
         |  FROM documents d CROSS JOIN range(0, 4) r CROSS JOIN n),
         |h AS (SELECT doc_id, neg_rank, n,
         |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(neg_rank AS VARCHAR)),
         |      1, 15))::BIGINT % n AS h
         |  FROM g)
         |SELECT doc_id, neg_rank,
         |  CASE WHEN h = doc_id THEN (h + 1) % n ELSE h END AS neg_id
         |FROM h ORDER BY doc_id, neg_rank""".stripMargin,

    "v_hard_negatives" ->
      s"""$hashedVecCtes
         |s AS (
         |  SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
         |    CASE WHEN sqrt(list_sum(list_transform(q.vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         |        * sqrt(list_sum(list_transform(c.vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) > 0
         |      THEN list_sum(list_transform(range(1, 33),
         |          i -> CAST(q.vec[i] AS DOUBLE) * CAST(c.vec[i] AS DOUBLE))) /
         |        (sqrt(list_sum(list_transform(q.vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         |          * sqrt(list_sum(list_transform(c.vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
         |      ELSE 0.0 END AS cos_raw
         |  FROM (SELECT * FROM vecs WHERE doc_id < 20) q
         |  JOIN vecs c ON q.doc_id <> c.doc_id)
         |SELECT query_id, neighbor_id, cosine, rank FROM (
         |  SELECT query_id, neighbor_id, round(cos_raw, 6) AS cosine,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY round(cos_raw, 6) DESC, neighbor_id ASC) AS rank
         |  FROM s) t
         |WHERE rank BETWEEN 4 AND 8 ORDER BY query_id, rank""".stripMargin,

    // v_hardneg_recall replay: exact anchor ranking (round-6, id
    // tie-break) → the 4..8 band; the derived IVF point — least(⌈√N⌉,
    // 1024) lowest-id centroids, corpus cell assignment, per-anchor
    // centroid rank lists, the calibration cut (top-8 truth per sampled
    // anchor, cell-rank histogram, integer cum·100 ≥ tot·95), probe
    // lists, within-probed-cell ranking → the served band; exact-long
    // counts and a floor-micro recall.
    "v_hardneg_recall" -> {
      def l2(a: String, b: String): String =
        s"sqrt(list_sum(list_transform(range(1, 33), i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))))"
      s"""$hashedVecCtes
         |ev AS MATERIALIZED (SELECT doc_id,
         |    list_transform(vec, x -> CAST(x AS DOUBLE)) AS vv FROM vecs),
         |anc AS (SELECT doc_id, vv FROM ev WHERE doc_id < 20),
         |exs AS (SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
         |    round(${bitextCos("q.vv", "c.vv")}, 6) AS cosine
         |  FROM anc q JOIN ev c ON q.doc_id <> c.doc_id),
         |exr AS MATERIALIZED (SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, neighbor_id) AS rank
         |  FROM exs),
         |exb AS (SELECT query_id, neighbor_id FROM exr WHERE rank BETWEEN 4 AND 8),
         |ncq AS (SELECT least(1024, greatest(1,
         |    CAST(ceil(sqrt(CAST((SELECT count(*) FROM ev) AS DOUBLE))) AS BIGINT))) AS nc),
         |centq AS (SELECT doc_id AS cid, vv AS cv FROM (
         |    SELECT doc_id, vv, row_number() OVER (ORDER BY doc_id) AS rn FROM ev) x
         |  WHERE rn <= (SELECT nc FROM ncq)),
         |cellq AS MATERIALIZED (SELECT doc_id, cid AS cell FROM (
         |    SELECT t.doc_id, c.cid, row_number() OVER (PARTITION BY t.doc_id
         |      ORDER BY ${l2("t.vv", "c.cv")} ASC, c.cid ASC) AS rn
         |    FROM ev t CROSS JOIN centq c) x WHERE rn = 1),
         |rnkq AS MATERIALIZED (SELECT q.doc_id AS qid, c.cid AS cell,
         |    row_number() OVER (PARTITION BY q.doc_id
         |      ORDER BY ${l2("q.vv", "c.cv")} ASC, c.cid ASC) AS rn
         |  FROM anc q CROSS JOIN centq c),
         |smpq AS (SELECT doc_id FROM (
         |    SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rn FROM anc) x
         |  WHERE rn <= 64),
         |hitq AS (SELECT query_id AS qid, neighbor_id AS nid FROM exr
         |  WHERE rank <= 8 AND query_id IN (SELECT doc_id FROM smpq)),
         |hrq AS (SELECT r.rn FROM hitq h
         |  JOIN cellq tc ON tc.doc_id = h.nid
         |  JOIN rnkq r ON r.qid = h.qid AND r.cell = tc.cell),
         |covq AS (SELECT rn, CAST(count(*) AS BIGINT) AS c FROM hrq GROUP BY rn),
         |cumq AS (SELECT rn, sum(c) OVER (ORDER BY rn) AS cum,
         |    sum(c) OVER () AS tot FROM covq),
         |npq AS (SELECT COALESCE(
         |    (SELECT min(rn) FROM cumq WHERE cum * 100 >= tot * 95), 1) AS np),
         |anns AS (SELECT q.doc_id AS query_id, t.doc_id AS neighbor_id,
         |    round(${bitextCos("q.vv", "t.vv")}, 6) AS cosine
         |  FROM rnkq p JOIN anc q ON q.doc_id = p.qid
         |  JOIN cellq cl ON cl.cell = p.cell
         |  JOIN ev t ON t.doc_id = cl.doc_id
         |  WHERE p.rn <= (SELECT np FROM npq) AND q.doc_id <> t.doc_id),
         |annb AS MATERIALIZED (SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY cosine DESC, neighbor_id) AS rank
         |    FROM anns) x WHERE rank BETWEEN 4 AND 8),
         |cnt AS (SELECT
         |    (SELECT CAST(count(*) AS BIGINT) FROM exb) AS n_exact,
         |    (SELECT CAST(count(*) AS BIGINT) FROM annb) AS n_ann,
         |    (SELECT CAST(count(*) AS BIGINT) FROM
         |      (SELECT query_id, neighbor_id FROM exb INTERSECT
         |       SELECT query_id, neighbor_id FROM annb) h) AS n_hit)
         |SELECT 'ivf_auto' AS setting,
         |  (SELECT CAST(np AS BIGINT) FROM npq) AS nprobe,
         |  n_exact, n_ann, n_hit,
         |  CASE WHEN n_exact > 0 THEN
         |    floor(CAST(n_hit AS DOUBLE) / CAST(n_exact AS DOUBLE) * 1e6 + 0.5) / 1e6
         |  END AS recall
         |FROM cnt""".stripMargin
    },

    "dd_doc_semdedup" ->
      s"""$hashedVecCtes
         |e2 AS (SELECT doc_id, list_transform(vec, x -> CAST(x AS DOUBLE)) AS v FROM vecs),
         |c AS (SELECT doc_id AS cent_id, v AS cv FROM e2 WHERE doc_id < 8),
         |dd AS (
         |  SELECT e2.doc_id, c.cent_id,
         |    sqrt(list_sum(list_transform(range(1, 33),
         |      i -> (e2.v[i] - c.cv[i]) * (e2.v[i] - c.cv[i])))) AS dist
         |  FROM e2 CROSS JOIN c),
         |best AS (
         |  SELECT doc_id, cent_id AS cell FROM (
         |    SELECT doc_id, cent_id,
         |      row_number() OVER (PARTITION BY doc_id ORDER BY dist ASC, cent_id ASC) AS rn
         |    FROM dd) t WHERE rn = 1),
         |eb AS (SELECT e2.doc_id, e2.v, b.cell FROM e2 JOIN best b USING (doc_id)),
         |dup AS (SELECT DISTINCT b.doc_id
         |  FROM eb a JOIN eb b ON a.cell = b.cell AND b.doc_id > a.doc_id
         |  WHERE list_sum(list_transform(range(1, 33), i -> a.v[i] * b.v[i])) /
         |    (sqrt(list_sum(list_transform(range(1, 33), i -> a.v[i] * a.v[i]))) *
         |     sqrt(list_sum(list_transform(range(1, 33), i -> b.v[i] * b.v[i])))) >= 0.9)
         |SELECT eb.doc_id, eb.cell,
         |  CAST(CASE WHEN dup.doc_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
         |FROM eb LEFT JOIN dup ON eb.doc_id = dup.doc_id
         |ORDER BY eb.doc_id""".stripMargin,

    // Replays the exact-integer regression-term policy: each ln-term is
    // jr-rounded to nano/pico units per ROW, so the four sums are
    // order-free and the slope division runs on identical operands.
    "t_zipf_slope" ->
      s"""WITH t AS (SELECT lang, $toksLower AS lt FROM documents),
         |tok AS (SELECT lang, unnest(lt) AS tok FROM t),
         |cnt AS (SELECT lang, tok, count(*) AS c FROM tok GROUP BY 1, 2),
         |rk AS (SELECT lang, c,
         |    row_number() OVER (PARTITION BY lang ORDER BY c DESC, tok ASC) AS r
         |  FROM cnt),
         |terms AS (SELECT lang,
         |    CAST(${Oracles.jrWide("ln(CAST(r AS DOUBLE)) * 1000000000.0", 0)} AS BIGINT) AS tx,
         |    CAST(${Oracles.jrWide("ln(CAST(c AS DOUBLE)) * 1000000000.0", 0)} AS BIGINT) AS ty,
         |    CAST(${Oracles.jrWide("ln(CAST(r AS DOUBLE)) * ln(CAST(r AS DOUBLE)) * 1000000000000.0", 0)} AS BIGINT) AS txx,
         |    CAST(${Oracles.jrWide("ln(CAST(r AS DOUBLE)) * ln(CAST(c AS DOUBLE)) * 1000000000000.0", 0)} AS BIGINT) AS txy
         |  FROM rk WHERE r <= 100),
         |agg AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(tx) AS BIGINT) AS sx, CAST(sum(ty) AS BIGINT) AS sy,
         |    CAST(sum(txx) AS BIGINT) AS sxx, CAST(sum(txy) AS BIGINT) AS sxy
         |  FROM terms GROUP BY lang HAVING count(*) >= 3)
         |SELECT lang, n,
         |  ${jr6("(CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1000000000000.0) - " +
             "(CAST(sx AS DOUBLE) / 1000000000.0) * (CAST(sy AS DOUBLE) / 1000000000.0)) / " +
             "(CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1000000000000.0) - " +
             "(CAST(sx AS DOUBLE) / 1000000000.0) * (CAST(sx AS DOUBLE) / 1000000000.0))")} AS slope
         |FROM agg ORDER BY lang""".stripMargin,

    "t_domain_mix" ->
      s"""WITH t AS (SELECT source, len($toksLower) AS nt FROM documents),
         |c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(nt) AS BIGINT) AS n_tokens FROM t GROUP BY source),
         |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot FROM c),
         |sh AS (SELECT source, n_docs, n_tokens,
         |    CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE) AS share
         |  FROM c CROSS JOIN tot),
         |e AS (SELECT *, CAST(${Oracles.jr(
             "CASE WHEN n_tokens > 0 THEN -share * ln(share) ELSE 0.0 END * 1000000.0", 0)}
         |    AS BIGINT) AS ent_term FROM sh),
         |g AS (SELECT CAST(sum(ent_term) AS BIGINT) AS se FROM e)
         |SELECT source, n_docs, n_tokens,
         |  ${jr6("share")} AS token_share,
         |  ${jr6("CAST(se AS DOUBLE) / 1000000.0")} AS mix_entropy
         |FROM e CROSS JOIN g ORDER BY source""".stripMargin
  )

  /** Shared CTE chain: text → 32-dim hashed signed-count vectors
    * (zero-filled via the doc × dim grid, assembled in j order). */
  /** 32-dim cosine over `vv` double-list columns with the zero-norm
    * guard (0 when a norm is 0), matching the engine's cosine kernels.
    */
  private def bitextCos(q: String, c: String): String =
    s"""CASE WHEN sqrt(list_sum(list_transform($q, x -> x * x)))
       |        * sqrt(list_sum(list_transform($c, x -> x * x))) > 0
       |      THEN list_sum(list_transform(range(1, 33), i -> $q[i] * $c[i])) /
       |        (sqrt(list_sum(list_transform($q, x -> x * x)))
       |          * sqrt(list_sum(list_transform($c, x -> x * x))))
       |      ELSE 0.0 END""".stripMargin

  /** zh/de embedding sides on top of [[hashedVecCtes]]:
    * `srcv`/`tgtv(doc_id, vv)`. */
  private def bitextSideCtes: String =
    s"""e AS (SELECT v.doc_id, d.lang,
       |    list_transform(v.vec, x -> CAST(x AS DOUBLE)) AS vv
       |  FROM vecs v JOIN documents d USING (doc_id)),
       |srcv AS MATERIALIZED (SELECT doc_id, vv FROM e WHERE lang = 'zh'),
       |tgtv AS MATERIALIZED (SELECT doc_id, vv FROM e WHERE lang = 'de')""".stripMargin

  /** Directed-kNN CTEs `fwd$p(src_id, tgt_id, cosine, m, rk)` /
    * `bwd$p(tgt_id, src_id, m, rk)` over caller-supplied candidate-pair
    * FROM clauses binding `q` (query side) and `c` (corpus side) rows
    * with `doc_id`/`vv` columns — the full cross join for the exact
    * kernel, probe-cell-pruned joins for the IVF replay.
    */
  private def bitextKnnCtes(p: String, fwdFrom: String, bwdFrom: String): String =
    s"""fraw$p AS (SELECT q.doc_id AS src_id, c.doc_id AS tgt_id,
       |    ${bitextCos("q.vv", "c.vv")} AS cr
       |  FROM $fwdFrom),
       |fwd$p AS MATERIALIZED (SELECT src_id, tgt_id, round(cr, 6) AS cosine,
       |    CAST(floor(round(cr, 6) * 1e6 + 0.5) AS BIGINT) AS m,
       |    row_number() OVER (PARTITION BY src_id
       |      ORDER BY round(cr, 6) DESC, tgt_id) AS rk
       |  FROM fraw$p),
       |braw$p AS (SELECT q.doc_id AS tgt_id, c.doc_id AS src_id,
       |    ${bitextCos("q.vv", "c.vv")} AS cr
       |  FROM $bwdFrom),
       |bwd$p AS MATERIALIZED (SELECT tgt_id, src_id,
       |    CAST(floor(round(cr, 6) * 1e6 + 0.5) AS BIGINT) AS m,
       |    row_number() OVER (PARTITION BY tgt_id
       |      ORDER BY round(cr, 6) DESC, src_id) AS rk
       |  FROM braw$p)""".stripMargin

  /** The margin fold over `fwd$p`/`bwd$p` (k=4, 2k=8, margin ≥ 1.0),
    * ending in `mined$p(src_id, tgt_id, cosine, margin)`. */
  private def bitextMinedCtes(p: String): String =
    s"""fs$p AS (SELECT src_id, CAST(sum(m) AS BIGINT) AS sf
       |  FROM fwd$p WHERE rk <= 4 GROUP BY 1),
       |bs$p AS (SELECT tgt_id, CAST(sum(m) AS BIGINT) AS st
       |  FROM bwd$p WHERE rk <= 4 GROUP BY 1),
       |cand$p AS (SELECT f.src_id, f.tgt_id, f.cosine,
       |    floor(CAST(f.m * 8 AS DOUBLE) / CAST(fs$p.sf + bs$p.st AS DOUBLE)
       |      * 1e6 + 0.5) / 1e6 AS margin
       |  FROM fwd$p f JOIN fs$p USING (src_id) JOIN bs$p USING (tgt_id)
       |  WHERE f.rk <= 4 AND fs$p.sf + bs$p.st > 0),
       |mined$p AS (SELECT src_id, tgt_id, cosine, margin FROM (
       |    SELECT *, row_number() OVER (PARTITION BY src_id
       |      ORDER BY margin DESC, tgt_id) AS rn FROM cand$p) z
       |  WHERE rn = 1 AND margin >= 1.0)""".stripMargin

  /** IVF-side CTEs for the bitext replay: per-side low-id centroid
    * tables (`srcc`/`tgtc(cid, cv)`), corpus nearest-cell assignments
    * (`scell`/`tcell(doc_id, cell)` — sqrt-L2 asc, cid tie-break), and
    * nprobe=6 probe lists per query (`fprobe`/`bprobe(qid, cell)`).
    */
  private def bitextIvfCtes: String = {
    def l2(a: String, b: String): String =
      s"sqrt(list_sum(list_transform(range(1, 33), i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))))"
    s"""srcc AS (SELECT doc_id AS cid, vv AS cv FROM srcv ORDER BY doc_id LIMIT 8),
       |tgtc AS (SELECT doc_id AS cid, vv AS cv FROM tgtv ORDER BY doc_id LIMIT 8),
       |tcell AS (SELECT doc_id, cid AS cell FROM (
       |    SELECT t.doc_id, c.cid, row_number() OVER (PARTITION BY t.doc_id
       |      ORDER BY ${l2("t.vv", "c.cv")} ASC, c.cid ASC) AS rn
       |    FROM tgtv t CROSS JOIN tgtc c) x WHERE rn = 1),
       |scell AS (SELECT doc_id, cid AS cell FROM (
       |    SELECT t.doc_id, c.cid, row_number() OVER (PARTITION BY t.doc_id
       |      ORDER BY ${l2("t.vv", "c.cv")} ASC, c.cid ASC) AS rn
       |    FROM srcv t CROSS JOIN srcc c) x WHERE rn = 1),
       |fprobe AS (SELECT qid, cid AS cell FROM (
       |    SELECT q.doc_id AS qid, c.cid, row_number() OVER (PARTITION BY q.doc_id
       |      ORDER BY ${l2("q.vv", "c.cv")} ASC, c.cid ASC) AS rn
       |    FROM srcv q CROSS JOIN tgtc c) x WHERE rn <= 6),
       |bprobe AS (SELECT qid, cid AS cell FROM (
       |    SELECT q.doc_id AS qid, c.cid, row_number() OVER (PARTITION BY q.doc_id
       |      ORDER BY ${l2("q.vv", "c.cv")} ASC, c.cid ASC) AS rn
       |    FROM tgtv q CROSS JOIN srcc c) x WHERE rn <= 6)""".stripMargin
  }

  /** Replay of the DERIVED bitext IVF operating point
    * ([[graft.operators.Similarity.marginBitextMineIvfAuto]]): ⌈√N⌉
    * lowest-id centroids per side, full per-query centroid-rank lists,
    * and the nprobe CALIBRATION — the sampled queries' exact top-4
    * (reused from the exact kNN CTEs `fwd`/`bwd`), each true
    * neighbor's cell rank, and the integer `cum·100 ≥ tot·95` cut —
    * ending in probe lists `fprobea`/`bprobea(qid, cell)` and cell
    * assignments `scella`/`tcella`.
    */
  private def bitextIvfAutoCtes: String = {
    def l2(a: String, b: String): String =
      s"sqrt(list_sum(list_transform(range(1, 33), i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))))"
    def centT(name: String, side: String, ncs: String): String =
      s"""$name AS (SELECT doc_id AS cid, vv AS cv FROM (
         |    SELECT doc_id, vv, row_number() OVER (ORDER BY doc_id) AS rn
         |    FROM $side) x WHERE rn <= (SELECT nc FROM $ncs))""".stripMargin
    def cellT(name: String, side: String, cents: String): String =
      s"""$name AS (SELECT doc_id, cid AS cell FROM (
         |    SELECT t.doc_id, c.cid, row_number() OVER (PARTITION BY t.doc_id
         |      ORDER BY ${l2("t.vv", "c.cv")} ASC, c.cid ASC) AS rn
         |    FROM $side t CROSS JOIN $cents c) x WHERE rn = 1)""".stripMargin
    def rankT(name: String, qside: String, cents: String): String =
      s"""$name AS (SELECT q.doc_id AS qid, c.cid AS cell,
         |    row_number() OVER (PARTITION BY q.doc_id
         |      ORDER BY ${l2("q.vv", "c.cv")} ASC, c.cid ASC) AS rn
         |  FROM $qside q CROSS JOIN $cents c)""".stripMargin
    def calT(p: String, smp: String, qside: String, knn: String,
        qIdCol: String, nIdCol: String, cellT: String, rankT: String): String =
      s"""$smp AS (SELECT doc_id FROM (
         |    SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rn
         |    FROM $qside) x WHERE rn <= 64),
         |${p}hit AS (SELECT $qIdCol AS qid, $nIdCol AS nid FROM $knn
         |  WHERE rk <= 4 AND $qIdCol IN (SELECT doc_id FROM $smp)),
         |${p}hr AS (SELECT r.rn FROM ${p}hit h
         |  JOIN $cellT tc ON tc.doc_id = h.nid
         |  JOIN $rankT r ON r.qid = h.qid AND r.cell = tc.cell),
         |${p}cov AS (SELECT rn, CAST(count(*) AS BIGINT) AS c FROM ${p}hr GROUP BY rn),
         |${p}cum AS (SELECT rn, sum(c) OVER (ORDER BY rn) AS cum,
         |    sum(c) OVER () AS tot FROM ${p}cov),
         |np$p AS (SELECT COALESCE(
         |    (SELECT min(rn) FROM ${p}cum WHERE cum * 100 >= tot * 95), 1) AS np)""".stripMargin
    s"""ncs AS (SELECT CAST(ceil(sqrt(CAST((SELECT count(*) FROM srcv) AS DOUBLE))) AS BIGINT) AS nc),
       |nct AS (SELECT CAST(ceil(sqrt(CAST((SELECT count(*) FROM tgtv) AS DOUBLE))) AS BIGINT) AS nc),
       |${centT("srcca", "srcv", "ncs")},
       |${centT("tgtca", "tgtv", "nct")},
       |${cellT("scella", "srcv", "srcca")},
       |${cellT("tcella", "tgtv", "tgtca")},
       |${rankT("fprank", "srcv", "tgtca")},
       |${rankT("bprank", "tgtv", "srcca")},
       |${calT("f", "ssmp", "srcv", "fwd", "src_id", "tgt_id", "tcella", "fprank")},
       |${calT("b", "tsmp", "tgtv", "bwd", "tgt_id", "src_id", "scella", "bprank")},
       |fprobea AS (SELECT qid, cell FROM fprank WHERE rn <= (SELECT np FROM npf)),
       |bprobea AS (SELECT qid, cell FROM bprank WHERE rn <= (SELECT np FROM npb))""".stripMargin
  }

  private def hashedVecCtes: String =
    s"""WITH t AS (SELECT doc_id, $toksLower AS lt FROM documents),
       |tok AS (SELECT doc_id, unnest(lt) AS w FROM t),
       |h AS (SELECT doc_id,
       |    ('0x' || substr(md5(w), 1, 15))::BIGINT % 32 AS j,
       |    (('0x' || substr(md5(w), 16, 14))::BIGINT % 2) * 2 - 1 AS s
       |  FROM tok),
       |cells AS (SELECT doc_id, j, count(*) AS c, sum(s) AS v
       |  FROM h GROUP BY 1, 2),
       |grid AS (SELECT d.doc_id, r.range AS j
       |  FROM (SELECT DISTINCT doc_id FROM cells) d CROSS JOIN range(0, 32) r),
       |dense AS (SELECT g.doc_id, g.j, coalesce(cells.v, 0) AS v
       |  FROM grid g LEFT JOIN cells ON cells.doc_id = g.doc_id AND cells.j = g.j),
       |vecs AS (SELECT doc_id, list(CAST(v AS BIGINT) ORDER BY j) AS vec
       |  FROM dense GROUP BY 1),""".stripMargin
}
