package graft

import graft.functions.Md5Hash
import graft.operators.QualityFilters
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualityFiltersSpec extends AnyFunSuite with SharedSpark {

  test("c4LineClean: every line and page rule fires") {
    import spark.implicits._
    val docs = Seq(
      // clean page: one good line, one unterminated, one too-short
      (1L, "this page has a fine first sentence.\nno terminal punctuation here at all\nok fine."),
      // boilerplate line dropped, rest kept
      (2L, "a good long sentence stays right here.\nplease enable javascript to continue."),
      // lorem ipsum kills the page even though its lines pass line rules
      (3L, "a good long sentence stays right here.\nlorem ipsum dolor sit amet."),
      // code brace kills the page
      (4L, "a good long sentence stays right here.\nif (x) { return y; }"),
      // nothing survives the line rules -> keep_page false, clean_text ''
      (5L, "too short.\nno punct at the end of this one")
    ).toDF("id", "text")
    val got = QualityFilters.c4LineClean(docs, "id", "text")
      .orderBy("id").collect()
    assert(got(0).getLong(1) == 3 && got(0).getLong(2) == 1 && got(0).getBoolean(3))
    assert(got(0).getString(4) == "this page has a fine first sentence.")
    assert(got(1).getLong(2) == 1 && got(1).getBoolean(3))
    assert(got(1).getString(4) == "a good long sentence stays right here.")
    assert(!got(2).getBoolean(3) && got(2).isNullAt(4)) // lorem ipsum page
    assert(!got(3).getBoolean(3) && got(3).isNullAt(4)) // brace page
    assert(got(4).getLong(2) == 0 && !got(4).getBoolean(3) && got(4).getString(4) == "")
  }

  /** Independent plain-Scala replay of the hashed-feature arithmetic. */
  private def bucket(tok: String, buckets: Int): Long = {
    val h = Md5Hash.h1(tok)
    ((h % buckets) + buckets) % buckets
  }

  test("hashedLinearQuality: score replays the weight formula") {
    import spark.implicits._
    val text = "alpha beta beta gamma"
    val docs = Seq((7L, text)).toDF("id", "text")
    val got = QualityFilters.hashedLinearQuality(docs, "id", "text", buckets = 512)
      .collect()(0)
    val counts = text.split(" ").groupBy(t => bucket(t, 512)).view.mapValues(_.length)
    val sumMilli = counts.map { case (b, c) =>
      c * (Md5Hash.h1("w" + b) % 2001 - 1000)
    }.sum
    val n = 4.0
    val score = -0.1 + (sumMilli.toDouble / 1000.0) / n
    val expect = BigDecimal(score).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getLong(1) == 4)
    assert(got.getDouble(2) == expect)
    assert(got.getBoolean(4) == (expect >= 0))
  }

  test("mmrRerank: diversification demotes the near-duplicate") {
    import spark.implicits._
    import graft.operators.Similarity
    // query 100 at e1; candidates: 1 and 2 nearly identical high-rel,
    // 3 diverse mid-rel. Pure relevance ranks (1, 2, 3); diversity-
    // heavy MMR (λ=0.3) must pick the diverse 3 at rank 2 because 2
    // duplicates the chosen 1.
    val q = Seq((100L, Seq(1.0, 0.0, 0.0))).toDF("id", "v")
    val c = Seq(
      (1L, Seq(1.0, 0.05, 0.0)),
      (2L, Seq(1.0, 0.06, 0.0)),
      (3L, Seq(0.5, 0.0, 0.8))).toDF("id", "v")
    val got = Similarity.mmrRerank(q, c, "id", "v", "id", "v",
      k = 3, poolSize = 3, lambda = 0.3)
      .orderBy("rank").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(1L, 3L, 2L))
    // rank-1 score is λ·rel; later scores subtract the redundancy term
    assert(got(0).getDouble(3) == BigDecimal(0.3 * got(0).getDouble(2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got(2).getDouble(3) < 0.3 * got(2).getDouble(2))
  }

  test("int8Quantize: codes, scale, and reconstruction error by hand") {
    import spark.implicits._
    import graft.operators.Similarity
    val df = Seq(
      (1L, Seq(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f))).toDF("id", "emb")
    val got = Similarity.int8Quantize(df, "id", "emb").orderBy("id").collect()
    // vmax=1.0 → codes (127, -64, 32, 0): -63.5 rounds HALF_UP to -64
    val codes = Seq(127L, -64L, 32L, 0L)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(codes.mkString("-").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got(0).getString(3) == md)
    val scale = 1.0 / 127.0
    val err = math.sqrt(Seq(1.0, -0.5, 0.25, 0.0).zip(codes)
      .map { case (x, q) => val d = x - q * 1.0 / 127.0; d * d }.sum)
    assert(got(0).getDouble(2) == BigDecimal(scale).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(math.abs(got(0).getDouble(4) - err) < 2e-6)
    // zero vector: scale 0, zero codes, zero error
    assert(got(1).getDouble(2) == 0.0 && got(1).getDouble(4) == 0.0)
    val zeroMd = java.security.MessageDigest.getInstance("MD5")
      .digest("0-0-0-0".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(1).getString(3) == zeroMd)
  }

  test("partitioning invariance: checksum, ewma, and hashed embedding") {
    import spark.implicits._
    import java.sql.Timestamp
    // the determinism claims, tested literally: same values no matter
    // how the input is partitioned
    val docs = (0L until 40L).map(i => (i, s"tok${i % 7} alpha tok${i % 5} beta x$i"))
      .toDF("id", "text")
    val ck1 = graft.core.TableStore.contentChecksum(docs, Seq("id", "text")).collect()(0)
    val ck2 = graft.core.TableStore
      .contentChecksum(docs.repartition(17), Seq("id", "text")).collect()(0)
    assert(ck1 == ck2)

    val emb = (df: org.apache.spark.sql.DataFrame) =>
      graft.operators.Similarity.hashedDocEmbedding(df, "id", "text", dim = 16)
        .orderBy("id").collect().map(r => (r.getLong(0), r.getSeq[Long](2))).toSeq
    assert(emb(docs) == emb(docs.repartition(13)))

    val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
    val ev = (0L until 60L).map(i =>
      (i % 5, new Timestamp(t0.getTime + i * 1000), i, (i % 11).toDouble * 1.7))
      .toDF("user_id", "ts", "event_id", "value")
    val fold = (df: org.apache.spark.sql.DataFrame) =>
      graft.operators.Resample.ewma(df, "user_id", "ts", "event_id", "value", 0.3)
        .orderBy("user_id", "event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq
    assert(fold(ev) == fold(ev.repartition(19)))
  }

  test("ewma: hand-computed fold, order set by (ts, tie)") {
    import spark.implicits._
    import java.sql.Timestamp
    val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(s: Int) = new Timestamp(t0.getTime + s * 1000L)
    // second and third rows share a timestamp — event_id breaks the tie
    val df = Seq(
      (1L, ts(0), 10L, 10.0),
      (1L, ts(1), 12L, 4.0),
      (1L, ts(1), 11L, 1.0),
      (2L, ts(0), 20L, 7.0)).toDF("user_id", "ts", "event_id", "value")
    val got = graft.operators.Resample
      .ewma(df, "user_id", "ts", "event_id", "value", alpha = 0.5)
      .orderBy("user_id", "event_id").collect()
    // user 1 order: id10 (10.0), id11 (1.0), id12 (4.0)
    val e1 = 10.0
    val e2 = 0.5 * 1.0 + 0.5 * e1 // 5.5
    val e3 = 0.5 * 4.0 + 0.5 * e2 // 4.75
    assert(got.map(_.getLong(1)).toSeq == Seq(10L, 11L, 12L, 20L))
    assert(got(0).getDouble(3) == e1 && got(1).getDouble(3) == e2)
    assert(got(2).getDouble(3) == e3)
    assert(got(3).getDouble(3) == 7.0) // each key folds independently
  }

  test("hashedDocEmbedding: components replay the hash-and-sign formula") {
    import spark.implicits._
    import graft.operators.Similarity
    val text = "alpha beta beta gamma"
    val docs = Seq((5L, text)).toDF("id", "text")
    val got = Similarity.hashedDocEmbedding(docs, "id", "text", dim = 16)
      .collect()(0)
    val expect = Array.fill(16)(0L)
    text.split(" ").foreach { t =>
      val (h1, h2) = Md5Hash.h1h2(t)
      expect((h1 % 16).toInt) += (h2 % 2) * 2 - 1
    }
    assert(got.getLong(1) == 4)
    assert(got.getSeq[Long](2).toArray.toSeq == expect.toSeq)
    // unit copy: norm 1 unless the vector is all-zero
    val unit = got.getSeq[Double](3)
    val n2 = unit.map(x => x * x).sum
    assert(math.abs(n2 - 1.0) < 1e-9)
  }

  test("tokenDriftReport: dominant source near zero, disjoint source drifts") {
    import spark.implicits._
    // source A carries ~90% of the corpus → its distribution IS the
    // corpus (KL ≈ 0); source B has a disjoint vocabulary → large KL
    val docs = (1 to 9).map(i => (i.toLong, "A", "aa bb cc dd aa bb cc dd")) :+
      (10L, "B", "zz yy xx ww zz yy xx ww")
    val got = QualityFilters.tokenDriftReport(docs.toDF("id", "src", "text"),
        "text", groupCol = col("src"), buckets = 64)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got("A") < got("B"))
    assert(got("A") < 0.1 && got("B") > 0.5)
    assert(got.size == 2)
  }

  test("dsirWeights: target-slice docs score above disjoint-vocab docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "aa bb cc aa bb cc aa bb"),
      (2L, "en", "aa bb cc dd aa bb cc dd"),
      (3L, "xx", "zz yy ww vv zz yy ww vv"),
      (4L, "xx", "aa bb cc aa bb cc aa bb") // raw doc wearing target vocab
    ).toDF("id", "lang", "text")
    val got = QualityFilters.dsirWeights(docs, "id", "text",
        isTarget = col("lang") === "en", buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // target-vocab docs (1, 2, and the imitator 4) must outscore the
    // disjoint-vocab doc 3, and 4 scores exactly like 1 (same text)
    assert(got(1L) > got(3L) && got(2L) > got(3L) && got(4L) > got(3L))
    assert(got(4L) == got(1L))
    // every doc appears, token counts flow through
    assert(got.size == 4)
  }

  test("marginBitextMine demotes hubs that a raw cosine cutoff would over-mine") {
    import spark.implicits._
    import graft.operators.Similarity
    // Source s1 aims at target t10; s2/s3/s4 aim at t20/t30/t40.
    // Target t99 is a HUB: fairly close to EVERY source (a centroid-ish
    // vector), so raw cosine ranks it competitively everywhere — but
    // because all of its neighborhood is equally close, its margin
    // hovers near 1 while true pairs clear it comfortably.
    def v(xs: Double*): Seq[Double] = xs
    val src = Seq(
      (1L, v(10, 0, 0, 1)), (2L, v(0, 10, 0, 1)),
      (3L, v(0, 0, 10, 1)), (4L, v(7, 7, 0, 1))).toDF("doc_id", "v")
    val tgt = Seq(
      (10L, v(9.5, 0.5, 0, 1)), (20L, v(0.5, 9.5, 0, 1)),
      (30L, v(0.5, 0, 9.5, 1)), (40L, v(6.5, 6.5, 0.5, 1)),
      (99L, v(4, 4, 4, 1))).toDF("doc_id", "v") // the hub
    val mined = Similarity.marginBitextMine(src, tgt,
        "doc_id", "v", "doc_id", "v", k = 3, minMargin = 1.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    // every mined source picked its TRUE counterpart, never the hub
    assert(mined(1L)._1 == 10L && mined(2L)._1 == 20L && mined(3L)._1 == 30L)
    assert(mined.get(4L).forall(_._1 == 40L))
    assert(mined.values.forall(_._1 != 99L), s"hub mined: $mined")
    // margins of true pairs clear the neighborhood-average bar
    assert(mined.values.forall(_._2 >= 1.0))
    // determinism across partitioning
    val again = Similarity.marginBitextMine(src.repartition(7), tgt.repartition(3),
        "doc_id", "v", "doc_id", "v", k = 3, minMargin = 1.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(again == mined)
  }

  test("marginBitextMine drops non-positive neighborhoods instead of faking margins") {
    import spark.implicits._
    import graft.operators.Similarity
    // anti-correlated blocks: every cross cosine is negative, so the
    // neighborhood sums are negative — a naive ratio would turn "worst
    // match among awful matches" into margin > 1
    val src = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0))).toDF("doc_id", "v")
    val tgt = Seq((10L, Seq(-1.0, -0.1)), (20L, Seq(-0.1, -1.0))).toDF("doc_id", "v")
    val mined = Similarity.marginBitextMine(src, tgt,
      "doc_id", "v", "doc_id", "v", k = 2, minMargin = 1.0)
    assert(mined.count() == 0)
  }

  test("marginBitextMineAuto dispatch: each branch equals its direct kernel") {
    import spark.implicits._
    import graft.operators.Similarity
    // The dispatcher is the shipped entry point; this forces BOTH
    // branch selections and proves each returns exactly what a direct
    // call to the dispatched kernel returns (r12 verdict: a wrong-way
    // threshold — e.g. off by a row-width factor — was invisible).
    def v(xs: Double*): Seq[Double] = xs
    val src = Seq(
      (1L, v(10, 0, 0, 1)), (2L, v(0, 10, 0, 1)),
      (3L, v(0, 0, 10, 1)), (4L, v(7, 7, 0, 1))).toDF("doc_id", "v")
    val tgt = Seq(
      (10L, v(9.5, 0.5, 0, 1)), (20L, v(0.5, 9.5, 0, 1)),
      (30L, v(0.5, 0, 9.5, 1)), (40L, v(6.5, 6.5, 0.5, 1)),
      (99L, v(4, 4, 4, 1))).toDF("doc_id", "v")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3))).sortBy(_._1).toSeq

    val exact = rows(Similarity.marginBitextMine(src, tgt,
      "doc_id", "v", "doc_id", "v", k = 3, minMargin = 1.0))
    // both sides within the limit (tgt has 5 rows; <= is inclusive):
    // must take the exact broadcast branch
    val autoExact = rows(Similarity.marginBitextMineAuto(src, tgt,
      "doc_id", "v", "doc_id", "v", k = 3, minMargin = 1.0,
      broadcastRowLimit = 5L))
    assert(autoExact == exact, "boundary-inclusive exact branch diverged")

    // a side over the limit: must take the IVF branch with internally
    // trained per-side quantizers — equal to the direct IVF call with
    // the same deterministic kmeansTrain models
    val autoIvf = rows(Similarity.marginBitextMineAuto(src, tgt,
      "doc_id", "v", "doc_id", "v", k = 3, minMargin = 1.0,
      broadcastRowLimit = 4L, nCells = 2, nprobe = 2, kmeansIters = 2))
    val srcCent = Similarity.kmeansTrain(src, "doc_id", "v", 2, 2)
    val tgtCent = Similarity.kmeansTrain(tgt, "doc_id", "v", 2, 2)
    val directIvf = rows(Similarity.marginBitextMineIvf(src, tgt,
      "doc_id", "v", "doc_id", "v", k = 3, minMargin = 1.0,
      srcCent, tgtCent, "cent_id", "centroid", nprobe = 2))
    assert(autoIvf == directIvf, "IVF branch diverged from the direct kernel")
    // the quadratic-cost bound also forces IVF even when both sides fit
    // the broadcast budget (4×5 = 20 pairs > maxExactProduct = 10)
    val autoIvfByProduct = rows(Similarity.marginBitextMineAuto(src, tgt,
      "doc_id", "v", "doc_id", "v", k = 3, minMargin = 1.0,
      broadcastRowLimit = 100L, nCells = 2, nprobe = 2, kmeansIters = 2,
      maxExactProduct = 10L))
    assert(autoIvfByProduct == directIvf,
      "product-bound dispatch diverged from the direct IVF kernel")
    // with nprobe = nCells the IVF kNN is exhaustive, so the dispatch
    // difference cannot hide behind recall loss: both branches mine the
    // same pairs on this fixture
    assert(autoIvf == exact,
      "exhaustive-probe IVF should equal the exact kernel here")
  }

  test("ivfCalibrateNprobe: measured width reflects how well cells localize neighbors") {
    import spark.implicits._
    import graft.operators.Similarity
    def at(deg: Double): Seq[Double] = {
      val r = math.toRadians(deg); Seq(math.cos(r), math.sin(r))
    }
    // a tight arc of true neighbors around the query at 5°, plus far
    // noise at 90°; the query's top-4 by cosine are the 2°–8° points
    val corpus = (Seq(0.0, 2.0, 4.0, 6.0, 8.0, 10.0).zipWithIndex.map {
        case (deg, i) => (i.toLong, at(deg)) } ++
      (0 until 4).map(i => ((50 + i).toLong, at(90.0 + i))))
      .toDF("vec_id", "v")
    val queries = Seq((100L, at(5.0))).toDF("vec_id", "v")
    // aligned quantizer: one cell owns the whole arc — one probe covers
    // every true neighbor
    val goodCents = Seq((0L, at(5.0)), (1L, at(90.0)))
      .toDF("cent_id", "centroid")
    val np = Similarity.ivfCalibrateNprobe(queries, corpus,
      "vec_id", "v", "vec_id", "v", goodCents, "cent_id", "centroid",
      k = 4, targetRecallPct = 100, sampleSize = 64)
    assert(np == 1, s"aligned quantizer should need one probe, got $np")
    // neighborhood-splitting quantizer: the arc is cut between a 0° and
    // a 10° cell, so the query's true top-4 straddle two cells — the
    // measured width must grow instead of silently losing recall
    val splitCents = Seq((0L, at(0.0)), (1L, at(10.0)), (2L, at(90.0)))
      .toDF("cent_id", "centroid")
    val npSplit = Similarity.ivfCalibrateNprobe(queries, corpus,
      "vec_id", "v", "vec_id", "v", splitCents, "cent_id", "centroid",
      k = 4, targetRecallPct = 100, sampleSize = 64)
    assert(npSplit == 2, s"split quantizer must demand two probes, got $npSplit")
    // at a laxer target the same measurement admits the cheaper width
    val npLax = Similarity.ivfCalibrateNprobe(queries, corpus,
      "vec_id", "v", "vec_id", "v", splitCents, "cent_id", "centroid",
      k = 4, targetRecallPct = 50, sampleSize = 64)
    assert(npLax == 1, s"50% target should accept one probe, got $npLax")
  }

  test("marginBitextMineIvfAuto: full-sample pct-100 calibration equals the exact kernel") {
    import spark.implicits._
    import graft.operators.Similarity
    // deterministic pseudo-random sides (hash-derived components);
    // sampleSize covers every query and pct=100 covers every true
    // neighbor's cell, so the probed candidate set contains the exact
    // top-k for all queries and the whole mined set must coincide
    def vecOf(seed: Long): Seq[Double] =
      (0 until 6).map(j => ((seed * 31 + j * 17) % 19).toDouble - 9.0)
    val src = (1L to 40L).map(i => (i, vecOf(i))).toDF("doc_id", "v")
    val tgt = (101L to 140L).map(i => (i, vecOf(i * 7))).toDF("doc_id", "v")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3))).sortBy(_._1).toSeq
    val exact = rows(Similarity.marginBitextMine(src, tgt,
      "doc_id", "v", "doc_id", "v", k = 4, minMargin = 0.9))
    val auto = rows(Similarity.marginBitextMineIvfAuto(src, tgt,
      "doc_id", "v", "doc_id", "v", k = 4, minMargin = 0.9,
      targetRecallPct = 100, sampleSize = 64))
    assert(auto == exact,
      "pct-100 full-sample calibration must reproduce the exact mined set")
  }
}
