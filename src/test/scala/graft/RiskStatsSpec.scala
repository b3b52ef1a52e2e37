package graft

import java.sql.Date

import graft.analytics.RiskStats
import graft.operators.{Dedup, Resample, TopKSketch}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RiskStatsSpec extends AnyFunSuite with SharedSpark {

  private def d(s: String): Date = Date.valueOf(s)

  test("maxDrawdown: running peak, deepest trough, deterministic tie pick") {
    import spark.implicits._
    // key 1: 100 -> 120 -> 60 (dd -0.5) -> 90; key 2: monotone up (dd 0)
    val nav = Seq(
      (1L, d("2024-01-01"), 1L, 100.0), (1L, d("2024-01-02"), 2L, 120.0),
      (1L, d("2024-01-03"), 3L, 60.0), (1L, d("2024-01-04"), 4L, 90.0),
      (2L, d("2024-01-01"), 5L, 10.0), (2L, d("2024-01-02"), 6L, 20.0)
    ).toDF("k", "ts", "id", "px")
    val got = RiskStats.maxDrawdown(nav, col("k"), col("ts"), col("id"), col("px"))
      .orderBy("series_key").collect()
    assert(got.length == 2)
    assert(got(0).getLong(1) == 4 && got(0).getDouble(2) == 60.0 / 120.0 - 1.0)
    assert(got(0).getDate(3) == d("2024-01-03"))
    // flat/up series: drawdown 0, trough = FIRST date (earliest tie wins)
    assert(got(1).getDouble(2) == 0.0 && got(1).getDate(3) == d("2024-01-01"))
  }

  test("rollingBeta: y = 2x + const recovers beta 2 exactly in micro units") {
    import spark.implicits._
    // market micro-returns: a varying series; asset = 2*x (micro longs)
    val xs = Seq(1000L, -2000L, 3000L, 500L, -1500L, 2500L, -800L, 1200L, 900L, -400L)
    val rows = xs.zipWithIndex.map { case (x, i) =>
      (7L, d(f"2024-02-${i + 1}%02d"), i.toLong, 2 * x + 50L, x)
    }
    val df = rows.toDF("k", "ts", "id", "y", "x")
    val got = RiskStats.rollingBeta(df, col("k"), col("ts"), col("id"),
        col("y"), col("x"), n = 8)
      .orderBy("id").select("beta").as[Double].collect()
    assert(got.length == 3) // rows 8, 9, 10
    got.foreach(b => assert(b == 2.0, s"beta=$b"))
  }

  test("rollingBeta: constant market gives null beta (zero variance)") {
    import spark.implicits._
    val rows = (1 to 9).map(i => (1L, d(f"2024-03-$i%02d"), i.toLong, i * 10L, 100L))
    val got = RiskStats.rollingBeta(rows.toDF("k", "ts", "id", "y", "x"),
        col("k"), col("ts"), col("id"), col("y"), col("x"), n = 8)
      .select("beta").collect()
    assert(got.length == 2 && got.forall(_.isNullAt(0)))
  }

  test("toMicro: clamps to [-0.99, 9.99] and half-up rounds") {
    import spark.implicits._
    val got = Seq(-5.0, -0.99, 0.0000005, 0.1234564, 12.0)
      .toDF("r").select(RiskStats.toMicro(col("r"))).as[Long].collect()
    assert(got.sameElements(Array(-990000L, -990000L, 1L, 123456L, 9990000L)))
  }

  test("spearmanIC: perfect monotone +1, perfect inverse -1, independence near 0") {
    import spark.implicits._
    val n = 7
    val mono = (1 to n).map(i => ("m1", i.toLong, i.toDouble, i * 2.0))
    val inv = (1 to n).map(i => ("m2", i.toLong, i.toDouble, -i * 2.0))
    val got = RiskStats.spearmanIC((mono ++ inv).toDF("b", "id", "f", "o"),
        col("b"), col("id"), col("f"), col("o"))
      .orderBy("bucket").collect()
    assert(got(0).getDouble(2) == 1.0)
    assert(got(1).getDouble(2) == -1.0)
    // buckets below minN are dropped
    val small = Seq(("m3", 1L, 1.0, 1.0), ("m3", 2L, 2.0, 2.0)).toDF("b", "id", "f", "o")
    assert(RiskStats.spearmanIC(small, col("b"), col("id"), col("f"), col("o")).count() == 0)
  }

  test("vwapBars: hand-computed exact sums") {
    import spark.implicits._
    val ticks = Seq(
      (d("2024-01-01"), "A", 10.0, 2.0), (d("2024-01-01"), "A", 20.0, 3.0),
      (d("2024-01-01"), "B", 5.0, 4.0)
    ).toDF("bk", "g", "px", "vol")
    val got = Resample.vwapBars(ticks, col("bk"), Seq(col("g")), col("px"), col("vol"))
      .orderBy("g").collect()
    assert(got(0).getDouble(2) == 5.0 && got(0).getDouble(3) == 80.0)
    assert(got(0).getDouble(5) == 16.0) // (20+60)/5
    assert(got(1).getDouble(5) == 5.0 && got(1).getLong(4) == 1L)
  }

  test("crossDocSpans: shared passage found, within-doc repeat ignored, spans merge") {
    import spark.implicits._
    val passage = (1 to 12).map(i => s"p$i").mkString(" ") // 12 shared tokens
    val docs = Seq(
      (1L, s"alpha beta $passage gamma delta epsilon zeta eta theta"),
      (2L, s"one two three $passage four five six seven eight"),
      // doc 3 repeats ITS OWN 8-gram twice but shares nothing: no output
      (3L, "q1 q2 q3 q4 q5 q6 q7 q8 xx q1 q2 q3 q4 q5 q6 q7 q8")
    ).toDF("doc_id", "text")
    val got = Dedup.crossDocSpans(docs, "doc_id", "text", n = 8, minDf = 2)
      .orderBy("doc_id", "span_start").collect()
    assert(got.length == 2, got.mkString("; "))
    // doc 1: passage tokens are positions 3..14 -> grams 3..7, span 3..14
    assert(got(0).getLong(0) == 1L && got(0).getLong(1) == 3L && got(0).getLong(2) == 14L
      && got(0).getLong(3) == 5L)
    // doc 2: passage at positions 4..15 -> grams 4..8
    assert(got(1).getLong(0) == 2L && got(1).getLong(1) == 4L && got(1).getLong(2) == 15L)
  }

  test("crossDocSpans: two nearby shared passages merge into one island iff gap <= n") {
    import spark.implicits._
    val p1 = (1 to 8).map(i => s"a$i").mkString(" ")
    val p2 = (1 to 8).map(i => s"b$i").mkString(" ")
    // doc 1/2 share p1 at pos 1 and p2 at pos 10 (gap of one filler token
    // between them): hit positions 1 and 10, 10 > 1 + 8 -> two islands.
    val docs = Seq(
      (1L, s"$p1 f1 $p2 tail1 tail2 tail3"),
      (2L, s"$p1 g1 $p2 tailx taily tailz")
    ).toDF("doc_id", "text")
    val got = Dedup.crossDocSpans(docs, "doc_id", "text", n = 8, minDf = 2)
      .filter(col("doc_id") === 1L).orderBy("span_start").collect()
    assert(got.length == 2)
    assert(got(0).getLong(1) == 1L && got(0).getLong(2) == 8L)
    assert(got(1).getLong(1) == 10L && got(1).getLong(2) == 17L)
  }

  test("scrubCrossDocSpans: every occurrence cut, untouched docs intact, order kept") {
    import spark.implicits._
    val passage = (1 to 9).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 $passage z1 z2"),
      (2L, s"b1 $passage y1 y2 y3 y4 y5"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10")
    ).toDF("doc_id", "text")
    val got = Dedup.scrubCrossDocSpans(docs, "doc_id", "text", n = 8, minDf = 2)
      .orderBy("doc_id").collect()
    // doc 1: 13 tokens, passage at 3..11 removed (9 tokens)
    assert(got(0).getLong(1) == 13 && got(0).getLong(2) == 9)
    assert(got(0).getString(3) == "a1 a2 z1 z2")
    // doc 2: passage at 2..10 removed — BOTH copies go (Lee et al. policy)
    assert(got(1).getString(3) == "b1 y1 y2 y3 y4 y5")
    // doc 3: no shared grams — untouched
    assert(got(2).getLong(2) == 0 && got(2).getString(3) == docs.collect()(2).getString(1))
  }

  test("topK sketch: exact regime reproduces exact counts at any partitioning") {
    import spark.implicits._
    val toks = Seq.tabulate(600) { i =>
      ("g" + (i % 2), "tok" + (i % (7 + (i % 2)))) // two groups, small vocabs
    }
    val df = toks.toDF("g", "t").repartition(7) // scatter across partitions
    val got = TopKSketch.topK(df, "g", col("t"), capacity = 64, k = 5)
      .orderBy("g", "rank").collect()
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((g, t), c) => (g, t, c) }
      .groupBy(_._1).flatMap { case (_, xs) =>
        xs.sortBy { case (_, t, c) => (-c, t) }.take(5).zipWithIndex
          .map { case ((g, t, c), i) => (g, t, c, (i + 1).toLong) }
      }.toSet
    assert(got.map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet == exact)
  }

  test("asofBackwardWithin: stale matches null out, fresh and equal-time survive") {
    import spark.implicits._
    import java.sql.Timestamp.{valueOf => ts}
    val left = Seq(
      (1L, 10L, ts("2024-01-05 00:00:00")), // match 4 days old -> stale
      (2L, 10L, ts("2024-01-01 12:00:00")), // match 12h old -> fresh
      (3L, 10L, ts("2024-01-01 00:00:00")), // equal time -> fresh
      (4L, 99L, ts("2024-01-05 00:00:00"))  // no right row at all
    ).toDF("id", "k", "t")
    val right = Seq((10L, ts("2024-01-01 00:00:00"), 7.5))
      .toDF("k", "rt", "v")
    val got = graft.operators.AsOfJoin.asofBackwardWithin(left, right, Seq("k"),
        "t", "rt", Seq("v"), expr("INTERVAL 24 HOURS"))
      .orderBy("id").select("v").collect()
    assert(got(0).isNullAt(0) && !got(1).isNullAt(0) && !got(2).isNullAt(0)
      && got(3).isNullAt(0))
    assert(got(1).getDouble(0) == 7.5 && got(2).getDouble(0) == 7.5)
  }

  test("mergePartials: additive in the exact regime, MG-trims past capacity") {
    import spark.implicits._
    // exact regime: two batch partials sum
    val parts = Seq(("g", "a", 3L), ("g", "b", 1L), ("g", "a", 2L)).toDF("g", "t", "c")
    val merged = TopKSketch.mergePartials(parts, col("g"), col("t"), col("c"), capacity = 8)
      .orderBy("token").collect()
    assert(merged.map(r => (r.getString(1), r.getLong(2))).toSeq == Seq(("a", 5L), ("b", 1L)))
    // overflow: capacity 2, third-largest count (2) subtracted from all
    val big = Seq(("g", "x", 10L), ("g", "y", 5L), ("g", "z", 2L)).toDF("g", "t", "c")
    val trimmed = TopKSketch.mergePartials(big, col("g"), col("t"), col("c"), capacity = 2)
      .orderBy("token").collect()
    assert(trimmed.map(r => (r.getString(1), r.getLong(2))).toSeq == Seq(("x", 8L), ("y", 3L)))
  }

  test("streaming fold with overwrite: trimmed tokens are DELETED from the store") {
    import spark.implicits._
    // the approx-regime scenario the PK-upsert fold got wrong: a token
    // trimmed out of the sketch must not linger and resurrect
    val dir = java.nio.file.Files.createTempDirectory("graft_topk_fold").toString
    val store = new graft.core.TableStore(spark, dir)
    val spec = graft.core.TableSpec("s", Seq("grp", "token"), partitionBy = Seq("grp"))
    def fold(batch: Seq[(String, String, Long)]): Unit = {
      val rows = batch.toDF("group", "token", "cnt")
      val unioned =
        if (store.exists(spec))
          store.read(spec).select(col("grp").as("group"), col("token"), col("cnt"))
            .unionByName(rows)
        else rows
      val folded = graft.operators.TopKSketch.mergePartials(unioned,
        col("group"), col("token"), col("cnt"), capacity = 2)
      store.overwritePartitions(spec,
        folded.select(col("group").as("grp"), col("token"), col("cnt")))
    }
    fold(Seq(("g", "x", 5L), ("g", "y", 3L), ("g", "z", 1L)))
    // trim: threshold = 3rd largest (1) -> {x:4, y:2}
    val s1 = store.read(spec).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("cnt"))).toSet
    assert(s1 == Set(("x", 4L), ("y", 2L)))
    fold(Seq(("g", "z", 5L)))
    // union {x:4, y:2, z:5}, threshold = y's 2 -> {z:3, x:2}; y must be GONE
    val s2 = store.read(spec).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("cnt"))).toSet
    assert(s2 == Set(("z", 3L), ("x", 2L)), s"trimmed token lingered: $s2")
  }

  test("topK sketch: approx regime respects the additive error bound N/capacity") {
    import spark.implicits._
    // Zipf-ish stream: token j appears ~1200/j times; capacity 8 << 40 distinct
    val stream = (1 to 40).flatMap(j => Seq.fill(1200 / j)(s"t$j"))
    val n = stream.size.toLong
    val cap = 8
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = TopKSketch.topK(stream.map(("g", _)).toDF("g", "t").repartition(4),
        "g", col("t"), capacity = cap, k = 3).collect()
    got.foreach { r =>
      val (tok, est) = (r.getString(1), r.getLong(2))
      assert(math.abs(est - truth(tok)) <= n / cap,
        s"$tok est=$est true=${truth(tok)} bound=${n / cap}")
    }
    // the undisputed heaviest token must surface at rank 1
    assert(got.minBy(_.getLong(3)).getString(1) == "t1")
  }

  test("corrMatrix: +1 / -1 poles, symmetry, zero-variance nulls") {
    import spark.implicits._
    // y = x doubled -> corr +1; z = -x -> corr -1; c constant -> null.
    val rows = (1 to 6).flatMap { i =>
      val m = (i * 1000).toLong
      Seq(("x", i, m), ("y", i, 2 * m), ("z", i, -m), ("c", i, 5000L))
    }
    val df = rows.toDF("k", "b", "m")
    val got = RiskStats.corrMatrix(df, col("k"), col("b"), col("m"))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]).map(v => math.rint(v * 1e9) / 1e9))))
      .toMap
    assert(got(("x", "y")) == ((6L, Some(1.0))))
    assert(got(("x", "z")) == ((6L, Some(-1.0))))
    assert(got(("y", "z")) == ((6L, Some(-1.0))))
    assert(got(("x", "x")) == ((6L, Some(1.0))))
    assert(got(("x", "c"))._2.isEmpty, "constant series must yield null corr")
    assert(got(("x", "y")) == got(("y", "x")), "matrix must be symmetric")

    // Past-2^53 regime: a constant series at the clamp ceiling over many
    // buckets makes double-computed variance rounding noise — the exact
    // decimal moments must still return NULL, and the varying pair +1.
    val big = (1 to 200).flatMap { i =>
      Seq(("k", i, 9990000L), ("v", i, (i * 9000L - 900000L)))
    }.toDF("k", "b", "m")
    val gotBig = RiskStats.corrMatrix(big, col("k"), col("b"), col("m"))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    assert(gotBig(("k", "v")).isEmpty && gotBig(("k", "k")).isEmpty,
      "constant-at-clamp series must yield null corr even past 2^53 sums")
    assert(gotBig(("v", "v")).exists(c => math.abs(c - 1.0) < 1e-9))
  }

  test("ScdHistory.fold: null statuses form their own runs (null-safe change detection)") {
    import spark.implicits._
    val rows = Seq(
      (1L, 1L, d("2024-01-01"), Some("O")), (1L, 2L, d("2024-02-01"), None),
      (1L, 3L, d("2024-03-01"), None), (1L, 4L, d("2024-04-01"), Some("O")))
      .toDF("k", "t", "od", "st")
    val res = graft.operators.ScdHistory.fold(rows, col("k"), col("od"),
        col("t"), col("st"))
      .orderBy("run_id").collect()
      .map(r => (r.getLong(1), Option(r.getString(2)), r.getDate(3).toString,
        r.getBoolean(5), r.getLong(6)))
      .toSeq
    assert(res == Seq(
      (1L, Some("O"), "2024-01-01", false, 1L),
      (2L, None, "2024-02-01", false, 2L),
      (3L, Some("O"), "2024-04-01", true, 1L)),
      s"null-status runs mishandled: $res")
  }
}
