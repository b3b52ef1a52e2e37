package graft

import graft.analytics.FinanceReports
import graft.core.{TableSpec, TableStore}
import graft.operators.AsOfJoin
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Property-style tests (SURVEY §5.2(3)): randomized semantics checks
  * against independent reference models, seeded for reproducibility.
  * Few cases each — every case spins Spark jobs.
  */
class PropertySpec extends AnyFunSuite with SharedSpark {
  import java.sql.Date.{valueOf => d}

  test("upsert ≡ last-wins map semantics over random batch sequences") {
    import spark.implicits._
    val rnd = new Random(42)
    (1 to 4).foreach { trial =>
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_prop_upsert_$trial"
      val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      val store = new TableStore(spark, dir)
      val spec = TableSpec("t", Seq("k"))
      val model = scala.collection.mutable.Map[Int, Double]()
      (1 to 3).foreach { _ =>
        val batch = List.fill(1 + rnd.nextInt(20))(
          (rnd.nextInt(15), math.rint(rnd.nextDouble() * 10000) / 100))
        store.upsert(spec, batch.toDF("k", "v"))
        batch.foreach { case (k, v) => model(k) = v } // last occurrence wins
      }
      val got = store.read(spec).collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      assert(got == model.toMap, s"trial $trial")
    }
  }

  test("ytdToQuarterly inverts cumulative-sum for complete series") {
    import spark.implicits._
    val rnd = new Random(7)
    (1 to 4).foreach { trial =>
      val qvals = List.fill(8)(math.rint((rnd.nextDouble() * 200 - 50) * 4) / 4)
      val rows = qvals.zipWithIndex.map { case (_, i) =>
        val year = 2020 + i / 4
        val q = i % 4 + 1
        val ytd = qvals.slice(i / 4 * 4, i + 1).sum
        ("c", d(f"$year-${q * 3}%02d-01"), Some(ytd))
      }
      val got = FinanceReports
        .ytdToQuarterly(spark, rows.toDF("code", "report_date", "ytd"))
        .orderBy("report_date").collect().map(_.getDouble(3))
      got.zip(qvals).foreach { case (g, want) =>
        assert(math.abs(g - want) < 1e-9, s"trial $trial: $g vs $want")
      }
    }
  }

  test("asofBackward ≡ naive per-row latest-state scan") {
    import spark.implicits._
    val rnd = new Random(13)
    (1 to 4).foreach { trial =>
      val lefts = List.fill(25)((rnd.nextInt(4), rnd.nextInt(100)))
      val rights = List.fill(12)((rnd.nextInt(4), rnd.nextInt(100))).distinct
      val left = lefts.zipWithIndex.map { case ((k, t), i) => (i, s"k$k", t) }
        .toDF("row_id", "key", "t")
      val right = rights.map { case (k, t) => (s"k$k", t, s"v$k@$t") }
        .toDF("key", "rt", "v")
      val got = AsOfJoin.asofBackward(left, right, Seq("key"), "t", "rt", Seq("v"))
        .collect().map(r => r.getInt(0) -> Option(r.getString(3))).toMap
      val byKey = rights.groupBy(_._1)
      lefts.zipWithIndex.foreach { case ((k, t), i) =>
        val want = byKey.getOrElse(k, Nil).filter(_._2 <= t)
          .sortBy(_._2).lastOption.map { case (kk, tt) => s"v$kk@$tt" }
        assert(got(i) == want, s"trial $trial row $i key=k$k t=$t")
      }
    }
  }

  test("connectedComponents ≡ union-find on random graphs") {
    import spark.implicits._
    val rnd = new Random(21)
    (1 to 3).foreach { trial =>
      val n = 60
      val edges = List.fill(50)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // union-find model
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(id => id -> {
          // min member of the component among ids present in edges
          val root = find(id.toInt)
          edges.flatMap(e => Seq(e._1, e._2)).distinct
            .filter(j => find(j.toInt) == root).min
        }).toMap
      // both the driver fast path and the distributed label-propagation
      // loop (forced via smallGraphEdges = 0) must agree with the model
      val gotSmall = graft.operators.Dedup
        .connectedComponents(edges.toDF("id_a", "id_b"), "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val gotDist = graft.operators.Dedup
        .connectedComponents(edges.toDF("id_a", "id_b"), "id_a", "id_b",
          smallGraphEdges = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotSmall == want, s"trial $trial (driver path)")
      assert(gotDist == want, s"trial $trial (distributed path)")
    }
  }

  test("chunkTokenWindows covers every token; overlap = window − stride") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new Random(7)
    val docs = (1L to 30L).map { id =>
      (id, Seq.fill(rnd.nextInt(40))("t" + rnd.nextInt(9)).mkString(" "))
    }.toDF("doc_id", "text")
    val (w, s) = (8, 5)
    val chunks = graft.operators.CorpusStats
      .chunkTokenWindows(docs, "doc_id", "text", w, s)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val nTokens = docs.select($"doc_id",
      size(graft.functions.TextFunctions.tokens($"text")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    nTokens.foreach { case (id, n) =>
      val cs = chunks(id).sortBy(_._2)
      // chunk i starts at i·s and holds min(w, n − i·s) tokens — so the
      // union of [i·s, i·s + len) covers [0, n) with no gaps
      cs.foreach { case (_, i, len) =>
        assert(len == math.max(0L, math.min(w.toLong, n - i * s)), s"doc $id chunk $i")
      }
      val covered = cs.map { case (_, i, len) => i * s + len }.max
      assert(covered == math.max(n, 0L) || (n == 0 && cs.length == 1), s"doc $id coverage")
    }
  }

  test("sessionization partitions events; gaps split iff over threshold") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rnd = new Random(11)
    val gapUs = 1000L
    val events = (1 to 400).map { i =>
      (rnd.nextInt(5).toLong, i.toLong, rnd.nextLong().abs % 100000L)
    }.toDF("user_id", "event_id", "us")
    // replicate w10's shape on a raw microsecond column
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val sess = events
      .withColumn("new_s", when(lag($"us", 1).over(w).isNull ||
        $"us" - lag($"us", 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("sid", sum($"new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val rows = sess.select($"user_id", $"us", $"sid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // partition property: every event in exactly one session (trivially
    // true by construction) + boundary property on the sorted stream
    rows.groupBy(_._1).foreach { case (u, es) =>
      val sorted = es.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, t1, s1), (_, t2, s2)) =>
          if (t2 - t1 > gapUs) assert(s2 == s1 + 1, s"user $u: gap must split")
          else assert(s2 == s1, s"user $u: within-gap must not split")
        case _ =>
      }
    }
    val total = rows.length
    assert(total == 400)
  }

  test("weightedSample: sample size, membership, and rank ordering") {
    import spark.implicits._
    val rnd = new Random(5)
    val docs = (1L to 200L).map(id => (id, 1L + rnd.nextInt(1000))).toDF("id", "w")
    val got = graft.operators.CorpusStats.weightedSample(docs, "id", "w", n = 25)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getInt(3)))
    assert(got.length == 25)
    assert(got.map(_._1).distinct.length == 25, "no repeats (without replacement)")
    assert(got.map(_._3).toSeq == (1 to 25), "dense ranks")
    assert(got.map(_._2).toSeq == got.map(_._2).sorted.toSeq, "ascending keys")
  }

  test("D1/D2 invariants hold on random bar panels") {
    import spark.implicits._
    import graft.analytics.ContinuousFutures
    val rnd = new Random(99)
    (1 to 3).foreach { trial =>
      val start = java.time.LocalDate.of(2020, 1, 1)
      // 3 types × 6 contracts with staggered maturities; random gaps,
      // random null volumes/closes — the shapes that break state machines.
      val rows = for {
        t <- 0 until 3
        c <- 0 until 6
        maturity = 25 * (c + 1) + rnd.nextInt(10)
        day <- 0 until 120
        if day <= maturity && rnd.nextDouble() < 0.7
      } yield (s"T$trial$t", s"T$trial${t}C$c",
        java.sql.Date.valueOf(start.plusDays(day)),
        if (rnd.nextDouble() < 0.05) None else Some(10.0 + rnd.nextInt(90)),
        if (rnd.nextDouble() < 0.10) None else Some(rnd.nextInt(1000).toDouble),
        java.sql.Date.valueOf(start.plusDays(maturity)))
      val bars = rows.toDF("instrument_type", "instrument_id", "trade_date",
        "close", "switch_by", "last_trade_date")
      val maturityOf = rows.map(r => r._2 -> r._6.toLocalDate.toEpochDay).toMap

      val sel = ContinuousFutures.dailySelection(spark, bars)
        .orderBy("instrument_type", "trade_date").collect()
        .map(r => (r.getString(0), r.getDate(1), r.getString(2),
          Option(r.getString(3))))
      // main only rolls forward in maturity; secondary never expires
      // before the main it accompanies
      sel.groupBy(_._1).foreach { case (t, rs) =>
        val mats = rs.map(r => maturityOf(r._3))
        assert(mats.zip(mats.tail).forall { case (a, b) => a <= b },
          s"trial $trial $t: main maturity decreased")
        rs.foreach { case (_, dt, main, sec) =>
          sec.foreach(sid => assert(maturityOf(sid) >= maturityOf(main),
            s"trial $trial $t $dt: secondary expires before main"))
        }
      }

      val fac = ContinuousFutures.adjFactors(spark, bars, ContinuousFutures.Division)
        .orderBy("instrument_type", "trade_date").collect()
        .map(r => (r.getString(0), r.getDate(1), r.getDouble(3)))
      // the latest factor row of each type is exactly neutral
      fac.groupBy(_._1).foreach { case (t, rs) =>
        assert(rs.last._3 == 1.0, s"trial $trial $t: latest factor not neutral")
      }
    }
  }

  test("bpeTrain ≡ naive sentinel-string replace model on random corpora") {
    // The driver-local symbol-array trainer vs an INDEPENDENT model that
    // does what the SQL oracle does: sentinel-framed strings and greedy
    // String.replace per iteration. Random 3-letter-alphabet words force
    // dense pair collisions and (count, pair) tie-breaks.
    import spark.implicits._
    val SEP = ""
    def refTrain(words: Seq[(String, Long)], numMerges: Int): Seq[(Int, String, String, Long)] = {
      def wrap(w: String): String =
        SEP + (w.split("").toSeq :+ "</w>").mkString(SEP + SEP) + SEP
      var cur = words.map { case (w, c) => (wrap(w), c) }
      val out = Seq.newBuilder[(Int, String, String, Long)]
      var stop = false
      for (i <- 1 to numMerges if !stop) {
        val pc = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
        for ((s, c) <- cur) {
          val l = s.stripPrefix(SEP).stripSuffix(SEP)
            .split(java.util.regex.Pattern.quote(SEP + SEP)).toSeq
          for (j <- 0 until l.length - 1) pc((l(j), l(j + 1))) += c
        }
        if (pc.isEmpty) stop = true
        else {
          val ((a, b), cnt) = pc.minBy { case ((x, y), c) => (-c, x, y) }
          out += ((i, a, b, cnt))
          cur = cur.map { case (s, c) =>
            (s.replace(SEP + a + SEP + SEP + b + SEP, SEP + a + b + SEP), c) }
        }
      }
      out.result()
    }
    val rnd = new Random(20260814)
    (1 to 3).foreach { trial =>
      val words = (1 to 40).map { _ =>
        (1 to (2 + rnd.nextInt(5))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }.distinct.map(w => (w, 1L + rnd.nextInt(5)))
      val text = words.flatMap { case (w, c) => Seq.fill(c.toInt)(w) }.mkString(" ")
      val got = graft.operators.LanguageModel
        .bpeTrain(Seq((trial.toLong, text)).toDF("doc_id", "text"),
          "doc_id", "text", vocabWords = 1000, numMerges = 12)
        .orderBy("merge_rank").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      assert(got.toSeq == refTrain(words, 12), s"trial $trial diverged")
    }
  }

  test("GlobalRank.withNtile ≡ single-partition window ntile") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rnd = new Random(4242)
    for (b <- Seq(3, 7, 32); trial <- 1 to 2) {
      val n = 50 + rnd.nextInt(400)
      val rows = rnd.shuffle((1 to n).toList).map(k => (k.toLong, rnd.nextInt(100)))
      val df = rows.toDF("k", "v").repartition(7) // scatter the input
      val got = graft.operators.GlobalRank
        .withNtile(df, Seq(col("k")), b, "bucket")
        .select(col("k"), col("bucket")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val exp = rows.toDF("k", "v")
        .withColumn("bucket", ntile(b).over(Window.orderBy(col("k"))).cast("long"))
        .select(col("k"), col("bucket")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == exp, s"buckets=$b n=$n trial=$trial")
    }
  }

  test("schemaAudit(x, x) is reflexively all-matched") {
    import graft.core.SchemaAudit
    import org.apache.spark.sql.types._
    val rnd = new Random(99)
    val types = Seq(LongType, IntegerType, DoubleType, StringType, DateType, BooleanType)
    (1 to 3).foreach { trial =>
      val fields = (1 to 3 + rnd.nextInt(6))
        .map(i => StructField(s"col_$i", types(rnd.nextInt(types.length))))
      val pk = fields.take(1 + rnd.nextInt(2)).map(_.name)
      val desc = SchemaAudit.TableDesc(StructType(fields), pk)
      val rows = SchemaAudit.audit(spark, desc, desc).collect()
      assert(rows.length == fields.length, s"trial $trial")
      assert(rows.forall(r => r.getString(1) == "matched" && r.getBoolean(8) &&
        r.getBoolean(4) == r.getBoolean(7)), s"trial $trial")
    }
  }

  test("crossDocSpans ≡ naive per-pair n-gram scan; partitioning-invariant") {
    import spark.implicits._
    val rnd = new Random(4242)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    val shared = Vector.fill(9)(vocab(rnd.nextInt(vocab.size)))
    // random docs, some with the shared passage spliced in
    val docs = (1L to 12L).map { id =>
      val base = Vector.fill(6 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
      val toks = if (id % 3 == 0) {
        val at = rnd.nextInt(base.size + 1)
        base.take(at) ++ shared ++ base.drop(at)
      } else base
      (id, toks.mkString(" "))
    }
    val n = 4
    // naive model: gram -> set of docs; hit positions where df >= 2;
    // islands merged with the pos > prev + n rule
    val grams = docs.flatMap { case (id, text) =>
      val t = text.split("\\s+").filter(_.nonEmpty)
      (0 to t.length - n).filter(_ >= 0).map(i => (t.slice(i, i + n).mkString(" "), id, i + 1L))
    }
    val df = grams.groupBy(_._1).view.mapValues(_.map(_._2).toSet.size).toMap
    val expect = grams.filter(g => df(g._1) >= 2).map(g => (g._2, g._3)).distinct
      .groupBy(_._1).flatMap { case (id, ps) =>
        val sorted = ps.map(_._2).sorted
        val islands = sorted.foldLeft(List.empty[List[Long]]) {
          case (acc, p) if acc.nonEmpty && p <= acc.head.head + n => (p :: acc.head) :: acc.tail
          case (acc, p) => List(p) :: acc
        }
        islands.map(is => (id, is.min, is.max + n - 1, is.size.toLong))
      }.toSet
    def run(parts: Int) = graft.operators.Dedup
      .crossDocSpans(docs.toDF("doc_id", "text").repartition(parts), "doc_id", "text", n, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val got = run(5)
    assert(got == expect, s"spans diverged from the naive model:\ngot  $got\nwant $expect")
    assert(run(1) == got && run(13) == got, "spans depend on partitioning")
  }

  test("prefixFilterPairs ≡ brute-force all-pairs Jaccard (no missed pairs)") {
    import spark.implicits._
    val rnd = new Random(29)
    val vocab = Array("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    (1 to 3).foreach { trial =>
      // Mix of fresh docs and mutated near-copies so pairs exist across
      // the whole similarity range, not just at 0 and 1.
      val base = (0 until 12).map { id =>
        (id.toLong, List.fill(6 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      val mutated = base.take(6).map { case (id, text) =>
        val t = text.split(" ").toBuffer
        t(rnd.nextInt(t.length)) = vocab(rnd.nextInt(vocab.length))
        (id + 100L, t.mkString(" "))
      }
      // Byte-identical copies: trials 1–2 are duplicate-DENSE (6 groups
      // of 6 members → Σ C(k,2) = 90 ≥ the collapsePays floor of 64, so
      // the identity-collapse pre-pass runs — within-identity pairs
      // must emit with similarity exactly 1.0, cross-identity pairs
      // must fan out to every member, nothing may duplicate or go
      // missing); trial 3 is duplicate-SPARSE (two size-2 groups,
      // Σ C(k,2) = 2 < 64 → the probe routes to the RAW path, which
      // must produce the identical result on a corpus that still
      // CONTAINS duplicates).
      val copies = if (trial < 3) 5 else 1
      val seeds = if (trial < 3) base.take(4) ++ mutated.take(2) else base.take(2)
      val identical = seeds.flatMap { case (id, text) =>
        (1 to copies).map(c => (id + 1000L * c, text))
      }
      val docs = base ++ mutated ++ identical
      val shingleLen = 2
      val tau = 0.4
      def shingles(text: String): Set[String] = {
        val t = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        (0 until math.max(t.length - shingleLen, 0) + 1)
          .map(i => t.slice(i, math.min(i + shingleLen, t.length)).mkString(" ")).toSet
      }
      val sets = docs.map { case (id, tx) => id -> shingles(tx) }.toMap
      val expect = (for {
        (a, sa) <- sets; (b, sb) <- sets if b > a && sa.nonEmpty && sb.nonEmpty
        j = (sa & sb).size.toDouble / (sa | sb).size if j >= tau
      } yield (a, b, math.rint(j * 1e9) / 1e9)).toSet
      val gotDf = graft.operators.Dedup.prefixFilterPairs(
        docs.toDF("doc_id", "text").repartition(7), "doc_id", "text", shingleLen, tau)
      val got = gotDf.collect()
        .map(r => (r.getLong(0), r.getLong(1), math.rint(r.getDouble(2) * 1e9) / 1e9)).toSet
      assert(got == expect,
        s"trial $trial: prefix-filtered pairs diverged from brute force:\n" +
          s"missed ${expect -- got}\nextra ${got -- expect}")

      // Same corpus, asymmetric bound: containmentPairs must equal the
      // brute-force |A∩B|/|A| >= tau with |A| <= |B| model.
      val tauC = 0.6
      val expectC = (for {
        (a, sa) <- sets; (b, sb) <- sets
        if a != b && sa.nonEmpty && sb.nonEmpty && sa.size <= sb.size
        c = (sa & sb).size.toDouble / sa.size if c >= tauC
      } yield (a, b, math.rint(c * 1e9) / 1e9)).toSet
      val gotC = graft.operators.Dedup.containmentPairs(
          docs.toDF("doc_id", "text").repartition(7), "doc_id", "text", shingleLen, tauC)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), math.rint(r.getDouble(2) * 1e9) / 1e9)).toSet
      assert(gotC == expectC,
        s"trial $trial: containment pairs diverged from brute force:\n" +
          s"missed ${expectC -- gotC}\nextra ${gotC -- expectC}")
    }
  }

  test("prefix filters keep pairs sitting EXACTLY on the tau boundary (fp-ceil soundness)") {
    import spark.implicits._
    // J(A,B) = 2/5 = 0.4 = tau exactly, |A|=2, |B|=5: a naive length
    // filter computes nb*0.4 = 2.0000000000000004 > na and drops it.
    val jDocs = Seq((1L, "x y"), (2L, "x y p q r")).toDF("doc_id", "text")
    val jGot = graft.operators.Dedup
      .prefixFilterPairs(jDocs, "doc_id", "text", shingleLen = 1, tau = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jGot == Set((1L, 2L)), s"boundary Jaccard pair lost: $jGot")

    // containment = 9/10 = 0.9 = tau exactly; A's RAREST token (u0) is
    // the one token B lacks. A naive ceil(0.9*10) = 10 shrinks A's
    // prefix to 1 shingle = {u0}, which never joins B -> pair lost.
    val aToks = "u0 c1 c2 c3 c4 c5 c6 c7 c8 c9"
    val bToks = "c1 c2 c3 c4 c5 c6 c7 c8 c9 z1 z2 z3" // shares c1..c9 only
    // pad df so c1..c9 are common corpus-wide and u0 stays unique
    val pad = (10L to 14L).map(i => (i, "c1 c2 c3 c4 c5 c6 c7 c8 c9"))
    val cDocs = (Seq((1L, aToks), (2L, bToks)) ++ pad).toDF("doc_id", "text")
    val cGot = graft.operators.Dedup
      .containmentPairs(cDocs, "doc_id", "text", shingleLen = 1, tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cGot.contains((1L, 2L)), s"boundary containment pair lost: $cGot")
  }

  test("canonicalizeUrl is idempotent on random structured URLs") {
    import spark.implicits._
    val rnd = new Random(7)
    def seg() = ('a' + rnd.nextInt(26)).toChar.toString * (1 + rnd.nextInt(3))
    val urls = (1 to 200).map { _ =>
      val scheme = if (rnd.nextBoolean()) "https" else "HTTP"
      val host = s"${seg()}.${seg()}.com" + (rnd.nextInt(4) match {
        case 0 => ":443" case 1 => ":80" case 2 => ":8080" case _ => "" })
      val path = (0 to rnd.nextInt(3)).map(_ => "/" * (1 + rnd.nextInt(2)) + seg())
        .mkString + (if (rnd.nextBoolean()) "/" else "")
      val params = Seq("utm_source=x", s"${seg()}=${rnd.nextInt(9)}", "gclid=g",
        s"${seg()}=${seg()}").filter(_ => rnd.nextBoolean())
      val q = if (params.nonEmpty) "?" + rnd.shuffle(params).mkString("&") else ""
      val frag = if (rnd.nextBoolean()) "#f" else ""
      s"$scheme://$host$path$q$frag"
    }
    val once = urls.toDF("u")
      .select(graft.operators.UrlOps.canonicalizeUrl(col("u")).as("c"))
    val twice = once.select(col("c"),
      graft.operators.UrlOps.canonicalizeUrl(col("c")).as("cc"))
      .collect()
    twice.foreach(r => assert(r.getString(0) === r.getString(1),
      s"canonicalization not idempotent: ${r.getString(0)} -> ${r.getString(1)}"))
  }

  test("qualityBudgetCut ≡ maximal bucket-order prefix (random corpora)") {
    import spark.implicits._
    val rnd = new Random(11)
    for (trial <- 1 to 4) {
      val rows = (1L to (50 + rnd.nextInt(100))).map(i =>
        (i, math.rint(rnd.nextDouble() * 1e6) / 1e6, (1 + rnd.nextInt(50)).toLong))
      val budget = (rows.map(_._3).sum * rnd.nextInt(100)) / 100
      val kept = graft.operators.BudgetCut.qualityBudgetCut(
          rows.toDF("id", "score", "tok"), "id", "score", "tok", budget, buckets = 10)
        .collect().map(_.getLong(0)).toSet
      // reference: walk buckets desc, then (score desc, id) inside the
      // boundary bucket, keep while inclusive token sum fits
      val byBucket = rows.groupBy(r => math.floor(
        math.min(1.0, math.max(0.0, r._2)) * 10).toInt)
      var rem = budget
      val want = scala.collection.mutable.Set[Long]()
      var boundaryDone = false
      for (bk <- byBucket.keys.toSeq.sorted.reverse if !boundaryDone) {
        val grp = byBucket(bk)
        val t = grp.map(_._3).sum
        if (t <= rem) { want ++= grp.map(_._1); rem -= t }
        else {
          var r2 = rem
          for ((id, _, tok) <- grp.sortBy(x => (-x._2, x._1)))
            if (tok <= r2) { want += id; r2 -= tok }
            else r2 = -1 // inclusive running sum: first overflow stops the prefix
          boundaryDone = true
        }
      }
      assert(kept === want.toSet, s"trial=$trial budget=$budget")
    }
  }

  test("pageRank conserves mass up to floor leakage on random digraphs") {
    import spark.implicits._
    val rnd = new Random(3)
    for (trial <- 1 to 3) {
      val n = 5 + rnd.nextInt(10)
      val edges = (1 to 3 * n).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      val ranks = graft.operators.LinkRank.pageRank(
          spark, edges.toDF("src", "dst"), "src", "dst", iterations = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
      assert(ranks.keySet === nodes.toSet)
      val total = ranks.values.sum
      // mass never exceeds scale; floors and dangling nodes only leak
      assert(total <= 1000000000000L, s"trial=$trial total=$total")
      assert(ranks.values.forall(_ > 0), "teleport keeps every node positive")
    }
  }
}
