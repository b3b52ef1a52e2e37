package graft

import graft.analytics.FinanceReports
import graft.core.{TableSpec, TableStore}
import graft.operators.AsOfJoin
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
}
