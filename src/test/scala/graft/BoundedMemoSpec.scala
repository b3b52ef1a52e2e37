package graft

import graft.core.BoundedMemo
import org.scalatest.funsuite.AnyFunSuite

class BoundedMemoSpec extends AnyFunSuite {

  test("LRU: eldest-by-access entry evicts at the cap and recomputes on next touch") {
    val memo = new BoundedMemo[String, Int](3)
    var computes = 0
    def get(k: String): Int = memo.getOrElseUpdate(k, { computes += 1; k.length })
    get("a"); get("bb"); get("ccc")
    assert(computes == 3 && memo.size == 3)
    get("a") // refresh "a" — "bb" is now eldest
    get("dddd") // cap exceeded → evicts "bb"
    assert(memo.size == 3)
    assert(memo.keysInAccessOrder == Seq("ccc", "a", "dddd"))
    get("a"); get("ccc"); get("dddd")
    assert(computes == 4, "survivors must not recompute")
    get("bb")
    assert(computes == 5, "evicted entry must recompute")
  }

  test("evictIf sweeps matching entries; get/put probe path respects the cap") {
    val memo = new BoundedMemo[String, Int](4)
    for (k <- Seq("s1", "s2", "d1", "d2")) memo.put(k, k.length)
    memo.evictIf((k, _) => k.startsWith("d")) // the dead-session sweep shape
    assert(memo.size == 2 && memo.get("d1").isEmpty && memo.get("s1").contains(2))
    for (k <- Seq("x1", "x2", "x3")) memo.put(k, 0)
    assert(memo.size == 4, "put must honor the LRU cap")
  }

  test("null-tolerant contains semantics: a computed null is cached, not recomputed") {
    val memo = new BoundedMemo[String, String](2)
    var computes = 0
    def get(): String = memo.getOrElseUpdate("k", { computes += 1; null })
    assert(get() == null && get() == null && computes == 1)
  }
}

/** Content-aware planKey: the memo keys that guard scratch-materialized
  * reductions must change when a memoized input dir is rewritten IN
  * PLACE — the round-10 foot-gun was a plan-string-only key serving
  * stale d1 reductions after an overwrite. */
class PlanKeyContentSpec extends AnyFunSuite with SharedSpark {
  import org.apache.spark.sql.functions.col

  test("in-place overwrite of a parquet input changes planKey; re-ask gets fresh") {
    import spark.implicits._
    val dir = graft.core.Scratch.queryDir("plankey_spec")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.mode("overwrite").parquet(dir)
    val k1 = graft.core.Scratch.planKey(spark.read.parquet(dir))
    val k1again = graft.core.Scratch.planKey(spark.read.parquet(dir))
    assert(k1 == k1again, "key must be stable while the input is untouched")
    Seq((3L, "c")).toDF("k", "v").write.mode("overwrite").parquet(dir)
    // the short-TTL path-version memo bounds probe I/O: a rewrite
    // INSIDE the TTL window still serves the cached version...
    val kStale = graft.core.Scratch.planKey(spark.read.parquet(dir))
    assert(kStale == k1, "within the TTL window the memoized version holds")
    // ...and the first probe past the TTL mints a fresh key (the test
    // seam stands in for the 10 s clock)
    graft.core.Scratch.invalidatePathVersions()
    val k2 = graft.core.Scratch.planKey(spark.read.parquet(dir))
    assert(k1 != k2, "in-place overwrite must mint a fresh key past the TTL")
  }

  test("in-repo write paths invalidate the TTL memo immediately (no stale window)") {
    import spark.implicits._
    // 1) Scratch.materialize: write-then-read inside one session must
    //    mint a fresh key even within the TTL window
    val df1 = Seq((1L, "a")).toDF("k", "v")
    val mat1 = graft.core.Scratch.materialize(df1, "inv_spec", "key1")
    val kA = graft.core.Scratch.planKey(mat1)
    // same scratch path, new content (same kind+key → same path)
    val df2 = Seq((2L, "b"), (3L, "c")).toDF("k", "v")
    val mat2 = graft.core.Scratch.materialize(df2, "inv_spec", "key1")
    val kB = graft.core.Scratch.planKey(mat2)
    assert(kA != kB,
      "materialize must invalidate its own path — stale key within TTL")

    // 2) TableStore commit: an upsert between two reads of the same
    //    table must change the key with no TTL wait
    val dir = graft.core.Scratch.queryDir("plankey_store_spec")
    val fs = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val store = new graft.core.TableStore(spark, dir)
    val spec = graft.core.TableSpec("t", Seq("k"))
    store.upsert(spec, Seq((1L, "a")).toDF("k", "v"))
    val k1 = graft.core.Scratch.planKey(store.read(spec))
    store.upsert(spec, Seq((1L, "z")).toDF("k", "v"))
    val k2 = graft.core.Scratch.planKey(store.read(spec))
    assert(k1 != k2,
      "TableStore commit must invalidate the table's memoized versions")
  }

  test("a failed path probe is not memoized: create-after-probe keys fresh") {
    import spark.implicits._
    val dir = graft.core.Scratch.queryDir("plankey_miss_spec")
    val fs = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    Seq((1L, "a")).toDF("k", "v").write.parquet(dir)
    val df = spark.read.parquet(dir) // analyzed while the dir exists
    // delete the dir and probe: the failure sentinel must NOT enter the
    // memo, so recreating the dir inside the TTL window keys fresh
    graft.core.Scratch.invalidatePathVersions()
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val kMissing = graft.core.Scratch.planKey(df)
    Seq((2L, "b")).toDF("k", "v").write.parquet(dir)
    val kBack = graft.core.Scratch.planKey(df)
    assert(kMissing != kBack,
      "failure sentinel memoized for the TTL — create-after-probe reads stale")
  }

  test("memoized d1 reduction serves fresh results after an input overwrite") {
    import spark.implicits._
    val dir = graft.core.Scratch.queryDir("plankey_d1_spec")
    def bars(id: String) = Seq(
      ("RB", id, java.sql.Date.valueOf("2021-01-04"), 10.0, 100.0,
        java.sql.Date.valueOf("2021-05-15"))
    ).toDF("instrument_type", "instrument_id", "trade_date", "close",
      "switch_by", "last_trade_date")
    bars("A1").write.mode("overwrite").parquet(dir)
    val got1 = graft.analytics.ContinuousFutures
      .dailySelection(spark, spark.read.parquet(dir))
      .select(col("main_id")).as[String].collect().toSeq
    assert(got1 == Seq("A1"))
    bars("B2").write.mode("overwrite").parquet(dir) // in-place rewrite
    graft.core.Scratch.invalidatePathVersions() // stand-in for TTL expiry
    val got2 = graft.analytics.ContinuousFutures
      .dailySelection(spark, spark.read.parquet(dir))
      .select(col("main_id")).as[String].collect().toSeq
    assert(got2 == Seq("B2"), "stale memoized reduction served after overwrite")
  }
}
