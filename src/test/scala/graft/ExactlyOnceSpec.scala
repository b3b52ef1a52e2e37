package graft

import graft.core.{TableSpec, TableStore}
import graft.streaming.ExactlyOnce
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The transactional-foreachBatch guard: manifest props commit atomically
  * with the data, and the applied-batchId check turns an at-least-once
  * replay of a read-modify-write fold into a no-op. The NEGATIVE case is
  * pinned too — without the guard the same replay double-counts, which is
  * what makes the guard load-bearing rather than decorative.
  */
class ExactlyOnceSpec extends AnyFunSuite with SharedSpark {

  private def freshStore(name: String): TableStore = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_test_eo_$name"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    new TableStore(spark, dir)
  }

  test("manifest props roundtrip and carry forward across commits") {
    import spark.implicits._
    val store = freshStore("props")
    val spec = TableSpec("t", Seq("k"))
    store.upsert(spec, Seq((1, 10L)).toDF("k", "v"), props = Map("a" -> "1"))
    assert(store.props(spec) == Map("a" -> "1"))
    // props without an override carry forward; new keys overlay
    store.upsert(spec, Seq((2, 20L)).toDF("k", "v"), props = Map("b" -> "x=y"))
    assert(store.props(spec) == Map("a" -> "1", "b" -> "x=y"))
    store.upsert(spec, Seq((3, 30L)).toDF("k", "v"), props = Map("a" -> "2"))
    assert(store.props(spec) == Map("a" -> "2", "b" -> "x=y"))
    // data unaffected
    assert(store.read(spec).count() == 3)
    // '=' in a KEY is unrepresentable and must fail loudly, not corrupt
    intercept[IllegalArgumentException] {
      store.upsert(spec, Seq((4, 40L)).toDF("k", "v"), props = Map("a=b" -> "1"))
    }
  }

  test("missing table / pre-props manifest read as empty props") {
    val store = freshStore("empty")
    val spec = TableSpec("t", Seq("k"))
    assert(store.props(spec).isEmpty)
    import spark.implicits._
    store.upsert(spec, Seq((1, 1L)).toDF("k", "v"))
    assert(store.props(spec).isEmpty)
  }

  /** A sum fold `store(k) += batch(k)` — the stream_url_ledger shape. */
  private def sumFold(store: TableStore, spec: TableSpec,
      batch: DataFrame, batchId: Long, guarded: Boolean): Unit = {
    if (guarded && ExactlyOnce.alreadyApplied(store, spec, batchId)) return
    val merged =
      if (store.exists(spec))
        batch.join(store.read(spec).select(col("k"), col("n").as("__n0")),
            Seq("k"), "left")
          .select(col("k"), (col("n") + coalesce(col("__n0"), lit(0L))).as("n"))
      else batch
    store.upsert(spec, merged,
      props = if (guarded) ExactlyOnce.applied(batchId) else Map.empty)
  }

  test("unguarded replay double-counts; guarded replay is a no-op") {
    import spark.implicits._
    val b0 = Seq(("a", 2L), ("b", 1L)).toDF("k", "n")
    val b1 = Seq(("a", 3L)).toDF("k", "n")
    def readMap(st: TableStore, sp: TableSpec): Map[String, Long] =
      st.read(sp).collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // at-least-once schedule: batch 0, CRASH before engine commit,
    // replayed batch 0 (same id), batch 1
    val bad = freshStore("unguarded")
    val badSpec = TableSpec("t", Seq("k"))
    Seq((b0, 0L), (b0, 0L), (b1, 1L)).foreach { case (b, id) =>
      sumFold(bad, badSpec, b, id, guarded = false) }
    assert(readMap(bad, badSpec) == Map("a" -> 7L, "b" -> 2L)) // wrong: b0 folded twice

    val good = freshStore("guarded")
    val goodSpec = TableSpec("t", Seq("k"))
    Seq((b0, 0L), (b0, 0L), (b1, 1L)).foreach { case (b, id) =>
      sumFold(good, goodSpec, b, id, guarded = true) }
    assert(readMap(good, goodSpec) == Map("a" -> 5L, "b" -> 1L)) // exact
    assert(good.props(goodSpec) == Map(ExactlyOnce.BatchIdProp -> "1"))
  }
}
