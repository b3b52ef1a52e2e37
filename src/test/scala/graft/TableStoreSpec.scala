package graft

import graft.core.{TableSpec, TableStore}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TableStoreSpec extends AnyFunSuite with SharedSpark {

  private def freshStore(name: String): TableStore = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_test_$name"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    new TableStore(spark, dir)
  }

  test("upsert: new rows win on PK conflict (ON DUPLICATE KEY UPDATE)") {
    import spark.implicits._
    val store = freshStore("upsert")
    val spec = TableSpec("t", Seq("k"))
    store.upsert(spec, Seq((1, "a", 10.0), (2, "b", 20.0)).toDF("k", "s", "v"))
    store.upsert(spec, Seq((2, "B", 21.0), (3, "c", 30.0)).toDF("k", "s", "v"))
    val got = store.read(spec).orderBy("k").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1, "a", 10.0), (2, "B", 21.0), (3, "c", 30.0)))
  }

  test("insertIgnore: existing rows survive conflict") {
    import spark.implicits._
    val store = freshStore("ignore")
    val spec = TableSpec("t", Seq("k"))
    store.upsert(spec, Seq((1, 10.0)).toDF("k", "v"))
    store.insertIgnore(spec, Seq((1, -1.0), (2, 20.0)).toDF("k", "v"))
    val got = store.read(spec).orderBy("k").collect().map(r => (r.getInt(0), r.getDouble(1)))
    assert(got.toSeq == Seq((1, 10.0), (2, 20.0)))
  }

  test("upsert is idempotent (upsert ∘ upsert = upsert)") {
    import spark.implicits._
    val store = freshStore("idem")
    val spec = TableSpec("t", Seq("k"))
    val batch = Seq((1, 1.0), (2, 2.0), (3, 3.0)).toDF("k", "v")
    store.upsert(spec, batch)
    val first = store.read(spec).orderBy("k").collect().toSeq
    store.upsert(spec, batch)
    val second = store.read(spec).orderBy("k").collect().toSeq
    assert(first == second)
  }

  test("partitioned upsert rewrites only touched partitions") {
    import spark.implicits._
    val store = freshStore("part")
    val spec = TableSpec("t", Seq("k"), partitionBy = Seq("y"))
    store.upsert(spec, Seq((1, 2020, 1.0), (2, 2020, 2.0), (3, 2021, 3.0)).toDF("k", "y", "v"))
    // touch only 2021
    store.upsert(spec, Seq((3, 2021, 30.0), (4, 2021, 4.0)).toDF("k", "y", "v"))
    val got = store.read(spec).orderBy("k").collect()
      .map(r => (r.getAs[Int]("k"), r.getAs[Double]("v")))
    assert(got.toSeq == Seq((1, 1.0), (2, 2.0), (3, 30.0), (4, 4.0)))
  }

  test("overwritePartitions replaces only the slice present in the batch") {
    import spark.implicits._
    val store = freshStore("ow")
    val spec = TableSpec("t", Seq("k"), partitionBy = Seq("y"))
    store.upsert(spec, Seq((1, 2020, 1.0), (2, 2021, 2.0), (3, 2021, 3.0)).toDF("k", "y", "v"))
    store.overwritePartitions(spec, Seq((9, 2021, 9.0)).toDF("k", "y", "v"))
    val got = store.read(spec).orderBy("k").collect()
      .map(r => (r.getAs[Int]("k"), r.getAs[Double]("v")))
    assert(got.toSeq == Seq((1, 1.0), (9, 9.0)))
  }

  test("compact preserves content and reduces file count") {
    import spark.implicits._
    val store = freshStore("compact")
    val spec = TableSpec("t", Seq("k"))
    // many tiny upserts → many small files
    (1 to 5).foreach(i => store.upsert(spec, Seq((i, i * 1.0)).toDF("k", "v")))
    val before = store.read(spec).orderBy("k").collect().toSeq
    def nFiles = {
      val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(store.path("t")), true)
      var n = 0
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }
    store.compact(spec)
    assert(nFiles == 1)
    assert(store.read(spec).orderBy("k").collect().toSeq == before)
  }

  test("compaction under load: many incremental upserts, file count lands on target, history collapses") {
    // The maintenance scenario the small cases above don't exercise:
    // a PARTITIONED table grown through many incremental upserts, each
    // touching a FEW partitions (the daily-ingest shape — untouched
    // partitions keep their old files, touched ones gain new ones, so
    // files genuinely accrete across versions; an unpartitioned upsert
    // rewrites wholesale and cannot model this). At 100 TB this
    // file-count pressure sets scan parallelism and listing cost.
    // Protocol mirrors tools/CompactLoad (the sf1 BASELINE run).
    import spark.implicits._
    val store = freshStore("compactload")
    val spec = TableSpec("t", Seq("event_id"), partitionBy = Seq("day"))
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        pmod(col("event_id"), lit(8)).as("day"))
    val slices = 12
    // slice i touches days {i%8, (i+1)%8}: overlapping writes, so most
    // upserts rewrite SOME existing partitions and add to others —
    // every version leaves new files while old ones stay referenced.
    (0 until slices).foreach { i =>
      store.upsert(spec, ev
        .filter(pmod(col("event_id"), lit(slices)) === i &&
          (col("day") === i % 8 || col("day") === (i + 1) % 8)))
    }
    def nFiles = {
      val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(store.path("t")), true)
      var n = 0
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }
    val filesBefore = nFiles
    val nParts = store.read(spec).select("day").distinct().count().toInt
    assert(filesBefore > nParts,
      s"incremental upserts must accrete files beyond one-per-partition (saw $filesBefore for $nParts partitions)")
    val before = store.read(spec).orderBy("event_id").collect().toSeq
    val lastVersion = store.versions(spec).last
    store.compact(spec) // default 128 MB target → one file per partition
    assert(nFiles == nParts,
      s"compaction must land on the per-partition size target (saw $nFiles files for $nParts partitions)")
    assert(store.read(spec).orderBy("event_id").collect().toSeq == before,
      "compaction must not change content")
    // Documented time-travel contract: compaction COLLAPSES history —
    // the compacted snapshot is the only one left; older versions fail
    // loudly rather than resurrect dropped batch dirs.
    assert(store.versions(spec) == Seq(lastVersion + 1))
    intercept[java.io.IOException](store.readVersion(spec, lastVersion))
    assert(store.readVersion(spec, lastVersion + 1).count() == before.size.toLong)
    // and the table keeps accepting writes after compaction
    store.upsert(spec, Seq((-1L, 0L, "post", 1.0, 0L))
      .toDF("event_id", "user_id", "event_type", "value", "day"))
    assert(store.read(spec).count() == before.size.toLong + 1)
  }

  test("z-order compaction bounds every file's span on BOTH cluster columns") {
    import spark.implicits._
    val store = freshStore("zorder")
    val spec = TableSpec("t", Seq("k"))
    // 64×64 grid, shuffled on write — an unclustered layout gives every
    // file the full 0..63 span on at least one dimension
    val rnd = new scala.util.Random(3)
    val rows = rnd.shuffle(for (a <- 0 until 64; b <- 0 until 64)
      yield (a * 64 + b, a, b))
    store.upsert(spec, rows.toDF("k", "a", "b"))
    val before = store.read(spec).orderBy("k").collect().toSeq
    store.compact(spec, targetFileSizeBytes = 1536, clusterBy = Seq("a", "b"))
    assert(store.read(spec).orderBy("k").collect().toSeq == before,
      "compaction must not change content")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(store.path("t")), true)
    val files = scala.collection.mutable.ArrayBuffer[String]()
    while (it.hasNext) {
      val p = it.next().getPath
      if (p.getName.endsWith(".parquet")) files += p.toString
    }
    assert(files.size >= 4, s"need multiple files to test clustering, got ${files.size}")
    // Files cover small rectangles of the grid (a z-range that straddles
    // a quadrant boundary may be wide on ONE dim, so the guarantee is
    // aggregate): mean span well under the full 63 on BOTH dims, and no
    // file's bounding box covers more than half the grid area. An
    // unclustered layout fails all three (every file spans ~63×63).
    val spans = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(org.apache.spark.sql.functions.max($"a") - org.apache.spark.sql.functions.min($"a"),
          org.apache.spark.sql.functions.max($"b") - org.apache.spark.sql.functions.min($"b"))
        .head()
      (r.getInt(0), r.getInt(1))
    }
    val avgA = spans.map(_._1).sum.toDouble / spans.size
    val avgB = spans.map(_._2).sum.toDouble / spans.size
    val avgArea = spans.map { case (sa, sb) => sa.toDouble * sb }.sum / spans.size
    assert(avgA <= 40 && avgB <= 40, s"mean spans a=$avgA b=$avgB — not clustered")
    assert(avgArea <= 63.0 * 63 / 3,
      s"mean bounding-box area $avgArea ≈ unclustered (63×63)")
    spans.foreach { case (sa, sb) =>
      assert(sa.toLong * sb <= 63L * 63 / 2, s"file box $sa x $sb covers over half the grid")
    }
  }

  test("in-batch duplicates keep the new-wins row deterministically") {
    import spark.implicits._
    val store = freshStore("dup")
    val spec = TableSpec("t", Seq("k"))
    // duplicate PK inside one batch — one survivor, table stays unique
    store.upsert(spec, Seq((1, 1.0), (1, 99.0)).toDF("k", "v"))
    assert(store.read(spec).count() == 1)
  }

  test("upsert evicts the stale home of a key whose partition value moved") {
    import spark.implicits._
    val store = freshStore("moved")
    // partition column NOT part of the PK → values may move between batches
    val spec = TableSpec("t", Seq("k"), partitionBy = Seq("y"))
    store.upsert(spec, Seq((1, 2020, 1.0), (2, 2021, 2.0)).toDF("k", "y", "v"))
    // key 1 corrects its year 2020 → 2021: old 2020 row must disappear
    store.upsert(spec, Seq((1, 2021, 10.0)).toDF("k", "y", "v"))
    val got = store.read(spec).orderBy("k").collect()
      .map(r => (r.getAs[Int]("k"), r.getAs[Int]("y"), r.getAs[Double]("v")))
    assert(got.toSeq == Seq((1, 2021, 10.0), (2, 2021, 2.0)))
    assert(store.read(spec).groupBy("k").count().filter(col("count") > 1).count() == 0)
  }

  test("evictMovedKeys=false keeps the documented fast path semantics") {
    import spark.implicits._
    val store = freshStore("movedoff")
    val spec = TableSpec("t", Seq("k"), partitionBy = Seq("y"))
    store.upsert(spec, Seq((1, 2020, 1.0)).toDF("k", "y", "v"))
    store.upsert(spec, Seq((1, 2021, 10.0)).toDF("k", "y", "v"), evictMovedKeys = false)
    // without eviction the stale 2020 home survives — caller opted out
    assert(store.read(spec).count() == 2)
  }

  test("uncommitted batch dirs are invisible to readers and swept by the next write") {
    import spark.implicits._
    val store = freshStore("orphan")
    val spec = TableSpec("t", Seq("k"))
    store.upsert(spec, Seq((1, 1.0)).toDF("k", "v"))
    // simulate a crashed writer: a b-* dir exists but no manifest points at it
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val orphan = new org.apache.hadoop.fs.Path(store.path("t"), "b-000000099-deadbeef")
    Seq((9, 9.0)).toDF("k", "v").write.parquet(orphan.toString)
    assert(store.read(spec).count() == 1) // orphan not visible
    store.upsert(spec, Seq((2, 2.0)).toDF("k", "v"))
    assert(!fs.exists(orphan)) // swept by the successful commit's GC
    assert(store.read(spec).orderBy("k").collect().map(_.getDouble(1)).toSeq == Seq(1.0, 2.0))
  }

  test("compact splits an oversized partition into multiple files") {
    import spark.implicits._
    val store = freshStore("compactsize")
    val spec = TableSpec("t", Seq("k"), partitionBy = Seq("y"))
    // y=2020 is ~100× larger than y=2021
    val big = (1 to 20000).map(i => (i, 2020, i.toDouble))
    val small = Seq((100001, 2021, 1.0))
    store.upsert(spec, (big ++ small).toDF("k", "y", "v"))
    val before = store.read(spec).orderBy("k").collect().toSeq
    store.compact(spec, targetFileSizeBytes = 32 * 1024) // tiny target to force splits
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    def filesUnder(glob: String) = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(store.path("t")), true)
      var n = 0
      while (it.hasNext) {
        val p = it.next().getPath
        if (p.getName.endsWith(".parquet") && p.getParent.getName == glob) n += 1
      }
      n
    }
    assert(filesUnder("y=2020") > 1, "oversized partition must split")
    assert(filesUnder("y=2021") == 1, "small partition stays one file")
    assert(store.read(spec).orderBy("k").collect().toSeq == before)
  }

  test("readVersion time-travels across retained snapshots; expired versions fail loudly") {
    import spark.implicits._
    val store = freshStore("timetravel")
    val spec = TableSpec("t", Seq("k"))
    store.upsert(spec, Seq((1, 1.0)).toDF("k", "v"))            // v1
    store.upsert(spec, Seq((1, 2.0), (2, 2.0)).toDF("k", "v"))  // v2
    store.upsert(spec, Seq((3, 3.0)).toDF("k", "v"))            // v3
    assert(store.versions(spec) == Seq(1L, 2L, 3L))
    assert(store.readVersion(spec, 1).collect().map(r => (r.getInt(0), r.getDouble(1))).toSet
      == Set((1, 1.0)))
    assert(store.readVersion(spec, 2).collect().map(r => (r.getInt(0), r.getDouble(1))).toSet
      == Set((1, 2.0), (2, 2.0)))
    assert(store.readVersion(spec, 3).collect().map(_.getInt(0)).toSet == Set(1, 2, 3))
    store.upsert(spec, Seq((4, 4.0)).toDF("k", "v"))            // v4 → v1 expires
    assert(store.versions(spec) == Seq(2L, 3L, 4L))
    intercept[java.io.IOException](store.readVersion(spec, 1))
    // retained snapshots still read complete content after the GC
    assert(store.readVersion(spec, 2).count() == 2)
  }

  test("upsert accepts added columns (schema evolution) and rejects dropped ones") {
    import spark.implicits._
    val store = freshStore("evolve")
    val spec = TableSpec("t", Seq("k"))
    store.upsert(spec, Seq((1, 1.0), (2, 2.0)).toDF("k", "v"))
    // new column arrives: updated row carries it, untouched row reads null
    store.upsert(spec, Seq((2, 2.5, "x2")).toDF("k", "v", "extra"))
    val got = store.read(spec).orderBy("k").collect()
      .map(r => (r.getInt(0), r.getDouble(1), Option(r.getString(2))))
    assert(got.toSeq == Seq((1, 1.0, None), (2, 2.5, Some("x2"))))
    // a batch missing an existing column must fail loudly, not null it out
    val e = intercept[java.io.IOException](
      store.upsert(spec, Seq((3, 3.0)).toDF("k", "v")))
    assert(e.getMessage.contains("extra"))
  }

  test("declared schema: conforms order/widening, rejects mismatches, completes reads") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val store = freshStore("schema")
    val declared = StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType),
      StructField("tag", StringType)))
    val spec = TableSpec("t", Seq("k"), schema = Some(declared))
    // batch arrives with shuffled column order and narrower types
    // (k: int, v: float) — conformed to declared order and widened
    store.upsert(spec, Seq(("a", 1, 1.5f), ("b", 2, 2.5f)).toDF("tag", "k", "v"))
    val got = store.read(spec)
    assert(got.columns.toSeq == Seq("k", "v", "tag"))
    assert(got.schema("k").dataType == LongType)
    assert(got.schema("v").dataType == DoubleType)
    assert(got.orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
      .toSeq == Seq((1L, 1.5, "a"), (2L, 2.5, "b")))
    // undeclared column → loud failure
    val extra = intercept[java.io.IOException](store.upsert(spec,
      Seq((3L, 3.0, "c", true)).toDF("k", "v", "tag", "rogue")))
    assert(extra.getMessage.contains("rogue"))
    // missing declared column → loud failure
    val miss = intercept[java.io.IOException](store.upsert(spec,
      Seq((3L, 3.0)).toDF("k", "v")))
    assert(miss.getMessage.contains("tag"))
    // lossy narrowing (string → double) → loud failure
    val lossy = intercept[java.io.IOException](store.upsert(spec,
      Seq((3L, "not a number", "c")).toDF("k", "v", "tag")))
    assert(lossy.getMessage.contains("not a safe widening"))
    // schema grows: reads complete the new column as typed nulls for
    // batches written before it existed
    val grown = spec.copy(schema = Some(declared.add(StructField("score", IntegerType))))
    val complete = store.read(grown)
    assert(complete.columns.toSeq == Seq("k", "v", "tag", "score"))
    assert(complete.filter(col("score").isNotNull).count() == 0)
    store.upsert(grown, Seq((2L, 9.0, "B", 7), (5L, 5.0, "e", 1))
      .toDF("k", "v", "tag", "score"))
    val merged = store.read(grown).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getInt(3))))
    assert(merged.toSeq == Seq((1L, 1.5, "a", None), (2L, 9.0, "B", Some(7)),
      (5L, 5.0, "e", Some(1))))
  }

  test("a plain pre-manifest parquet dir is adopted and merged in place") {
    import spark.implicits._
    val store = freshStore("legacy")
    val spec = TableSpec("t", Seq("k"))
    // legacy layout: parquet written straight at the table path, no manifest
    Seq((1, 1.0), (2, 2.0)).toDF("k", "v").write.parquet(store.path("t"))
    assert(store.exists(spec))
    assert(store.read(spec).count() == 2)
    store.upsert(spec, Seq((2, 20.0), (3, 3.0)).toDF("k", "v"))
    val got = store.read(spec).orderBy("k").collect().map(r => (r.getInt(0), r.getDouble(1)))
    assert(got.toSeq == Seq((1, 1.0), (2, 20.0), (3, 3.0)))
  }

  test("schemaAudit: alias pairs, PK flags, type drift, and one-sided columns") {
    import graft.core.SchemaAudit
    import org.apache.spark.sql.types._
    val left = SchemaAudit.TableDesc(StructType(Seq(
      StructField("trade_date", DateType), StructField("vol", LongType),
      StructField("open", DoubleType), StructField("extra", StringType))),
      Seq("trade_date"))
    val right = SchemaAudit.TableDesc(StructType(Seq(
      StructField("Date", DateType), StructField("Volume", LongType),
      StructField("Open", FloatType), StructField("Close", DoubleType))),
      Seq("Date"))
    // the reference's own match_pairs: trade_date↔Date, vol↔Volume
    val got = SchemaAudit.audit(spark, left, right,
        aliases = Seq(("trade_date", "Date"), ("vol", "Volume")))
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.getString(3)).orNull, Option(r.getString(6)).orNull,
        if (r.isNullAt(8)) None else Some(r.getBoolean(8)),
        if (r.isNullAt(4)) None else Some(r.getBoolean(4)),
        if (r.isNullAt(7)) None else Some(r.getBoolean(7))))
    assert(got.toSeq == Seq(
      ("close", "right_only", null, "double", None, None, Some(false)),
      ("extra", "left_only", "varchar", null, None, Some(false), None),
      ("open", "matched", "double", "float", Some(false), Some(false), Some(false)),
      ("trade_date", "matched", "date", "date", Some(true), Some(true), Some(true)),
      ("vol", "matched", "bigint", "bigint", Some(true), Some(false), Some(false))))
    // ambiguous keys must throw, not pair arbitrarily
    val clash = SchemaAudit.TableDesc(StructType(Seq(
      StructField("a_x", LongType), StructField("b_x", LongType))), Nil)
    assertThrows[IllegalArgumentException] {
      SchemaAudit.audit(spark, clash, right, normalize = _.drop(2))
    }
  }
}
