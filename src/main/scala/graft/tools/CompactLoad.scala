package graft.tools

import graft.core.{TableSpec, TableStore}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Compaction-under-load measurement for BASELINE.md: grow a keyed
  * table through N incremental upserts of an sf1-scale fact table,
  * record the accreted file count, compact, and verify the rewrite
  * lands on the byte-target file count with identical content and the
  * documented collapsed-history contract (TableStoreSpec pins the same
  * protocol hermetically at sf0.001).
  *
  * Usage: runMain graft.tools.CompactLoad [sfDir] [slices] [targetMB]
  */
object CompactLoad {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/tmp/graft_sf1")
    val slices = args.lift(1).map(_.toInt).getOrElse(12)
    val targetMB = args.lift(2).map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.registerFunctions(
      graft.core.GraftSession.configure(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt
      ).getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_compact_load"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val store = new TableStore(spark, dir)
    // Ingest-with-corrections shape (same as TableStoreSpec's hermetic
    // twin): the table is partitioned and every upsert touches a
    // sliding pair of partitions — touched partitions are merge-
    // rewritten (new files), untouched ones stay referenced, and the
    // retained-version window keeps superseded files alive, so the
    // file count genuinely accretes version over version.
    val spec = TableSpec("li", Seq("l_orderkey", "l_linenumber"),
      partitionBy = Seq("day"))
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumn("day", pmod(col("l_orderkey"), lit(8L)))

    def stats(): (Int, Long) = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(store.path("li")), true)
      var n = 0; var b = 0L
      while (it.hasNext) {
        val s = it.next()
        if (s.getPath.getName.endsWith(".parquet")) { n += 1; b += s.getLen }
      }
      (n, b)
    }

    var t0 = System.nanoTime()
    (0 until slices).foreach { i =>
      store.upsert(spec,
        li.filter(pmod(col("l_orderkey"), lit(slices.toLong)) === i &&
          (col("day") === i % 8 || col("day") === (i + 1) % 8)))
      val (n, b) = stats()
      println(f"[compactload] upsert ${i + 1}/$slices: $n files, ${b / 1e6}%.1f MB")
    }
    val upsertSec = (System.nanoTime() - t0) / 1e9
    val (filesBefore, bytesBefore) = stats()
    val rowsBefore = store.read(spec).count()
    val lastVersion = store.versions(spec).last

    t0 = System.nanoTime()
    store.compact(spec, targetFileSizeBytes = targetMB.toLong * 1024 * 1024)
    val compactSec = (System.nanoTime() - t0) / 1e9
    val (filesAfter, bytesAfter) = stats()
    val rowsAfter = store.read(spec).count()
    // per-partition byte target (compaction sizes each partition
    // independently): expected files = Σ_p ceil(bytes_p / target)
    val target = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(store.path("li")), true)
      val perPart = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      while (it.hasNext) {
        val s = it.next()
        if (s.getPath.getName.endsWith(".parquet")) {
          val part = s.getPath.toString.split("/").find(_.startsWith("day=")).getOrElse(".")
          perPart(part) += s.getLen
        }
      }
      perPart.values.map(b =>
        math.max(1, math.ceil(b.toDouble / (targetMB * 1024 * 1024)).toInt)).sum
    }
    val versionsAfter = store.versions(spec)

    println(f"[compactload] $slices upserts in $upsertSec%.1f s -> " +
      f"$filesBefore files / ${bytesBefore / 1e6}%.1f MB, $rowsBefore rows")
    println(f"[compactload] compact(${targetMB}MB) in $compactSec%.1f s -> " +
      f"$filesAfter files (target $target) / ${bytesAfter / 1e6}%.1f MB, $rowsAfter rows")
    println(s"[compactload] versions after compact: ${versionsAfter.mkString(",")} " +
      s"(pre-compact head was $lastVersion; history collapsed = ${versionsAfter == Seq(lastVersion + 1)})")
    require(rowsAfter == rowsBefore, "compaction changed row count")
    spark.stop()
  }
}
