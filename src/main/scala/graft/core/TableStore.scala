package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Logical table descriptor: the reference retrofitted primary keys onto
  * MySQL tables by name convention (/root/reference/tasks/backend/orm.py:113-298);
  * here the convention is explicit code.
  *
  * @param partitionBy storage partition columns (coarse date buckets or
  *                    instrument type) — at 100 TB these drive partition
  *                    pruning and bound the rewrite set of an upsert.
  */
final case class TableSpec(
    name: String,
    primaryKey: Seq[String],
    partitionBy: Seq[String] = Nil)

/** Keyed-upsert table store over Parquet — the engine's #1 primitive.
  *
  * Reimplements the reference's `bunch_insert_on_duplicate_update`
  * (partials at /root/reference/tasks/backend/__init__.py:18-19, used by
  * every pipeline) on an immutable columnar store:
  *
  *  - `upsert`     = INSERT … ON DUPLICATE KEY UPDATE (new row wins)
  *  - `insertIgnore` = INSERT IGNORE (existing row wins;
  *                   /root/reference/tasks/pytdx/stock_tick_2_bar.py:39)
  *  - `overwritePartitions` = delete-then-insert of a partition slice
  *                   (/root/reference/tasks/wind/future_reorg/reorg_md_2_db.py:176-193)
  *
  * Scale design: for a partitioned table the merge only reads + rewrites
  * the partitions present in the incoming batch (computed with one small
  * distinct over the batch), so an incremental daily load against a
  * 100 TB history touches one date partition, not the table. The merge
  * itself is a single shuffle on the primary key (row_number keep-latest);
  * writes go to a temp directory and are swapped in with filesystem
  * renames so a failed job never leaves a half-written table.
  */
final class TableStore(spark: SparkSession, root: String) {

  def path(name: String): String = s"$root/$name"

  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spec: TableSpec): Boolean = fs.exists(new Path(path(spec.name)))

  def read(spec: TableSpec): DataFrame = spark.read.parquet(path(spec.name))

  def append(spec: TableSpec, batch: DataFrame): Unit = {
    val w = batch.write.mode(SaveMode.Append)
    (if (spec.partitionBy.nonEmpty) w.partitionBy(spec.partitionBy: _*) else w)
      .parquet(path(spec.name))
  }

  /** Keep-latest-per-PK merge. `newWins=false` gives INSERT IGNORE. */
  def upsert(spec: TableSpec, batch: DataFrame, newWins: Boolean = true): Unit = {
    require(spec.primaryKey.nonEmpty, s"${spec.name}: upsert needs a primary key")
    val pk = spec.primaryKey.map(col)
    // Dedup within the batch first, honouring batch row order like the
    // reference's sequential INSERT..ON DUPLICATE loop: last occurrence
    // wins for upsert, first for INSERT IGNORE. monotonically_increasing_id
    // encodes (partition, position) and is monotone in row order within
    // each partition — the strongest order a distributed batch has.
    val seq = if (newWins) -monotonically_increasing_id() else monotonically_increasing_id()
    val newDeduped = dedupByPk(
      batch.withColumn("__prio", lit(if (newWins) 0 else 1)).withColumn("__seq", seq),
      spec).drop("__seq")
    if (!exists(spec)) {
      writeSwap(spec, newDeduped.drop("__prio"), replaceAll = true, Nil)
      return
    }
    val existing0 = read(spec).withColumn("__prio", lit(if (newWins) 1 else 0))
    // Partition pruning: only merge against partitions the batch touches.
    val affected: Seq[Map[String, Any]] =
      if (spec.partitionBy.isEmpty) Nil
      else batch.select(spec.partitionBy.map(col): _*).distinct()
        .collect().toSeq
        .map(r => spec.partitionBy.zipWithIndex.map { case (c, i) => c -> r.get(i) }.toMap)
    val existing =
      if (affected.isEmpty) existing0
      else existing0.filter(partitionPredicate(affected))
    val cols = batch.columns.filterNot(_ == "__prio")
    val merged = dedupByPk(
      newDeduped.select((cols :+ "__prio").map(col): _*)
        .unionByName(existing.select((cols :+ "__prio").map(col): _*)),
      spec
    ).drop("__prio")
    writeSwap(spec, merged, replaceAll = spec.partitionBy.isEmpty, affected)
  }

  /** K2 — keep the first-seen row on PK conflict. */
  def insertIgnore(spec: TableSpec, batch: DataFrame): Unit =
    upsert(spec, batch, newWins = false)

  /** K3 — wipe the partition slice(s) present in `batch`, then load it. */
  def overwritePartitions(spec: TableSpec, batch: DataFrame): Unit = {
    require(spec.partitionBy.nonEmpty, s"${spec.name}: no partition columns")
    batch.write.mode(SaveMode.Overwrite)
      .partitionBy(spec.partitionBy: _*)
      .option("partitionOverwriteMode", "dynamic")
      .parquet(path(spec.name))
  }

  /** Small-file compaction: incremental upserts leave one file set per
    * batch; periodically rewrite each partition into
    * ceil(bytes/targetFileSize) files. The reference's analog was MySQL
    * REPAIR TABLE + partition maintenance
    * (/root/reference/tasks/backend/repair_table.py:15-22); on an
    * immutable columnar store the concern becomes file-count hygiene —
    * at 100 TB, scan parallelism and NameNode/listing pressure are set
    * by this. Same swap-write path as upsert, so readers never see a
    * half-compacted table.
    */
  def compact(spec: TableSpec, targetFileSizeBytes: Long = 128L * 1024 * 1024): Unit = {
    require(exists(spec), s"${spec.name}: nothing to compact")
    val f = fs
    val totalBytes = {
      val it = f.listFiles(new Path(path(spec.name)), true)
      var n = 0L
      while (it.hasNext) { val s = it.next(); if (s.getPath.getName.endsWith(".parquet")) n += s.getLen }
      n
    }
    val files = math.max(1, math.ceil(totalBytes.toDouble / targetFileSizeBytes).toInt)
    val df = read(spec)
    val compacted =
      if (spec.partitionBy.nonEmpty)
        // spread within partitions; dynamic repartition per partition key
        df.repartition(files, spec.partitionBy.map(col): _*)
      else df.repartition(files)
    writeSwap(spec, compacted, replaceAll = true, Nil)
  }

  private def dedupByPk(df: DataFrame, spec: TableSpec): DataFrame = {
    val ord =
      if (df.columns.contains("__seq")) Seq(col("__prio").asc, col("__seq").asc)
      else Seq(col("__prio").asc)
    val w = Window.partitionBy(spec.primaryKey.map(col): _*).orderBy(ord: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  private def partitionPredicate(affected: Seq[Map[String, Any]]): Column =
    affected.map { m =>
      m.map { case (c, v) => col(c) <=> lit(v) }.reduce(_ && _)
    }.reduce(_ || _)

  /** Write `df` to a temp dir then swap: whole table, or just the
    * affected partition directories. Rename-based, so the visible table
    * is never half-written.
    */
  private def writeSwap(spec: TableSpec, df: DataFrame, replaceAll: Boolean,
      affected: Seq[Map[String, Any]]): Unit = {
    val main = new Path(path(spec.name))
    val tmp = new Path(path(spec.name) + "__tmp")
    val f = fs
    if (f.exists(tmp)) f.delete(tmp, true)
    val w = df.write.mode(SaveMode.Overwrite)
    (if (spec.partitionBy.nonEmpty) w.partitionBy(spec.partitionBy: _*) else w)
      .parquet(tmp.toString)
    if (replaceAll) {
      val bak = new Path(path(spec.name) + "__old")
      if (f.exists(bak)) f.delete(bak, true)
      if (f.exists(main)) f.rename(main, bak)
      f.rename(tmp, main)
      f.delete(bak, true)
    } else {
      // Swap only the partition directories the batch touched.
      affected.foreach { m =>
        val rel = spec.partitionBy.map(c => s"$c=${partDirValue(m(c))}").mkString("/")
        val src = new Path(tmp, rel)
        val dst = new Path(main, rel)
        if (f.exists(dst)) f.delete(dst, true)
        if (f.exists(src)) {
          f.mkdirs(dst.getParent)
          f.rename(src, dst)
        }
      }
      f.delete(tmp, true)
    }
  }

  private def partDirValue(v: Any): String = v match {
    case null => "__HIVE_DEFAULT_PARTITION__"
    case other => other.toString
  }
}
