package graft

import org.scalatest.funsuite.AnyFunSuite

/** Stream-source staging must work for BOTH table shapes: the driver
  * testdata's single parquet files and Spark-written DIRECTORIES of
  * part files (ScaleUp corpora, store exports). The file stream source
  * does not recurse, so the pre-round-12 whole-file copy read a
  * directory-shaped table as zero rows — this spec pins the fix at toy
  * scale (the sf1 correctness run exercises it at corpus scale).
  */
class StagingSpec extends AnyFunSuite with SharedSpark {

  private def fs = org.apache.hadoop.fs.FileSystem
    .get(spark.sparkContext.hadoopConfiguration)

  private def drain(streamDir: String, name: String): Long = {
    val raw = spark.readStream.schema("v LONG").parquet(streamDir)
    val q = raw.writeStream.format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name).count()
  }

  test("directory-shaped table stages as flat files the stream source reads") {
    import spark.implicits._
    val dir = graft.core.Scratch.queryDir("stage_spec_src")
    Seq(1L, 2L, 3L, 4L, 5L).toDF("v")
      .repartition(3).write.mode("overwrite").parquet(dir)
    val streamDir = new org.apache.hadoop.fs.Path(
      graft.core.Scratch.queryDir("stage_spec_stream"))
    fs.delete(streamDir, true); fs.mkdirs(streamDir)
    graft.queries.DomainQueries.stageTableFiles(spark, dir, streamDir, "t")
    val staged = fs.listStatus(streamDir)
    assert(staged.nonEmpty && staged.forall(_.isFile),
      "staging must flatten part files — a subdirectory reads as zero rows")
    assert(drain(streamDir.toString, "stage_spec_dir_out") == 5L)
  }

  test("single-file table (driver-testdata shape) still stages verbatim") {
    import spark.implicits._
    val tmp = graft.core.Scratch.queryDir("stage_spec_one_tmp")
    Seq(7L, 8L).toDF("v").coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .map(_.getPath).find(_.getName.startsWith("part-")).get
    // keep the single file inside a pid-scoped dir so the scratch
    // sweep still cleans it up
    val oneDir = new org.apache.hadoop.fs.Path(
      graft.core.Scratch.queryDir("stage_spec_one"))
    fs.delete(oneDir, true); fs.mkdirs(oneDir)
    val one = new org.apache.hadoop.fs.Path(oneDir, "table.parquet").toString
    fs.rename(part, new org.apache.hadoop.fs.Path(one))
    val streamDir = new org.apache.hadoop.fs.Path(
      graft.core.Scratch.queryDir("stage_spec_stream1"))
    fs.delete(streamDir, true); fs.mkdirs(streamDir)
    graft.queries.DomainQueries.stageTableFiles(spark, one, streamDir, "t")
    val staged = fs.listStatus(streamDir)
    assert(staged.length == 1 && staged.head.isFile &&
      staged.head.getPath.getName == "t.parquet")
    assert(drain(streamDir.toString, "stage_spec_one_out") == 2L)
  }

  test("staging a directory with no parquet children fails loudly") {
    // a zero-partition write leaves only _SUCCESS — staging nothing
    // silently would reproduce the zero-row stream read bug
    val dir = new org.apache.hadoop.fs.Path(
      graft.core.Scratch.queryDir("stage_spec_empty"))
    fs.delete(dir, true); fs.mkdirs(dir)
    fs.create(new org.apache.hadoop.fs.Path(dir, "_SUCCESS")).close()
    val streamDir = new org.apache.hadoop.fs.Path(
      graft.core.Scratch.queryDir("stage_spec_stream_e"))
    fs.delete(streamDir, true); fs.mkdirs(streamDir)
    val ex = intercept[IllegalArgumentException] {
      graft.queries.DomainQueries.stageTableFiles(
        spark, dir.toString, streamDir, "t")
    }
    assert(ex.getMessage.contains("no *.parquet files"))
  }
}
