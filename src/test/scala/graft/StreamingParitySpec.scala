package graft

import graft.core.Tables
import graft.operators.Resample
import graft.streaming.TickBarStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5.2(5): the streaming tick→bar pipeline must produce exactly
  * the bars the batch aggregation produces when the whole fixture is
  * replayed (late rows within watermark included).
  */
class StreamingParitySpec extends AnyFunSuite with SharedSpark {

  test("streaming bars ≡ batch bars on the sf0.001 events fixture") {
    val sfDir = "/root/testdata/sf0.001"
    val batchTicks = Tables.events(spark, sfDir)
    val batch = Resample
      .ticksToBars(batchTicks.withColumn("one", lit(1.0)),
        Seq("user_id"), "ts", "event_id", "value", "one", "1 hour")
      .select("user_id", "bar_start", "open", "high", "low", "close", "n_ticks")

    // stage into a directory for the file stream source
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_parity_stream"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(s"$sfDir/events.parquet"), fs,
      new org.apache.hadoop.fs.Path(dir, "events.parquet"), false,
      spark.sparkContext.hadoopConfiguration)
    val raw = spark.readStream
      .schema(spark.read.parquet(s"$sfDir/events.parquet").schema).parquet(dir)
    val ticks = Tables.normalizeEventTime(raw, "ts")
    val streamed = TickBarStream.replayParquet(spark, dir,
      spark.read.parquet(s"$sfDir/events.parquet").schema,
      _ => TickBarStream.bars(ticks, Seq("user_id"), "ts", "event_id", "value",
        "1 hour", watermark = "10 minutes"),
      queryName = "parity_bars")
      .select("user_id", "bar_start", "open", "high", "low", "close", "n_ticks")

    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("event-time conformance: NTZ parquet flows through a watermarked query") {
    // SURVEY §1.4 type policy as an engine invariant: a fixture
    // regeneration that flips `ts` between TIMESTAMP / TIMESTAMP_NTZ /
    // INT64-nanos must not break watermark consumers, because every
    // event-time read goes through Tables.normalizeEventTime.
    import spark.implicits._
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_ntz_conformance"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    Seq((1L, 1L, 10.0, "2024-01-01T00:05:00"), (1L, 2L, 20.0, "2024-01-01T00:25:00"),
        (2L, 3L, 5.0, "2024-01-01T01:10:00"))
      .toDF("user_id", "event_id", "value", "ts_raw")
      .withColumn("ts", col("ts_raw").cast(TimestampNTZType)).drop("ts_raw")
      .write.parquet(dir)

    val schema = spark.read.parquet(dir).schema
    assert(schema("ts").dataType == TimestampNTZType, "fixture must be NTZ to exercise the branch")
    // batch path: read-layer normalization relabels to TimestampType
    val batch = Tables.normalizeEventTime(spark.read.parquet(dir), "ts")
    assert(batch.schema("ts").dataType == TimestampType)
    // streaming path: the NTZ column must survive withWatermark after
    // normalization (this is exactly what EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
    // rejected before the read-layer policy existed)
    val raw = spark.readStream.schema(schema).parquet(dir)
    val ticks = Tables.normalizeEventTime(raw, "ts")
    val bars = TickBarStream.bars(ticks, Seq("user_id"), "ts", "event_id", "value",
      "1 hour", watermark = "10 minutes")
    val q = bars.writeStream.outputMode("complete").format("memory")
      .queryName("ntz_conformance_bars").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("ntz_conformance_bars")
      .select($"user_id", $"bar_start".cast("string"), $"n_ticks")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((1L, "2024-01-01 00:00:00", 2L), (2L, "2024-01-01 01:00:00", 1L)), got)
  }

  test("event-time conformance: long-nanos column normalizes to micros TimestampType") {
    import spark.implicits._
    import org.apache.spark.sql.types.TimestampType
    val nanos = 1704067200L * 1000000000L + 123456789L // 2024-01-01T00:00:00.123456789
    val df = Seq(nanos).toDF("ts")
    val norm = Tables.normalizeEventTime(df, "ts")
    assert(norm.schema("ts").dataType == TimestampType)
    assert(norm.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")).as[String].head()
      == "2024-01-01 00:00:00.123456") // ns truncated like DuckDB ns→us
  }

  test("mapGroupsWithState folds later micro-batches into carried state") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Long, Double)]
    val stats = graft.streaming.StatefulStats.runningUserStats(
      spark, in.toDF().toDF("user_id", "event_id", "value"))
    val q = stats.writeStream.outputMode("update").format("memory")
      .queryName("state_carry_test").start()
    try {
      in.addData((1L, 1L, 10.0), (1L, 2L, 20.0), (2L, 3L, 5.0))
      q.processAllAvailable()
      in.addData((1L, 4L, 30.0)) // second batch touches only user 1
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("state_carry_test")
      .groupBy($"user_id").agg(max_by(struct($"n_events", $"sum_value", $"n_updates"), $"n_updates").as("s"))
      .select($"user_id", $"s.n_events", $"s.sum_value", $"s.n_updates")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getInt(3)))).toMap
    assert(rows(1L) == ((3L, 60.0, 2)), s"user 1 state not carried: $rows")
    assert(rows(2L) == ((1L, 5.0, 1)), s"user 2 over-updated: $rows")
  }

  test("streaming bars ≡ batch bars under the RocksDB state store") {
    // The 100 TB state-store story: HDFS-backed in-memory maps cap at
    // executor heap, RocksDB spills state to local disk. The pipeline
    // must produce identical bars under either provider (state layout
    // is provider-internal; results are not). rocksdbjni ships with the
    // Spark 4 distribution, so this is config, not code.
    val sfDir = "/root/testdata/sf0.001"
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val batch = Resample
        .ticksToBars(Tables.events(spark, sfDir).withColumn("one", lit(1.0)),
          Seq("user_id"), "ts", "event_id", "value", "one", "1 hour")
        .select("user_id", "bar_start", "open", "high", "low", "close", "n_ticks")
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_rocksdb_parity"
      val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(s"$sfDir/events.parquet"), fs,
        new org.apache.hadoop.fs.Path(dir, "events.parquet"), false,
        spark.sparkContext.hadoopConfiguration)
      val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
      val streamed = TickBarStream.replayParquet(spark, dir, schema,
        raw => TickBarStream.bars(Tables.normalizeEventTime(raw, "ts"),
          Seq("user_id"), "ts", "event_id", "value", "1 hour",
          watermark = "10 minutes"),
        queryName = "rocksdb_parity_bars")
        .select("user_id", "bar_start", "open", "high", "low", "close", "n_ticks")
      assert(streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
      org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    }
  }
}
