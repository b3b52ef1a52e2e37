package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver's deterministic testdata (TESTDATA.md).
  *
  * Every `SparkEntry.queries` entry receives `(spark, sfDir)`; these
  * helpers centralize the parquet path convention so each query body
  * stays a pure plan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Idempotent: guarantees graft's native functions resolve in any
    // session a query runs in, not just our own entry points.
    GraftSession.registerFunctions(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  /** Event-time type conformance (SURVEY §1.4: DateTime → TimestampType),
    * enforced once at the read layer so watermark consumers can't be broken
    * by a fixture regeneration changing the physical parquet type:
    *  - parquet TIMESTAMP(NANOS) read as long nanos (under
    *    `spark.sql.legacy.parquet.nanosAsLong`) → TimestampType micros,
    *    truncating like DuckDB's ns→us cast;
    *  - TIMESTAMP_NTZ → TIMESTAMP — a pure type relabel under the UTC
    *    session (same micros value), required because `withWatermark`
    *    rejects NTZ event-time columns
    *    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE).
    */
  def normalizeEventTime(df: DataFrame, c: String): DataFrame =
    df.schema(c).dataType match {
      case LongType => df.withColumn(c, timestamp_micros(expr(s"`$c` div 1000")))
      case TimestampNTZType => df.withColumn(c, col(c).cast(TimestampType))
      case _ => df
    }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTime(load(s, d, "events"), "ts")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Fan a compressed-small but compute-heavy table out to full cluster
    * parallelism before a per-row kernel. A snappy-parquet text corpus
    * can be one input split (one row group) while its per-document CPU
    * cost is thousands of hashes — without this, the kernel runs on a
    * single core no matter how many executors exist. One cheap
    * round-robin shuffle of the raw rows; order-insensitive downstream.
    */
  def scatter(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}
