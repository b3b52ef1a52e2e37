package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark reads as long
    * nanos (under `spark.sql.legacy.parquet.nanosAsLong`); normalize to
    * TimestampType micros, truncating like DuckDB's ns→us cast.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
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
