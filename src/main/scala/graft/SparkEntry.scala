package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented SURVEY §2 operator (plus the
  * LLM-pipeline operators) to a runnable plan on the driver testdata;
  * `oracleSql` carries the DuckDB-equivalent SQL for the hash-compare
  * correctness gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("a1_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ TextQueries.queries ++ DomainQueries.queries ++
      MoreQueries.queries ++ CorpusQueries.queries ++ QualityQueries.queries ++
      RiskQueries.queries

  def oracleSql: Map[String, String] =
    RelationalOracles.oracleSql ++ TextQueries.oracleSql ++ DomainQueries.oracleSql ++
      MoreQueries.oracleSql ++ CorpusQueries.oracleSql ++ QualityQueries.oracleSql ++
      RiskQueries.oracleSql
}
