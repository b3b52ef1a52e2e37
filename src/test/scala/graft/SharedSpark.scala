package graft

import graft.core.GraftSession
import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (getOrCreate → same JVM). */
trait SharedSpark {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")
}
