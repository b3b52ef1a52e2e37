package graft.tools

/** Prints the query/oracle board — coverage bookkeeping helper. */
object Board {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"QCOUNT queries=${q.size} oracles=${o.size}")
    println("noOracle=" + (q -- o).toSeq.sorted.mkString(","))
    println("orphan=" + (o -- q).toSeq.sorted.mkString(","))
    println("all=" + q.toSeq.sorted.mkString(","))
  }
}
