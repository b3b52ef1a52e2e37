package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main for the a18 train-once/serve-many split: times the
  * edge-store BOOTSTRAP (orders⋈lineitem distinct → bucketBy(src)
  * warehouse write) separately from the steady-state SERVE (PageRank
  * straight off the bucketed scan, prePartitioned) — the number the
  * daily operation pays after the store exists.
  *
  * Usage: runMain graft.tools.RankServeProfile [sfDir [serveRuns]]
  */
object RankServeProfile {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val serveRuns = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = graft.core.GraftSession.registerFunctions(
      graft.core.GraftSession.configure(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt
      ).getOrCreate())
    s.sparkContext.setLogLevel("WARN")
    val wh = new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir"))
    val whFs = wh.getFileSystem(s.sparkContext.hadoopConfiguration)
    Seq("graft_edges_bkt_prof", "graft_degrees_prof").foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $t")
      whFs.delete(new org.apache.hadoop.fs.Path(wh, t), true)
    }

    val t0 = System.nanoTime()
    val o = graft.core.Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
    val l = graft.core.Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
    val rel = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"),
        (col("l_suppkey") + 2000000L).as("supp")).distinct()
    val edges = rel.select(col("cust").as("src"), col("supp").as("dst"))
      .unionAll(rel.select(col("supp").as("src"), col("cust").as("dst")))
      .persist()
    edges.write.mode("overwrite").bucketBy(32, "src")
      .saveAsTable("graft_edges_bkt_prof")
    graft.operators.LinkRank.degreeTable(edges, "src", "dst")
      .write.mode("overwrite").saveAsTable("graft_degrees_prof")
    edges.unpersist()
    val tBuild = (System.nanoTime() - t0) / 1e9
    val nEdges = s.table("graft_edges_bkt_prof").count()
    println(f"[rankserve] $d bootstrap=$tBuild%.2f s edges=$nEdges")

    for (i <- 1 to serveRuns) {
      val t1 = System.nanoTime()
      val ranks = graft.operators.LinkRank.pageRankServed(
        s, s.table("graft_edges_bkt_prof"), s.table("graft_degrees_prof"),
        "src", "dst", iterations = 3)
      ranks.write.format("noop").mode("overwrite").save()
      val tServe = (System.nanoTime() - t1) / 1e9
      println(f"[rankserve] serve run $i: $tServe%.2f s (${ranks.count()} nodes)")
      ranks.unpersist()
    }
    s.stop()
  }
}
