package graft

import graft.operators.LinkRank
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed integer-PageRank fixtures: the exact floor arithmetic,
  * dangling-node behavior, and parallel-edge semantics. */
class LinkRankSpec extends AnyFunSuite with SharedSpark {

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    import spark.implicits._
    LinkRank.pageRank(spark, edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("one iteration on a 3-cycle is exactly the hand arithmetic") {
    // N=3, scale=1e12: r0 = 333333333333, teleport = 150000000000/3 = 50000000000
    // each node receives exactly one contribution = r0 div 1 = r0
    // r1 = 50000000000 + (333333333333 * 85) div 100 = 50000000000 + 283333333333
    val r = ranks(Seq((1L, 2L), (2L, 3L), (3L, 1L)), 1)
    assert(r === Map(1L -> 333333333333L, 2L -> 333333333333L, 3L -> 333333333333L)
      .map { case (k, _) => k -> (50000000000L + 283333333333L) })
  }

  test("star graph: the hub collects, leaves keep teleport mass only") {
    // 1→2, 3→2, 4→2 ; N=4, r0 = 250000000000, teleport = 37500000000
    // hub 2 gets 3 × (r0 div 1) = 750000000000 → 37500000000 + 637500000000
    // leaves get no contributions → teleport only; hub dangles (outdeg 0)
    val r = ranks(Seq((1L, 2L), (3L, 2L), (4L, 2L)), 1)
    assert(r(2L) === 37500000000L + 750000000000L * 85L / 100L)
    assert(r(1L) === 37500000000L && r(3L) === 37500000000L && r(4L) === 37500000000L)
  }

  test("second iteration drops the dangled hub mass (documented leakage)") {
    val r1 = ranks(Seq((1L, 2L), (3L, 2L), (4L, 2L)), 1)
    val r2 = ranks(Seq((1L, 2L), (3L, 2L), (4L, 2L)), 2)
    // hub had no out-edges: its iteration-1 mass is not redistributed
    assert(r2(2L) === 37500000000L + 3L * (37500000000L * 85L / 100L))
    assert(r2.values.sum < r1.values.sum)
  }

  test("parallel edges count twice (duplicate-edge semantics)") {
    // 1→2 twice and 1→3 once: outdeg(1)=3, node 2 receives 2 shares
    val r = ranks(Seq((1L, 2L), (1L, 2L), (1L, 3L)), 1)
    val share = 333333333333L / 3L
    assert(r(2L) === 50000000000L + 2L * share * 85L / 100L)
    assert(r(3L) === 50000000000L + share * 85L / 100L)
  }

  test("convergence stop at an exact integer fixed point equals the full budget") {
    import spark.implicits._
    // 2-cycle: uniform mass IS the fixed point, reached at superstep 1 —
    // the stop must fire there and the early result must be
    // bit-identical to the full 25-iteration run.
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val (early, itersRun) = LinkRank.pageRankCounted(
      spark, cyc, "src", "dst", iterations = 25, stopL1 = 0L)
    assert(itersRun < 25, "stop never fired on a fixed-point graph")
    val full = LinkRank.pageRank(spark, cyc, "src", "dst", iterations = 25)
    val e = early.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val f = full.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(e === f, "early-stopped ranks diverge from the full budget")
    // asymmetric graph, stop enabled but NOT yet converged: results must
    // still equal the plain run at the same budget (delta check is
    // observe-only until it hits zero)
    val g = Seq((1L, 2L), (1L, 3L), (3L, 2L), (2L, 1L)).toDF("src", "dst")
    val (a, _) = LinkRank.pageRankCounted(spark, g, "src", "dst", 4, stopL1 = 0L)
    val b = LinkRank.pageRank(spark, g, "src", "dst", 4)
    assert(a.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      === b.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq)
  }

  test("superstep plan: edge store is exchange-free inside the loop") {
    import spark.implicits._
    // big enough that AQE does not broadcast the ranks side (which
    // would trivially satisfy the audit); the point is the SHUFFLE
    // join path the operator takes at scale.
    val edges = (1 to 50000).map(i => (i.toLong % 4096, (i * 7L) % 4099))
      .toDF("src", "dst")
    LinkRank.pageRank(spark, edges, "src", "dst", 2)
    val root = LinkRank.lastSuperstepExec
    assert(root != null, "superstep plan was not captured")
    // Walk the executed plan TREE (not its string form): find the path
    // from the root down to the edge-store InMemoryTableScan and assert
    // no shuffle node sits between the nearest enclosing join and that
    // scan. Typed matching is robust to plan-string formatting drift
    // and to AQE wrapper nodes (query stages, ReusedExchange,
    // AQEShuffleRead), which the old line-slicing heuristic was not.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    def kids(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    def pathToEdgeScan(p: SparkPlan): Option[List[SparkPlan]] = p match {
      case s: InMemoryTableScanExec
          if Seq("src", "dst").forall(n => s.output.exists(_.name == n)) &&
             s.output.length == 2 =>
        Some(List(p))
      case _ =>
        kids(p).view.flatMap(pathToEdgeScan).headOption.map(p :: _)
    }
    val path = pathToEdgeScan(root)
      .getOrElse(fail(s"edge-store scan (src,dst) not found in plan:\n$root"))
    val joinIdx = path.lastIndexWhere(_.isInstanceOf[BaseJoinExec])
    assert(joinIdx >= 0, s"no join above the edge-store scan:\n$root")
    val between = path.drop(joinIdx + 1)
    val shuffles = between.filter(n =>
      n.isInstanceOf[ShuffleExchangeLike] || n.isInstanceOf[AQEShuffleReadExec])
    assert(shuffles.isEmpty,
      s"edge side re-shuffles inside the loop (${shuffles.map(_.nodeName)}):\n$root")
  }

  test("prePartitioned serve from a bucketed edge store: same ranks, zero edge shuffle") {
    import spark.implicits._
    // the a18_rank_served shape: bucketBy(src) warehouse table, then
    // prePartitioned=true ranks straight off the bucketed scan
    spark.sql("DROP TABLE IF EXISTS graft_edges_bkt_spec")
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val whFs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    whFs.delete(new org.apache.hadoop.fs.Path(wh, "graft_edges_bkt_spec"), true)
    val edges = (1 to 50000).map(i => (i.toLong % 4096, (i * 7L) % 4099))
      .toDF("src", "dst")
    edges.write.mode("overwrite").bucketBy(8, "src")
      .saveAsTable("graft_edges_bkt_spec")
    val direct = LinkRank.pageRank(spark, edges, "src", "dst", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the full index: bucketed edges + stored degree table
    val degrees = LinkRank.degreeTable(edges, "src", "dst")
    val served = LinkRank.pageRankServed(spark,
        spark.table("graft_edges_bkt_spec"), degrees, "src", "dst", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(served === direct, "served ranks diverge from the direct build")
    // the serve plan must contain NO shuffle anywhere at or below the
    // edge-store scan path: the bucket layout replaces the session
    // repartition entirely
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    def kids(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    def pathToEdgeScan(p: SparkPlan): Option[List[SparkPlan]] = p match {
      case s: InMemoryTableScanExec
          if Seq("src", "dst").forall(n => s.output.exists(_.name == n)) &&
             s.output.length == 2 =>
        Some(List(p))
      case _ =>
        kids(p).view.flatMap(pathToEdgeScan).headOption.map(p :: _)
    }
    val root = LinkRank.lastSuperstepExec
    val path = pathToEdgeScan(root)
      .getOrElse(fail(s"edge-store scan not found:\n$root"))
    val joinIdx = path.lastIndexWhere(_.isInstanceOf[BaseJoinExec])
    assert(joinIdx >= 0)
    val between = path.drop(joinIdx + 1)
    assert(!between.exists(n => n.isInstanceOf[ShuffleExchangeLike] ||
      n.isInstanceOf[AQEShuffleReadExec]),
      s"bucketed edge side still shuffles:\n$root")
  }
}
