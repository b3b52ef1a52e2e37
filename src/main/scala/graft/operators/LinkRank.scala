package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative link analysis (PageRank) in EXACT integer arithmetic — the
  * host-rank primitive of web-corpus curation (rank sources by the link
  * graph, weight sampling by rank). LLM-operator family (SURVEY §2.14).
  *
  * Ranks are picounits (BIGINT, `scale` = 1e12 mass total), every step
  * is integer floor arithmetic — `floor(rank / outdeg)` contributions,
  * `floor(sum × damping / 100)` mixing — so the fixed-point after any
  * number of iterations is bit-identical in any engine and any
  * evaluation order (integer sums are associative; no fp anywhere).
  * The deliberate floor "leakage" (sub-picounit remainders and
  * dangling-node mass) is part of the spec, not an accident: exactness
  * of the replay beats the ~1e-12 relative mass drift.
  *
  * Plan shape per iteration: the edge store is hash-partitioned on
  * `src` ONCE up front (the in-session equivalent of a table bucketed
  * by src) and pinned, so the edges ⋈ ranks join never exchanges the
  * edge side inside the loop — each checkpointed ranks frame likewise
  * carries its hash(node) partitioning through the alias to `src`, so
  * the only per-superstep shuffle is the contribution partial-agg
  * (groupBy dst). The join back to the static node table reuses both
  * sides' hash(node) partitioning. That is the Pregel superstep
  * expressed in joins — linear in |edges|, ONE |contributions|-sized
  * exchange per superstep, no driver-side adjacency. Iterations are a
  * fixed small constant (rank converges geometrically at `damping`),
  * so total cost is O(iterations × |edges|) with bounded shuffles.
  * LinkRankSpec audits the superstep's executed plan: zero Exchange
  * over the edge-store scan.
  */
object LinkRank {

  /** Executed physical plan of the most recent run's FIRST superstep —
    * the observable LinkRankSpec's plan audit reads (pageRank runs the
    * loop internally, so the plan is not otherwise reachable). */
  @volatile private[graft] var lastSuperstepPlan: String = ""

  /** Same superstep's executed [[org.apache.spark.sql.execution.SparkPlan]]
    * TREE — the spec walks typed nodes (ShuffleExchangeExec between the
    * join and the edge-store scan) instead of string slicing, which is
    * robust to plan-string formatting drift and AQE reuse nodes. */
  @volatile private[graft] var lastSuperstepExec:
    org.apache.spark.sql.execution.SparkPlan = null

  /** Integer PageRank over a directed edge list.
    *
    * @param edges  (srcCol, dstCol) — duplicate edges count twice
    *               (parallel-edge semantics; `.distinct()` upstream for
    *               simple-graph semantics)
    * @param stopL1 optional convergence stop: when ≥ 0, stop early once
    *               the integer L1 delta between consecutive supersteps
    *               is ≤ this threshold. At the default 0 the stop fires
    *               only at an EXACT integer fixed point — every further
    *               superstep would reproduce the same ranks, so the
    *               early result is bit-identical to any larger
    *               iteration budget (LinkRankSpec pins this); a
    *               positive threshold trades that exactness for fewer
    *               supersteps. Pass -1 to always run `iterations`.
    *               The check replaces the superstep's materializing
    *               count() with a join-and-sum against the previous
    *               pinned ranks — same shuffle count, one extra agg.
    * @return (node, rank) for every node appearing as src or dst,
    *         rank in picounits of total mass `scale`
    */
  def pageRank(spark: SparkSession, edges: DataFrame, srcCol: String,
      dstCol: String, iterations: Int, dampingPct: Int = 85,
      scale: Long = 1000000000000L, stopL1: Long = -1L,
      prePartitioned: Boolean = false): DataFrame =
    pageRankCounted(spark, edges, srcCol, dstCol, iterations, dampingPct,
      scale, stopL1, prePartitioned)._1

  /** [[pageRank]] plus the number of supersteps actually run — the
    * observable LinkRankSpec needs to prove the convergence stop fires.
    *
    * `prePartitioned=true` skips the session repartition on `src`: the
    * caller guarantees the edge input is ALREADY hash-clustered on the
    * source column (a `bucketBy(src)` warehouse table — the
    * train-once/serve-many edge store), so the up-front |edges| shuffle
    * would be pure waste; the persist still pins the scan for the loop.
    */
  private[graft] def pageRankCounted(spark: SparkSession, edges: DataFrame,
      srcCol: String, dstCol: String, iterations: Int, dampingPct: Int = 85,
      scale: Long = 1000000000000L, stopL1: Long = -1L,
      prePartitioned: Boolean = false): (DataFrame, Int) = {
    require(iterations >= 0 && dampingPct >= 0 && dampingPct <= 100)
    val shufN = spark.sessionState.conf.numShufflePartitions
    // Pin the edge list hash-partitioned on `src` (the join key of
    // every superstep): it feeds every superstep (plus nodes/outdeg) —
    // without the persist each iteration re-executes the caller's whole
    // upstream lineage (joins, distincts) from the scan, and without
    // the repartition each superstep's join re-shuffles the FULL edge
    // list (scan partitioning satisfies nothing). One |edges| shuffle
    // up front buys an exchange-free edge side for the whole loop —
    // the bucketed-edge-store pattern, in-session.
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val e = (if (prePartitioned) e0 else e0.repartition(shufN, col("src")))
      .persist()
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node"))).distinct()
    val outdeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("outdeg"))
    // Static per-node table (node, outdeg) — reused every superstep.
    val base = nodes.join(outdeg, Seq("node"), "left")
      .select(col("node"), coalesce(col("outdeg"), lit(0L)).as("outdeg"))
      .persist()
    rankLoop(spark, e, base, iterations, dampingPct, scale, stopL1)
  }

  /** The (node, outdeg) half of the PageRank index — what a bootstrap
    * job persists NEXT TO the bucketed edge store, so serve runs skip
    * the two full-edge-list shuffles (nodes distinct + degree groupBy)
    * that otherwise dominate steady-state cost. */
  def degreeTable(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node"))).distinct()
    val outdeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("outdeg"))
    nodes.join(outdeg, Seq("node"), "left")
      .select(col("node"), coalesce(col("outdeg"), lit(0L)).as("outdeg"))
  }

  /** Serve-path PageRank from a persisted index (bucketed edge store +
    * stored [[degreeTable]]): zero full-edge shuffles per serve. */
  def pageRankServed(spark: SparkSession, edges: DataFrame,
      degrees: DataFrame, srcCol: String, dstCol: String, iterations: Int,
      dampingPct: Int = 85, scale: Long = 1000000000000L,
      stopL1: Long = -1L, prePartitioned: Boolean = true): DataFrame = {
    require(iterations >= 0 && dampingPct >= 0 && dampingPct <= 100)
    val shufN = spark.sessionState.conf.numShufflePartitions
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val e = (if (prePartitioned) e0 else e0.repartition(shufN, col("src")))
      .persist()
    val base = degrees.select(col("node").cast("long").as("node"),
      col("outdeg").cast("long").as("outdeg")).persist()
    rankLoop(spark, e, base, iterations, dampingPct, scale, stopL1)._1
  }

  /** The superstep loop over an already-built pinned edge frame and
    * (node, outdeg) base table. [[degreeTable]]'s output qualifies as
    * `base` — the train-once/serve-many path stores BOTH tables
    * (the degree table is part of the trained index, exactly like IVF
    * centroids), so a serve run pays zero full-edge-list shuffles:
    * no distinct, no groupBy, and with a `bucketBy(src)` edge store no
    * repartition either. Unpersists `e` and `base` before returning.
    */
  private[graft] def rankLoop(spark: SparkSession,
      e: DataFrame, base: DataFrame, iterations: Int, dampingPct: Int,
      scale: Long, stopL1: Long): (DataFrame, Int) = {
    val n = base.count() // materializes the persist; N for the teleport term
    if (n == 0) { // empty graph: no nodes, no ranks (and no divide-by-zero)
      base.unpersist(); e.unpersist()
      return (base.select(col("node"), lit(0L).as("rank")), 0)
    }
    val r0 = scale / n
    val teleport = scale * (100L - dampingPct) / 100L / n
    var ranks = base.select(col("node"), col("outdeg"), lit(r0).as("rank"))
    // Handle to the RDD backing the CURRENT checkpointed ranks frame,
    // so superseded supersteps' MEMORY_AND_DISK blocks are freed
    // eagerly rather than whenever the ContextCleaner's GC-driven
    // sweep notices the frame is unreachable — at high iteration
    // counts on large graphs the lazy path can accumulate every
    // superstep's checkpoint until a driver GC happens to run.
    var ranksCp: Option[org.apache.spark.rdd.RDD[_]] = None
    // The checkpoint superseded in the PREVIOUS iteration, freed at the
    // TOP of the next one: deferring the free a full iteration makes
    // the hazard window explicit — while any iteration's body runs
    // (including its L1 read of the previous `ranks`), both the current
    // and the previous frames' blocks are still live, so no ordering
    // inside the body can observe missing checkpoint blocks. Cost: at
    // most two |nodes|-row frames persisted instead of one.
    var staleCp: Option[org.apache.spark.rdd.RDD[_]] = None
    def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
      df.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }
    var it = 0
    var converged = false
    while (it < iterations && !converged) {
      staleCp.foreach(_.unpersist(blocking = false))
      staleCp = None
      // `div`, not `/`: Spark's `/` on longs is DOUBLE division, whose
      // rounding can differ from integer floor at picounit magnitudes.
      val contrib = e.join(ranks.filter(col("outdeg") > 0)
            .select(col("node").as("src"),
              expr("rank div outdeg").as("c")),
          Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("c")).as("s"))
      // The Pregel discipline: localCheckpoint EXECUTES the superstep
      // and TRUNCATES its lineage to an RDD leaf. persist()+count()
      // materializes data but leaves the logical plan chaining every
      // prior superstep — plan size doubles per iteration and the
      // explain-string machinery OOMs near 25 supersteps (found by
      // LinkRankSpec's convergence case). Superseded checkpoint storage
      // is released by the ContextCleaner once the previous ranks frame
      // drops out of scope; each checkpoint is |nodes| rows of
      // (long, long, long), MEMORY_AND_DISK.
      val stepDf = base.join(contrib, Seq("node"), "left")
        .select(col("node"), col("outdeg"),
          (lit(teleport) +
            expr(s"(coalesce(s, 0L) * $dampingPct) div 100")).as("rank"))
      val next = stepDf.localCheckpoint(true)
      if (it == 0) { // AQE has finalized stepDf's plan by now (eager cp)
        lastSuperstepExec = stepDf.queryExecution.executedPlan
        lastSuperstepPlan = lastSuperstepExec.toString
      }
      if (stopL1 >= 0) {
        // integer L1 delta between consecutive supersteps: two cached
        // leaf frames, one join + one agg — fires only when enabled
        val l1 = next.join(
            ranks.select(col("node"), col("rank").as("__prev")), Seq("node"))
          .agg(sum(abs(col("rank") - col("__prev")))).head().getLong(0)
        if (l1 <= stopL1) converged = true
      }
      // `next` is fully materialized (eager checkpoint); the old
      // `ranks` frame is now superseded but stays live until the top of
      // the NEXT iteration — see `staleCp` above.
      staleCp = ranksCp
      ranksCp = checkpointRdd(next)
      ranks = next
      it += 1
    }
    // Pin and materialize the final ranks, then release the superstep
    // inputs. The returned DataFrame stays persisted — it is |nodes|
    // rows of (long, long), and the caller (e.g. a query wrapping it in
    // a scratch materialization or a single orderBy-and-write) consumes
    // it immediately; unpersisting here would re-run all supersteps
    // against the already-released base/e.
    val out = ranks.select(col("node"), col("rank")).persist()
    out.count()
    // `out` is materialized — the frame superseded in the final
    // iteration has no remaining reader; free it now.
    staleCp.foreach(_.unpersist(blocking = false))
    base.unpersist()
    e.unpersist()
    // The FINAL checkpoint is deliberately left to the ContextCleaner:
    // `out`'s cache recomputes from it on eviction, and its lineage is
    // truncated — freeing it here would make that recompute impossible.
    // Only the in-loop superseded checkpoints (never re-read) are freed
    // eagerly.
    (out, it)
  }
}
