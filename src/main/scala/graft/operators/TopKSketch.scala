package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Grouped heavy-hitters (frequent items) via a bounded-memory
  * space-saving sketch (Metwally, Agrawal, El Abbadi, "Efficient
  * Computation of Frequent and Top-k Elements in Data Streams",
  * ICDT 2005) with a Misra–Gries-style trim at the merge — the sketch
  * the CMS/HLL/Bloom family in [[CorpusStats]]/[[Sketches]] is missing:
  * CMS answers "how often is THIS token", HLL answers "how many
  * distinct", this answers "WHICH tokens dominate" without a full
  * vocabulary groupBy.
  *
  * Shape: one map-only pass builds a capacity-bounded summary PER
  * PARTITION (imperative hash map inside `mapPartitions`, no per-row
  * allocation), then ONE shuffle moves only sketch-sized partials
  * (≤ capacity rows × partitions per group) to a per-group merge. At
  * 100 TB the exchange volume is independent of corpus size — that is
  * the whole point versus `groupBy(token).count()`, whose shuffle
  * carries the full vocabulary.
  *
  * Determinism/accuracy contract:
  *  - EXACT REGIME — when every group's true distinct-token count is
  *    ≤ capacity, no eviction or trim ever fires, counts are exact and
  *    the result is partition-order independent (the correctness oracle
  *    runs here: an exact SQL top-k replays it).
  *  - APPROX REGIME — counts are within N_group/capacity of the truth
  *    (space-saving overestimates per shard, the merge trim subtracts
  *    the (capacity+1)-th count), which the property spec pins; ties at
  *    the k-boundary break by (count desc, token asc).
  */
object TopKSketch {

  /** Per-group top-k frequent tokens. Output:
    * (group, token, cnt, rank) with rank 1..k by (cnt desc, token asc).
    */
  def topK(df: DataFrame, groupCol: Column, tokenCol: Column,
      capacity: Int, k: Int): DataFrame = {
    require(k >= 1 && k <= capacity, s"k=$k must be in 1..capacity")
    val spark = df.sparkSession
    import spark.implicits._
    partialSketches(df, groupCol, tokenCol, capacity)
      .groupByKey(_._1)
      .flatMapGroups { (g, rows) =>
        mergeAndTrim(rows.map { case (_, t, c) => (t, c) }, capacity)
          .take(k).iterator.zipWithIndex
          .map { case ((t, c), i) => (g, t, c, (i + 1).toLong) }
      }
      .toDF("group", "token", "cnt", "rank")
  }

  /** The full capacity-bounded sketch per group — (group, token, cnt)
    * rows, the mergeable partial a streaming fold persists (rank/top-k
    * presentation is [[topK]]'s job).
    */
  def sketch(df: DataFrame, groupCol: Column, tokenCol: Column,
      capacity: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    partialSketches(df, groupCol, tokenCol, capacity)
      .groupByKey(_._1)
      .flatMapGroups { (g, rows) =>
        mergeAndTrim(rows.map { case (_, t, c) => (t, c) }, capacity)
          .iterator.map { case (t, c) => (g, t, c) }
      }
      .toDF("group", "token", "cnt")
  }

  /** Map-only per-partition space-saving sketches: the only rows that
    * ever reach an exchange (≤ capacity per group per partition).
    */
  private def partialSketches(df: DataFrame, groupCol: Column,
      tokenCol: Column, capacity: Int):
      org.apache.spark.sql.Dataset[(String, String, Long)] = {
    require(capacity >= 1 && capacity <= (1 << 22),
      s"capacity=$capacity out of the executor-memory-safe range")
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = df.select(groupCol.cast("string").as("g"),
      tokenCol.cast("string").as("tok")).as[(String, String)]
    // Memory contract: one capacity-bounded map PER DISTINCT GROUP per
    // partition — the group column must be model-sized (event types,
    // languages, shards), like `capacity` itself. A high-cardinality
    // group column (user ids, doc ids) would grow groups × capacity
    // entries per task and OOM executors far from the allocation site;
    // fail fast here with the actionable name instead. 2^16 groups ×
    // the capacity ceiling is still executor-safe; a legitimate use
    // beyond that wants a plain groupBy, not a sketch. NOTE the bound
    // is PER PARTITION — it is a task-memory guard, which is the
    // resource actually at risk; a group axis hash-spread across tasks
    // can pass with up to 2^16 × numPartitions distinct values
    // globally. That violates the spirit of "model-sized" without
    // endangering any single executor; the merged (g, tok) aggregate
    // downstream is the place a global assert would go if a caller
    // needs the stricter contract.
    val maxGroupsPerPartition = 1 << 16
    pairs.mapPartitions { it =>
      val sketches = mutable.HashMap.empty[String, mutable.HashMap[String, Long]]
      it.foreach { case (g, t) =>
        if (g != null && t != null) {
          val m = sketches.getOrElseUpdate(g, {
            require(sketches.size < maxGroupsPerPartition,
              s"TopKSketch group column exceeds $maxGroupsPerPartition distinct " +
                "values in one partition — the sketch contract is a model-sized " +
                "group axis (see scaladoc); use a plain aggregation for " +
                "high-cardinality grouping")
            mutable.HashMap.empty
          })
          m.get(t) match {
            case Some(c) => m.update(t, c + 1)
            case None if m.size < capacity => m.update(t, 1L)
            case None =>
              // Space-saving eviction: displace a minimum-count entry
              // (deterministic victim: smallest count, then largest
              // token, so frequent-and-early survives) and inherit its
              // count as the overestimate ceiling.
              var victim: String = null
              var vc = Long.MaxValue
              m.foreach { case (tok, c) =>
                if (c < vc || (c == vc && (victim == null || tok > victim))) {
                  victim = tok; vc = c
                }
              }
              m.remove(victim)
              m.update(t, vc + 1)
          }
        }
      }
      sketches.iterator.flatMap { case (g, m) =>
        m.iterator.map { case (t, c) => (g, t, c) }
      }
    }
  }

  /** Sum partial counts and apply the Misra–Gries merge trim: if the
    * union overflows capacity, subtract the (capacity+1)-th largest
    * count from everything and drop the non-positives — keeps the
    * additive error bound. Returned ordered by (cnt desc, token asc).
    */
  private def mergeAndTrim(rows: Iterator[(String, Long)],
      capacity: Int): Seq[(String, Long)] = {
    val m = mutable.HashMap.empty[String, Long]
    rows.foreach { case (t, c) => m.update(t, m.getOrElse(t, 0L) + c) }
    val summed =
      if (m.size <= capacity) m.toSeq
      else {
        val sorted = m.toSeq.sortBy { case (t, c) => (-c, t) }
        val thresh = sorted(capacity)._2
        sorted.iterator.map { case (t, c) => (t, c - thresh) }
          .filter(_._2 > 0).toSeq
      }
    summed.sortBy { case (t, c) => (-c, t) }
  }

  /** Merge a table of sketch PARTIALS — (group, token, cnt) rows from
    * earlier [[topK]]/stream batches or a persisted store — into one
    * capacity-bounded sketch per group. This is the streaming-upkeep
    * fold: `store ← mergePartials(store ∪ batch_partials)`; counts are
    * additive in the exact regime, Misra–Gries-trimmed past capacity.
    */
  def mergePartials(partials: DataFrame, groupCol: Column, tokenCol: Column,
      cntCol: Column, capacity: Int): DataFrame = {
    val spark = partials.sparkSession
    import spark.implicits._
    partials.select(groupCol.cast("string").as("g"),
        tokenCol.cast("string").as("tok"), cntCol.cast("long").as("c"))
      // same null contract as the map-side builder: null groups/tokens
      // are dropped, not crashed on (a null token would NPE the trim's
      // string sort) and not counted differently from topK's path
      .filter(col("g").isNotNull && col("tok").isNotNull)
      .as[(String, String, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (g, rows) =>
        mergeAndTrim(rows.map { case (_, t, c) => (t, c) }, capacity)
          .iterator.map { case (t, c) => (g, t, c) }
      }
      .toDF("group", "token", "cnt")
  }

  /** Convenience overload keeping the group column's original name. */
  def topK(df: DataFrame, groupName: String, tokenCol: Column,
      capacity: Int, k: Int): DataFrame =
    topK(df, col(groupName), tokenCol, capacity, k)
      .withColumnRenamed("group", groupName)
}
