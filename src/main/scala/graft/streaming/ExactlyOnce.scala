package graft.streaming

import graft.core.{TableSpec, TableStore}

/** Exactly-once folds over an at-least-once sink callback.
  *
  * Structured Streaming's `foreachBatch` replays a micro-batch when the
  * run crashes AFTER the callback's side effect but BEFORE the engine
  * commits the batch to the checkpoint (the reference hit the same
  * window with its INSERT..ON DUPLICATE re-runs,
  * /root/reference/tasks/backend/__init__.py:18-19). A PK upsert absorbs
  * the replay for free, but a READ-MODIFY-WRITE fold (`store ← store ⊕
  * batch`) does not: a replayed batch folds its contribution in twice
  * unless `⊕` is idempotent (register-wise max is; a sum or count merge
  * is NOT).
  *
  * The standard fix is transactional: record the applied `batchId`
  * ATOMICALLY with the fold's data commit, and no-op any batch at or
  * below the recorded id. [[TableStore]] commits are a single manifest
  * rename, so the marker rides the same commit via manifest props —
  * there is no state in which the rows landed but the marker didn't, or
  * vice versa.
  *
  * Usage inside `foreachBatch { (batch, batchId) => ... }`:
  * {{{
  *   if (!ExactlyOnce.alreadyApplied(store, spec, batchId) && !batch.isEmpty) {
  *     val merged = ...fold batch into store.read(spec)...
  *     store.upsert(spec, merged, props = ExactlyOnce.applied(batchId))
  *   }
  * }}}
  *
  * Correctness relies on two engine guarantees: a replayed batch keeps
  * its original `batchId`, and batch ids are assigned in monotonically
  * increasing order per checkpoint — so `recorded >= batchId` identifies
  * exactly the replays. One writer per store (the TableStore contract).
  * An EMPTY replayed batch skips the fold without advancing the marker,
  * which is equally a no-op.
  */
object ExactlyOnce {

  /** Manifest-prop key holding the last applied micro-batch id. */
  val BatchIdProp = "graft.appliedBatchId"

  /** Props to pass to the store mutation that applies `batchId`. */
  def applied(batchId: Long): Map[String, String] =
    Map(BatchIdProp -> batchId.toString)

  /** True iff `batchId`'s fold already committed — i.e. this callback
    * invocation is an at-least-once replay and must no-op.
    */
  def alreadyApplied(store: TableStore, spec: TableSpec, batchId: Long): Boolean =
    store.exists(spec) &&
      store.props(spec).get(BatchIdProp).exists(_.toLong >= batchId)
}
