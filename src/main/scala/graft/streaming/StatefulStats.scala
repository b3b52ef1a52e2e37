package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Custom streaming state via `KeyValueGroupedDataset.mapGroupsWithState`
  * (SURVEY §2.11): per-key running stats that survive across
  * micro-batches — the streaming twin of the reference's incremental
  * watermark loads (/root/reference/tasks/merge/stock.py:94-97), where
  * each run folds only the NEW rows into a persistent per-key summary
  * instead of recomputing from scratch.
  *
  * Scale shape: state is O(1) per key (five scalars), so the state store
  * holds |keys| tiny entries regardless of event volume; each
  * micro-batch shuffles only its own rows, once, on the key. The sum
  * accumulates as exact decimal so a replayed stream is byte-identical
  * to the batch oracle (doubles would drift with fold order).
  */
object StatefulStats {
  case class Ev(user_id: Long, event_id: Long, value: Double)

  case class UserState(nEvents: Long, sumV: BigDecimal,
      minV: Double, maxV: Double, nUpdates: Int)

  case class UserStats(user_id: Long, n_events: Long, sum_value: Double,
      min_value: Double, max_value: Double, n_updates: Int)

  private def update(uid: Long, it: Iterator[Ev],
      st: GroupState[UserState]): UserStats = {
    val prev = st.getOption.getOrElse(
      UserState(0L, BigDecimal(0), Double.MaxValue, Double.MinValue, 0))
    var n = prev.nEvents
    var sum = prev.sumV
    var mn = prev.minV
    var mx = prev.maxV
    it.foreach { e =>
      n += 1
      sum += BigDecimal.valueOf(e.value)
      if (e.value < mn) mn = e.value
      if (e.value > mx) mx = e.value
    }
    val next = UserState(n, sum, mn, mx, prev.nUpdates + 1)
    st.update(next)
    UserStats(uid, n, sum.toDouble, mn, mx, next.nUpdates)
  }

  /** `events` needs (user_id, event_id, value). Emits one refreshed
    * summary row per (key, micro-batch that touched it); sink must run
    * in Update output mode. `n_updates` counts the micro-batches that
    * touched the key — the observable proof the state carried over.
    */
  def runningUserStats(spark: SparkSession, events: DataFrame): Dataset[UserStats] = {
    import spark.implicits._
    events.selectExpr("user_id", "event_id", "value").as[Ev]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update _)
  }
}
