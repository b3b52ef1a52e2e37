package graft.streaming

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

import scala.jdk.CollectionConverters._

/** Liveness heartbeat for long-running streaming jobs — the engine
  * mapping of the reference's `heart_beat` one-row table plus its
  * 1800 s daemon-touch thread
  * (/root/reference/tasks/backend/orm.py:58-91), which an external
  * monitor polls to detect a dead pipeline.
  *
  * Spark already emits a progress event per micro-batch, so the
  * Spark-first shape is a [[StreamingQueryListener]] that folds those
  * events into one liveness row per query — no extra thread, no timer:
  * a query whose row stops advancing IS the dead-pipeline signal. The
  * listener state is a handful of scalars per active query (driver-side
  * model state, like the k-means centroids), so it costs nothing at any
  * corpus scale.
  *
  * [[Heartbeat.snapshot]] exposes the rows as a DataFrame for a
  * monitoring sink (e.g. a keyed upsert into a `heartbeats` table —
  * exactly the reference's table, but per query instead of global);
  * [[Heartbeat.stale]] answers the monitor's question directly.
  */
final class Heartbeat extends StreamingQueryListener {
  import Heartbeat.Beat

  private val beats = new ConcurrentHashMap[UUID, Beat]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
    beats.put(e.id, Beat(e.id.toString, Option(e.name).getOrElse(""),
      "started", batch_id = -1L, n_beats = 0L, input_rows = 0L,
      last_beat_ms = System.currentTimeMillis()))

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    beats.compute(p.id, (_, prev) => {
      val (n0, rows0) = if (prev == null) (0L, 0L) else (prev.n_beats, prev.input_rows)
      Beat(p.id.toString, Option(p.name).getOrElse(""), "running",
        batch_id = p.batchId, n_beats = n0 + 1,
        input_rows = rows0 + p.numInputRows,
        last_beat_ms = System.currentTimeMillis())
    })
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    beats.compute(e.id, (_, prev) => {
      val base = if (prev == null)
        Beat(e.id.toString, "", "terminated", -1L, 0L, 0L, 0L)
      else prev
      base.copy(status = "terminated", last_beat_ms = System.currentTimeMillis())
    })

  /** Current liveness rows (live and terminated queries) as a
    * DataFrame, for writing to a monitoring sink. */
  def snapshot(spark: SparkSession): DataFrame = {
    import spark.implicits._
    beats.values.asScala.toSeq.toDF()
  }

  /** Queries whose heartbeat is older than `maxAgeMs` and that have not
    * terminated cleanly — the dead-pipeline alarm. */
  def stale(maxAgeMs: Long, nowMs: Long = System.currentTimeMillis()): Seq[Beat] =
    beats.values.asScala
      .filter(b => b.status != "terminated" && nowMs - b.last_beat_ms > maxAgeMs)
      .toSeq

  /** Block until the named query's beat reaches `status` (listener
    * delivery is async — after `query.stop()` the terminated event is
    * still in flight). The streaming bus delivers in order, so once the
    * terminal status is visible every earlier progress event has been
    * folded in and `input_rows` is final. */
  def awaitStatus(name: String, status: String, timeoutMs: Long): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < deadline) {
      if (beats.values.asScala.exists(b => b.name == name && b.status == status))
        return true
      Thread.sleep(20)
    }
    false
  }
}

object Heartbeat {
  /** One liveness row per streaming query. `n_beats` counts delivered
    * progress events (micro-batches observed), `input_rows` accumulates
    * their row counts, `last_beat_ms` is the wall-clock of the latest
    * event — the reference's `update_dt`. */
  case class Beat(query_id: String, name: String, status: String,
      batch_id: Long, n_beats: Long, input_rows: Long, last_beat_ms: Long)

  /** Attach a fresh listener to the session's streaming bus. */
  def attach(spark: SparkSession): Heartbeat = {
    val h = new Heartbeat
    spark.streams.addListener(h)
    h
  }

  def detach(spark: SparkSession, h: Heartbeat): Unit =
    spark.streams.removeListener(h)
}
