package graft

import graft.streaming.Heartbeat
import org.scalatest.funsuite.AnyFunSuite

/** The heart_beat mapping (SURVEY §1.4 ops/metadata →
  * StreamingQueryListener): liveness rows must appear on start, advance
  * across micro-batches, and mark termination — the observable contract
  * an external monitor polls.
  */
class HeartbeatSpec extends AnyFunSuite with SharedSpark {

  private def drainBus(): Unit =
    org.apache.spark.ListenerBusAccess.waitUntilEmpty(spark.sparkContext, 10000)

  test("heartbeat rows advance across micro-batches and mark termination") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val hb = Heartbeat.attach(spark)
    val in = MemoryStream[(Long, Double)]
    val q = in.toDF().toDF("k", "v")
      .groupBy($"k").count()
      .writeStream.outputMode("update").format("memory")
      .queryName("hb_test").start()
    try {
      in.addData((1L, 1.0), (2L, 2.0))
      q.processAllAvailable()
      drainBus()
      val afterOne = hb.snapshot(spark)
        .filter($"name" === "hb_test").collect()
      assert(afterOne.length == 1, "exactly one liveness row per query")
      val b1 = afterOne.head
      assert(b1.getAs[String]("status") == "running")
      val beats1 = b1.getAs[Long]("n_beats")
      val rows1 = b1.getAs[Long]("input_rows")
      assert(beats1 >= 1L && rows1 == 2L)

      in.addData((3L, 3.0))
      q.processAllAvailable()
      drainBus()
      val b2 = hb.snapshot(spark).filter($"name" === "hb_test").collect().head
      assert(b2.getAs[Long]("n_beats") > beats1,
        "progress events must keep advancing the heartbeat")
      assert(b2.getAs[Long]("input_rows") == 3L)
      assert(b2.getAs[Long]("batch_id") >= b1.getAs[Long]("batch_id"))

      // a live query is not stale against a generous window, and is
      // stale against an instant one (the monitor's alarm predicate)
      assert(hb.stale(maxAgeMs = 60 * 60 * 1000L).isEmpty)
      assert(hb.stale(maxAgeMs = -1L).exists(_.name == "hb_test"))
    } finally {
      q.stop()
      drainBus()
    }
    val after = hb.stale(maxAgeMs = -1L)
    assert(!after.exists(_.name == "hb_test"),
      "terminated queries must leave the stale-alarm set")
    assert(hb.snapshot(spark).filter($"name" === "hb_test")
      .collect().head.getAs[String]("status") == "terminated")
    Heartbeat.detach(spark, hb)
  }
}
