package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite
import graft.streaming.StatefulOps.DeviceEvent

/** transformWithState (Spark 4 StatefulProcessor): the ValueState must
  * carry totals ACROSS micro-batches and emit exactly one row per key per
  * batch — the property the s18 oracle gates end-to-end on files, pinned
  * here on MemoryStream batches. */
class StatefulOpsSpec extends AnyFunSuite with Matchers with SparkSuite {

  test("runningTotals: state accumulates across micro-batches per key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.get(providerKey,
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[DeviceEvent]
    val q = StatefulOps.runningTotals(in.toDS())
      .toDF().writeStream.format("memory").queryName("tws_totals")
      .outputMode("append").start()
    try {
      in.addData(DeviceEvent("a", 3L), DeviceEvent("a", 4L), DeviceEvent("b", 10L))
      q.processAllAvailable()
      in.addData(DeviceEvent("a", 5L))
      q.processAllAvailable()
      in.addData(DeviceEvent("b", 1L), DeviceEvent("b", 2L))
      q.processAllAvailable()
      val rows = spark.table("tws_totals").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      rows shouldBe Set(
        ("a", 1L, 2L, 7L), // batch 1: two events, sum 7
        ("b", 1L, 1L, 10L),
        ("a", 2L, 3L, 12L), // batch 2 folds onto batch-1 state
        ("b", 2L, 3L, 13L)) // b absent from batch 2: still batch_seq 2
    } finally {
      q.stop()
      spark.conf.set(providerKey, prevProvider)
    }
  }

  test("sessionTimeouts: timer fires only once the watermark proves the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.get(providerKey,
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val T0 = 1700000000000L
    def ev(k: String, v: Long, ms: Long) =
      StatefulOps.TimedEvent(k, v, new java.sql.Timestamp(ms))
    val in = MemoryStream[StatefulOps.TimedEvent]
    val closed = StatefulOps.sessionTimeouts(
      in.toDS().withWatermark("event_time", "1 minute")
        .as[StatefulOps.TimedEvent],
      gapMs = 5 * 60000L)
    val q = closed.toDF().writeStream.format("memory").queryName("tws_sessions")
      .outputMode("append").start()
    try {
      in.addData(ev("a", 3L, T0), ev("a", 4L, T0 + 60000L))
      q.processAllAvailable()
      // watermark still behind a's timer (T0+1min+5min): nothing closes
      spark.table("tws_sessions").count() shouldBe 0

      // one event an hour later drives the watermark past the alarm
      in.addData(ev("z", 0L, T0 + 3600000L))
      q.processAllAvailable()
      val rows = spark.table("tws_sessions").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      rows.toSet shouldBe Set(("a", 2L, 7L, T0 + 60000L))
    } finally {
      q.stop()
      spark.conf.set(providerKey, prevProvider)
    }
  }
}
