package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Spark 4's arbitrary-state streaming API (`transformWithState` with a
  * `StatefulProcessor`) — the successor to `flatMapGroupsWithState` that
  * the rest of this repo's custom streaming state uses (StreamOps.scala).
  * Where the reference keeps per-key mutable consumer state in heap maps
  * guarded by manual ack (`wifi-scan-ingestion/wifi-scan-queue-consumer`,
  * per-batch counters in the listener), the Spark-4-native shape is a
  * typed processor over a RocksDB-backed keyed state store: named state
  * variables with their own encoders and TTL, checkpointed per batch,
  * rescalable with shuffle partitions.
  *
  * `RunningTotalsProcessor` is the canonical per-key accumulator: a single
  * `ValueState` carrying (batches, events, sum), folded once per micro-
  * batch per key, emitting the running totals as of that batch. State size
  * is O(keys) — 24 bytes of payload per device regardless of event volume,
  * so a 100 TB stream with millions of devices carries megabytes of state
  * per partition; throughput is bounded by the shuffle into the keyed
  * store, not by state growth.
  */
object StatefulOps {

  final case class DeviceEvent(device_id: String, value: Long)

  final case class DeviceRunning(
      device_id: String,
      batch_seq: Long,
      n_events: Long,
      running_sum: Long)

  /** (batches seen, events seen, value sum) for one device. */
  final case class CounterState(batches: Long, events: Long, sum: Long)

  /** Emits one row per key per micro-batch containing the post-batch
    * running totals. TimeMode.None: no timers — pure data-driven folds
    * (the relocation detector in StreamOps covers the timer-ish shapes via
    * watermarks; this operator demonstrates the state-variable API). */
  final class RunningTotalsProcessor
      extends StatefulProcessor[String, DeviceEvent, DeviceRunning] {

    @transient private var totals: ValueState[CounterState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[CounterState](
        "totals", Encoders.product[CounterState], TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[DeviceEvent],
        timerValues: TimerValues): Iterator[DeviceRunning] = {
      val prev = if (totals.exists()) totals.get() else CounterState(0L, 0L, 0L)
      var n = 0L
      var sum = 0L
      rows.foreach { e => n += 1; sum += e.value }
      val next = CounterState(prev.batches + 1, prev.events + n, prev.sum + sum)
      totals.update(next)
      Iterator.single(DeviceRunning(key, next.batches, next.events, next.sum))
    }
  }

  /** Wire the processor onto a stream of (device_id, value) events. */
  def runningTotals(events: Dataset[DeviceEvent]): Dataset[DeviceRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.device_id)
      .transformWithState(
        new RunningTotalsProcessor,
        TimeMode.None(),
        OutputMode.Append())
  }

  final case class TimedEvent(
      device_id: String,
      value: Long,
      event_time: java.sql.Timestamp)

  final case class ClosedSession(
      device_id: String,
      n_events: Long,
      sum_value: Long,
      last_event_ms: Long)

  /** (event count, value sum, max event-time ms) of the open session. */
  final case class SessionState(n: Long, sum: Long, lastMs: Long)

  /** Session timeout via EVENT-TIME TIMERS — the transformWithState feature
    * the built-in `session_window` (s14) does not expose: arbitrary state
    * plus an explicit per-key alarm. Each batch folds events into the open
    * session and re-arms one timer at lastEvent + gap; when the WATERMARK
    * passes that instant the engine calls `handleExpiredTimer`, which emits
    * the closed session exactly once and clears the state. Emission is
    * therefore watermark-PROVEN (no earlier batch can still extend the
    * session), the same guarantee the interval join in s13 leans on.
    * State per key is 24 bytes + one timer — O(live keys) at any scale. */
  final class SessionTimeoutProcessor(gapMs: Long)
      extends StatefulProcessor[String, TimedEvent, ClosedSession] {

    @transient private var sess: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[SessionState](
        "sess", Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[TimedEvent],
        timerValues: TimerValues): Iterator[ClosedSession] = {
      val prev = if (sess.exists()) Option(sess.get()) else None
      var n = prev.map(_.n).getOrElse(0L)
      var sum = prev.map(_.sum).getOrElse(0L)
      var last = prev.map(_.lastMs).getOrElse(Long.MinValue)
      rows.foreach { e =>
        n += 1
        sum += e.value
        last = math.max(last, e.event_time.getTime)
      }
      // one live alarm per key: disarm the previous one before re-arming
      prev.foreach(p => getHandle.deleteTimer(p.lastMs + gapMs))
      getHandle.registerTimer(last + gapMs)
      sess.update(SessionState(n, sum, last))
      Iterator.empty
    }

    override def handleExpiredTimer(
        key: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[ClosedSession] =
      if (sess.exists()) {
        val st = sess.get()
        sess.clear()
        Iterator.single(ClosedSession(key, st.n, st.sum, st.lastMs))
      } else Iterator.empty
  }

  /** Close sessions `gap` after their last event, proven by watermark. The
    * input must already carry `withWatermark` on `event_time`. */
  def sessionTimeouts(
      events: Dataset[TimedEvent], gapMs: Long): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.device_id)
      .transformWithState(
        new SessionTimeoutProcessor(gapMs),
        TimeMode.EventTime(),
        OutputMode.Append())
  }
}
