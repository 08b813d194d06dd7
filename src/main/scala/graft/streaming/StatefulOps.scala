package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

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
}
