package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Exact-time retry release via `flatMapGroupsWithState` — the precise
  * alternative to [[RetryEngine.due]]'s per-trigger due-filter (SURVEY §4.2:
  * "Delay-queue TTL semantics … flatMapGroupsWithState with timers (exact)").
  *
  * The due-filter quantizes retry latency to the trigger interval and
  * re-appends not-yet-due records to the topic each trigger (requeue I/O).
  * This operator instead parks each not-yet-due envelope in keyed state and
  * registers a processing-time timer for its `nextAttemptAt`; the record is
  * emitted exactly when the timer fires — the RabbitMQ per-message-TTL
  * analogue (messaging/producer.clj:206-214), with the state store (RocksDB
  * on a cluster) playing the delay queue's role.
  *
  * Scale: state is one envelope per in-flight retry, partitioned by record
  * key across executors; timers are per-group and fire independently, so a
  * backlog of millions of scheduled retries costs only state-store space,
  * not requeue traffic. Trade-off vs the due-filter: state-store writes per
  * record vs re-append I/O per trigger — at high retry volume with long
  * backoffs the timer form wins; for short backoffs the due-filter's
  * quantization is cheaper. Both are provided; routes pick via config.
  */
object RetryTimers {

  /** Key = record identity on the retry topic (stable across replays). */
  private[streaming] def keyOf(e: Envelope): String =
    s"${e.topic}/${e.partition}/${e.offset}"

  /** Parks not-yet-due envelopes in state; emits each envelope at (or
    * immediately, if already due) its `nextAttemptAt`. Null/absent
    * `nextAttemptAt` means due-now (first-failure instant retry). */
  def release(ds: Dataset[Envelope]): Dataset[Envelope] = {
    implicit val envEnc = Encoders.product[Envelope]
    implicit val keyEnc = Encoders.STRING
    ds.groupByKey(keyOf _)
      .flatMapGroupsWithState[Envelope, Envelope](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (_: String, it: Iterator[Envelope], state: GroupState[Envelope]) =>
          if (state.hasTimedOut) {
            val out = state.get
            state.remove()
            Iterator.single(out)
          } else {
            // retry topics are append-only per record identity: at most one
            // live envelope per key
            val now = state.getCurrentProcessingTimeMs()
            val (dueNow, parked) = it.partition(e =>
              e.nextAttemptAt.forall(_.getTime <= now))
            val due = dueNow.toSeq
            // A source replay of a now-due record must also clear any
            // recovered parked state for the key: emitting here while the
            // stale state/timer survives would release the same record a
            // second time when that timer fires.
            if (due.nonEmpty && state.exists) state.remove()
            parked.toSeq.lastOption.foreach { e =>
              state.update(e)
              // ProcessingTimeTimeout takes a duration from now
              state.setTimeoutDuration(
                math.max(1L, e.nextAttemptAt.get.getTime - now))
            }
            due.iterator
          }
      }
  }
}
