package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the a20 batch EWMA (Analytic.scala): per-key
  * recency-weighted smoothing + spike flag over an unbounded stream, via
  * `flatMapGroupsWithState` keeping ONLY the trailing window per key.
  *
  * Exact batch parity by construction: the same dyadic integer arithmetic
  * as a20 (weights 2^j over integer cents, one IEEE division, integer
  * spike test), applied to the same trailing-8 values — EwmaStreamSpec
  * replays the events table through MemoryStream in multiple triggers and
  * asserts the streamed output row-for-row equals the batch query.
  *
  * Scale: state per key is a ≤8-element long array (constant — the
  * streaming analogue of a20's bounded window frame), partitioned by key
  * across executors; no watermark needed because state never grows with
  * time. Within a trigger the rows of a group are sorted by (ts, eventId)
  * before folding, so parity holds for any batch boundary placement as
  * long as triggers respect event order across batches (true for replay
  * and for in-order sources; out-of-order arrival needs the watermarked
  * sort in front, the standard caveat for any streaming fold).
  */
object EwmaStream {

  case class EwmaIn(userId: Long, eventId: Long, tsMs: Long, cents: Long)
  case class EwmaOut(userId: Long, eventId: Long, ewma: Double,
      spike: Boolean)
  case class EwmaState(vals: Array[Long])

  /** Spike threshold in cents — same constant as a20's batch query. */
  val SpikeCents = 9000L

  def apply(in: Dataset[EwmaIn], lookback: Int = 8): Dataset[EwmaOut] = {
    // plan-time config, fail construction: lookback=0 makes den=0 →
    // 0/0.0=NaN → BigDecimal(NaN) throws in the EXECUTOR and kills the
    // query; lookback>=63 reaches den<=0 the slow way once the window
    // fills (1L<<63 is negative, shift is mod 64)
    require(lookback >= 1 && lookback <= 62,
      s"lookback must be in [1, 62] (got $lookback): the dyadic weights " +
        "use (1L << size) - 1, which degenerates outside that range")
    implicit val stateEnc = Encoders.product[EwmaState]
    implicit val outEnc = Encoders.product[EwmaOut]
    in.groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[EwmaState, EwmaOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, rows, state: GroupState[EwmaState]) =>
          var vals = state.getOption.map(_.vals.toList).getOrElse(Nil)
          val out = rows.toSeq.sortBy(r => (r.tsMs, r.eventId)).map { r =>
            vals = (vals :+ r.cents).takeRight(lookback)
            val den = (1L << vals.size) - 1
            val num = vals.zipWithIndex
              .map { case (v, i) => v << i }.sum
            EwmaOut(r.userId, r.eventId,
              BigDecimal(num / (den * 100.0))
                .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
              math.abs(r.cents * den - num) > SpikeCents * den)
          }
          state.update(EwmaState(vals.toArray))
          out.iterator
      }
  }
}
