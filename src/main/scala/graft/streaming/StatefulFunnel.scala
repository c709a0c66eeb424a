package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming conversion funnel: per-user ordered-step tracking with
  * `flatMapGroupsWithState` — the streaming twin of the batch
  * `Funnel.conversion`. State per key is THREE numbers (anchor time,
  * last-step time, steps reached) — O(#users), never O(events), the
  * same bound that makes StatefulSessions safe at scale.
  *
  * Semantics match the batch operator under in-order delivery (each
  * batch's events are processed in event-time order; cross-batch order
  * holds when the source is time-ordered, e.g. replayed logs or a
  * watermarked upstream): step k advances at the EARLIEST event of the
  * k-th type strictly after step k−1, within `windowSec` of the first
  * step-1 event. One `Advance` row is emitted per (user, step) — counts
  * per step are the funnel.
  */
object StatefulFunnel {

  /** Streaming burst collapse (debounce): emit only the head event of
    * every gap-delimited burst per key — the streaming twin of
    * `Sessionize.burstCollapse`, with state = ONE timestamp per key
    * (the current burst's maximum). Exact under in-order delivery
    * (same contract as [[track]]); each batch's events are processed
    * in (ts, tie) order.
    */
  case class KeyedEvent(key: String, ts: java.sql.Timestamp, tie: Long)
  case class BurstHead(key: String, ts: java.sql.Timestamp, tie: Long)

  def debounce(events: Dataset[KeyedEvent], gapMicros: Long)
      : Dataset[BurstHead] = {
    implicit val eh = Encoders.product[BurstHead]
    implicit val el = Encoders.scalaLong
    implicit val ek = Encoders.STRING
    events.groupByKey(_.key)
      .flatMapGroupsWithState[Long, BurstHead](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[KeyedEvent], state: GroupState[Long]) =>
          val evs = it.toArray.sortBy(e => (micros(e.ts), e.tie))
          // Long.MinValue = "no burst open yet"
          var lastMax = state.getOption.getOrElse(Long.MinValue)
          val out = scala.collection.mutable.ArrayBuffer.empty[BurstHead]
          evs.foreach { e =>
            val t = micros(e.ts)
            if (lastMax == Long.MinValue || t > lastMax + gapMicros)
              out += BurstHead(key, e.ts, e.tie)
            if (t > lastMax) lastMax = t
          }
          state.update(lastMax)
          out.iterator
      }
  }

  /** `step` is the 0-based index into the funnel's step list; map and
    * filter event types BEFORE the stateful operator so state never
    * sees irrelevant events.
    */
  case class StepEvent(key: Long, ts: java.sql.Timestamp, step: Int)
  case class Advance(key: Long, step_idx: Int, ts: java.sql.Timestamp)
  case class FState(t0Micros: Long, lastMicros: Long, reached: Int)

  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  def track(events: Dataset[StepEvent], nSteps: Int, windowSec: Long)
      : Dataset[Advance] = {
    implicit val ea = Encoders.product[Advance]
    implicit val es = Encoders.product[FState]
    implicit val ek = Encoders.scalaLong
    events.groupByKey(_.key)
      .flatMapGroupsWithState[FState, Advance](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[StepEvent], state: GroupState[FState]) =>
          val evs = it.toArray.sortBy(e => (micros(e.ts), e.step))
          var st = state.getOption.getOrElse(FState(0L, 0L, 0))
          val out = scala.collection.mutable.ArrayBuffer.empty[Advance]
          evs.foreach { e =>
            if (st.reached < nSteps && e.step == st.reached) {
              val t = micros(e.ts)
              if (st.reached == 0) {
                st = FState(t, t, 1)
                out += Advance(key, 1, e.ts)
              } else if (t > st.lastMicros &&
                         t <= st.t0Micros + windowSec * 1000000L) {
                st = FState(st.t0Micros, t, st.reached + 1)
                out += Advance(key, st.reached, e.ts)
              }
            }
          }
          state.update(st)
          out.iterator
      }
  }
}
