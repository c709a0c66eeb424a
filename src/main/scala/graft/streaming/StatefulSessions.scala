package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state: gap-based sessionization with
  * `flatMapGroupsWithState` — the stateful generalization of the
  * reference's availability-driven micro-batch loop
  * (`program/src/main/scala/hmushtaq/sparkga1/SparkGA1.scala:94-110`,
  * which keeps no cross-batch state at all) and the streaming twin of the
  * batch interval-coalescing operator.
  *
  * State per key is ONE open session (constant size — this is what makes
  * it safe at scale: state store holds O(#active keys), not O(events)).
  * A session is emitted when a later event arrives beyond the gap. Use
  * `session_window` (Streams.sessionAgg) when the built-in semantics fit;
  * this operator is the template for state Spark can't express — e.g.
  * sessions carrying custom payload reductions.
  */
object StatefulSessions {

  case class Event(key: Long, t: Long)
  case class OpenSession(start: Long, end: Long, n: Long)
  case class Session(key: Long, sess_start: Long, sess_end: Long,
                     n_rows: Long)

  def sessionize(events: Dataset[Event], gap: Long): Dataset[Session] = {
    implicit val se = Encoders.product[Session]
    implicit val so = Encoders.product[OpenSession]
    implicit val sk = Encoders.scalaLong
    events.groupByKey(_.key)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[Event], state: GroupState[OpenSession]) =>
          val times = it.map(_.t).toArray.sorted
          var cur = state.getOption
          val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
          // stragglers older than the open session's leading gap can't
          // join it (state holds ONE open session — that's what bounds
          // it); gap-merge them among themselves and emit immediately.
          val guard = cur.map(_.start - gap).getOrElse(Long.MinValue)
          val (late, rest) = times.partition(_ < guard)
          late.foreach { t =>
            closed.lastOption match {
              case Some(s) if t <= s.sess_end + gap =>
                closed(closed.length - 1) =
                  s.copy(sess_end = t, n_rows = s.n_rows + 1)
              case _ => closed += Session(key, t, t, 1)
            }
          }
          rest.foreach { t =>
            cur = cur match {
              // extends (or exactly touches) the open session — also
              // lowers start for a late event within the leading gap
              case Some(s) if t <= s.end + gap =>
                Some(OpenSession(math.min(s.start, t),
                                 math.max(s.end, t), s.n + 1))
              case Some(s) =>
                closed += Session(key, s.start, s.end, s.n)
                Some(OpenSession(t, t, 1))
              case None => Some(OpenSession(t, t, 1))
            }
          }
          cur.foreach(state.update)
          closed.iterator
      }
  }
}
