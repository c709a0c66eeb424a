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
          times.foreach { t =>
            cur = cur match {
              case Some(s) if t <= s.end + gap =>
                Some(s.copy(end = math.max(s.end, t), n = s.n + 1))
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
