package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization: gap-based sessions maintained with
  * `flatMapGroupsWithState` — the custom-state primitive the batch
  * [[graft.operators.Sessionize]] window formulation cannot express on an
  * unbounded stream. State per key is (last event millis, session counter):
  * fixed-size regardless of stream length.
  */
object StatefulSessionize {

  case class Event(userId: Long, eventId: Long, tsMillis: Long)
  case class SessionAssignment(userId: Long, eventId: Long, sessionId: Long)
  case class SessionState(lastTs: Long, sessionId: Long)

  def assign(gapMillis: Long)(
      userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[SessionAssignment] = {
    var cur = state.getOption.getOrElse(SessionState(Long.MinValue, 0L))
    val out = events.toSeq.sortBy(e => (e.tsMillis, e.eventId)).map { e =>
      cur =
        if (cur.sessionId == 0L || e.tsMillis - cur.lastTs > gapMillis)
          SessionState(e.tsMillis, cur.sessionId + 1)
        else SessionState(e.tsMillis, cur.sessionId)
      SessionAssignment(userId, e.eventId, cur.sessionId)
    }
    state.update(cur)
    out.iterator
  }

  /** Apply over a (possibly streaming) Dataset[Event]. */
  def apply(events: Dataset[Event], gapMillis: Long)(
      implicit spark: SparkSession): Dataset[SessionAssignment] = {
    import spark.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(assign(gapMillis))
  }
}
