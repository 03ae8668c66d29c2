package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization — the unbounded form of the batch
  * `e_sessionize` operator (gap-based session assembly, the "user
  * episodes" shape a training-data pipeline runs over event logs). Batch
  * uses two windows + a groupBy; an unbounded stream can't (the session
  * boundary depends on a FUTURE row), so this is the textbook
  * `flatMapGroupsWithState` use-case (SURVEY §2.11 / the brief's "custom
  * state" row):
  *
  *   events keyed by user → per-user open-session state (id, start, last,
  *   n, sum) → a session EMITS when a new event lands more than `gapUs`
  *   after the last one, or when the EVENT-TIME TIMEOUT fires (watermark
  *   passed last + gap with nothing new — the open session can never be
  *   extended again, because later events would be dropped as late).
  *
  * Semantics parity with e_sessionize (EventAggs.scala): session_id is
  * the 1-based per-user counter in event-time order, duration = last −
  * first, value = Σcents/100. Within a micro-batch events sort by event
  * time; cross-batch stragglers inside the watermark extend the open
  * session (max(last, t)) exactly like the batch window would.
  *
  * Scale notes: state is one small record per user (not per event); a
  * timeout close shrinks it to a ~40-byte counter tombstone (n = 0) so
  * session_id keeps counting across closes — the per-user counter must
  * survive or the next session would reuse (user_id, 1) and diverge
  * from batch e_sessionize. Bounded by distinct-user count, not event
  * volume; the only shuffle is the groupByKey hash exchange.
  */
object SessionStream {

  final case class Ev(ts: java.sql.Timestamp, user_id: Long, cents: Long)
  final case class St(sessionId: Long, startUs: Long, lastUs: Long,
      n: Long, sum: Long)
  final case class Out(user_id: Long, session_id: Long, n_events: Long,
      session_start: Long, duration_us: Long, session_value: Double)

  private def us(t: java.sql.Timestamp): Long = t.getTime * 1000L

  def plan(input: Dataset[Ev], gapUs: Long = 1800000000L,
      watermark: String = "1 hour"): Dataset[Out] = {
    import input.sparkSession.implicits._

    def close(user: Long, s: St): Out =
      Out(user, s.sessionId, s.n, s.startUs, s.lastUs - s.startUs, s.sum / 100.0)

    input
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[St, Out](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[St]) =>
          if (state.hasTimedOut) { // watermark passed last+gap: final close
            val s = state.get
            // keep a counter tombstone (n = 0, no timeout) instead of
            // state.remove(): the NEXT session for this user must be
            // sessionId + 1, not a restart at 1
            state.update(St(s.sessionId, 0L, 0L, 0L, 0L))
            Iterator.single(close(user, s))
          } else {
            val out = scala.collection.mutable.ListBuffer.empty[Out]
            val lastClosedId = state.getOption.map(_.sessionId).getOrElse(0L)
            var cur = state.getOption.filter(_.n > 0) // tombstone = no open session
            evs.toSeq.sortBy(e => us(e.ts)).foreach { e =>
              val t = us(e.ts)
              cur match {
                case Some(s) if t - s.lastUs > gapUs =>
                  out += close(user, s)
                  cur = Some(St(s.sessionId + 1, t, t, 1, e.cents))
                case Some(s) =>
                  cur = Some(St(s.sessionId, math.min(s.startUs, t),
                    math.max(s.lastUs, t), s.n + 1, s.sum + e.cents))
                case None =>
                  cur = Some(St(lastClosedId + 1, t, t, 1, e.cents))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // event-time timeout at (last + gap): the first watermark
              // beyond this point proves no mergeable event can arrive
              state.setTimeoutTimestamp(s.lastUs / 1000L + gapUs / 1000L)
            }
            out.iterator
          }
      }
  }
}
