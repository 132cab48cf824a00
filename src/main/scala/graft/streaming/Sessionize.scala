package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event sessionization — gap-based session assignment per user. Two
  * equivalent forms:
  *
  *  - [[batch]]: typed `KeyValueGroupedDataset.flatMapGroups` (sort one
  *    user's events in memory, split on gaps). Deterministic; the
  *    correctness-gate form.
  *  - [[streaming]]: `flatMapGroupsWithState` with processing-time
  *    timeout — the Structured Streaming stateful form (SURVEY §2.9 has
  *    no reference counterpart; this is the engine's added capability).
  *
  * A session = maximal run of events with inter-event gap <= `gapMicros`.
  */
object Sessionize {

  final case class Event(user_id: Long, ts_micros: Long, cents: Long)
  final case class Session(user_id: Long, session_start: Long, n_events: Long, sum_cents: Long)
  final case class SessState(openStart: Long, lastTs: Long, n: Long, cents: Long)

  private def split(userId: Long, evs: Iterator[Event], gapMicros: Long): Iterator[Session] = {
    val sorted = evs.toArray.sortBy(e => (e.ts_micros, e.cents))
    if (sorted.isEmpty) Iterator.empty
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[Session]
      var start = sorted.head.ts_micros; var last = start
      var n = 0L; var cents = 0L
      sorted.foreach { e =>
        if (e.ts_micros - last > gapMicros) {
          out += Session(userId, start, n, cents)
          start = e.ts_micros; n = 0; cents = 0
        }
        last = e.ts_micros; n += 1; cents += e.cents
      }
      out += Session(userId, start, n, cents)
      out.iterator
    }
  }

  /** Batch sessionization over a typed event Dataset. */
  def batch(events: Dataset[Event], gapMicros: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id).flatMapGroups((uid, it) => split(uid, it, gapMicros))
  }

  /** Streaming sessionization: accumulate per-user state, emit closed
    * sessions as gaps appear in arriving batches; on timeout flush the
    * open session. (Per-batch arrival order is handled by sorting the
    * batch; this matches batch semantics when the source is replayed in
    * order, e.g. AvailableNow over files.) */
  def streaming(events: Dataset[Event], gapMicros: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(uid, s.openStart, s.n, s.cents))
          } else {
            val sorted = it.toArray.sortBy(e => (e.ts_micros, e.cents))
            var st = state.getOption.getOrElse(
              SessState(sorted.head.ts_micros, Long.MinValue / 4, 0, 0))
            val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
            sorted.foreach { e =>
              if (st.n > 0 && e.ts_micros - st.lastTs > gapMicros) {
                closed += Session(uid, st.openStart, st.n, st.cents)
                st = SessState(e.ts_micros, e.ts_micros, 1, e.cents)
              } else {
                st = SessState(if (st.n == 0) e.ts_micros else st.openStart,
                               e.ts_micros, st.n + 1, st.cents + e.cents)
              }
            }
            state.update(st)
            state.setTimeoutDuration("30 seconds")
            closed.iterator
          }
      }
  }
}
