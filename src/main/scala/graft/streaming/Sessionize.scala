package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization (`flatMapGroupsWithState`) — gap-based
  * sessions over an unbounded event stream, the streaming counterpart of the
  * batch q45 window formulation.
  *
  * State per user is the list of OPEN sessions: the current one plus any
  * earlier sessions whose close boundary (endSec + gapSec) the watermark has
  * not yet passed — those may still absorb a late-but-admissible event from
  * a later micro-batch, so emitting them eagerly would produce overlapping
  * sessions the batch formulation merges (ADVICE r2). A session is emitted
  * exactly when the watermark passes its boundary — inline when a later
  * batch's data arrives for the user, or via event-time timeout otherwise.
  * State size is bounded by watermarkDelay/gapSec + 1 sessions per user;
  * with the customary delay ≤ gap it is a single open session. Results are
  * independent of micro-batch boundaries (proven against the batch
  * formulation in SessionizeSpec).
  */
object Sessionize {

  final case class Event(userId: Long, tsSec: Long)
  final case class OpenSession(startSec: Long, endSec: Long, events: Long)
  final case class SessionsState(open: Seq[OpenSession])
  final case class SessionSummary(userId: Long, startSec: Long, endSec: Long,
                                  events: Long, durationSec: Long)

  private def summary(uid: Long, s: OpenSession): SessionSummary =
    SessionSummary(uid, s.startSec, s.endSec, s.events, s.endSec - s.startSec)

  /** Fire when the earliest open boundary passes; never at-or-before the
    * current watermark (Spark rejects a timeout the watermark already
    * passed). */
  private def armTimeout(state: GroupState[SessionsState], open: Seq[OpenSession],
                         gapSec: Long, wmMs: Long): Unit =
    state.setTimeoutTimestamp(
      math.max(open.map(s => (s.endSec + gapSec) * 1000L).min, wmMs + 1000L))

  /** Sessionize a (possibly streaming) dataset of [[Event]]s.
    *
    * @param events         input with an `eventTime` watermark already set by
    *                       [[withEventTime]]
    * @param gapSec         inactivity gap closing a session
    */
  def sessions(events: Dataset[(Long, Long, java.sql.Timestamp)], gapSec: Long):
      Dataset[SessionSummary] = {
    implicit val outEnc = Encoders.product[SessionSummary]
    implicit val stEnc = Encoders.product[SessionsState]
    events.groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionsState, SessionSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, rows, state: GroupState[SessionsState]) =>
          val wmMs = state.getCurrentWatermarkMs()
          // closable = no admissible event (ts >= watermark) can still land
          // within gap of the session's end
          def closable(s: OpenSession): Boolean = (s.endSec + gapSec) * 1000L < wmMs
          if (state.hasTimedOut) {
            val (done, keep) = state.get.open.partition(closable)
            if (keep.isEmpty) state.remove()
            else { state.update(SessionsState(keep)); armTimeout(state, keep, gapSec, wmMs) }
            done.map(summary(uid, _)).iterator
          } else {
            // Merge the open sessions and this batch's events as INTERVALS
            // sorted by start: a late (within-watermark) event either extends
            // an open session (possibly downward) or starts its own. Result
            // is independent of micro-batch boundaries and matches the batch
            // q45 lag/gap formulation.
            val incoming = rows.map(_._2).toArray.sorted.map(ts => OpenSession(ts, ts, 1))
            val items = (state.getOption.map(_.open).getOrElse(Seq.empty) ++ incoming)
              .sortBy(s => (s.startSec, s.endSec))
            val merged = collection.mutable.ArrayBuffer[OpenSession]()
            items.foreach { s =>
              merged.lastOption match {
                case Some(p) if s.startSec - p.endSec <= gapSec =>
                  merged(merged.length - 1) =
                    OpenSession(p.startSec, math.max(p.endSec, s.endSec), p.events + s.events)
                case _ => merged += s
              }
            }
            // only watermark-passed sessions close; the rest (always at least
            // the newest) stay in state and may still merge with late events
            val (done, keepInit) = merged.init.partition(closable)
            val keep = (keepInit :+ merged.last).toSeq
            state.update(SessionsState(keep))
            armTimeout(state, keep, gapSec, wmMs)
            done.map(summary(uid, _)).iterator
          }
      }
  }

  /** Attach the event-time column + watermark the state timeout needs. */
  def withEventTime(events: Dataset[Event], watermarkDelay: String):
      Dataset[(Long, Long, java.sql.Timestamp)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("userId"), col("tsSec"), timestamp_seconds(col("tsSec")).as("eventTime"))
      .withWatermark("eventTime", watermarkDelay)
      .as[(Long, Long, java.sql.Timestamp)]
  }
}
