package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization (`flatMapGroupsWithState`) — gap-based
  * sessions over an unbounded event stream, the streaming counterpart of the
  * batch q45 window formulation.
  *
  * State per user is O(1) (open-session bounds + count), sharded by the
  * stream's key partitioning; sessions close either inline (an event arrives
  * more than `gapSec` after the open session's end) or via event-time
  * timeout once the watermark passes end + gap. That bounds state size and
  * makes results independent of micro-batch boundaries — the properties that
  * matter on an unbounded 100 TB stream.
  */
object Sessionize {

  final case class Event(userId: Long, tsSec: Long)
  final case class OpenSession(startSec: Long, endSec: Long, events: Long)
  final case class SessionSummary(userId: Long, startSec: Long, endSec: Long,
                                  events: Long, durationSec: Long)

  private def summary(uid: Long, s: OpenSession): SessionSummary =
    SessionSummary(uid, s.startSec, s.endSec, s.events, s.endSec - s.startSec)

  /** Sessionize a (possibly streaming) dataset of [[Event]]s.
    *
    * @param events         input with an `eventTime` watermark already set by
    *                       [[withEventTime]]
    * @param gapSec         inactivity gap closing a session
    */
  def sessions(events: Dataset[(Long, Long, java.sql.Timestamp)], gapSec: Long):
      Dataset[SessionSummary] = {
    implicit val outEnc = Encoders.product[SessionSummary]
    implicit val stEnc = Encoders.product[OpenSession]
    events.groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState[OpenSession, SessionSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, rows, state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(summary(uid, _)).iterator
            state.remove()
            out
          } else {
            // Merge the open session and this batch's events as INTERVALS
            // sorted by start: a late (within-watermark) event preceding the
            // open session either extends it downward (startSec = min) or —
            // if more than gapSec earlier — closes as its own earlier
            // session. Result is independent of micro-batch boundaries and
            // matches the batch q45 lag/gap formulation.
            val incoming = rows.map(_._2).toArray.sorted.map(ts => OpenSession(ts, ts, 1))
            val items = (state.getOption.toSeq ++ incoming)
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
            val open = merged.last
            state.update(open)
            state.setTimeoutTimestamp((open.endSec + gapSec) * 1000L)
            merged.init.map(summary(uid, _)).iterator
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
