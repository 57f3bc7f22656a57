package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.AsOfJoin

/** Streaming as-of enrichment (`flatMapGroupsWithState`) — each left event
  * joined to the temporally adjacent right event on the same key: the
  * stream-stream TEMPORAL join Structured Streaming lacks natively (its
  * stream-stream joins are range-condition equi-joins that emit every pair,
  * not "the adjacent one"), and the streaming counterpart of the batch
  * [[graft.operators.AsOfJoin]] — all three directions.
  *
  * Determinism: BOTH sides buffer in state and a left row is emitted only
  * once the watermark FINALIZES it — for `backward` when the watermark
  * passes the left's event time (no admissible right at-or-before it can
  * still arrive), for `forward`/`nearest` when it passes event time +
  * tolerance (the whole candidate window is sealed — which is why those
  * directions REQUIRE a tolerance in streaming: an unbounded forward wait
  * could never emit). Results are therefore independent of micro-batch
  * boundaries and arrival order within the watermark, and equal the batch
  * AsOfJoin over the union of all admissible events — proven against the
  * batch operator on randomized chunkings in StreamingAsOfSpec.
  *
  * State per key stays bounded: pending lefts live only until finalized;
  * buffered rights prune — with a tolerance — to those at-or-after
  * (earliest pending or future left) − tolerance (older ones are clipped
  * for every remaining consumer), and without one to the single dominating
  * row below the watermark plus the still-mutable rows above it. The floor
  * is ONE right row per key — the irreducible "latest value so far", same
  * as any stream-stream join's key floor.
  */
object StreamingAsOf {

  /** One tagged input event: side 0 = right (the enriching stream),
    * side 1 = left (the enriched stream). */
  final case class Evt(key: Long, tsSec: Long, id: Long, side: Int)
  final case class AsOfState(lefts: Seq[(Long, Long)], rights: Seq[(Long, Long)])
  final case class Enriched(key: Long, leftId: Long, tsSec: Long,
                            rightId: Option[Long], rightTs: Option[Long])

  /** Tag and union the two sides and attach the event-time watermark. */
  def tagged(lefts: Dataset[(Long, Long, Long)], rights: Dataset[(Long, Long, Long)],
             watermarkDelay: String): Dataset[Evt] = {
    val spark = lefts.sparkSession
    import spark.implicits._
    lefts.map { case (k, ts, id) => Evt(k, ts, id, 1) }
      .unionByName(rights.map { case (k, ts, id) => Evt(k, ts, id, 0) })
      .withColumn("eventTime", timestamp_seconds(col("tsSec")))
      .withWatermark("eventTime", watermarkDelay)
      .as[Evt]
  }

  /** The batch [[AsOfJoin]] match rule over a buffered right list:
    * backward = max (ts, id) at-or-before; forward = min ts (tie → max id)
    * at-or-after; nearest = the closer of the two, exact tie → backward. */
  private def matchFor(ts: Long, rights: Seq[(Long, Long)],
                       toleranceSec: Option[Long],
                       direction: String): Option[(Long, Long)] = {
    def back = {
      val e = rights.filter(r => r._1 <= ts
        && toleranceSec.forall(t => ts - r._1 <= t))
      if (e.isEmpty) None else Some(e.max)
    }
    def fwd = {
      val e = rights.filter(r => r._1 >= ts
        && toleranceSec.forall(t => r._1 - ts <= t))
      if (e.isEmpty) None
      else {
        val mt = e.map(_._1).min
        Some((mt, e.collect { case (t, id) if t == mt => id }.max))
      }
    }
    direction match {
      case AsOfJoin.Backward => back
      case AsOfJoin.Forward => fwd
      case AsOfJoin.Nearest => (back, fwd) match {
        case (Some(b), Some(f)) => if (ts - b._1 <= f._1 - ts) Some(b) else Some(f)
        case (b, f) => b.orElse(f)
      }
    }
  }

  /** Enrich the tagged stream: emits one [[Enriched]] row per left event,
    * exactly when the watermark finalizes it (event time for backward,
    * event time + tolerance for forward/nearest). */
  def enrich(events: Dataset[Evt], toleranceSec: Option[Long] = None,
             direction: String = AsOfJoin.Backward): Dataset[Enriched] = {
    require(Seq(AsOfJoin.Backward, AsOfJoin.Forward, AsOfJoin.Nearest)
      .contains(direction), s"direction must be backward|forward|nearest")
    require(direction == AsOfJoin.Backward || toleranceSec.nonEmpty,
      s"streaming $direction as-of requires a tolerance: without one a left " +
        "row waits forever for a possible future right and can never emit")
    // a left is final once no admissible right can still change its match:
    // backward sees rights <= its ts; forward/nearest up to ts + tolerance
    val horizon: Long = direction match {
      case AsOfJoin.Backward => 0L
      case _ => toleranceSec.get
    }
    implicit val outEnc = Encoders.product[Enriched]
    implicit val stEnc = Encoders.product[AsOfState]
    events.groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState[AsOfState, Enriched](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, rows, state: GroupState[AsOfState]) =>
          val wmMs = state.getCurrentWatermarkMs()
          val prev = state.getOption.getOrElse(AsOfState(Nil, Nil))
          val (inL, inR) =
            if (state.hasTimedOut) (Nil, Nil)
            else {
              val in = rows.toSeq
              (in.filter(_.side == 1).map(e => (e.tsSec, e.id)),
                in.filter(_.side == 0).map(e => (e.tsSec, e.id)))
            }
          val rights = (prev.rights ++ inR).sorted
          val (done, pending) = (prev.lefts ++ inL)
            .partition(l => (l._1 + horizon) * 1000 < wmMs)
          val kept = toleranceSec match {
            case Some(t) =>
              // every remaining consumer (pending lefts, or future lefts at
              // ts >= watermark) clips rights older than its ts - tolerance;
              // -1 absorbs the ms->sec floor of the watermark
              val floorSec = math.min(
                pending.map(_._1).minOption.getOrElse(Long.MaxValue),
                wmMs / 1000) - t - 1
              rights.filter(_._1 >= floorSec)
            case None =>
              // the max watermark-passed row dominates all others below the
              // watermark for every future (ts >= watermark) left
              val (passed, live) = rights.partition(_._1 * 1000 < wmMs)
              passed.lastOption.toSeq ++ live
          }
          if (pending.isEmpty && kept.isEmpty) state.remove()
          else {
            state.update(AsOfState(pending, kept))
            // a callback is only needed to flush pending lefts; "latest
            // right" state alone just waits for the key's next event
            if (pending.nonEmpty)
              state.setTimeoutTimestamp(math.max(
                (pending.map(_._1).min + horizon + 1) * 1000, wmMs + 1000))
          }
          done.sorted.map { case (ts, lid) =>
            val m = matchFor(ts, rights, toleranceSec, direction)
            Enriched(key, lid, ts, m.map(_._2), m.map(_._1))
          }.iterator
      }
  }
}
