package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment (`flatMapGroupsWithState`) — each left event
  * joined to the latest right event at-or-before its event time on the same
  * key: the stream-stream TEMPORAL join Structured Streaming lacks natively
  * (its stream-stream joins are range-condition equi-joins that emit every
  * pair, not "the latest one"), and the streaming counterpart of the batch
  * [[graft.operators.AsOfJoin]] backward direction.
  *
  * Determinism: BOTH sides buffer in state and a left row is emitted only
  * once the watermark passes its event time — at that point every right row
  * that could still precede it (right.ts <= left.ts < watermark) has either
  * arrived or is watermark-dropped as late, so the match is final. Results
  * are therefore independent of micro-batch boundaries and arrival order
  * (left-before-right within the watermark is fine) and equal the batch
  * AsOfJoin over the union of all admissible events — proven against the
  * batch operator on randomized chunkings in StreamingAsOfSpec.
  *
  * State per key stays bounded: pending lefts live only until the watermark
  * passes them, and buffered rights are pruned to the single dominating row
  * at-or-below the watermark (any future left has ts >= watermark, so among
  * watermark-passed rights only the max-(ts, id) one can ever win — and if
  * it is farther than `toleranceSec`, every earlier right is farther still)
  * plus the still-mutable rights above it. The floor is ONE right row per
  * key — the irreducible state of "latest value so far", same as any
  * stream-stream join's key floor.
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

  /** Latest right (ts, id) at-or-before `ts` under the tolerance, among
    * rights sorted however — max by (ts, id), the batch AsOfJoin tie rule. */
  private def matchFor(ts: Long, rights: Seq[(Long, Long)],
                       toleranceSec: Option[Long]): Option[(Long, Long)] = {
    val eligible = rights.filter(r => r._1 <= ts
      && toleranceSec.forall(t => ts - r._1 <= t))
    if (eligible.isEmpty) None else Some(eligible.max)
  }

  /** Enrich the tagged stream: emits one [[Enriched]] row per left event,
    * exactly when the watermark passes its event time. */
  def enrich(events: Dataset[Evt], toleranceSec: Option[Long] = None):
      Dataset[Enriched] = {
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
          // a left is final once the watermark passes it: no admissible
          // right at-or-before it can still arrive
          val (done, pending) = (prev.lefts ++ inL).partition(_._1 * 1000 < wmMs)
          // prune rights: the max watermark-passed row dominates all others
          // below the watermark for every future (ts >= watermark) left
          val (passed, live) = rights.partition(_._1 * 1000 < wmMs)
          val kept = (passed.lastOption.toSeq ++ live)
          if (pending.isEmpty && kept.isEmpty) state.remove()
          else {
            state.update(AsOfState(pending, kept))
            // a callback is only needed to flush pending lefts; "latest
            // right" state alone just waits for the key's next event
            if (pending.nonEmpty)
              state.setTimeoutTimestamp(
                math.max((pending.map(_._1).min + 1) * 1000, wmMs + 1000))
          }
          done.sorted.map { case (ts, lid) =>
            val m = matchFor(ts, rights, toleranceSec)
            Enriched(key, lid, ts, m.map(_._2), m.map(_._1))
          }.iterator
      }
  }
}
