package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
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

  /** Merge two individually-sorted sequences in O(n) — the state hot path
    * re-sorted the whole buffer per trigger before. */
  private def mergeSorted[T](a: Seq[T], b: Seq[T])(
      implicit ord: Ordering[T]): Seq[T] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new collection.mutable.ArrayBuffer[T](a.length + b.length)
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      if (ord.lteq(a(i), b(j))) { out += a(i); i += 1 }
      else { out += b(j); j += 1 }
    }
    while (i < a.length) { out += a(i); i += 1 }
    while (j < b.length) { out += b(j); j += 1 }
    out.toSeq
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
          // prev.rights is stored sorted (pruning preserves order), so only
          // the new arrivals pay a sort; the tails merge in O(n)
          val rights = mergeSorted(prev.rights, inR.sorted)
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
            if (pending.nonEmpty)
              state.setTimeoutTimestamp(math.max(
                (pending.map(_._1).min + horizon + 1) * 1000, wmMs + 1000))
            else if (toleranceSec.isDefined)
              // rights-only key: with a tolerance the buffered rights stop
              // being admissible once the watermark passes maxTs+tolerance —
              // schedule a cleanup callback so the key's state is REMOVED
              // instead of leaking one entry per dormant key. (Without a
              // tolerance the single dominating right is the documented
              // irreducible floor: a future left may need it at any time.)
              state.setTimeoutTimestamp(math.max(
                (kept.map(_._1).max + toleranceSec.get + 2) * 1000,
                wmMs + 1000))
          }
          done.sorted.map { case (ts, lid) =>
            val m = matchFor(ts, rights, toleranceSec, direction)
            Enriched(key, lid, ts, m.map(_._2), m.map(_._1))
          }.iterator
      }
  }

  // ---- generic surface: arbitrary key and payload schemas ----------------

  /** Internal tagged row: key/left-row/right-struct travel as canonical
    * JSON so ONE typed state shape serves every user schema. */
  final case class GEvt(gk: String, gts: Long, gtie: Long,
                        gdata: String, gside: Int)
  final case class GState(lefts: Seq[(Long, String)],
                          rights: Seq[(Long, Long, String)])
  final case class GOut(ldata: String, rdata: Option[String])

  /** JSON is only a sound grouping form for types it renders CANONICALLY.
    * Map entries serialize in storage order, so two equal maps can render
    * differently and silently never group — reject them loudly (a struct
    * or sorted array key expresses the same thing canonically). */
  private def assertJsonCanonicalKey(
      dt: org.apache.spark.sql.types.DataType, at: String): Unit = dt match {
    case _: org.apache.spark.sql.types.MapType =>
      throw new IllegalArgumentException(
        s"asOfStream key component '$at' is map-typed: JSON map entry " +
          "order is not canonical, so keys the batch AsOfJoin treats as " +
          "equal could serialize differently and never match in " +
          "streaming. Use a struct or a sorted array as the key instead.")
    case s: org.apache.spark.sql.types.StructType =>
      s.fields.foreach(f => assertJsonCanonicalKey(f.dataType, s"$at.${f.name}"))
    case a: org.apache.spark.sql.types.ArrayType =>
      assertJsonCanonicalKey(a.elementType, s"$at[]")
    case _ => ()
  }

  /** Normalize the one atomic non-canonical JSON case: IEEE signed zero
    * (-0.0 and 0.0 compare equal — and group together in the batch
    * operator, which groups by VALUE — but render differently). Rewrites
    * float/double leaves recursively through structs and arrays; all other
    * types pass through untouched. */
  private def canonKey(c: org.apache.spark.sql.Column,
      dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.Column =
    dt match {
      case org.apache.spark.sql.types.DoubleType =>
        when(c === lit(0.0d), lit(0.0d)).otherwise(c)
      case org.apache.spark.sql.types.FloatType =>
        when(c === lit(0.0f), lit(0.0f)).otherwise(c)
      case s: org.apache.spark.sql.types.StructType =>
        when(c.isNull, lit(null).cast(s)).otherwise(struct(
          s.fields.toSeq.map(f => canonKey(c.getField(f.name), f.dataType).as(f.name)): _*))
      case a: org.apache.spark.sql.types.ArrayType =>
        transform(c, x => canonKey(x, a.elementType))
      case _ => c
    }

  /** Streaming as-of join with the batch [[AsOfJoin.asOf]] signature:
    * arbitrary equi-key columns (any types — they group by their canonical
    * JSON form), a numeric epoch-seconds `tsCol`, a numeric `tieCol`
    * (highest wins among equal timestamps), and any payload columns. The
    * output is the batch shape — every left column plus an `asof` struct
    * of `(tsCol, tieCol, payload…)`, null when nothing matched — emitted
    * exactly when the watermark finalizes each left row (see [[enrich]]
    * for the finalization/state-pruning contract; this surface shares the
    * same state machine).
    *
    * Left rows and right structs buffer in state as canonical JSON and are
    * rehydrated with the original schemas on emit (`to_json`/`from_json`
    * round-trip; binary columns travel base64). Proven streamed ≡ batch on
    * randomized chunkings with string keys + multi-column payloads in
    * StreamingAsOfSpec.
    *
    * Canonicality guard: the JSON grouping form is only sound for types it
    * renders canonically, so MAP-typed key components are rejected with a
    * clear error (entry order is storage order — equal maps can render
    * differently and silently never match), and IEEE signed zero in
    * float/double key leaves is normalized to +0.0 on both sides (the
    * batch operator groups -0.0 with 0.0 by value; "-0.0" vs "0.0" text
    * would not). Atomic, struct, and array keys are all safe. */
  def asOfStream(left: DataFrame, right: DataFrame, keys: Seq[String],
                 tsCol: String, tieCol: String, payload: Seq[String],
                 watermarkDelay: String, tolerance: Option[Long] = None,
                 direction: String = AsOfJoin.Backward): DataFrame = {
    require(Seq(AsOfJoin.Backward, AsOfJoin.Forward, AsOfJoin.Nearest)
      .contains(direction), s"direction must be backward|forward|nearest")
    require(direction == AsOfJoin.Backward || tolerance.nonEmpty,
      s"streaming $direction as-of requires a tolerance: without one a left " +
        "row waits forever for a possible future right and can never emit")
    val spark = left.sparkSession
    import spark.implicits._
    val leftSchema = left.schema
    val rCols = (Seq(tsCol, tieCol) ++ payload).distinct
    val rSchema = org.apache.spark.sql.types.StructType(
      rCols.map(c => right.schema(right.schema.fieldIndex(c))))
    val horizon: Long = if (direction == AsOfJoin.Backward) 0L
      else tolerance.get

    keys.foreach(k =>
      assertJsonCanonicalKey(leftSchema(leftSchema.fieldIndex(k)).dataType, k))

    val lKeyCols = keys.map { k =>
      val dt = leftSchema(leftSchema.fieldIndex(k)).dataType
      canonKey(col(k), dt).as(k)
    }
    val l2 = left.select(
      to_json(struct(lKeyCols: _*)).as("gk"),
      col(tsCol).cast("long").as("gts"),
      lit(0L).as("gtie"),
      to_json(struct(left.columns.map(col).toSeq: _*)).as("gdata"),
      lit(1).as("gside"))
    // right keys are CAST to the left's key types before canonicalization:
    // the batch operator's unionByName coerces both sides to a common type
    // (INT 1 joins DOUBLE 1.0); serializing each side's native type would
    // render "1" vs "1.0" and silently never match
    val rKeyCols = keys.map { k =>
      val dt = left.schema(left.schema.fieldIndex(k)).dataType
      canonKey(col(k).cast(dt), dt).as(k)
    }
    val r2 = right.select(
      to_json(struct(rKeyCols: _*)).as("gk"),
      col(tsCol).cast("long").as("gts"),
      col(tieCol).cast("long").as("gtie"),
      to_json(struct(rCols.map(col): _*)).as("gdata"),
      lit(0).as("gside"))
    val tagged = l2.unionByName(r2)
      .withColumn("eventTime", timestamp_seconds(col("gts")))
      .withWatermark("eventTime", watermarkDelay)
      .as[GEvt]

    // the same match rule as matchFor, over (ts, tie, json) triples
    def matchG(ts: Long, rights: Seq[(Long, Long, String)])
        : Option[(Long, Long, String)] = {
      def back = {
        val e = rights.filter(r => r._1 <= ts
          && tolerance.forall(t => ts - r._1 <= t))
        if (e.isEmpty) None else Some(e.maxBy(r => (r._1, r._2)))
      }
      def fwd = {
        val e = rights.filter(r => r._1 >= ts
          && tolerance.forall(t => r._1 - ts <= t))
        if (e.isEmpty) None
        else {
          val mt = e.map(_._1).min
          Some(e.filter(_._1 == mt).maxBy(_._2))
        }
      }
      direction match {
        case AsOfJoin.Backward => back
        case AsOfJoin.Forward => fwd
        case AsOfJoin.Nearest => (back, fwd) match {
          case (Some(b), Some(f)) =>
            if (ts - b._1 <= f._1 - ts) Some(b) else Some(f)
          case (b, f) => b.orElse(f)
        }
      }
    }

    implicit val outEnc = Encoders.product[GOut]
    implicit val stEnc = Encoders.product[GState]
    val matched = tagged.groupByKey(_.gk)
      .flatMapGroupsWithState[GState, GOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, rows, state: GroupState[GState]) =>
          val wmMs = state.getCurrentWatermarkMs()
          val prev = state.getOption.getOrElse(GState(Nil, Nil))
          val (inL, inR) =
            if (state.hasTimedOut) (Nil, Nil)
            else {
              val in = rows.toSeq
              (in.filter(_.gside == 1).map(e => (e.gts, e.gdata)),
                in.filter(_.gside == 0).map(e => (e.gts, e.gtie, e.gdata)))
            }
          val rights = mergeSorted(prev.rights, inR.sorted)
          val (done, pending) = (prev.lefts ++ inL)
            .partition(l => (l._1 + horizon) * 1000 < wmMs)
          val kept = tolerance match {
            case Some(t) =>
              val floorSec = math.min(
                pending.map(_._1).minOption.getOrElse(Long.MaxValue),
                wmMs / 1000) - t - 1
              rights.filter(_._1 >= floorSec)
            case None =>
              val (passed, live) = rights.partition(_._1 * 1000 < wmMs)
              passed.lastOption.toSeq ++ live
          }
          if (pending.isEmpty && kept.isEmpty) state.remove()
          else {
            state.update(GState(pending, kept))
            if (pending.nonEmpty)
              state.setTimeoutTimestamp(math.max(
                (pending.map(_._1).min + horizon + 1) * 1000, wmMs + 1000))
            else if (tolerance.isDefined)
              // rights-only cleanup, as in enrich: see the comment there
              state.setTimeoutTimestamp(math.max(
                (kept.map(_._1).max + tolerance.get + 2) * 1000,
                wmMs + 1000))
          }
          done.sorted.map { case (ts, ldata) =>
            GOut(ldata, matchG(ts, rights).map(_._3))
          }.iterator
      }

    matched
      .select(from_json(col("ldata"), leftSchema).as("__l"),
        from_json(col("rdata"), rSchema).as("asof"))
      .select((leftSchema.fieldNames.map(f => col(s"__l.$f")) :+ col("asof"))
        .toSeq: _*)
  }
}
