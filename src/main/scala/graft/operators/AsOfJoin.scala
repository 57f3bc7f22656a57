package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the temporally adjacent right row on the
  * same key — `backward` (latest right.ts <= left.ts, the default),
  * `forward` (earliest right.ts >= left.ts), or `nearest` (whichever of the
  * two is closer; exact tie prefers backward).
  *
  * Composed from built-ins (custom-operator preference order (a)): tag the
  * two sides, union them, and take a running `last(ignoreNulls)` of the
  * right-side payload over (ts, side, tieBreak) — right rows sort before
  * left rows at equal ts, so "at-or-before"/"at-or-after" are exact and
  * inclusive. Scanning the same union in DESCENDING ts order turns the
  * backward scan into the forward one; `nearest` evaluates both windows over
  * one shuffle (same partition keys — one exchange, two sorts) and picks per
  * row. One shuffle on the key, no per-row range scan, no pair explosion:
  * the cost profile of a sort-merge join, which is what survives 100 TB of
  * events. Spark has no native as-of join (pandas-on-Spark `merge_asof`
  * exists; this is the pure DataFrame shape of the same plan).
  *
  * Null semantics are the WINDOW's, not SQL's: NULL keys group together
  * (a NULL-key left row can match a NULL-key right row) and NULL-ts rows
  * participate in the scan order. Callers that need SQL's null-rejecting
  * join semantics must pre-filter the right side on key/ts IS NOT NULL and
  * null out matches for NULL-ts left rows — exactly what
  * [[graft.plans.AsOfLateralRewrite]] does before delegating here.
  */
object AsOfJoin {

  val Backward = "backward"
  val Forward = "forward"
  val Nearest = "nearest"

  /** Equal-distance resolution for [[Nearest]]: prefer the backward match
    * (merge_asof semantics, the default), or the higher tie value across
    * the two directions (SQL `ORDER BY abs(r.ts-l.ts), tie DESC` parity —
    * what [[graft.plans.AsOfLateralRewrite]] needs). */
  val TieBackward = "backward"
  val TieHighest = "highest"

  /** @param keys      equi-join key columns (both sides)
    * @param tsCol     event-time column (both sides, same numeric type)
    * @param tieCol    deterministic order among right rows sharing
    *                  (key, ts) — highest wins; must exist on the right
    * @param payload   right columns to attach (exposed as `asof.<name>`)
    * @param tolerance max allowed |left.ts - right.ts| (same unit as tsCol);
    *                  matches farther than this are nulled (merge-asof
    *                  semantics). None = unbounded.
    * @param direction  [[Backward]] (default), [[Forward]], or [[Nearest]]
    * @param nearestTie [[TieBackward]] (default) or [[TieHighest]] —
    *                   equal-distance resolution for [[Nearest]] only
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
           tieCol: String, payload: Seq[String],
           tolerance: Option[Long] = None,
           direction: String = Backward,
           nearestTie: String = TieBackward): DataFrame = {
    require(Seq(Backward, Forward, Nearest).contains(direction),
      s"direction must be backward|forward|nearest, got $direction")
    require(Seq(TieBackward, TieHighest).contains(nearestTie),
      s"nearestTie must be backward|highest, got $nearestTie")
    val payloadStruct = struct((Seq(tsCol, tieCol) ++ payload).distinct.map(col): _*)
    val r = right
      .withColumn("__rp", payloadStruct)
      .select((keys ++ Seq(tsCol, tieCol)).distinct.map(col) :+ col("__rp"): _*)
      .withColumn("__side", lit(0))
    val l = left.withColumn("__side", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
    // right rows (side 0) sort before left rows at equal ts on BOTH axes, so
    // the running last() sees an exactly-equal-ts right row — inclusive bound
    def running(w: WindowSpec): Column =
      last(col("__rp"), ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
    val wb = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc, col(tieCol).asc_nulls_first)
    val wf = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).desc, col("__side").asc, col(tieCol).asc_nulls_first)
    // null the match when it lies beyond the tolerance (delta is null-safe:
    // a null match yields a null delta and the `when` stays null)
    def clip(m: Column, delta: Column): Column = tolerance match {
      case None => m
      case Some(t) => when(delta <= t, m)
    }
    val matched = direction match {
      case Backward =>
        u.withColumn("asof", running(wb))
          .withColumn("asof", clip(col("asof"), col(tsCol) - col(s"asof.$tsCol")))
      case Forward =>
        u.withColumn("asof", running(wf))
          .withColumn("asof", clip(col("asof"), col(s"asof.$tsCol") - col(tsCol)))
      case Nearest =>
        val withBF = u.withColumn("__b", running(wb)).withColumn("__f", running(wf))
        val b = clip(col("__b"), col(tsCol) - col(s"__b.$tsCol"))
        val f = clip(col("__f"), col(s"__f.$tsCol") - col(tsCol))
        val db = col(tsCol) - col(s"__bc.$tsCol")
        val df = col(s"__fc.$tsCol") - col(tsCol)
        val onTie = // equal |delta|: merge_asof keeps backward; SQL-abs keeps
          // max tie (NULL tie loses, as DESC nulls-last ordering would)
          if (nearestTie == TieBackward) col("__bc")
          else when(col(s"__fc.$tieCol").isNull ||
              col(s"__bc.$tieCol") >= col(s"__fc.$tieCol"), col("__bc"))
            .otherwise(col("__fc"))
        withBF
          .withColumn("__bc", b).withColumn("__fc", f)
          .withColumn("asof",
            when(col("__bc").isNull, col("__fc"))
              .when(col("__fc").isNull, col("__bc"))
              .when(db < df, col("__bc"))
              .when(df < db, col("__fc"))
              .otherwise(onTie))
          .drop("__b", "__f", "__bc", "__fc")
    }
    matched.filter(col("__side") === 1).drop("__side", "__rp")
  }

  /** Hot-key-safe as-of join: [[asOf]] windows by the join key alone, so one
    * pathological key (a null/default IP, a monitoring heartbeat) funnels
    * its entire timeline through ONE task — and window exchanges get no AQE
    * skew splitting the way joins do. This variant is the parallel
    * prefix-scan fix: the timeline is cut into `ts div bucketWidth` buckets,
    * the running scan partitions by (key, bucket) — a hot key now spreads
    * over range/bucketWidth tasks — and each bucket's carry-in (the match a
    * row would have taken from EARLIER buckets) arrives as one synthetic
    * right row per (key, bucket), computed by a prefix scan over the
    * bucket-summary table (|keys|·|buckets| rows, negligible) and unioned
    * into the main scan where it sorts first in its bucket by construction
    * (its ts precedes the bucket's range). Same rows as [[asOf]] for every
    * direction/tolerance (proven exhaustively in AsOfSkewSpec), same
    * single-shuffle cost profile on the fact table — one extra tiny
    * aggregation + window over bucket summaries.
    *
    * `tsCol` and `tieCol` must be numeric here (the bucket arithmetic and
    * the forward-first ordering negate them); rows with a NULL ts land in a
    * NULL bucket — pre-filter them (asOf's window semantics for NULL ts do
    * not carry over to the stitched scan). Bucket assignment is exact long
    * arithmetic (`(ts - pmod(ts, w)) div w`), never a double round-trip —
    * doubles collapse longs past 2^53 and this repo's event timestamps are
    * epoch NANOS (~2^60.6), where a rounded bucket near a boundary would
    * silently mis-stitch the carry.
    *
    * WHEN to use it: the stitch pays one extra pass over the union (the
    * bucket markers) plus summary-sized jobs — measured ~1.8x the wall of
    * [[asOf]] at local toy scale (400k rows, 90% one key), where a single
    * in-memory sort is unbeatable. It is the 100 TB insurance, not a local
    * speedup: a key holding 90% of a cluster-scale table serializes asOf
    * onto ONE task (spill, straggle, or OOM), while this plan spreads that
    * key over range/bucketWidth tasks and every stage stays bounded.
    */
  def asOfSkewed(left: DataFrame, right: DataFrame, keys: Seq[String],
                 tsCol: String, tieCol: String, payload: Seq[String],
                 bucketWidth: Long, tolerance: Option[Long] = None,
                 direction: String = Backward,
                 nearestTie: String = TieBackward): DataFrame = {
    require(Seq(Backward, Forward, Nearest).contains(direction),
      s"direction must be backward|forward|nearest, got $direction")
    require(Seq(TieBackward, TieHighest).contains(nearestTie),
      s"nearestTie must be backward|highest, got $nearestTie")
    require(bucketWidth > 0, s"bucketWidth must be positive (got $bucketWidth)")
    // exact long floor-division: ts - pmod(ts, w) is the floor multiple of w
    // (pmod is non-negative), and `div` divides it exactly as longs — no
    // double in the path, so epoch-nanos (> 2^53) bucket correctly
    def bucketed(df: DataFrame): DataFrame = df.withColumn("__bk",
      expr(s"(`$tsCol` - pmod(`$tsCol`, ${bucketWidth}L)) div ${bucketWidth}L"))
    val payloadStruct = struct((Seq(tsCol, tieCol) ++ payload).distinct.map(col): _*)
    val r = right
      .withColumn("__rp", payloadStruct)
      .select((keys ++ Seq(tsCol, tieCol)).distinct.map(col) :+ col("__rp"): _*)
      .withColumn("__side", lit(0))
    val l = left.withColumn("__side", lit(1))
    val u = bucketed(l.unionByName(r, allowMissingColumns = true))
    val kb = (keys :+ "__bk").map(col)

    // ---- carry computation: one prefix scan over bucket summaries --------
    // per (key, bucket): the best right a LATER (backward) / EARLIER
    // (forward) bucket would inherit. max_by orders (ts, tie) for backward
    // (latest wins) and (-ts, tie) for forward (earliest ts, highest tie).
    val rb = bucketed(r)
    def carryRows(forward: Boolean): DataFrame = {
      val best = rb.groupBy(kb: _*).agg(
        max_by(col("__rp"), if (forward)
          struct((-col(tsCol)).as("o1"), col(tieCol).as("o2"))
        else struct(col(tsCol).as("o1"), col(tieCol).as("o2"))).as("__last"))
      // markers = every (key, bucket) the scan will contain; they sort
      // BEFORE their own bucket's summary so the running value at a marker
      // covers strictly-earlier (or strictly-later, forward) buckets only
      val markers = u.select(kb: _*).distinct()
        .withColumn("__last", lit(null).cast(best.schema("__last").dataType))
        .withColumn("__m", lit(0))
      val ord = if (forward) Seq(col("__bk").desc, col("__m").asc)
        else Seq(col("__bk").asc, col("__m").asc)
      val wc = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, 0)
      markers.unionByName(best.withColumn("__m", lit(1)))
        .withColumn("__carry", last(col("__last"), ignoreNulls = true).over(wc))
        .filter(col("__m") === 0 && col("__carry").isNotNull)
        .select((keys.map(col) :+ col("__bk") :+
          col("__carry").as("__rp") :+
          col(s"__carry.$tsCol").as(tsCol) :+
          col(s"__carry.$tieCol").as(tieCol) :+ lit(0).as("__side")): _*)
    }

    def stitched(forward: Boolean): (DataFrame => DataFrame) = { base =>
      val withCarry = base.unionByName(carryRows(forward),
        allowMissingColumns = true)
      val ord = if (forward)
        Seq(col(tsCol).desc, col("__side").asc, col(tieCol).asc_nulls_first)
      else Seq(col(tsCol).asc, col("__side").asc, col(tieCol).asc_nulls_first)
      val w = Window.partitionBy(kb: _*).orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, 0)
      val colName = if (forward) "__f" else "__b"
      withCarry.withColumn(colName,
        last(col("__rp"), ignoreNulls = true).over(w))
    }
    def clip(m: Column, delta: Column): Column = tolerance match {
      case None => m
      case Some(t) => when(delta <= t, m)
    }

    val matched = direction match {
      case Backward =>
        stitched(forward = false)(u)
          .withColumn("asof",
            clip(col("__b"), col(tsCol) - col(s"__b.$tsCol")))
      case Forward =>
        stitched(forward = true)(u)
          .withColumn("asof",
            clip(col("__f"), col(s"__f.$tsCol") - col(tsCol)))
      case Nearest =>
        // forward carries are extra rows the backward scan must not see
        // (and vice versa): mark each carry with its direction and null the
        // other scan's view of it
        val cb = carryRows(forward = false).withColumn("__cdir", lit("b"))
        val cf = carryRows(forward = true).withColumn("__cdir", lit("f"))
        val all = u.withColumn("__cdir", lit(null).cast("string"))
          .unionByName(cb, allowMissingColumns = true)
          .unionByName(cf, allowMissingColumns = true)
          .withColumn("__rpb",
            when(col("__cdir").isNull || col("__cdir") === "b", col("__rp")))
          .withColumn("__rpf",
            when(col("__cdir").isNull || col("__cdir") === "f", col("__rp")))
        val wb2 = Window.partitionBy(kb: _*)
          .orderBy(col(tsCol).asc, col("__side").asc, col(tieCol).asc_nulls_first)
          .rowsBetween(Window.unboundedPreceding, 0)
        val wf2 = Window.partitionBy(kb: _*)
          .orderBy(col(tsCol).desc, col("__side").asc, col(tieCol).asc_nulls_first)
          .rowsBetween(Window.unboundedPreceding, 0)
        val scanned = all
          .withColumn("__b", last(col("__rpb"), ignoreNulls = true).over(wb2))
          .withColumn("__f", last(col("__rpf"), ignoreNulls = true).over(wf2))
        val b = clip(col("__b"), col(tsCol) - col(s"__b.$tsCol"))
        val f = clip(col("__f"), col(s"__f.$tsCol") - col(tsCol))
        val onTie = // same equal-distance resolution as [[asOf]]
          if (nearestTie == TieBackward) col("__bc")
          else when(col(s"__fc.$tieCol").isNull ||
              col(s"__bc.$tieCol") >= col(s"__fc.$tieCol"), col("__bc"))
            .otherwise(col("__fc"))
        scanned
          .withColumn("__bc", b).withColumn("__fc", f)
          .withColumn("asof",
            when(col("__bc").isNull, col("__fc"))
              .when(col("__fc").isNull, col("__bc"))
              .when(col(tsCol) - col(s"__bc.$tsCol") <
                    col(s"__fc.$tsCol") - col(tsCol), col("__bc"))
              .when(col(s"__fc.$tsCol") - col(tsCol) <
                    col(tsCol) - col(s"__bc.$tsCol"), col("__fc"))
              .otherwise(onTie))
          .drop("__cdir", "__rpb", "__rpf", "__b", "__f", "__bc", "__fc")
    }
    matched.filter(col("__side") === 1)
      .drop("__side", "__rp", "__bk", "__b", "__f")
  }
}
