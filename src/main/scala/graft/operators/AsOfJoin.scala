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

  /** @param keys      equi-join key columns (both sides)
    * @param tsCol     event-time column (both sides, same numeric type)
    * @param tieCol    deterministic order among right rows sharing
    *                  (key, ts) — highest wins; must exist on the right
    * @param payload   right columns to attach (exposed as `asof.<name>`)
    * @param tolerance max allowed |left.ts - right.ts| (same unit as tsCol);
    *                  matches farther than this are nulled (merge-asof
    *                  semantics). None = unbounded.
    * @param direction [[Backward]] (default), [[Forward]], or [[Nearest]]
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
           tieCol: String, payload: Seq[String],
           tolerance: Option[Long] = None,
           direction: String = Backward): DataFrame = {
    require(Seq(Backward, Forward, Nearest).contains(direction),
      s"direction must be backward|forward|nearest, got $direction")
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
        withBF
          .withColumn("__bc", b).withColumn("__fc", f)
          .withColumn("asof",
            when(col("__bc").isNull, col("__fc"))
              .when(col("__fc").isNull, col("__bc"))
              .when(col(tsCol) - col(s"__bc.$tsCol") <=
                    col(s"__fc.$tsCol") - col(tsCol), col("__bc")) // tie → backward
              .otherwise(col("__fc")))
          .drop("__b", "__f", "__bc", "__fc")
    }
    matched.filter(col("__side") === 1).drop("__side", "__rp")
  }
}
