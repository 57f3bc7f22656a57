package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with
  * `right.ts <= left.ts` on the same key.
  *
  * Composed from built-ins (custom-operator preference order (a)): tag the
  * two sides, union them, and take a running `last(ignoreNulls)` of the
  * right-side payload over (ts, side, tieBreak) — right rows sort before
  * left rows at equal ts, so "at-or-before" is exact. One shuffle on the
  * key, no per-row range scan, no pair explosion: the cost profile of a
  * sort-merge join, which is what survives 100 TB of events. Spark has no
  * native as-of join (pandas-on-Spark `merge_asof` exists; this is the pure
  * DataFrame shape of the same plan).
  */
object AsOfJoin {

  /** @param keys      equi-join key columns (both sides)
    * @param tsCol     event-time column (both sides, same numeric type)
    * @param tieCol    deterministic order among right rows sharing
    *                  (key, ts) — highest wins; must exist on the right
    * @param payload   right columns to attach (exposed as `asof.<name>`)
    * @param tolerance max allowed `left.ts - right.ts` (same unit as tsCol);
    *                  matches older than this are nulled (merge-asof
    *                  semantics). None = unbounded lookback.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
           tieCol: String, payload: Seq[String],
           tolerance: Option[Long] = None): DataFrame = {
    val payloadStruct = struct((Seq(tsCol, tieCol) ++ payload).distinct.map(col): _*)
    val r = right
      .withColumn("__rp", payloadStruct)
      .select((keys ++ Seq(tsCol, tieCol)).distinct.map(col) :+ col("__rp"): _*)
      .withColumn("__side", lit(0))
    val l = left.withColumn("__side", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc, col(tieCol).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = u.withColumn("asof", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__rp")
    tolerance match {
      case None => matched
      case Some(t) => matched.withColumn("asof",
        when(col(tsCol) - col(s"asof.$tsCol") <= t, col("asof")))
    }
  }
}
