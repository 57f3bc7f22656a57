package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-K patterns (SURVEY T1-T6).
  *
  * The reference either sorts globally and `take(K)`s to the driver
  * (DnsRptCH.scala:577-600 — a 70k-row driver round-trip) or groupByKey +
  * in-memory per-group sort (OOM-prone, :647-650). Spark-native:
  *
  *  - global: `orderBy().limit(K)` → TakeOrderedAndProject — each partition
  *    keeps a size-K heap, only K rows ever move; no full sort, no driver hop.
  *  - per-group: `row_number()` over a window + `<= K` filter — Spark's
  *    InferWindowGroupLimit pushes the limit into the shuffle (partial top-K
  *    per map task), so the exchange carries ≤ K·groups·partitions rows.
  *
  * Callers must pass a TOTAL order (tie-break on a unique key) or results are
  * nondeterministic across runs/engines.
  */
object TopK {

  /** Global top-K: TakeOrderedAndProject, never a full sort. */
  def global(df: DataFrame, k: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** Per-group top-K, rank column retained as `rn`. */
  def perGroup(df: DataFrame, k: Int, partitionBy: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(partitionBy: _*).orderBy(order: _*)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }
}
