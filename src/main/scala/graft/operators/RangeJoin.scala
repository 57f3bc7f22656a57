package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-interval (range) joins — the reference's core enrichment pattern
  * (client-IP→clientName, aip→business resource, aip→inNet; see
  * /root/reference DnsRptCH.scala:927-930, 590-596, 222-235).
  *
  * The reference collect()s each rule table to the driver and linear-scans it
  * per row. Spark-native shape: `fact JOIN broadcast(dim) ON point BETWEEN
  * lo AND hi` → BroadcastNestedLoopJoin. Dimension tables here are small
  * (thousands of rules), facts are huge (100 TB): a broadcast NLJ is
  * shuffle-free on the fact side, which is the property that matters at
  * scale. Match-priority semantics (first/last) are restored with a window
  * over a dimension priority column.
  */
object RangeJoin {

  sealed trait MatchPolicy
  case object AllMatches extends MatchPolicy
  /** Keep the match with the LOWEST priority value (reference "first match",
    * DnsRptCH.scala:927-930). */
  case object FirstMatch extends MatchPolicy
  /** Keep the match with the HIGHEST priority value (reference "last match
    * wins" loop-overwrite, DnsRptCH.scala:590-596). */
  case object LastMatch extends MatchPolicy

  /** Left-outer point-in-interval join.
    *
    * @param fact      large table
    * @param dim       small interval table (will be broadcast)
    * @param point     column of `fact` to probe
    * @param lo, hi    inclusive bounds in `dim`
    * @param priority  dim column ordering competing matches (FirstMatch keeps
    *                  min, LastMatch keeps max); required unless AllMatches
    * @param factKeys  unique key of `fact` rows used to dedupe multi-matches
    */
  def pointInInterval(
      fact: DataFrame, dim: DataFrame,
      point: Column, lo: Column, hi: Column,
      policy: MatchPolicy = AllMatches,
      priority: Column = lit(0),
      factKeys: Seq[Column] = Nil): DataFrame = {
    val joined = fact.join(broadcast(dim), point >= lo && point <= hi, "left")
    policy match {
      case AllMatches => joined
      case FirstMatch | LastMatch =>
        require(factKeys.nonEmpty, "factKeys required for first/last-match dedup")
        val ord = if (policy == FirstMatch) priority.asc_nulls_last else priority.desc_nulls_last
        val w = Window.partitionBy(factKeys: _*).orderBy(ord)
        joined.withColumn("__rj_rn", row_number().over(w))
          .filter(col("__rj_rn") === 1).drop("__rj_rn")
    }
  }
}
