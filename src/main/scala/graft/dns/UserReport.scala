package graft.dns

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's third entry point, `UserRpt.main` (UserRpt.scala:50-195):
  * a daily batch over the ``-separated middle data written per window
  * by K2 ([[graft.sinks.Sinks.middleData]]), producing the per-user reports
  * (A14-A16/T6). The reference's live body is commented out; the
  * computations are re-expressed as the pure report functions in
  * [[Reports]], shared with the streaming path.
  */
object UserReport {

  /** Parse a day of middle data: one `userNamedomaincount` line
    * per (user, domain, window); re-aggregated across windows to daily
    * grain before any ranking. */
  def readMiddleData(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(split(col("value"), "").as("f"))
      .select(element_at(col("f"), 1).as("userName"),
        element_at(col("f"), 2).as("domain"),
        element_at(col("f"), 3).cast("long").as("cnt"))
      .groupBy(col("userName"), col("domain"))
      .agg(sum(col("cnt")).as("cnt"))

  /** All three daily user reports from one shared (cached) daily aggregate:
    * (per-user top-N domain arrays, per-user totals, per-user tag sets). */
  def run(spark: SparkSession, middlePath: String, tagDim: DataFrame,
          topN: Int = 10): (DataFrame, DataFrame, DataFrame) = {
    val daily = readMiddleData(spark, middlePath)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (Reports.userDomainTopN(daily, topN),
      Reports.userTotals(daily),
      Reports.userTags(daily, tagDim))
  }
}
