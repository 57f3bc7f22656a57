package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing as the co-located-join scale path: both sides bucketed on the
  * join key with the same bucket count join WITHOUT a shuffle exchange —
  * the layout a 100 TB fact/fact join must be stored in so repeated joins
  * pay zero repartitioning. */
class BucketedJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("same-bucket join plans with no shuffle exchange on either side") {
    val wh = java.nio.file.Files.createTempDirectory("graft-buckets").toString
    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      graft.sinks.Sinks.bucketedTable(
        Seq.tabulate(1000)(i => (i.toLong, s"order$i")).toDF("k", "o"),
        "orders_b", s"$wh/orders_b", buckets = 8, "k")
      graft.sinks.Sinks.bucketedTable(
        Seq.tabulate(3000)(i => ((i % 1000).toLong, i.toLong)).toDF("k", "line"),
        "lines_b", s"$wh/lines_b", buckets = 8, "k")

      val joined = spark.table("orders_b").join(spark.table("lines_b"), "k")
      assert(joined.count() == 3000L)

      val executed = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // include materialized AQE stages: ShuffleQueryStageExec is a leaf
      // wrapper, so matching only ShuffleExchangeExec can assert nothing
      val shuffles = executed.collect {
        case s: ShuffleExchangeExec => s
        case s: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec => s
      }
      assert(shuffles.isEmpty && !executed.toString.contains("ShuffleExchange")
          && !executed.toString.contains("ShuffleQueryStage"),
        s"expected bucket-co-located join without exchanges, got:\n$executed")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lines_b")
    }
  }
}
