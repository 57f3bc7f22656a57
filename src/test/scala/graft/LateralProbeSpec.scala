package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Documents WHY graft.operators.AsOfJoin exists: the SQL spelling of an
  * as-of join (LEFT JOIN LATERAL ... ORDER BY ts DESC LIMIT 1) is correct
  * on Spark 4.1 but decorrelates to a BroadcastNestedLoopJoin on the range
  * predicate — every right row pairs with every distinct left timestamp
  * at-or-after it, O(|left ts| · |right|) work and a broadcast of a
  * fact-sized side. AsOfJoin.asOf computes the same rows with one key
  * shuffle + running window. If a future Spark version plans this shape
  * sanely, this test will flag it and the guidance can be revisited. */
class LateralProbeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("native lateral as-of decorrelates to a nested-loop pair explosion") {
    Seq((1L, 10L), (1L, 20L)).toDF("k", "ts").createOrReplaceTempView("lp_l")
    Seq((1L, 5L, 100L), (1L, 15L, 101L)).toDF("k", "ts", "id")
      .createOrReplaceTempView("lp_r")
    val df = spark.sql("""
      SELECT l.k, l.ts, m.id
      FROM lp_l l LEFT JOIN LATERAL (
        SELECT r.id FROM lp_r r
        WHERE r.k = l.k AND r.ts <= l.ts
        ORDER BY r.ts DESC, r.id DESC LIMIT 1
      ) m ON true""")
    // correct results...
    val rows = df.as[(Long, Long, Long)].collect().toSet
    assert(rows == Set((1L, 10L, 100L), (1L, 20L, 101L)))
    // ...from a plan that cannot scale
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(plan.toString.contains("BroadcastNestedLoopJoin"),
      s"Spark now plans lateral as-of without a nested loop — revisit:\n$plan")
  }
}
