package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

/** Machine-checked scale properties of the headline plans — the "would this
  * survive 100 TB" invariants, asserted instead of eyeballed:
  *
  *  - filters and column pruning reach the parquet scan;
  *  - global top-K is TakeOrderedAndProject (K-heaps), never a full sort;
  *  - per-group top-K gets a WindowGroupLimit below the exchange;
  *  - dimension joins broadcast (no shuffle of the fact side);
  *  - the LSH self-join is a real equi-join, never a cartesian product.
  */
class PlanAuditSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def finalPlan(df: DataFrame): SparkPlan = {
    df.collect() // force AQE to finalize
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }
  private def planString(df: DataFrame): String = finalPlan(df).toString

  test("q02: predicate pushdown and column pruning reach the parquet scan") {
    val p = planString(Queries.byName("q02_scan_pushdown").fn(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,150000.0)]")
      || p.matches("(?s).*PushedFilters: \\[.*GreaterThan\\(o_totalprice.*"), p)
    // pruned read schema: only the 3 consumed columns, not the full table
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("o_orderkey") && read.contains("o_custkey")
      && read.contains("o_orderdate") && !read.contains("o_comment"), read)
  }

  test("global top-K plans as TakeOrderedAndProject, not a full sort+limit") {
    val agg = Queries.byName("q13_topk_two_stage").fn(spark, sf)
    val p = planString(agg)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("per-group top-K gets a WindowGroupLimit pushed below the exchange") {
    val p = planString(Queries.byName("q14_pergroup_topk").fn(spark, sf))
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("dimension equi-join broadcasts: no shuffle on the fact side") {
    val df = Queries.byName("q09_equi_join_default").fn(spark, sf)
    val plan = finalPlan(df)
    assert(plan.toString.contains("BroadcastHashJoin"), plan.toString)
    // the only exchanges allowed are for the final orderBy, not the join
    val shufflesBeforeJoin = plan.collect {
      case s: ShuffleExchangeExec
        if s.find(_.toString.contains("BroadcastHashJoin")).isDefined => s
    }
    assert(shufflesBeforeJoin.isEmpty,
      s"join input must not be shuffled: $shufflesBeforeJoin")
  }

  test("LSH candidate self-join is an equi-join on the band key, never cartesian") {
    val p = planString(Queries.byName("q30_minhash_candidates").fn(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("interval-index enrichment (q06) adds no exchange beyond the final sort") {
    val df = Queries.byName("q06_range_join_first").fn(spark, sf)
    val plan = finalPlan(df)
    // exactly the orderBy's range-partitioning exchange; the enrichment
    // itself (index probe + broadcast attr join) must be shuffle-free
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.size <= 1, s"expected at most the sort exchange: $shuffles")
  }
}
