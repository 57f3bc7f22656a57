package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** The SQL spelling of an as-of join (LEFT JOIN LATERAL … ORDER BY ts DESC
  * LIMIT 1): Spark 4.1's own decorrelation plans it as a
  * BroadcastNestedLoopJoin on the range predicate — every right row pairs
  * with every distinct left timestamp at-or-after it, O(|left ts|·|right|)
  * work and a broadcast of a fact-sized side. `AsOfLateralRewrite`
  * (injected by GraftExtensions, toggled by spark.graft.asofLateralRewrite)
  * intercepts the LateralJoin before decorrelation and plans the
  * [[graft.operators.AsOfJoin]] union+window shape instead: same rows, one
  * key shuffle, no nested loop. */
class LateralProbeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val sql = """
    SELECT l.k, l.ts, m.id
    FROM lp_l l LEFT JOIN LATERAL (
      SELECT r.id FROM lp_r r
      WHERE r.k = l.k AND r.ts <= l.ts
      ORDER BY r.ts DESC, r.id DESC LIMIT 1
    ) m ON true"""

  private def mkViews(): Unit = {
    Seq((1L, 10L), (1L, 20L), (2L, 7L), (3L, 5L))
      .toDF("k", "ts").createOrReplaceTempView("lp_l")
    Seq((1L, 5L, 100L), (1L, 10L, 101L), (1L, 10L, 102L), (1L, 15L, 103L),
      (2L, 9L, 104L))
      .toDF("k", "ts", "id").createOrReplaceTempView("lp_r")
  }

  private def finalPlan(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  private def withRewrite[T](on: Boolean)(f: => T): T = {
    spark.conf.set("spark.graft.asofLateralRewrite", on.toString)
    try f finally spark.conf.unset("spark.graft.asofLateralRewrite")
  }

  test("native decorrelation pays a nested-loop pair explosion (baseline)") {
    mkViews()
    val plan = withRewrite(on = false) { finalPlan(spark.sql(sql)) }
    assert(plan.toString.contains("BroadcastNestedLoopJoin"),
      s"Spark now plans lateral as-of without a nested loop — revisit:\n$plan")
  }

  test("AsOfLateralRewrite plans the same query nested-loop-free, same rows") {
    mkViews()
    val expected = withRewrite(on = false) {
      spark.sql(sql).as[(Long, Long, Option[Long])].collect().toSet
    }
    withRewrite(on = true) {
      val df = spark.sql(sql)
      val got = df.as[(Long, Long, Option[Long])].collect().toSet
      assert(got == expected, "rewrite changed the query's rows")
      val plan = finalPlan(df)
      assert(!plan.toString.contains("BroadcastNestedLoopJoin"),
        s"rewrite did not remove the nested loop:\n$plan")
      assert(plan.toString.contains("Window"), s"expected the as-of window:\n$plan")
    }
  }

  test("inner lateral join and multi-column payloads rewrite correctly") {
    mkViews()
    val q = """
      SELECT l.k, l.ts, m.id, m.es
      FROM lp_l l JOIN LATERAL (
        SELECT r.id, r.ts AS es FROM lp_r r
        WHERE r.k = l.k AND r.ts <= l.ts
        ORDER BY r.ts DESC, r.id DESC LIMIT 1
      ) m ON true
      ORDER BY l.k, l.ts"""
    val expected = withRewrite(on = false) {
      spark.sql(q).as[(Long, Long, Long, Long)].collect().toSeq
    }
    withRewrite(on = true) {
      val df = spark.sql(q)
      val got = df.as[(Long, Long, Long, Long)].collect().toSeq
      assert(got == expected, "inner-join rewrite changed the rows")
      // INNER drops the unmatched lefts (keys 2 pre-right and 3 no-right)
      assert(got.map(_._1).toSet == Set(1L))
      // the aliased payload (r.ts AS es) must not defeat the matcher
      assert(!finalPlan(df).toString.contains("BroadcastNestedLoopJoin"),
        "rewrite did not fire on an aliased payload")
    }
  }

  test("the forward shape (>= with ASC sort) rewrites nested-loop-free too") {
    mkViews()
    val q = sql.replace("r.ts <= l.ts", "r.ts >= l.ts")
      .replace("ORDER BY r.ts DESC", "ORDER BY r.ts ASC")
    val expected = withRewrite(on = false) {
      spark.sql(q).as[(Long, Long, Option[Long])].collect().toSet
    }
    withRewrite(on = true) {
      val df = spark.sql(q)
      assert(df.as[(Long, Long, Option[Long])].collect().toSet == expected,
        "forward rewrite changed the rows")
      assert(!finalPlan(df).toString.contains("BroadcastNestedLoopJoin"),
        "forward shape fell back to the nested loop")
    }
  }

  test("a tolerance bound (merge_asof spelling) rewrites and clips matches") {
    mkViews()
    val q = sql.replace("r.ts <= l.ts", "r.ts <= l.ts AND r.ts >= l.ts - 3")
    val expected = withRewrite(on = false) {
      spark.sql(q).as[(Long, Long, Option[Long])].collect().toSet
    }
    withRewrite(on = true) {
      val df = spark.sql(q)
      val got = df.as[(Long, Long, Option[Long])].collect().toSet
      assert(got == expected, "tolerance rewrite changed the rows")
      // key 2's left (ts 7) has a right only at ts 9 > 7: no match; left 1
      // at ts 20 is 5 past its latest right (ts 15) -> clipped by tol 3
      assert(got.contains((1L, 20L, None)) && got.contains((2L, 7L, None)))
      assert(!finalPlan(df).toString.contains("BroadcastNestedLoopJoin"),
        "tolerance shape fell back to the nested loop")
    }
  }

  test("nullable keys/ts/ties keep SQL null semantics in both directions") {
    // the correlated predicates are null-rejecting; the window plan is not.
    // NULL-key rows must never match each other, a NULL-ts left must match
    // nothing (the forward window's nulls-last desc sort is the trap), and
    // a NULL tie must stay matchABLE (it only loses the ordering). The
    // payload v is separate from the tie so a matched-NULL-tie row is
    // distinguishable from no match.
    Seq[(Option[Long], Option[Long])](
      (Some(1L), Some(10L)), // normal: matches
      (Some(1L), None),      // NULL ts: no match either direction
      (None, Some(20L)),     // NULL key: no match (rights with NULL k dropped)
      (Some(2L), Some(7L)),  // its only candidate right has a NULL tie
      (Some(3L), Some(9L)))  // rights at same ts: NULL tie loses to id 300
      .toDF("k", "ts").createOrReplaceTempView("lp_nl")
    Seq[(Option[Long], Option[Long], Option[Long], Long)](
      (Some(1L), Some(5L), Some(100L), 1005L),
      (Some(1L), None, Some(101L), 9999L),     // NULL ts right: never matches
      (None, Some(1L), Some(102L), 9998L),     // NULL key right: never matches
      (Some(2L), Some(6L), None, 2006L),       // NULL tie, sole candidate: matches
      (Some(3L), Some(4L), None, 9997L),       // NULL tie loses to...
      (Some(3L), Some(4L), Some(300L), 3004L)) // ...this one at the same ts
      .toDF("k", "ts", "id", "v").createOrReplaceTempView("lp_nr")
    val bwd = """
      SELECT l.k, l.ts, m.v
      FROM lp_nl l LEFT JOIN LATERAL (
        SELECT r.v FROM lp_nr r
        WHERE r.k = l.k AND r.ts <= l.ts
        ORDER BY r.ts DESC, r.id DESC LIMIT 1
      ) m ON true"""
    val fwd = bwd.replace("r.ts <= l.ts", "r.ts >= l.ts")
      .replace("ORDER BY r.ts DESC", "ORDER BY r.ts ASC")
    for (q <- Seq(bwd, fwd)) {
      val expected = withRewrite(on = false) {
        spark.sql(q).as[(Option[Long], Option[Long], Option[Long])].collect().toSet
      }
      withRewrite(on = true) {
        val df = spark.sql(q)
        val got = df.as[(Option[Long], Option[Long], Option[Long])].collect().toSet
        assert(got == expected, s"null semantics diverged for: $q")
        assert(!finalPlan(df).toString.contains("BroadcastNestedLoopJoin"),
          "nullable attributes made the rewrite fall back")
      }
    }
    // pin the backward rows (independent of native execution)
    val pinned = withRewrite(on = true) {
      spark.sql(bwd).as[(Option[Long], Option[Long], Option[Long])].collect().toSet
    }
    assert(pinned == Set(
      (Some(1L), Some(10L), Some(1005L)), // normal match
      (Some(1L), None, None),             // NULL-ts left: unmatched
      (None, Some(20L), None),            // NULL-key left: unmatched
      (Some(2L), Some(7L), Some(2006L)),  // NULL-tie sole candidate DID match
      (Some(3L), Some(9L), Some(3004L)))) // NULL tie lost to id 300 at equal ts
  }

  test("the rewrite leaves non-as-of lateral shapes to Spark") {
    mkViews()
    // LIMIT 2 (not an as-of), ascending sort, no tie-break: all must fall
    // through to native planning and stay correct
    val shapes = Seq(
      sql.replace("LIMIT 1", "LIMIT 2"),
      sql.replace("ORDER BY r.ts DESC, r.id DESC", "ORDER BY r.ts ASC, r.id ASC"),
      sql.replace(", r.id DESC", ""))
    withRewrite(on = true) {
      shapes.foreach { q =>
        val rows = spark.sql(q).collect()
        assert(rows.nonEmpty, s"shape failed under the rule: $q")
      }
    }
  }

  test("the nearest spelling (ORDER BY abs) runs ONLY through the rewrite") {
    mkViews()
    val unbounded = """
      SELECT l.k, l.ts, m.id
      FROM lp_l l LEFT JOIN LATERAL (
        SELECT r.id FROM lp_r r
        WHERE r.k = l.k
        ORDER BY abs(r.ts - l.ts) ASC, r.id DESC LIMIT 1
      ) m ON true"""
    val bounded = unbounded.replace("WHERE r.k = l.k",
      "WHERE r.k = l.k AND r.ts >= l.ts - 4 AND r.ts <= l.ts + 4")
    // native Spark REJECTS outer references in a lateral ORDER BY — the
    // nearest spelling is a capability the rewrite ADDS, not a speedup
    withRewrite(on = false) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(unbounded).collect()
      }
      assert(e.getMessage.contains("outer"), e.getMessage)
    }
    withRewrite(on = true) {
      for (q <- Seq(unbounded, bounded)) {
        val df = spark.sql(q)
        df.collect()
        assert(!finalPlan(df).toString.contains("BroadcastNestedLoopJoin"))
        assert(graft.plans.AsOfLateralRewrite.lastMiss.get() == null)
      }
      // rows must equal the batch operator with SQL tie semantics
      // (equal |delta| -> max tie across directions)
      import graft.operators.AsOfJoin
      def viaOp(tol: Option[Long]) = AsOfJoin.asOf(
          spark.table("lp_l"), spark.table("lp_r"), Seq("k"), "ts", "id",
          Seq("id"), tol, AsOfJoin.Nearest, AsOfJoin.TieHighest)
        .selectExpr("k", "ts", "asof.id")
        .as[(Long, Long, Option[Long])].collect().toSet
      val gotU = spark.sql(unbounded)
        .as[(Long, Long, Option[Long])].collect().toSet
      assert(gotU == viaOp(None), "unbounded nearest != batch AsOfJoin")
      // pins: left (1,10) is 0 from both id 101 and 102 -> max tie 102;
      // (1,20) is 5 from ts 15 -> 103; (2,7) is 2 from ts 9 -> 104;
      // (3,5) has no rights -> null
      assert(gotU == Set((1L, 10L, Some(102L)), (1L, 20L, Some(103L)),
        (2L, 7L, Some(104L)), (3L, 5L, None)), s"got $gotU")
      val gotB = spark.sql(bounded)
        .as[(Long, Long, Option[Long])].collect().toSet
      assert(gotB == viaOp(Some(4L)), "bounded nearest != batch AsOfJoin")
      // tolerance 4 clips (1,20)'s distance-5 match
      assert(gotB.contains((1L, 20L, None)), s"got $gotB")
    }
  }

  test("computed payloads and right-only predicates rewrite nested-loop-free") {
    mkViews()
    // SELECT r.id * 2 (computed payload) + r.id > 100 (right-only conjunct):
    // both previously fell back to the pair explosion
    val q = """
      SELECT l.k, l.ts, m.did
      FROM lp_l l LEFT JOIN LATERAL (
        SELECT r.id * 2 AS did FROM lp_r r
        WHERE r.k = l.k AND r.ts <= l.ts AND r.id > 100
        ORDER BY r.ts DESC, r.id DESC LIMIT 1
      ) m ON true"""
    val expected = withRewrite(on = false) {
      spark.sql(q).as[(Long, Long, Option[Long])].collect().toSet
    }
    withRewrite(on = true) {
      val df = spark.sql(q)
      val got = df.as[(Long, Long, Option[Long])].collect().toSet
      assert(got == expected, "computed-payload rewrite changed the rows")
      assert(!finalPlan(df).toString.contains("BroadcastNestedLoopJoin"),
        "computed payload / right-only predicate fell back to the nested loop")
      assert(graft.plans.AsOfLateralRewrite.lastMiss.get() == null,
        "a successful rewrite must clear lastMiss")
    }
  }

  test("skew config plans the bucketed stitched scan, same rows") {
    // a 90%-hot key through the SAME lateral SQL: with
    // spark.graft.asofSkewBucketWidth set, the rewrite must dispatch to
    // asOfSkewed (the window exchange hashes on __bk too) and return
    // row-identical results to the plain rewrite — for the backward AND
    // the nearest (abs) spellings, which exercise TieHighest under skew
    val rnd = new scala.util.Random(41L)
    def key() = if (rnd.nextInt(10) < 9) 0L else 1L + rnd.nextInt(3)
    Seq.tabulate(2000)(i => (key(), rnd.nextInt(5000).toLong))
      .toDF("k", "ts").createOrReplaceTempView("lp_l")
    Seq.tabulate(2000)(i => (key(), rnd.nextInt(5000).toLong, 100L + i))
      .toDF("k", "ts", "id").createOrReplaceTempView("lp_r")
    val nearestSql = """
      SELECT l.k, l.ts, m.id
      FROM lp_l l LEFT JOIN LATERAL (
        SELECT r.id FROM lp_r r
        WHERE r.k = l.k
        ORDER BY abs(r.ts - l.ts) ASC, r.id DESC LIMIT 1
      ) m ON true"""
    val skewKey = graft.plans.AsOfLateralRewrite.skewWidthKey
    withRewrite(on = true) {
      for (q <- Seq(sql, nearestSql)) {
        val plain = spark.sql(q).as[(Long, Long, Option[Long])].collect().toSet
        spark.conf.set(skewKey, "250")
        try {
          val df = spark.sql(q)
          val got = df.as[(Long, Long, Option[Long])].collect().toSet
          assert(got == plain, "skew-dispatched lateral changed the rows")
          val plan = finalPlan(df)
          assert(plan.toString.contains("__bk"),
            s"skew config did not plan the bucketed scan:\n$plan")
          assert(!plan.toString.contains("BroadcastNestedLoopJoin"))
        } finally spark.conf.unset(skewKey)
      }
      // non-numeric tie: falls back to the plain window plan, still correct
      Seq((1L, 10L, "a"), (1L, 5L, "b")).toDF("k", "ts", "sid")
        .createOrReplaceTempView("lp_rs")
      val qs = """
        SELECT l.k, l.ts, m.sid
        FROM lp_l l LEFT JOIN LATERAL (
          SELECT r.sid FROM lp_rs r
          WHERE r.k = l.k AND r.ts <= l.ts
          ORDER BY r.ts DESC, r.sid DESC LIMIT 1
        ) m ON true"""
      val plainS = spark.sql(qs).as[(Long, Long, Option[String])].collect().toSet
      spark.conf.set(skewKey, "250")
      try {
        val df = spark.sql(qs)
        val got = df.as[(Long, Long, Option[String])].collect().toSet
        assert(got == plainS, "non-numeric fallback changed the rows")
        assert(!finalPlan(df).toString.contains("__bk"),
          "non-numeric tie must fall back to the plain as-of window")
      } finally spark.conf.unset(skewKey)
    }
  }

  test("a near-miss as-of shape names its disqualifier before falling back") {
    mkViews()
    withRewrite(on = true) {
      // missing tie-break: the one-detail-off shape the warning exists for
      val q1 = sql.replace(", r.id DESC", "")
      spark.sql(q1).collect()
      val m1 = graft.plans.AsOfLateralRewrite.lastMiss.get()
      assert(m1 != null && m1.contains("tie-break"), s"got: $m1")
      // payload referencing an OUTER column cannot be evaluated pre-join
      // (Spark rejects nondeterministic laterals outright, so outer-ref
      // payloads are the realistic payload disqualifier)
      val q2 = sql.replace("SELECT r.id", "SELECT r.id + l.k AS id")
      spark.sql(q2).collect()
      val m2 = graft.plans.AsOfLateralRewrite.lastMiss.get()
      assert(m2 != null && (m2.contains("payload") || m2.contains("outer")),
        s"got: $m2")
      // and a genuinely non-as-of lateral stays SILENT (no silhouette)
      val q3 = sql.replace("ORDER BY r.ts DESC, r.id DESC LIMIT 1", "LIMIT 1")
      spark.sql(q3).collect()
      assert(graft.plans.AsOfLateralRewrite.lastMiss.get() == null,
        "non-silhouette shapes must not warn")
    }
  }
}
