package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import graft.functions.{Functions => F}
import graft.operators.TopK

/** Batch 4: remaining SURVEY §2 shapes — grouping-sets unification of the
  * "all + per-client" report pairs, the per-user activity funnel
  * (A7/A12/A15/T2), substring-filtered aggregation (A13), authority-domain
  * roll-up top-K (T4), deterministic salted two-phase aggregation (A3/F10),
  * and JSON round-trip (F11/F13).
  */
/** Driver-gate evidence seam for the z-lake queries: q96's fn records the
  * lake path + pruning index it planned through; [[Verify]] prints the
  * per-file envelopes and the index's (kept, total) pruning decision to
  * stderr AFTER the query executes, so a driver-environment red carries
  * its own localization in the driver log. */
object ZLakeDiag {
  @volatile var lastIndex: Option[(String, graft.sources.ZLake.StatsFileIndex)] = None
  def report(tag: String): Unit = lastIndex.foreach { case (lake, idx) =>
    System.err.println(
      s"[$tag] lake=$lake lastPrune=${idx.lastPrune.get()} files=${idx.fes.size}")
    idx.fes.foreach { fe =>
      System.err.println(s"[$tag] file=${fe.status.getPath.getName} " +
        s"len=${fe.status.getLen} rows=${fe.rows} " +
        s"a=${fe.cols.get("a")} b=${fe.cols.get("b")} nulls=${fe.nullCounts}")
    }
  }
}

object QueriesOps {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Engine-agnostic rounding in DuckDB SQL (mirrors [[F.qround]]). */
  private def dkQround(e: String, decimals: Int): String = {
    val s = "1" + "0" * decimals
    s"CAST(floor(($e) * $s.0 + 0.5) AS DOUBLE) / $s.0"
  }

  /** 60-bit md5-prefix hash in DuckDB SQL (mirrors Kernels.hash60). */
  private def dkHash60(e: String): String =
    s"CAST(('0x' || substring(md5($e), 1, 15)) AS BIGINT)"

  val all: Vector[QueryDef] = Vector(

    // -- §7 design rule: one parameterized grouping replaces the reference's
    //    copy-pasted "all + per-client" pairs (A1-A4) — GROUPING SETS.
    QueryDef("q46_grouping_sets", Some("""
      SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
             count(*) AS cnt,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      ORDER BY rf, ls"""),
      (s, dir) => {
        val p = s"$dir/lineitem.parquet"
        s.sql(s"""
          SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
                 count(*) AS cnt,
                 CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
          FROM parquet.`$p`
          GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
          ORDER BY rf, ls""")
      }),

    // -- A7/A12/A15/T2: per-user agg with HAVING, then two-stage top-K -------
    QueryDef("q47_user_activity", Some("""
      WITH u AS (SELECT user_id, count(*) AS cnt,
                   CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS err_cnt,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum
                 FROM events GROUP BY 1 HAVING count(*) > 5),
      s1 AS (SELECT * FROM u ORDER BY val_sum DESC, user_id LIMIT 50)
      SELECT user_id, cnt, err_cnt, val_sum FROM s1
      ORDER BY err_cnt DESC, user_id LIMIT 10"""),
      (s, dir) => {
        val u = T(s, dir, "events").groupBy(col("user_id"))
          .agg(count(lit(1)).as("cnt"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("err_cnt"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("val_sum"))
          .filter(col("cnt") > 5)
        val s1 = TopK.global(u, 50, col("val_sum").desc, col("user_id").asc)
        TopK.global(s1, 10, col("err_cnt").desc, col("user_id").asc)
          .select(col("user_id"), col("cnt"), col("err_cnt"), col("val_sum"))
      }),

    // -- A13: substring-filtered multi-dim aggregate with threshold ----------
    QueryDef("q48_substring_filter_agg", Some("""
      SELECT p.p_brand, l.l_returnflag,
             CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS BIGINT) AS resolver,
             count(*) AS cnt
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE regexp_matches(p.p_name, '(red|blue|green)')
      GROUP BY 1, 2 HAVING sum(CAST(l.l_quantity AS DECIMAL(18,2))) > 50
      ORDER BY p_brand, l_returnflag"""),
      (s, dir) => T(s, dir, "lineitem")
        .join(broadcast(T(s, dir, "part").filter(col("p_name").rlike("(red|blue|green)"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("l_returnflag"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("bigint").as("resolver"),
          count(lit(1)).as("cnt"))
        .filter(col("resolver") > 50)
        .orderBy(col("p_brand"), col("l_returnflag"))),

    // -- T4: roll T3-style counts up by authority domain, re-rank top-K ------
    QueryDef("q49_authority_rollup_topk", Some(s"""
      WITH d AS (SELECT p_partkey, p_partkey % 4 AS code,
        lower(regexp_replace(p_name, '[^a-zA-Z0-9]', '', 'g')) || '.' ||
        (CASE p_partkey % 3 WHEN 0 THEN 'cdn.example.com' WHEN 1 THEN 'com.cn' ELSE 'net' END) AS domain
        FROM part),
      m AS (SELECT code, domain,
                   regexp_extract(domain, '${F.authorityDomainRegex}', 1) AS mm FROM d),
      a AS (SELECT code, CASE WHEN length(mm) > 0 THEN mm ELSE domain END AS authority FROM m),
      c AS (SELECT code, authority, count(*) AS cnt FROM a GROUP BY 1, 2),
      r AS (SELECT *, CAST(row_number() OVER (PARTITION BY code
                           ORDER BY cnt DESC, authority) AS BIGINT) AS rn FROM c)
      SELECT code, authority, cnt, rn FROM r WHERE rn <= 5 ORDER BY code, rn"""),
      (s, dir) => {
        val d = T(s, dir, "part")
          .select((col("p_partkey") % 4).as("code"),
            concat(lower(regexp_replace(col("p_name"), "[^a-zA-Z0-9]", "")), lit("."),
              element_at(array(lit("cdn.example.com"), lit("com.cn"), lit("net")),
                (col("p_partkey") % 3 + 1).cast("int"))).as("domain"))
        val c = d.withColumn("authority", F.authority_domain(col("domain")))
          .groupBy(col("code"), col("authority")).agg(count(lit(1)).as("cnt"))
        TopK.perGroup(c, 5, Seq(col("code")), Seq(col("cnt").desc, col("authority").asc))
          .withColumn("rn", col("rn").cast("long"))
          .select(col("code"), col("authority"), col("cnt"), col("rn"))
          .orderBy(col("code"), col("rn"))
      }),

    // -- A3/F10: deterministic salted two-phase aggregation. The salt spreads
    //    a hot key across 100 reducers in phase 1; phase 2 merges partials.
    //    Semantically identical to a plain count — which is the oracle.
    QueryDef("q50_salted_twophase", Some("""
      SELECT event_type, count(*) AS cnt FROM events
      GROUP BY 1 ORDER BY event_type"""),
      (s, dir) => T(s, dir, "events")
        .withColumn("salt", pmod(hash(col("event_id")), lit(100)))
        .groupBy(col("salt"), col("event_type")).agg(count(lit(1)).as("c1"))
        .groupBy(col("event_type")).agg(sum(col("c1")).as("cnt"))
        .orderBy(col("event_type"))),

    // -- F11/F13: JSON parse → struct → re-serialize round trip --------------
    QueryDef("q51_json_roundtrip", Some("""
      SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             '{"event_id":' || event_id || ',"k":' ||
               CAST(json_extract_string(props, '$.k') AS BIGINT) || '}' AS reserialized
      FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
      ORDER BY event_id"""),
      (s, dir) => T(s, dir, "events")
        .withColumn("k",
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.LongType)))).getField("k"))
        .filter(col("k").isNotNull)
        .withColumn("reserialized", to_json(struct(col("event_id"), col("k"))))
        .select(col("event_id"), col("k"), col("reserialized"))
        .orderBy(col("event_id"))),

    // -- §2.7 gap: distinct aggregation (reference only in dead code) --------
    QueryDef("q55_distinct_agg", Some("""
      SELECT n.n_name AS nation,
             CAST(count(DISTINCT o.o_orderpriority) AS BIGINT) AS priorities,
             CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS customers,
             count(*) AS cnt
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1 ORDER BY nation"""),
      (s, dir) => T(s, dir, "orders")
        .join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(T(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(countDistinct(col("o_orderpriority")).as("priorities"),
          countDistinct(col("c_custkey")).as("customers"),
          count(lit(1)).as("cnt"))
        .orderBy(col("nation"))),

    // -- as-of join: latest 'view' at-or-before each 'purchase' per user -----
    // (composed union+window operator — no native Spark as-of join)
    QueryDef("q56_asof_join", Some(s"""
      WITH e AS (SELECT event_id, user_id, event_type,
                        epoch_ns(ts)//1000000000 AS es FROM events),
      u AS (SELECT user_id, es, event_id, 1 AS side,
                   CAST(NULL AS BIGINT) AS r_id, CAST(NULL AS BIGINT) AS r_es
            FROM e WHERE event_type = 'purchase'
            UNION ALL
            SELECT user_id, es, event_id, 0 AS side, event_id, es
            FROM e WHERE event_type = 'view'),
      w AS (SELECT *,
              last_value(r_id IGNORE NULLS) OVER win AS view_id,
              last_value(r_es IGNORE NULLS) OVER win AS view_es
            FROM u WINDOW win AS (PARTITION BY user_id ORDER BY es, side, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT event_id AS purchase_id, user_id, CAST(es AS BIGINT) AS es,
             view_id, view_es
      FROM w WHERE side = 1 ORDER BY purchase_id"""),
      (s, dir) => {
        val e = T(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            expr("unix_micros(ts) div 1000000").as("es"))
        val out = graft.operators.AsOfJoin.asOf(
          left = e.filter(col("event_type") === "purchase").drop("event_type"),
          right = e.filter(col("event_type") === "view").drop("event_type"),
          keys = Seq("user_id"), tsCol = "es", tieCol = "event_id",
          payload = Seq("event_id"))
        out.select(col("event_id").as("purchase_id"), col("user_id"), col("es"),
            col("asof.event_id").as("view_id"), col("asof.es").as("view_es"))
          .orderBy(col("purchase_id"))
      }),

    // -- percentiles: exact interpolated quantiles per group. At 100 TB use
    //    approx_percentile (t-digest, mergeable partial agg) — exact here so
    //    the oracle can reproduce the value.
    QueryDef("q57_quantiles", Some(s"""
      SELECT event_type,
             ${dkQround("quantile_cont(CAST(value AS DOUBLE), 0.5)", 4)} AS p50,
             ${dkQround("quantile_cont(CAST(value AS DOUBLE), 0.9)", 4)} AS p90,
             ${dkQround("quantile_cont(CAST(value AS DOUBLE), 0.99)", 4)} AS p99,
             count(*) AS cnt
      FROM events GROUP BY 1 ORDER BY event_type"""),
      (s, dir) => T(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          F.qround(expr("percentile(CAST(value AS DOUBLE), 0.5)"), 4).as("p50"),
          F.qround(expr("percentile(CAST(value AS DOUBLE), 0.9)"), 4).as("p90"),
          F.qround(expr("percentile(CAST(value AS DOUBLE), 0.99)"), 4).as("p99"),
          count(lit(1)).as("cnt"))
        .orderBy(col("event_type"))),

    // -- SQL surface: the engine's functions callable from pure spark.sql ----
    // (registered via SparkSessionExtensions / GraftExtensions.register).
    QueryDef("q52_sql_functions", Some("""
      SELECT doc_id,
             CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h60,
             CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                  x -> len(x) > 0)) AS BIGINT) AS tok_cnt
      FROM documents ORDER BY doc_id"""),
      (s, dir) => {
        GraftExtensions.register(s)
        val p = s"$dir/documents.parquet"
        s.sql(s"""
          SELECT doc_id, graft_hash60(text) AS h60,
                 CAST(graft_token_count(text) AS BIGINT) AS tok_cnt
          FROM parquet.`$p` ORDER BY doc_id""")
      }),

    // -- SQL surface: plain BETWEEN join planned as the broadcast interval-
    //    index probe (graft.plans.IntervalJoinStrategy). Join semantics —
    //    EVERY overlapping rule row matches, unmatched facts null-extend —
    //    so the oracle is the literal same join in DuckDB. The plan shape
    //    (IntervalJoinExec, no shuffle, no BroadcastNestedLoopJoin) is
    //    machine-asserted in IntervalJoinSpec.
    QueryDef("q77_interval_join_sql", Some("""
      WITH dim AS (SELECT n_nationkey AS rid,
                          CAST(n_nationkey*37 % 150 AS BIGINT) AS lo,
                          CAST(n_nationkey*37 % 150 + 30 AS BIGINT) AS hi
                   FROM nation),
      f AS (SELECT c_custkey, CAST(c_custkey*11 % 200 AS BIGINT) AS pt
            FROM customer)
      SELECT f.c_custkey, f.pt, CAST(coalesce(d.rid, -1) AS BIGINT) AS rule_id
      FROM f LEFT JOIN dim d ON f.pt BETWEEN d.lo AND d.hi
      ORDER BY c_custkey, rule_id"""),
      (s, dir) => {
        GraftExtensions.register(s)
        T(s, dir, "nation").selectExpr("n_nationkey AS rid",
            "CAST(n_nationkey*37 % 150 AS BIGINT) AS lo",
            "CAST(n_nationkey*37 % 150 + 30 AS BIGINT) AS hi")
          .createOrReplaceTempView("q77_dim")
        T(s, dir, "customer").selectExpr("c_custkey",
            "CAST(c_custkey*11 % 200 AS BIGINT) AS pt")
          .createOrReplaceTempView("q77_fact")
        s.sql("""
          SELECT f.c_custkey, f.pt, CAST(coalesce(d.rid, -1) AS BIGINT) AS rule_id
          FROM q77_fact f LEFT JOIN q77_dim d ON f.pt BETWEEN d.lo AND d.hi
          ORDER BY c_custkey, rule_id""")
      }),

    // -- SQL surface: the LATERAL spelling of an as-of join, planned by
    //    AsOfLateralRewrite as the AsOfJoin union+window (one key shuffle)
    //    instead of Spark's native BroadcastNestedLoopJoin decorrelation
    //    (LateralProbeSpec measures both; PlanAuditSpec asserts this query's
    //    plan). DuckDB runs the IDENTICAL SQL text as the oracle.
    QueryDef("q95_asof_lateral_sql", Some("""
      WITH p AS (SELECT event_id, user_id, epoch_ns(ts)//1000000000 AS es
                 FROM events WHERE event_type = 'purchase'),
      v AS (SELECT event_id, user_id, epoch_ns(ts)//1000000000 AS es
            FROM events WHERE event_type = 'view')
      SELECT p.event_id AS purchase_id, p.user_id, CAST(p.es AS BIGINT) AS es,
             m.event_id AS view_id
      FROM p LEFT JOIN LATERAL (
        SELECT v.event_id FROM v
        WHERE v.user_id = p.user_id AND v.es <= p.es
        ORDER BY v.es DESC, v.event_id DESC LIMIT 1
      ) m ON true
      ORDER BY purchase_id"""),
      (s, dir) => {
        val e = T(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            expr("unix_micros(ts) div 1000000").as("es"))
        e.filter(col("event_type") === "purchase").drop("event_type")
          .createOrReplaceTempView("q95_p")
        e.filter(col("event_type") === "view").drop("event_type")
          .createOrReplaceTempView("q95_v")
        s.sql("""
          SELECT p.event_id AS purchase_id, p.user_id, p.es,
                 m.event_id AS view_id
          FROM q95_p p LEFT JOIN LATERAL (
            SELECT v.event_id FROM q95_v v
            WHERE v.user_id = p.user_id AND v.es <= p.es
            ORDER BY v.es DESC, v.event_id DESC LIMIT 1
          ) m ON true
          ORDER BY purchase_id""")
      }),

    // -- as-of in SQL, NEAREST spelling: `ORDER BY abs(v.es - p.es)` with a
    //    symmetric tolerance. Native Spark REJECTS outer references in a
    //    lateral ORDER BY outright (CORRELATED_REFERENCE) — this spelling
    //    runs ONLY through AsOfLateralRewrite, which plans it as the
    //    nearest union+window (equal-distance ties resolve by the tie
    //    column across directions, = the SQL abs ordering). DuckDB executes
    //    the IDENTICAL lateral SQL natively as the oracle.
    QueryDef("q100_asof_lateral_nearest", Some("""
      WITH p AS (SELECT event_id, user_id, epoch_ns(ts)//1000000000 AS es
                 FROM events WHERE event_type = 'purchase'),
      v AS (SELECT event_id, user_id, epoch_ns(ts)//1000000000 AS es
            FROM events WHERE event_type = 'view')
      SELECT p.event_id AS purchase_id, p.user_id, CAST(p.es AS BIGINT) AS es,
             m.event_id AS view_id
      FROM p LEFT JOIN LATERAL (
        SELECT v.event_id FROM v
        WHERE v.user_id = p.user_id
          AND v.es >= p.es - 200000 AND v.es <= p.es + 200000
        ORDER BY abs(v.es - p.es) ASC, v.event_id DESC LIMIT 1
      ) m ON true
      ORDER BY purchase_id"""),
      (s, dir) => {
        val e = T(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            expr("unix_micros(ts) div 1000000").as("es"))
        e.filter(col("event_type") === "purchase").drop("event_type")
          .createOrReplaceTempView("q100_p")
        e.filter(col("event_type") === "view").drop("event_type")
          .createOrReplaceTempView("q100_v")
        s.sql("""
          SELECT p.event_id AS purchase_id, p.user_id, p.es,
                 m.event_id AS view_id
          FROM q100_p p LEFT JOIN LATERAL (
            SELECT v.event_id FROM q100_v v
            WHERE v.user_id = p.user_id
              AND v.es >= p.es - 200000 AND v.es <= p.es + 200000
            ORDER BY abs(v.es - p.es) ASC, v.event_id DESC LIMIT 1
          ) m ON true
          ORDER BY purchase_id""")
      }),

    // -- z-order (Morton) clustering value: the layout key Sinks.zorderedWrite
    //    range-partitions by, giving every lake file a tight min/max envelope
    //    on BOTH filter columns (measured in ZOrderLayoutSpec: mean per-file
    //    envelope 0.40/0.29 of the range vs 0.06/1.00 for a single-column
    //    sort). The oracle rebuilds the interleave bit by bit.
    QueryDef("q94_zorder_values", Some("""
      WITH f AS (SELECT c_custkey, c_custkey % 256 AS a, (c_custkey * 7) % 256 AS b
                 FROM customer)
      SELECT c_custkey, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
             CAST(list_sum(list_transform(range(0, 8), i ->
               (((a >> i) & 1) << (2*i)) + (((b >> i) & 1) << (2*i+1))))
               AS BIGINT) AS z
      FROM f ORDER BY c_custkey"""),
      (s, dir) => T(s, dir, "customer")
        .select(col("c_custkey"),
          (col("c_custkey") % 256).cast("long").as("a"),
          (col("c_custkey") * 7 % 256).cast("long").as("b"))
        .withColumn("z",
          graft.functions.KernelExprs.zorder2(col("a"), col("b"), 8))
        .orderBy(col("c_custkey"))),

    // -- z-order read side: the SAME rows come back through ZLake's
    //    stats-pruning FileIndex as through a full scan — while the scan
    //    plans only the files whose footer envelope intersects the
    //    predicate (6/16-ish, measured in ZOrderPruneSpec). The oracle
    //    computes the filter+aggregate over the raw table; the Spark side
    //    must agree through the z-ordered lake copy AND the pruned read.
    //    SELF-DIAGNOSING since r8 (two driver-gate hash reds with zero
    //    local reproductions): the output carries `d_n`/`d_bal` — the
    //    pruned aggregate MINUS the identical full-scan aggregate over the
    //    same lake files, computed Spark-side in the same job (oracle pins
    //    both to 0). A future red now localizes itself: nonzero diffs =
    //    the PRUNE dropped rows the full scan kept; zero diffs with wrong
    //    n/bal = the WRITE itself lost rows in that environment. The
    //    companion q96b runs the full-scan control through the driver gate
    //    separately, and [[Verify]] prints this lake's per-file envelopes
    //    + the index's lastPrune to stderr via [[ZLakeDiag]].
    //    ROUNDING-ROBUST since r9: r8's gate had q96 AND q96b red (rows+
    //    schema green, hash-only) — the prune is exonerated, so the suspect
    //    is either the write or the value path shared with the oracle. The
    //    old `bal` was sum(CAST(double AS DECIMAL(18,2))): its half-point
    //    rounding mode is engine/version-dependent (Spark HALF_UP, DuckDB
    //    half-even in some versions). Now `bal` sums
    //    CAST(floor(c_acctbal*100) AS BIGINT) — floor and IEEE double
    //    multiply are bit-deterministic in BOTH engines — so q96/q96b test
    //    the LAKE (write + pruned read of a double payload). The r9 gate
    //    CONCLUDED the bisection: q96/q96b green + the raw-table decimal
    //    control red = the r6-r8 reds were oracle-side decimal rounding
    //    skew, lake exonerated (control retired below). Decision table now:
    //      q96 red + q96b green = unsound prune
    //      both red             = genuine write divergence (see the literal
    //                             row dump Verify emits)
    //      both green           = healthy.
    QueryDef("q96_zorder_pruned_read", Some("""
      WITH f AS (SELECT c_custkey, c_custkey % 256 AS a,
                        (c_custkey * 7) % 256 AS b, c_acctbal
                 FROM customer)
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(a) AS BIGINT) AS sum_a,
             CAST(sum(b) AS BIGINT) AS sum_b,
             CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal,
             CAST(0 AS BIGINT) AS d_n,
             CAST(0 AS BIGINT) AS d_bal
      FROM f WHERE a BETWEEN 32 AND 63 AND b BETWEEN 64 AND 127
      ORDER BY n"""),
      (s, dir) => {
        val lake = java.nio.file.Files
          .createTempDirectory("graft-zlake").toString + "/customer"
        graft.sinks.Sinks.zorderedWrite(
          T(s, dir, "customer").select(col("c_custkey"),
            (col("c_custkey") % 256).cast("long").as("a"),
            (col("c_custkey") * 7 % 256).cast("long").as("b"),
            col("c_acctbal")),
          "a", "b", lake, numFiles = 16, bits = 8)
        val idx = graft.sources.ZLake.index(s, lake)
        ZLakeDiag.lastIndex = Some((lake, idx))
        def aggOf(df: DataFrame): DataFrame = df
          .filter(col("a").between(32, 63) && col("b").between(64, 127))
          .agg(count("*").cast("long").as("n"),
            sum("a").cast("long").as("sum_a"),
            sum("b").cast("long").as("sum_b"),
            sum(floor(col("c_acctbal") * 100).cast("long"))
              .cast("long").as("bal"))
        val pruned = aggOf(graft.sources.ZLake.readWith(s, lake, idx))
        val full = aggOf(s.read.parquet(lake))
          .select(col("n").as("f_n"), col("bal").as("f_bal"))
        pruned.crossJoin(full)
          .select(col("n"), col("sum_a"), col("sum_b"), col("bal"),
            (col("n") - col("f_n")).cast("long").as("d_n"),
            (col("bal") - col("f_bal")).cast("long").as("d_bal"))
          .orderBy("n")
      }),

    // -- q96's full-scan CONTROL: the IDENTICAL aggregate over the SAME
    //    just-written lake via a plain parquet read (no pruning index).
    //    The driver gate bisects a q96 red: q96 red + q96b green = unsound
    //    prune; both red = the deterministic write itself diverges in that
    //    environment; both green = no divergence.
    QueryDef("q96b_zorder_full_scan", Some("""
      WITH f AS (SELECT c_custkey, c_custkey % 256 AS a,
                        (c_custkey * 7) % 256 AS b, c_acctbal
                 FROM customer)
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(a) AS BIGINT) AS sum_a,
             CAST(sum(b) AS BIGINT) AS sum_b,
             CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal
      FROM f WHERE a BETWEEN 32 AND 63 AND b BETWEEN 64 AND 127
      ORDER BY n"""),
      (s, dir) => {
        val lake = java.nio.file.Files
          .createTempDirectory("graft-zlake-ctl").toString + "/customer"
        graft.sinks.Sinks.zorderedWrite(
          T(s, dir, "customer").select(col("c_custkey"),
            (col("c_custkey") % 256).cast("long").as("a"),
            (col("c_custkey") * 7 % 256).cast("long").as("b"),
            col("c_acctbal")),
          "a", "b", lake, numFiles = 16, bits = 8)
        s.read.parquet(lake)
          .filter(col("a").between(32, 63) && col("b").between(64, 127))
          .agg(count("*").cast("long").as("n"),
            sum("a").cast("long").as("sum_a"),
            sum("b").cast("long").as("sum_b"),
            sum(floor(col("c_acctbal") * 100).cast("long"))
              .cast("long").as("bal"))
          .orderBy("n")
      }),

    // -- q96's RAW-TABLE control (q96c_raw_control) is RETIRED as of r10:
    //    the r9 gate ran the bisection to completion — q96/q96b green with
    //    the bit-deterministic floor(x*100) `bal` while q96c (the r8-era
    //    sum(CAST(double AS DECIMAL(18,2))) over raw `customer`, no lake
    //    involved) stayed red, proving the r6-r8 hash reds were decimal
    //    half-point rounding skew between Spark (HALF_UP) and the driver's
    //    DuckDB (banker's) — an oracle-environment divergence, not a lake
    //    bug. The control's one red row was by then pure noise in an
    //    otherwise-green gate, so it is removed: any FUTURE q96/q96b red is
    //    real signal again. The engine-side rule it leaves behind (applied
    //    across Queries*): double aggregates that must hash-match DuckDB go
    //    through floor/round-to-integer lanes, never CAST(double AS
    //    DECIMAL) whose half-point mode is engine-defined.

    // -- small-file compaction: an APPEND-grown lake (4 fragmented appends
    //    per window x 2 windows) compacted in place by Sinks.compactLake
    //    into the z-ordered manifest-covered layout, then read back through
    //    ZLake's pruning index with a predicate on a cluster column AND the
    //    win partition. The oracle computes the same filter+aggregate over
    //    the raw table: compaction must be row-identical — every row lands
    //    in exactly one rewritten file, none lost to the atomic swap, none
    //    doubled by the append layout it replaced.
    QueryDef("q103_compacted_lake", Some("""
      WITH f AS (SELECT c_custkey, c_custkey % 256 AS a,
                        (c_custkey * 7) % 256 AS b, c_acctbal,
                        c_custkey % 2 AS w
                 FROM customer)
      SELECT CAST(w AS BIGINT) AS w, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(a) AS BIGINT) AS sum_a,
             CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS bal
      FROM f WHERE a BETWEEN 32 AND 63 AND b BETWEEN 64 AND 127
      GROUP BY w ORDER BY w"""),
      (s, dir) => {
        val root = java.nio.file.Files
          .createTempDirectory("graft-compact-lake").toString
        val base = T(s, dir, "customer").select(col("c_custkey"),
          (col("c_custkey") % 256).cast("long").as("a"),
          (col("c_custkey") * 7 % 256).cast("long").as("b"),
          col("c_acctbal"),
          // two windows keyed off the custkey parity, minutes 0 and 1
          timestamp_seconds(col("c_custkey") % 2 * 60).as("accesstime"))
        // fragment: four appends, several files each
        for (part <- 0 until 4)
          graft.sinks.Sinks.lakeAppend(
            Map("customer" -> base.filter(col("c_custkey") % 4 === part)
              .repartition(3)), root)
        graft.sinks.Sinks.compactLake(s, s"$root/customer", "a", "b",
          filesPerPartition = 4, bits = 8)
        graft.sources.ZLake.read(s, s"$root/customer")
          .filter(col("a").between(32, 63) && col("b").between(64, 127))
          .withColumn("w", (unix_seconds(col("accesstime")) / 60).cast("long"))
          .groupBy(col("w"))
          .agg(count("*").cast("long").as("n"),
            sum("a").cast("long").as("sum_a"),
            sum(col("c_acctbal").cast("decimal(18,2)"))
              .cast("decimal(18,2)").as("bal"))
          .orderBy("w")
      }),

    // -- copy-on-write DELETE over the z-lake (LakeDelete.deleteFromLake,
    //    r9): envelope-triaged — files that cannot match are untouched,
    //    files where EVERY row provably matches drop whole without a read
    //    (the metadata-only delete), boundary files rewrite without their
    //    matching rows, journal-crash-safe throughout (LakeDeleteSpec).
    //    The predicate mixes a partition conjunct (win, substituted +
    //    folded per file) with data conjuncts on both cluster columns, so
    //    all three triage classes fire. The oracle computes the remainder
    //    aggregate over the raw table with SQL DELETE semantics
    //    (NOT(p) keeps FALSE rows; no NULLs in these columns) — a delete
    //    that lost or doubled a single row diverges here.
    QueryDef("q122_lake_delete", Some("""
      WITH f AS (SELECT c_custkey, c_custkey % 64 AS a,
                        (c_custkey * 7) % 64 AS b, c_acctbal,
                        c_custkey % 2 AS w
                 FROM customer),
           d AS (SELECT * FROM f
                 WHERE NOT ((w = 1 AND b >= 32) OR (w = 0 AND a < 16)))
      SELECT CAST(w AS BIGINT) AS w, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(a) AS BIGINT) AS sum_a,
             CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal
      FROM d GROUP BY w ORDER BY w"""),
      (s, dir) => {
        val root = java.nio.file.Files
          .createTempDirectory("graft-lake-del").toString + "/customer"
        val base = T(s, dir, "customer").select(col("c_custkey"),
          (col("c_custkey") % 64).cast("long").as("a"),
          (col("c_custkey") * 7 % 64).cast("long").as("b"),
          col("c_acctbal"))
        for (w <- 0 to 1)
          graft.sinks.Sinks.zorderedWrite(
            base.filter(col("c_custkey") % 2 === w),
            "a", "b", s"$root/win=$w", numFiles = 8, bits = 6)
        graft.sinks.LakeDelete.deleteFromLake(s, root,
          (col("win") === "1" && col("b") >= 32) ||
            (col("win") === "0" && col("a") < 16))
        graft.sources.ZLake.read(s, root)
          .groupBy(col("win").cast("long").as("w"))
          .agg(count("*").cast("long").as("n"),
            sum("a").cast("long").as("sum_a"),
            sum(floor(col("c_acctbal") * 100).cast("long"))
              .cast("long").as("bal"))
          .orderBy("w")
      }),

    // -- keyed UPSERT over the z-lake (LakeDelete.upsertLake, r9): the
    //    CDC/dimension merge — existing rows whose key appears in the
    //    batch are removed (file triage on key envelopes + manifest
    //    blooms: files provably holding none of the keys are untouched),
    //    the batch inserts as new per-partition files, and both sides
    //    commit through ONE journal (atomic; crash → recover applies the
    //    whole merge or none). The oracle computes the merge relationally:
    //    NOT IN the key set UNION ALL the batch. Updated rows bump cents
    //    by 7; inserted rows use a non-colliding key offset — any row
    //    lost, doubled, or left stale diverges in the per-window sums.
    QueryDef("q123_lake_upsert", Some("""
      WITH f AS (SELECT c_custkey, c_custkey % 64 AS a,
                        (c_custkey * 7) % 64 AS b,
                        CAST(floor(c_acctbal * 100) AS BIGINT) AS cents,
                        c_custkey % 2 AS w
                 FROM customer),
           u AS (SELECT c_custkey, a, b, cents + 7 AS cents, w FROM f
                 WHERE c_custkey % 101 = 0
                 UNION ALL
                 SELECT c_custkey + 200000, a, b, c_custkey AS cents, w
                 FROM f WHERE c_custkey % 977 = 0),
           m AS (SELECT * FROM f
                 WHERE c_custkey NOT IN (SELECT c_custkey FROM u)
                 UNION ALL SELECT * FROM u)
      SELECT CAST(w AS BIGINT) AS w, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS sum_cents,
             CAST(sum(c_custkey) AS BIGINT) AS sum_key
      FROM m GROUP BY w ORDER BY w"""),
      (s, dir) => {
        val root = java.nio.file.Files
          .createTempDirectory("graft-lake-ups").toString + "/customer"
        val base = T(s, dir, "customer").select(col("c_custkey"),
          (col("c_custkey") % 64).cast("long").as("a"),
          (col("c_custkey") * 7 % 64).cast("long").as("b"),
          floor(col("c_acctbal") * 100).cast("long").as("cents"))
        for (w <- 0 to 1)
          graft.sinks.Sinks.zorderedWrite(
            base.filter(col("c_custkey") % 2 === w),
            "a", "b", s"$root/win=$w", numFiles = 8, bits = 6,
            bloomCols = Seq("c_custkey"))
        val win = (col("c_custkey") % 2).cast("string").as("win")
        val updates = base.filter(col("c_custkey") % 101 === 0)
          .withColumn("cents", col("cents") + 7).withColumn("win", win)
          .unionByName(base.filter(col("c_custkey") % 977 === 0)
            .select((col("c_custkey") + 200000).as("c_custkey"),
              col("a"), col("b"), col("c_custkey").as("cents"))
            .withColumn("win", (col("cents") % 2).cast("string")))
        graft.sinks.LakeDelete.upsertLake(s, root, updates, "c_custkey")
        graft.sources.ZLake.read(s, root)
          .groupBy(col("win").cast("long").as("w"))
          .agg(count("*").cast("long").as("n"),
            sum("cents").cast("long").as("sum_cents"),
            sum("c_custkey").cast("long").as("sum_key"))
          .orderBy("w")
      }),

    // -- string-prefix pruned lake read: a name-sorted lake (8 files of
    //    contiguous c_custkey ranges, so every file carries a tight c_name
    //    min/max envelope) read through ZLake with a LIKE-prefix predicate
    //    — pruned in UTF-8 byte order against [p, succ(p)) at planning
    //    time (7 of 8 files skipped; scan-metric-asserted in
    //    ZOrderPruneSpec). The oracle computes the same filter+aggregate
    //    over the raw table: prefix pruning must be invisible to results.
    QueryDef("q104_zlake_prefix_read", Some("""
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c_custkey) AS BIGINT) AS sum_key,
             min(c_name) AS lo_name, max(c_name) AS hi_name
      FROM customer WHERE c_name LIKE 'Customer#00000014%'
      ORDER BY n"""),
      (s, dir) => {
        val root = java.nio.file.Files
          .createTempDirectory("graft-prefix-lake").toString + "/customer"
        val base = T(s, dir, "customer")
          .select(col("c_custkey"), col("c_name"))
        // deterministic name-clustered layout: one file per contiguous
        // custkey range (names are zero-padded keys, so name order ==
        // key order and each file's name envelope is tight)
        for (b <- 0 until 8)
          base.filter(col("c_custkey") % 1600 >= b * 200 &&
              col("c_custkey") % 1600 < (b + 1) * 200)
            .coalesce(1).sortWithinPartitions("c_name")
            .write.mode("append").parquet(root)
        graft.sources.ZLake.read(s, root)
          .filter(col("c_name").startsWith("Customer#00000014"))
          .agg(count("*").cast("long").as("n"),
            sum("c_custkey").cast("long").as("sum_key"),
            min("c_name").as("lo_name"), max("c_name").as("hi_name"))
          .orderBy("n")
      }),

    // -- the lake as a SQL source: CREATE ... USING zlake binds the
    //    stats-pruning FileIndex to a plain SQL view — the query below
    //    never touches the Scala API, yet plans the pruned scan (asserted
    //    in ManifestAggsSpec via scan metrics). sum(a) forces a real scan,
    //    so this exercises the pruned-read path, not the metadata rewrite.
    QueryDef("q105_zlake_sql_view", Some("""
      WITH f AS (SELECT c_custkey, c_custkey % 256 AS a,
                        (c_custkey * 7) % 256 AS b FROM customer)
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(a) AS BIGINT) AS sum_a,
             CAST(sum(c_custkey) AS BIGINT) AS sum_key
      FROM f WHERE a BETWEEN 32 AND 63 ORDER BY n"""),
      (s, dir) => {
        val lake = java.nio.file.Files
          .createTempDirectory("graft-zlake-sql").toString + "/customer"
        graft.sinks.Sinks.zorderedWrite(
          T(s, dir, "customer").select(col("c_custkey"),
            (col("c_custkey") % 256).cast("long").as("a"),
            (col("c_custkey") * 7 % 256).cast("long").as("b")),
          "a", "b", lake, numFiles = 16, bits = 8)
        s.sql(s"CREATE OR REPLACE TEMPORARY VIEW zlake_q105 " +
          s"USING zlake OPTIONS (path '$lake')")
        s.sql("""
          SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(a) AS BIGINT) AS sum_a,
                 CAST(sum(c_custkey) AS BIGINT) AS sum_key
          FROM zlake_q105 WHERE a BETWEEN 32 AND 63 ORDER BY n""")
      }),

    // -- bloom-pruned point lookup: the lake carries per-file BLOOM
    //    filters in the write-time manifest (`bloomCols`), so equality /
    //    IN predicates on a scattered high-cardinality column skip files
    //    whose bloom proves the value absent — min/max envelopes are
    //    useless here because every file's uid range overlaps (uid is
    //    custkey mod a prime, decorrelated from the z-order keys). File
    //    skipping is scan-metric-asserted in BloomPruneSpec; the oracle
    //    computes the same point lookups over the raw table — a bloom
    //    false negative (the unsound direction) would LOSE rows here.
    //    'u99999' probes the absent-key path (no row may appear).
    QueryDef("q110_bloom_point_lookup", Some("""
      WITH f AS (SELECT c_custkey, 'u' || CAST(c_custkey % 9973 AS VARCHAR) AS uid
                 FROM customer)
      SELECT uid, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c_custkey) AS BIGINT) AS sum_key
      FROM f WHERE uid IN ('u17', 'u1234', 'u99999')
      GROUP BY uid ORDER BY uid"""),
      (s, dir) => {
        val lake = java.nio.file.Files
          .createTempDirectory("graft-bloom-lake").toString + "/customer"
        graft.sinks.Sinks.zorderedWrite(
          T(s, dir, "customer").select(col("c_custkey"),
            (col("c_custkey") % 256).cast("long").as("a"),
            (col("c_custkey") * 7 % 256).cast("long").as("b"),
            concat(lit("u"), (col("c_custkey") % 9973).cast("string"))
              .as("uid")),
          "a", "b", lake, numFiles = 16, bits = 8,
          bloomCols = Seq("uid"))
        graft.sources.ZLake.read(s, lake)
          .filter(col("uid").isin("u17", "u1234", "u99999"))
          .groupBy("uid")
          .agg(count("*").cast("long").as("n"),
            sum("c_custkey").cast("long").as("sum_key"))
          .orderBy("uid")
      }),

    // -- zone-map top-k file pruning (TopKFilePrune): ORDER BY a DESC
    //    LIMIT k over the z-lake scans only the files whose envelope can
    //    contribute to the top-k (file counts asserted in TopKPruneSpec);
    //    the unique (a DESC, c_custkey) tiebreaker makes the row SET
    //    deterministic, and the oracle computes the same top-k over the
    //    raw table — an unsound bound (the rule's failure mode) would
    //    LOSE top-k rows here.
    QueryDef("q111_topk_file_prune", Some("""
      WITH f AS (SELECT c_custkey, c_custkey % 256 AS a,
                        (c_custkey * 7) % 256 AS b FROM customer)
      SELECT c_custkey, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b
      FROM f ORDER BY a DESC, c_custkey LIMIT 25"""),
      (s, dir) => {
        val lake = java.nio.file.Files
          .createTempDirectory("graft-topk-lake").toString + "/customer"
        graft.sinks.Sinks.zorderedWrite(
          T(s, dir, "customer").select(col("c_custkey"),
            (col("c_custkey") % 256).cast("long").as("a"),
            (col("c_custkey") * 7 % 256).cast("long").as("b")),
          "a", "b", lake, numFiles = 16, bits = 8)
        graft.sources.ZLake.read(s, lake)
          .orderBy(col("a").desc, col("c_custkey"))
          .limit(25)
          .select(col("c_custkey"), col("a"), col("b"))
      }),

    // -- metadata-only SUM: the lake written with `sumCols` carries exact
    //    per-file BigDecimal sums in its manifest, so the single most
    //    common lake rollup — `SELECT win, sum(x) GROUP BY win` over a
    //    partition-filtered slice — launches ZERO tasks (LocalRelation
    //    plan-asserted in ManifestAggsSpec). Integral sum (c_custkey,
    //    long lane) and decimal sum (bal, exact decimal lane) both ride
    //    the oracle; overflow/all-null gates are spec-covered.
    QueryDef("q112_metadata_sum", Some("""
      WITH f AS (SELECT c_custkey, CAST(c_custkey % 4 AS VARCHAR) AS win,
                        CAST(c_acctbal AS DECIMAL(18,2)) AS bal
                 FROM customer)
      SELECT win, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c_custkey) AS BIGINT) AS sum_key,
             CAST(sum(bal) AS DECIMAL(28,2)) AS sum_bal
      FROM f WHERE win <> '3' GROUP BY win ORDER BY win"""),
      (s, dir) => {
        val root = java.nio.file.Files
          .createTempDirectory("graft-zlake-sum").toString + "/customer"
        val base = T(s, dir, "customer").select(col("c_custkey"),
          (col("c_custkey") % 256).cast("long").as("a"),
          (col("c_custkey") * 7 % 256).cast("long").as("b"),
          col("c_acctbal").cast("decimal(18,2)").as("bal"))
        for (w <- 0 until 4)
          graft.sinks.Sinks.zorderedWrite(
            base.filter(col("c_custkey") % 4 === w),
            "a", "b", s"$root/win=$w", numFiles = 4, bits = 8,
            sumCols = Seq("c_custkey", "bal"))
        graft.sources.ZLake.read(s, root)
          .filter(col("win") =!= "3")
          .groupBy(col("win"))
          .agg(count(lit(1)).as("n"),
            sum("c_custkey").as("sum_key"),
            sum("bal").as("sum_bal"))
          .orderBy("win")
      }),

    // -- partition-column metadata aggregates: min/max/count(DISTINCT) of
    //    the lake's own window column come straight from the DIRECTORY
    //    values — with the count, the full "what windows do I have" lake
    //    inventory is a zero-task LocalRelation (plan-asserted in
    //    ManifestAggsSpec; zero-row directories contribute no value).
    QueryDef("q113_partition_metadata", Some("""
      WITH f AS (SELECT c_custkey, CAST(c_custkey % 4 AS VARCHAR) AS win
                 FROM customer)
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(count(DISTINCT win) AS BIGINT) AS wins,
             min(win) AS lo_win, max(win) AS hi_win
      FROM f WHERE win <> '3' ORDER BY n"""),
      (s, dir) => {
        val root = java.nio.file.Files
          .createTempDirectory("graft-zlake-pmeta").toString + "/customer"
        val base = T(s, dir, "customer").select(col("c_custkey"),
          (col("c_custkey") % 256).cast("long").as("a"),
          (col("c_custkey") * 7 % 256).cast("long").as("b"))
        for (w <- 0 until 4)
          graft.sinks.Sinks.zorderedWrite(
            base.filter(col("c_custkey") % 4 === w),
            "a", "b", s"$root/win=$w", numFiles = 4, bits = 8)
        graft.sources.ZLake.read(s, root)
          .filter(col("win") =!= "3")
          .agg(count(lit(1)).as("n"),
            countDistinct(col("win")).as("wins"),
            min("win").as("lo_win"), max("win").as("hi_win"))
          .orderBy("n")
      }),

    // -- partition-key top-k: `ORDER BY win DESC LIMIT k` — "the latest
    //    windows' rows", the most common operational query over a windowed
    //    lake — plans ONLY the directories that can contribute (row counts
    //    accumulate down the window order; TopKFilePrune emits the cutoff
    //    as an exact partition filter). The unique c_custkey tiebreaker
    //    makes the row set deterministic; the oracle computes the same
    //    top-k over the raw table — over-pruning would LOSE rows.
    QueryDef("q114_partition_topk", Some("""
      WITH f AS (SELECT c_custkey, CAST(c_custkey % 4 AS VARCHAR) AS win
                 FROM customer)
      SELECT win, c_custkey FROM f
      ORDER BY win DESC, c_custkey LIMIT 20"""),
      (s, dir) => {
        val root = java.nio.file.Files
          .createTempDirectory("graft-zlake-ptopk").toString + "/customer"
        val base = T(s, dir, "customer").select(col("c_custkey"),
          (col("c_custkey") % 256).cast("long").as("a"),
          (col("c_custkey") * 7 % 256).cast("long").as("b"))
        for (w <- 0 until 4)
          graft.sinks.Sinks.zorderedWrite(
            base.filter(col("c_custkey") % 4 === w),
            "a", "b", s"$root/win=$w", numFiles = 4, bits = 8)
        graft.sources.ZLake.read(s, root)
          .orderBy(col("win").desc, col("c_custkey"))
          .limit(20)
          .select(col("win"), col("c_custkey"))
      }),

    // -- 3-way Morton interleave VALUES: the oracle rebuilds zorder3 bit
    //    by bit (a's bit i at 3i, b's at 3i+1, c's at 3i+2), pinning the
    //    exact curve the 3-column layout clusters by. Spark side goes
    //    through the SQL registration (graft_zorder3) so the whole
    //    surface — expression, codegen, function registry — is gated.
    QueryDef("q120_zorder3_values", Some("""
      WITH f AS (SELECT c_custkey, c_custkey % 64 AS a,
                        (c_custkey * 7) % 64 AS b,
                        (c_custkey * 13) % 64 AS c FROM customer)
      SELECT c_custkey, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
             CAST(c AS BIGINT) AS c,
             CAST(list_sum(list_transform(range(0, 6), i ->
               (((a >> i) & 1) << (3*i)) + (((b >> i) & 1) << (3*i+1)) +
               (((c >> i) & 1) << (3*i+2)))) AS BIGINT) AS z
      FROM f ORDER BY c_custkey"""),
      (s, dir) => T(s, dir, "customer")
        .select(col("c_custkey"),
          (col("c_custkey") % 64).cast("long").as("a"),
          (col("c_custkey") * 7 % 64).cast("long").as("b"),
          (col("c_custkey") * 13 % 64).cast("long").as("c"))
        .withColumn("z", expr("graft_zorder3(a, b, c, 6)"))
        .orderBy(col("c_custkey"))),

    // -- 3-column z-ordered lake, pruned read on a band over ALL THREE
    //    dimensions (ZOrderPruneSpec asserts per-axis file counts): the
    //    read must agree with the raw table through the write AND the
    //    three-dimensional envelope pruning.
    QueryDef("q121_zorder3_pruned_read", Some("""
      WITH f AS (SELECT c_custkey, c_custkey % 64 AS a,
                        (c_custkey * 7) % 64 AS b,
                        (c_custkey * 13) % 64 AS c FROM customer)
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(a) AS BIGINT) AS sum_a,
             CAST(sum(b) AS BIGINT) AS sum_b,
             CAST(sum(c) AS BIGINT) AS sum_c
      FROM f WHERE a BETWEEN 8 AND 23 AND b BETWEEN 16 AND 47
               AND c BETWEEN 0 AND 31
      ORDER BY n"""),
      (s, dir) => {
        val lake = java.nio.file.Files
          .createTempDirectory("graft-z3lake").toString + "/customer"
        graft.sinks.Sinks.zorderedWrite3(
          T(s, dir, "customer").select(col("c_custkey"),
            (col("c_custkey") % 64).cast("long").as("a"),
            (col("c_custkey") * 7 % 64).cast("long").as("b"),
            (col("c_custkey") * 13 % 64).cast("long").as("c")),
          "a", "b", "c", lake, numFiles = 8, bits = 6)
        graft.sources.ZLake.read(s, lake)
          .filter(col("a").between(8, 23) && col("b").between(16, 47) &&
            col("c").between(0, 31))
          .agg(count("*").cast("long").as("n"),
            sum("a").cast("long").as("sum_a"),
            sum("b").cast("long").as("sum_b"),
            sum("c").cast("long").as("sum_c"))
          .orderBy("n")
      }),

    // -- `<>` file pruning through the Not complement lane: may(NOT e) =
    //    !must(e), so a file whose envelope PROVES e (constant value,
    //    zero nulls — the shape a dictionary-heavy boilerplate column
    //    compacts into) is skipped for `x <> v`. Each file below is
    //    flag-constant by construction; `flag <> 2` plans 3 of 4 files
    //    (ZOrderPruneSpec asserts the count). The oracle runs the same
    //    filter over the raw table — an unsound complement (pruning a
    //    file with differing rows) would LOSE rows here.
    QueryDef("q119_ne_constant_prune", Some("""
      WITH f AS (SELECT c_custkey, c_custkey % 4 AS flag FROM customer)
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c_custkey) AS BIGINT) AS sum_key,
             CAST(sum(flag) AS BIGINT) AS sum_flag
      FROM f WHERE flag <> 2 ORDER BY n"""),
      (s, dir) => {
        val path = java.nio.file.Files
          .createTempDirectory("graft-zlake-ne").toString + "/customer"
        val base = T(s, dir, "customer").select(col("c_custkey"),
          (col("c_custkey") % 4).cast("long").as("flag"))
        for (v <- 0 until 4)
          base.filter(col("flag") === v).coalesce(1)
            .write.mode("append").parquet(path)
        graft.sources.ZLake.read(s, path)
          .filter(col("flag") =!= 2)
          .agg(count("*").cast("long").as("n"),
            sum("c_custkey").cast("long").as("sum_key"),
            sum("flag").cast("long").as("sum_flag"))
          .orderBy("n")
      }),

    // -- TYPED partition-key top-k: `ORDER BY CAST(day AS BIGINT) DESC
    //    LIMIT k` over integer-valued directories (day=8..11) where
    //    numeric and lexicographic order DISAGREE ("11" < "9" in UTF-8) —
    //    the cast lane evaluates the query's own cast per directory and
    //    plans only the numerically-latest windows (TopKPruneSpec asserts
    //    the file counts). The oracle computes the same top-k over the raw
    //    table — a lexicographically-ordered prune would LOSE the day=11
    //    rows entirely.
    QueryDef("q118_typed_partition_topk", Some("""
      WITH f AS (SELECT c_custkey, 8 + c_custkey % 4 AS day FROM customer)
      SELECT CAST(day AS BIGINT) AS day, c_custkey FROM f
      ORDER BY day DESC, c_custkey LIMIT 20"""),
      (s, dir) => {
        val root = java.nio.file.Files
          .createTempDirectory("graft-zlake-ptyped").toString + "/customer"
        val base = T(s, dir, "customer").select(col("c_custkey"),
          (col("c_custkey") % 256).cast("long").as("a"),
          (col("c_custkey") * 7 % 256).cast("long").as("b"))
        for (d <- 8 to 11)
          graft.sinks.Sinks.zorderedWrite(
            base.filter(col("c_custkey") % 4 === (d - 8)),
            "a", "b", s"$root/day=$d", numFiles = 4, bits = 8)
        graft.sources.ZLake.read(s, root)
          .orderBy(col("day").cast("long").desc, col("c_custkey"))
          .limit(20)
          .select(col("day").cast("long").as("day"), col("c_custkey"))
      }),

    // -- top-k UNDER a data filter: files whose b-envelope provably sits
    //    inside the band count their rows toward the k-bound (mustMatch);
    //    the rest stay scannable but contribute nothing, so the bound
    //    never overcounts. The oracle computes the same filtered top-k
    //    over the raw table — over-pruning would LOSE rows here.
    QueryDef("q115_topk_filtered", Some("""
      WITH f AS (SELECT c_custkey, c_custkey % 256 AS a,
                        (c_custkey * 7) % 256 AS b FROM customer)
      SELECT c_custkey, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b
      FROM f WHERE b BETWEEN 64 AND 127
      ORDER BY a DESC, c_custkey LIMIT 25"""),
      (s, dir) => {
        val lake = java.nio.file.Files
          .createTempDirectory("graft-topk-filt").toString + "/customer"
        graft.sinks.Sinks.zorderedWrite(
          T(s, dir, "customer").select(col("c_custkey"),
            (col("c_custkey") % 256).cast("long").as("a"),
            (col("c_custkey") * 7 % 256).cast("long").as("b")),
          "a", "b", lake, numFiles = 16, bits = 8)
        graft.sources.ZLake.read(s, lake)
          .filter(col("b").between(64, 127))
          .orderBy(col("a").desc, col("c_custkey"))
          .limit(25)
          .select(col("c_custkey"), col("a"), col("b"))
      }),

    // -- corpus-wide paragraph/line exact dedup (the RefinedWeb/FineWeb
    //    pre-MinHash step): every repeated unit keeps only its FIRST
    //    occurrence (smallest (doc, position)) and documents reassemble
    //    from survivors in original order. The synthetic docs are
    //    single-line, so the oracle runs the same operator at WORD
    //    granularity — the dedup/reassembly machinery is identical, and
    //    the heavy duplication (small vocabulary) exercises the skew
    //    path: first-occurrence is a map-side-combined min, never a
    //    single-task window sort.
    QueryDef("q116_paragraph_dedup", Some("""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS parts
                 FROM documents),
      p AS (SELECT doc_id, i - 1 AS pos, parts[i] AS para
            FROM d, LATERAL (SELECT unnest(range(1, len(parts) + 1)) AS i)),
      f1 AS (SELECT para, min(doc_id) AS fd FROM p GROUP BY para),
      f AS (SELECT p.para, f1.fd, min(p.pos) AS fp
            FROM p JOIN f1 ON p.para = f1.para AND p.doc_id = f1.fd
            GROUP BY 1, 2),
      k AS (SELECT p.doc_id, p.pos, p.para,
                   p.doc_id = f.fd AND p.pos = f.fp AS keep
            FROM p JOIN f USING (para))
      SELECT doc_id,
             coalesce(string_agg(CASE WHEN keep THEN para END, ' '
                                 ORDER BY pos), '') AS text,
             CAST(count(*) AS BIGINT) AS n_para,
             CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      FROM k GROUP BY doc_id ORDER BY doc_id"""),
      (s, dir) =>
        graft.operators.TrainPrep.paragraphDedup(
          T(s, dir, "documents"), col("doc_id"), col("text"), " ")
          .orderBy("doc_id")),

    // -- latest-events top-k over a REAL timestamp column: the lake's
    //    annotated TIMESTAMP(MICROS) stats give every file an exact time
    //    envelope, so `ORDER BY t DESC LIMIT k` — the canonical
    //    operational query over any event lake — plans only the files
    //    whose envelope reaches the top (TimeEnvelopeSpec asserts the
    //    scan metrics; the derived `t >= T` predicate also row-group
    //    skips). Output in epoch micros so both engines compare exactly.
    QueryDef("q117_time_topk", Some("""
      WITH e AS (SELECT event_id, epoch_ns(ts) // 1000 AS tus FROM events)
      SELECT event_id, CAST(tus AS BIGINT) AS t_us
      FROM e ORDER BY tus DESC, event_id LIMIT 50"""),
      (s, dir) => {
        val lake = java.nio.file.Files
          .createTempDirectory("graft-time-topk").toString + "/events"
        graft.sinks.Sinks.zorderedWrite(
          T(s, dir, "events").select(col("event_id"), col("ts").as("t")),
          "t", "event_id", lake, numFiles = 8, bits = 16)
        graft.sources.ZLake.read(s, lake)
          .orderBy(col("t").desc, col("event_id"))
          .limit(50)
          .select(col("event_id"), unix_micros(col("t")).as("t_us"))
      }),

    // -- metadata-only aggregates: count(*) / count(col) / integral
    //    min/max grouped by the lake's partition column are answered from
    //    the write-time manifest — the optimized plan is a LocalRelation,
    //    zero files scanned (plan-asserted in ManifestAggsSpec; the oracle
    //    here pins the VALUES). `phone` goes NULL on every 5th key to
    //    exercise the null-count lane of count(col).
    QueryDef("q106_metadata_agg", Some("""
      WITH f AS (SELECT c_custkey, CAST(c_custkey % 4 AS VARCHAR) AS win,
                        CASE WHEN c_custkey % 5 <> 0 THEN c_name END AS phone
                 FROM customer)
      SELECT win, CAST(count(*) AS BIGINT) AS n,
             CAST(count(phone) AS BIGINT) AS n_phone,
             CAST(min(c_custkey) AS BIGINT) AS lo,
             CAST(max(c_custkey) AS BIGINT) AS hi
      FROM f WHERE win <> '3' GROUP BY win ORDER BY win"""),
      (s, dir) => {
        val root = java.nio.file.Files
          .createTempDirectory("graft-zlake-meta").toString + "/customer"
        val base = T(s, dir, "customer").select(col("c_custkey"),
          (col("c_custkey") % 256).cast("long").as("a"),
          (col("c_custkey") * 7 % 256).cast("long").as("b"),
          when(col("c_custkey") % 5 =!= 0, col("c_name")).as("phone"))
        for (w <- 0 until 4)
          graft.sinks.Sinks.zorderedWrite(
            base.filter(col("c_custkey") % 4 === w),
            "a", "b", s"$root/win=$w", numFiles = 4, bits = 8)
        graft.sources.ZLake.read(s, root)
          .filter(col("win") =!= "3")
          .groupBy(col("win"))
          .agg(count(lit(1)).as("n"), count(col("phone")).as("n_phone"),
            min("c_custkey").as("lo"), max("c_custkey").as("hi"))
          .orderBy("win")
      }),

    // -- as-of join, forward + nearest directions: for each purchase, the
    //    earliest 'view' at-or-after it (forward, unbounded) and the closer
    //    of the two adjacent views within a 200 000 s tolerance (nearest;
    //    exact tie prefers backward). Both directions come from ONE key
    //    shuffle each (descending-ts running last() = the forward scan) —
    //    no per-row range probe, no pair explosion at 100 TB.
    QueryDef("q83_asof_directions", Some(s"""
      WITH e AS (SELECT event_id, user_id, event_type,
                        epoch_ns(ts)//1000000000 AS es FROM events),
      u AS (SELECT user_id, es, event_id, 1 AS side,
                   CAST(NULL AS BIGINT) AS r_id, CAST(NULL AS BIGINT) AS r_es
            FROM e WHERE event_type = 'purchase'
            UNION ALL
            SELECT user_id, es, event_id, 0 AS side, event_id, es
            FROM e WHERE event_type = 'view'),
      w AS (SELECT *,
              last_value(r_id IGNORE NULLS) OVER wb AS b_id,
              last_value(r_es IGNORE NULLS) OVER wb AS b_es,
              last_value(r_id IGNORE NULLS) OVER wf AS f_id,
              last_value(r_es IGNORE NULLS) OVER wf AS f_es
            FROM u WINDOW
              wb AS (PARTITION BY user_id ORDER BY es, side, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
              wf AS (PARTITION BY user_id ORDER BY es DESC, side, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      c AS (SELECT event_id AS purchase_id, user_id, CAST(es AS BIGINT) AS es,
              f_id AS fwd_id, f_es AS fwd_es,
              CASE WHEN es - b_es <= 200000 THEN b_id END AS cb_id,
              CASE WHEN es - b_es <= 200000 THEN b_es END AS cb_es,
              CASE WHEN f_es - es <= 200000 THEN f_id END AS cf_id,
              CASE WHEN f_es - es <= 200000 THEN f_es END AS cf_es
            FROM w WHERE side = 1)
      SELECT purchase_id, user_id, es, fwd_id, fwd_es,
             CASE WHEN cb_id IS NULL THEN cf_id
                  WHEN cf_id IS NULL THEN cb_id
                  WHEN es - cb_es <= cf_es - es THEN cb_id
                  ELSE cf_id END AS near_id,
             CASE WHEN cb_id IS NULL THEN cf_es
                  WHEN cf_id IS NULL THEN cb_es
                  WHEN es - cb_es <= cf_es - es THEN cb_es
                  ELSE cf_es END AS near_es
      FROM c ORDER BY purchase_id"""),
      (s, dir) => {
        import graft.operators.AsOfJoin
        val e = T(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            expr("unix_micros(ts) div 1000000").as("es"))
        val p = e.filter(col("event_type") === "purchase").drop("event_type")
        val v = e.filter(col("event_type") === "view").drop("event_type")
        val fwd = AsOfJoin.asOf(p, v, Seq("user_id"), "es", "event_id",
            Seq("event_id"), None, AsOfJoin.Forward)
          .select(col("event_id").as("purchase_id"), col("user_id"), col("es"),
            col("asof.event_id").as("fwd_id"), col("asof.es").as("fwd_es"))
        val near = AsOfJoin.asOf(p, v, Seq("user_id"), "es", "event_id",
            Seq("event_id"), Some(200000L), AsOfJoin.Nearest)
          .select(col("event_id").as("purchase_id"),
            col("asof.event_id").as("near_id"), col("asof.es").as("near_es"))
        fwd.join(near, Seq("purchase_id")).orderBy(col("purchase_id"))
      }),

    // -- join-driven DYNAMIC FILE PRUNING (DynamicPrune): the selective
    //    dim side's keys are collected (56 keys here — past the In→InSet
    //    conversion threshold, so the lake's InSet envelope/bloom lane is
    //    what plans the scan) and planted as one IN filter on the fact
    //    lake read: files whose o_custkey envelope excludes every key, or
    //    whose bloom proves them all absent, are skipped at planning time
    //    (file counts asserted in DynamicPruneSpec). The oracle runs the
    //    same join over the raw tables — a pruned file that still held a
    //    matching key, or a bloom false negative, would LOSE rows here.
    QueryDef("q127_join_pruned_read", Some("""
      WITH f AS (SELECT o_orderkey, o_custkey,
                        CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
                 FROM orders),
           d AS (SELECT c_custkey, c_mktsegment FROM customer
                 WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
                   AND c_acctbal > 9000)
      SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS sum_cents,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS users
      FROM f JOIN d ON f.o_custkey = d.c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
      (s, dir) => {
        val lake = java.nio.file.Files
          .createTempDirectory("graft-dfp-lake").toString + "/orders"
        graft.sinks.Sinks.zorderedWrite(
          T(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
            (col("o_orderkey") % 256).cast("long").as("ob"),
            floor(col("o_totalprice") * 100).cast("long").as("cents")),
          "o_custkey", "ob", lake, numFiles = 16, bits = 16,
          bloomCols = Seq("o_custkey"))
        val dim = T(s, dir, "customer")
          .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY") &&
            col("c_acctbal") > 9000)
          .select(col("c_custkey"), col("c_mktsegment"))
        graft.operators.DynamicPrune
          .innerJoinPruned(s, lake, "o_custkey", dim, col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"),
            sum(col("cents")).as("sum_cents"),
            countDistinct(col("o_custkey")).as("users"))
          .orderBy(col("c_mktsegment"))
      }),

    // -- incrementally-maintained AGGREGATE VIEW (MaterializedAgg): three
    //    batch merges build the view, then batch 1 is deliberately
    //    REPLAYED — the commit fence must make it a no-op, so any
    //    double-count (the MV failure mode) breaks the oracle, which
    //    aggregates the full table once in DuckDB. Crash-window coverage
    //    lives in MaterializedAggSpec; this entry proves merge algebra +
    //    exactly-once end-to-end through the driver gate.
    QueryDef("q129_materialized_agg", Some("""
      WITH f AS (SELECT o_orderpriority, o_orderstatus,
                        CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
                 FROM orders)
      SELECT o_orderpriority, o_orderstatus,
             CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(cents) AS BIGINT) AS cents_sum
      FROM f GROUP BY o_orderpriority, o_orderstatus
      ORDER BY o_orderpriority, o_orderstatus"""),
      (s, dir) => {
        import graft.sinks.MaterializedAgg
        val root = java.nio.file.Files
          .createTempDirectory("graft-mv-gate").toString + "/mv"
        val spec = MaterializedAgg.Spec(
          groupCols = Seq("o_orderpriority", "o_orderstatus"),
          sumCols = Seq("cents"))
        val base = T(s, dir, "orders").select(col("o_orderkey"),
          col("o_orderpriority"), col("o_orderstatus"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        for (i <- 0 until 3)
          MaterializedAgg.mergeBatch(s, root,
            base.filter(col("o_orderkey") % 3 === i), spec, i.toLong)
        // replayed batch: the fence must no-op it (a double count of
        // slice 1 would hash-mismatch every touched group)
        MaterializedAgg.mergeBatch(s, root,
          base.filter(col("o_orderkey") % 3 === 1), spec, 1L)
        MaterializedAgg.readView(s, root, spec)
          .select(col("o_orderpriority"), col("o_orderstatus"),
            col("cnt"), col("cents_sum"))
          .orderBy(col("o_orderpriority"), col("o_orderstatus"))
      }),

    // -- SNAPSHOT time travel (Snapshots): a tagged snapshot taken before
    //    a journaled DELETE must read the pre-delete dataset exactly
    //    (deleted files retire to the trash and resolve by identity),
    //    while the live read reflects the delete. Both lanes surface in
    //    one result against an oracle that computes the full and the
    //    surviving aggregate from the raw table — a snapshot leaking the
    //    delete, or a delete leaking into the snapshot, breaks a lane.
    QueryDef("q130_snapshot_time_travel", Some("""
      WITH f AS (SELECT c_custkey, c_custkey % 64 AS a,
                        CAST(floor(c_acctbal * 100) AS BIGINT) AS cents
                 FROM customer)
      SELECT 'live' AS src, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS sum_cents
      FROM f WHERE a >= 16
      UNION ALL
      SELECT 'snapshot' AS src, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS sum_cents
      FROM f
      ORDER BY src"""),
      (s, dir) => {
        import graft.sources.Snapshots
        val lake = java.nio.file.Files
          .createTempDirectory("graft-snap-gate").toString + "/customer"
        graft.sinks.Sinks.zorderedWrite(
          T(s, dir, "customer").select(col("c_custkey"),
            (col("c_custkey") % 64).cast("long").as("a"),
            (col("c_custkey") * 7 % 64).cast("long").as("b"),
            floor(col("c_acctbal") * 100).cast("long").as("cents")),
          "a", "b", lake, numFiles = 8, bits = 6)
        Snapshots.snapshot(s, lake, "pin")
        graft.sinks.LakeDelete.deleteFromLake(s, lake, col("a") < 16)
        val live = graft.sources.ZLake.read(s, lake)
          .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
          .select(lit("live").as("src"), col("n"), col("sum_cents"))
        val snap = Snapshots.readSnapshot(s, lake, "pin")
          .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
          .select(lit("snapshot").as("src"), col("n"), col("sum_cents"))
        live.unionAll(snap).orderBy(col("src"))
      }),

    // -- the lake as a STREAMING SOURCE (ZLakeTail): a standing
    //    `readStream.format("zlake")` tails the lake while it GROWS — the
    //    second window lands after the stream has already drained the
    //    first, so discovery, the pinned-batch metadata log, and the
    //    streaming read path all execute across two real micro-batches.
    //    foreachBatch appends every emitted row to a result lake; the
    //    oracle aggregates the full raw table — a dropped file, a
    //    re-emitted batch, or rows leaking across the window boundary all
    //    break the per-window counts/sums.
    QueryDef("q131_lake_tail", Some("""
      WITH f AS (SELECT c_custkey, c_custkey % 64 AS a,
                        c_custkey % 2 AS w
                 FROM customer)
      SELECT CAST(w AS BIGINT) AS w, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(a) AS BIGINT) AS sum_a,
             CAST(sum(c_custkey) AS BIGINT) AS sum_key
      FROM f GROUP BY w ORDER BY w"""),
      (s, dir) => {
        val root = java.nio.file.Files
          .createTempDirectory("graft-tail-gate").toString + "/customer"
        val ckpt = java.nio.file.Files
          .createTempDirectory("graft-tail-gate-ck").toString
        val out = java.nio.file.Files
          .createTempDirectory("graft-tail-gate-out").toString + "/rows"
        val base = T(s, dir, "customer").select(col("c_custkey"),
          (col("c_custkey") % 64).cast("long").as("a"),
          (col("c_custkey") * 7 % 64).cast("long").as("b"))
        def writeWin(w: Int): Unit = graft.sinks.Sinks.zorderedWrite(
          base.filter(col("c_custkey") % 2 === w), "a", "b",
          s"$root/win=$w", numFiles = 4, bits = 6)
        writeWin(0)
        val q = s.readStream.format("zlake").load(root)
          .writeStream.option("checkpointLocation", ckpt)
          .foreachBatch { (b: DataFrame, _: Long) =>
            if (!b.isEmpty) b.write.mode("append").parquet(out)
          }.start()
        q.processAllAvailable()
        writeWin(1) // the lake grows UNDER the standing query
        q.processAllAvailable()
        q.stop()
        s.read.parquet(out)
          .groupBy(col("win").cast("long").as("w"))
          .agg(count(lit(1)).cast("long").as("n"),
            sum("a").cast("long").as("sum_a"),
            sum("c_custkey").cast("long").as("sum_key"))
          .orderBy("w")
      }),

    // -- snapshot-derived CHANGE FEED (Snapshots.diff): pin v1, run a
    //    keyed CDC upsert (updates bump cents by 7; inserts use offset
    //    keys), pin v2, then diff(v1, v2) rowLevel — the copy-on-write
    //    rewrite carries thousands of untouched rows through new files,
    //    and the multiset EXCEPT ALL must cancel every one of them,
    //    leaving exactly the touched keys: old versions as deletes, new
    //    as inserts. The oracle computes the same delta relationally from
    //    the raw table. Any carry-over row surviving (or a touched row
    //    cancelled) breaks the per-change-type counts and sums.
    QueryDef("q132_snapshot_change_feed", Some("""
      WITH f AS (SELECT c_custkey, c_custkey % 64 AS a,
                        (c_custkey * 7) % 64 AS b,
                        CAST(floor(c_acctbal * 100) AS BIGINT) AS cents,
                        c_custkey % 2 AS w
                 FROM customer),
           upd AS (SELECT * FROM f WHERE c_custkey % 101 = 0),
           ins AS (SELECT c_custkey + 200000 AS c_custkey, a, b,
                          c_custkey AS cents, w
                   FROM f WHERE c_custkey % 977 = 0),
           ch AS (SELECT 'delete' AS change, c_custkey, cents FROM upd
                  UNION ALL
                  SELECT 'insert', c_custkey, cents + 7 FROM upd
                  UNION ALL
                  SELECT 'insert', c_custkey, cents FROM ins)
      SELECT change, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c_custkey) AS BIGINT) AS sum_key,
             CAST(sum(cents) AS BIGINT) AS sum_cents
      FROM ch GROUP BY change ORDER BY change"""),
      (s, dir) => {
        import graft.sources.Snapshots
        val root = java.nio.file.Files
          .createTempDirectory("graft-cdc-gate").toString + "/customer"
        val base = T(s, dir, "customer").select(col("c_custkey"),
          (col("c_custkey") % 64).cast("long").as("a"),
          (col("c_custkey") * 7 % 64).cast("long").as("b"),
          floor(col("c_acctbal") * 100).cast("long").as("cents"))
        for (w <- 0 to 1)
          graft.sinks.Sinks.zorderedWrite(
            base.filter(col("c_custkey") % 2 === w),
            "a", "b", s"$root/win=$w", numFiles = 8, bits = 6,
            bloomCols = Seq("c_custkey"))
        Snapshots.snapshot(s, root, "v1")
        val win = (col("c_custkey") % 2).cast("string").as("win")
        val updates = base.filter(col("c_custkey") % 101 === 0)
          .withColumn("cents", col("cents") + 7).withColumn("win", win)
          .unionByName(base.filter(col("c_custkey") % 977 === 0)
            .select((col("c_custkey") + 200000).as("c_custkey"),
              col("a"), col("b"), col("c_custkey").as("cents"))
            .withColumn("win", (col("cents") % 2).cast("string")))
        graft.sinks.LakeDelete.upsertLake(s, root, updates, "c_custkey")
        Snapshots.snapshot(s, root, "v2")
        Snapshots.diff(s, root, "v1", Some("v2"))
          .groupBy(col("_change_type").as("change"))
          .agg(count(lit(1)).cast("long").as("n"),
            sum("c_custkey").cast("long").as("sum_key"),
            sum("cents").cast("long").as("sum_cents"))
          .orderBy("change")
      }),

    // -- MV with MERGEABLE extrema + approx-distinct state (r9): the view
    //    stores per-group min/max and HLL REGISTERS alongside count/sums;
    //    three batch merges + a deliberately REPLAYED batch must leave
    //    registers identical to a single-pass HLL over the whole table —
    //    register-wise max is associative/commutative and the fence
    //    no-ops the replay, so ANY drift (double-merged registers would
    //    be invisible to max, but lost batches, wrong bucketing, or a
    //    moved min/max all surface) breaks the oracle, which rebuilds the
    //    registers hash-for-hash in DuckDB (q73's machinery).
    QueryDef("q134_materialized_distinct", Some(s"""
      WITH f AS (SELECT o_orderkey, o_orderpriority AS g, o_custkey,
                        CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
                 FROM orders),
      h AS (SELECT g, ${dkHash60("CAST(o_custkey AS VARCHAR)")} AS hh FROM f),
      b AS (SELECT g, hh % 16 AS bucket, hh // 16 AS w FROM h),
      r AS (SELECT g, bucket,
              max(CASE WHEN w = 0 THEN 57
                  ELSE bit_count((w & -w) - 1) + 1 END) AS rank
            FROM b GROUP BY 1, 2),
      grid AS (SELECT k.g, gg.bucket
               FROM (SELECT DISTINCT g FROM f) k,
                    (SELECT unnest(range(0, 16)) AS bucket) gg),
      filled AS (SELECT g.g, g.bucket,
                        CAST(coalesce(r.rank, 0) AS BIGINT) AS rank
                 FROM grid g LEFT JOIN r USING (g, bucket)),
      regs AS (SELECT g, list(rank ORDER BY bucket) AS regs
               FROM filled GROUP BY 1),
      base AS (SELECT g, CAST(count(*) AS BIGINT) AS cnt,
                      CAST(sum(cents) AS BIGINT) AS cents_sum,
                      CAST(min(cents) AS BIGINT) AS cents_min,
                      CAST(max(cents) AS BIGINT) AS cents_max
               FROM f GROUP BY 1)
      SELECT b.g, b.cnt, b.cents_sum, b.cents_min, b.cents_max,
             array_to_string(r.regs, '|') AS reg_str
      FROM base b JOIN regs r USING (g) ORDER BY g"""),
      (s, dir) => {
        import graft.sinks.MaterializedAgg
        val root = java.nio.file.Files
          .createTempDirectory("graft-mv-ext-gate").toString + "/mv"
        val spec = MaterializedAgg.Spec(groupCols = Seq("g"),
          sumCols = Seq("cents"), minCols = Seq("cents"),
          maxCols = Seq("cents"), distinctCols = Seq("o_custkey"),
          hllM = 16)
        val base = T(s, dir, "orders").select(col("o_orderkey"),
          col("o_orderpriority").as("g"), col("o_custkey"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        for (i <- 0 until 3)
          MaterializedAgg.mergeBatch(s, root,
            base.filter(col("o_orderkey") % 3 === i), spec, i.toLong)
        MaterializedAgg.mergeBatch(s, root,
          base.filter(col("o_orderkey") % 3 === 1), spec, 1L)
        MaterializedAgg.readView(s, root, spec)
          .select(col("g"), col("cnt"), col("cents_sum"),
            col("cents_min"), col("cents_max"),
            concat_ws("|",
              transform(col("o_custkey_hll"), _.cast("string"))).as("reg_str"))
          .orderBy("g")
      }),

    // -- Hilbert-clustered lake (hilbertWrite): the alternative space-
    //    filling curve through the SAME manifest/pruning read path — a
    //    box filter + aggregate over a 16-file Hilbert layout must equal
    //    the raw-table oracle exactly (clustering is invisible to
    //    results; only envelopes tighten). The curve itself is pinned by
    //    HilbertLayoutSpec (bijection + continuity); this gates the lake
    //    integration end to end through the driver.
    QueryDef("q135_hilbert_lake", Some("""
      WITH f AS (SELECT c_custkey, c_custkey % 256 AS a,
                        (c_custkey * 7) % 256 AS b, c_acctbal
                 FROM customer)
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(a) AS BIGINT) AS sum_a,
             CAST(sum(b) AS BIGINT) AS sum_b,
             CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal
      FROM f WHERE a BETWEEN 32 AND 63 AND b BETWEEN 64 AND 127
      ORDER BY n"""),
      (s, dir) => {
        val lake = java.nio.file.Files
          .createTempDirectory("graft-hilbert-gate").toString + "/customer"
        graft.sinks.Sinks.hilbertWrite(
          T(s, dir, "customer").select(col("c_custkey"),
            (col("c_custkey") % 256).cast("long").as("a"),
            (col("c_custkey") * 7 % 256).cast("long").as("b"),
            col("c_acctbal")),
          "a", "b", lake, numFiles = 16, bits = 8)
        graft.sources.ZLake.read(s, lake)
          .filter(col("a").between(32, 63) && col("b").between(64, 127))
          .agg(count("*").cast("long").as("n"),
            sum("a").cast("long").as("sum_a"),
            sum("b").cast("long").as("sum_b"),
            sum(floor(col("c_acctbal") * 100).cast("long"))
              .cast("long").as("bal"))
          .orderBy("n")
      }),

    // -- lake SCHEMA EVOLUTION through the driver gate: window 0 lands
    //    with (k, a), window 1 adds an `extra` column; the union-merged
    //    manifest schema (ZLakeManifestSpec pins the merge itself) must
    //    plan a read where old files backfill `extra` as NULL and new
    //    files carry real values — count(extra) vs count(*) splits the
    //    two populations, and the data filter exercises envelope pruning
    //    ACROSS the schema boundary. Oracle: the same two-generation
    //    union built relationally.
    QueryDef("q136_lake_schema_evolution", Some("""
      WITH f AS (
        SELECT c_custkey AS k, c_custkey % 64 AS a,
               CAST(NULL AS BIGINT) AS extra
        FROM customer WHERE c_custkey % 2 = 0
        UNION ALL
        SELECT c_custkey, c_custkey % 64, c_custkey * 3
        FROM customer WHERE c_custkey % 2 = 1)
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(count(extra) AS BIGINT) AS n_extra,
             CAST(sum(a) AS BIGINT) AS sum_a,
             CAST(sum(extra) AS BIGINT) AS sum_extra
      FROM f WHERE a BETWEEN 16 AND 47 ORDER BY n"""),
      (s, dir) => {
        val root = java.nio.file.Files
          .createTempDirectory("graft-evolve-gate").toString + "/customer"
        val base = T(s, dir, "customer").select(
          col("c_custkey").as("k"),
          (col("c_custkey") % 64).cast("long").as("a"))
        graft.sinks.Sinks.zorderedWrite(
          base.filter(col("k") % 2 === 0),
          "a", "k", s"$root/win=0", numFiles = 4, bits = 6)
        graft.sinks.Sinks.zorderedWrite(
          base.filter(col("k") % 2 === 1)
            .withColumn("extra", col("k") * 3),
          "a", "k", s"$root/win=1", numFiles = 4, bits = 6)
        graft.sources.ZLake.read(s, root)
          .filter(col("a").between(16, 47))
          .agg(count(lit(1)).cast("long").as("n"),
            count(col("extra")).cast("long").as("n_extra"),
            sum("a").cast("long").as("sum_a"),
            sum("extra").cast("long").as("sum_extra"))
          .orderBy("n")
      }),

    // -- multi-grain MV (rollup lattice): ONE maintained view stores the
    //    (g,h), (g) and grand-total grains — each batch computes the
    //    whole lattice with native grouping sets (one scan, one shuffle)
    //    and merges behind the fence; a replayed batch must move nothing
    //    in ANY grain. The oracle recomputes each grain relationally and
    //    unions them under a grain label — a cross-grain key collision
    //    (the NULL-vs-aggregated-away trap) or a grain double-count
    //    breaks its slice.
    QueryDef("q137_materialized_lattice", Some("""
      WITH f AS (SELECT o_orderkey, o_orderpriority AS g, o_orderstatus AS h,
                        CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
                 FROM orders)
      SELECT 'g_h' AS grain, g, h, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS sum_cents
      FROM f GROUP BY g, h
      UNION ALL
      SELECT 'g', g, CAST(NULL AS VARCHAR), CAST(count(*) AS BIGINT),
             CAST(sum(cents) AS BIGINT)
      FROM f GROUP BY g
      UNION ALL
      SELECT 'total', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
             CAST(count(*) AS BIGINT), CAST(sum(cents) AS BIGINT)
      FROM f
      ORDER BY grain, g, h"""),
      (s, dir) => {
        import graft.sinks.MaterializedAgg
        val root = java.nio.file.Files
          .createTempDirectory("graft-mv-lat-gate").toString + "/mv"
        val spec = MaterializedAgg.Spec(groupCols = Seq("g", "h"),
          sumCols = Seq("cents"),
          groupingSets = Seq(Seq("g", "h"), Seq("g"), Nil))
        val base = T(s, dir, "orders").select(col("o_orderkey"),
          col("o_orderpriority").as("g"), col("o_orderstatus").as("h"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        for (i <- 0 until 3)
          MaterializedAgg.mergeBatch(s, root,
            base.filter(col("o_orderkey") % 3 === i), spec, i.toLong)
        MaterializedAgg.mergeBatch(s, root,
          base.filter(col("o_orderkey") % 3 === 1), spec, 1L)
        def grain(label: String, set: Seq[String]): DataFrame =
          MaterializedAgg.readGrain(s, root, spec, set)
            .select(lit(label).as("grain"),
              (if (set.contains("g")) col("g")
               else lit(null).cast("string")).as("g"),
              (if (set.contains("h")) col("h")
               else lit(null).cast("string")).as("h"),
              col("cnt").as("n"), col("cents_sum").as("sum_cents"))
        grain("g_h", Seq("g", "h"))
          .unionByName(grain("g", Seq("g")))
          .unionByName(grain("total", Nil))
          .orderBy("grain", "g", "h")
      }),

    // -- MATERIALIZED-VIEW QUERY REWRITING (plans/MvRewrite): the base
    //    lake is registered against its maintained view, and a plain
    //    GROUP BY over the BASE READ is answered by re-aggregating the
    //    view's stored partials (MvRewriteSpec pins the plan: zero base
    //    files scanned; unsupported shapes keep the scan). The oracle
    //    computes the same aggregate over the raw table — the rewrite
    //    must be bit-identical to the scan it replaced, including the
    //    group-column filter that rides it.
    QueryDef("q138_mv_query_rewrite", Some("""
      WITH f AS (SELECT o_orderpriority AS g, o_orderstatus AS h,
                        CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
                 FROM orders)
      SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS sum_cents,
             CAST(min(cents) AS BIGINT) AS lo,
             CAST(max(cents) AS BIGINT) AS hi
      FROM f WHERE g <> '3-MEDIUM' GROUP BY g ORDER BY g"""),
      (s, dir) => {
        import graft.plans.MvRewrite
        import graft.sinks.MaterializedAgg
        val base = java.nio.file.Files
          .createTempDirectory("graft-mvrw-gate").toString + "/orders"
        val view = base.stripSuffix("/orders") + "/mv"
        graft.sinks.Sinks.zorderedWrite(
          T(s, dir, "orders").select(col("o_orderkey"),
            col("o_orderpriority").as("g"), col("o_orderstatus").as("h"),
            floor(col("o_totalprice") * 100).cast("long").as("cents")),
          "o_orderkey", "cents", base, numFiles = 4, bits = 8)
        val spec = MaterializedAgg.Spec(groupCols = Seq("g", "h"),
          sumCols = Seq("cents"), minCols = Seq("cents"),
          maxCols = Seq("cents"),
          groupingSets = Seq(Seq("g", "h"), Seq("g")))
        for (i <- 0 until 2)
          MaterializedAgg.mergeBatch(s, view,
            graft.sources.ZLake.read(s, base)
              .filter(col("o_orderkey") % 2 === i), spec, i.toLong)
        MvRewrite.register(base, view, spec)
        graft.sources.ZLake.read(s, base)
          .filter(col("g") =!= "3-MEDIUM")
          .groupBy("g")
          .agg(count(lit(1)).cast("long").as("n"),
            sum("cents").cast("long").as("sum_cents"),
            min("cents").cast("long").as("lo"),
            max("cents").cast("long").as("hi"))
          .orderBy("g")
      }),

    // -- MV COMPACTION mid-maintenance (LakeDelete.rewriteLake via
    //    MaterializedAgg.compactView): two merges fragment the view,
    //    compaction rewrites it whole through the journal (fence and
    //    ownership marker untouched), then a REPLAY of batch 1 and a
    //    fresh batch 2 land on the compacted layout — exactly-once must
    //    hold ACROSS the compaction, and the key blooms the pruned read
    //    needs must survive the rewrite. Oracle: one-pass aggregate.
    QueryDef("q139_mv_compaction", Some("""
      WITH f AS (SELECT c_custkey, c_mktsegment AS g,
                        CAST(floor(c_acctbal * 100) AS BIGINT) AS cents
                 FROM customer)
      SELECT g, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(cents) AS BIGINT) AS cents_sum
      FROM f GROUP BY g ORDER BY g"""),
      (s, dir) => {
        import graft.sinks.MaterializedAgg
        val root = java.nio.file.Files
          .createTempDirectory("graft-mv-cmp-gate").toString + "/mv"
        val spec = MaterializedAgg.Spec(groupCols = Seq("g"),
          sumCols = Seq("cents"))
        val base = T(s, dir, "customer").select(col("c_custkey"),
          col("c_mktsegment").as("g"),
          floor(col("c_acctbal") * 100).cast("long").as("cents"))
        for (i <- 0 until 2)
          MaterializedAgg.mergeBatch(s, root,
            base.filter(col("c_custkey") % 3 === i), spec, i.toLong)
        MaterializedAgg.compactView(s, root, spec)
        MaterializedAgg.mergeBatch(s, root,
          base.filter(col("c_custkey") % 3 === 1), spec, 1L) // replay: no-op
        MaterializedAgg.mergeBatch(s, root,
          base.filter(col("c_custkey") % 3 === 2), spec, 2L)
        MaterializedAgg.readView(s, root, spec)
          .select(col("g"), col("cnt"), col("cents_sum"))
          .orderBy("g")
      }),

    // -- the SQL spelling of the CoW delete (r9 verdict #8 / GraftDml):
    //    same lake + predicate as q122, but the mutation is ANSI
    //    `DELETE FROM <zlake view> WHERE ...` through the post-hoc DML
    //    rule, and the remainder aggregate is read back through the SAME
    //    view after the standard REFRESH verb — the whole round trip is
    //    SQL a warehouse user could type. Oracle identical in shape to
    //    q122's relational remainder.
    QueryDef("q142_sql_delete", Some("""
      WITH f AS (SELECT c_custkey, c_custkey % 64 AS a,
                        (c_custkey * 7) % 64 AS b, c_acctbal,
                        c_custkey % 2 AS w
                 FROM customer),
           d AS (SELECT * FROM f
                 WHERE NOT ((w = 1 AND b >= 32) OR (w = 0 AND a < 16)))
      SELECT CAST(w AS BIGINT) AS w, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(a) AS BIGINT) AS sum_a,
             CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal
      FROM d GROUP BY w ORDER BY w"""),
      (s, dir) => {
        val root = java.nio.file.Files
          .createTempDirectory("graft-sql-del").toString + "/customer"
        val base = T(s, dir, "customer").select(col("c_custkey"),
          (col("c_custkey") % 64).cast("long").as("a"),
          (col("c_custkey") * 7 % 64).cast("long").as("b"),
          col("c_acctbal"))
        for (w <- 0 to 1)
          graft.sinks.Sinks.zorderedWrite(
            base.filter(col("c_custkey") % 2 === w),
            "a", "b", s"$root/win=$w", numFiles = 8, bits = 6)
        s.sql("DROP VIEW IF EXISTS q142_lake")
        s.sql(s"CREATE TEMPORARY VIEW q142_lake USING zlake " +
          s"OPTIONS (path '$root')")
        s.sql("DELETE FROM q142_lake " +
          "WHERE (win = '1' AND b >= 32) OR (win = '0' AND a < 16)")
        s.sql("REFRESH TABLE q142_lake")
        s.sql("""SELECT CAST(win AS BIGINT) AS w,
                        CAST(count(*) AS BIGINT) AS n,
                        CAST(sum(a) AS BIGINT) AS sum_a,
                        CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT))
                          AS BIGINT) AS bal
                 FROM q142_lake GROUP BY win ORDER BY w""")
      }),

    // -- the SQL spelling of the keyed upsert: q123's merge as ANSI
    //    `MERGE INTO t USING s ON t.k = s.k WHEN MATCHED THEN UPDATE SET *
    //    WHEN NOT MATCHED THEN INSERT *` — the exact restricted shape
    //    GraftDml maps onto LakeDelete.upsertLake (anything else keeps
    //    Spark's v2-only refusal). Oracle: the same relational merge.
    QueryDef("q143_sql_merge", Some("""
      WITH f AS (SELECT c_custkey, c_custkey % 64 AS a,
                        (c_custkey * 7) % 64 AS b,
                        CAST(floor(c_acctbal * 100) AS BIGINT) AS cents,
                        c_custkey % 2 AS w
                 FROM customer),
           u AS (SELECT c_custkey, a, b, cents + 7 AS cents, w FROM f
                 WHERE c_custkey % 101 = 0
                 UNION ALL
                 SELECT c_custkey + 200000, a, b, c_custkey AS cents, w
                 FROM f WHERE c_custkey % 977 = 0),
           m AS (SELECT * FROM f
                 WHERE c_custkey NOT IN (SELECT c_custkey FROM u)
                 UNION ALL SELECT * FROM u)
      SELECT CAST(w AS BIGINT) AS w, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS sum_cents,
             CAST(sum(c_custkey) AS BIGINT) AS sum_key
      FROM m GROUP BY w ORDER BY w"""),
      (s, dir) => {
        val root = java.nio.file.Files
          .createTempDirectory("graft-sql-mrg").toString + "/customer"
        val base = T(s, dir, "customer").select(col("c_custkey"),
          (col("c_custkey") % 64).cast("long").as("a"),
          (col("c_custkey") * 7 % 64).cast("long").as("b"),
          floor(col("c_acctbal") * 100).cast("long").as("cents"))
        for (w <- 0 to 1)
          graft.sinks.Sinks.zorderedWrite(
            base.filter(col("c_custkey") % 2 === w),
            "a", "b", s"$root/win=$w", numFiles = 8, bits = 6,
            bloomCols = Seq("c_custkey"))
        val win = (col("c_custkey") % 2).cast("string").as("win")
        base.filter(col("c_custkey") % 101 === 0)
          .withColumn("cents", col("cents") + 7).withColumn("win", win)
          .unionByName(base.filter(col("c_custkey") % 977 === 0)
            .select((col("c_custkey") + 200000).as("c_custkey"),
              col("a"), col("b"), col("c_custkey").as("cents"))
            .withColumn("win", (col("cents") % 2).cast("string")))
          .createOrReplaceTempView("q143_updates")
        s.sql("DROP VIEW IF EXISTS q143_lake")
        s.sql(s"CREATE TEMPORARY VIEW q143_lake USING zlake " +
          s"OPTIONS (path '$root')")
        s.sql("""MERGE INTO q143_lake t USING q143_updates s
                 ON t.c_custkey = s.c_custkey
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
        s.sql("REFRESH TABLE q143_lake")
        s.sql("""SELECT CAST(win AS BIGINT) AS w,
                        CAST(count(*) AS BIGINT) AS n,
                        CAST(sum(cents) AS BIGINT) AS sum_cents,
                        CAST(sum(c_custkey) AS BIGINT) AS sum_key
                 FROM q143_lake GROUP BY win ORDER BY w""")
      }),

    // -- the SQL spelling of the CoW UPDATE (completes the DML trio):
    //    `UPDATE t SET cents = cents + 11, seg = 'HOT' WHERE p` through
    //    GraftDml → LakeDelete.updateLake — envelope triage, an exact
    //    per-directory match-count pass (zero-match dirs byte-untouched),
    //    one staged rewrite, journal commit. The oracle applies the same
    //    CASE transform relationally; NULL-predicate rows must stay
    //    unchanged and row count must be conserved.
    QueryDef("q144_sql_update", Some("""
      WITH f AS (SELECT c_custkey, c_custkey % 64 AS a,
                        CAST(floor(c_acctbal * 100) AS BIGINT) AS cents,
                        c_mktsegment AS seg, c_custkey % 2 AS w
                 FROM customer),
           u AS (SELECT c_custkey, a, w,
                        CASE WHEN w = 0 AND a < 24 THEN cents + 11
                             ELSE cents END AS cents,
                        CASE WHEN w = 0 AND a < 24 THEN 'HOT'
                             ELSE seg END AS seg
                 FROM f)
      SELECT CAST(w AS BIGINT) AS w, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS sum_cents,
             CAST(sum(CASE WHEN seg = 'HOT' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hot
      FROM u GROUP BY w ORDER BY w"""),
      (s, dir) => {
        val root = java.nio.file.Files
          .createTempDirectory("graft-sql-upd").toString + "/customer"
        val base = T(s, dir, "customer").select(col("c_custkey"),
          (col("c_custkey") % 64).cast("long").as("a"),
          floor(col("c_acctbal") * 100).cast("long").as("cents"),
          col("c_mktsegment").as("seg"))
        for (w <- 0 to 1)
          graft.sinks.Sinks.zorderedWrite(
            base.filter(col("c_custkey") % 2 === w),
            "a", "cents", s"$root/win=$w", numFiles = 8, bits = 6)
        s.sql("DROP VIEW IF EXISTS q144_lake")
        s.sql(s"CREATE TEMPORARY VIEW q144_lake USING zlake " +
          s"OPTIONS (path '$root')")
        s.sql("UPDATE q144_lake SET cents = cents + 11, seg = 'HOT' " +
          "WHERE win = '0' AND a < 24")
        s.sql("REFRESH TABLE q144_lake")
        s.sql("""SELECT CAST(win AS BIGINT) AS w,
                        CAST(count(*) AS BIGINT) AS n,
                        CAST(sum(cents) AS BIGINT) AS sum_cents,
                        CAST(sum(CASE WHEN seg = 'HOT' THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_hot
                 FROM q144_lake GROUP BY win ORDER BY w""")
      }),

    // -- the SQL spelling of the journaled APPEND (INSERT INTO a zlake
    //    view → GraftDml reroutes Spark's InsertIntoHadoopFsRelationCommand
    //    through LakeDelete.appendLake): new rows land as staged files +
    //    one journal commit with manifests repaired, so the post-insert
    //    read still plans with zero footer opens. Oracle: UNION ALL.
    QueryDef("q145_sql_insert", Some("""
      WITH f AS (SELECT c_custkey, c_custkey % 64 AS a,
                        CAST(floor(c_acctbal * 100) AS BIGINT) AS cents,
                        c_custkey % 2 AS w
                 FROM customer),
           i AS (SELECT c_custkey + 500000 AS c_custkey, a,
                        c_custkey AS cents, w
                 FROM f WHERE c_custkey % 487 = 0),
           m AS (SELECT * FROM f UNION ALL SELECT * FROM i)
      SELECT CAST(w AS BIGINT) AS w, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS sum_cents,
             CAST(sum(c_custkey) AS BIGINT) AS sum_key
      FROM m GROUP BY w ORDER BY w"""),
      (s, dir) => {
        val root = java.nio.file.Files
          .createTempDirectory("graft-sql-ins").toString + "/customer"
        val base = T(s, dir, "customer").select(col("c_custkey"),
          (col("c_custkey") % 64).cast("long").as("a"),
          floor(col("c_acctbal") * 100).cast("long").as("cents"))
        for (w <- 0 to 1)
          graft.sinks.Sinks.zorderedWrite(
            base.filter(col("c_custkey") % 2 === w),
            "a", "cents", s"$root/win=$w", numFiles = 8, bits = 6)
        s.sql("DROP VIEW IF EXISTS q145_lake")
        s.sql(s"CREATE TEMPORARY VIEW q145_lake USING zlake " +
          s"OPTIONS (path '$root')")
        base.filter(col("c_custkey") % 487 === 0)
          .select((col("c_custkey") + 500000).as("c_custkey"), col("a"),
            col("c_custkey").as("cents"),
            (col("c_custkey") % 2).cast("string").as("win"))
          .createOrReplaceTempView("q145_inserts")
        s.sql("INSERT INTO q145_lake SELECT * FROM q145_inserts")
        s.sql("REFRESH TABLE q145_lake")
        s.sql("""SELECT CAST(win AS BIGINT) AS w,
                        CAST(count(*) AS BIGINT) AS n,
                        CAST(sum(cents) AS BIGINT) AS sum_cents,
                        CAST(sum(c_custkey) AS BIGINT) AS sum_key
                 FROM q145_lake GROUP BY win ORDER BY w""")
      }),

    // -- KEYED CHANGE FEED (Snapshots.diffKeyed): the snapshot diff
    //    classified per key into the Delta CDF vocabulary. The pipeline:
    //    snapshot v0 → keyed UPSERT (changed cents for %97 keys, brand-new
    //    %487 keys) → retention DELETE (%131) → snapshot v1 → feed. The
    //    oracle replays before/after states in DuckDB and classifies via
    //    FULL OUTER JOIN: a fabricated update pair, a missed unchanged-row
    //    suppression, or a wrong pre/post image all hash-mismatch.
    QueryDef("q147_change_feed_keyed", Some("""
      WITH f AS (SELECT c_custkey AS id, c_custkey % 64 AS a,
                        CAST(floor(c_acctbal * 100) AS BIGINT) AS cents
                 FROM customer),
           upd AS (SELECT id, a, id AS cents FROM f WHERE id % 97 = 0),
           ins AS (SELECT id + 700000 AS id, a, id AS cents
                   FROM f WHERE id % 487 = 0),
           before_s AS (SELECT * FROM f),
           after0 AS (SELECT * FROM f WHERE id % 97 <> 0
                      UNION ALL SELECT * FROM upd
                      UNION ALL SELECT * FROM ins),
           after_s AS (SELECT * FROM after0 WHERE id % 131 <> 0),
           dels AS (SELECT b.id, b.cents, 'delete' AS _change_type
                    FROM before_s b LEFT JOIN after_s a2 USING (id)
                    WHERE a2.id IS NULL),
           inss AS (SELECT a2.id, a2.cents, 'insert' AS _change_type
                    FROM after_s a2 LEFT JOIN before_s b USING (id)
                    WHERE b.id IS NULL),
           upds AS (SELECT b.id, b.cents AS pre_c, a2.cents AS post_c
                    FROM before_s b JOIN after_s a2 USING (id)
                    WHERE b.cents <> a2.cents)
      SELECT id, cents, _change_type FROM dels
      UNION ALL SELECT id, cents, _change_type FROM inss
      UNION ALL SELECT id, pre_c AS cents, 'update_preimage' FROM upds
      UNION ALL SELECT id, post_c AS cents, 'update_postimage' FROM upds
      ORDER BY id, _change_type"""),
      (s, dir) => {
        val root = java.nio.file.Files
          .createTempDirectory("graft-cdf-gate").toString + "/t"
        val base = T(s, dir, "customer").select(
          col("c_custkey").as("id"),
          (col("c_custkey") % 64).cast("long").as("a"),
          floor(col("c_acctbal") * 100).cast("long").as("cents"))
        for (w <- 0 to 1)
          graft.sinks.Sinks.zorderedWrite(base.filter(col("id") % 2 === w),
            "a", "cents", s"$root/win=$w", numFiles = 4, bits = 6,
            bloomCols = Seq("id"))
        graft.sources.Snapshots.snapshot(s, root, "v0")
        val upd = base.filter(col("id") % 97 === 0)
          .select(col("id"), col("a"), col("id").as("cents"))
        val ins = base.filter(col("id") % 487 === 0)
          .select((col("id") + 700000).as("id"), col("a"),
            col("id").as("cents"))
        val batch = upd.unionByName(ins)
          .withColumn("win", (col("id") % 2).cast("string"))
        graft.sinks.LakeDelete.upsertLake(s, root, batch, "id")
        graft.sinks.LakeDelete.deleteFromLake(s, root, col("id") % 131 === 0)
        graft.sources.Snapshots.snapshot(s, root, "v1")
        graft.sources.Snapshots.diffKeyed(s, root, "id", "v0", Some("v1"))
          .select(col("id"), col("cents"), col("_change_type"))
          .orderBy(col("id"), col("_change_type"))
      }),

    // -- CHECK CONSTRAINTS (LakeConstraints, Delta ADD CONSTRAINT parity):
    //    added via the SQL CALL surface, enforced on the SQL INSERT path —
    //    the violating batch is REJECTED WHOLE (the lake stays
    //    byte-identical; the thrown ConstraintViolation is caught here),
    //    the compliant batch lands. The oracle is base + compliant batch
    //    only: a half-landed rejected batch or a skipped compliant row
    //    hash-mismatches.
    QueryDef("q148_sql_constraints", Some("""
      WITH f AS (SELECT c_custkey, c_custkey % 64 AS a,
                        CAST(floor(c_acctbal * 100) AS BIGINT) AS cents,
                        c_custkey % 2 AS w
                 FROM customer),
           ok AS (SELECT c_custkey + 900000 AS c_custkey,
                         a % 32 AS a, CAST(1 AS BIGINT) AS cents, w
                  FROM f WHERE c_custkey % 211 = 0),
           m AS (SELECT * FROM f UNION ALL SELECT * FROM ok)
      SELECT CAST(w AS BIGINT) AS w, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS sum_cents,
             CAST(sum(a) AS BIGINT) AS sum_a
      FROM m GROUP BY w ORDER BY w"""),
      (s, dir) => {
        val root = java.nio.file.Files
          .createTempDirectory("graft-chk-gate").toString + "/t"
        val base = T(s, dir, "customer").select(col("c_custkey"),
          (col("c_custkey") % 64).cast("long").as("a"),
          floor(col("c_acctbal") * 100).cast("long").as("cents"))
        for (w <- 0 to 1)
          graft.sinks.Sinks.zorderedWrite(
            base.filter(col("c_custkey") % 2 === w),
            "a", "cents", s"$root/win=$w", numFiles = 4, bits = 6)
        s.sql(s"CALL graft.constraint_add('$root', 'a-bounded', " +
          "'a >= 0 AND a < 64')")
        s.sql("DROP VIEW IF EXISTS q148_lake")
        s.sql(s"CREATE TEMPORARY VIEW q148_lake USING zlake " +
          s"OPTIONS (path '$root')")
        // violating batch: a = 99 breaks the CHECK — rejected whole
        base.filter(col("c_custkey") % 211 === 0)
          .select((col("c_custkey") + 800000).as("c_custkey"),
            lit(99L).as("a"), lit(1L).as("cents"),
            (col("c_custkey") % 2).cast("string").as("win"))
          .createOrReplaceTempView("q148_bad")
        try { s.sql("INSERT INTO q148_lake SELECT * FROM q148_bad"); () }
        catch { case _: Throwable => () } // expected: CHECK 'a-bounded'
        // compliant batch lands
        base.filter(col("c_custkey") % 211 === 0)
          .select((col("c_custkey") + 900000).as("c_custkey"),
            (col("a") % 32).as("a"), lit(1L).as("cents"),
            (col("c_custkey") % 2).cast("string").as("win"))
          .createOrReplaceTempView("q148_ok")
        s.sql("INSERT INTO q148_lake SELECT * FROM q148_ok")
        s.sql("REFRESH TABLE q148_lake")
        s.sql("""SELECT CAST(win AS BIGINT) AS w,
                        CAST(count(*) AS BIGINT) AS n,
                        CAST(sum(cents) AS BIGINT) AS sum_cents,
                        CAST(sum(a) AS BIGINT) AS sum_a
                 FROM q148_lake GROUP BY win ORDER BY w""")
      }),

    // -- MERGE-ON-READ deletes (DeletionVectors): a scattered point
    //    delete records row POSITIONS instead of rewriting files (the
    //    Delta DV / Iceberg position-delete shape — the fast path for
    //    GDPR-style erasure where CoW would rewrite terabytes to drop
    //    kilobytes); reads merge the vectors out via one broadcast
    //    anti-join, and `compact` later materializes them. The same
    //    aggregate is emitted in BOTH states — 'mor' (vectors live, read
    //    merges) and 'compacted' (vectors materialized) — against one
    //    oracle: the two phases must agree with each other AND with the
    //    relational truth.
    QueryDef("q150_mor_delete", Some("""
      WITH f AS (SELECT c_custkey, c_custkey % 64 AS a,
                        CAST(floor(c_acctbal * 100) AS BIGINT) AS cents,
                        c_custkey % 2 AS w
                 FROM customer),
           kept AS (SELECT * FROM f WHERE c_custkey % 211 <> 0),
           g AS (SELECT CAST(w AS BIGINT) AS w,
                        CAST(count(*) AS BIGINT) AS n,
                        CAST(sum(cents) AS BIGINT) AS sum_cents
                 FROM kept GROUP BY w)
      SELECT 'compacted' AS phase, w, n, sum_cents FROM g
      UNION ALL SELECT 'mor' AS phase, w, n, sum_cents FROM g
      ORDER BY phase, w"""),
      (s, dir) => {
        val root = java.nio.file.Files
          .createTempDirectory("graft-mor-gate").toString + "/t"
        val base = T(s, dir, "customer").select(col("c_custkey"),
          (col("c_custkey") % 64).cast("long").as("a"),
          floor(col("c_acctbal") * 100).cast("long").as("cents"))
        for (w <- 0 to 1)
          graft.sinks.Sinks.zorderedWrite(
            base.filter(col("c_custkey") % 2 === w),
            "a", "cents", s"$root/win=$w", numFiles = 4, bits = 6,
            bloomCols = Seq("c_custkey"))
        s.sql(s"CALL graft.delete_mor('$root', 'c_custkey % 211 = 0')")
        def aggOf(phase: String) =
          graft.sources.ZLake.read(s, root)
            .groupBy(col("win").cast("long").as("w"))
            .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
            .withColumn("phase", lit(phase))
            .select("phase", "w", "n", "sum_cents")
        // materialize the merge-on-read answer BEFORE compaction
        val cached = aggOf("mor").collect().toSeq
        s.sql(s"CALL graft.dv_compact('$root')")
        val compacted = aggOf("compacted")
        import s.implicits._
        compacted.unionByName(
            cached.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
              r.getLong(3))).toDF("phase", "w", "n", "sum_cents"))
          .orderBy(col("phase"), col("w"))
      }),

    // -- CATALOG-FREE bucketed lake (Sinks.bucketedLakeWrite + the
    //    _graft_buckets.json sidecar ZLake surfaces as a BucketSpec): the
    //    co-located-join layout for repeated fact/fact joins at 100 TB —
    //    both sides hash-routed to pmod(murmur3(key), n) at WRITE time, so
    //    every later join/groupBy on the key plans with zero shuffle
    //    exchanges (plan-asserted in BucketedLakeSpec; the gate asserts
    //    the routing loses/duplicates nothing). Customer lands in two
    //    batches — bootstrap write + a journaled bucket-aware APPEND (the
    //    one mutation the layout admits) — then joins orders bucketed the
    //    same way; the oracle replays the plain relational join.
    QueryDef("q152_bucketed_lake_join", Some("""
      WITH c AS (SELECT c_custkey,
                        CAST(floor(c_acctbal * 100) AS BIGINT) AS cents
                 FROM customer),
           j AS (SELECT c.c_custkey % 13 AS g, c.cents
                 FROM c JOIN orders o ON c.c_custkey = o.o_custkey)
      SELECT CAST(g AS BIGINT) AS g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS sum_cents
      FROM j GROUP BY g ORDER BY g"""),
      (s, dir) => {
        val base = java.nio.file.Files
          .createTempDirectory("graft-bucket-gate").toString
        val cust = T(s, dir, "customer").select(col("c_custkey"),
          floor(col("c_acctbal") * 100).cast("long").as("cents"))
        graft.sinks.Sinks.bucketedLakeWrite(
          cust.filter(col("c_custkey") % 10 =!= 0), Seq("c_custkey"), 8,
          s"$base/cust")
        graft.sinks.LakeDelete.appendLake(s, s"$base/cust",
          cust.filter(col("c_custkey") % 10 === 0))
        graft.sinks.Sinks.bucketedLakeWrite(
          T(s, dir, "orders").select(col("o_custkey")), Seq("o_custkey"), 8,
          s"$base/ord")
        graft.sources.ZLake.read(s, s"$base/cust")
          .join(graft.sources.ZLake.read(s, s"$base/ord"),
            col("c_custkey") === col("o_custkey"))
          .groupBy((col("c_custkey") % 13).cast("long").as("g"))
          .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
          .orderBy(col("g"))
      }),

    // -- SNAPSHOT + DELETION-VECTOR composition (r11): a snapshot pins
    //    the DV store GENERATION, so GDPR point-deletes and pinned
    //    readers coexist (Delta's DV + time-travel parity). Three lanes
    //    against one relational oracle: the pre-delete snapshot still
    //    includes the MoR-deleted rows, the live read excludes them, and
    //    the change feed surfaces exactly those rows as deletes (the
    //    common-file DV-delta lane — no file identity changes here).
    QueryDef("q153_dv_snapshot_diff", Some("""
      WITH f AS (SELECT c_custkey,
                        CAST(floor(c_acctbal * 100) AS BIGINT) AS cents,
                        c_custkey % 2 AS w
                 FROM customer),
           kept AS (SELECT * FROM f WHERE c_custkey % 211 <> 0),
           del AS (SELECT * FROM f WHERE c_custkey % 211 = 0),
           g0 AS (SELECT 'v0' AS phase, CAST(w AS BIGINT) AS w,
                         CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(cents) AS BIGINT) AS sum_cents
                  FROM f GROUP BY w),
           gl AS (SELECT 'live' AS phase, CAST(w AS BIGINT) AS w,
                         CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(cents) AS BIGINT) AS sum_cents
                  FROM kept GROUP BY w),
           gd AS (SELECT 'diff' AS phase, CAST(w AS BIGINT) AS w,
                         CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(cents) AS BIGINT) AS sum_cents
                  FROM del GROUP BY w)
      SELECT * FROM g0 UNION ALL SELECT * FROM gl
      UNION ALL SELECT * FROM gd
      ORDER BY phase, w"""),
      (s, dir) => {
        val root = java.nio.file.Files
          .createTempDirectory("graft-dvsnap-gate").toString + "/t"
        val base = T(s, dir, "customer").select(col("c_custkey"),
          (col("c_custkey") % 64).cast("long").as("a"),
          floor(col("c_acctbal") * 100).cast("long").as("cents"))
        for (w <- 0 to 1)
          graft.sinks.Sinks.zorderedWrite(
            base.filter(col("c_custkey") % 2 === w),
            "a", "cents", s"$root/win=$w", numFiles = 4, bits = 6,
            bloomCols = Seq("c_custkey"))
        graft.sources.Snapshots.snapshot(s, root, "v0")
        graft.sinks.DeletionVectors.deleteMoR(s, root,
          col("c_custkey") % 211 === 0)
        def aggOf(df: org.apache.spark.sql.DataFrame, phase: String) = df
          .groupBy(col("win").cast("long").as("w"))
          .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
          .withColumn("phase", lit(phase))
          .select("phase", "w", "n", "sum_cents")
        aggOf(graft.sources.Snapshots.readSnapshot(s, root, "v0"), "v0")
          .unionByName(aggOf(graft.sources.ZLake.read(s, root), "live"))
          .unionByName(aggOf(graft.sources.Snapshots
            .diff(s, root, "v0", None)
            .filter(col("_change_type") === "delete"), "diff"))
          .orderBy(col("phase"), col("w"))
      }),

    // -- TIMESTAMP AS-OF + SNAPSHOT EXPORT (r11): `snapshotAsOf`
    //    resolves the latest snapshot at or before an instant (Delta
    //    TIMESTAMP AS OF at snapshot granularity), `export`
    //    materializes a pinned state as an independent lake. Three
    //    lanes vs one relational oracle: the as-of read serves the v1
    //    state, the exported v0 lake serves the original, the live lake
    //    the twice-deleted one — a wrong resolution, a missed trash
    //    file, or an export touched by the source's later life all
    //    hash-mismatch.
    QueryDef("q158_snapshot_asof_export", Some("""
      WITH f AS (SELECT c_custkey AS id,
                        CAST(floor(c_acctbal * 100) AS BIGINT) AS cents,
                        c_custkey % 2 AS w
                 FROM customer),
           s1 AS (SELECT * FROM f WHERE id % 131 <> 0),
           lv AS (SELECT * FROM s1 WHERE id % 67 <> 0),
           g0 AS (SELECT 'v0_export' AS phase, CAST(w AS BIGINT) AS w,
                         CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(cents) AS BIGINT) AS sum_cents
                  FROM f GROUP BY w),
           g1 AS (SELECT 'v1_asof' AS phase, CAST(w AS BIGINT) AS w,
                         CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(cents) AS BIGINT) AS sum_cents
                  FROM s1 GROUP BY w),
           g2 AS (SELECT 'live' AS phase, CAST(w AS BIGINT) AS w,
                         CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(cents) AS BIGINT) AS sum_cents
                  FROM lv GROUP BY w)
      SELECT * FROM g0 UNION ALL SELECT * FROM g1 UNION ALL
      SELECT * FROM g2 ORDER BY phase, w"""),
      (s, dir) => {
        val base0 = java.nio.file.Files
          .createTempDirectory("graft-asof-gate").toString
        val root = s"$base0/t"
        val base = T(s, dir, "customer").select(
          col("c_custkey").as("id"),
          (col("c_custkey") % 64).cast("long").as("a"),
          floor(col("c_acctbal") * 100).cast("long").as("cents"))
        for (w <- 0 to 1)
          graft.sinks.Sinks.zorderedWrite(base.filter(col("id") % 2 === w),
            "a", "cents", s"$root/win=$w", numFiles = 4, bits = 6,
            bloomCols = Seq("id"))
        graft.sources.Snapshots.snapshot(s, root, "v0")
        graft.sinks.LakeDelete.deleteFromLake(s, root, col("id") % 131 === 0)
        graft.sources.Snapshots.snapshot(s, root, "v1")
        graft.sinks.LakeDelete.deleteFromLake(s, root, col("id") % 67 === 0)
        val c1 = graft.sources.Snapshots.listSnapshotsDetailed(s, root)
          .find(_._1 == "v1").get._2
        graft.sources.Snapshots.export(s, root, "v0", s"$base0/exp")
        def aggOf(df: org.apache.spark.sql.DataFrame, phase: String) = df
          .groupBy(col("win").cast("long").as("w"))
          .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
          .withColumn("phase", lit(phase))
          .select("phase", "w", "n", "sum_cents")
        aggOf(graft.sources.ZLake.read(s, s"$base0/exp"), "v0_export")
          .unionByName(aggOf(
            graft.sources.Snapshots.readSnapshotAsOf(s, root, c1),
            "v1_asof"))
          .unionByName(aggOf(graft.sources.ZLake.read(s, root), "live"))
          .orderBy(col("phase"), col("w"))
      }),

    // -- SNAPSHOT RESTORE (r11, Snapshots.restore — Delta's RESTORE
    //    TABLE verb): pin v1, damage the lake three ways (a CoW delete
    //    rewriting boundary files, a journaled append adding new files, a
    //    MoR delete growing a deletion-vector store), then roll back IN
    //    PLACE. The restored live read must equal the original dataset
    //    exactly, and the row-level change feed v1 → live must be EMPTY
    //    (zero inserts, zero deletes — file identities may differ where
    //    trash copies came back, but not one row). A leaked append row, a
    //    lost trash file, or a surviving deletion vector breaks a lane.
    QueryDef("q179_snapshot_restore", Some("""
      WITH f AS (SELECT c_custkey AS id,
                        CAST(floor(c_acctbal * 100) AS BIGINT) AS cents,
                        c_custkey % 2 AS w
                 FROM customer),
           g AS (SELECT 'restored' AS phase, CAST(w AS BIGINT) AS w,
                        CAST(count(*) AS BIGINT) AS n,
                        CAST(sum(cents) AS BIGINT) AS sum_cents
                 FROM f GROUP BY w)
      SELECT * FROM g
      UNION ALL
      SELECT 'row_changes', CAST(-1 AS BIGINT), CAST(0 AS BIGINT),
             CAST(0 AS BIGINT)
      ORDER BY phase, w"""),
      (s, dir) => {
        import graft.sources.Snapshots
        val root = java.nio.file.Files
          .createTempDirectory("graft-restore-gate").toString + "/t"
        val base = T(s, dir, "customer").select(
          col("c_custkey").as("id"),
          (col("c_custkey") % 64).cast("long").as("a"),
          floor(col("c_acctbal") * 100).cast("long").as("cents"))
        for (w <- 0 to 1)
          graft.sinks.Sinks.zorderedWrite(base.filter(col("id") % 2 === w),
            "a", "cents", s"$root/win=$w", numFiles = 4, bits = 6,
            bloomCols = Seq("id"))
        Snapshots.snapshot(s, root, "v1")
        // damage 1: copy-on-write delete (drops + rewrites boundary files)
        graft.sinks.LakeDelete.deleteFromLake(s, root, col("id") % 131 === 0)
        // damage 2: journaled append (new files the restore must drop)
        graft.sinks.LakeDelete.appendLake(s, root,
          base.limit(500).withColumn("id", col("id") + 900000)
            .withColumn("win", col("id") % 2))
        // damage 3: merge-on-read delete (a DV store to roll away)
        graft.sinks.DeletionVectors.deleteMoR(s, root,
          col("id") % 211 === 0)
        Snapshots.restore(s, root, "v1")
        val restored = graft.sources.ZLake.read(s, root)
          .groupBy(col("win").cast("long").as("w"))
          .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
          .withColumn("phase", lit("restored"))
          .select("phase", "w", "n", "sum_cents")
        val changes = Snapshots.diff(s, root, "v1", None, rowLevel = true)
          .agg(count(lit(1)).as("n"))
          .select(lit("row_changes").as("phase"), lit(-1L).as("w"),
            col("n"), lit(0L).as("sum_cents"))
        restored.unionByName(changes).orderBy(col("phase"), col("w"))
      }),

    // -- GROUP SNAPSHOT (r11, Snapshots.snapshotTables): two lakes pinned
    //    CONSISTENTLY under one tag (all writer locks held across the
    //    group), then both mutated — each snapshot must serve its own
    //    pre-mutation state while the live reads move on. Four lanes vs
    //    one relational oracle; a pin leaking a mutation, or the group
    //    tag drifting between tables, breaks a lane.
    QueryDef("q188_group_snapshot", Some("""
      WITH f AS (SELECT c_custkey AS id,
                        CAST(floor(c_acctbal * 100) AS BIGINT) AS cents
                 FROM customer),
           g AS (SELECT o_orderkey AS id,
                        CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
                 FROM orders)
      SELECT 'snap_a' AS src, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS sum_cents FROM f
      UNION ALL
      SELECT 'snap_b', CAST(count(*) AS BIGINT),
             CAST(sum(cents) AS BIGINT) FROM g
      UNION ALL
      SELECT 'live_a', CAST(count(*) AS BIGINT),
             CAST(sum(cents) AS BIGINT) FROM f WHERE id % 131 <> 0
      UNION ALL
      SELECT 'live_b', CAST(count(*) AS BIGINT),
             CAST(sum(cents) AS BIGINT) FROM g WHERE id % 97 <> 0
      ORDER BY src"""),
      (s, dir) => {
        import graft.sources.Snapshots
        val base = java.nio.file.Files
          .createTempDirectory("graft-gsnap-gate").toString
        val (ra, rb) = (s"$base/a/t", s"$base/b/t")
        graft.sinks.Sinks.zorderedWrite(
          T(s, dir, "customer").select(col("c_custkey").as("id"),
            (col("c_custkey") % 64).cast("long").as("a"),
            floor(col("c_acctbal") * 100).cast("long").as("cents")),
          "a", "cents", ra, numFiles = 4, bits = 6)
        graft.sinks.Sinks.zorderedWrite(
          T(s, dir, "orders").select(col("o_orderkey").as("id"),
            (col("o_orderkey") % 64).cast("long").as("a"),
            floor(col("o_totalprice") * 100).cast("long").as("cents")),
          "a", "cents", rb, numFiles = 4, bits = 6)
        Snapshots.snapshotTables(s, Seq(ra, rb), "g")
        graft.sinks.LakeDelete.deleteFromLake(s, ra, col("id") % 131 === 0)
        graft.sinks.LakeDelete.deleteFromLake(s, rb, col("id") % 97 === 0)
        def lane(df: org.apache.spark.sql.DataFrame, src: String) = df
          .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
          .select(lit(src).as("src"), col("n"), col("sum_cents"))
        lane(Snapshots.readSnapshot(s, ra, "g"), "snap_a")
          .unionByName(lane(Snapshots.readSnapshot(s, rb, "g"), "snap_b"))
          .unionByName(lane(graft.sources.ZLake.read(s, ra), "live_a"))
          .unionByName(lane(graft.sources.ZLake.read(s, rb), "live_b"))
          .orderBy(col("src"))
      }),

    // -- GROUP RESTORE (r11, Snapshots.restoreTables): both lakes pinned
    //    under one tag, both damaged (CoW delete + append), then rolled
    //    back AS A GROUP under held locks — live reads must equal the
    //    originals on both tables and the row-level change feeds must be
    //    EMPTY. The oracle is the raw relational state; a table the group
    //    missed, a leaked append row, or a lost trash file breaks a lane.
    QueryDef("q189_group_restore", Some("""
      WITH f AS (SELECT c_custkey AS id,
                        CAST(floor(c_acctbal * 100) AS BIGINT) AS cents
                 FROM customer),
           g AS (SELECT o_orderkey AS id,
                        CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
                 FROM orders)
      SELECT 'a' AS src, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS sum_cents FROM f
      UNION ALL
      SELECT 'b', CAST(count(*) AS BIGINT), CAST(sum(cents) AS BIGINT)
      FROM g
      UNION ALL
      SELECT 'changes', CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      ORDER BY src"""),
      (s, dir) => {
        import graft.sources.Snapshots
        val base = java.nio.file.Files
          .createTempDirectory("graft-grestore-gate").toString
        val (ra, rb) = (s"$base/a/t", s"$base/b/t")
        def mk(t: String, id: String, price: org.apache.spark.sql.Column,
               root: String): Unit =
          graft.sinks.Sinks.zorderedWrite(
            T(s, dir, t).select(col(id).as("id"),
              (col(id) % 64).cast("long").as("a"),
              floor(price * 100).cast("long").as("cents")),
            "a", "cents", root, numFiles = 4, bits = 6)
        mk("customer", "c_custkey", col("c_acctbal"), ra)
        mk("orders", "o_orderkey", col("o_totalprice"), rb)
        Snapshots.snapshotTables(s, Seq(ra, rb), "g")
        graft.sinks.LakeDelete.deleteFromLake(s, ra, col("id") % 131 === 0)
        graft.sinks.LakeDelete.appendLake(s, rb,
          s.range(300).select((col("id") + 900000).as("id"),
            (col("id") % 64).as("a"), col("id").as("cents")))
        Snapshots.restoreTables(s, Seq(ra, rb), "g")
        def lane(df: org.apache.spark.sql.DataFrame, src: String) = df
          .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
          .select(lit(src).as("src"), col("n"), col("sum_cents"))
        val changes = Snapshots.diff(s, ra, "g", None)
          .unionByName(Snapshots.diff(s, rb, "g", None))
          .agg(count(lit(1)).as("n"))
          .select(lit("changes").as("src"), col("n"),
            lit(0L).as("sum_cents"))
        lane(graft.sources.ZLake.read(s, ra), "a")
          .unionByName(lane(graft.sources.ZLake.read(s, rb), "b"))
          .unionByName(changes)
          .orderBy(col("src"))
      }),

    // -- CONDITIONED MERGE (r11, LakeDelete.mergeLake via ANSI SQL): the
    //    CDC spelling the exact keyed-upsert shape can't express —
    //    `WHEN MATCHED AND c THEN UPDATE SET <subset>` (values read BOTH
    //    sides), `WHEN MATCHED AND c THEN DELETE`, conditional
    //    `INSERT *` — in ONE journaled commit. The oracle replays the
    //    clause algebra relationally in DuckDB: a row updated by the
    //    wrong clause, a delete that also reinserted, an untouched match
    //    that got rewritten, or a lost insert all hash-mismatch.
    QueryDef("q155_conditioned_merge", Some("""
      WITH f AS (SELECT c_custkey AS id, c_custkey % 64 AS a,
                        CAST(floor(c_acctbal * 100) AS BIGINT) AS cents,
                        c_custkey % 2 AS w
                 FROM customer),
           src AS (SELECT id, id % 3 AS flag, id % 100 AS bump
                   FROM f WHERE id % 7 = 0
                   UNION ALL
                   SELECT id + 800000, 0, 0 FROM f WHERE id % 211 = 0),
           upd AS (SELECT f.id, f.a, f.cents + s.bump AS cents, f.w
                   FROM f JOIN src s USING (id) WHERE s.flag = 0),
           del AS (SELECT f.id FROM f JOIN src s USING (id)
                   WHERE s.flag = 1),
           keep AS (SELECT * FROM f
                    WHERE id NOT IN (SELECT id FROM upd)
                      AND id NOT IN (SELECT id FROM del)),
           ins AS (SELECT s.id, s.id % 64 AS a, CAST(42 AS BIGINT) AS cents,
                          s.id % 2 AS w
                   FROM src s LEFT JOIN f ON s.id = f.id
                   WHERE f.id IS NULL),
           m AS (SELECT * FROM keep UNION ALL SELECT * FROM upd
                 UNION ALL SELECT * FROM ins)
      SELECT CAST(w AS BIGINT) AS w, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS sum_cents,
             CAST(sum(id) AS BIGINT) AS sum_id
      FROM m GROUP BY w ORDER BY w"""),
      (s, dir) => {
        val root = java.nio.file.Files
          .createTempDirectory("graft-cmerge-gate").toString + "/t"
        val base = T(s, dir, "customer").select(
          col("c_custkey").as("id"),
          (col("c_custkey") % 64).cast("long").as("a"),
          floor(col("c_acctbal") * 100).cast("long").as("cents"))
        for (w <- 0 to 1)
          graft.sinks.Sinks.zorderedWrite(base.filter(col("id") % 2 === w),
            "a", "cents", s"$root/win=$w", numFiles = 4, bits = 6,
            bloomCols = Seq("id"))
        s.sql("DROP VIEW IF EXISTS q155_lake")
        s.sql(s"CREATE TEMPORARY VIEW q155_lake USING zlake " +
          s"OPTIONS (path '$root')")
        base.filter(col("id") % 7 === 0)
          .select(col("id"), col("a"), col("cents"),
            (col("id") % 2).cast("string").as("win"),
            (col("id") % 3).as("flag"), (col("id") % 100).as("bump"))
          .unionByName(base.filter(col("id") % 211 === 0)
            .select((col("id") + 800000).as("id"),
              ((col("id") + 800000) % 64).as("a"), lit(42L).as("cents"),
              (col("id") % 2).cast("string").as("win"),
              lit(0L).as("flag"), lit(0L).as("bump")))
          .createOrReplaceTempView("q155_src")
        s.sql("""MERGE INTO q155_lake t USING q155_src s ON t.id = s.id
                 WHEN MATCHED AND s.flag = 0 THEN
                   UPDATE SET cents = t.cents + s.bump
                 WHEN MATCHED AND s.flag = 1 THEN DELETE
                 WHEN NOT MATCHED THEN INSERT *""")
        s.sql("REFRESH TABLE q155_lake")
        s.sql("""SELECT CAST(win AS BIGINT) AS w,
                        CAST(count(*) AS BIGINT) AS n,
                        CAST(sum(cents) AS BIGINT) AS sum_cents,
                        CAST(sum(id) AS BIGINT) AS sum_id
                 FROM q155_lake GROUP BY win ORDER BY w""")
      }),

    // -- EXACT-SUBSTRING dedup (Lee et al. 2022, arXiv:2107.06499): every
    //    6-token window appearing more than once in the corpus keeps only
    //    its first (doc, pos) occurrence; tokens covered by a non-first
    //    occurrence are cut and documents reassemble from the survivors.
    //    The oracle replays the same window/coverage algebra relationally
    //    (windows via LATERAL unnest, first-occurrence via row_number,
    //    coverage via a BETWEEN join); the engine's lane is text-free
    //    (dual xxhash64 keys) with one token-bearing exchange — see
    //    Dedup.substringDedup.
    QueryDef("q159_substring_dedup", Some("""
      WITH d AS (SELECT doc_id,
                        list_filter(string_split_regex(text, '\s+'),
                                    t -> len(t) > 0) AS ts
                 FROM documents),
      occ AS (SELECT doc_id, i - 1 AS pos,
                     array_to_string(ts[i:i+5], ' ') AS g
              FROM d, LATERAL (SELECT unnest(range(1, len(ts) - 4)) AS i)),
      ranked AS (SELECT doc_id, pos,
                        row_number() OVER (PARTITION BY g
                                           ORDER BY doc_id, pos) AS rn
                 FROM occ),
      rem AS (SELECT doc_id, pos FROM ranked WHERE rn > 1),
      tok AS (SELECT doc_id, i - 1 AS tpos, ts[i] AS t
              FROM d, LATERAL (SELECT unnest(range(1, len(ts) + 1)) AS i)),
      cut AS (SELECT DISTINCT k.doc_id, k.tpos
              FROM tok k JOIN rem r ON k.doc_id = r.doc_id
                                   AND k.tpos BETWEEN r.pos AND r.pos + 5),
      keptagg AS (SELECT k.doc_id, count(*) AS nk,
                         string_agg(k.t, ' ' ORDER BY k.tpos) AS txt
                  FROM tok k LEFT JOIN cut c ON k.doc_id = c.doc_id
                                            AND k.tpos = c.tpos
                  WHERE c.doc_id IS NULL GROUP BY k.doc_id)
      SELECT d.doc_id, CAST(len(d.ts) AS BIGINT) AS n_tokens,
             CAST(len(d.ts) - coalesce(a.nk, 0) AS BIGINT) AS n_removed,
             coalesce(a.txt, '') AS kept_text
      FROM d LEFT JOIN keptagg a USING (doc_id)
      ORDER BY doc_id"""),
      (s, dir) =>
        graft.operators.Dedup.substringDedup(
          T(s, dir, "documents"), col("doc_id"), col("text"), 6)
          .orderBy("doc_id")),

    // -- INCREMENTAL substring dedup (Dedup.incrementalSubstringDedup):
    //    the ingest-time lane — docs < 250 persist a 16-byte-per-gram
    //    lake, the "new batch" (docs ≥ 250) dedups against it via one
    //    broadcast-pruned membership scan plus the batch-internal rule.
    //    The oracle is the FULL-union batch algebra restricted to the
    //    batch docs — pinning that incremental ≡ batch (the corpus text
    //    is never re-read, yet the answer is the one a full re-run gives).
    QueryDef("q164_incremental_substring_dedup", Some("""
      WITH d AS (SELECT doc_id,
                        list_filter(string_split_regex(text, '\s+'),
                                    t -> len(t) > 0) AS ts
                 FROM documents),
      occ AS (SELECT doc_id, i - 1 AS pos,
                     array_to_string(ts[i:i+5], ' ') AS g
              FROM d, LATERAL (SELECT unnest(range(1, len(ts) - 4)) AS i)),
      ranked AS (SELECT doc_id, pos,
                        row_number() OVER (PARTITION BY g
                                           ORDER BY doc_id, pos) AS rn
                 FROM occ),
      rem AS (SELECT doc_id, pos FROM ranked WHERE rn > 1),
      tok AS (SELECT doc_id, i - 1 AS tpos, ts[i] AS t
              FROM d, LATERAL (SELECT unnest(range(1, len(ts) + 1)) AS i)),
      cut AS (SELECT DISTINCT k.doc_id, k.tpos
              FROM tok k JOIN rem r ON k.doc_id = r.doc_id
                                   AND k.tpos BETWEEN r.pos AND r.pos + 5),
      keptagg AS (SELECT k.doc_id, count(*) AS nk,
                         string_agg(k.t, ' ' ORDER BY k.tpos) AS txt
                  FROM tok k LEFT JOIN cut c ON k.doc_id = c.doc_id
                                            AND k.tpos = c.tpos
                  WHERE c.doc_id IS NULL GROUP BY k.doc_id)
      SELECT d.doc_id, CAST(len(d.ts) AS BIGINT) AS n_tokens,
             CAST(len(d.ts) - coalesce(a.nk, 0) AS BIGINT) AS n_removed,
             coalesce(a.txt, '') AS kept_text
      FROM d LEFT JOIN keptagg a USING (doc_id)
      WHERE d.doc_id >= 250
      ORDER BY d.doc_id"""),
      (s, dir) => {
        val docs = T(s, dir, "documents")
        val lake = java.nio.file.Files
          .createTempDirectory("graft-gram-lake").toString + "/grams"
        graft.operators.Dedup.writeGramLake(
          docs.filter(col("doc_id") < 250), col("doc_id"), col("text"),
          6, lake)
        graft.operators.Dedup.incrementalSubstringDedup(
          docs.filter(col("doc_id") >= 250), col("doc_id"), col("text"),
          6, lake)
          .orderBy("doc_id")
      }),

    // -- DETERMINISTIC training-order shuffle (TrainPrep.trainingOrder):
    //    the seeded global permutation a training run streams its
    //    (doc, epoch) rows in — md5 order key, hash60-sharded, ranked
    //    within shard. The oracle replays key → shard → rank exactly;
    //    rand() could never be gated like this, which is the point:
    //    resumes and retries see the identical order.
    QueryDef("q161_training_order", Some("""
      WITH de AS (SELECT doc_id, e AS epoch
                  FROM documents, LATERAL (SELECT unnest([0, 1]) AS e)),
      k AS (SELECT doc_id, epoch,
                   md5('7:' || CAST(epoch AS VARCHAR) || ':' ||
                       CAST(doc_id AS VARCHAR)) AS okey
            FROM de),
      s AS (SELECT doc_id, epoch, okey,
                   CAST(('0x' || substring(md5(okey), 1, 15)) AS BIGINT) % 8
                     AS shard
            FROM k),
      p AS (SELECT shard,
                   row_number() OVER (PARTITION BY shard
                                      ORDER BY okey, doc_id, epoch) - 1
                     AS pos,
                   doc_id, epoch
            FROM s)
      SELECT CAST(shard AS BIGINT) AS shard, CAST(pos AS BIGINT) AS pos,
             doc_id, CAST(epoch AS BIGINT) AS epoch
      FROM p ORDER BY shard, pos"""),
      (s, dir) => {
        val de = T(s, dir, "documents")
          .select(col("doc_id"), explode(array(lit(0L), lit(1L))).as("epoch"))
        graft.operators.TrainPrep.trainingOrder(de, col("doc_id"),
            col("epoch"), seed = 7L, numShards = 8)
          .orderBy(col("shard"), col("pos"))
      }),

    // -- DIGIT-HISTOGRAM quantiles (KernelAggs.DigitHistAgg): DDSketch's
    //    log-bucket quantiles on an EXACT decimal-digit grid (≤10%
    //    relative bucket width at 2 digits) — deterministic and
    //    re-aggregatable, unlike percentile_approx. The Spark side runs
    //    the two-level lane on purpose (per-(flag,status) sketches →
    //    digit_hist_merge rollup → quantile), proving merged == direct;
    //    the oracle computes the direct histogram walk relationally.
    QueryDef("q162_digit_quantiles", Some("""
      WITH v AS (SELECT l_returnflag AS grp,
                        CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                             AS BIGINT) AS c
                 FROM lineitem),
      b AS (SELECT grp,
                   CAST(CASE WHEN length(CAST(c AS VARCHAR)) <= 2
                             THEN CAST(c AS VARCHAR)
                        ELSE rpad(substring(CAST(c AS VARCHAR), 1, 2),
                                  CAST(length(CAST(c AS VARCHAR)) AS INTEGER),
                                  '0') END
                        AS BIGINT) AS lb
            FROM v),
      h AS (SELECT grp, lb, count(*) AS n FROM b GROUP BY grp, lb),
      t AS (SELECT grp, sum(n) AS tot FROM h GROUP BY grp),
      cw AS (SELECT h.grp, h.lb,
                    sum(h.n) OVER (PARTITION BY h.grp ORDER BY h.lb) AS cn,
                    t.tot
             FROM h JOIN t ON h.grp = t.grp)
      SELECT grp,
             CAST(min(CASE WHEN cn >= greatest(1,
               (500000 * tot + 999999) // 1000000) THEN lb END) AS BIGINT) AS p50,
             CAST(min(CASE WHEN cn >= greatest(1,
               (950000 * tot + 999999) // 1000000) THEN lb END) AS BIGINT) AS p95,
             CAST(min(CASE WHEN cn >= greatest(1,
               (990000 * tot + 999999) // 1000000) THEN lb END) AS BIGINT) AS p99,
             CAST(max(tot) AS BIGINT) AS n
      FROM cw GROUP BY grp ORDER BY grp"""),
      (s, dir) => {
        import graft.functions.{KernelAggs => KA, KernelExprs => KE}
        val li = T(s, dir, "lineitem").select(
          col("l_returnflag").as("grp"), col("l_linestatus").as("sub"),
          (col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("long").as("cents"))
        li.groupBy(col("grp"), col("sub"))
          .agg(KA.digit_hist(col("cents"), 2).as("h"))
          .groupBy(col("grp"))
          .agg(KA.digit_hist_merge(col("h")).as("h"))
          .select(col("grp"),
            KE.digit_quantile(col("h"), 0.50).as("p50"),
            KE.digit_quantile(col("h"), 0.95).as("p95"),
            KE.digit_quantile(col("h"), 0.99).as("p99"),
            aggregate(col("h"), lit(0L), (acc, x) => acc + x("n")).as("n"))
          .orderBy(col("grp"))
      })
  )
}
