package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import graft.operators.{IntervalIndex, TopK}

/** Batch 3: the remaining SURVEY §2 report shapes (trend agg A6, rollups
  * A8-A11, geo enrichment J5/F7, per-user top-N arrays A14/T6, tag sets A16)
  * plus a sessionization showcase, all oracle-paired.
  */
object QueriesDns {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  val all: Vector[QueryDef] = Vector(

    // -- A6: multi-dim trend aggregate with HAVING ---------------------------
    QueryDef("q39_trend_agg_having", Some("""
      SELECT p.p_brand, p.p_type, l.l_returnflag,
             CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS BIGINT) AS resolver,
             CAST(sum(CASE WHEN l.l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS discounted,
             count(*) AS cnt
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2, 3 HAVING sum(CAST(l.l_quantity AS DECIMAL(18,2))) > 100
      ORDER BY p_brand, p_type, l_returnflag"""),
      (s, dir) => T(s, dir, "lineitem")
        .join(broadcast(T(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("l_returnflag"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("bigint").as("resolver"),
          sum(when(col("l_discount") > 0.05, 1L).otherwise(0L)).as("discounted"),
          count(lit(1)).as("cnt"))
        .filter(col("resolver") > 100)
        .orderBy(col("p_brand"), col("p_type"), col("l_returnflag"))),

    // -- A8: business rollup through a snowflaked dim chain ------------------
    QueryDef("q40_business_rollup", Some("""
      SELECT r.r_name AS region, n.n_name AS nation,
             CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             count(*) AS orders_cnt
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2 ORDER BY region, nation"""),
      (s, dir) => T(s, dir, "orders")
        .join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(T(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(T(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"),
          count(lit(1)).as("orders_cnt"))
        .orderBy(col("region"), col("nation"))),

    // -- A9-A11: single-dimension counts, all + per-client -------------------
    QueryDef("q41_dim_counts", Some("""
      SELECT CAST(0 AS BIGINT) AS client_id, n.n_name AS dim, count(*) AS sample_num
      FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey GROUP BY 2
      UNION ALL
      SELECT s.s_suppkey % 3 + 1 AS client_id, n.n_name AS dim, count(*) AS sample_num
      FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey GROUP BY 1, 2
      ORDER BY client_id, dim"""),
      (s, dir) => {
        val j = T(s, dir, "supplier")
          .join(broadcast(T(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        val allRows = j.groupBy(col("n_name").as("dim"))
          .agg(count(lit(1)).as("sample_num"))
          .select(lit(0L).as("client_id"), col("dim"), col("sample_num"))
        val per = j.withColumn("client_id", col("s_suppkey") % 3 + 1)
          .groupBy(col("client_id"), col("n_name").as("dim"))
          .agg(count(lit(1)).as("sample_num"))
        allRows.unionByName(per).orderBy(col("client_id"), col("dim"))
      }),

    // -- J5/F7/P9: geo enrichment via the broadcast O(log n) interval index --
    // The index is built from DISJOINT intervals derived from nation; the
    // oracle reproduces it as a plain range join (same result, different
    // algorithm — that's the point).
    QueryDef("q42_geo_interval_index", Some("""
      SELECT coalesce(n.n_name, 'unknown') AS province, count(*) AS cnt,
             CAST(sum(CASE WHEN e.event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors
      FROM events e LEFT JOIN nation n
        ON e.user_id BETWEEN n.n_nationkey*5 AND n.n_nationkey*5+4
      GROUP BY 1 ORDER BY province"""),
      (s, dir) => {
        // disjoint intervals [5k, 5k+4] → rule id = n_nationkey
        val rules = T(s, dir, "nation").select("n_nationkey").collect()
          .map(_.getInt(0)).toSeq
          .map(k => (k * 5L, k * 5L + 4L, 0L, k))
        val idx = IntervalIndex.build(rules, lastWins = false)
        val nameDim = T(s, dir, "nation")
          .select(col("n_nationkey").as("rid"), col("n_name"))
        T(s, dir, "events")
          .withColumn("rid", IntervalIndex.lookupColumn(s, idx)(col("user_id")))
          .join(broadcast(nameDim), Seq("rid"), "left")
          .groupBy(coalesce(col("n_name"), lit("unknown")).as("province"))
          .agg(count(lit(1)).as("cnt"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("errors"))
          .orderBy(col("province"))
      }),

    // -- A14/T6: per-user top-N as an ordered array column -------------------
    QueryDef("q43_user_top_domains", Some("""
      WITH c AS (SELECT user_id, event_type, count(*) AS cnt FROM events GROUP BY 1, 2),
      r AS (SELECT *, row_number() OVER (PARTITION BY user_id
                      ORDER BY cnt DESC, event_type) AS rn FROM c)
      SELECT user_id, list(event_type ORDER BY rn) AS top_types
      FROM r WHERE rn <= 3 GROUP BY user_id ORDER BY user_id"""),
      (s, dir) => {
        val c = T(s, dir, "events").groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
        val ranked = TopK.perGroup(c, 3, Seq(col("user_id")),
          Seq(col("cnt").desc, col("event_type").asc))
        // sort_array on (rn, type) structs → deterministic order, then project
        ranked.groupBy(col("user_id"))
          .agg(expr("transform(array_sort(collect_list(struct(rn, event_type))), x -> x.event_type)")
            .as("top_types"))
          .orderBy(col("user_id"))
      }),

    // -- A16: distinct tag set per user from a domain→tags dim ---------------
    QueryDef("q44_user_tags", Some("""
      WITH tags AS (SELECT 'signup' AS event_type, 'growth|funnel' AS tags
                    UNION ALL SELECT 'purchase', 'revenue|funnel'
                    UNION ALL SELECT 'error', 'ops|alert'),
      ud AS (SELECT DISTINCT e.user_id, e.event_type FROM events e)
      SELECT user_id,
             list_sort(list_distinct(flatten(list(string_split(coalesce(t.tags, 'unknown'), '|'))))) AS tag_set
      FROM ud LEFT JOIN tags t USING (event_type)
      GROUP BY user_id ORDER BY user_id"""),
      (s, dir) => {
        import s.implicits._
        val tagDim = Seq(("signup", "growth|funnel"), ("purchase", "revenue|funnel"),
          ("error", "ops|alert")).toDF("event_type", "tags")
        T(s, dir, "events").select(col("user_id"), col("event_type")).distinct()
          .join(broadcast(tagDim), Seq("event_type"), "left")
          .withColumn("tag_arr", split(coalesce(col("tags"), lit("unknown")), "\\|"))
          .groupBy(col("user_id"))
          .agg(array_sort(array_distinct(flatten(collect_list(col("tag_arr"))))).as("tag_set"))
          .orderBy(col("user_id"))
      }),

    // -- beyond-reference: gap-based sessionization (stateful analytics) -----
    QueryDef("q45_sessionize", Some("""
      WITH e AS (SELECT user_id, event_id, epoch_ns(ts)//1000000000 AS es FROM events),
      g AS (SELECT *, CASE WHEN es - lag(es) OVER (PARTITION BY user_id ORDER BY es, event_id)
                                > 1800 OR lag(es) OVER (PARTITION BY user_id ORDER BY es, event_id) IS NULL
                           THEN 1 ELSE 0 END AS new_session
            FROM e),
      s AS (SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY es, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
            FROM g)
      SELECT user_id, session_id, count(*) AS events_in_session,
             CAST(max(es) - min(es) AS BIGINT) AS duration_sec
      FROM s GROUP BY 1, 2 ORDER BY user_id, session_id"""),
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("es"), col("event_id"))
        T(s, dir, "events")
          .select(col("user_id"), col("event_id"), expr("ts div 1000000000").as("es"))
          .withColumn("prev", lag(col("es"), 1).over(w))
          .withColumn("new_session",
            when(col("prev").isNull || col("es") - col("prev") > 1800, 1).otherwise(0))
          .withColumn("session_id",
            sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0))
              .cast("long"))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("events_in_session"),
            (max(col("es")) - min(col("es"))).cast("long").as("duration_sec"))
          .orderBy(col("user_id"), col("session_id"))
      })
  )
}
