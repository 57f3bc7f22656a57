package graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.{ColumnBridge, FunctionBridge}
import graft.functions.{Functions => F, KernelExprs, TextFunctions => TF}

/** SQL surface of the engine: every graft function as a `spark.sql`-callable
  * function, via the standard `SparkSessionExtensions` hook
  * (`spark.sql.extensions=graft.GraftExtensions`) or
  * [[GraftExtensions.register]] on a live session.
  *
  * Native kernel expressions ([[KernelExprs]]) are injected directly;
  * column-composition functions are wrapped through the Column bridge, so
  * the SQL text `graft_ip_to_long(ip)` resolves to the same Catalyst tree
  * as the Scala API `Functions.ip_to_long(col("ip"))`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name), GraftExtensions.info(name), builder))
    }
    // whole-operator extension: BETWEEN-join → broadcast interval-index probe
    ext.injectPlannerStrategy(sp => new graft.plans.IntervalJoinStrategy(sp))
    // SQL LATERAL ... ORDER BY ts DESC LIMIT 1 → AsOfJoin union+window plan
    // (before analyzer decorrelation turns it into a BroadcastNestedLoopJoin)
    ext.injectPostHocResolutionRule(sp => graft.plans.AsOfLateralRewrite(sp))
    // count/min/max over a manifest-covered zlake → LocalRelation (no scan)
    ext.injectOptimizerRule(sp => graft.plans.ManifestAggs(sp))
    // ORDER BY col LIMIT k over a zlake → scan only files that can hold
    // a top-k row (zone-map top-k: envelope accumulation bound)
    ext.injectOptimizerRule(sp => graft.plans.TopKFilePrune(sp))
    // GROUP BY over a registered base lake → re-aggregate its maintained
    // MaterializedAgg view (warehouse-style materialized-view rewriting)
    ext.injectOptimizerRule(sp => graft.plans.MvRewrite(sp))
    // ORDER BY cosine(vec, <query>) DESC LIMIT k over a corpus with a
    // registered IVF index → cell-pruned index probe (pgvector-planner
    // pattern; approximate by declared opt-in, deterministic in result)
    ext.injectOptimizerRule(sp => graft.plans.AnnRewrite(sp))
    // GROUP BY doc + maxsim_q6(vec, <bag>) ORDER BY score DESC LIMIT k
    // over a token corpus with a registered IVF index → the two-stage
    // probe + candidate rerank (declarative multi-vector search)
    ext.injectOptimizerRule(sp => graft.plans.MaxSimRewrite(sp))
    // ANSI DELETE FROM / MERGE INTO over a live zlake target → the
    // journaled copy-on-write mutation path (Delta-style v1 interception)
    ext.injectPostHocResolutionRule(sp => graft.plans.GraftDml(sp))
    // CALL graft.snapshot/vacuum/delete/upsert(...) — maintenance verbs
    // with no ANSI spelling; everything else delegates verbatim
    ext.injectParser((session, parser) =>
      new graft.plans.GraftSqlParser(session, parser))
  }
}

object GraftExtensions {

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo("graft.GraftExtensions", name)

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def doubleArg(e: Expression, what: String): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: java.math.BigDecimal, _) => v.doubleValue
    case Literal(d: org.apache.spark.sql.types.Decimal, _) => d.toDouble
    case Literal(v: Int, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  /** Wrap a Column→Column composition as an expression builder (eager node
    * conversion — a lazy ColumnNodeExpression is Unevaluable here). */
  private def c1(f: Column => Column)(args: Seq[Expression]): Expression =
    ColumnBridge.eagerExpression(f(ColumnBridge.column(args.head)))
  private def c2(f: (Column, Column) => Column)(args: Seq[Expression]): Expression =
    ColumnBridge.eagerExpression(
      f(ColumnBridge.column(args(0)), ColumnBridge.column(args(1))))

  /** name → builder for every exposed function. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    // native kernel expressions
    "graft_hash60" -> ((a: Seq[Expression]) => KernelExprs.Hash60(a.head)),
    "graft_minhash" -> ((a: Seq[Expression]) =>
      KernelExprs.MinHashSig(a(0), intArg(a(1), "numHashes"))),
    "graft_simhash60" -> ((a: Seq[Expression]) => KernelExprs.SimHash60(a.head)),
    "graft_dot_long" -> ((a: Seq[Expression]) => KernelExprs.DotLong(a(0), a(1))),
    "graft_cosine_q6" -> ((a: Seq[Expression]) => KernelExprs.CosineQ6(a(0), a(1))),
    "graft_l2sq_long" -> ((a: Seq[Expression]) => KernelExprs.L2sqLong(a(0), a(1))),
    "graft_best_window" -> ((a: Seq[Expression]) =>
      KernelExprs.BestWindow(a(0), a(1), intArg(a(2), "w"))),
    "graft_sq8_encode" -> ((a: Seq[Expression]) =>
      KernelExprs.Sq8Encode(a(0), a(1), a(2))),
    "graft_sq8_recon" -> ((a: Seq[Expression]) =>
      KernelExprs.Sq8Recon(a(0), a(1), a(2))),
    "graft_srp_bucket" -> ((a: Seq[Expression]) =>
      KernelExprs.SrpBucket(a(0), intArg(a(1), "planes"))),
    // aggregates: the analyzer wraps a bare AggregateFunction automatically
    "graft_vec_mean" -> ((a: Seq[Expression]) =>
      graft.functions.KernelAggs.VecMeanAgg(a.head)),
    "graft_maxsim_q6" -> ((a: Seq[Expression]) =>
      graft.functions.KernelAggs.MaxSimQ6Agg(a(0), a(1))),
    "graft_cms_sketch" -> ((a: Seq[Expression]) =>
      graft.functions.KernelAggs.CmsAgg(a(0),
        intArg(a(1), "depth"), intArg(a(2), "width"))),
    "graft_hll_registers" -> ((a: Seq[Expression]) =>
      graft.functions.KernelAggs.HllAgg(a(0), intArg(a(1), "m"))),
    "graft_sketch_merge_max" -> ((a: Seq[Expression]) =>
      graft.functions.KernelAggs.SketchMergeAgg(a.head, "max")),
    "graft_sketch_merge_sum" -> ((a: Seq[Expression]) =>
      graft.functions.KernelAggs.SketchMergeAgg(a.head, "sum")),
    "graft_sketch_merge_or" -> ((a: Seq[Expression]) =>
      graft.functions.KernelAggs.SketchMergeAgg(a.head, "or")),
    "graft_bottomk_sample" -> ((a: Seq[Expression]) =>
      graft.functions.KernelAggs.BottomKAgg(a(0), a(1), intArg(a(2), "k"))),
    "graft_kmv_sketch" -> ((a: Seq[Expression]) =>
      graft.functions.KernelAggs.KmvAgg(a(0), intArg(a(1), "k"))),
    "graft_digit_hist" -> ((a: Seq[Expression]) =>
      graft.functions.KernelAggs.DigitHistAgg(a(0), intArg(a(1), "digits"))),
    "graft_digit_hist_merge" -> ((a: Seq[Expression]) =>
      graft.functions.KernelAggs.DigitHistMergeAgg(a.head)),
    "graft_digit_quantile" -> ((a: Seq[Expression]) =>
      KernelExprs.DigitQuantile(a(0), doubleArg(a(1), "q"))),
    "graft_digit_bucket" -> ((a: Seq[Expression]) =>
      KernelExprs.DigitBucket(a(0), intArg(a(1), "digits"))),
    "graft_zorder2" -> ((a: Seq[Expression]) =>
      KernelExprs.ZOrder2(a(0), a(1), intArg(a(2), "bits"))),
    "graft_zorder3" -> ((a: Seq[Expression]) =>
      KernelExprs.ZOrder3(a(0), a(1), a(2), intArg(a(3), "bits"))),
    "graft_hilbert2" -> ((a: Seq[Expression]) =>
      KernelExprs.Hilbert2(a(0), a(1), intArg(a(2), "bits"))),
    "graft_bloom_sketch" -> ((a: Seq[Expression]) =>
      graft.functions.KernelAggs.BloomAgg(a(0),
        intArg(a(1), "numBits"), intArg(a(2), "numHashes"))),
    "graft_bloom_contains" -> ((a: Seq[Expression]) =>
      KernelExprs.BloomContains(a(0), a(1), intArg(a(2), "numHashes"))),
    // column compositions
    "graft_ip_to_long" -> c1(F.ip_to_long) _,
    "graft_long_to_ip" -> c1(F.long_to_ip) _,
    "graft_ip_in_cidr" -> c2(F.ip_in_cidr) _,
    "graft_authority_domain" -> c1(F.authority_domain) _,
    "graft_strip_protocol" -> c1(F.strip_protocol) _,
    "graft_tokens" -> c1(TF.tokens) _,
    "graft_token_count" -> c1(TF.token_count) _,
    "graft_lang_id" -> c1(TF.lang_id) _,
    "graft_quality_score" -> c1(TF.quality_score) _,
    "graft_normalize_text" -> c1(TF.normalize_text) _,
    "graft_gopher_rules" -> c1(TF.gopher_rules) _,
    "graft_fingerprint" -> c1(TF.fingerprint) _,
    "graft_word_shingles" -> ((a: Seq[Expression]) =>
      ColumnBridge.eagerExpression(TF.word_shingles(
        ColumnBridge.column(a(0)), intArg(a(1), "n")))),
    "graft_qround" -> ((a: Seq[Expression]) =>
      ColumnBridge.eagerExpression(F.qround(
        ColumnBridge.column(a(0)), intArg(a(1), "decimals")))),
    "graft_vec_quantize" -> ((a: Seq[Expression]) =>
      ColumnBridge.eagerExpression(F.vec_quantize(
        ColumnBridge.column(a(0)), intArg(a(1), "scale"))))
  )

  /** Register all functions on a live session (idempotent overwrite). */
  def register(spark: SparkSession): Unit = {
    all.foreach { case (name, builder) =>
      FunctionBridge.register(spark, name, info(name), builder)
    }
    if (!spark.experimental.extraStrategies
        .exists(_.isInstanceOf[graft.plans.IntervalJoinStrategy]))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ new graft.plans.IntervalJoinStrategy(spark)
  }
}
