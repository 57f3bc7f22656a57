package graft.plans

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, count => fcount, lit, max => fmax, min => fmin, sum => fsum}
import org.apache.spark.sql.graftbridge.PlanBridge

import graft.sinks.MaterializedAgg
import graft.sinks.MaterializedAgg.Spec

/** MATERIALIZED-VIEW QUERY REWRITING: a `GROUP BY` aggregate over a
  * registered base lake is answered from its incrementally-maintained
  * [[MaterializedAgg]] view instead of scanning the base — the classic
  * warehouse optimization (Oracle query rewrite, Calcite's
  * MaterializedViewRule) the lake stack was missing. A 100 TB fact scan
  * becomes a read of a few thousand stored partials, re-aggregated.
  *
  * Scope — EXACTNESS-gated, mirroring [[ManifestAggs]]' philosophy (a
  * rewrite must be bit-identical to the scan it replaces, or not happen):
  *  - The aggregate's child must peel (through Project/Filter/
  *    SubqueryAlias) down to the registered base lake's relation.
  *  - Grouping: attribute references forming a SUBSET of the view's
  *    group columns, covered by a stored grain — the view's own grain in
  *    single-grain mode, or any lattice grouping set that contains every
  *    queried group column (finest cover wins; the gap re-aggregates,
  *    which is sound for every mapped function below).
  *  - Aggregates: `count(*)`/`count(lit)` → `sum(cnt)`; `sum(x)` with x
  *    in `sumCols` → `sum(x_sum)`; `min(x)`/`max(x)` with x in
  *    `minCols`/`maxCols` → `min(x_min)`/`max(x_max)`. No DISTINCT, no
  *    FILTER clauses, nothing else (`avg`, float sums and
  *    `count(distinct)` keep the scan — the view's state cannot
  *    reproduce them exactly).
  *  - Filters: deterministic conjuncts referencing only the queried
  *    group columns — they commute with grouping, so they apply to the
  *    view's stored group values verbatim.
  *
  * FRESHNESS is the registrant's contract, exactly as in every warehouse
  * with manual rewrite enablement: registering a view asserts its
  * maintenance covers the base (e.g. the [[graft.sources.ZLakeTail]] →
  * [[MaterializedAgg.maintain]] standing pipeline); `unregister`/
  * [[MvRewrite.clear]] withdraw it. Type note: the stored partials are
  * Spark's OWN partial-aggregation states (sum-of-longs stays long,
  * min/max keep their type), so the rewritten plan's types — and its
  * overflow behavior — match the two-level aggregation the scan would
  * have run.
  */
object MvRewrite {

  /** `fingerprint` pins the base lake's file-set identity
    * ([[graft.sources.ZLake.stateFingerprint]]) as of the moment the
    * registrant last asserted the view covers the base — [[register]] and
    * [[refresh]] capture it. The rule re-fingerprints the base at rewrite
    * time and BAILS to the scan on any mismatch, so a base append that
    * outran maintenance can never be silently answered from the stale
    * view (r9 verdict #5). */
  final case class Registration(viewRoot: String, spec: Spec,
                                basePath: String, fingerprint: String)

  /** base lake path (normalized) → registration. Process-wide, like the
    * session catalogs the rule consults. */
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Registration]()

  /** Registry key: the FULLY QUALIFIED URI (scheme + authority + path).
    * Keying on the bare path (r9 advice) collided two lakes at the same
    * path on different filesystems/buckets (s3://prod/t vs s3://staging/t)
    * into one entry, so a query over one could be silently answered from
    * the OTHER lake's view. Qualification resolves a scheme-less path
    * against the active session's default FS — the same resolution the
    * scan's own rootPath went through, so lookup and register agree. */
  private[plans] def norm(path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    // canonical spelling from URI COMPONENTS: makeQualified renders a null
    // authority as `file:/p` but an empty one as `file:///p` — same lake,
    // two strings — so the key is rebuilt as scheme://authority/path with
    // null and empty authority unified
    val u = (try p.getFileSystem(conf).makeQualified(p)
             catch { case NonFatal(_) => p }).toUri // unknown scheme: as-is
    val scheme = Option(u.getScheme).map(_ + "://").getOrElse("")
    val auth = Option(u.getAuthority).getOrElse("")
    s"$scheme$auth${u.getPath.stripSuffix("/")}"
  }

  /** Enable rewriting of aggregates over `basePath` onto the view at
    * `viewRoot` (maintained under `spec`). The caller asserts the view's
    * maintenance covers the base table's contents AS OF NOW — the base's
    * current file-set fingerprint is captured, and the rule keeps the
    * scan whenever the base has since changed, until [[refresh]] (called
    * after the next maintenance merge) re-captures it. */
  def register(basePath: String, viewRoot: String, spec: Spec): Unit = {
    registry.put(norm(basePath),
      Registration(viewRoot, spec, basePath, currentFingerprint(basePath)))
    ()
  }

  /** Re-assert freshness after a maintenance merge brought the view up to
    * date with the base's CURRENT contents. No-op for an unregistered
    * base. */
  def refresh(basePath: String): Unit = {
    val k = norm(basePath)
    Option(registry.get(k)).foreach { r =>
      registry.put(k, r.copy(fingerprint = currentFingerprint(basePath)))
    }
  }

  /** "unreadable" when the base's filesystem is unreachable from here (a
    * registration for another cluster's scheme): it never equals a real
    * fingerprint, and the rewrite-time probe of such a base throws into
    * the rule's NonFatal bail — either way the scan is kept. */
  private def currentFingerprint(basePath: String): String =
    try org.apache.spark.sql.SparkSession.getActiveSession
      .map(s => graft.sources.ZLake.stateFingerprint(s, basePath))
      .getOrElse("unreadable")
    catch { case NonFatal(_) => "unreadable" }

  def unregister(basePath: String): Unit = { registry.remove(norm(basePath)); () }
  def clear(): Unit = registry.clear()

  private[graft] def lookup(path: String): Option[Registration] =
    Option(registry.get(norm(path)))

  /** Suppression latch for the view's OWN maintenance: [[graft.sinks
    * .MaterializedAgg.mergeBatch]] computes its per-batch partials over
    * the (possibly registered) base — rewriting THAT aggregate onto the
    * view it is maintaining would merge the view into itself and
    * double-count every group. Maintenance wraps its work in
    * [[suppressed]]; the rule no-ops on that thread for the duration. */
  private val suppress = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }
  private[graft] def isSuppressed: Boolean = suppress.get()
  private[graft] def suppressed[T](body: => T): T = {
    val prev = suppress.get()
    suppress.set(java.lang.Boolean.TRUE)
    try body finally suppress.set(prev)
  }
}

case class MvRewrite(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (MvRewrite.isSuppressed) plan
    else plan.transformDown {
      case agg: Aggregate =>
        try rewrite(agg).getOrElse(agg)
        catch { case NonFatal(_) => agg }
    }

  /** Peel to the base relation; collect filter conjuncts. */
  private def unwrap(p: LogicalPlan)
      : Option[(MvRewrite.Registration, Seq[Expression])] = p match {
    // a STREAMING read of the base (ZLakeTail batches carry
    // isStreaming=true relations) must keep its per-batch aggregate —
    // rewriting it to a batch view read would replace incremental state
    // with view-wide totals every trigger
    case l: LogicalRelation if l.isStreaming => None
    case l: LogicalRelation => l.relation match {
      case h: HadoopFsRelation =>
        h.location.rootPaths.headOption
          .flatMap(r => MvRewrite.lookup(r.toString)).map((_, Nil))
      case _ => None
    }
    case f: Filter => unwrap(f.child).map { case (reg, cs) =>
      (reg, splitConjunctivePredicates(f.condition) ++ cs)
    }
    case pr: Project if pr.projectList.forall(_.isInstanceOf[AttributeReference]) =>
      unwrap(pr.child)
    case s: SubqueryAlias => unwrap(s.child)
    case _ => None
  }

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    val (reg, filters) = unwrap(agg.child).getOrElse(return None)
    val spec = reg.spec

    // FRESHNESS GUARD (r9 verdict #5): the base must still be the exact
    // file set the registrant last asserted coverage for. One recursive
    // listing per candidate rewrite — cheap next to the scan it avoids —
    // and a stale view can never silently answer for a moved-on base.
    if (graft.sources.ZLake.stateFingerprint(spark, reg.basePath)
        != reg.fingerprint) return None
    // merge-on-read deletion vectors change ROWS without changing the
    // file-set fingerprint — a view merged before the delete would serve
    // the deleted rows; keep the scan until DeletionVectors.compact
    if (graft.sinks.DeletionVectors.present(spark, reg.basePath))
      return None

    // grouping: plain attributes, all view group columns
    val groupNames: Seq[String] = agg.groupingExpressions.map {
      case a: AttributeReference if spec.groupCols.contains(a.name) => a.name
      case _ => return None
    }

    // a stored grain must COVER the queried grouping
    val grain: Seq[String] =
      if (!spec.multiGrain) {
        if (groupNames.forall(spec.groupCols.contains)) spec.groupCols
        else return None
      } else spec.groupingSets
        .filter(s => groupNames.forall(s.contains))
        .sortBy(_.size).headOption.getOrElse(return None)

    // filters: deterministic, over the queried group columns only
    if (!filters.forall(f => f.deterministic &&
        f.references.forall(a => groupNames.contains(a.name)))) return None

    // map every output expression onto the view's stored partials
    def mapAgg(fn: AggregateFunction): Option[org.apache.spark.sql.Column] =
      fn match {
        case Count(es) if es.forall(e => e.foldable && e.eval() != null) =>
          Some(fsum(col("cnt")))
        case Sum(a: AttributeReference, _) if spec.sumCols.contains(a.name) =>
          Some(fsum(col(spec.sumAlias(a.name))))
        case Min(a: AttributeReference) if spec.minCols.contains(a.name) =>
          Some(fmin(col(spec.minAlias(a.name))))
        case Max(a: AttributeReference) if spec.maxCols.contains(a.name) =>
          Some(fmax(col(spec.maxAlias(a.name))))
        case _ => None
      }
    if (agg.aggregateExpressions.map(_.name).distinct.size !=
      agg.aggregateExpressions.size) return None
    val aggParts: Seq[org.apache.spark.sql.Column] =
      agg.aggregateExpressions.flatMap {
        case a: AttributeReference if groupNames.contains(a.name) => None
        case al @ Alias(ae: AggregateExpression, _) =>
          if (ae.isDistinct || ae.filter.nonEmpty) return None
          Some(mapAgg(ae.aggregateFunction).getOrElse(return None).as(al.name))
        case _ => return None
      }
    if (aggParts.isEmpty) return None // pure-DISTINCT shape: keep the scan

    // rebuild: grain slice of the view -> residual filters -> re-aggregate
    val grainDf: DataFrame =
      if (spec.multiGrain)
        MaterializedAgg.readGrain(spark, reg.viewRoot, spec, grain)
      else MaterializedAgg.readView(spark, reg.viewRoot, spec)
    val filtered = filters.foldLeft(grainDf) { (df, f) =>
      // re-anchor the conjunct on the view plan: base-side attribute ids
      // cannot resolve there, names can (group values are stored verbatim)
      val rebuilt = f.transform {
        case a: AttributeReference =>
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
            .quoted(a.name)
      }
      df.filter(org.apache.spark.sql.graftbridge.ColumnBridge.column(rebuilt))
    }
    val reagg =
      (if (groupNames.isEmpty) filtered.agg(aggParts.head, aggParts.tail: _*)
       else filtered.groupBy(groupNames.map(col): _*)
         .agg(aggParts.head, aggParts.tail: _*))
        .select(agg.aggregateExpressions.map(ne => col(ne.name)): _*)

    val newPlan = PlanBridge.plan(reagg)
    // type + id fidelity: every replacement column must carry the original
    // output's type exactly (the stored partials ARE Spark's partial-agg
    // states, so a mismatch means an unhandled shape — bail, don't cast)
    if (newPlan.output.size != agg.output.size) return None
    newPlan.output.zip(agg.output).foreach { case (n, o) =>
      if (n.dataType != o.dataType) return None
    }
    Some(Project(newPlan.output.zip(agg.output).map { case (n, o) =>
      Alias(n, o.name)(exprId = o.exprId)
    }, newPlan))
  }
}
