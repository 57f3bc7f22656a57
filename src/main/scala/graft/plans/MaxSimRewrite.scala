package graft.plans

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.sql.types._

import graft.functions.KernelAggs.MaxSimQ6Agg
import graft.functions.Kernels
import graft.operators.Similarity

/** DECLARATIVE MULTI-VECTOR SEARCH (VERDICT r15 #4): the MaxSim analog of
  * [[AnnRewrite]]. A user writes the brute-force late-interaction query
  * over a registered TOKEN corpus — every row one (doc, tok, vector)
  * token —
  *
  * {{{
  *   SELECT doc, graft_maxsim_q6(graft_vec_quantize(vec, 1000), BAG) AS s
  *   FROM tokens GROUP BY doc ORDER BY s DESC, doc LIMIT k
  * }}}
  *
  * (or the same plan via `groupBy(doc).agg(maxsim_q6(...))`), and when a
  * [[Similarity.writeIvfIndex]] lake over the corpus' token vectors is
  * registered ([[MaxSimIndex.register]]), the full-corpus scoring
  * aggregate is substituted with the q216 two-stage serving plan
  * ([[Similarity.maxSimServeConstQ]]): plan-time per-token centroid probe
  * → only the probed cell directories are read → per-token top-`tokK`
  * corpus tokens → candidate-document union → exact rerank with the SAME
  * aggregate over candidates only. At 100 TB that is "score every
  * document's every token per query" versus "read nprobe·|bag| cell
  * dirs and rerank a (|bag|·tokK)-bounded candidate set".
  *
  * Like [[AnnRewrite]] (and unlike the exactness-gated rewrites), the
  * substitution is APPROXIMATE by declared opt-in: a document surfaces
  * iff any of its tokens lands in some query token's probe — ColBERT's
  * own serving contract. The substituted answer stays fully
  * deterministic (stored centroids, quantized integer cosine, id
  * tiebreaks), so the DuckDB oracle replays it bit-for-bit (q219/q220).
  *
  * FILTERED MaxSim (VERDICT r15 #5, the q171 pgvector shape):
  * deterministic predicates over the doc column (below the aggregate) or
  * the doc/score outputs (above it) are admitted and re-attach over the
  * candidate scores — filter-then-top-k WITHIN the probed candidates
  * (ride-the-probe), never post-top-k. Any predicate touching another
  * column (e.g. the raw vector) keeps the scan.
  *
  * Match shape (anything else keeps the brute scan):
  *  - `GlobalLimit(k, LocalLimit(k, Sort(orders, [Filter] Aggregate)))`;
  *  - the Aggregate groups on exactly the registered doc column and
  *    outputs exactly (doc, `Alias(maxsim_q6(cexpr, BAG))`);
  *  - its child peels (SubqueryAlias / doc-only Filter)* down to the
  *    registered corpus relation;
  *  - `cexpr` behaviorally equals `vec_quantize(vecCol, 1000)`
  *    ([[AnnVerify.quantization]] — the shared probe-set gate);
  *  - `BAG` is a foldable non-empty `array<array<long>>` whose vectors
  *    match the index dimension;
  *  - orders: score DESC NULLS LAST, optionally followed by doc ASC
  *    NULLS FIRST;
  *  - the corpus file set still matches the registered fingerprint
  *    (freshness, exactly [[AnnIndex]]'s guard).
  *
  * Runtime kill-switch: `spark.graft.maxsimRewrite` (default on).
  * Registered via [[graft.GraftExtensions]] as an optimizer rule.
  */
object MaxSimIndex {

  /** A token corpus' declarative-MaxSim opt-in: serve
    * `groupBy(docCol).agg(maxsim_q6(quantize(vecCol), bag))` top-k
    * queries from the cosine IVF index at `indexPath` built over
    * (`tokCol`, `vecCol`), probing `nprobe` cells and keeping `tokK`
    * corpus tokens per query token. */
  final case class Registration(indexPath: String, corpusPath: String,
                                docCol: String, tokCol: String,
                                vecCol: String, nprobe: Int, tokK: Int,
                                fingerprint: String,
                                autoRefresh: Boolean = false)

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Registration]()

  def register(spark: SparkSession, corpusPath: String, indexPath: String,
               docCol: String, tokCol: String, vecCol: String,
               nprobe: Int, tokK: Int,
               autoRefresh: Boolean = false): Unit = {
    require(nprobe >= 1, s"nprobe must be >= 1 (got $nprobe)")
    require(tokK >= 1, s"tokK must be >= 1 (got $tokK)")
    val metric = Similarity.indexMetric(spark, indexPath)
    require(metric == "cosine" || metric == "cosine-sq8",
      s"MaxSim serves the cosine kernel only; index at $indexPath is '$metric'")
    registry.put(MvRewrite.norm(corpusPath),
      Registration(indexPath, corpusPath, docCol, tokCol, vecCol,
        nprobe, tokK, AnnIndex.fingerprint(spark, corpusPath),
        autoRefresh = autoRefresh))
    ()
  }

  /** Re-assert index coverage after the index caught up with the corpus. */
  def refresh(spark: SparkSession, corpusPath: String): Unit = {
    val k = MvRewrite.norm(corpusPath)
    Option(registry.get(k)).foreach { r =>
      registry.put(k,
        r.copy(fingerprint = AnnIndex.fingerprint(spark, corpusPath)))
    }
  }

  /** Streaming-maintenance hook, mirroring [[AnnIndex.onIndexAdvanced]]:
    * autoRefresh registrations re-fingerprint when a committed ingest
    * batch advanced their index. */
  private[graft] def onIndexAdvanced(spark: SparkSession,
                                     indexPath: String): Unit = {
    val idx = MvRewrite.norm(indexPath)
    registry.forEach { (k, r) =>
      if (r.autoRefresh && MvRewrite.norm(r.indexPath) == idx)
        registry.put(k,
          r.copy(fingerprint = AnnIndex.fingerprint(spark, r.corpusPath)))
    }
  }

  def unregister(corpusPath: String): Unit = {
    registry.remove(MvRewrite.norm(corpusPath)); ()
  }
  def clear(): Unit = registry.clear()

  private[graft] def lookup(path: String): Option[Registration] =
    Option(registry.get(MvRewrite.norm(path)))

  private[plans] def fresh(spark: SparkSession, reg: Registration): Boolean =
    AnnIndex.fingerprint(spark, reg.corpusPath) == reg.fingerprint
}

case class MaxSimRewrite(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  private val confKey = "spark.graft.maxsimRewrite"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.get(confKey, "true").toBoolean) return plan
    plan.transformDown {
      case gl @ GlobalLimit(IntegerLiteral(k),
          LocalLimit(IntegerLiteral(k2), s: Sort))
          if k == k2 && k > 0 && s.global =>
        try rewrite(s).map(ns =>
            GlobalLimit(gl.limitExpr,
              LocalLimit(gl.limitExpr, s.copy(child = ns))))
          .getOrElse(gl)
        catch { case NonFatal(_) => gl }
    }
  }

  /** Substitute the Sort's child (the full-corpus MaxSim aggregate) with
    * the two-stage candidate-bounded serving plan; the Sort + Limit stay
    * and execute the top-k over candidates only. */
  private def rewrite(sort: Sort): Option[LogicalPlan] = {
    // optional covered Filter between Sort and Aggregate
    val (upperFilters, agg) = sort.child match {
      case f @ Filter(cond, ag: Aggregate) if cond.deterministic =>
        (splitConjunctivePredicates(cond), ag)
      case ag: Aggregate => (Nil, ag)
      case _ => return None
    }

    // the Aggregate: GROUP BY exactly one attribute, outputs exactly
    // (that attribute, one maxsim_q6 alias)
    val docAttr = agg.groupingExpressions match {
      case Seq(a: AttributeReference) => a
      case _ => return None
    }
    if (agg.aggregateExpressions.size != 2) return None
    val docOut = agg.aggregateExpressions.collectFirst {
      case a: AttributeReference if a.exprId == docAttr.exprId => a
    }.getOrElse(return None)
    val scoreOut = agg.aggregateExpressions.collectFirst {
      case al @ Alias(AggregateExpression(_: MaxSimQ6Agg, Complete, false, _, _),
          _) => al
    }.getOrElse(return None)
    val ms = scoreOut.child
      .asInstanceOf[AggregateExpression].aggregateFunction
      .asInstanceOf[MaxSimQ6Agg]

    // peel to the registered corpus relation; doc-only filters admitted;
    // attribute-only Projects (the optimizer's column pruning inserts one
    // below the Aggregate) pass through — they rename nothing
    def peel(p: LogicalPlan): Option[(LogicalRelation, Seq[Expression])] =
      p match {
        case l: LogicalRelation if !l.isStreaming => Some((l, Nil))
        case sa: SubqueryAlias => peel(sa.child)
        case pr: Project
            if pr.projectList.forall(_.isInstanceOf[AttributeReference]) =>
          peel(pr.child)
        case f: Filter if f.condition.deterministic =>
          peel(f.child).map { case (l, cs) =>
            (l, splitConjunctivePredicates(f.condition) ++ cs)
          }
        case _ => None
      }
    val (rel, lowerFilters) = peel(agg.child).getOrElse(return None)
    val reg = rel.relation match {
      case h: HadoopFsRelation =>
        h.location.rootPaths.headOption
          .flatMap(r => MaxSimIndex.lookup(r.toString)).getOrElse(return None)
      case _ => return None
    }
    if (docAttr.name != reg.docCol || !rel.outputSet.contains(docAttr))
      return None

    // covered-predicate gates: below the aggregate only the doc column,
    // above it only the (doc, score) outputs
    if (!lowerFilters.forall(_.references.forall(_.exprId == docAttr.exprId)))
      return None
    if (!upperFilters.forall(_.references.forall(a =>
      a.exprId == docOut.exprId || a.exprId == scoreOut.exprId))) return None

    // the constant query bag (int literals widen, matching the aggregate)
    val qVecs: Array[Array[Long]] = {
      if (!ms.queryBag.foldable) return None
      (ms.queryBag.dataType, ms.queryBag.eval()) match {
        case (ArrayType(ArrayType(et @ (LongType | IntegerType), _), _),
            a: ArrayData) =>
          val out = Array.tabulate(a.numElements()) { j =>
            val e = a.getArray(j)
            if (e == null) return None
            if (et == LongType) e.toLongArray()
            else e.toIntArray().map(_.toLong)
          }
          if (out.isEmpty) return None
          out
        case _ => return None
      }
    }

    // corpus side: the quantization the index stored, over the registered
    // vector column
    val vecAttr = ms.child.references.toSeq match {
      case Seq(a: AttributeReference)
          if a.name == reg.vecCol && rel.outputSet.contains(a) => a
      case _ => return None
    }
    if (!AnnVerify.quantization(ms.child, rel.output, vecAttr,
      qVecs.head.length)) return None
    if (!qVecs.forall(_.length == qVecs.head.length)) return None

    // sort orders: score DESC NULLS LAST, optionally doc ASC NULLS FIRST
    val scoreOrderOk: SortOrder => Boolean = {
      case SortOrder(c: AttributeReference, Descending, NullsLast, _) =>
        c.exprId == scoreOut.exprId
      case _ => false
    }
    sort.order match {
      case Seq(so) if scoreOrderOk(so) =>
      case Seq(so, SortOrder(i: AttributeReference, Ascending, NullsFirst, _))
          if scoreOrderOk(so) && i.exprId == docOut.exprId =>
      case _ => return None
    }

    // freshness: the corpus must still be the file set the registrant
    // asserted index coverage for
    if (!MaxSimIndex.fresh(spark, reg)) return None

    // index dimension must match the bag
    val cents = Similarity.readCentroids(spark, reg.indexPath)
    if (cents.isEmpty || cents.head._2.length != qVecs.head.length)
      return None

    val serveDf = Similarity.maxSimServeConstQ(spark, reg.indexPath,
      spark.read.parquet(reg.corpusPath), reg.docCol, reg.tokCol,
      reg.vecCol, qVecs, reg.nprobe, reg.tokK)
    // the serve plan carries operators the main optimizer normally
    // replaces before physical planning (broadcast() ResolvedHints,
    // distinct()'s Deduplicate) — those replacement batches already ran,
    // so apply them to the substitution here
    val newPlan = Seq[Rule[LogicalPlan]](
      org.apache.spark.sql.catalyst.optimizer.EliminateResolvedHint,
      org.apache.spark.sql.catalyst.optimizer.ReplaceDeduplicateWithAggregate)
      .foldLeft(PlanBridge.plan(serveDf))((p, r) => r(p))
    if (newPlan.output.size != 2) return None
    val byPos = newPlan.output // (cdoc, score_micros)
    val newDoc = byPos.head
    val newScore = byPos(1)
    if (newDoc.dataType != docOut.dataType ||
      newScore.dataType != scoreOut.dataType) return None

    // re-anchor the original output exprIds so the Sort (and re-attached
    // filters, which ride BEFORE the top-k — the ride-the-probe
    // semantics) resolve unchanged
    val outs = agg.aggregateExpressions.map { o =>
      if (o.exprId == docOut.exprId) Alias(newDoc, docOut.name)(exprId = docOut.exprId)
      else Alias(newScore, scoreOut.name)(exprId = scoreOut.exprId)
    }
    val projected: LogicalPlan = Project(outs, newPlan)
    Some((lowerFilters ++ upperFilters).reduceOption(And)
      .map(c => Filter(c, projected)).getOrElse(projected))
  }
}
