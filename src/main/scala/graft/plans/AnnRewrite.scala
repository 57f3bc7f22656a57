package graft.plans

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, typedlit}
import org.apache.spark.sql.graftbridge.{ColumnBridge, PlanBridge}
import org.apache.spark.sql.types._

import graft.functions.{KernelExprs, Kernels, Functions => F}
import graft.operators.Similarity

/** DECLARATIVE ANN: `ORDER BY cosine(corpus_vec, <constant query vector>)
  * DESC LIMIT k` over a corpus with a REGISTERED persisted IVF index
  * ([[Similarity.writeIvfIndex]]) is answered by the cell-pruned index
  * probe instead of a full corpus scan — the pgvector/Milvus planner
  * pattern: the user writes the brute-force query, the planner substitutes
  * the index. At 100 TB the difference is "scan the world per query"
  * versus "read nprobe/nlist of a pre-clustered lake".
  *
  * METRICS (r12): the registration carries the index's `_metric` sidecar
  * value and the rule answers only that metric's kernel + ordering —
  * `CosineQ6 DESC` / `DotLong DESC` (similarity) / `L2sqLong ASC NULLS
  * LAST` (distance) — pgvector's `<=>`/`<#>`/`<->` operator classes.
  * An L2 query over a cosine index (or any cross pairing) keeps the scan.
  *
  * UNLIKE the engine's other rewrite rules ([[ManifestAggs]], [[MvRewrite]]
  * — exactness-gated), an IVF probe is APPROXIMATE by construction: rows
  * outside the probed cells are never scored. Registering an index is
  * therefore an explicit opt-in that declares nprobe-approximate top-k
  * acceptable for that corpus — exactly the contract `CREATE INDEX ...
  * USING ivfflat` establishes in pgvector, where the same `ORDER BY
  * embedding <=> q LIMIT k` silently becomes approximate once the index
  * exists. The substituted answer stays fully DETERMINISTIC (stored
  * centroids + quantized integer cosine + id tiebreak), so the DuckDB
  * oracle reproduces it bit-for-bit (q165).
  *
  * Match shape (anything else keeps the scan):
  *  - `GlobalLimit(k, LocalLimit(k, Sort(orders, Project(outs, corpus))))`
  *    where the corpus relation's root path is registered. Deterministic
  *    FILTERS are admitted when they touch only columns the index covers
  *    — the id column below the Project, the id/cosine outputs above it
  *    (filtered ANN, the pgvector pattern: the predicate applies within
  *    the probed cells before the top-k). Any other predicate keeps the
  *    scan — the index stores only (cell, id, quantized vector).
  *  - `outs`: the registered id column, plus exactly one
  *    `Alias(cosExpr, _)`. Any other output column keeps the scan — the
  *    index COVERS only (id, cosine), the classic covering-index gate.
  *  - `cosExpr = CosineQ6(cexpr, q)` (either argument order) with `q`
  *    foldable (the constant query vector, already quantized) and `cexpr`
  *    referencing exactly the registered vector column.
  *  - `orders`: cosine DESC NULLS LAST, optionally followed by id ASC
  *    NULLS FIRST (the defaults — i.e. `.orderBy(cos.desc, id)`).
  *
  * `cexpr` must equal `vec_quantize(vecCol, 1000)` — the quantization the
  * index stored. Tree-matching the expanded `transform(...)` chain is
  * brittle across optimizer phases, so the rule verifies BEHAVIORALLY: it
  * binds `cexpr` against the relation output and evaluates it on a fixed
  * probe set of vectors (rounding-boundary, negative, and null cases),
  * requiring bit-equality with the driver-side quantization. A same-shape
  * expression with different semantics (another scale, an offset) fails
  * the probes and keeps the scan.
  *
  * Null embeddings: `vec_quantize(null)` scores a null cosine, which DESC
  * NULLS LAST orders after every scored row; the index never surfaces
  * them (null vectors assign to cell -1, which no query probes). The
  * substitution is therefore order-identical on nulls whenever the probed
  * cells hold >= k rows — and short answers are inherent to IVF probing
  * (pgvector returns short result sets the same way).
  *
  * FRESHNESS mirrors [[MvRewrite]]: registration captures the corpus
  * file-set fingerprint; the rule re-fingerprints at rewrite time and
  * bails to the scan on any mismatch, so an appended corpus can never be
  * silently answered from a stale index. [[AnnIndex.refresh]] re-captures
  * after [[Similarity.appendIvfIndex]] brings the index up to date.
  *
  * Runtime kill-switch: `spark.graft.annRewrite` (default on).
  * Registered via [[graft.GraftExtensions]] as an optimizer rule.
  */
object AnnIndex {

  /** A corpus' declarative-ANN opt-in: probe the IVF index at `indexPath`
    * with `nprobe` cells for top-k queries over (`idCol`, `vecCol`).
    * `metric` is the index's distance (from its `_metric` sidecar —
    * "cosine" / "l2" / "ip"); the rule answers only queries in that
    * metric, pgvector's per-operator-class binding. */
  final case class Registration(indexPath: String, corpusPath: String,
                                idCol: String, vecCol: String, nprobe: Int,
                                fingerprint: String,
                                metric: String = "cosine",
                                autoRefresh: Boolean = false)

  /** normalized corpus path → registration (process-wide, like the
    * session catalogs optimizer rules consult). */
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Registration]()

  /** Opt `corpusPath` into declarative ANN through the index at
    * `indexPath` (built by [[Similarity.writeIvfIndex]] over this corpus'
    * `idCol`/`vecCol`). Captures the corpus fingerprint AS OF NOW — the
    * rule keeps the scan once the corpus changes, until [[refresh]]. */
  def register(spark: SparkSession, corpusPath: String, indexPath: String,
               idCol: String, vecCol: String, nprobe: Int,
               autoRefresh: Boolean = false): Unit = {
    require(nprobe >= 1, s"nprobe must be >= 1 (got $nprobe)")
    registry.put(MvRewrite.norm(corpusPath),
      Registration(indexPath, corpusPath, idCol, vecCol, nprobe,
        fingerprint(spark, corpusPath),
        metric = Similarity.indexMetric(spark, indexPath),
        autoRefresh = autoRefresh))
    ()
  }

  /** Re-assert index coverage after [[Similarity.appendIvfIndex]] caught
    * the index up with the corpus' current contents. */
  def refresh(spark: SparkSession, corpusPath: String): Unit = {
    val k = MvRewrite.norm(corpusPath)
    Option(registry.get(k)).foreach { r =>
      registry.put(k, r.copy(fingerprint = fingerprint(spark, corpusPath)))
    }
  }

  /** Streaming-maintenance hook (VERDICT r13 #5): called by
    * [[Similarity.ingestBatchIvf]] after a COMMITTED ingest batch
    * advanced the index at `indexPath`. Registrations made with
    * `autoRefresh = true` — the caller's declaration that corpus and
    * index are maintained batch-synchronously (one `foreachBatch` writes
    * both, corpus first) — re-capture the corpus fingerprint, so a
    * continuously-ingested corpus keeps being served from the index
    * instead of failing the freshness check until a manual [[refresh]].
    * Default registrations are untouched: without the synchronous-
    * maintenance declaration, re-arming on fence advance could declare a
    * corpus fresh that the index does not cover. */
  private[graft] def onIndexAdvanced(spark: SparkSession,
                                     indexPath: String): Unit = {
    val idx = MvRewrite.norm(indexPath)
    registry.forEach { (k, r) =>
      if (r.autoRefresh && MvRewrite.norm(r.indexPath) == idx)
        registry.put(k, r.copy(fingerprint = fingerprint(spark, r.corpusPath)))
    }
  }

  def unregister(corpusPath: String): Unit = {
    registry.remove(MvRewrite.norm(corpusPath)); ()
  }
  def clear(): Unit = registry.clear()

  private[graft] def lookup(path: String): Option[Registration] =
    Option(registry.get(MvRewrite.norm(path)))

  private[plans] def fingerprint(spark: SparkSession, path: String): String =
    try graft.sources.ZLake.stateFingerprint(spark, path)
    catch { case NonFatal(_) => "unreadable" }

  private[plans] def fresh(spark: SparkSession, reg: Registration): Boolean =
    fingerprint(spark, reg.corpusPath) == reg.fingerprint
}

case class AnnRewrite(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  private val confKey = "spark.graft.annRewrite"

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

  /** Substitute the Sort's CHILD (the scored corpus scan) with the index
    * probe; the Sort + Limit stay and execute over nprobe cells' rows —
    * a TakeOrderedAndProject over the pruned candidate set. */
  private def rewrite(sort: Sort): Option[LogicalPlan] = {
    // peel: Project over (SubqueryAlias* / id-only Filter*) LogicalRelation.
    // FILTERED ANN (the pgvector pain point): deterministic predicates are
    // admitted when they touch only columns the index COVERS — the id
    // column below the Project, the id/cosine outputs above it. They
    // re-attach verbatim over the probe (output exprIds are preserved),
    // so the semantics stay filter-then-top-k WITHIN the probed cells —
    // approximate in exactly the way the registration opted into. A
    // predicate on any other column (e.g. the raw vector) keeps the scan.
    val (upperFilters, proj) = sort.child match {
      case f @ Filter(cond, pr: Project) if cond.deterministic =>
        (splitConjunctivePredicates(cond), pr)
      case pr: Project => (Nil, pr)
      case _ => return None
    }
    def peel(p: LogicalPlan): Option[(LogicalRelation, Seq[Expression])] =
      p match {
        case l: LogicalRelation if !l.isStreaming => Some((l, Nil))
        case sa: SubqueryAlias => peel(sa.child)
        case f: Filter if f.condition.deterministic =>
          peel(f.child).map { case (l, cs) =>
            (l, splitConjunctivePredicates(f.condition) ++ cs)
          }
        case _ => None
      }
    val (rel, lowerFilters) = peel(proj.child).getOrElse(return None)
    val reg = rel.relation match {
      case h: HadoopFsRelation =>
        h.location.rootPaths.headOption
          .flatMap(r => AnnIndex.lookup(r.toString)).getOrElse(return None)
      case _ => return None
    }

    // outputs: the registered id column + exactly one cosine alias
    val idOut = proj.projectList.collectFirst {
      case a: AttributeReference if a.name == reg.idCol => a
    }.getOrElse(return None)
    val cosOut = proj.projectList.collectFirst {
      case al @ Alias(_, _) => al
    }.getOrElse(return None)
    if (proj.projectList.size != 2 ||
      !proj.projectList.toSet.equals(Set[NamedExpression](idOut, cosOut)))
      return None

    // filters above the Project must stay inside the covered outputs
    if (!upperFilters.forall(_.references.forall(a =>
      a.exprId == idOut.exprId || a.exprId == cosOut.exprId))) return None

    // score expression: the registered metric's kernel over (quantized
    // corpus vec, constant query) — any other metric's kernel keeps the
    // scan (an L2 index cannot answer a cosine query and vice versa)
    val (cexpr, qexpr) = (reg.metric, cosOut.child) match {
      case ("cosine" | "cosine-sq8", KernelExprs.CosineQ6(l, r))
          if r.foldable && !l.foldable => (l, r)
      case ("cosine" | "cosine-sq8", KernelExprs.CosineQ6(l, r))
          if l.foldable && !r.foldable => (r, l)
      case ("l2" | "l2-sq8", KernelExprs.L2sqLong(l, r))
          if r.foldable && !l.foldable => (l, r)
      case ("l2" | "l2-sq8", KernelExprs.L2sqLong(l, r))
          if l.foldable && !r.foldable => (r, l)
      case ("ip", KernelExprs.DotLong(l, r))
          if r.foldable && !l.foldable => (l, r)
      case ("ip", KernelExprs.DotLong(l, r))
          if l.foldable && !r.foldable => (r, l)
      case _ => return None
    }
    val qArr = qexpr.eval() match {
      case a: ArrayData if qexpr.dataType.isInstanceOf[ArrayType] &&
          qexpr.dataType.asInstanceOf[ArrayType].elementType == LongType =>
        a.toLongArray()
      case _ => return None
    }

    // corpus side references exactly the registered vector column
    val vecAttr = cexpr.references.toSeq match {
      case Seq(a: AttributeReference)
          if a.name == reg.vecCol && rel.outputSet.contains(a) => a
      case _ => return None
    }
    if (!AnnVerify.quantization(cexpr, rel.output, vecAttr, qArr.length))
      return None

    // filters below the Project: predicate pushdown substitutes the
    // cosine alias with its full expression, so re-anchor any subtree
    // semantically equal to it back onto the cosine output — after which
    // a covered conjunct references only id/cosine
    val loweredFilters = lowerFilters.map(_.transform {
      case e if e.semanticEquals(cosOut.child) => cosOut.toAttribute
    })
    if (!loweredFilters.forall(_.references.forall(a =>
      a.exprId == idOut.exprId || a.exprId == cosOut.exprId))) return None

    // sort orders: similarity metrics (cosine/ip) take the BEST score
    // first — DESC NULLS LAST; the distance metric (l2) ASC NULLS LAST
    // (`.asc_nulls_last` — plain .asc puts null-vector rows FIRST, a
    // query no index can cover). Optionally followed by id ASC.
    val scoreOrderOk: SortOrder => Boolean = so => (so, reg.metric) match {
      case (SortOrder(c: AttributeReference, Descending, NullsLast, _),
            "cosine" | "cosine-sq8" | "ip") => c.exprId == cosOut.exprId
      case (SortOrder(c: AttributeReference, Ascending, NullsLast, _),
            "l2" | "l2-sq8") => c.exprId == cosOut.exprId
      case _ => false
    }
    sort.order match {
      case Seq(so) if scoreOrderOk(so) =>
      case Seq(so, SortOrder(i: AttributeReference, Ascending, NullsFirst, _))
          if scoreOrderOk(so) && i.exprId == idOut.exprId =>
      case _ => return None
    }

    // freshness: the corpus must still be the file set the registrant
    // asserted index coverage for
    if (!AnnIndex.fresh(spark, reg)) return None

    // plan-time centroid probe: nprobe best stored cells to the query,
    // under the INDEX'S metric (the cells were assigned with it)
    val cents = Similarity.readCentroids(spark, reg.indexPath)
    if (cents.isEmpty) return None
    if (cents.head._2.length != qArr.length) return None
    val probed = (reg.metric match {
      case "l2" | "l2-sq8" => cents
        .map { case (id, c) => (id, Kernels.l2sqArrays(qArr, c).toDouble) }
        .sortBy { case (id, d) => (d, id) }
      case "ip" => cents
        .map { case (id, c) => (id, Kernels.dotArrays(qArr, c).toDouble) }
        .sortBy { case (id, d) => (-d, id) }
      case _ => cents
        .map { case (id, c) => (id, Kernels.cosineQ6Arrays(qArr, c)) }
        .sortBy { case (id, cos) => (-cos, id) }
    }).take(reg.nprobe).map(_._1)

    // replacement: read ONLY the probed cell= directories, score exactly
    // the metric expression the query asked for
    val qLit = ColumnBridge.column(
      Literal.create(qArr, ArrayType(LongType, containsNull = false)))
    // IVF,SQ8 (VERDICT r12 #6): the lake stores CODES only — the probe
    // decodes against the trained bounds and ADC-scores the
    // reconstruction, the FAISS serving shape; raw-vector metrics score
    // the stored cv directly
    val pruned = Similarity.readAssign(spark, reg.indexPath)
      .filter(col("cell").isin(probed.map(Int.box).toSeq: _*))
    val scored = reg.metric match {
      case "l2-sq8" =>
        val (mn, mx) = Similarity.readSq8Bounds(spark, reg.indexPath)
        pruned.select(col("neighbor_id"),
          F.vec_l2sq_long(F.vec_sq8_recon(col("codes"),
            typedlit(mn.toSeq), typedlit(mx.toSeq)), qLit).as("__score"))
      case "cosine-sq8" =>
        val (mn, mx) = Similarity.readSq8Bounds(spark, reg.indexPath)
        pruned.select(col("neighbor_id"),
          F.vec_cosine_q6(F.vec_sq8_recon(col("codes"),
            typedlit(mn.toSeq), typedlit(mx.toSeq)), qLit).as("__score"))
      case "l2" => pruned.select(col("neighbor_id"),
        F.vec_l2sq_long(col("cv"), qLit).as("__score"))
      case "ip" => pruned.select(col("neighbor_id"),
        F.vec_dot_long(col("cv"), qLit).as("__score"))
      case _ => pruned.select(col("neighbor_id"),
        F.vec_cosine_q6(col("cv"), qLit).as("__score"))
    }
    val probeDf = scored
      .select(col("neighbor_id").cast(idOut.dataType).as(idOut.name),
        col("__score").as(cosOut.name))
    val newPlan = PlanBridge.plan(probeDf)

    // type fidelity, then re-anchor the original output attribute ids so
    // the Sort above resolves unchanged
    if (newPlan.output.size != 2) return None
    val byName = newPlan.output.map(a => a.name -> a).toMap
    val outs = proj.projectList.map { o =>
      val n = byName.getOrElse(o.name, return None)
      if (n.dataType != o.dataType) return None
      Alias(n, o.name)(exprId = o.exprId)
    }
    val projected: LogicalPlan = Project(outs, newPlan)
    // covered predicates re-attach verbatim: the aliases above carry the
    // original output exprIds, so both filter layers resolve unchanged
    Some((loweredFilters ++ upperFilters).reduceOption(And)
      .map(c => Filter(c, projected)).getOrElse(projected))
  }

}

/** Behavioral gate shared by [[AnnRewrite]] and [[MaxSimRewrite]]: bound
  * against the relation output, `cexpr` must reproduce
  * `vec_quantize(vecCol, 1000)` on a fixed probe set — rounding-boundary
  * magnitudes, negatives, zero — and preserve null. Literal-free
  * verification that survives whatever shape the optimizer has folded
  * the quantization chain into. */
private[plans] object AnnVerify {
  def quantization(cexpr: Expression, relOutput: Seq[Attribute],
                   vecAttr: AttributeReference, dim: Int): Boolean = {
    cexpr.dataType match {
      case ArrayType(LongType, _) =>
      case _ => return false
    }
    val elemType = vecAttr.dataType match {
      case ArrayType(et @ (FloatType | DoubleType), _) => et
      case _ => return false
    }
    if (!cexpr.deterministic) return false
    val bound = BindReferences.bindReference(cexpr, relOutput)
    val idx = relOutput.indexWhere(_.exprId == vecAttr.exprId)
    if (idx < 0) return false

    val samples: Seq[Array[Double]] = Seq(
      Array.tabulate(dim)(i => (i % 7) * 0.1237 - 0.35),
      Array.tabulate(dim)(i => if (i % 2 == 0) 0.0005 else -0.0005),
      Array.tabulate(dim)(_ => 0.0))
    samples.forall { raw =>
      val vals: Array[Any] = elemType match {
        case FloatType => raw.map(d => d.toFloat: Any)
        case _ => raw.map(d => d: Any)
      }
      val row = new GenericInternalRow(relOutput.size)
      row.update(idx, new GenericArrayData(vals))
      val expected = vals.map {
        case f: Float => math.floor(f.toDouble * 1000 + 0.5).toLong
        case d: Double => math.floor(d * 1000 + 0.5).toLong
      }
      bound.eval(row) match {
        case a: ArrayData => java.util.Arrays.equals(a.toLongArray(), expected)
        case _ => false
      }
    } && {
      // null vector must stay null (never a fabricated score)
      val row = new GenericInternalRow(relOutput.size)
      row.update(idx, null)
      bound.eval(row) == null
    }
  }
}
