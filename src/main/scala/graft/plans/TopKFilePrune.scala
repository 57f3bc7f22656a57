package graft.plans

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.ZLake
import graft.sources.ZLake.{FileEnvelope, StatsFileIndex}

/** Top-K file pruning over the stats lake: `ORDER BY col [DESC] LIMIT k`
  * scans ONLY the files that can contribute to the top-k — the zone-map
  * top-k optimization. Static predicates already prune files through
  * [[StatsFileIndex.listFiles]]; a bare sorted limit carries no predicate,
  * so native Spark scans the WHOLE lake to return k rows. At 100 TB,
  * `SELECT * FROM lake ORDER BY ts DESC LIMIT 100` — the single most
  * common operational query over any event lake — must not be a full
  * scan when the manifest already knows each file's [lo, hi].
  *
  * Sound bound, from file envelopes alone (DESC orientation; ASC mirrors):
  * sort files by their envelope MIN descending and accumulate known
  * non-null row counts until they reach k — every accumulated row is >=
  * the last file's min `T`, so the true k-th value is >= T, and any file
  * whose MAX < T cannot hold a top-k row. Ties at T are always KEPT (a
  * file with max == T may hold rows interchangeable with the boundary).
  * Only the first sort key decides — with lexicographic tiebreakers the
  * first key still dominates, so the bound stays sound.
  *
  * Null ordering is honored exactly: under NULLS LAST, null rows are
  * dominated by the k accumulated non-null rows, so provably-all-null
  * files prune and unknown-null-count files still prune on their value
  * envelope; under NULLS FIRST, files with (possible) nulls are
  * unprunable, known null counts accumulate ahead of every value, and a
  * bound met by nulls alone keeps exactly the files that may hold one.
  *
  * Exactness gates (any miss leaves the plan untouched — the normal scan
  * answers): sort key must be an integral or string DATA column (float
  * envelopes mis-order NaN vs Spark's sort, so they bail), a PARTITION
  * column (directory values are exact — the "latest windows" query), or a
  * CAST of a string partition column to an integral/date type (`ORDER BY
  * CAST(day AS INT) DESC` over a `day=20260814` layout — the cast
  * evaluates exactly per directory; r8 verdict #6); a
  * file contributes to the bound only with known rows + known null count
  * + an envelope; files without usable stats are never pruned and never
  * counted. Filters between the limit and the lake must be deterministic:
  * partition-only conjuncts evaluate exactly per directory (the same
  * binding listFiles uses) so non-surviving directories neither count
  * toward the bound nor block pruning; DATA conjuncts are sound via the
  * may/must envelope pair — a file counts toward the bound only when
  * [[ZLake.mustMatch]] PROVES every row survives the filter (so the bound
  * never overcounts), and stays scannable whenever [[ZLake.mayMatch]]
  * cannot rule it out. An eval error bails the rewrite so the scan path
  * raises it natively.
  *
  * Runtime kill-switch: `spark.graft.topkFilePrune` (default on).
  * Registered via [[graft.GraftExtensions]] as an optimizer rule.
  */
case class TopKFilePrune(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  import TopKFilePrune._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.get(confKey, "true").toBoolean) return plan
    plan.transformDown {
      case gl @ GlobalLimit(IntegerLiteral(k),
          LocalLimit(IntegerLiteral(k2), inner)) if k == k2 && k > 0 =>
        // column pruning wedges a bare-attribute Project BETWEEN the limit
        // and the sort when a dropped column is itself a sort key (e.g.
        // `ORDER BY win ... LIMIT k` then drop(win)); it only narrows
        // columns, so seeing through it is sound
        val peeled: Option[(Sort, Sort => LogicalPlan)] = inner match {
          case s: Sort if s.global => Some((s, identity))
          case p @ Project(pl, s: Sort)
              if s.global && pl.forall(_.isInstanceOf[AttributeReference]) =>
            Some((s, ns => p.copy(child = ns)))
          case _ => None
        }
        peeled.flatMap { case (s, rebuild) =>
          prune(s, k).map(ns =>
            GlobalLimit(gl.limitExpr, LocalLimit(gl.limitExpr, rebuild(ns))))
        }.getOrElse(gl)
    }
  }

  /** Peel the sort's child down to a ZLake relation, collecting filter
    * conjuncts and an alias map (output exprId → underlying relation
    * attribute, fully resolved through nested Projects) so `SELECT x AS y …
    * ORDER BY y LIMIT k` — the most common SQL spelling — prunes too.
    * None on any shape we do not fully understand. */
  private def unwrap(p: LogicalPlan)
      : Option[(LogicalRelation, HadoopFsRelation, StatsFileIndex,
          Seq[Expression], Map[ExprId, AttributeReference])] =
    p match {
      // streaming relations (ZLakeTail batches) never prune here: a
      // micro-batch plan's limit governs the WHOLE standing query, not
      // this batch's files — and Spark forbids Sort over a raw stream
      // anyway, so this is defense-in-depth mirroring [[MvRewrite]]
      case l: LogicalRelation if l.isStreaming => None
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location match {
          case idx: StatsFileIndex => Some((l, h, idx, Nil, Map.empty))
          case _ => None
        }
        case _ => None
      }
      case f: Filter => unwrap(f.child).map { case (l, h, idx, cs, m) =>
        (l, h, idx, splitConjunctivePredicates(f.condition) ++ cs, m)
      }
      case pr: Project if pr.projectList.forall {
          case _: AttributeReference => true
          case Alias(_: AttributeReference, _) => true
          case _ => false
        } =>
        unwrap(pr.child).map { case (l, h, idx, cs, m) =>
          val aliases = pr.projectList.collect {
            case al @ Alias(a: AttributeReference, _) =>
              al.exprId -> m.getOrElse(a.exprId, a)
          }
          (l, h, idx, cs, m ++ aliases)
        }
      case s: SubqueryAlias => unwrap(s.child)
      case _ => None
    }

  private def prune(sort: Sort, k: Int): Option[Sort] = {
    val (rel, fsRel, idx, rawFilters, aliasMap) =
      unwrap(sort.child).getOrElse(return None)
    // resolve aliases down to relation attributes — values in aliasMap are
    // already fully resolved, so a single pass suffices
    def resolve(e: Expression): Expression = e.transform {
      case a: AttributeReference => aliasMap.getOrElse(a.exprId, a)
    }
    val filters = rawFilters.map(resolve)

    val order = sort.order.headOption.getOrElse(return None)
    // `ORDER BY CAST(win AS INT) DESC` — an integer-typed partition key
    // spelled over the lake's STRING partition columns (`day=20260814`).
    // Directory values are exact, so the cast lane just evaluates the
    // query's own cast per directory and orders typed — but ONLY the
    // partition lane: casting a data column's string ENVELOPE would not
    // bound the cast of its rows (r8 verdict #6).
    val (key, sortCast) = resolve(order.child) match {
      case a: AttributeReference => (a, None)
      case c: Cast => c.child match {
        case a: AttributeReference if a.dataType == StringType &&
            (c.dataType match {
              case ByteType | ShortType | IntegerType | LongType |
                   DateType => true
              case _ => false
            }) => (a, Some(c))
        case _ => return None
      }
      case _ => return None
    }
    key.dataType match {
      case ByteType | ShortType | IntegerType | LongType | StringType => ()
      // internal values are raw int days / int64 micros — envelopes exact
      // (legacy-rebase files carry no envelope, so they are never pruned)
      case DateType | TimestampType | TimestampNTZType => ()
      case _ => return None
    }
    val col = key.name.toLowerCase
    val partCols = idx.partitionCols
    if (sortCast.isDefined && !partCols.contains(col)) return None
    val descending = order.direction == Descending
    val nullsFirst = order.nullOrdering == NullsFirst

    // filters: all conjuncts must be deterministic with references.
    // Partition-only conjuncts evaluate exactly per directory (the same
    // binding listFiles uses). DATA conjuncts no longer bail: a file
    // counts rows toward the k-bound ONLY when its envelope PROVES every
    // row satisfies them ([[ZLake.mustMatch]] — zero nulls + envelope
    // fully inside); unprovable files contribute nothing to the bound but
    // stay scannable (mayMatch), so the bound never overcounts.
    if (!filters.forall(f => f.deterministic && f.references.nonEmpty))
      return None
    val (partFilters, dataFilters) = filters.partition(
      _.references.forall(a => partCols.contains(a.name.toLowerCase)))
    val candidates =
      try idx.fes.filter { fe =>
        val row = InternalRow.fromSeq(
          fe.partitionValues.map(p => UTF8String.fromString(p._2)))
        partFilters.forall { f =>
          val bound = f.transform {
            case a: AttributeReference =>
              BoundReference(partCols.indexOf(a.name.toLowerCase),
                StringType, nullable = true)
          }
          bound.eval(row) == true
        } && dataFilters.forall(ZLake.mayMatch(_, fe))
      } catch { case NonFatal(_) => return None }
    // rows of this file provably ALL survive the data filters? An eval
    // error inside the proof means "not provable", never a failed query
    def guaranteed(fe: FileEnvelope): Boolean =
      try dataFilters.forall(ZLake.mustMatch(_, fe))
      catch { case NonFatal(_) => false }

    // shared tail: fixed-point guard, seam, index swap, derived filter
    // placed directly above the RELATION (the filter references the
    // relation's own attribute — above an aliasing Project it would dangle)
    def finish(kept: Seq[FileEnvelope], derived: Expression): Option[Sort] = {
      if (kept.size == idx.fes.size) return None // nothing pruned: fixed point
      // seam set ONLY when pruning occurs: the optimizer re-runs the batch
      // to fixed point, and the second pass over the already-pruned index
      // must not overwrite the recorded decision with (n, n)
      lastPrune.set((kept.size, idx.fes.size))
      val newIdx = new StatsFileIndex(idx.rootPaths.head, kept, idx.manifestSchema)
      val newRel = fsRel.copy(location = newIdx)(spark)
      Some(sort.copy(child = sort.child.transformUp {
        case l: LogicalRelation if l eq rel =>
          val nl = l.copy(relation = newRel)
          if (derived == Literal.TrueLiteral) nl else Filter(derived, nl)
      }))
    }

    if (partCols.contains(col)) {
      // PARTITION-KEY top-k (`ORDER BY win DESC LIMIT k` — "the latest
      // windows", the most common operational query over a windowed lake):
      // directory values are known EXACTLY, so no envelopes are needed —
      // accumulate known row counts down the value order until k, keep the
      // directories at-or-before the cutoff (ties kept by >=), and emit
      // the cutoff as an exact partition filter so the re-entered rule
      // reaches its fixed point through the normal partition-filter path.
      // Partition values are never NULL (`col=value` path segments), so
      // null ordering cannot matter.
      if (key.dataType != StringType) return None
      val withVal = candidates.map { fe =>
        (fe, fe.partitionValues.collectFirst { case (c, v) if c == col => v })
      }
      if (withVal.exists(w => w._2.isEmpty || w._1.rows < 0L)) return None
      // sort value per directory string: the string itself (UTF-8 order —
      // the same order Spark's string comparison and our partMatch use),
      // or the query's own cast evaluated on it (typed lane). A cast that
      // nulls or throws on any directory (junk value, non-ANSI null) bails
      // the whole rewrite — the scan path then raises/handles it natively.
      // (raw internal for the cutoff literal, canonical comparison key):
      // the no-cast lane compares directory strings; the cast lane
      // compares the evaluated internals via litVal's BigDecimal canon
      val sortValOf: String => Option[(Any, Any)] = sortCast match {
        case None => v => Some((v, v))
        case Some(c) => v =>
          try {
            val raw = c.transform {
              case _: AttributeReference =>
                Literal(UTF8String.fromString(v), StringType)
            }.eval(InternalRow.empty)
            ZLake.litCanon(raw).map(canon => (raw, canon))
          } catch { case NonFatal(_) => None }
      }
      val dirVals = withVal.map(_._2.get).distinct
      val sortVal: Map[String, (Any, Any)] = dirVals.map { v =>
        v -> sortValOf(v).getOrElse(return None)
      }.toMap
      // total by construction: one lane yields all-String canon, the
      // other all-BigDecimal
      def dirCmp(x: String, y: String): Int =
        ZLake.cmp(sortVal(x)._2, sortVal(y)._2).get
      // only rows provably surviving the data filters count toward k
      val rowsByVal = withVal.groupBy(_._2.get)
        .map { case (v, fs) =>
          v -> fs.map { case (fe, _) =>
            if (guaranteed(fe)) fe.rows else 0L
          }.sum
        }
      val ordered = rowsByVal.keys.toSeq.sortWith { (x, y) =>
        val c = dirCmp(x, y)
        if (descending) c > 0 else c < 0
      }
      var remaining = k.toLong
      var cut: Option[String] = None
      val it = ordered.iterator
      while (remaining > 0L && it.hasNext) {
        val v = it.next(); remaining -= rowsByVal(v); cut = Some(v)
      }
      if (remaining > 0L) return None // cannot guarantee k rows: no prune
      val t = cut.getOrElse(return None)
      val kept = withVal.collect { case (fe, Some(v))
          if { val c = dirCmp(v, t); if (descending) c >= 0 else c <= 0 } =>
        fe
      }
      // derived cutoff filter in the SAME terms the query sorts by, so the
      // re-entered rule reaches its fixed point through the normal
      // partition-filter path (partMatch evaluates the cast per directory)
      val (lhs, lit): (Expression, Literal) = sortCast match {
        case None => (key, Literal(UTF8String.fromString(t), StringType))
        case Some(c) => (c, Literal(sortVal(t)._1, c.dataType))
      }
      return finish(kept,
        if (descending) GreaterThanOrEqual(lhs, lit)
        else LessThanOrEqual(lhs, lit))
    }

    // "best" row a file guarantees nn copies of = its envelope edge on the
    // FAR side of the sort direction; "worst" = near side. DESC: rows all
    // in [lo, hi], each >= lo, so lo is the guaranteed (worst) bound and
    // hi decides prunability.
    def worstOf(e: ZLake.ColEnvelope): Any = if (descending) e.lo else e.hi
    def bestOf(e: ZLake.ColEnvelope): Any = if (descending) e.hi else e.lo
    // better(a, b) > 0: a sorts strictly before b
    def better(a: Any, b: Any): Option[Int] =
      ZLake.cmp(a, b).map(c => if (descending) c else -c)

    // `nulls` stays RAW for the kept-decision lanes (conservative); the
    // BOUND lanes (nn, known nulls) count only files whose rows provably
    // survive the data filters (`g`)
    final case class Stats(fe: FileEnvelope, nn: Long, nulls: Option[Long],
                           env: Option[ZLake.ColEnvelope], g: Boolean)
    val stats = candidates.map { fe =>
      val nulls = if (fe.rows == 0L) Some(0L) else fe.nullCounts.get(col)
      val g = guaranteed(fe)
      val nn =
        if (!g) -1L
        else (fe.rows, nulls) match {
          case (r, Some(n)) if r >= 0L => r - n
          case _ => -1L // unknown
        }
      Stats(fe, nn, nulls, fe.cols.get(col), g)
    }

    // accumulate guaranteed at-or-better-than-T rows until >= k
    val knownNulls = stats.filter(_.g).map(_.nulls.getOrElse(0L)).sum
    var remaining = k.toLong
    if (nullsFirst) remaining -= knownNulls
    val threshold: Option[Any] = // None = bound met by nulls alone
      if (remaining <= 0L) None
      else try {
        // sortWith's comparator is non-total when envelopes mix types
        // across files (per-file 't' tags) — TimSort may throw; bail to
        // the full scan instead of failing the query
        val contributors = stats
          .filter(s => s.nn > 0L && s.env.isDefined)
          .map(s => (worstOf(s.env.get), s.nn))
          .sortWith((a, b) => better(a._1, b._1).exists(_ > 0))
        var t: Option[Any] = None
        val it = contributors.iterator
        while (remaining > 0L && it.hasNext) {
          val (w, nn) = it.next()
          remaining -= nn
          t = Some(w)
        }
        if (remaining > 0L) return None // cannot guarantee k rows: no prune
        t
      } catch { case NonFatal(_) => return None }

    val kept = stats.filter { s =>
      val mayHoldNull = s.nulls match {
        case Some(n) => n > 0L
        case None => s.fe.rows != 0L // unknown null count: assume possible
      }
      threshold match {
        case None => mayHoldNull // top-k all nulls: keep possible-null files
        case Some(t) =>
          val valueSurvives = s.env match {
            case Some(e) => !better(t, bestOf(e)).exists(_ > 0) // best >= T
            case None => s.nulls match {
              // no envelope: keep unless provably value-free
              case Some(n) => s.fe.rows < 0L || n < s.fe.rows
              case None => s.fe.rows != 0L
            }
          }
          if (nullsFirst) valueSurvives || mayHoldNull
          else valueSurvives // NULLS LAST: nulls dominated by the k bound
      }
    }.map(_.fe)

    // DERIVED top-k predicate: the bound proves >= k rows sort at-or-before
    // value T on the first key, so a row strictly past T cannot be in the
    // top-k — `key >= T` (DESC; ASC mirrors) is a SOUND data filter. Pushed
    // to the scan it buys what file pruning alone cannot: parquet ROW-GROUP
    // stats skip within the kept files (a 1 GB file whose tail row groups
    // are all past T reads only its head). Nulls: under NULLS FIRST null
    // rows may outrank T, so they are kept via OR IS NULL; under NULLS
    // LAST the k at-or-before-T rows dominate every null — dropping them
    // is sound. threshold None (bound met by nulls alone) keeps exactly
    // the possibly-null rows. Termination: data filters do NOT bail
    // re-entry (they feed the may/must lanes), so the fixed point is
    // finish()'s nothing-pruned guard — each firing strictly SHRINKS the
    // kept file set, and a pass that prunes nothing returns the plan
    // unchanged; the file count decreases monotonically to a floor.
    val derived: Expression = threshold match {
      case None => IsNull(key)
      case Some(t) =>
        val lit: Option[Literal] = t match {
          case bd: BigDecimal => key.dataType match {
            case ByteType if bd.isValidByte => Some(Literal(bd.toByteExact))
            case ShortType if bd.isValidShort => Some(Literal(bd.toShortExact))
            case IntegerType if bd.isValidInt => Some(Literal(bd.toIntExact))
            case LongType if bd.isValidLong => Some(Literal(bd.toLongExact))
            case DateType if bd.isValidInt =>
              Some(Literal(bd.toIntExact, DateType))
            case TimestampType if bd.isValidLong =>
              Some(Literal(bd.toLongExact, TimestampType))
            case TimestampNTZType if bd.isValidLong =>
              Some(Literal(bd.toLongExact, TimestampNTZType))
            case _ => None
          }
          case s: String if key.dataType == StringType =>
            Some(Literal(UTF8String.fromString(s), StringType))
          case _ => None
        }
        lit.map { l =>
          val cmpE: Expression =
            if (descending) GreaterThanOrEqual(key, l)
            else LessThanOrEqual(key, l)
          if (nullsFirst) Or(cmpE, IsNull(key)) else cmpE
        }.getOrElse(Literal.TrueLiteral)
    }

    finish(kept, derived)
  }
}

object TopKFilePrune {
  val confKey = "spark.graft.topkFilePrune"

  /** (kept, total) of the most recent pruning decision — a test seam. */
  val lastPrune = new java.util.concurrent.atomic.AtomicReference[(Int, Int)]((-1, -1))
}
