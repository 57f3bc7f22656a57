package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.{col, when}
import org.apache.spark.sql.graftbridge.{ColumnBridge, PlanBridge}
import org.apache.spark.sql.types.{IntegerType, NumericType}

/** Rewrites the SQL spelling of an as-of join —
  *
  * {{{
  *   SELECT ... FROM l [LEFT] JOIN LATERAL (
  *     SELECT r.payload... FROM r
  *     WHERE r.k = l.k AND ... AND r.ts <= l.ts
  *     ORDER BY r.ts DESC, r.tie DESC LIMIT 1
  *   ) m [ON true]
  * }}}
  *
  * — into [[graft.operators.AsOfJoin]]'s union + running-window plan.
  * Spark 4.1 decorrelates this shape into a BroadcastNestedLoopJoin on the
  * range predicate: every right row pairs with every distinct left
  * timestamp at-or-after it — O(|left ts| · |right|) work and a broadcast
  * of a fact-sized relation (see LateralProbeSpec). The rewrite computes
  * the same rows with ONE shuffle on the join key.
  *
  * The forward spelling (`r.ts >= l.ts ... ORDER BY r.ts ASC, tie DESC`)
  * rewrites to the forward as-of direction the same way.
  *
  * The rule is surgical: it fires only on the exact shape above — limit 1,
  * a sort on the range column pointing toward the left row with exactly one
  * deterministic descending tie-break, one range conjunct on outer
  * attributes, equi-conjuncts on outer attributes, and no other outer
  * references. Payload projections may be rename-only OR deterministic
  * computations over right columns (`SELECT r.v * 2` — evaluated on the
  * right side before the join, same values). Anything else is left for
  * Spark's own lateral decorrelation — but a subquery that matched the
  * limit-1-over-sort-over-correlated-filter silhouette and was disqualified
  * by ONE detail logs a warning naming that detail (and records it in
  * [[AsOfLateralRewrite.lastMiss]]), because the fallback is the
  * pair-explosion plan this rule exists to avoid. It runs post-hoc in the
  * analyzer — before `PullupCorrelatedPredicates` destroys the LateralJoin
  * node.
  */
object AsOfLateralRewrite {
  /** Most recent near-miss disqualifier (observability + LateralProbeSpec);
    * null when the last lateral either rewrote or wasn't an as-of shape. */
  val lastMiss = new java.util.concurrent.atomic.AtomicReference[String](null)

  /** Hot-key hardening: when set to a positive long, rewritten laterals plan
    * [[graft.operators.AsOfJoin.asOfSkewed]] with this bucket width (same
    * unit as the range column) instead of the plain key-partitioned window —
    * a key holding a pathological share of the table (NULL/default IP,
    * heartbeat) then spreads over range/bucketWidth tasks instead of
    * serializing through one. Requires a numeric range column and tie-break
    * (the bucket arithmetic needs longs); non-numeric shapes fall back to
    * the plain plan with a log line. Default 0 = off: the stitch pays ~1.8x
    * at uniform toy scale and only wins under real skew. */
  val skewWidthKey = "spark.graft.asofSkewBucketWidth"
}

case class AsOfLateralRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  /** Runtime kill-switch (default on): lets operators compare against
    * Spark's native decorrelation, and LateralProbeSpec document it. */
  val confKey = "spark.graft.asofLateralRewrite"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!plan.resolved) return plan
    if (!spark.conf.get(confKey, "true").toBoolean) return plan
    plan.transformUp {
      case lj: LateralJoin if eligible(lj) =>
        tryRewrite(lj).getOrElse(lj)
    }
  }

  private def eligible(lj: LateralJoin): Boolean =
    (lj.joinType == LeftOuter || lj.joinType == Inner) &&
      (lj.condition.isEmpty || lj.condition.contains(Literal.TrueLiteral)) &&
      lj.resolved

  /** Strip SubqueryAlias and attribute-only Projects, remembering the
    * outermost attribute set (the subquery's visible output). */
  private def stripAliases(p: LogicalPlan): LogicalPlan = p match {
    case SubqueryAlias(_, c) => stripAliases(c)
    case other => other
  }

  /** Walk Project/SubqueryAlias layers down to a Filter, collecting each
    * project's exprId→expression map top→bottom. Computed entries are
    * allowed — the analyzer itself plants a computing Project below the
    * Sort when the SELECT list doesn't carry the sort columns — and their
    * eligibility is checked where the resolved expressions are used.
    * None = no correlated filter under the sort (silent fall-through). */
  private def downToFilter(p: LogicalPlan,
      maps: List[Map[ExprId, Expression]] = Nil)
      : Option[(Filter, List[Map[ExprId, Expression]])] = p match {
    case f: Filter => Some((f, maps))
    case SubqueryAlias(_, c) => downToFilter(c, maps)
    case Project(projList, c) => downToFilter(c, maps :+ exprMap(projList))
    case _ => None
  }

  /** Output exprId → defining expression for ANY project list (computed
    * entries allowed — payload eligibility is checked at the use site). */
  private def exprMap(list: Seq[NamedExpression]): Map[ExprId, Expression] =
    list.map {
      case a: AttributeReference => a.exprId -> (a: Expression)
      case al: Alias => al.exprId -> al.child
      case other => other.exprId -> (other: Expression)
    }.toMap

  /** Substitute attributes through expression layers down to filter level. */
  private def resolveExpr(e: Expression,
      maps: List[Map[ExprId, Expression]]): Expression =
    maps.foldLeft(e)((cur, m) => cur.transform {
      case a: AttributeReference if m.contains(a.exprId) => m(a.exprId)
    })

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  private def tryRewrite(lj: LateralJoin): Option[LogicalPlan] = {
    AsOfLateralRewrite.lastMiss.set(null)
    /** A subquery that matched the as-of silhouette but is disqualified by
      * one detail: be LOUD — the fallback is the pair-explosion plan. */
    def miss(reason: String): Option[LogicalPlan] = {
      AsOfLateralRewrite.lastMiss.set(reason)
      logWarning("graft: lateral subquery matches the as-of silhouette but " +
        s"was disqualified — $reason. Falling back to Spark's decorrelation " +
        "(BroadcastNestedLoopJoin pair explosion); adjust the subquery to " +
        "the exact as-of shape to get the union+window plan.")
      None
    }
    val sub = lj.right.plan
    val payloadAttrs = sub.output // the lateral's visible columns

    // ---- match: GlobalLimit 1 over a global Sort over a Filter ----------
    // Projects may sit above the Sort (renames or computed payloads) and
    // rename-only ones below it; their maps resolve subquery-output and
    // sort attributes to filter-level ones
    type ELayers = List[Map[ExprId, Expression]]
    val (topMaps: ELayers, sortOrders: Seq[SortOrder], inner: LogicalPlan) =
      stripAliases(sub) match {
        case GlobalLimit(Literal(1, IntegerType),
            LocalLimit(Literal(1, IntegerType), body)) =>
          stripAliases(body) match {
            case Project(projList, Sort(orders, true, in, _)) =>
              (List(exprMap(projList)), orders, in)
            case Sort(orders, true, in, _) => (Nil: ELayers, orders, in)
            case _ => return None
          }
        case _ => return None
      }
    val (theFilter, innerMaps) = downToFilter(inner)
      .getOrElse(return None) // no correlated filter: not an as-of try
    val Filter(cond, rightPlan) = theFilter
    val allMaps = topMaps ++ innerMaps
    if (!cond.exists(_.isInstanceOf[OuterReference]))
      return None // uncorrelated subquery: nothing as-of about it
    if (rightPlan.exists(_.expressions.exists(_.exists(_.isInstanceOf[OuterReference]))))
      return miss("correlation below the WHERE filter")

    // ---- split the condition: equi conjuncts + ONE range conjunct + an
    // optional tolerance bound (the merge_asof spelling) ------------------
    // r.ts <= l.ts = the backward direction (tolerance: r.ts >= l.ts - T),
    // r.ts >= l.ts = forward               (tolerance: r.ts <= l.ts + T)
    var equi = Vector.empty[(Attribute, Attribute)] // (left outer, right)
    var range: Option[(Attribute, Attribute, String)] = None // (lts, rts, dir)
    var tolB: Option[(Attribute, Attribute, Long)] = None // backward bound
    var tolF: Option[(Attribute, Attribute, Long)] = None // forward bound
    var localPreds = Vector.empty[Expression] // right-only extra conjuncts
    import graft.operators.AsOfJoin.{Backward, Forward}
    def longOf(v: Any): Option[Long] = v match {
      case i: Int => Some(i.toLong)
      case l: Long => Some(l)
      case s: Short => Some(s.toLong)
      case _ => None
    }
    // integral literal, possibly behind the type-coercion Cast the analyzer
    // inserts (e.g. `l.ts - 4` arrives as Subtract(ts, cast(4 as bigint)))
    object LitLong {
      def unapply(e: Expression): Option[Long] = e match {
        case Literal(v, _) => longOf(v)
        case Cast(Literal(v, _), _, _, _) => longOf(v)
        case _ => None
      }
    }
    splitConjuncts(cond).foreach {
      case EqualTo(r: AttributeReference, OuterReference(l: AttributeReference)) =>
        equi :+= (l, r)
      case EqualTo(OuterReference(l: AttributeReference), r: AttributeReference) =>
        equi :+= (l, r)
      case LessThanOrEqual(r: AttributeReference, OuterReference(l: AttributeReference))
          if range.isEmpty => range = Some((l, r, Backward))
      case GreaterThanOrEqual(OuterReference(l: AttributeReference), r: AttributeReference)
          if range.isEmpty => range = Some((l, r, Backward))
      case GreaterThanOrEqual(r: AttributeReference, OuterReference(l: AttributeReference))
          if range.isEmpty => range = Some((l, r, Forward))
      case LessThanOrEqual(OuterReference(l: AttributeReference), r: AttributeReference)
          if range.isEmpty => range = Some((l, r, Forward))
      case GreaterThanOrEqual(r: AttributeReference,
          Subtract(OuterReference(l: AttributeReference), LitLong(t), _))
          if tolB.isEmpty =>
        tolB = Some((l, r, t))
      case LessThanOrEqual(
          Subtract(OuterReference(l: AttributeReference), LitLong(t), _),
          r: AttributeReference)
          if tolB.isEmpty =>
        tolB = Some((l, r, t))
      case LessThanOrEqual(r: AttributeReference,
          Add(OuterReference(l: AttributeReference), LitLong(t), _))
          if tolF.isEmpty =>
        tolF = Some((l, r, t))
      case GreaterThanOrEqual(
          Add(OuterReference(l: AttributeReference), LitLong(t), _),
          r: AttributeReference)
          if tolF.isEmpty =>
        tolF = Some((l, r, t))
      case other if !other.exists(x => x.isInstanceOf[OuterReference] ||
            x.isInstanceOf[SubqueryExpression]) &&
          other.deterministic &&
          other.references.subsetOf(rightPlan.outputSet) =>
        // a right-only predicate (r.flag = 1): pre-filter the right side —
        // identical to evaluating it inside the subquery. Nested subquery
        // expressions are excluded: replaying an analyzed subquery plan
        // through the Dataset API mid-analysis is not safe
        localPreds :+= other
      case other => return miss(s"unsupported correlated conjunct: $other")
    }
    if (equi.isEmpty)
      return miss("no equi-join conjunct on an outer attribute")

    // ---- sort: either the range column toward the left row (DESC for
    // backward, ASC for forward), or — with NO range conjunct — the
    // NEAREST spelling `abs(r.ts - l.ts) ASC`; then exactly one DESC
    // tie-break (no tie-break would make LIMIT 1 nondeterministic)
    if (sortOrders.size != 2)
      return miss(if (sortOrders.size < 2)
        "missing tie-break (ORDER BY needs the range column plus one DESC tie-break)"
      else "more than one tie-break in the ORDER BY")
    if (sortOrders(1).direction != Descending)
      return miss("the tie-break must sort DESC (highest wins)")
    val headExpr = sortOrders.head.child match {
      case a: AttributeReference => resolveExpr(a, innerMaps)
      case other => resolveExpr(other, innerMaps)
    }
    val (lts: Attribute, rts: Attribute, direction: String) = range match {
      case Some((l, r, dir)) =>
        val wantDir = if (dir == Backward) Descending else Ascending
        val headOk = headExpr match {
          case ra: AttributeReference => ra.exprId == r.exprId
          case _ => false
        }
        if (sortOrders.head.direction != wantDir || !headOk)
          return miss("ORDER BY must sort the range column toward the left " +
            "row with one descending tie-break")
        (l, r, dir)
      case None =>
        // nearest: ORDER BY abs(r.ts - l.ts) ASC (either operand order)
        val head = headExpr match {
          case Abs(Subtract(r: AttributeReference,
              OuterReference(l: AttributeReference), _), _) => Some((l, r))
          case Abs(Subtract(OuterReference(l: AttributeReference),
              r: AttributeReference, _), _) => Some((l, r))
          case _ => None
        }
        head match {
          case Some((l, r)) if sortOrders.head.direction == Ascending &&
              rightPlan.outputSet.contains(r) =>
            (l, r, graft.operators.AsOfJoin.Nearest)
          case _ => return miss("no range conjunct and the sort head is not " +
            "abs(r.ts - l.ts) ASC — neither a directional nor a nearest as-of")
        }
    }
    // the tolerance bound(s) must pair with the shape: one bound matching
    // the directional range, or a symmetric pair (or none) for nearest
    val tolerance: Option[Long] = (direction, tolB, tolF) match {
      case (_, None, None) => None
      case (Backward, Some((l, r, t)), None)
          if l.exprId == lts.exprId && r.exprId == rts.exprId => Some(t)
      case (Forward, None, Some((l, r, t)))
          if l.exprId == lts.exprId && r.exprId == rts.exprId => Some(t)
      case (graft.operators.AsOfJoin.Nearest,
            Some((lb, rb, tb)), Some((lf, rf, tf)))
          if lb.exprId == lts.exprId && rb.exprId == rts.exprId &&
            lf.exprId == lts.exprId && rf.exprId == rts.exprId && tb == tf =>
        Some(tb)
      case _ =>
        return miss("tolerance bound does not pair with the range conjunct")
    }
    // no outer references anywhere else in the subquery
    val outerUsed = (equi.map(_._1) :+ lts).map(_.exprId).toSet ++
      (tolB.toSeq ++ tolF.toSeq).map(_._1.exprId)
    val outerDeclared = lj.right.outerAttrs.collect {
      case a: AttributeReference => a.exprId
    }.toSet
    if (outerDeclared != outerUsed)
      return miss("outer columns referenced beyond the equi keys and range column")
    val tie = sortOrders(1).child match {
      case a: AttributeReference => resolveExpr(a, innerMaps)
      case _ => return miss("tie-break is not a plain sort column")
    }
    if (!tie.deterministic || !tie.references.subsetOf(rightPlan.outputSet) ||
        tie.exists(x => x.isInstanceOf[OuterReference] ||
          x.isInstanceOf[SubqueryExpression]))
      return miss("tie-break is not computable from right-side columns")

    // payload must resolve (through the projection layers) to deterministic
    // expressions over right attributes — plain renames or computations
    val payloadUnder = payloadAttrs.map(a => resolveExpr(a, allMaps))
    val payloadOk = payloadUnder.forall { e =>
      e.deterministic && e.references.subsetOf(rightPlan.outputSet) &&
        !e.exists(x => x.isInstanceOf[OuterReference] ||
          x.isInstanceOf[SubqueryExpression])
    }
    if (!payloadOk)
      return miss("payload not computable deterministically from right columns")

    // ---- build the replacement with the Dataset API ----------------------
    var l2 = PlanBridge.dataFrame(spark, lj.left)
    var r2 = PlanBridge.dataFrame(spark, rightPlan)
    localPreds.foreach(p => r2 = r2.filter(ColumnBridge.column(p)))
    val reserved = (0 until equi.size).map(i => s"__asof_k$i") ++
      (0 until payloadUnder.size).map(i => s"__asof_p$i") ++
      Seq("__asof_ts", "__asof_tie", "asof", "__side", "__rp")
    if ((l2.columns ++ r2.columns).exists(reserved.contains))
      return miss("reserved __asof_* column names present in the tables")
    equi.zipWithIndex.foreach { case ((la, ra), i) =>
      l2 = l2.withColumn(s"__asof_k$i", ColumnBridge.column(la))
      r2 = r2.withColumn(s"__asof_k$i", ColumnBridge.column(ra))
    }
    l2 = l2.withColumn("__asof_ts", ColumnBridge.column(lts))
    r2 = r2.withColumn("__asof_ts", ColumnBridge.column(rts))
      .withColumn("__asof_tie", ColumnBridge.column(tie))
    // payloads travel under collision-free synthetic names
    payloadUnder.zipWithIndex.foreach { case (pa, i) =>
      r2 = r2.withColumn(s"__asof_p$i", ColumnBridge.column(pa))
    }

    // The lateral SQL's correlated predicates (r.k = l.k, r.ts <= l.ts) are
    // null-REJECTING, but AsOfJoin's window plan is not: partitionBy groups
    // NULL keys together, and the running scan would let NULL-ts rows
    // participate in the ordering. Restore SQL semantics exactly:
    //  - a right row with a NULL key or NULL range value can never satisfy
    //    the predicates -> drop it before the join;
    //  - a left row with a NULL key then sits in a partition with no rights
    //    (no match, as SQL), and a left row with a NULL range value matches
    //    nothing -> null its asof after the join (the forward window's
    //    nulls-last desc sort would otherwise hand it the earliest right).
    // NULL tie-break values are NOT filtered: SQL keeps such rows and they
    // merely lose the ordering, identically in both plans (ORDER BY tie
    // DESC is nulls-last natively; the running-last here takes the highest
    // tie with asc_nulls_first).
    r2 = r2.filter(
      ((0 until equi.size).map(i => col(s"__asof_k$i")) :+ col("__asof_ts"))
        .map(_.isNotNull).reduce(_ && _))

    // hot-key dispatch: a positive bucket width plans the skew-hardened
    // stitched scan (row-identical to asOf — AsOfSkewSpec/LateralProbeSpec)
    // when the bucket arithmetic is expressible, i.e. numeric ts + tie
    val skewWidth = spark.conf.get(AsOfLateralRewrite.skewWidthKey, "0").toLong
    val numericTs = Seq(r2.schema("__asof_ts"), r2.schema("__asof_tie"))
      .forall(_.dataType.isInstanceOf[NumericType])
    if (skewWidth > 0 && !numericTs)
      logWarning(s"graft: ${AsOfLateralRewrite.skewWidthKey}=$skewWidth set " +
        "but the range/tie columns are not numeric — planning the plain " +
        "key-partitioned as-of window instead of the skew-hardened scan")
    val asOfKeys = (0 until equi.size).map(i => s"__asof_k$i")
    val asOfPayload = (0 until payloadUnder.size).map(i => s"__asof_p$i")
    // SQL's abs ordering resolves an equal-distance tie by the tie
    // column across BOTH directions, not by preferring backward
    val joined = (if (skewWidth > 0 && numericTs)
      graft.operators.AsOfJoin.asOfSkewed(
        l2, r2, keys = asOfKeys, tsCol = "__asof_ts", tieCol = "__asof_tie",
        payload = asOfPayload, bucketWidth = skewWidth,
        tolerance = tolerance, direction = direction,
        nearestTie = graft.operators.AsOfJoin.TieHighest)
    else graft.operators.AsOfJoin.asOf(
      l2, r2, keys = asOfKeys, tsCol = "__asof_ts", tieCol = "__asof_tie",
      payload = asOfPayload, tolerance = tolerance, direction = direction,
      nearestTie = graft.operators.AsOfJoin.TieHighest))
      .withColumn("asof", when(col("__asof_ts").isNotNull, col("asof")))
    val filtered =
      if (lj.joinType == Inner) joined.filter(col("asof").isNotNull) else joined
    val projected = filtered.select(
      lj.left.output.map(a => ColumnBridge.column(a)) ++
        payloadUnder.indices.map(i => col(s"asof.__asof_p$i")): _*)

    // re-alias to the original output attribute ids so parents resolve
    val newPlan = PlanBridge.plan(projected)
    val aliased = lj.output.zip(newPlan.output).map { case (orig, now) =>
      Alias(now, orig.name)(exprId = orig.exprId)
    }
    logInfo(s"graft: rewrote lateral $direction as-of join on " +
      s"${equi.map(_._2.name).mkString(",")} / ${rts.name}" +
      (if (skewWidth > 0 && numericTs) s" (skew-hardened, bucket=$skewWidth)"
       else ""))
    Some(Project(aliased, newPlan))
  }
}
