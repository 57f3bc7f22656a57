package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.{ColumnBridge, PlanBridge}
import org.apache.spark.sql.types.IntegerType

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
  * The rule is surgical: it fires only on the exact shape above — limit 1,
  * a descending sort on the range column with at least one deterministic
  * descending tie-break, one `<=` range conjunct on outer attributes,
  * equi-conjuncts on outer attributes, attribute-only projections in
  * between, and no other outer references. Anything else is left for
  * Spark's own lateral decorrelation. It runs post-hoc in the analyzer —
  * before `PullupCorrelatedPredicates` destroys the LateralJoin node.
  */
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

  /** Walk Project(attrs-only)/SubqueryAlias layers down to a Filter. */
  private def downToFilter(p: LogicalPlan): Option[Filter] = p match {
    case f: Filter => Some(f)
    case SubqueryAlias(_, c) => downToFilter(c)
    case Project(projList, c) if projList.forall(_.isInstanceOf[AttributeReference]) =>
      downToFilter(c)
    case _ => None
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  private def tryRewrite(lj: LateralJoin): Option[LogicalPlan] = {
    val sub = lj.right.plan
    val payloadAttrs = sub.output // the lateral's visible columns

    // ---- match: GlobalLimit 1 over a global Sort over a Filter ----------
    val (sortOrders: Seq[SortOrder], filter: Option[Filter]) =
      stripAliases(sub) match {
        case GlobalLimit(Literal(1, IntegerType),
            LocalLimit(Literal(1, IntegerType), body)) =>
          stripAliases(body) match {
            case Project(projList, Sort(orders, true, inner, _))
                if projList.forall(_.isInstanceOf[AttributeReference]) =>
              (orders, downToFilter(inner))
            case Sort(orders, true, inner, _) => (orders, downToFilter(inner))
            case _ => return None
          }
        case _ => return None
      }
    val Filter(cond, rightPlan) = filter.getOrElse(return None)
    if (rightPlan.exists(_.expressions.exists(_.exists(_.isInstanceOf[OuterReference]))))
      return None // correlation below the filter — not our shape

    // ---- split the condition: equi conjuncts + ONE <= range conjunct ----
    var equi = Vector.empty[(Attribute, Attribute)] // (left outer, right)
    var range: Option[(Attribute, Attribute)] = None // (left ts, right ts)
    splitConjuncts(cond).foreach {
      case EqualTo(r: AttributeReference, OuterReference(l: AttributeReference)) =>
        equi :+= (l, r)
      case EqualTo(OuterReference(l: AttributeReference), r: AttributeReference) =>
        equi :+= (l, r)
      case LessThanOrEqual(r: AttributeReference, OuterReference(l: AttributeReference))
          if range.isEmpty => range = Some((l, r))
      case GreaterThanOrEqual(OuterReference(l: AttributeReference), r: AttributeReference)
          if range.isEmpty => range = Some((l, r))
      case _ => return None
    }
    val (lts, rts) = range.getOrElse(return None)
    if (equi.isEmpty) return None
    // no outer references anywhere else in the subquery
    val outerUsed = (equi.map(_._1) :+ lts).map(_.exprId).toSet
    val outerDeclared = lj.right.outerAttrs.collect {
      case a: AttributeReference => a.exprId
    }.toSet
    if (outerDeclared != outerUsed) return None

    // ---- sort: range col DESC, then exactly one DESC tie-break ----------
    // (no tie-break would make LIMIT 1 nondeterministic; AsOfJoin carries
    // one tie column)
    if (sortOrders.size != 2) return None
    val tieOk = (sortOrders.head, sortOrders(1)) match {
      case (SortOrder(first: AttributeReference, Descending, _, _),
            SortOrder(_: AttributeReference, Descending, _, _)) =>
        first.exprId == rts.exprId
      case _ => false
    }
    if (!tieOk) return None
    val tie = sortOrders(1).child.asInstanceOf[AttributeReference]

    // payload must be right-side attributes
    if (!payloadAttrs.forall(a => rightPlan.outputSet.contains(a))) return None

    // ---- build the replacement with the Dataset API ----------------------
    var l2 = PlanBridge.dataFrame(spark, lj.left)
    var r2 = PlanBridge.dataFrame(spark, rightPlan)
    val reserved = (0 until equi.size).map(i => s"__asof_k$i") ++
      Seq("__asof_ts", "__asof_tie", "asof", "__side", "__rp")
    if ((l2.columns ++ r2.columns).exists(reserved.contains)) return None
    equi.zipWithIndex.foreach { case ((la, ra), i) =>
      l2 = l2.withColumn(s"__asof_k$i", ColumnBridge.column(la))
      r2 = r2.withColumn(s"__asof_k$i", ColumnBridge.column(ra))
    }
    l2 = l2.withColumn("__asof_ts", ColumnBridge.column(lts))
    r2 = r2.withColumn("__asof_ts", ColumnBridge.column(rts))
      .withColumn("__asof_tie", ColumnBridge.column(tie))
    // unique payload names required for struct-field extraction
    if (r2.select(payloadAttrs.map(ColumnBridge.column): _*)
        .columns.distinct.length != payloadAttrs.length) return None

    val joined = graft.operators.AsOfJoin.asOf(
      l2, r2, keys = (0 until equi.size).map(i => s"__asof_k$i"),
      tsCol = "__asof_ts", tieCol = "__asof_tie",
      payload = payloadAttrs.map(_.name))
    val filtered =
      if (lj.joinType == Inner) joined.filter(col("asof").isNotNull) else joined
    val projected = filtered.select(
      lj.left.output.map(a => ColumnBridge.column(a)) ++
        payloadAttrs.map(a => col(s"asof.${a.name}")): _*)

    // re-alias to the original output attribute ids so parents resolve
    val newPlan = PlanBridge.plan(projected)
    val aliased = lj.output.zip(newPlan.output).map { case (orig, now) =>
      Alias(now, orig.name)(exprId = orig.exprId)
    }
    logInfo(s"graft: rewrote lateral as-of join on " +
      s"${equi.map(_._2.name).mkString(",")} / ${rts.name}")
    Some(Project(aliased, newPlan))
  }
}
