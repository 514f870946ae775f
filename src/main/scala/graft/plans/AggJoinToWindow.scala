package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Window-join optimization pass: rewrites the self-join-with-aggregate
  * shape
  *
  *   child ⋈_{k…} Aggregate(groupBy k… agg …)(child)
  *
  * into a single pass
  *
  *   Project(Window(agg… OVER (PARTITION BY k…), Filter(k… IS NOT NULL, child)))
  *
  * eliminating the second scan of `child` and the join. The `IS NOT
  * NULL` filter reproduces the inner equi-join's drop of NULL-key rows
  * (a window partition would otherwise keep them).
  *
  * Scale trade-off, and why this is OPT-IN (`spark.graft.aggJoinToWindow
  * .enabled`, default false): when the aggregate output is small enough
  * to broadcast, the original plan is scan×2 + tiny shuffle + broadcast
  * join — usually cheaper than this rewrite's full shuffle + sort. But
  * when the group-key cardinality is large (the sort-merge regime), the
  * original pays scan×2 + TWO full exchanges + sorts + join, while the
  * rewrite pays scan×1 + ONE exchange + sort. Enable it per-session for
  * high-cardinality enrichment joins (frequency/target encoding over
  * billions of keys); leave it off for dimension-sized aggregates.
  *
  * Fires only when the rewrite is provably equivalent:
  *  - inner equi-join whose condition is exactly the full grouping key
  *    list, each side-by-side with its positional twin on the left;
  *  - both sides canonically the same subtree (attribute-only Projects
  *    stripped — the optimizer's column pruning decorates the two scans
  *    differently);
  *  - aggregates are non-distinct, unfiltered Sum/Count/Min/Max/Average
  *    (the functions with identical window semantics).
  */
object AggJoinToWindow extends Rule[LogicalPlan] with PredicateHelper {
  val ConfKey = "spark.graft.aggJoinToWindow.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "false").toBoolean) return plan
    plan.transformUp {
      case j @ Join(left, agg: Aggregate, Inner, Some(cond), _) =>
        rewrite(j, left, agg, cond).getOrElse(j)
    }
  }

  /** Peel attribute-only Projects (column pruning artifacts); they keep
    * exprIds, so everything above still resolves against the core.
    */
  @annotation.tailrec
  private def stripAttrProject(p: LogicalPlan): LogicalPlan = p match {
    case Project(list, child) if list.forall(_.isInstanceOf[Attribute]) =>
      stripAttrProject(child)
    case other => other
  }

  private def supported(fn: AggregateFunction): Boolean = fn match {
    case _: Sum | _: Count | _: Min | _: Max | _: Average => true
    // First/Last carry the usual "arbitrary pick absent ordering"
    // contract in BOTH plans (hash-agg merge order vs window row
    // order): the rewrite maps pick-nondeterminism to
    // pick-nondeterminism, which is only observable when the picked
    // column is not functionally dependent on the group key
    case _: First | _: Last => true
    case _ => false
  }

  private def exprValue(ne: NamedExpression): Expression = ne match {
    case Alias(c, _) => c
    case a: Attribute => a
    case other => other // GetStructField-style named wrappers: compare as-is
  }

  /** A subtree containing rand()/uuid()/monotonically_increasing_id()
    * can pass semanticEquals while the join plan evaluates it TWICE
    * (different draws per scan) and the rewrite once — Spark's own
    * rules guard collapse/pushdown on `deterministic` for exactly this.
    */
  private def allDeterministic(p: LogicalPlan): Boolean =
    !p.exists(_.expressions.exists(e => !e.deterministic))

  /** Match the agg-side subtree `r` against the left subtree `l` and
    * return a map from r's output exprIds to l's output attributes, or
    * None if the two sides aren't provably the same data. Base case:
    * canonically identical plans map positionally. Recursive case: two
    * Projects over aligned children match item-by-item via canonicalized
    * expression equality — this is what survives the optimizer pruning
    * the two scans to different column sets and leaving computed join
    * keys (Alias of CASE/arith) in non-attribute Projects. Every r item
    * must find an l item: the left side must carry at least the columns
    * the aggregate needs, since it becomes the single Window input.
    */
  private def align(l: LogicalPlan, r: LogicalPlan): Option[Map[ExprId, Attribute]] = {
    if (l.output.size == r.output.size && l.sameResult(r))
      return Some(r.output.zip(l.output).map { case (ra, la) => ra.exprId -> la }.toMap)
    (l, r) match {
      case (Project(ll, lc), Project(rl, rc)) =>
        align(stripAttrProject(lc), stripAttrProject(rc)).flatMap { m =>
          val pairs = rl.map { rne =>
            val remapped = exprValue(rne).transform {
              case a: Attribute => m.getOrElse(a.exprId, a)
            }
            ll.collectFirst {
              case lne if exprValue(lne).semanticEquals(remapped) =>
                rne.toAttribute.exprId -> lne.toAttribute
            }
          }
          if (pairs.forall(_.isDefined)) Some(pairs.flatten.toMap) else None
        }
      case _ => None
    }
  }

  private def rewrite(j: Join, left: LogicalPlan, agg: Aggregate,
                      cond: Expression): Option[LogicalPlan] = {
    if (!allDeterministic(left) || !allDeterministic(agg)) return None
    val core1 = stripAttrProject(left)
    val twin: Map[ExprId, Attribute] =
      align(core1, stripAttrProject(agg.child)) match {
        case Some(m) => m
        case None => return None
      }

    if (agg.groupingExpressions.isEmpty ||
        !agg.groupingExpressions.forall(_.isInstanceOf[Attribute])) return None
    val groupAttrs = agg.groupingExpressions.map(_.asInstanceOf[Attribute])
    if (!groupAttrs.forall(g => twin.contains(g.exprId))) return None

    // agg OUTPUT attr id -> the grouping attr it carries
    val outToGroup: Map[ExprId, Attribute] = agg.aggregateExpressions.collect {
      case a: Attribute if groupAttrs.exists(_.exprId == a.exprId) =>
        a.exprId -> groupAttrs.find(_.exprId == a.exprId).get
      case al @ Alias(a: Attribute, _) if groupAttrs.exists(_.exprId == a.exprId) =>
        al.exprId -> groupAttrs.find(_.exprId == a.exprId).get
    }.toMap

    // every conjunct must be leftTwin(g) = aggOutput(g); all keys covered
    val leftIds = left.outputSet.map(_.exprId).toSet
    val matched = splitConjunctivePredicates(cond).map {
      case EqualTo(l: Attribute, r: Attribute)
          if leftIds.contains(l.exprId) && outToGroup.contains(r.exprId) =>
        Some((l, outToGroup(r.exprId)))
      case EqualTo(l: Attribute, r: Attribute)
          if leftIds.contains(r.exprId) && outToGroup.contains(l.exprId) =>
        Some((r, outToGroup(l.exprId)))
      case _ => None
    }
    if (matched.exists(_.isEmpty)) return None
    val keyPairs = matched.flatten
    val twinned = keyPairs.forall { case (l, g) => twin(g.exprId).exprId == l.exprId }
    val covered = groupAttrs.forall(g => keyPairs.exists(_._2.exprId == g.exprId))
    if (!twinned || !covered) return None

    // each agg output must be an expression whose AggregateExpressions
    // are all supported (non-distinct, unfiltered, window-identical
    // semantics) and whose every reference maps to a left-side twin —
    // this covers Cast/arith wrappers like sum(x)::decimal::double
    val handleable = agg.aggregateExpressions.forall {
      case a: Attribute => outToGroup.contains(a.exprId)
      case al: Alias =>
        al.child.collect { case ae: AggregateExpression => ae }.forall(ae =>
          !ae.isDistinct && ae.filter.isEmpty && supported(ae.aggregateFunction)) &&
          al.child.references.forall(r => twin.contains(r.exprId))
      case _ => false
    }
    if (!handleable) return None

    val partitionKeys: Seq[Attribute] =
      groupAttrs.map(g => twin(g.exprId)).distinct
    val frame = SpecifiedWindowFrame(RowFrame, UnboundedPreceding, UnboundedFollowing)
    val spec = WindowSpecDefinition(partitionKeys, Nil, frame)

    // one window alias per distinct aggregate (like the analyzer's
    // ExtractWindowExpressions: Window computes the raw aggs, the final
    // Project computes any wrapping Cast/arithmetic on top)
    val winExprs = scala.collection.mutable.LinkedHashMap.empty[Expression, NamedExpression]
    def windowed(ae: AggregateExpression): Attribute = {
      val remapped = ae.transform { case a: Attribute => twin(a.exprId) }
        .asInstanceOf[AggregateExpression]
      winExprs.getOrElseUpdate(remapped.canonicalized,
        Alias(WindowExpression(remapped, spec), s"_w${winExprs.size}")()).toAttribute
    }
    val aggSide: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: Attribute =>
        Alias(twin(outToGroup(a.exprId).exprId), a.name)(exprId = a.exprId)
      case al: Alias =>
        val rebuilt = al.child.transformDown {
          case ae: AggregateExpression => windowed(ae)
          case a: Attribute => twin(a.exprId)
        }
        Alias(rebuilt, al.name)(exprId = al.exprId)
    }

    // inner equi-join drops NULL-key rows; a window partition keeps them
    val nullableKeys = partitionKeys.filter(_.nullable)
    val base =
      if (nullableKeys.isEmpty) core1
      else Filter(nullableKeys.map(IsNotNull).reduce(And), core1)
    val win = Window(winExprs.values.toSeq, partitionKeys, Nil, base)
    Some(Project(left.output ++ aggSide, win))
  }
}
