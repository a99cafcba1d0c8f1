package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the keep-first/keep-latest WINDOW spelling
  *
  *   SELECT ... FROM (SELECT *, row_number() OVER
  *     (PARTITION BY k ORDER BY o) AS rn FROM t) WHERE rn = 1
  *
  * into the map-side-combinable aggregation this engine's operators use
  * by hand (`Dedup.latestSnapshot` q93, `scrubRepeatedSpans` q333):
  *
  *   SELECT k, w.o, w.rest..., 1 AS rn
  *   FROM (SELECT k, min(struct(o, rest...)) AS w FROM t GROUP BY k)
  *
  * WHY: the window spelling is the single most common scale hazard in
  * dedup/survivorship pipelines — its sort-exchange partitions by the
  * key, so one task sorts a hot key's ENTIRE duplicate cluster (a
  * boilerplate fingerprint repeated 10⁹ times at 100 TB serializes
  * through one sort), and no partial aggregation happens map-side. The
  * aggregate spelling reduces each map partition to one candidate row
  * per key before the shuffle and leaves AQE free to split stragglers.
  *
  * FIRES only when the rewrite is provably semantics-preserving:
  *  - exactly ONE window expression: row_number() (any frame —
  *    row_number ignores it) aliased to the rank column;
  *  - some conjunct of the filter keeps exactly rank 1: `rn = 1`,
  *    `1 = rn`, `rn <= 1`, or `rn < 2` (row_number ≥ 1 makes these
  *    equivalent); remaining conjuncts must not reference the rank and
  *    stay as a post-filter ABOVE the aggregate (they cannot be pushed
  *    below it — the winner is chosen among ALL rows, then filtered,
  *    exactly like the window spelling; Catalyst can't push them either
  *    since every output column derives from the aggregate result);
  *  - partition keys are deterministic expressions (CollapseProject
  *    inlines computed keys into the window spec);
  *  - order keys are deterministic NON-NULLABLE expressions (struct
  *    comparison and window sort agree trivially then — no
  *    null-ordering semantics to match);
  *  - order directions are all-ascending (→ min) or all-descending
  *    (→ max), never mixed.
  * Under order-key ties the window's pick is nondeterministic; the
  * rewrite refines it to the lexicographic extreme over the remaining
  * columns — a legal refinement of an unspecified choice (pipelines
  * wanting determinism already carry a unique tie-break, which makes
  * the two spellings identical).
  *
  * Deployment: injected by [[GraftExtensions]]
  * (`spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`)
  * — opt-in at session build, so the oracle-gated suite's hand-tuned
  * plans are not silently rewritten underneath their PLANS.md audits.
  * Output attributes keep their ExprIds, so downstream references and
  * the schema are untouched.
  */
object RankToMinStruct extends Rule[LogicalPlan] {

  private def keepsRankOne(cond: Expression, rank: ExprId): Boolean = {
    def isRank(e: Expression) = e match {
      case a: Attribute => a.exprId == rank
      case _ => false
    }
    def lit(e: Expression, v: Int) = e match {
      case Literal(x: Int, IntegerType) => x == v
      case _ => false
    }
    cond match {
      case EqualTo(l, r) => (isRank(l) && lit(r, 1)) || (lit(l, 1) && isRank(r))
      case LessThanOrEqual(l, r) => isRank(l) && lit(r, 1)
      case GreaterThanOrEqual(l, r) => lit(l, 1) && isRank(r)
      case LessThan(l, r) => isRank(l) && lit(r, 2)
      case GreaterThan(l, r) => lit(l, 2) && isRank(r)
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) if rankAliasOf(w).isDefined =>
      val rank = rankAliasOf(w).get
      // the rank-1 conjunct may ride with other predicates (WHERE rn = 1
      // AND x > 5): peel it off, rewrite the window, keep the rest as a
      // post-filter — as long as the rest never references the rank
      // column (it would see the literal 1, but don't reason about it)
      val conjuncts = splitAnd(cond)
      val (rankConj, rest) =
        conjuncts.partition(keepsRankOne(_, rank.exprId))
      if (rankConj.nonEmpty &&
          rest.forall(!_.references.exists(_.exprId == rank.exprId)) &&
          eligible(w)) {
        val rewritten = rewrite(w)
        if (rest.isEmpty) rewritten
        else Filter(rest.reduce(And), rewritten)
      } else f
  }

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case other => Seq(other)
  }

  private def rankAliasOf(w: Window): Option[Alias] =
    w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(_: RowNumber, _), _)) => Some(a)
      case _ => None
    }

  private def eligible(w: Window): Boolean =
    w.windowExpressions match {
      case Seq(Alias(WindowExpression(_: RowNumber, _), _)) =>
          // a GLOBAL window (no PARTITION BY) would rewrite to a
          // grouping-less Aggregate, which emits one all-NULL row on
          // EMPTY input where the window emits zero rows — never fire
          w.partitionSpec.nonEmpty &&
          // partition keys may be arbitrary deterministic expressions
          // (CollapseProject routinely inlines a computed key into the
          // window spec) — grouping evaluates them identically
          w.partitionSpec.forall(_.deterministic) &&
          // every struct field (order keys + full payload) must be an
          // ORDERABLE type: Min/Max over a struct containing e.g. a
          // MapType would pass analysis (this rule runs post-analysis)
          // and crash at physical planning — a regression vs the stock
          // session, where row_number never orders payload columns
          (w.orderSpec.map(_.child) ++ w.child.output)
            .forall(e => RowOrdering.isOrderable(e.dataType)) &&
          w.orderSpec.nonEmpty &&
          // order keys: any deterministic NON-NULLABLE expression over
          // the child (CollapseProject inlines computed sort keys too);
          // non-nullable ⇒ no null-ordering semantics to reconcile
          // between the window sort and the struct comparison
          w.orderSpec.forall(so => so.child.deterministic &&
            !so.child.nullable &&
            so.child.references.subsetOf(w.child.outputSet)) &&
          (w.orderSpec.forall(_.direction == Ascending) ||
            w.orderSpec.forall(_.direction == Descending))
      case _ => false
    }

  private def rewrite(w: Window): LogicalPlan = {
    val rankAlias = w.windowExpressions.head.asInstanceOf[Alias]
    val orderKeys: Seq[Expression] = w.orderSpec.map(_.child)
    // struct layout: order keys first (they decide the winner), then
    // EVERY child column — partition-constant columns ride along, and a
    // column that doubles as an order key appears twice (a few bytes of
    // struct width for a much simpler attribute mapping) — the q93
    // whole-row device
    val structFields: Seq[Expression] = orderKeys ++ w.child.output
    val structExpr = CreateStruct(structFields)
    val aggFn =
      if (w.orderSpec.head.direction == Ascending) Min(structExpr)
      else Max(structExpr)
    val winner = Alias(
      AggregateExpression(aggFn, Complete, isDistinct = false),
      "__graft_keep_first")()
    // InferWindowGroupLimit may already have slid a per-partition top-1
    // pre-filter under the Window; the aggregate subsumes that selection,
    // so aggregate the original input (an orphan WindowGroupLimit has no
    // physical planning outside a Window pipeline)
    val base = w.child match {
      case wgl: WindowGroupLimit => wgl.child
      case c => c
    }
    val agg = Aggregate(w.partitionSpec, Seq(winner), base)
    val wRef = winner.toAttribute
    // Min's declared result type is nullable, so a bare GetStructField
    // would WIDEN the nullability of attributes parents already resolved
    // as non-nullable (enabling null-intolerant simplifications upstream
    // on stale metadata). Groups are non-empty (partitionSpec.nonEmpty is
    // guarded), so the winner struct is never NULL per row: restore the
    // original nullability with KnownNotNull where the source attribute
    // was non-nullable.
    val out = w.child.output.zipWithIndex.map { case (a, i) =>
      val field: Expression =
        GetStructField(wRef, orderKeys.length + i, Some(a.name))
      val typed = if (a.nullable) field else KnownNotNull(field)
      Alias(typed, a.name)(exprId = a.exprId)
    } :+ Alias(Literal(1), rankAlias.name)(exprId = rankAlias.exprId)
    Project(out, agg)
  }
}
