package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, Expression, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: the declarative top-k spelling
  * `row_number().over(partitionBy(keys).orderBy(o)).as("rk")` filtered on
  * `rk <= k` is rewritten to run the window over a [[TopKPerKey]] child —
  * the bounded-heap whole-plan operator — instead of over the full
  * table. The survivors of TopKPerKey are BY DEFINITION the rows whose
  * row_number under the same (keys, order) is ≤ k, so re-running the
  * window over just them attaches identical ranks and the filter keeps
  * passing every row; output schema (and the rank attribute's exprId)
  * are untouched, which is what makes the rewrite safe mid-plan.
  *
  * What it buys at scale: the window spelling must sort every map
  * partition (WindowGroupLimit's partial pass) and every reduce
  * partition (the rank itself) — O(n log n) per partition either side of
  * the exchange; the heap child is O(n log k) with no sort below the
  * exchange, and only the ≤ k·keys survivors are ever sorted
  * (TopKPerKey's scaladoc carries the measured adjudication). The
  * exchange volume is the same on Spark ≥ 3.5 (WindowGroupLimit already
  * prunes it); on anything older this rewrite is also the
  * shuffle-every-row fix.
  *
  * Guards: exactly one window expression and it is `row_number()` (rank
  * and dense_rank admit >k rows per key on ties — a heap of k is not
  * sound for them), a non-empty order, a literal bound ≥ 1 in one
  * conjunct of the filter, applied to the rank attribute, and the child
  * is not already a TopKPerKey (idempotence under the fixed-point
  * optimizer). As with the window spelling itself, a NON-total order
  * makes the kept rows tie-arbitrary; the rewrite neither fixes nor
  * worsens that.
  *
  * Register per-session via `spark.experimental.extraOptimizations` (the
  * [[TopKPerKey.installRewrite]] helper) or globally through
  * `graft.functions.GraftExtensions`. */
object TopKWindowRewrite extends Rule[LogicalPlan] {

  /** The TIGHTEST literal k bound on `rn` across the conjuncts of
    * `cond`: for `rn <= 5 AND rn <= 2` the heap must hold 2 per key,
    * not whichever conjunct happens first — the minimum is what bounds
    * the output, and sizing to it also lets the WindowGroupLimit strip
    * below fire (its `limit >= k` guard fails against a looser k). */
  private def rankBound(cond: Expression, rn: AttributeReference): Option[Int] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    conjuncts(cond).collect {
      case LessThanOrEqual(a: AttributeReference, IntegerLiteral(k))
        if a.exprId == rn.exprId => k
      case LessThan(a: AttributeReference, IntegerLiteral(k))
        if a.exprId == rn.exprId => k - 1
    }.minOption.filter(_ >= 1)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond,
        w @ Window(Seq(alias @ Alias(WindowExpression(RowNumber(), spec), _)),
          part, order, child, _))
        if order.nonEmpty && !child.isInstanceOf[TopKPerKey] &&
          spec.partitionSpec == part && spec.orderSpec == order =>
      rankBound(cond, alias.toAttribute.asInstanceOf[AttributeReference]) match {
        case Some(k) =>
          // Spark's own InsertWindowGroupLimit (main optimizer batch,
          // runs before user rules) may already have hung a logical
          // WindowGroupLimit under the Window; the heap subsumes its
          // pruning, so keeping both would sort AND heap every map
          // partition. Strip it when it carries the same spec.
          val base = child match {
            case WindowGroupLimit(p2, o2, _, limit, grandchild)
              if p2 == part && o2 == order && limit >= k => grandchild
            case other => other
          }
          f.copy(child = w.copy(child = TopKPerKey(part, order, k, base)))
        case None => f
      }
  }
}
