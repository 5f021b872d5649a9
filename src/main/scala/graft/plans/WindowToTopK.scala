// Lives under org.apache.spark.sql for catalyst internals, like TopKPerKey.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, PredicateHelper, RowNumber, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule (SURVEY.md §7.2 ladder, the `Rule[LogicalPlan]` rung):
  * rewrite the per-key rank-limit idiom
  *
  *   df.withColumn("rk", row_number().over(partitionBy(keys).orderBy(o)))
  *     .filter($"rk" <= k)  // or === 1, < k+1, …
  *     .drop("rk")
  *
  * into [[TopKPerKeyNode]] — the bounded-heap operator whose partial pass
  * cuts every map partition to ≤ keys × k rows BEFORE the exchange. The
  * window form must shuffle every row and SORT every key group to rank
  * rows it then discards; after this rewrite neither happens. The
  * latest-per-key special case (`row_number = 1` over `orderBy(seq
  * desc)`) is THE CDC compaction idiom — at 100 TB it compacts a
  * changelog without per-key sorts.
  *
  * Fires only when provably safe:
  *  - the Window computes exactly ONE expression and it is row_number();
  *  - the filter's rank conjunct is a constant upper bound (≤ k, < k+1,
  *    = 1, or the mirrored literal-first forms), k ≥ 1;
  *  - every other filter conjunct ignores the rank (they survive as a
  *    residual Filter ABOVE the top-k — equivalent, since they reference
  *    only the surviving rows' own columns);
  *  - the projection above DROPS the rank column (TopKPerKeyNode emits
  *    child output only — a query that returns the rank keeps its
  *    window, e.g. `text_bm25`).
  *
  * Tie semantics: with a non-total ordering, row_number picks an
  * arbitrary rank-k boundary and the heap picks an arbitrary k-subset —
  * the same nondeterminism class (Spark's own InferWindowGroupLimit
  * makes the identical call). If Spark already inserted a
  * WindowGroupLimit below the window, the heap subsumes it.
  *
  * Registered via `GraftExtensions` (injectOptimizerRule) or
  * `GraftExtensions.register` (experimental.extraOptimizations); the
  * companion TopKStrategy registration makes the node plannable.
  */
object WindowToTopK extends Rule[LogicalPlan] with PredicateHelper {

  /** The rank conjunct's implied k, if it is a recognized constant bound.
    * Long arithmetic: `rk < Int.MinValue` must stay an (always-false)
    * filter, not wrap around to a keep-everything top-k.
    */
  private def boundOf(pred: Expression, rank: Attribute): Option[Long] =
    pred match {
      case LessThanOrEqual(a: Attribute, Literal(v: Int, IntegerType))
        if a.semanticEquals(rank) => Some(v.toLong)
      case LessThan(a: Attribute, Literal(v: Int, IntegerType))
        if a.semanticEquals(rank) => Some(v.toLong - 1)
      case EqualTo(a: Attribute, Literal(v: Int, IntegerType))
        if a.semanticEquals(rank) && v == 1 => Some(1L)
      case EqualTo(Literal(v: Int, IntegerType), a: Attribute)
        if a.semanticEquals(rank) && v == 1 => Some(1L)
      case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: Attribute)
        if a.semanticEquals(rank) => Some(v.toLong)
      case GreaterThan(Literal(v: Int, IntegerType), a: Attribute)
        if a.semanticEquals(rank) => Some(v.toLong - 1)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(projList, Filter(cond,
        Window(Seq(al @ Alias(
          WindowExpression(RowNumber(), WindowSpecDefinition(_, _, _)), _)),
          partSpec, orderSpec, wchild, _)))
        // partSpec must be NON-empty: TopKPerKeyExec requires
        // ClusteredDistribution(keys), which Spark rejects for Nil — a
        // global top-k (empty partitionBy) keeps its window
        if orderSpec.nonEmpty && partSpec.nonEmpty =>
      val rank = al.toAttribute
      val (rankPreds, residual) =
        splitConjunctivePredicates(cond).partition(_.references.contains(rank))
      val k = rankPreds match {
        case Seq(one) => boundOf(one, rank)
        case _ => None
      }
      k.filter(v => v >= 1 && v <= Int.MaxValue) match {
        case Some(limit)
            if !projList.exists(_.references.contains(rank)) =>
          val inner = wchild match {
            case wgl: WindowGroupLimit => wgl.child // heap subsumes it
            case other => other
          }
          val topk = TopKPerKeyNode(partSpec, orderSpec, limit.toInt, inner)
          Project(projList,
            if (residual.isEmpty) topk else Filter(residual.reduce(And), topk))
        case _ => p
      }
  }
}
