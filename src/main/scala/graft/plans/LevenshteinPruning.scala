package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: derive a cheap length bound from edit-distance
  * predicates. `levenshtein(a, b) <= d` implies
  * `abs(length(a) - length(b)) <= d` (each edit changes the length by at
  * most one), so the rule conjoins the implied bound wherever a
  * levenshtein threshold appears in a join or filter condition. The
  * length check is O(1) per pair against levenshtein's O(|a|·|b|) — in a
  * fuzzy-match nested-loop join ([[graft.ops.TextStats.fuzzyTermPairs]])
  * most candidate pairs now fail a two-integer comparison before the DP
  * matrix ever allocates. Purely additive (the original predicate stays),
  * so results are unchanged; idempotent (a bound that is already present
  * is not re-added, keeping the optimizer's fixpoint stable).
  *
  * Registered through `SparkSessionExtensions.injectOptimizerRule`
  * ([[graft.functions.GraftFunctions.register]]) — the Rule[LogicalPlan]
  * member of the custom-Catalyst triad (expressions, typed aggregates,
  * optimizer rules).
  */
object LevenshteinPruning extends Rule[LogicalPlan] with PredicateHelper {

  private def lengthBound(cmp: (Expression, Expression) => Expression,
                          a: Expression, b: Expression, d: Expression): Expression =
    cmp(Abs(Subtract(Length(a), Length(b))), d)

  private def impliedBounds(conjunct: Expression): Option[Expression] = conjunct match {
    case LessThanOrEqual(Levenshtein(a, b, None), d)
        if d.foldable && d.dataType == IntegerType =>
      Some(lengthBound(LessThanOrEqual, a, b, d))
    case LessThan(Levenshtein(a, b, None), d)
        if d.foldable && d.dataType == IntegerType =>
      Some(lengthBound(LessThan, a, b, d))
    case GreaterThanOrEqual(d, Levenshtein(a, b, None))
        if d.foldable && d.dataType == IntegerType =>
      Some(lengthBound(LessThanOrEqual, a, b, d))
    case GreaterThan(d, Levenshtein(a, b, None))
        if d.foldable && d.dataType == IntegerType =>
      Some(lengthBound(LessThan, a, b, d))
    case _ => None
  }

  private def addBounds(cond: Expression): Expression = {
    val conjuncts = splitConjunctivePredicates(cond)
    val fresh = conjuncts.flatMap(impliedBounds)
      .filterNot(bnd => conjuncts.exists(_.semanticEquals(bnd)))
    if (fresh.isEmpty) cond else (fresh :+ cond).reduce(And)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j: Join if j.condition.isDefined =>
      val c2 = addBounds(j.condition.get)
      if (c2 fastEquals j.condition.get) j else j.copy(condition = Some(c2))
    case f: Filter =>
      val c2 = addBounds(f.condition)
      if (c2 fastEquals f.condition) f else f.copy(condition = c2)
  }
}
