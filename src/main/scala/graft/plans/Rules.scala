package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Catalyst optimizer rule: thresholded edit-distance predicates.
  *
  * `levenshtein(a, b) <= k` computes the FULL O(|a|·|b|) dynamic program for
  * every candidate pair and then compares — in a blocked fuzzy join
  * ([[graft.ops.FuzzyJoin]]) or any SQL record-linkage filter, that DP is the
  * hot loop. Spark's built-in `Levenshtein` has a banded variant
  * (`levenshtein(a, b, threshold)`, O(k·min(|a|,|b|)); returns -1 when the
  * distance exceeds the threshold) that users rarely reach for because the
  * natural way to WRITE the predicate is the comparison form.
  *
  * This rule rewrites the comparison form into the banded form:
  *
  *   levenshtein(a, b) <= k   ⇒   levenshtein(a, b, k) >= 0
  *   levenshtein(a, b) <  k   ⇒   levenshtein(a, b, k-1) >= 0
  *
  * (plus the mirrored `k >= levenshtein(...)` shapes). Semantics are
  * unchanged: the banded form returns the true distance when it is within
  * the threshold (so `>= 0` ⇔ `<= k`) and null exactly when the two-arg form
  * is null. The rewrite is idempotent — a `Levenshtein` that already carries
  * a threshold never matches — so it is safe under the optimizer's
  * fixed-point iteration.
  *
  * Registered by [[GraftExtensions]] (build-time) and
  * [[GraftFunctions.register]] (live session via `experimental.extraOptimizations`).
  */
object LevenshteinThresholdRewrite extends Rule[LogicalPlan] {

  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case _                            => None
    }
  }

  private def banded(a: Expression, b: Expression, k: Int): Expression =
    GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(k))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case LessThanOrEqual(Levenshtein(a, b, None), IntLit(k)) if k >= 0    => banded(a, b, k)
    case GreaterThanOrEqual(IntLit(k), Levenshtein(a, b, None)) if k >= 0 => banded(a, b, k)
    case LessThan(Levenshtein(a, b, None), IntLit(k)) if k >= 1           => banded(a, b, k - 1)
    case GreaterThan(IntLit(k), Levenshtein(a, b, None)) if k >= 1        => banded(a, b, k - 1)
  }
}
