package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: a `levenshtein(a, b) <= k` conjunct implies the far
  * cheaper `abs(length(a) - length(b)) <= k` (edit distance is bounded
  * below by the length difference — each insert/delete changes length
  * by one). The rule injects that implied conjunct next to the original
  * predicate, where Catalyst's own rules can then push it through joins
  * toward the scans and evaluate it before the O(len^2) DP runs — the
  * blocked fuzzy join's manual length prefilter (q95), derived
  * automatically for any user query.
  *
  * Semantics-preserving by construction: the conjunct is implied, so it
  * never removes a row the original predicate would keep (null inputs
  * make both the original and the implied conjunct null — same row
  * fate). Idempotent: an already-present semantically-equal conjunct is
  * not re-added, so the fixed-point optimizer batch terminates.
  *
  * Registered through `SparkSessionExtensions.injectOptimizerRule`
  * (GraftExtensions) — the standard extension point, usable as
  * `spark.sql.extensions` on any cluster, no Spark fork.
  */
object LevenshteinPrefilter extends Rule[LogicalPlan] with PredicateHelper {

  /** The unthresholded DP, possibly behind an integral up-cast (a user
    * writing `.cast("long") <= 1L` must not silently lose the bound). */
  private object LevDp {
    def unapply(e: Expression): Option[Levenshtein] = e match {
      case lev: Levenshtein if lev.threshold.isEmpty => Some(lev)
      case Cast(lev: Levenshtein, IntegerType | LongType, _, _)
          if lev.threshold.isEmpty => Some(lev)
      case _ => None
    }
  }

  private def lengthBound(mk: (Expression, Expression) => Expression,
      lev: Levenshtein, k: Literal): Expression = {
    val diff: Expression = Abs(Subtract(Length(lev.left), Length(lev.right)))
    val lhs = if (k.dataType == LongType) Cast(diff, LongType) else diff
    mk(lhs, k)
  }

  /** The tightest |len(a)-len(b)| upper bound already present in
    * `conjuncts` over this DP's operands (as an effective inclusive
    * value), recognized structurally in any cast/operand-order shape.
    * Exact semanticEquals against the freshly regenerated conjunct is
    * too brittle an idempotence check: another fixed-point rule could
    * canonicalize the previously injected bound (cast unwrap, operand
    * swap) into a shape the regenerated one no longer matches, and the
    * rule would then re-add a conjunct every optimizer iteration until
    * maxIterations. Returning the VALUE (not just presence) keeps the
    * rule useful when a user wrote a strictly looser manual bound: the
    * tighter implied one is still injected. */
  private def existingLengthBound(conjuncts: Seq[Expression],
      lev: Levenshtein): Option[Long] = {
    def strip(e: Expression): Expression = e match {
      case Cast(c, _, _, _) => strip(c)
      case other => other
    }
    def isAbsLenDiff(e: Expression): Boolean = strip(e) match {
      case Abs(Subtract(Length(a), Length(b), _), _) =>
        (a.semanticEquals(lev.left) && b.semanticEquals(lev.right)) ||
          (a.semanticEquals(lev.right) && b.semanticEquals(lev.left))
      case _ => false
    }
    def litVal(l: Literal): Option[Long] = l.value match {
      case i: Int => Some(i.toLong)
      case j: Long => Some(j)
      case _ => None
    }
    conjuncts.flatMap {
      case LessThanOrEqual(x, k: Literal) if isAbsLenDiff(x) => litVal(k)
      case LessThan(x, k: Literal) if isAbsLenDiff(x) => litVal(k).map(_ - 1)
      case GreaterThanOrEqual(k: Literal, x) if isAbsLenDiff(x) => litVal(k)
      case GreaterThan(k: Literal, x) if isAbsLenDiff(x) => litVal(k).map(_ - 1)
      case _ => None
    }.minOption
  }

  /** The condition with implied bounds added, or None if unchanged. */
  private def augmented(cond: Expression): Option[Expression] = {
    val conjuncts = splitConjunctivePredicates(cond)
    // (lev, effective inclusive bound value, conjunct to inject)
    val implied = conjuncts.collect {
      case LessThanOrEqual(LevDp(lev), k @ Literal(i: Int, IntegerType)) =>
        (lev, i.toLong, lengthBound(LessThanOrEqual, lev, k))
      case LessThanOrEqual(LevDp(lev), k @ Literal(j: Long, LongType)) =>
        (lev, j, lengthBound(LessThanOrEqual, lev, k))
      case LessThan(LevDp(lev), k @ Literal(i: Int, IntegerType)) =>
        (lev, i.toLong - 1, lengthBound(LessThan, lev, k))
      case LessThan(LevDp(lev), k @ Literal(j: Long, LongType)) =>
        (lev, j - 1, lengthBound(LessThan, lev, k))
      case GreaterThanOrEqual(k @ Literal(i: Int, IntegerType), LevDp(lev)) =>
        (lev, i.toLong, lengthBound(LessThanOrEqual, lev, k))
      case GreaterThanOrEqual(k @ Literal(j: Long, LongType), LevDp(lev)) =>
        (lev, j, lengthBound(LessThanOrEqual, lev, k))
      case GreaterThan(k @ Literal(i: Int, IntegerType), LevDp(lev)) =>
        (lev, i.toLong - 1, lengthBound(LessThan, lev, k))
      case GreaterThan(k @ Literal(j: Long, LongType), LevDp(lev)) =>
        (lev, j - 1, lengthBound(LessThan, lev, k))
    }.collect {
      // inject unless an existing bound is already at least as tight
      case (lev, eff, e) if existingLengthBound(conjuncts, lev).forall(_ > eff) => e
    }
    if (implied.isEmpty) None
    else Some((conjuncts ++ implied).reduce(And))
  }

  // matched in both Filter and Join conditions: Catalyst's own pushdown
  // may fold the user's filter into a join condition before this rule
  // runs in the fixed-point operator batch
  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      augmented(cond).map(Filter(_, child)).getOrElse(f)
    case j @ Join(_, _, _, Some(cond), _) =>
      augmented(cond).map(c => j.copy(condition = Some(c))).getOrElse(j)
  }
}
