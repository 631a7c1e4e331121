package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Or}
import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Union}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule for the reference's disjunctive left-semi joins
  * (reference `src/query_dependent_hits.py:50,55`):
  *
  * `left SEMI JOIN right ON (l1 = r1 OR l2 = r2)`
  *
  * has no equi-join keys, so Spark can only plan it as a
  * BroadcastNestedLoopJoin — at scale that broadcasts an unbounded side
  * and dies. This rule rewrites it into
  *
  * `(left SEMI JOIN right ON l1 = r1)
  *   UNION ALL ((left ANTI JOIN right ON l1 = r1) SEMI JOIN right ON l2 = r2)`
  *
  * — two hash-joinable equi joins whose branches are disjoint, so each
  * qualifying row appears exactly once with its original multiplicity
  * (the same result set as the semi join). Null keys keep their
  * semantics: a null `l1` never equals, so the row flows to the anti
  * branch where `l2` decides, exactly like OR-evaluation in the
  * original predicate.
  *
  * The `Subgraph` API applies this rewrite by hand; the rule makes the
  * engine do it for *any* query shaped like the reference's, including
  * literal ports using the DataFrame API. Registered via
  * [[GraftExtensions]]:
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
object DisjunctiveSemiJoinRewrite extends Rule[LogicalPlan] {

  private def sidesOk(e: EqualTo, left: LogicalPlan,
      right: LogicalPlan): Boolean =
    (e.left.references.subsetOf(left.outputSet) &&
      e.right.references.subsetOf(right.outputSet)) ||
      (e.left.references.subsetOf(right.outputSet) &&
        e.right.references.subsetOf(left.outputSet))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // The right subtree and both predicates are duplicated into three
    // join legs, so they must be deterministic: a rand()-sampled right
    // side would evaluate differently in semiA vs antiA and duplicate or
    // drop rows relative to the original single-evaluation semi join.
    case Join(left, right, LeftSemi, Some(cond @ Or(a: EqualTo, b: EqualTo)), hint)
        if right.deterministic && cond.deterministic &&
          sidesOk(a, left, right) && sidesOk(b, left, right) =>
      val semiA = Join(left, right, LeftSemi, Some(a), hint)
      val antiA = Join(left, right, LeftAnti, Some(a), hint)
      val semiB = Join(antiA, right, LeftSemi, Some(b), hint)
      Union(Seq(semiA, semiB))
  }
}

/** Session extension installing the graft Catalyst rules. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => DisjunctiveSemiJoinRewrite)
    e.injectOptimizerRule(_ => TokenContainsPushdown)
  }
}
