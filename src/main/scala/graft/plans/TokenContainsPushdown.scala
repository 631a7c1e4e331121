package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, ArrayContains,
  ArrayDistinct, ArrayFilter, CaseWhen, Contains, Expression, Literal,
  PredicateHelper, StringSplit, StringTrim}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.ArrayType
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Derived-pushable-predicate rule for token-membership filters.
  *
  * `array_contains(split(text, '\\s+'), 'term')` is how a corpus
  * search predicate is naturally written against a text column
  * ([[graft.functions.TextFunctions.tokens]] compiles to exactly this
  * shape under a null guard) — but the predicate is opaque to the
  * parquet source: no filter reaches the scan, so at 100 TB every row
  * group is decoded to evaluate a condition that is false for most of
  * them.
  *
  * A whitespace-split token is always a SUBSTRING of the text, so
  * token membership IMPLIES `contains(text, 'term')` — a weaker but
  * source-pushable predicate (`StringContains` reaches the parquet
  * reader, which prunes row groups on min/max + evaluates the contains
  * before materializing the rest of the row). This rule conjoins that
  * derived predicate onto any Filter whose condition (or conjunct)
  * matches the token-membership shape; the original predicate stays,
  * so semantics are unchanged — rows the derived filter keeps are
  * re-checked exactly.
  *
  * Fixed-point safe: the derived conjunct is only added when not
  * already semantically present, so a second optimizer pass is a
  * no-op. Only non-empty, whitespace-free literal terms derive (a term
  * containing whitespace can never equal a `\\s+` token; an empty term
  * derives a vacuous contains).
  */
object TokenContainsPushdown extends Rule[LogicalPlan] with PredicateHelper {

  /** A foldable expression that can only ever yield an empty or null
    * array — membership in it is vacuously false, so a CaseWhen branch
    * producing it cannot weaken the derived contains. */
  private def vacuousArray(e: Expression): Boolean =
    e.foldable && e.dataType.isInstanceOf[ArrayType] && {
      e.eval() match {
        case null => true
        case a: ArrayData => a.numElements() == 0
        case _ => false
      }
    }

  /** The text expression whose tokens are probed, unwrapped to the
    * pushable base (trim peeled — `trim(text)` tokens are substrings
    * of `text` too, and only a bare column reference can push).
    *
    * SOUNDNESS: this must be a strict structural peel, never a search
    * through arbitrary sub-expressions. Element-TRANSFORMING or
    * element-COMBINING wrappers (`transform`, `concat`, `zip_with`,
    * ...) break the tokens-are-substrings invariant — e.g. membership
    * in `transform(split(text,'\\s+'), x -> upper(x))` does NOT imply
    * `contains(text, term)`. Only three shapes are admitted:
    *   - the `\\s+` StringSplit itself;
    *   - element-SUBSET-preserving wrappers (filter / array_distinct),
    *     whose output elements are all split tokens;
    *   - the [[graft.functions.TextFunctions.tokens]] null-guard
    *     CaseWhen, where every branch value is a constant empty/null
    *     array (vacuous membership) and the else-value peels. */
  private def splitBase(arr: Expression): Option[Expression] =
    arr match {
      case StringSplit(text, Literal(p, StringType), _)
          if p != null && p.toString == "\\s+" =>
        Some(text match {
          case StringTrim(x, None) => x
          case x => x
        })
      case ArrayFilter(child, _) => splitBase(child)
      case ArrayDistinct(child) => splitBase(child)
      case CaseWhen(branches, Some(elseValue))
          if branches.forall(b => vacuousArray(b._2)) =>
        splitBase(elseValue)
      case _ => None
    }

  private def derive(conjunct: Expression): Seq[Expression] =
    conjunct match {
      case ArrayContains(arr, Literal(s: UTF8String, StringType))
          if s != null && s.numChars > 0 &&
            !s.toString.exists(_.isWhitespace) =>
        splitBase(arr).map(Contains(_, Literal(s, StringType))).toSeq
      case _ => Nil
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val existing = splitConjunctivePredicates(cond)
      val extra = existing.flatMap(derive)
        .filterNot(d => existing.exists(_.semanticEquals(d)))
      if (extra.isEmpty) f
      else Filter((cond +: extra).reduce(And), child)
  }
}
