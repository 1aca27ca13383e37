package graft.plans

import graft.functions.GraftVocabHits

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: rewrite the vocabulary-count HOF shape
  *
  *   size(filter(toks, t -> t IN ('w1', 'w2', ...)))
  *
  * — an interpreted lambda frame per token plus a linear `In` scan — into
  * the native [[graft.functions.GraftVocabHits]] kernel (one hash-set probe
  * per token). Semantics match by construction: a NULL token makes the `In`
  * predicate NULL, which `filter` drops, and the kernel skips NULL tokens;
  * a NULL vocabulary literal can never equal a token in either form. The
  * match requires every `In` element to be a string literal (a dynamic
  * vocabulary can't be prebuilt into a set) and non-legacy `size` null
  * semantics, and leaves every other filter shape untouched. Installed via
  * [[graft.GraftExtensions]] next to [[NativeDotRule]].
  */
object NativeVocabHitsRule extends Rule[LogicalPlan] {

  private def isStringArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Size(ArrayFilter(toks,
        LambdaFunction(In(x: NamedLambdaVariable, list),
          Seq(lx: NamedLambdaVariable), _)), false)
      if x.exprId == lx.exprId && isStringArray(toks) && list.nonEmpty &&
        list.forall { case Literal(_, StringType) => true; case _ => false } =>
      GraftVocabHits(toks, list.collect {
        case Literal(v: UTF8String, StringType) => v.toString
      })
  }
}
