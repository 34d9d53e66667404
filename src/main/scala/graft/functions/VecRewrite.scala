package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule rewriting the dot-product-by-composition anti-pattern
  *
  * {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0d, (acc, v) => acc + v) }}}
  *
  * into the codegen'd [[VecDot]] expression. `ArrayAggregate` is
  * CodegenFallback — every element evaluates two interpreted lambdas and
  * allocates the zipped array — which is the ~100× slowdown the VecMath
  * doc describes; users writing the natural built-in composition get the
  * fused loop automatically once the rule is installed
  * (`spark.sql.extensions=graft.GraftExtensions`, or
  * `GraftSql.enableRewrite(spark)` on a live session).
  *
  * The rewrite targets [[VecDotSafe]], which reproduces the
  * composition's results EXACTLY — unequal lengths → null (zip_with
  * null-pads the shorter side), any null element → null (the multiply
  * poisons the accumulator), both empty → 0.0 — so installing the rule
  * globally never changes query results, even for data violating the
  * embedding-column contract. The per-element null checks are only
  * generated when the schema says elements are nullable
  * (containsNull), so clean columns keep the tight [[VecDot]] loop.
  * The rule fires only on the exact canonical shape above (multiply
  * lambda, add-accumulate, identity finish, double zero) over
  * float/double arrays — the shape that IS a dot product.
  */
object VecRewrite extends Rule[LogicalPlan] {

  private def isVec(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** The analyzer inserts numeric widening casts around lambda variables
    * (e.g. float element → double accumulator); they don't change what
    * the expression computes in double precision. */
  private def stripCast(e: Expression): Expression = e match {
    case c: Cast if c.dataType == DoubleType || c.dataType == FloatType =>
      stripCast(c.child)
    case other => other
  }

  private def refs(e: Expression, v: NamedLambdaVariable): Boolean =
    stripCast(e) match {
      case got: NamedLambdaVariable => got.exprId == v.exprId
      case _ => false
    }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(mul, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(add, Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
          LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
        if isVec(a) && isVec(b) &&
          (stripCast(mul) match {
            case Multiply(mx, my, _) => refs(mx, x) && refs(my, y)
            case _ => false
          }) &&
          (stripCast(add) match {
            case Add(ax, ay, _) =>
              (refs(ax, acc) && refs(ay, el)) || (refs(ax, el) && refs(ay, acc))
            case _ => false
          }) &&
          refs(fin, fv) =>
      VecDotSafe(a, b)
  }
}
