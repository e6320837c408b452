package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.functions.DotProduct

/** Optimizer rule: fuse the `functions._` dot-product idiom
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (s, x) -> s + x)`
  * into the native codegen'd [[graft.functions.DotProduct]] kernel.
  *
  * The lambda formulation is what a user writes without knowing graft's
  * function surface exists; it evaluates through HigherOrderFunction
  * machinery and materializes the zipped array per row. On a 100 TB
  * similarity scan that allocation IS the bottleneck, so the engine
  * recognizes the idiom in the optimizer and swaps in the fused loop —
  * the user keeps the declarative spelling, Catalyst picks the kernel
  * (SURVEY.md §7.3 preference (b), applied as a `Rule[LogicalPlan]`).
  *
  * Soundness gate: fires only when BOTH arrays have
  * `containsNull = false`. With null-free elements the two forms agree
  * exactly (null array → null, length mismatch → null: zip_with pads
  * the short side with nulls, the null element nulls the sum, and
  * DotProduct returns null on mismatch directly). With nullable
  * elements they differ — the lambda chain nulls the whole sum while
  * DotProduct skips null slots — so those plans keep the lambda path
  * rather than silently changing answers.
  */
object FuseDotProduct extends Rule[LogicalPlan] {

  private def isNonNullDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, containsNull) => !containsNull
    case _ => false
  }

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case n: NamedLambdaVariable => n.exprId == v.exprId
    case _ => false
  }

  /** `f` is exactly a product (or sum) of the two lambda variables, in
    * either operand order. */
  private def isPair(l: Expression, r: Expression,
      x: NamedLambdaVariable, y: NamedLambdaVariable): Boolean =
    (isVar(l, x) && isVar(r, y)) || (isVar(l, y) && isVar(r, x))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(Multiply(ml, mr, _),
            Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(al, ar, _),
            Seq(acc: NamedLambdaVariable, elem: NamedLambdaVariable), _),
          LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
          if isNonNullDoubleArray(a) && isNonNullDoubleArray(b) &&
            isPair(ml, mr, x, y) && isPair(al, ar, acc, elem) &&
            isVar(fin, fv) =>
        DotProduct(a, b)
    }
}
