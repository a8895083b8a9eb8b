package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the portable higher-order-function dot
  * product
  *
  *   aggregate(zip_with(a, b, (x, y) => x * y), 0.0d, (acc, v) => acc + v)
  *
  * to the native codegen'd `VecDot(a, b)` (`graft_dot`). Sound because
  * VecDot mirrors the HOF bit-for-bit: same left-to-right summation
  * order, null on length mismatch, null when any element is null
  * (zip_with's null product nulls the HOF sum) — asserted by
  * RewriteDotProductSpec incl. the null edges.
  *
  * Why a Rule (SURVEY §4 preference ladder, step (c)): users writing
  * the declarative HOF form — the natural Spark idiom, and the one
  * that works without extensions — get the interpreted lambda path,
  * measured ~10× slower per row. With GraftExtensions installed the
  * optimizer swaps the kernel in transparently; the user's code stays
  * portable.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(arg: NamedLambdaVariable), _) =>
      body.semanticEquals(arg)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(mul: Multiply,
              Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(add: Add,
            Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          finish)
        if isDoubleArray(a) && isDoubleArray(b) &&
          mul.left.semanticEquals(x) && mul.right.semanticEquals(y) &&
          add.left.semanticEquals(acc) && add.right.semanticEquals(v) &&
          isIdentity(finish) =>
      VecDot(a, b)
  }
}
