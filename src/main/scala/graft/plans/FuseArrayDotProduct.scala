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
  * Semantics guard: the rule fires only on non-containsNull
  * ARRAY<DOUBLE> inputs — a null ELEMENT makes the HOF sum NULL, which
  * the kernel's primitive loop cannot observe. Ragged (unequal-length)
  * inputs need no guard: `zip_with` null-pads the shorter side, which
  * poisons the HOF sum to NULL, and [[ArrayDotProduct]] returns NULL on
  * length mismatch for exactly that reason — the rewrite is result-
  * preserving for ANY lengths, so injecting it session-wide is safe.
  * IEEE addition and multiplication are commutative (not associative —
  * the fold ORDER is preserved), so either operand order inside the
  * lambdas matches.
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
