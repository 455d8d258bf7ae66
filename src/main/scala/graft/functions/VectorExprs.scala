package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the hot vector kernels
  * (SURVEY §4.3 escape hatch; task guidance: "a native Catalyst
  * `Expression` (with `doGenCode`) beats a Scala UDF").
  *
  * The higher-order-function forms (`aggregate(zip_with(...))`) are
  * semantically identical but evaluate an interpreted lambda per
  * element; these expressions generate a tight primitive loop inside
  * whole-stage codegen — the difference is material when scoring
  * millions of 64-dim embeddings per executor. Summation order is the
  * same left-to-right fold as the HOF form, so results (and the DuckDB
  * oracles) are bit-identical.
  *
  * Reference analog: the dense dot products inside `MFWorkerLogic`
  * (p·q) and the PA model (`w·x`) [K-high] — the reference hand-codes
  * them over Breeze vectors; here they compile into the query plan.
  */
object VectorExprs {
  import org.apache.spark.sql.GraftColumnBridge

  /** dot(a, b) over ARRAY<DOUBLE>: Σ a_i·b_i, left-to-right. */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(ArrayDotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** ‖a‖₂ over ARRAY<DOUBLE>, left-to-right accumulation. */
  def l2(a: Column): Column =
    GraftColumnBridge.column(ArrayL2Norm(GraftColumnBridge.expression(a)))
}

case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_dot_product requires ARRAY<DOUBLE> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot_product"
  // NULL on ragged inputs (below), independent of child nullability.
  override def nullable: Boolean = true

  // Length mismatch returns NULL — the exact semantics of the HOF form
  // `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (s,v) -> s+v)`, where
  // zip_with null-pads the shorter side and the padded product poisons
  // the sum to NULL. Keeping the kernel bit-compatible with the HOF on
  // ALL inputs (not just the equal-length embedding contract) is what
  // makes the session-wide FuseArrayDotProduct rewrite a pure
  // optimization rather than a silent result change.
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

case class ArrayL2Norm(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"array_l2_norm requires ARRAY<DOUBLE> input, got ${other.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_l2_norm"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) { val v = x.getDouble(i); acc += v * v; i += 1 }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |int $n = $x.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $x.getDouble($i);
         |  $acc += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ArrayL2Norm =
    copy(child = newChild)
}
