package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** `logistic_grad(x, w, y)` = (σ(x·w) − y) · x — one row's log-loss
  * gradient, fused (q158's per-round inner loop).
  *
  * The composed form needed a 72-literal dot product PLUS 72 separate
  * `sum((p−y)·x[j])` aggregate columns per round — a plan whose
  * analysis/optimization cost (≈0.23 s/round, measured) dwarfed the
  * actual arithmetic at every scale factor and re-paid itself 20× per
  * fit. Fused, a round's plan is this one expression under one
  * [[VecSumAgg]]: the gradient sweep is a single tight loop per row and
  * the plan is small enough that per-round driver overhead is the job
  * dispatch, not Catalyst.
  *
  * Arithmetic is identical operation-for-operation to the composed
  * form (ascending-index dot, then per-dim scale), so the q158 oracle
  * transfers unchanged.
  */
object LogisticGrad {
  def grad(x: Column, w: Column, y: Column): Column =
    CatalystBridge.column(LogisticGradExpr(
      CatalystBridge.expression(x), CatalystBridge.expression(w),
      CatalystBridge.expression(y)))
}

case class LogisticGradExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (x, w, y) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<double>, int), " +
          s"got ${x.sql}, ${w.sql}, ${y.sql}")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "logistic_grad"

  override def nullSafeEval(xv: Any, wv: Any, yv: Any): Any = {
    val x = xv.asInstanceOf[ArrayData]
    val w = wv.asInstanceOf[ArrayData]
    val y = yv.asInstanceOf[Int]
    val n = math.min(x.numElements(), w.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += x.getDouble(i) * w.getDouble(i)
      i += 1
    }
    val c = 1.0 / (1.0 + math.exp(-dot)) - y
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      out(i) = c * x.getDouble(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, w, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val c = ctx.freshName("c")
      val out = ctx.freshName("out")
      s"""int $n = $x.numElements() < $w.numElements()
         |    ? $x.numElements() : $w.numElements();
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $x.getDouble($i) * $w.getDouble($i);
         |}
         |double $c = 1.0 / (1.0 + java.lang.Math.exp(-$dot)) - $y;
         |double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $c * $x.getDouble($i);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
