package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Fused SQ8 asymmetric-distance kernel (r15) — the codegen upgrade for
  * q81's hot loop, motivated by a MEASURED mechanism: the r15 bench's
  * JIT-attribution instrument showed q81's pass-1 timed samples
  * coinciding with 12.3 s of C2 compilation on a ~0.7 s query, because
  * its ADC sweep ran through the interpreted higher-order-function
  * path (`aggregate(zip_with(...))` does not participate in
  * whole-stage codegen) — n×Q×dim virtual calls per bench pass, and a
  * megamorphic interpreter profile the rest of the suite keeps
  * deopting. This Expression generates the one fused loop inside
  * whole-stage codegen instead (the [[VectorDistance]] discipline).
  *
  * Arithmetic is IDENTICAL to the composed form, operation for
  * operation in ascending index order — per dim i:
  * `d = (double) qv(i) − (mn(i) + ((double) code(i) * (mx(i) − mn(i))) / 255.0)`,
  * `acc += d * d` — so results are bit-identical and the q81 DuckDB
  * oracle transfers unchanged (the VectorDistance contract).
  *
  * Children: query `array<float>`, codes `array<int>` (uint8 values),
  * per-dim grid minima and maxima `array<double>` (literals — the
  * dim-sized "codebook" of SQ8).
  */
case class Sq8Adc(first: Expression, second: Expression,
                  third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def is(dt: DataType, el: DataType) = dt match {
      case ArrayType(`el`, _) => true
      case _ => false
    }
    if (is(first.dataType, FloatType) && is(second.dataType, IntegerType) &&
        is(third.dataType, DoubleType) && is(fourth.dataType, DoubleType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, array<int>, array<double>, " +
        s"array<double>), got ${first.dataType.sql}, ${second.dataType.sql}, " +
        s"${third.dataType.sql}, ${fourth.dataType.sql}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "sq8_adc"

  override def nullSafeEval(q: Any, c: Any, mn: Any, mx: Any): Any = {
    val qv = q.asInstanceOf[ArrayData]
    val cd = c.asInstanceOf[ArrayData]
    val lo = mn.asInstanceOf[ArrayData]
    val hi = mx.asInstanceOf[ArrayData]
    var n = qv.numElements()
    if (cd.numElements() < n) n = cd.numElements()
    if (lo.numElements() < n) n = lo.numElements()
    if (hi.numElements() < n) n = hi.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val m = lo.getDouble(i)
      val xhat = m + (cd.getInt(i).toDouble * (hi.getDouble(i) - m)) / 255.0
      val d = qv.getFloat(i).toDouble - xhat
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, c, mn, mx) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val m = ctx.freshName("m")
      val xhat = ctx.freshName("xhat")
      val d = ctx.freshName("d")
      s"""int $n = $q.numElements();
         |if ($c.numElements() < $n) $n = $c.numElements();
         |if ($mn.numElements() < $n) $n = $mn.numElements();
         |if ($mx.numElements() < $n) $n = $mx.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $m = $mn.getDouble($i);
         |  double $xhat = $m + (((double) $c.getInt($i)) * ($mx.getDouble($i) - $m)) / 255.0;
         |  double $d = (double) $q.getFloat($i) - $xhat;
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;""".stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, o: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = o)
}

object Sq8Adc {
  def apply(query: Column, codes: Column, mn: Column, mx: Column): Column =
    CatalystBridge.column(Sq8Adc(
      CatalystBridge.expression(query), CatalystBridge.expression(codes),
      CatalystBridge.expression(mn), CatalystBridge.expression(mx)))
}
