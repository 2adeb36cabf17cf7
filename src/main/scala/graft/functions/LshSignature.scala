package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** All LSH band signatures of a vector in one fused pass.
  *
  * The composed form (one `dot(vec, planeLiteral) > 0` Column per
  * hyperplane) evaluates Bands × BitsPerBand separate kernel calls per
  * row, each re-reading the vector from ArrayData; for 16 bands × 4 bits
  * that is 64 passes over the same 64 floats. This expression reads the
  * vector once into a local array, multiplies it against every plane from
  * a cached primitive matrix, and packs sign bits into one
  * `array<long>(bands)` output — turning signature generation from the
  * dominant LSH cost into a single BLAS-shaped loop.
  *
  * Plane values are baked into the expression (seeded-deterministic at
  * the call site), so signatures stay stable across runs and executors.
  */
case class LshSignature(child: Expression, planes: Seq[Seq[Seq[Float]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> input, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = s"lsh_signature_${planes.length}"

  // primitive, flattened [band][bit][dim] for the hot loop
  @transient private lazy val mat: Array[Array[Array[Float]]] =
    planes.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val v = new Array[Float](n)
    var i = 0
    while (i < n) { v(i) = arr.getFloat(i); i += 1 }
    new GenericArrayData(LshSignature.signature(v, mat))
  }

  /** Same loop inside whole-stage codegen: the plane matrix rides along as
    * a reference object; sign bits and accumulation order are identical to
    * [[nullSafeEval]] (LshSignatureSpec pins bit-equality). */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val matRef = ctx.addReferenceObj("lshPlanes", mat, "float[][][]")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val r = ctx.freshName("r")
      val k = ctx.freshName("k")
      val p = ctx.freshName("p")
      val lim = ctx.freshName("lim")
      val acc = ctx.freshName("acc")
      val sig = ctx.freshName("sig")
      s"""int $n = $input.numElements();
         |float[] $v = new float[$n];
         |for (int $k = 0; $k < $n; $k++) { $v[$k] = $input.getFloat($k); }
         |long[] $out = new long[$matRef.length];
         |for (int $b = 0; $b < $matRef.length; $b++) {
         |  long $sig = 0L;
         |  for (int $r = 0; $r < $matRef[$b].length; $r++) {
         |    float[] $p = $matRef[$b][$r];
         |    int $lim = $n < $p.length ? $n : $p.length;
         |    double $acc = 0.0;
         |    for (int $k = 0; $k < $lim; $k++) {
         |      $acc += (double) $v[$k] * (double) $p[$k];
         |    }
         |    if ($acc > 0) $sig |= (1L << $r);
         |  }
         |  $out[$b] = $sig;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshSignature {
  def apply(vec: Column, planes: Seq[Seq[Seq[Float]]]): Column =
    CatalystBridge.column(
      LshSignature(CatalystBridge.expression(vec), planes))

  /** THE scalar kernel: band signatures of one vector against a plane
    * matrix — the single definition executed by the expression's
    * interpreted eval AND by driver-side callers (`Ann.bandBuckets`, the
    * store's approx query path), so corpus-side and query-side
    * signatures cannot drift apart by edit. The codegen path emits the
    * same loop in Java; LshSignatureSpec pins interpreted ≡ codegen
    * bit-equality, which transitively pins this kernel too. */
  def signature(v: Array[Float], mat: Array[Array[Array[Float]]]): Array[Long] = {
    val out = new Array[Long](mat.length)
    var b = 0
    while (b < mat.length) {
      val band = mat(b)
      var sig = 0L
      var r = 0
      while (r < band.length) {
        val p = band(r)
        val lim = math.min(v.length, p.length)
        var acc = 0.0
        var k = 0
        while (k < lim) { acc += v(k).toDouble * p(k).toDouble; k += 1 }
        if (acc > 0) sig |= (1L << r)
        r += 1
      }
      out(b) = sig
      b += 1
    }
    out
  }
}
