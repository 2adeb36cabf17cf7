package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._

/** All above-threshold cosine partners of one row against a baked-in
  * corpus matrix — the kernel under the EXACT near-dup path (q15 below
  * its size gate).
  *
  * Why not a join: the declarative form (`a.join(broadcast(b),
  * id_a < id_b)` + scored column) pays broadcast-nested-loop row
  * assembly per candidate pair — measured ~1.2 µs/pair against a ~30 ns
  * fused dot kernel (`examples/NearDupBench`), so 2M pairs cost seconds
  * of pure machinery. This expression scans the corpus ONCE; each row
  * runs a tight primitive loop over the corpus matrix (ids + float
  * vectors + hoisted norms ride along as reference objects, identity
  * hashed — never deep-compared during plan transforms) and emits
  * `array<struct<id_b, score>>` for partners with `id_b > id` and a raw
  * score within `slack` of the threshold. The caller applies the exact
  * `round(score, 4) >= t` filter in Columns, so boundary semantics (and
  * oracle hash parity) are identical to the join form — the kernel's
  * threshold-with-slack only prunes volume.
  *
  * Score arithmetic matches the hoisted-norm join form bit-for-bit:
  * ascending-index float→double dot accumulation, norms hoisted per
  * corpus row (`sqrt(dot(x,x))`), `den == 0 → 0.0` guard (DistanceSpec
  * pins hoisted ≡ fused for equal-length vectors).
  *
  * Scale contract: ONLY for corpora under the near-dup exact gate
  * (100k rows ⇒ ≤ ~26 MB matrix shipped once per executor with the
  * plan). Above the gate the banded-LSH path runs instead and this
  * expression is never constructed.
  */
case class CosNeighbors(
    idChild: Expression,
    vecChild: Expression,
    ids: Array[Long],
    vecs: Array[Array[Float]],
    threshold: Double)
  extends BinaryExpression {

  override def left: Expression = idChild
  override def right: Expression = vecChild

  override def checkInputDataTypes(): TypeCheckResult =
    (idChild.dataType, vecChild.dataType) match {
      case (LongType, ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, array<float>), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id_b", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "cos_neighbors"

  /** Rounding to 4 digits can raise a score by < 5.0001e-5; emitting down
    * to `threshold - 1e-4` guarantees every pair the exact rounded filter
    * would keep is emitted. */
  private val slack = 1e-4

  @transient private lazy val norms: Array[Double] = vecs.map { v =>
    var acc = 0.0
    var k = 0
    while (k < v.length) { acc += v(k).toDouble * v(k).toDouble; k += 1 }
    math.sqrt(acc)
  }

  def evalPair(idA: Long, arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val va = new Array[Float](n)
    var k = 0
    while (k < n) { va(k) = arr.getFloat(k); k += 1 }
    var accA = 0.0
    k = 0
    while (k < n) { accA += va(k).toDouble * va(k).toDouble; k += 1 }
    val normA = math.sqrt(accA)
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var j = 0
    while (j < ids.length) {
      if (ids(j) > idA) {
        val vb = vecs(j)
        val lim = math.min(n, vb.length)
        var acc = 0.0
        k = 0
        while (k < lim) { acc += va(k).toDouble * vb(k).toDouble; k += 1 }
        val den = normA * norms(j)
        val raw = if (den == 0.0) 0.0 else acc / den
        if (raw >= threshold - slack) {
          out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](ids(j), raw))
        }
      }
      j += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def nullSafeEval(id: Any, vec: Any): Any =
    evalPair(id.asInstanceOf[Long], vec.asInstanceOf[ArrayData])

  /** Value-bridge codegen (same pattern as the text kernels): the matrix
    * rides as a reference object; one virtual call per ROW, primitive
    * loop inside. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (idRef, vecRef) => {
      val self = ctx.addReferenceObj("cosNeighbors", this,
        classOf[CosNeighbors].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$self.evalPair($idRef, $vecRef);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(idChild = newLeft, vecChild = newRight)
}

object CosNeighbors {
  def apply(id: Column, vec: Column, ids: Array[Long],
            vecs: Array[Array[Float]], threshold: Double): Column =
    CatalystBridge.column(CosNeighbors(
      CatalystBridge.expression(id), CatalystBridge.expression(vec),
      ids, vecs, threshold))
}
