package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The full MinHash signature as a NARROW per-row expression over the
  * document's shingle-hash array — no explode, no shuffle, no aggregation.
  *
  * [[MinhashAgg]] computes the same slots as a `TypedImperativeAggregate`
  * under `groupBy(doc_id)` over exploded hashes. That shape pays an
  * explode (row amplification ≈ shingles/doc), a hash shuffle, and —
  * because typed-imperative aggregates are object-based and uncodegen'd —
  * Spark's ObjectHashAggregate machinery per row. Measured at sf0.1 the
  * aggregation stage alone was ~3.0 s of q18's ~4.3 s. Per-document
  * signatures need none of that: `TokenShingleHashes` already yields the
  * (distinct) shingle hashes per row, so the signature is one codegen'd
  * loop over that array — the same work the aggregate's update loop did,
  * minus the plan machinery around it. At 100 TB this matters more, not
  * less: signature generation becomes a narrow map over the corpus with
  * zero shuffle; only the tiny (doc, band, bucket) frame is ever
  * exchanged.
  *
  * Slot semantics are IDENTICAL to [[MinhashAgg]] /
  * [[TextFunctions.minhashSlot]]: `m_i = min((a_i·h32 + b_i) mod p)` over
  * `h32 = h mod 2^32` (non-negative), same Java overflow behavior. The
  * one deliberate difference: a doc with NO shingles yields an EMPTY
  * array here (the aggregate form yields NULL) — callers filter
  * `size(ms) > 0` instead of `isNotNull`, and the banding never sees
  * either. MinhashArraySpec pins slot-for-slot equality against the
  * aggregate form on non-empty docs.
  */
case class MinhashArray(child: Expression, params: Seq[(Long, Long)], p: Long)
    extends UnaryExpression {

  require(params.nonEmpty, "at least one permutation required")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = s"minhash_array_${params.length}"

  @transient private lazy val as: Array[Long] = params.map(_._1).toArray
  @transient private lazy val bs: Array[Long] = params.map(_._2).toArray

  /** Kernel shared by interpreted eval and (via reference object) codegen:
    * identical arithmetic either way. Empty/all-null hash array → empty
    * signature. */
  def evalHashes(arr: ArrayData): GenericArrayData = {
    val n = arr.numElements()
    val out = Array.fill(as.length)(Long.MaxValue)
    var seen = false
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        seen = true
        val h = arr.getLong(j)
        val h32 = ((h % 4294967296L) + 4294967296L) % 4294967296L
        var i = 0
        while (i < as.length) {
          val x = (as(i) * h32 + bs(i)) % p
          if (x < out(i)) out(i) = x
          i += 1
        }
      }
      j += 1
    }
    if (!seen) new GenericArrayData(Array.emptyLongArray)
    else new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    evalHashes(input.asInstanceOf[ArrayData])

  /** Value-bridge codegen: the expression itself rides along as a
    * reference object and the generated code calls [[evalHashes]] —
    * avoids CodegenFallback's per-row InternalRow materialization while
    * keeping one kernel definition (same pattern as the text kernels). */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val self = ctx.addReferenceObj("minhashArray", this,
        classOf[MinhashArray].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.evalHashes($input);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashArray {
  def apply(hashes: Column, params: Seq[(Long, Long)], p: Long): Column =
    CatalystBridge.column(
      MinhashArray(CatalystBridge.expression(hashes), params, p))
}
