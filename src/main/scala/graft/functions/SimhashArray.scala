package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** The SimHash fingerprint as a NARROW per-row expression over the
  * document's token array — no explode, no shuffle, no aggregation.
  *
  * [[SimhashAgg]] computes the same fingerprint as a
  * `TypedImperativeAggregate` under `groupBy(doc_id)` over exploded,
  * md5-hashed tokens — the same plan machinery the MinHash path paid
  * before [[MinhashArray]] (explode row amplification + hash shuffle +
  * object-hash aggregation for per-document arithmetic). This kernel
  * folds the WHOLE per-doc pipeline — md5 per token occurrence, 60-bit
  * truncation, signed bit counting, strict-majority packing — into one
  * codegen'd loop over the token array. At scale, fingerprinting becomes
  * a shuffle-free narrow map; only (doc, chunk, chunk-value) rows are
  * ever exchanged for candidate generation.
  *
  * Hash semantics are IDENTICAL to `hash60(tok)` =
  * `conv(substring(md5(tok), 1, 15), 16, 10)`: the first 15 md5 hex
  * digits are exactly the top 60 bits of the digest's first 8 big-endian
  * bytes (`>>> 4`). Bit counting and the strict `> 0` majority match
  * [[SimhashAgg]] (SimhashArraySpec in DedupSpec pins fingerprint
  * equality). Token order is irrelevant (counting is commutative), so
  * narrow vs aggregate cannot diverge on ordering.
  */
case class SimhashArray(child: Expression, bits: Int)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 60,
    s"bits must be in [1,60] (60 = md5-hex-15 budget), got $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = s"simhash_array_$bits"

  /** Empty/all-null token arrays have no majority to take; callers MUST
    * filter them out (as the aggregate shape did implicitly — a doc with
    * no tokens produced no rows, so no fingerprint). Throwing here would
    * poison whole-stage codegen; returning 0 would make empty docs
    * bit-identical to a legitimately-all-negative-majority fingerprint.
    * An empty input therefore returns [[EmptySentinel]], whose only
    * guarantee is being DISTINGUISHABLE from every real fingerprint
    * (bit 62 is outside the 60-bit budget). It is NOT a banding
    * safeguard: chunk keys mask bits 0..59, where the sentinel is all
    * zeros, so unfiltered empty docs would still collide into the
    * zero-chunk buckets and pair with each other at hamming 0 — the
    * upstream `size(toks) > 0` filter is the real (and only) guard. */
  val EmptySentinel: Long = 1L << 62

  def evalTokens(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](bits)
    val md = java.security.MessageDigest.getInstance("MD5")
    var seen = false
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        seen = true
        val d = md.digest(arr.getUTF8String(j).getBytes)
        var top8 = 0L
        var k = 0
        while (k < 8) { top8 = (top8 << 8) | (d(k) & 0xffL); k += 1 }
        val h = top8 >>> 4 // first 15 hex digits = top 60 bits
        var b = 0
        while (b < bits) {
          counts(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      j += 1
    }
    if (!seen) return EmptySentinel
    var fp = 0L
    var b = 0
    while (b < bits) {
      if (counts(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  override def nullSafeEval(input: Any): Any =
    evalTokens(input.asInstanceOf[ArrayData])

  /** Value-bridge codegen (same pattern as the text kernels). */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val self = ctx.addReferenceObj("simhashArray", this,
        classOf[SimhashArray].getName)
      s"${ev.value} = $self.evalTokens($input);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashArray {
  def apply(tokens: Column, bits: Int): Column =
    CatalystBridge.column(SimhashArray(CatalystBridge.expression(tokens), bits))
}
