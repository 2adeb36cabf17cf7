package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused text → 64-dim feature-hash vector, one pass per document.
  *
  * Semantically identical to the composed q129 pipeline (tokenize →
  * unigram+bigram features → `md5("fh_" + f)` → first-8-hex-digits
  * mod 64 bucket, 9th-hex-digit-parity sign → per-doc sum), but the
  * whole accumulation happens inside one expression: no feature
  * explode, no (doc, dim) shuffle, no 32-char hex string per feature.
  * The md5 CONTRACT is preserved bit-for-bit — bucket = low 6 bits of
  * digest byte 3 (== first 8 hex digits as uint32 mod 64) and sign =
  * bit 4 of digest byte 4 (== 9th hex digit's parity) — so the DuckDB
  * oracle and the driver-side serving kernel ([[FeatureHash]]) replay
  * it exactly. Tokenization is [[Tokenize]]'s byte scan verbatim
  * (regexp `[a-z0-9]+` over lower(text), Kelvin-sign / dotted-I
  * special cases included).
  */
case class FeatureHashVec(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "feature_hash_vec"

  override def nullSafeEval(input: Any): Any = {
    val bs = input.asInstanceOf[UTF8String].getBytes
    // pass 1: token byte arrays (Tokenize.scala semantics, verbatim)
    val toks = mutable.ArrayBuffer.empty[Array[Byte]]
    val cur = new java.io.ByteArrayOutputStream(32)
    def flush(): Unit =
      if (cur.size() > 0) { toks += cur.toByteArray; cur.reset() }
    var i = 0
    while (i < bs.length) {
      val b = bs(i)
      if (b >= 'A' && b <= 'Z') { cur.write(b + 32); i += 1 }
      else if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) { cur.write(b); i += 1 }
      else if (b == 0xE2.toByte && i + 2 < bs.length &&
               bs(i + 1) == 0x84.toByte && bs(i + 2) == 0xAA.toByte) {
        cur.write('k'); i += 3
      } else if (b == 0xC4.toByte && i + 1 < bs.length && bs(i + 1) == 0xB0.toByte) {
        cur.write('i'); flush(); i += 2
      } else { flush(); i += 1 }
    }
    flush()
    // pass 2: md5 each unigram/bigram feature, accumulate signed counts
    val acc = new Array[Long](FeatureHashVec.Dims)
    val md = FeatureHashVec.digests.get()
    def accumulate(a: Array[Byte], b: Array[Byte]): Unit = {
      md.reset()
      md.update(FeatureHashVec.Prefix)
      md.update(a)
      if (b != null) { md.update('_'.toByte); md.update(b) }
      val d = md.digest()
      val dim = d(3) & 0x3f             // (first 4 bytes as uint32) % 64
      val sgn = if (((d(4) >> 4) & 1) == 0) 1L else -1L // 9th hex digit parity
      acc(dim) += sgn
    }
    var t = 0
    while (t < toks.length) { accumulate(toks(t), null); t += 1 }
    t = 0
    while (t + 1 < toks.length) { accumulate(toks(t), toks(t + 1)); t += 1 }
    new GenericArrayData(acc)
  }

  /** Public bridge for the generated code (nullSafeEval is protected). */
  def evalUtf8(input: Any): Any = nullSafeEval(input)

  /** Not CodegenFallback: see Tokenize.doGenCode — the bridge avoids the
    * per-row InternalRow materialization fallback requires. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val ref = ctx.addReferenceObj("hasher", this,
        classOf[FeatureHashVec].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.evalUtf8($input);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FeatureHashVec {
  val Dims = 64
  private val Prefix = "fh_".getBytes("UTF-8")
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  def apply(c: Column): Column =
    CatalystBridge.column(FeatureHashVec(CatalystBridge.expression(c)))
}
