package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass tokenizer, byte-for-byte equivalent to
  * `regexp_extract_all(lower(text), '[a-z0-9]+')`:
  * tokens are maximal runs of `[a-z0-9]` after folding A–Z to a–z. The
  * equivalence holds for arbitrary UTF-8 input because no multi-byte
  * sequence contains bytes in those ASCII ranges, and `lower()` of
  * non-ASCII characters can only produce characters the regex's character
  * class rejects anyway.
  *
  * Exists because the regex engine scan was the dominant cost of every
  * text-analysis query (~1.9s for 5k docs at sf0.1, profiled); this is a
  * single branch-predictable byte loop.
  */
case class Tokenize(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "tokenize"

  override def nullSafeEval(input: Any): Any = {
    val bs = input.asInstanceOf[UTF8String].getBytes
    val out = mutable.ArrayBuffer.empty[UTF8String]
    val cur = new java.io.ByteArrayOutputStream(32)
    def flush(): Unit =
      if (cur.size() > 0) { out += UTF8String.fromBytes(cur.toByteArray); cur.reset() }
    var i = 0
    while (i < bs.length) {
      val b = bs(i)
      if (b >= 'A' && b <= 'Z') { cur.write(b + 32); i += 1 }
      else if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) { cur.write(b); i += 1 }
      else if (b == 0xE2.toByte && i + 2 < bs.length &&
               bs(i + 1) == 0x84.toByte && bs(i + 2) == 0xAA.toByte) {
        // U+212A KELVIN SIGN: the only non-ASCII char that lowercases to a
        // bare ASCII letter ('k') — continues the current token
        cur.write('k'); i += 3
      } else if (b == 0xC4.toByte && i + 1 < bs.length && bs(i + 1) == 0xB0.toByte) {
        // U+0130 LATIN CAPITAL I WITH DOT: lowercases to "i" + U+0307
        // (combining dot) — an ASCII 'i' token terminated by the dot
        cur.write('i'); flush(); i += 2
      } else { flush(); i += 1 }
    }
    flush()
    new GenericArrayData(out.toArray[Any])
  }

  /** Public bridge for the generated code (nullSafeEval is protected). */
  def evalUtf8(input: Any): Any = nullSafeEval(input)

  /** Not CodegenFallback: fallback would force the surrounding
    * whole-stage pipeline to materialize an InternalRow per input just to
    * call eval(row). This bridge passes the already-computed child value
    * straight to the Scala kernel — one virtual call, no row
    * construction, pipeline stays fused. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val ref = ctx.addReferenceObj("tokenizer", this, classOf[Tokenize].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.evalUtf8($input);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Tokenize {
  def apply(c: Column): Column =
    CatalystBridge.column(Tokenize(CatalystBridge.expression(c)))
}
