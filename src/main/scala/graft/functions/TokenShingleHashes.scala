package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused text → distinct word-n-gram shingle hashes, one pass, no
  * intermediate strings.
  *
  * Semantically equivalent to
  * `array_distinct(transform(..., hash(concat_ws(" ", slice(tokens, …)))))`
  * over `regexp_extract_all(lower(text), '[a-z0-9]+')` tokens — but that
  * composition routes through Catalyst's interpreted higher-order-function
  * evaluator and allocates a string per shingle; profiled at ~4s for 5k
  * docs at sf0.1, it dominated every dedup query. This expression
  * byte-scans the UTF8String once (A–Z folded to a–z; `[a-z0-9]+` runs are
  * tokens — exactly the regex's semantics, since no UTF-8 continuation
  * byte collides with those ranges), FNV-1a-hashes each token, and mixes
  * token hashes into shingle hashes.
  *
  * The hash is deterministic pure arithmetic (stable across executors and
  * runs). Downstream only counts hash equalities — the DuckDB oracle
  * compares final Jaccard pairs, never hashes — so only collision safety
  * matters (64-bit space vs ~1e5 shingles ≈ 1e-9).
  */
case class TokenShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = s"token_shingle_hashes_$n"

  override def nullSafeEval(input: Any): Any = {
    val bs = input.asInstanceOf[UTF8String].getBytes
    // pass 1: token FNV-1a hashes. Tokenization matches Tokenize.scala
    // exactly, including the two Unicode chars that lowercase into the
    // ASCII class (U+212A → 'k' continues a token; U+0130 → 'i' then a
    // forced break from its combining dot).
    val tokenHashes = mutable.ArrayBuffer.empty[Long]
    var i = 0
    var h = TokenShingleHashes.FnvOffset
    var inTok = false
    def endToken(): Unit = if (inTok) {
      tokenHashes += h
      h = TokenShingleHashes.FnvOffset
      inTok = false
    }
    while (i < bs.length) {
      var b = bs(i)
      if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        h = (h ^ (b & 0xffL)) * TokenShingleHashes.FnvPrime
        inTok = true
        i += 1
      } else if (b == 0xE2.toByte && i + 2 < bs.length &&
                 bs(i + 1) == 0x84.toByte && bs(i + 2) == 0xAA.toByte) {
        h = (h ^ ('k' & 0xffL)) * TokenShingleHashes.FnvPrime
        inTok = true
        i += 3
      } else if (b == 0xC4.toByte && i + 1 < bs.length && bs(i + 1) == 0xB0.toByte) {
        h = (h ^ ('i' & 0xffL)) * TokenShingleHashes.FnvPrime
        inTok = true
        endToken()
        i += 2
      } else {
        endToken()
        i += 1
      }
    }
    endToken()
    // pass 2: mix n consecutive token hashes per shingle, dedup
    val out = mutable.LinkedHashSet.empty[Long]
    var s = 0
    while (s + n <= tokenHashes.length) {
      // FNV-chain over the token hashes: seeding with the offset (not
      // tokenHashes(s)) keeps every combine (acc ^ h) * P order-sensitive
      // — a th(0) seed would make the first combine commutative and
      // collide "a b c" with "b a c".
      var sh = TokenShingleHashes.FnvOffset
      var j = 0
      while (j < n) {
        sh = (sh ^ tokenHashes(s + j)) * TokenShingleHashes.FnvPrime
        j += 1
      }
      out += sh
      s += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Public bridge for the generated code (nullSafeEval is protected). */
  def evalUtf8(input: Any): Any = nullSafeEval(input)

  /** Not CodegenFallback: see Tokenize.doGenCode — the bridge avoids the
    * per-row InternalRow materialization fallback requires. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val ref = ctx.addReferenceObj("shingler", this,
        classOf[TokenShingleHashes].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.evalUtf8($input);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenShingleHashes {
  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L

  def apply(c: Column, n: Int): Column =
    CatalystBridge.column(TokenShingleHashes(CatalystBridge.expression(c), n))
}
