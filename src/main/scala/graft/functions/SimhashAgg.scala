package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash fingerprint as a single typed imperative aggregate.
  *
  * Replaces the 60-separate-`sum(CASE…)`-columns formulation: the buffer
  * is one `Array[Int](bits)` of signed bit counts, updated in a tight
  * loop per input hash, merged associatively across partitions (map-side
  * partial aggregation works as usual), and finalized to the packed
  * fingerprint `Σ (count_b > 0) << b`.
  *
  * Semantics are bit-identical to the column formulation (same signed
  * counting, same strict `> 0` majority), which is what the DuckDB oracle
  * for q19 recomputes in SQL.
  */
case class SimhashAgg(
    child: Expression,
    bits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  require(bits >= 1 && bits <= 63, s"bits must be in [1,63], got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint hash input, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Int] = new Array[Int](bits)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < bits) {
        buf(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var i = 0
    while (i < bits) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Int]): Any = {
    var fp = 0L
    var b = 0
    while (b < bits) {
      if (buf(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * bits)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bits)(bb.getInt())
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = s"simhash_$bits"

  override def withNewMutableAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object SimhashAgg {
  /** Aggregate Column: `simhash(hashCol)` under groupBy. */
  def simhash(h: Column, bits: Int): Column =
    CatalystBridge.column(
      SimhashAgg(CatalystBridge.expression(h), bits).toAggregateExpression())
}
