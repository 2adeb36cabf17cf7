package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `vec_sum(xs)` — element-wise sum of `array<double>` rows as ONE
  * typed imperative aggregate (the [[MinhashAgg]] pattern for dense
  * vectors).
  *
  * Replaces the dims-separate-`sum(x[j])`-columns formulation: that plan
  * carries one aggregate buffer and one getItem projection per dimension
  * (72 of each for q158's gradient), and its Catalyst analysis cost is
  * paid on EVERY build of the plan — ruinous inside a training loop.
  * This buffer is a single `Array[Double](dims)` of running sums updated
  * in a tight loop, merged associatively across partitions (map-side
  * partial aggregation intact), finalized to `array<double>`.
  *
  * Per-dimension summation order is identical to the per-column form
  * (row order within a partition, then partition merge), so callers'
  * oracles transfer unchanged. Rows whose array is NULL are skipped;
  * a group with no non-null input finalizes to NULL (the per-column
  * `sum` convention). Arrays shorter than `dims` contribute only their
  * elements; longer ones are truncated — callers pass fixed-width
  * vectors.
  */
case class VecSumAgg(
    child: Expression,
    dims: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  require(dims > 0, "vec_sum requires a positive width")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double>, got ${t.sql}")
    }

  // Buffer layout: dims running sums + one trailing seen-flag slot.
  override def createAggregationBuffer(): Array[Double] =
    new Array[Double](dims + 1)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val xs = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = math.min(dims, xs.numElements())
      var i = 0
      while (i < n) {
        buf(i) += xs.getDouble(i)
        i += 1
      }
      buf(dims) = 1.0
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < dims) {
      a(i) += b(i)
      i += 1
    }
    if (b(dims) != 0.0) a(dims) = 1.0
    a
  }

  override def eval(buf: Array[Double]): Any =
    if (buf(dims) == 0.0) null
    else new GenericArrayData(java.util.Arrays.copyOf(buf, dims))

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "vec_sum"
}

object VecSumAgg {
  def vecSum(xs: Column, dims: Int): Column =
    CatalystBridge.column(
      VecSumAgg(CatalystBridge.expression(xs), dims).toAggregateExpression())
}
