package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-group top-k as ONE bounded-heap typed imperative aggregate.
  *
  * The scalable form of "rank ≤ k per key": a window over
  * `row_number() PARTITION BY key` shuffles EVERY scored row to the
  * key's reducer before any row is discarded — at a 100 TB corpus ×
  * Q-query batch that is corpus×Q rows through the exchange. This
  * aggregate keeps a k-slot binary heap per (partition, key) whose root
  * is the WORST kept element, so map-side partial aggregation (which
  * Spark runs for free on any TypedImperativeAggregate under hash
  * aggregation) prunes each partition's contribution to k rows and the
  * exchange carries at most partitions × keys × k entries — the scored
  * frame itself is never shuffled.
  *
  * Ordering: score descending when `descending` (cosine/ip similarity),
  * ascending otherwise (l2 distance); ties broken by ascending id — the
  * same total order as [[graft.store.Scoring.ranked]], so a batched
  * search returns exactly what k independent single-query searches
  * would. Ids are `bigint` (the analytics tables) or `string` (the
  * store facades — UTF8 binary order, identical to Spark's and DuckDB's
  * string sort). Finalizes to `array<struct<id, score double>>`
  * better-first; NULL score or id rows are ignored (an all-NULL group
  * finalizes to an empty array).
  *
  * Precondition: ids are UNIQUE within a group. The (score, id) order is
  * total only then — on duplicate (score, id) rows `worse` is false both
  * ways, so WHICH physical duplicate survives is insertion-order
  * dependent (the kept (id, score) VALUES are still deterministic, but
  * don't feed this aggregate duplicate ids and expect a specific row's
  * other columns back). Every in-tree caller satisfies this by
  * construction (vec_id/doc_id keys).
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    descending: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buf] {

  require(k >= 1 && k <= 100000, "k must be in [1, 100000]")

  private def stringIds: Boolean = id.dataType == StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType &&
        (id.dataType == LongType || id.dataType == StringType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double score, bigint|string id), got " +
        s"(${score.dataType.sql}, ${id.dataType.sql})")

  override def createAggregationBuffer(): TopKAgg.Buf =
    new TopKAgg.Buf(k, descending, stringIds)

  override def update(buf: TopKAgg.Buf, input: InternalRow): TopKAgg.Buf = {
    val s = score.eval(input)
    val i = id.eval(input)
    // NaN is ignored like NULL: the (score, id) comparator is not a
    // total order under NaN — an admitted NaN entry could never be
    // evicted (worse() false both ways) and two of them would break
    // sortWith's contract in the finalizer. An undefined score doesn't
    // rank.
    if (s != null && !s.asInstanceOf[Double].isNaN && i != null) {
      // UTF8Strings from a columnar scan alias reusable buffers — copy
      // before the value outlives this row
      val iv: AnyRef =
        if (stringIds) i.asInstanceOf[UTF8String].clone()
        else i.asInstanceOf[AnyRef]
      buf.offer(s.asInstanceOf[Double], iv)
    }
    buf
  }

  override def merge(b1: TopKAgg.Buf, b2: TopKAgg.Buf): TopKAgg.Buf = {
    var j = 0
    while (j < b2.size) { b1.offer(b2.scores(j), b2.ids(j)); j += 1 }
    b1
  }

  override def eval(buf: TopKAgg.Buf): Any = {
    val order = buf.betterFirst()
    new GenericArrayData(order.map { j =>
      new GenericInternalRow(Array[Any](buf.ids(j), buf.scores(j))): Any
    })
  }

  override def serialize(buf: TopKAgg.Buf): Array[Byte] =
    if (!stringIds) {
      val bb = ByteBuffer.allocate(4 + 16 * buf.size)
      bb.putInt(buf.size)
      var j = 0
      while (j < buf.size) {
        bb.putDouble(buf.scores(j))
        bb.putLong(buf.ids(j).asInstanceOf[java.lang.Long].longValue)
        j += 1
      }
      bb.array()
    } else {
      val byteArrs = (0 until buf.size)
        .map(j => buf.ids(j).asInstanceOf[UTF8String].getBytes)
      val bb = ByteBuffer.allocate(
        4 + byteArrs.map(12 + _.length).sum)
      bb.putInt(buf.size)
      var j = 0
      while (j < buf.size) {
        bb.putDouble(buf.scores(j))
        bb.putInt(byteArrs(j).length)
        bb.put(byteArrs(j))
        j += 1
      }
      bb.array()
    }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKAgg.Buf(k, descending, stringIds)
    var j = 0
    // entries re-offered, not memcpy'd: the heap shape is rebuilt, the
    // kept SET is identical (n ≤ k by construction)
    while (j < n) {
      val s = bb.getDouble()
      val iv: AnyRef =
        if (!stringIds) java.lang.Long.valueOf(bb.getLong())
        else {
          val len = bb.getInt()
          val arr = new Array[Byte](len)
          bb.get(arr)
          UTF8String.fromBytes(arr)
        }
      buf.offer(s, iv)
      j += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", id.dataType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id)
  override def prettyName: String = s"topk_$k"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKAgg {

  /** k-slot binary heap, root = worst kept element under the (score,
    * id-tiebreak) total order. `offer` is O(log k) once full and a
    * no-op when the candidate ranks below the root. Ids are boxed Longs
    * or (already-copied) UTF8Strings per `str`. */
  final class Buf(k: Int, desc: Boolean, str: Boolean) {
    val scores = new Array[Double](k)
    val ids = new Array[AnyRef](k)
    var size = 0

    private def tieWorse(a: AnyRef, b: AnyRef): Boolean =
      if (str) a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String]) > 0
      else a.asInstanceOf[java.lang.Long].longValue > b.asInstanceOf[java.lang.Long].longValue

    /** (s1, i1) ranks strictly BELOW (s2, i2). */
    private def worse(s1: Double, i1: AnyRef, s2: Double, i2: AnyRef): Boolean =
      if (s1 != s2) { if (desc) s1 < s2 else s1 > s2 } else tieWorse(i1, i2)

    private def swap(a: Int, b: Int): Unit = {
      val s = scores(a); scores(a) = scores(b); scores(b) = s
      val i = ids(a); ids(a) = ids(b); ids(b) = i
    }

    def offer(s: Double, i: AnyRef): Unit =
      if (size < k) {
        scores(size) = s; ids(size) = i; size += 1
        var j = size - 1
        while (j > 0) {
          val p = (j - 1) / 2
          if (worse(scores(j), ids(j), scores(p), ids(p))) { swap(j, p); j = p }
          else j = 0
        }
      } else if (worse(scores(0), ids(0), s, i)) {
        scores(0) = s; ids(0) = i
        var j = 0
        var done = false
        while (!done) {
          val l = 2 * j + 1
          val r = l + 1
          var w = j
          if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
          if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
          if (w == j) done = true
          else { swap(j, w); j = w }
        }
      }

    /** Kept indices, best first. */
    def betterFirst(): Array[Int] =
      Array.range(0, size).sortWith((a, b) =>
        worse(scores(b), ids(b), scores(a), ids(a)))
  }

  /** Aggregate Column: `array<struct<id, score>>` of the group's top-k
    * under (score, asc-id) order — descending score for similarity
    * metrics, ascending for distances. */
  def topk(score: Column, id: Column, k: Int, descending: Boolean): Column =
    CatalystBridge.column(
      TopKAgg(CatalystBridge.expression(score), CatalystBridge.expression(id),
        k, descending).toAggregateExpression())
}
