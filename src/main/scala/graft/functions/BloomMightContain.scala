package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen membership probe against a driver-built
  * [[org.apache.spark.util.sketch.BloomFilter]] — the executor half of
  * the bloom-pruned semi join ([[graft.operators.Relational.bloomSemiJoin]]).
  *
  * The sketch travels to executors as a codegen REFERENCE OBJECT
  * (`ctx.addReferenceObj`) inside the serialized task binary — the same
  * mechanism Spark's own runtime-filter `BloomFilterMightContain` uses —
  * so the probe stays inside whole-stage codegen: one virtual call per
  * row against a read-only bitset, no UDF boxing, no interpreter hop.
  * (A Scala UDF here would deserialize a closure per batch and box every
  * key — the difference is visible at probe-side row counts.)
  *
  * May return false positives (the exact join downstream removes them);
  * never false negatives. Null keys probe as null (three-valued logic),
  * matching semi-join semantics where null never matches.
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint key, got ${dt.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {
  def apply(key: Column, bloom: BloomFilter): Column =
    CatalystBridge.column(
      new BloomMightContain(CatalystBridge.expression(key), bloom))
}
