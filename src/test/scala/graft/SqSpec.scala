package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions.l2sq
import graft.operators.{Ann, Sq}

/** SQ8's promise over PQ/LSH is NEAR-EXACT recall at 4× compression —
  * pin it, not just determinism (the oracle grades determinism). */
class SqSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("SQ8 ADC recall@5 vs exact l2 is at least 0.9") {
    val e = graft.sources.Tables.table(spark, dir, "embeddings")
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("d"), col("vec_id"))
    val exact = e.crossJoin(broadcast(Ann.queryFrame(spark, dir)))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("d", l2sq(col("embedding"), col("qv")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Sq.q81(spark, dir).collect()
      .map(r => (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("id"))))
      .toSet
    assert(exact.nonEmpty)
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(f"SQ8 recall@5 = $recall%.2f")
    assert(recall >= 0.9, s"SQ8 recall too low for 8-bit quantization: $recall")
  }
}
