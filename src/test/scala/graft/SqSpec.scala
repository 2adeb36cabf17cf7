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

  test("fused Sq8Adc kernel is bit-identical to the composed HOF form and codegen'd") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val dim = 16
    val rnd = new scala.util.Random(19)
    val mn = Seq.tabulate(dim)(_ => rnd.nextDouble() - 0.7)
    val mx = mn.map(_ + rnd.nextDouble() + 0.01)
    // derive the data from range() so the plan stays a real projection —
    // a literal toDF constant-folds to LocalTableScan and the codegen
    // assertion below would have nothing to inspect
    // checkpoint the generated inputs: the HOF `transform`s would
    // otherwise collapse into the SAME projection as the fused kernel
    // and knock the whole stage out of codegen (in q81 the cross join
    // separates them; here the barrier does)
    val rows = spark.range(300).toDF("id")
      .withColumn("qv", expr(
        s"transform(sequence(0, ${dim - 1}), j -> cast(pmod(id * 31 + j * 17, 97) / 9.7 - 5.0 AS float))"))
      .withColumn("codes", expr(
        s"transform(sequence(0, ${dim - 1}), j -> cast(pmod(id * 13 + j * 7, 256) AS int))"))
      .localCheckpoint()
    val mnL = typedLit(mn); val mxL = typedLit(mx)
    def mnAt(i: org.apache.spark.sql.Column) = element_at(mnL, i + 1)
    def scAt(i: org.apache.spark.sql.Column) = element_at(mxL, i + 1) - mnAt(i)
    val both = rows
      .withColumn("xhat", transform(col("codes"), (c, i) =>
        mnAt(i) + ((c.cast("double") * scAt(i)) / lit(255.0))))
      .withColumn("composed", aggregate(
        zip_with(col("qv"), col("xhat"),
          (a, b) => (a.cast("double") - b) * (a.cast("double") - b)),
        lit(0.0), (acc, t) => acc + t))
      .withColumn("fused",
        graft.functions.Sq8Adc(col("qv"), col("codes"), mnL, mxL))
    // bit-identical, not tolerance-based — the oracle-transfer contract
    assert(both.where(col("composed") =!= col("fused")).count() == 0,
      both.select(col("composed"), col("fused")).limit(3).collect().mkString("; "))
    // and the kernel runs inside whole-stage codegen (the point)
    val p = both.select(col("fused")).queryExecution.executedPlan.toString
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("sq8_adc")),
      p.take(600))
  }
}
