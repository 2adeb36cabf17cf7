package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ann

/** The codegen path of LshSignature must be bit-identical to the
  * interpreted nullSafeEval path (and both to the q32 oracle's SQL
  * replay, which CORRECTNESS already pins). */
class LshSignatureSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("codegen and interpreted signature paths agree bit-for-bit") {
    import org.apache.spark.sql.functions._
    val planes: Seq[Seq[Seq[Float]]] =
      Ann.hyperplanes.map(_.map(_.toSeq: Seq[Float]).toSeq).toSeq
    def sigs(): Map[Long, Seq[Long]] = graft.sources.Tables
      .table(spark, dir, "embeddings")
      .select(col("vec_id"),
        graft.functions.LshSignature(col("embedding"), planes).as("s"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap

    val viaCodegen = sigs()
    val (ws, fm) = (spark.conf.get("spark.sql.codegen.wholeStage"),
      spark.conf.get("spark.sql.codegen.factoryMode"))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val viaInterpreter = sigs()
      assert(viaCodegen.nonEmpty)
      assert(viaCodegen == viaInterpreter)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", ws)
      spark.conf.set("spark.sql.codegen.factoryMode", fm)
    }
  }

  test("signature generation stays inside whole-stage codegen") {
    import org.apache.spark.sql.functions._
    val planes: Seq[Seq[Seq[Float]]] =
      Ann.hyperplanes.map(_.map(_.toSeq: Seq[Float]).toSeq).toSeq
    val p = graft.sources.Tables.table(spark, dir, "embeddings")
      .select(graft.functions.LshSignature(col("embedding"), planes).as("s"))
      .queryExecution.executedPlan.toString
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("lsh_signature")),
      p.take(600))
  }
}
