package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ann

/** Recall of the LSH-bucketed ANN path (q32) against brute force (q31) on
  * the sf0.001 corpus — the measured guarantee that stands in for an SQL
  * oracle on an approximate operator. */
class AnnSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("LSH ANN recall@5 vs brute force is at least 0.6, scores exact on hits") {
    val exact = Ann.q31(spark, dir).collect()
      .map(r => (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("id")))).toSet
    val approx = Ann.q32(spark, dir).collect()
      .map(r => (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("id")))).toSet
    assert(exact.nonEmpty)
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(f"recall@5 = $recall%.2f (${exact.intersect(approx).size}/${exact.size})")
    assert(recall >= 0.6, s"LSH recall too low: $recall")
  }

  test("IVF ANN recall@5 vs brute force is at least 0.5") {
    val exact = Ann.q31(spark, dir).collect()
      .map(r => (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("id")))).toSet
    val approx = Ann.ivfTopK(spark, dir).collect()
      .map(r => (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("id")))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(f"IVF recall@5 = $recall%.2f (${exact.intersect(approx).size}/${exact.size})")
    assert(recall >= 0.5, s"IVF recall too low: $recall")
  }

  test("LSH candidates are a strict subset of the corpus (no fabricated ids)") {
    val ids = Ann.q32(spark, dir).select("id").collect().map(_.getLong(0)).toSet
    val corpus = graft.sources.Tables.table(spark, dir, "embeddings")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(corpus))
  }
}
