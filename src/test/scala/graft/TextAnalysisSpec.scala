package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Semantic invariants of the text-pipeline operators that the oracle
  * hash-compare can't see (it replays the same formula; these check the
  * formula MEANS what it claims). */
class TextAnalysisSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q115 DSIR weights separate the target domain from the rest") {
    val rows = TextAnalysis.q115(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getDouble(3),
        r.getBoolean(4)))
    assert(rows.nonEmpty)
    val corpus = graft.sources.Tables.table(spark, dir, "documents").count()
    assert(rows.length == corpus, "one weight per document")
    rows.foreach { case (id, _, nTok, w, keep) =>
      assert(nTok > 0, s"doc $id scored over zero tokens")
      assert(keep == (w >= TextAnalysis.DsirKeepFloor),
        s"doc $id: keep flag diverges from the rounded-score comparison")
    }
    // importance weighting must rank the target domain above the rest on
    // average — that is the operator's entire purpose
    val (en, rest) = rows.partition(_._2 == TextAnalysis.DsirTarget)
    assert(en.nonEmpty && rest.nonEmpty)
    val enMean = en.map(_._4).sum / en.length
    val restMean = rest.map(_._4).sum / rest.length
    assert(enMean > restMean,
      f"target mean $enMean%.5f not above non-target mean $restMean%.5f")
    // and the kept set must be enriched in the target domain
    val keptEnRate = en.count(_._5).toDouble / en.length
    val keptRestRate = rest.count(_._5).toDouble / rest.length
    assert(keptEnRate > keptRestRate,
      f"keep rate (target) $keptEnRate%.3f <= (rest) $keptRestRate%.3f")
  }
}
