package graft

import org.scalatest.funsuite.AnyFunSuite

/** r14 (VERDICT r13 "Next round" #6): library callers looping a single
  * operator must not leak pinned blocks. The pre-r14 convention —
  * per-invocation eager `localCheckpoint` on corpus-snapshot frames —
  * leaked one anonymous corpus-sized block per call (reclaimed only by
  * the bench's hygiene sweep, i.e. never for a library caller). The
  * standing-cache conversion makes repeat invocations read one pinned
  * frame per (dir, artifact); this pins exactly that: the persisted-RDD
  * census is FLAT across a loop of each converted operator. */
class HygieneSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def loopedCensusGrowth(run: () => Unit): Int = {
    run() // first call builds the standing pins
    val base = spark.sparkContext.getPersistentRDDs.size
    (1 to 3).foreach(_ => run())
    spark.sparkContext.getPersistentRDDs.size - base
  }

  test("looping q145 (the r13 ADVICE leak site) leaves the block census flat") {
    val growth = loopedCensusGrowth(
      () => graft.operators.TextAnalysis.queries("q145_bigram_logprob")(spark, dir).count())
    assert(growth == 0, s"3 extra q145 invocations pinned $growth new blocks")
  }

  test("looping the dedup family leaves the block census flat") {
    for (q <- Seq("q17_dedup_ngram_jaccard", "q18_dedup_minhash_lsh",
        "q19_dedup_simhash", "q113_span_dedup")) {
      val growth = loopedCensusGrowth(
        () => graft.operators.Dedup.queries(q)(spark, dir).count())
      assert(growth == 0, s"3 extra $q invocations pinned $growth new blocks")
    }
  }

  test("looping the analytics/text corpus-pin consumers leaves the census flat") {
    val qs: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      Seq("q34_tfidf_top_term" -> graft.operators.Analytics.queries("q34_tfidf_top_term"),
        "q99_bigram_pmi" -> graft.operators.Analytics.queries("q99_bigram_pmi"),
        "q89_unigram_logprob" -> graft.operators.TextAnalysis.queries("q89_unigram_logprob"),
        "q115_dsir_weights" -> graft.operators.TextAnalysis.queries("q115_dsir_weights"))
    qs.foreach { case (name, fn) =>
      val growth = loopedCensusGrowth(() => fn(spark, dir).count())
      assert(growth == 0, s"3 extra $name invocations pinned $growth new blocks")
    }
  }
}
