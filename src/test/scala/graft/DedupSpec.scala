package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** The two exact Jaccard strategies (postings self-join vs AllPairs-style
  * prefix filtering) must produce identical pair sets — prefix filtering
  * is a pruning, never an approximation. */
class DedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("prefix-filtered jaccard equals the direct join exactly") {
    val direct = Dedup.q17(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val prefixed = Dedup.jaccardPrefixFiltered(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(direct.nonEmpty)
    assert(direct == prefixed)
  }

  test("minhash-LSH + verify lands on exactly the brute-force pair set") {
    val brute = Dedup.q17(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.q18(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute == lsh)
  }
}
