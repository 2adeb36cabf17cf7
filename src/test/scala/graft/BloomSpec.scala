package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BloomMightContain
import graft.operators.Relational

/** The bloom pre-filter's contract: changes the schedule, never the
  * answer — plus the two properties the hash gate can't observe: the
  * probe really prunes, and it never drops a true key. */
class BloomSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def lineitem = graft.sources.Tables.table(spark, dir, "lineitem")
  private def hiOrders = graft.sources.Tables.table(spark, dir, "orders")
    .where(col("o_totalprice") > Relational.HighValue)
    .select(col("o_orderkey"))

  test("bloomSemiJoin equals the plain semi join") {
    val viaBloom = Relational.bloomSemiJoin(
      lineitem, "l_orderkey", hiOrders, "o_orderkey")
      .select("l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val plain = lineitem.join(hiOrders,
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(viaBloom == plain)
    assert(plain.nonEmpty, "test needs a non-empty build side")
  }

  test("probe has no false negatives and actually prunes") {
    val keys = hiOrders.collect().map(_.getLong(0)).toSet
    val bloom = hiOrders.stat.bloomFilter("o_orderkey",
      math.max(keys.size, 1).toLong, 0.01)
    keys.foreach(k => assert(bloom.mightContainLong(k),
      s"false negative on true key $k"))
    val total = lineitem.count()
    val kept = lineitem
      .where(BloomMightContain(col("l_orderkey"), bloom)).count()
    val trueMatches = lineitem.join(hiOrders,
      col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    assert(kept >= trueMatches, "bloom dropped true rows")
    // selective build side → the pre-filter must remove most of the scan
    assert(kept < total / 2,
      s"bloom kept $kept of $total rows — no pruning happening")
  }

  test("bloom probe runs inside whole-stage codegen") {
    val bloom = hiOrders.stat.bloomFilter("o_orderkey", 64, 0.01)
    val p = lineitem.where(BloomMightContain(col("l_orderkey"), bloom))
      .queryExecution.executedPlan.toString
    assert(p.linesIterator.exists(l =>
      l.contains("*(") && l.contains("bloom_might_contain")), p.take(800))
  }
}
