package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Salted forms must be exactly equivalent to their direct counterparts —
  * salting redistributes work, never changes results. Exercised on a
  * deliberately skewed distribution (90% of rows share one key). */
class SkewSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val skewed = spark.range(100000)
    .select(
      when(col("id") % 10 =!= 0, "hot").otherwise(concat(lit("k"), col("id") % 97)).as("k"),
      (col("id") % 1000).cast("double").as("v"))
    .localCheckpoint(true)

  test("saltedSumCount equals direct groupBy sum+count on skewed data") {
    val direct = skewed.groupBy(col("k"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    val salted = Skew.saltedSumCount(skewed, col("k"), col("v"), salts = 16)
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(salted.keySet == direct.keySet)
    assert(salted.view.mapValues(_._2).toMap == direct.view.mapValues(_._2).toMap)
    assert(direct("hot")._2 == 90000)
    salted.foreach { case (k, (s, _)) =>
      assert(math.abs(s - direct(k)._1) <= 1e-6 * math.max(1.0, math.abs(direct(k)._1)))
    }
  }

  test("saltedSumCount keeps NULL group keys (the join-based form dropped them)") {
    val withNulls = spark.range(1000)
      .select(
        when(col("id") % 5 === 0, lit(null)).otherwise(lit("hot")).as("k"),
        col("id").cast("double").as("v"))
    val direct = withNulls.groupBy(col("k"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => (Option(r.getString(0)), (r.getDouble(1), r.getLong(2)))).toMap
    val salted = Skew.saltedSumCount(withNulls, col("k"), col("v"), salts = 8)
      .collect().map(r => (Option(r.getString(0)), (r.getDouble(1), r.getLong(2)))).toMap
    assert(salted.keySet == direct.keySet)
    assert(salted.contains(None), "NULL group key must survive salting")
    assert(salted(None)._2 == direct(None)._2)
  }

  test("saltedJoin equals direct join on a skewed fact side") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k5", "B")).toDF("k", "label")
    val direct = skewed.join(dim, Seq("k")).groupBy(col("label")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = Skew.saltedJoin(skewed, dim, "k", salts = 8)
      .groupBy(col("label")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted == direct)
  }
}
