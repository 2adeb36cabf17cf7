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

  test("saltedCount equals direct groupBy count on skewed data") {
    val direct = skewed.groupBy(col("k")).agg(count(lit(1)).as("count"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = Skew.saltedCount(skewed, col("k"), salts = 16)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted == direct)
    assert(direct("hot") == 90000)
  }

  test("saltedSum equals direct groupBy sum") {
    val direct = skewed.groupBy(col("k")).agg(sum(col("v")).as("s"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val salted = Skew.saltedSum(skewed, col("k"), col("v"), salts = 16)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, s) =>
      assert(math.abs(s - direct(k)) <= 1e-6 * math.max(1.0, math.abs(direct(k))))
    }
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
