package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKAgg

/** The bounded-heap top-k aggregate must return EXACTLY what the window
  * formulation returns — same set, same order, same ties — under both
  * orderings, across partition merges, and at the k ≥ group-size edge.
  */
class TopKAggSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference: per-key (score, id-tiebreak) ranking in plain Scala. */
  private def expect(rows: Seq[(Long, Long, Double)], k: Int,
                     desc: Boolean): Map[Long, Seq[(Long, Double)]] =
    rows.groupBy(_._1).map { case (key, g) =>
      val sorted = g.map(t => (t._3, t._2)).sortWith { (a, b) =>
        if (a._1 != b._1) { if (desc) a._1 > b._1 else a._1 < b._1 }
        else a._2 < b._2
      }
      key -> sorted.take(k).map { case (s, i) => (i, s) }
    }

  private def run(rows: Seq[(Long, Long, Double)], k: Int,
                  desc: Boolean): Map[Long, Seq[(Long, Double)]] =
    rows.toDF("key", "id", "score")
      .repartition(7) // force partial buffers + cross-partition merge
      .groupBy(col("key"))
      .agg(TopKAgg.topk(col("score"), col("id"), k, desc).as("top"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(t => (t.getLong(0), t.getDouble(1))))
      .toMap

  test("matches the window formulation on generated data, both orders") {
    val gen = Gen.listOfN(400, for {
      key <- Gen.choose(0L, 5L)
      id <- Gen.choose(0L, 10000L)
      score <- Gen.oneOf(Gen.choose(-100.0, 100.0), Gen.oneOf(1.0, 2.0, 3.0))
    } yield (key, id, score))
    val rows0 = gen.sample.get
    // dedupe (key,id) — the contract assumes unique ids per group
    val rows = rows0.groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
    for (desc <- Seq(true, false); k <- Seq(1, 7, 64)) {
      assert(run(rows, k, desc) == expect(rows, k, desc),
        s"divergence at k=$k desc=$desc")
    }
  }

  test("k larger than the group returns the whole group, ordered") {
    val rows = Seq((1L, 10L, 5.0), (1L, 11L, 5.0), (1L, 12L, 1.0))
    assert(run(rows, 50, true)(1L) == Seq((10L, 5.0), (11L, 5.0), (12L, 1.0)))
    assert(run(rows, 50, false)(1L) == Seq((12L, 1.0), (10L, 5.0), (11L, 5.0)))
  }

  test("null scores are ignored; all-null group yields an empty array") {
    val df = Seq((1L, 1L, Some(2.0)), (1L, 2L, None), (2L, 3L, None))
      .toDF("key", "id", "score")
      .groupBy(col("key"))
      .agg(TopKAgg.topk(col("score"), col("id"), 5, true).as("top"))
    val m = df.collect().map(r => r.getLong(0) -> r.getSeq[Any](1).length).toMap
    assert(m == Map(1L -> 1, 2L -> 0))
  }

  test("NaN scores are ignored like NULLs: never admitted, never crowd out real rows") {
    val rows = Seq((1L, Double.NaN), (2L, 0.5), (3L, Double.NaN), (4L, 0.9),
      (5L, 0.1)).map { case (id, s) => ("g", id, s) }
    val top = rows.toDF("g", "id", "score")
      .groupBy(col("g"))
      .agg(TopKAgg.topk(col("score"), col("id"), 3, descending = true).as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.id"), col("t.score"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(top.toSeq == Seq((4L, 0.9), (2L, 0.5), (5L, 0.1)),
      s"NaN rows must not occupy heap slots: ${top.toSeq}")
  }

  test("the q74 plan keeps partial aggregation (no corpus-wide shuffle of scored rows)") {
    val plan = graft.operators.VectorSearch
      .queries("q74_knn_batch")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // two ObjectHashAggregate nodes = partial (map-side heap) + final;
    // a window rewrite would show Window + a full-width Exchange instead
    assert("ObjectHashAggregate".r.findAllIn(plan).length >= 2,
      s"expected partial+final ObjectHashAggregate, got:\n$plan")
    assert(!plan.contains("Window"), "q74 must not fall back to a window")
  }
}
