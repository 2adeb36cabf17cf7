package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** Semantic invariants of the integer-exact PageRank kernel — including
  * a hand-computed tiny-graph exactness check the oracle replay (same
  * formula, other engine) cannot provide. */
class GraphSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("pagerank is integer-exact on a hand-computed star graph") {
    import spark.implicits._
    // a<->b, a<->c: outdeg a=2, b=1, c=1; r0 = 1e6 each
    val edges = Seq(("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"))
      .toDF("src", "dst")
    val r2 = Graph.pagerank(edges, 2).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // round 1: a = 150000 + 2·(17e6//20)//1 … worked by hand:
    //   a=1850000, b=c=575000
    // round 2: contrib(a)=((1850000·17)//20)//2=786250,
    //   contrib(b)=contrib(c)=(575000·17)//20=488750
    assert(r2("a") == (1127500L, 2L), s"a: ${r2("a")}")
    assert(r2("b") == (936250L, 1L), s"b: ${r2("b")}")
    assert(r2("c") == (936250L, 1L), s"c: ${r2("c")}")
  }

  test("pagerank keeps source-only nodes' teleport mass (r12 ADVICE)") {
    import spark.implicits._
    // a→b: a has no in-edges; the r12 groupBy(dst) rebuild dropped it
    // after round 1 and returned an empty frame — the contract says
    // every node with out-edges is returned, with its teleport term
    val edges = Seq(("a", "b")).toDF("src", "dst")
    val r2 = Graph.pagerank(edges, 2).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(r2.keySet == Set("a"), s"nodes: ${r2.keySet}")
    assert(r2("a") == (150000L, 1L), s"a: ${r2("a")}")
    // a chain a→b→c: b's round-2 in-mass comes from a's round-1
    // TELEPORT rank (the r12 form fed it a vanished node instead)
    val chain = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val c2 = Graph.pagerank(chain, 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c2("a") == 150000L)
    assert(c2("b") == 150000L + ((150000L * 17) / 20), s"b: ${c2("b")}")
  }

  test("q126 ranks the trade graph: suppliers dominate, output sorted") {
    val rows = Graph.q126(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 20)
    rows.foreach { case (node, pr, outdeg) =>
      assert(pr > 150000L, s"$node: rank $pr has no in-mass")
      assert(outdeg > 0L)
      assert(node.head == 'c' || node.head == 's')
    }
    assert(rows.map(_._2).toSeq == rows.map(_._2).sortBy(-_).toSeq,
      "output not rank-descending")
    // suppliers are the high-degree side of the bipartite trade graph —
    // authority scoring must surface them first
    assert(rows.head._1.startsWith("s"),
      s"top node ${rows.head._1} is not a supplier")
  }
}
