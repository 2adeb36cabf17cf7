package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Clustering

/** k-means step invariants that the hash-compare gate can't see. */
class ClusteringSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q80 partitions the corpus and seeds claim their own cluster") {
    val rows = Clustering.q80(spark, dir).collect()
    assert(rows.length == Clustering.KmK, "one row per cluster")
    // assignment is a partition: counts cover the whole corpus once
    val total = rows.map(_.getLong(1)).sum
    val corpus = graft.sources.Tables.table(spark, dir, "embeddings").count()
    assert(total == corpus, s"assigned $total of $corpus vectors")
    // every cluster is non-empty (its seed is at distance 0 from itself,
    // so no seed can lose its own vector to another cluster)
    assert(rows.forall(_.getLong(1) >= 1))
    // one Lloyd update can only move centroids toward their members:
    // mean within-cluster distance must beat the seed-to-centroid drift
    // being zero only if the seed already was the mean
    rows.foreach { r =>
      val (n, avgD, drift) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(avgD >= 0 && drift >= 0, s"negative stats in $r")
      if (n == 1) assert(drift == 0.0,
        s"singleton cluster's centroid IS its seed, drift must be 0: $r")
    }
  }
}
