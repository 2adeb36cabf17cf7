package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ann

/** Recall of the LSH-bucketed ANN path (q32) against brute force (q31) on
  * the sf0.001 corpus — the measured guarantee that stands in for an SQL
  * oracle on an approximate operator. */
class AnnSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("LSH ANN recall@5 vs brute force is at least 0.6, scores exact on hits") {
    val exact = Ann.q31(spark, dir).collect()
      .map(r => (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("id")))).toSet
    val approx = Ann.q32(spark, dir).collect()
      .map(r => (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("id")))).toSet
    assert(exact.nonEmpty)
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(f"recall@5 = $recall%.2f (${exact.intersect(approx).size}/${exact.size})")
    assert(recall >= 0.6, s"LSH recall too low: $recall")
  }

  test("IVF sizing policy: cells ≈ √n clamped to [16, 4096]; scanned fraction shrinks with scale") {
    import graft.operators.Ann.{ivfCellsFor, ivfProbeFor}
    assert(ivfCellsFor(0) == 16 && ivfCellsFor(100) == 16) // clamp floor
    assert(ivfCellsFor(10000) == 100)
    assert(ivfCellsFor(1000000) == 1000)
    assert(ivfCellsFor(Long.MaxValue) == 4096) // clamp ceiling
    assert(ivfProbeFor(16) == 8 && ivfProbeFor(100) == 20 && ivfProbeFor(4096) == 128)
    assert(ivfProbeFor(2) == 2, "probe must never exceed the cell count")
    // the fixed r6 geometry scanned 1/4 of ANY namespace; the policy's
    // fraction must shrink as the corpus grows
    def frac(cells: Int) = ivfProbeFor(cells).toDouble / cells
    assert(frac(100) < frac(16) && frac(1000) < frac(100) && frac(4096) < frac(1000))
  }

  test("IVF ANN recall@5 vs brute force is at least 0.5") {
    val exact = Ann.q31(spark, dir).collect()
      .map(r => (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("id")))).toSet
    val approx = Ann.ivfTopK(spark, dir).collect()
      .map(r => (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("id")))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(f"IVF recall@5 = $recall%.2f (${exact.intersect(approx).size}/${exact.size})")
    assert(recall >= 0.5, s"IVF recall too low: $recall")
  }

  test("IMI grid policy: k = n^(1/4) clamped to [2, 64]; recall@5 vs brute force is at least 0.4") {
    import graft.operators.Ann.imiGridFor
    // clamp floor is 2 (r12): a ≤16-row namespace gets a fully-probed
    // 4-cell grid instead of a half-probed 16-cell one (empty pairs
    // were crowding out live cells); n=100 already sizes by n^(1/4)
    assert(imiGridFor(0) == 2 && imiGridFor(16) == 2)
    assert(imiGridFor(100) == 4)
    assert(imiGridFor(10000) == 10)
    assert(imiGridFor(Long.MaxValue) == 64) // clamp ceiling: 64² = 4096 cells
    // two k-codebook trainings give k² cells — the sample that starves a
    // flat 4096-centroid quantizer trains two 64-codebook runs at ≥16×
    // coverage each (the scaladoc's argument, pinned numerically)
    assert(imiGridFor(16000000L) * imiGridFor(16000000L) >= 4000)
    val exact = Ann.q31(spark, dir).collect()
      .map(r => (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("id")))).toSet
    val approx = Ann.q94(spark, dir).collect()
      .map(r => (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("id")))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(f"IMI recall@5 = $recall%.2f (${exact.intersect(approx).size}/${exact.size})")
    // the product grid fragments candidates more than flat √n cells at
    // this corpus size (the known IMI trade: finer cells, emptier cells)
    assert(recall >= 0.4, s"IMI recall too low: $recall")
    // build-once: a second graded run probes the cached layout
    val builds = Ann.imiBuildCount.get()
    Ann.q94(spark, dir)
    assert(Ann.imiBuildCount.get() == builds, "repeat q94 rebuilt the layout")
  }

  test("PQ ANN recall@5 vs brute force is at least 0.5; codes are SubSpaces small ints") {
    import graft.operators.Pq
    val exact = Ann.q31(spark, dir).collect()
      .map(r => (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("id")))).toSet
    val approx = Pq.pqTopK(spark, dir).collect()
      .map(r => (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("id")))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(f"PQ recall@5 = $recall%.2f (${exact.intersect(approx).size}/${exact.size})")
    assert(recall >= 0.5, s"PQ recall too low: $recall")
    // the compression claim is structural: every row encodes to exactly
    // SubSpaces codes, each within [0, CodesPerSub)
    val aux = Pq.pqAuxDir(spark, dir)
    val codes = spark.read.parquet(s"$aux/codes").collect()
      .map(_.getSeq[Int](1))
    assert(codes.nonEmpty)
    assert(codes.forall(c => c.length == Pq.SubSpaces &&
      c.forall(k => k >= 0 && k < Pq.CodesPerSub)))
    // build once per JVM: a second pqTopK must not retrain
    val builds = Pq.buildCount.get()
    Pq.pqTopK(spark, dir)
    assert(Pq.buildCount.get() == builds, "repeat pqTopK retrained the codebook")
  }

  test("BQ hamming ANN recall@5 vs brute force is at least 0.5; one BIGINT per vector") {
    // sign-bit codes preserve angular structure; with CandN=50 of a
    // ~2k corpus the hamming prefilter must still surface most of the
    // exact cosine top-5 for the rerank to recover
    import graft.operators.Bq
    val exact = Ann.q31(spark, dir).collect()
      .map(r => (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("id")))).toSet
    val approx = Bq.q95(spark, dir).collect()
      .map(r => (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("id")))).toSet
    assert(exact.nonEmpty)
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(f"BQ recall@5 = $recall%.2f (${exact.intersect(approx).size}/${exact.size})")
    assert(recall >= 0.5, s"BQ recall too low: $recall")
    // scores on hits are the EXACT cosine (rerank-is-contract): every
    // (qid, id, score) the BQ path reports must appear identically in
    // the brute-force ranking's scored universe
    val exactScores = Ann.q31(spark, dir).collect()
      .map(r => (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("id"))) ->
        r.getDouble(r.fieldIndex("score"))).toMap
    Bq.q95(spark, dir).collect().foreach { r =>
      val key = (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("id")))
      exactScores.get(key).foreach(s =>
        assert(s == r.getDouble(r.fieldIndex("score")),
          s"BQ rerank score drifted from exact at $key"))
    }
  }

  test("IVFADC (IVF cells x PQ codes) recall@5 vs brute force is at least 0.4") {
    import graft.operators.IvfPq
    val exact = Ann.q31(spark, dir).collect()
      .map(r => (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("id")))).toSet
    val approx = IvfPq.ivfPqTopK(spark, dir).collect()
      .map(r => (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("id")))).toSet
    // two approximations stack (cells cut the candidate set, codes rank
    // it), so the floor sits under both parents' — measured well above
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(f"IVFADC recall@5 = $recall%.2f (${exact.intersect(approx).size}/${exact.size})")
    assert(recall >= 0.4, s"IVFADC recall too low: $recall")
    val builds = IvfPq.buildCount.get()
    IvfPq.ivfPqTopK(spark, dir)
    assert(IvfPq.buildCount.get() == builds, "repeat ivfPqTopK rebuilt the layout")
  }

  test("IVF probe serves repeatedly off one persisted layout (build once, probe many)") {
    val aux = Ann.buildIvfIndex(spark, dir)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(r.fieldIndex("qid")), r.getInt(r.fieldIndex("rank")),
        r.getLong(r.fieldIndex("id")))
    val p1 = Ann.ivfProbe(spark, dir, aux).collect().map(key).toSeq
    val p2 = Ann.ivfProbe(spark, dir, aux).collect().map(key).toSeq
    assert(p1.nonEmpty && p1 == p2)
  }

  test("ivfTopK builds the layout once per dir in one JVM; repeat calls are probe-only") {
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(r.fieldIndex("qid")), r.getInt(r.fieldIndex("rank")),
        r.getLong(r.fieldIndex("id")))
    val r1 = Ann.ivfTopK(spark, dir).collect().map(key).toSeq
    val builds = Ann.buildCount.get()
    val r2 = Ann.ivfTopK(spark, dir).collect().map(key).toSeq
    assert(Ann.buildCount.get() == builds,
      "second ivfTopK call rebuilt the index instead of probing the cached layout")
    assert(r1.nonEmpty && r1 == r2)
  }

  test("IVF layout root honors spark.graft.ivf.dir (cluster-safe base dir)") {
    val base = java.nio.file.Files.createTempDirectory("graft_ivf_conf_test_")
      .toString
    spark.conf.set(Ann.IvfDirConf, base)
    try {
      val aux = Ann.buildIvfIndex(spark, dir)
      assert(aux.startsWith(base), s"layout $aux not under configured $base")
      assert(new java.io.File(s"$aux/index").exists())
      val probed = Ann.ivfProbe(spark, dir, aux).collect()
      assert(probed.nonEmpty)
    } finally spark.conf.unset(Ann.IvfDirConf)
  }

  test("banded near-dup path finds the exact pairs (recall >= 0.8, no false positives)") {
    import org.apache.spark.sql.functions.col
    val v = graft.sources.Tables.vectors(spark, dir)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(r.fieldIndex("id_a")), r.getLong(r.fieldIndex("id_b")))
    val exact = graft.operators.VectorSearch.nearDupPairs(v, 1L, 0.35)
      .collect().map(key).toSet
    val banded = graft.operators.VectorSearch.nearDupPairs(v, Long.MaxValue, 0.35)
      .collect().map(key).toSet
    assert(exact.nonEmpty)
    assert(banded.subsetOf(exact), "banded path fabricated a pair below threshold")
    val recall = banded.intersect(exact).size.toDouble / exact.size
    info(f"banded near-dup recall = $recall%.2f (${banded.size}/${exact.size})")
    assert(recall >= 0.8, s"banded near-dup recall too low: $recall")
  }

  test("LSH candidates are a strict subset of the corpus (no fabricated ids)") {
    val ids = Ann.q32(spark, dir).select("id").collect().map(_.getLong(0)).toSet
    val corpus = graft.sources.Tables.table(spark, dir, "embeddings")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(corpus))
  }

  test("q116 hard negatives: every mined pair is cross-label and harder than the brute floor") {
    val rows = Ann.q116(spark, dir).collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getInt(4),
        r.getDouble(5)))
    assert(rows.nonEmpty)
    // the contract: negatives NEVER share the anchor's label
    rows.foreach { case (qid, al, _, id, nl, _) =>
      assert(al != nl, s"anchor $qid mined a same-label 'negative' $id")
    }
    // ranks descend by score within each anchor (hardest first)
    rows.groupBy(_._1).values.foreach { g =>
      val byRank = g.sortBy(_._3)
      assert(byRank.map(_._3).toSeq == (1 to byRank.length),
        "ranks not contiguous")
      assert(byRank.iterator.sliding(2).withPartial(false).forall(p =>
        p.head._6 >= p.last._6), "scores not descending with rank")
    }
    // hard negatives are the TOP of the cross-label similarity order, so
    // each anchor's rank-1 negative must score >= its q31 rank-5
    // (unrestricted) neighbor only when that neighbor is cross-label —
    // weaker universal check: rank-1 negative similarity is positive-ish
    // for at least one anchor on this corpus (non-degenerate mining)
    assert(rows.filter(_._3 == 1).exists(_._6 > 0.0),
      "no anchor found a similar cross-label negative — degenerate corpus?")
  }

  test("q120 recall eval: one row per probe query, counts consistent, mean above the IVF floor") {
    val rows = Ann.q120(spark, dir).collect()
    assert(rows.length == 5, s"expected 5 eval rows, got ${rows.length}")
    rows.foreach { r =>
      val nExact = r.getInt(r.fieldIndex("n_exact"))
      val nHit = r.getInt(r.fieldIndex("n_hit"))
      val recall = r.getDouble(r.fieldIndex("recall"))
      assert(nHit >= 0 && nHit <= nExact, s"n_hit $nHit out of [0, $nExact]")
      assert(recall >= 0.0 && recall <= 1.0)
      // the reported ratio is exactly n_hit/n_exact after r4
      assert(math.abs(recall - math.round(nHit.toDouble / nExact * 1e4) / 1e4) < 1e-12)
    }
    val mean = rows.map(r => r.getDouble(r.fieldIndex("recall"))).sum / rows.length
    info(f"measured IVF mean recall@5 = $mean%.2f")
    // same floor AnnSpec pins for the IVF operator itself — the eval
    // must agree with the direct measurement
    assert(mean >= 0.5, s"recall eval below the measured IVF floor: $mean")
  }
}
