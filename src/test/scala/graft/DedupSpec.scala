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

  test("fused MinhashAgg signature equals the per-column min((a*h+b)%p) form") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
    val sh = graft.sources.Tables.table(spark, dir, "documents")
      .select(col("doc_id"),
        explode(graft.functions.TokenShingleHashes(col("text"), 3)).as("h"))
      .withColumn("h32", pmod(col("h"), lit(4294967296L)))
    val params = minhashParams(8)
    val fused = sh.groupBy(col("doc_id"))
      .agg(graft.functions.MinhashAgg.minhash(col("h32"), params, MinhashP).as("ms"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val slotAggs = params.zipWithIndex.map { case ((a, b), i) =>
      minhashSlot(col("h32"), a, b).as(s"m$i")
    }
    val columnar = sh.groupBy(col("doc_id")).agg(slotAggs.head, slotAggs.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getLong).toVector).toMap
    assert(fused.nonEmpty)
    assert(fused == columnar)
  }

  test("MinhashAgg finalizes all-null groups to NULL, matching the columnar form") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
    import spark.implicits._
    val mixed = Seq(
      (1L, Some(7L)), (1L, None), // group with one real hash
      (2L, None), (2L, None)      // group whose hashes are all NULL
    ).toDF("g", "h32")
    val params = minhashParams(4)
    val rows = mixed.groupBy(col("g"))
      .agg(graft.functions.MinhashAgg.minhash(col("h32"), params, MinhashP).as("ms"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(rows(1L).isDefined, "non-null group keeps its signature")
    assert(rows(2L).isEmpty, "all-null group must yield NULL, not sentinel slots")
  }

  test("narrow MinhashArray equals the MinhashAgg aggregate slot-for-slot") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
    val params = minhashParams(64)
    val docsDf = graft.sources.Tables.table(spark, dir, "documents")
    val narrow = docsDf
      .select(col("doc_id"),
        graft.functions.MinhashArray(
          graft.functions.TokenShingleHashes(col("text"), 3), params, MinhashP).as("ms"))
      .where(size(col("ms")) > 0)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val agg = docsDf
      .select(col("doc_id"),
        explode(graft.functions.TokenShingleHashes(col("text"), 3)).as("h"))
      .withColumn("h32", pmod(col("h"), lit(4294967296L)))
      .groupBy(col("doc_id"))
      .agg(graft.functions.MinhashAgg.minhash(col("h32"), params, MinhashP).as("ms"))
      .where(col("ms").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    assert(narrow.nonEmpty)
    assert(narrow == agg)
    // empty-input behavior: empty array out (callers filter on size)
    import spark.implicits._
    val empty = Seq("x", "").toDF("text")
      .select(graft.functions.MinhashArray(
        graft.functions.TokenShingleHashes(col("text"), 3), params, MinhashP).as("ms"))
      .collect().map(_.getSeq[Long](0))
    assert(empty.forall(_.isEmpty), "sub-shingle docs must yield empty signatures")
  }

  test("narrow SimhashArray equals the SimhashAgg aggregate fingerprint-for-fingerprint") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
    val docsDf = graft.sources.Tables.table(spark, dir, "documents")
    val narrow = docsDf
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .where(size(col("toks")) > 0)
      .select(col("doc_id"),
        graft.functions.SimhashArray(col("toks"), 60).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agg = docsDf
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .withColumn("h", hash60(col("tok")))
      .groupBy(col("doc_id"))
      .agg(graft.functions.SimhashAgg.simhash(col("h"), 60).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(narrow.nonEmpty)
    assert(narrow == agg)
    // the empty-array sentinel sits outside the 60-bit fingerprint budget
    import spark.implicits._
    val s = Seq(Seq.empty[String]).toDF("toks")
      .select(graft.functions.SimhashArray(col("toks"), 60))
      .head.getLong(0)
    assert(s == (1L << 62))
  }

  test("minhash-LSH + verify lands on exactly the brute-force pair set") {
    val brute = Dedup.q17(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.q18(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute == lsh)
  }

  test("q64 clusters are exactly the connected components of the pair set") {
    val pairs = Dedup.q18(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // independent driver-side union-find (union by min root), so the
    // distributed label propagation is checked against a different
    // algorithm, not against itself
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.toSeq.map(x => (find(x), x))
      .groupBy(_._1).map { case (root, xs) => root -> xs.map(_._2).toSet }
    val got = Dedup.q64(spark, dir).collect().map { r =>
      (r.getLong(0), r.getLong(1),
        r.getString(2).split(",").map(_.toLong).toSeq)
    }
    assert(got.map(_._1).toSet == expected.keySet) // one row per component, keyed by min id
    got.foreach { case (cluster, nDocs, members) =>
      // members is the ascending-id PREFIX of the component, capped
      assert(members ==
        expected(cluster).toSeq.sorted.take(Dedup.MembersCap))
      assert(nDocs == expected(cluster).size)
      assert(cluster == members.min)
      assert(nDocs >= 2) // only docs appearing in some pair are clustered
    }
  }

  test("cluster report row stays bounded on a million-member cluster") {
    import spark.implicits._
    // one giant component (the 100 TB boilerplate-cluster shape): the
    // report must carry n_docs + a MembersCap sample, never a string of
    // the full roster — the pre-cap formulation OOM'd/2GB'd exactly here
    val labels = spark.range(0, 1000000L).toDF("doc_id")
      .withColumn("lbl", org.apache.spark.sql.functions.lit(0L))
    val rows = Dedup.clusterReport(labels).collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(1) == 1000000L)
    val members = rows(0).getString(2).split(",").map(_.toLong).toSeq
    assert(members == (0L until Dedup.MembersCap.toLong))
  }

  test("q113 span-merge kernel folds overlapping k-gram intervals exactly") {
    import spark.implicits._
    val k = 8
    // doc 1: positions 1,2,10 → [1,9]∪[2,9] merge (2 ≤ prevEnd 8+1); 10
    // overlaps [1,9]'s end? prevEnd=9, 10 > 9 → NEW island [10,17].
    // doc 2: positions 3,11 → 11 > 3+7=10 → two islands… 11 > 10 yes.
    // doc 3: positions 5,12 → 12 ≤ 5+7=12 → one island [5,19].
    val pos = Seq((1L, 1), (1L, 2), (1L, 10), (2L, 3), (2L, 11),
      (3L, 5), (3L, 12)).toDF("doc_id", "pos")
    val got = Dedup.mergedSpans(pos, k).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(got(1L) == ((2, 17L))) // [1,9] (9 toks) + [10,17] (8 toks)
    assert(got(2L) == ((2, 16L))) // [3,10] + [11,18], disjoint
    assert(got(3L) == ((1, 15L))) // [5,19], one merged span
  }

  test("q113 span dedup: bounds + full-coverage consistency on the corpus") {
    val rows = Dedup.q113(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nTok, nSpans, dupTok, frac) =>
      assert(dupTok <= nTok, s"doc $id: spans cover more than the doc")
      assert((nSpans > 0) == (dupTok > 0), s"doc $id: span/token mismatch")
      assert(frac >= 0.0 && frac <= 1.0)
      if (frac == 1.0 && nTok >= Dedup.SpanK)
        assert(nSpans == 1, s"doc $id: full coverage must be one merged span")
    }
    // the corpus generator plants near-duplicate docs (q17/q18 rely on
    // them); positionally-shared 8-grams make some spans surface
    assert(rows.exists(_._3 > 0), "expected some duplicated spans")
  }
}
