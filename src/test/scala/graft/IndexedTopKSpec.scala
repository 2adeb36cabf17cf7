package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{cosineSim, l2sq}
import graft.plans.IndexedTopK

/** The Catalyst indexed-top-k rewrite (SURVEY §7's optional plan-level
  * item): `ORDER BY vec_l2sq(...) LIMIT k` over an ATTACHED parquet
  * table must plan as a cell-pruned scan of the IVF layout — chosen by
  * the optimizer, not a facade parameter — and its results must equal
  * the probe policy computed by hand (candidates = probed cells, rerank
  * exact). Unattached tables, disabled conf, and wrong-direction sorts
  * must be byte-identical to the unrewritten plan. */
class IndexedTopKSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def litVec(q: Seq[Float]): org.apache.spark.sql.Column =
    array(q.map(v => lit(v)): _*).cast("array<float>")

  private lazy val srcPath: String = {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_topk_src_").toString
    val p = s"$dir/vecs.parquet"
    val rows = (0 until 240).map { i =>
      (i.toLong, Seq(math.cos(i * 0.37).toFloat, math.sin(i * 0.37).toFloat,
        math.cos(i * 0.11).toFloat, math.sin(i * 0.11).toFloat,
        (i % 7).toFloat / 7f, (i % 5).toFloat / 5f,
        math.cos(i * 0.053).toFloat, math.sin(i * 0.053).toFloat),
        s"tag${i % 3}")
    }
    rows.toDF("vid", "vec", "tag").write.mode("overwrite").parquet(p)
    p
  }

  private lazy val attached: String = {
    val layout = IndexedTopK.attachIvf(spark, srcPath, "vid", "vec")
    IndexedTopK.install(spark)
    layout
  }

  private def q(i: Int): Seq[Float] = spark.read.parquet(srcPath)
    .where(col("vid") === i).select(col("vec"))
    .head().getSeq[Float](0)

  private def withRewrite[A](body: => A): A = {
    spark.conf.set(IndexedTopK.EnabledConf, "true")
    try body finally spark.conf.unset(IndexedTopK.EnabledConf)
  }

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("l2 top-k over an attached table rewrites to the cell-pruned layout scan; results = probe policy") {
    val layout = attached
    val qv = q(9)
    // the trailing select is deliberate: column pruning slides it
    // between the limit and the sort, the shape that originally escaped
    // the pattern (caught by q112's in-script plan require at sf0.001)
    def topk = spark.read.parquet(srcPath)
      .orderBy(l2sq(col("vec"), litVec(qv)), col("vid"))
      .limit(10)
      .select(col("vid"))
    withRewrite {
      val df = topk
      val plan = physical(df)
      assert(plan.contains("idx_") || plan.contains(layout),
        s"rewrite did not land on the layout scan\n${plan.take(1500)}")
      assert(!plan.contains(srcPath.stripPrefix("file:")) || plan.contains(layout),
        s"source scan survived the rewrite\n${plan.take(1500)}")
      val got = df.collect().map(_.getLong(0)).toSeq
      // the hand-computed probe policy: candidates = probed cells'
      // members, exact rerank, same tiebreak
      val probed = IndexedTopK.lastProbed.get
      val expected = spark.read.parquet(s"$layout/index")
        .where(col("cell").isInCollection(probed))
        .orderBy(l2sq(col("vec"), litVec(qv)), col("vid"))
        .limit(10).select(col("vid")).collect().map(_.getLong(0)).toSeq
      assert(got == expected, s"rewritten results diverged from the probe policy")
      // the query's own vector is in a probed cell — rank 1 is itself
      assert(got.head == 9L)
    }
  }

  test("cosine descending rewrites too; ascending cosine (farthest-first) does not") {
    val layout = attached
    val qv = q(21)
    withRewrite {
      val desc = spark.read.parquet(srcPath)
        .orderBy(cosineSim(col("vec"), litVec(qv)).desc, col("vid"))
        .limit(5)
      assert(physical(desc).contains("idx_"),
        "descending cosine top-k did not rewrite")
      assert(desc.select(col("vid")).head().getLong(0) == 21L)
      val asc = spark.read.parquet(srcPath)
        .orderBy(cosineSim(col("vec"), litVec(qv)), col("vid"))
        .limit(5)
      assert(!physical(asc).contains("idx_"),
        "farthest-first cosine sort must never ride the index")
    }
  }

  test("projections and filters compose: the index proposes, the filtered scan decides") {
    val layout = attached
    val qv = q(33)
    withRewrite {
      val df = spark.read.parquet(srcPath)
        .where(col("tag") === "tag0")
        .select(col("vid"), col("vec"))
        .orderBy(l2sq(col("vec"), litVec(qv)), col("vid"))
        .limit(8)
      assert(physical(df).contains("idx_"),
        "filtered/projected top-k did not rewrite")
      val got = df.select(col("vid")).collect().map(_.getLong(0)).toSeq
      val probed = IndexedTopK.lastProbed.get
      val expected = spark.read.parquet(s"$layout/index")
        .where(col("cell").isInCollection(probed) && col("tag") === "tag0")
        .orderBy(l2sq(col("vec"), litVec(qv)), col("vid"))
        .limit(8).select(col("vid")).collect().map(_.getLong(0)).toSeq
      assert(got == expected)
      assert(got.forall(_ % 3 == 0), "filter did not apply to candidates")
    }
  }

  test("filtered rewrite declines when matching candidates cannot reach k") {
    attached
    val qv = q(5)
    withRewrite {
      val declines0 = IndexedTopK.starvedDeclines.get()
      // vid % 97 == 1 matches vids 1, 98, 195 — 3 rows in the whole
      // table, so no probe can reach k=10: the plan-time saturation
      // check must DECLINE the rewrite and leave the exact scan, whose
      // answer is min(k, matching) over the WHOLE table — the same
      // starved fallback the store facades serve imperatively (q164)
      val df = spark.read.parquet(srcPath)
        .where(col("vid") % 97 === 1)
        .orderBy(l2sq(col("vec"), litVec(qv)), col("vid"))
        .limit(10)
      val plan = physical(df)
      assert(!plan.contains("idx_"),
        s"a starved filtered top-k must not ride the index\n${plan.take(900)}")
      assert(IndexedTopK.starvedDeclines.get() > declines0,
        "the decline was not taken through the starved branch")
      val got = df.select(col("vid")).collect().map(_.getLong(0)).toSet
      assert(got == Set(1L, 98L, 195L),
        s"the exact fallback must serve every matching row, got $got")
    }
  }

  test("the saturation probe never fires for unfiltered rewrites") {
    attached
    val qv = q(13)
    withRewrite {
      val cache0 = IndexedTopK.saturationCache.size()
      val declines0 = IndexedTopK.starvedDeclines.get()
      val df = spark.read.parquet(srcPath)
        .orderBy(l2sq(col("vec"), litVec(qv)), col("vid"))
        .limit(10)
      assert(physical(df).contains("idx_"), "unfiltered top-k did not rewrite")
      assert(IndexedTopK.saturationCache.size() == cache0,
        "an unfiltered rewrite executed (and memoized) a saturation probe — " +
          "plan-time jobs must be filtered-only")
      assert(IndexedTopK.starvedDeclines.get() == declines0)
    }
  }

  test("saturation-probe kill-switch: filtered rewrites decline unconditionally, no plan-time job") {
    attached
    val qv = q(33)
    withRewrite {
      spark.conf.set(IndexedTopK.SaturationProbeConf, "false")
      try {
        val cache0 = IndexedTopK.saturationCache.size()
        val declines0 = IndexedTopK.starvedDeclines.get()
        // tag0 matches 80 of 240 rows — the probe WOULD certify it; with
        // the probe disabled the rule must fail closed (decline) rather
        // than risk an uncertified under-k rewrite
        val df = spark.read.parquet(srcPath)
          .where(col("tag") === "tag0")
          .orderBy(l2sq(col("vec"), litVec(qv)), col("vid"))
          .limit(8)
        assert(!physical(df).contains("idx_"),
          "filtered top-k rewrote with the saturation probe disabled")
        assert(IndexedTopK.saturationCache.size() == cache0,
          "the kill-switch did not suppress the plan-time probe job")
        assert(IndexedTopK.starvedDeclines.get() > declines0,
          "the disabled-probe decline was not taken through the counted branch")
        assert(df.count() == 8, "the exact filtered scan must still serve")
      } finally spark.conf.unset(IndexedTopK.SaturationProbeConf)
    }
  }

  test("detach clears the layout's saturation verdicts: a re-attach after source change cannot ride them") {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_topk_reat_").toString
    val p = s"$dir/r.parquet"
    def write(nMatching: Int): Unit =
      ((0 until 60).map { i =>
        // tag "hit" on the first nMatching ids — the predicate under test
        (i.toLong, Seq(math.cos(i * 0.29).toFloat, math.sin(i * 0.29).toFloat,
          (i % 4).toFloat / 4f, (i % 6).toFloat / 6f,
          math.cos(i * 0.07).toFloat, math.sin(i * 0.07).toFloat,
          (i % 3).toFloat / 3f, (i % 8).toFloat / 8f),
          if (i < nMatching) "hit" else "miss")
      }).toDF("vid", "vec", "tag").write.mode("overwrite").parquet(p)
    write(40) // plenty of matches: the filtered rewrite saturates
    // the deterministic-collision scenario needs the shared-root
    // cluster contract: under the mkdtemp fallback every attach gets a
    // fresh root and stale keys can never match
    spark.conf.set(IndexedTopK.DirConf,
      java.nio.file.Files.createTempDirectory("graft_topk_root_").toString)
    val layout = IndexedTopK.attachIvf(spark, p, "vid", "vec")
    IndexedTopK.install(spark)
    val qv = spark.read.parquet(p).where(col("vid") === 2)
      .select(col("vec")).head().getSeq[Float](0)
    def topk = spark.read.parquet(p)
      .where(col("tag") === "hit")
      .orderBy(l2sq(col("vec"), litVec(qv)), col("vid"))
      .limit(10)
    withRewrite {
      assert(physical(topk).contains("idx_"),
        "the saturated filtered rewrite did not fire on the first build")
      assert(IndexedTopK.saturationCache.keySet.stream()
          .anyMatch(_.startsWith(layout + "|")),
        "the saturated verdict was not memoized under the layout key")
      // source changes: the same predicate now matches only 3 rows —
      // fewer than k. detach + re-attach rebuilds under the SAME
      // deterministic layout dir; a stale saturated=true verdict would
      // let the rewrite serve an under-k answer silently.
      IndexedTopK.detach(p)
      assert(!IndexedTopK.saturationCache.keySet.stream()
          .anyMatch(_.startsWith(layout + "|")),
        "detach left stale saturation verdicts for the layout")
      write(3)
      val layout2 = IndexedTopK.attachIvf(spark, p, "vid", "vec")
      assert(layout2 == layout, "re-attach moved the deterministic layout dir")
      val df = topk
      assert(!physical(df).contains("idx_"),
        "the re-attached rewrite rode a stale saturation verdict")
      assert(df.count() == 3,
        "the exact filtered scan must serve every matching row")
    }
    spark.conf.unset(IndexedTopK.DirConf)
    IndexedTopK.detach(p)
  }

  test("opt-in is real: disabled conf and unattached tables keep the exact scan") {
    attached
    val qv = q(5)
    // conf off (default): no rewrite even though the table is attached
    val off = spark.read.parquet(srcPath)
      .orderBy(l2sq(col("vec"), litVec(qv))).limit(5)
    assert(!physical(off).contains("idx_"),
      "rewrite fired without the conf opt-in")
    // conf on, different (unattached) table: untouched
    withRewrite {
      val sp = spark
      import sp.implicits._
      val other = java.nio.file.Files.createTempDirectory("graft_topk_other_")
        .toString + "/o.parquet"
      Seq((1L, Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)))
        .toDF("vid", "vec").write.mode("overwrite").parquet(other)
      val un = spark.read.parquet(other)
        .orderBy(l2sq(col("vec"), litVec(qv))).limit(5)
      assert(!physical(un).contains("idx_"),
        "rewrite fired on an unattached table")
    }
  }

  test("multi-root scans never rewrite: one root's layout can't cover the union") {
    attached
    val sp = spark
    import sp.implicits._
    val other = java.nio.file.Files.createTempDirectory("graft_topk_mr_")
      .toString + "/m.parquet"
    // rows disjoint from srcPath's ids — if the rewrite fired, these
    // could never surface in the top-k
    (1000 until 1020).map(i =>
        (i.toLong, Seq.fill(8)(0f), "x")).toDF("vid", "vec", "tag")
      .write.mode("overwrite").parquet(other)
    val qv = q(5)
    withRewrite {
      val both = spark.read.parquet(srcPath, other)
        .orderBy(l2sq(col("vec"), litVec(qv))).limit(300)
      assert(!physical(both).contains("idx_"),
        "rewrite fired on a multi-root relation — silent data loss")
      val ids = both.collect().map(_.getLong(0)).toSet
      assert((1000L until 1020L).forall(ids.contains),
        "second root's rows missing from the union top-k")
    }
  }

  test("attach refuses a source that already has a 'cell' column") {
    val sp = spark
    import sp.implicits._
    val clash = java.nio.file.Files.createTempDirectory("graft_topk_cc_")
      .toString + "/c.parquet"
    Seq((1L, Seq.fill(8)(0.5f), 9)).toDF("vid", "vec", "cell")
      .write.mode("overwrite").parquet(clash)
    val e = intercept[IllegalArgumentException] {
      IndexedTopK.attachIvf(spark, clash, "vid", "vec")
    }
    assert(e.getMessage.contains("cell"))
  }

  test("a hot saturation verdict survives cold-insert pressure past the cache bound (ADVICE r19)") {
    // The pre-r20 overflow guard CLEARED the whole map at the bound, so
    // every hot layout's memoized verdict died with the flood and the
    // next planning re-ran a driver-blocking plan-time job. The
    // access-ordered LRU must instead evict only least-recently-USED
    // entries: a verdict that keeps being consulted outlives any number
    // of distinct cold keys, and the map never exceeds its bound.
    val cache = IndexedTopK.saturationCache
    val before = new java.util.HashMap[String, java.lang.Boolean]()
    cache.synchronized { before.putAll(cache) } // other suites share the map
    try {
      cache.synchronized { cache.clear() }
      val hot = "lru-spec-hot-layout|0,1|pred|10"
      cache.put(hot, java.lang.Boolean.TRUE)
      val floods = IndexedTopK.SaturationCacheMax * 2
      for (i <- 0 until floods) {
        cache.put(s"lru-spec-cold-$i|c|p|5", java.lang.Boolean.FALSE)
        // the hot verdict is consulted between cold plannings — the
        // exact traffic shape the old clear() punished
        if (i % 512 == 0) assert(cache.get(hot) != null)
      }
      assert(cache.get(hot) != null,
        s"hot verdict evicted after $floods cold inserts — the LRU is not access-ordered")
      assert(cache.size() <= IndexedTopK.SaturationCacheMax,
        s"cache grew past its bound: ${cache.size()}")
    } finally cache.synchronized { cache.clear(); cache.putAll(before) }
  }
}
