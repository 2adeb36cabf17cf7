package graft

/** Benchmark entry point. Prints ONE JSON line with per-query timings.
  *
  * Methodology (rounds 5–6): one un-timed warm run per query, then `runs`
  * timed runs (default 3), reporting the MEDIAN — rounds 3–4 proved that a
  * single cold pass per query swings up to 4.3× on byte-identical code
  * (JIT, GC, scheduling luck), which made every regression call
  * unfalsifiable. The warm run pays codegen + file-listing + shuffle-file
  * + index/layout-build costs once; the median of three discards one-off
  * GC/JIT outliers while still charging real per-run work (no result
  * caching between runs — the noop sink materializes every row every
  * time).
  *
  * Round-6 additions:
  *  - ERRORS ARE VISIBLE: a run that throws is recorded per-query in the
  *    `errors` field and its sample is discarded — it can no longer bench
  *    as a ~0 s "speedup". A query with no successful timed run reports
  *    -1.0.
  *  - REPEATABILITY IS DEMONSTRATED, not assumed: the whole bench runs
  *    `SPARK_GRAFT_BENCH_PASSES` times (default 2) and the line reports
  *    per-pass totals plus the worst per-query deviation across passes
  *    (`max_dev_pct`/`max_dev_query`). `value`/`queries` remain the
  *    first pass for round-over-round comparability.
  *  - CACHE-AWARE HYGIENE: timed runs drop only the persisted blocks THEY
  *    created (vs the post-warm snapshot), and warm-run leftovers are
  *    dropped when the query finishes. Long-lived steady-state caches
  *    (the q48 store's signature index) survive their own timed runs, so
  *    the medians measure the serving read path; the store heals an
  *    external unpersist by re-pinning (VectorStore.indexSigs), so even
  *    the end-of-query sweep cannot silently degrade a later pass.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") // brief: local[32]
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt.max(1)
    val spark = GraftSession.local(cpus.toInt, "graft-bench")
    // Warm the JVM/codegen/datasource paths once so the first query's warm
    // run isn't charged ~3s of session initialization.
    spark.range(1000).selectExpr("sum(id)").collect()
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    val sc = spark.sparkContext
    def persistedIds(): Set[Int] = sc.getPersistentRDDs.keySet.toSet
    def dropNewSince(base: Set[Int]): Unit =
      sc.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!base.contains(id)) rdd.unpersist(blocking = false)
      }

    // first error per query, across all passes (insertion-ordered)
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()

    // Measure a full-result materialization (noop sink), not count():
    // count() lets Catalyst prune the top-level projection, under-charging
    // queries whose cost is in the output columns.
    // `record = false` for WARM runs (sweep + per-query): a transient
    // warm-only failure must not flag a query whose every timed run
    // succeeded — `errors` documents timed samples that were discarded.
    def once(name: String,
             fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
             record: Boolean = true): Option[Double] = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        Some((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          val msg = (e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage))
            .replaceAll("[\"\\\\\\p{Cntrl}]", " ").take(200)
          if (record) errors.getOrElseUpdate(name, msg)
          None
      }
    }

    def median(xs: Seq[Double]): Double =
      if (xs.isEmpty) -1.0
      else {
        val s = xs.sorted
        // true median: average the middle pair for even counts
        // (s(n/2) alone would report the SLOWER of the two middles)
        if (s.length % 2 == 1) s(s.length / 2)
        else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
      }

    // Global warm sweep: run every query once, uncounted, before any
    // timed pass. The per-query warm run absorbs per-PLAN costs (codegen,
    // file listing, broadcast builds), but C2 JIT of the shared Spark
    // machinery keeps compiling through the first several queries of a
    // cold JVM — the first r6 two-pass run showed pass-1 medians on the
    // earliest-iterated queries up to 2.4× their pass-2 values while
    // late queries agreed within noise. One uncounted sweep moves that
    // JVM-global cost out of pass 1, so the reported deviation measures
    // the engine, not the JIT. Per-query hygiene as in timed passes;
    // steady-state caches dropped here heal on the query's own warm run.
    def warmSweep(): Unit =
      SparkEntry.queries.foreach { case (name, fn) =>
        val pre = persistedIds()
        once(name, fn, record = false)
        dropNewSince(pre)
      }

    def benchPass(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.map { case (name, fn) =>
        val preWarm = persistedIds()
        once(name, fn, record = false) // warm: codegen, file listing, index build — not billed
        val postWarm = persistedIds()
        val samples = (1 to runs).flatMap { _ =>
          val r = once(name, fn)
          // Queries localCheckpoint intermediate frames per invocation and
          // never reuse them across invocations; left pinned, 50 queries ×
          // passes × runs accumulate hundreds of blocks and late queries
          // pay the eviction/GC bill (observed r5: a late query at 6× its
          // uncontended median). Drop what THIS run pinned — and nothing
          // a warm run or another query's cache is still using.
          dropNewSince(postWarm)
          r
        }
        // warm-run leftovers go when the query is done (steady-state
        // caches that were unpersisted here heal on their next use)
        dropNewSince(preWarm)
        name -> median(samples)
      }

    warmSweep()
    val allPasses: Seq[Seq[(String, Double)]] = (1 to passes).map(_ => benchPass())
    val pass1 = allPasses.head

    def fmtQueries(qs: Seq[(String, Double)]): String =
      qs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

    val totals = allPasses.map(p => p.collect { case (_, v) if v >= 0 => v }.sum)

    // queries that produced a valid median in EVERY pass — deviation math
    // must compare like with like (a query erroring in one pass would
    // otherwise read as a huge "deviation" that is really a set mismatch)
    val commonNames = pass1.map(_._1).filter { name =>
      allPasses.forall(_.exists { case (n, v) => n == name && v >= 0 })
    }.toSet
    val commonTotals = allPasses.map(
      _.collect { case (n, v) if commonNames(n) => v }.sum)

    // worst per-query spread across passes, over the common subset only
    val devs = pass1.map(_._1).filter(commonNames).flatMap { name =>
      val vs = allPasses.flatMap(_.collectFirst { case (`name`, v) if v >= 0 => v })
      if (vs.size < 2) None
      else Some(name -> ((vs.max - vs.min) / math.max(vs.min, 0.01) * 100.0))
    }
    val (devQ, devPct) =
      if (devs.isEmpty) ("", 0.0) else devs.maxBy(_._2)
    // totals are the cross-round comparable; per-query max-dev is noisy
    // for sub-second queries (3-run medians on a contended 32-thread box)
    val totalDevPct =
      if (commonTotals.size < 2 || commonTotals.min <= 0) 0.0
      else (commonTotals.max - commonTotals.min) / commonTotals.min * 100.0

    val errJson = errors
      .map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val extra =
      if (passes < 2) ""
      else s""","queries_pass2":${fmtQueries(allPasses(1))},"pass_totals":[${totals.mkString(",")}],"total_dev_pct":${math.round(totalDevPct * 10) / 10.0},"max_dev_pct":${math.round(devPct * 10) / 10.0},"max_dev_query":"$devQ""""
    println(s"""{"metric":"total","value":${totals.head},"unit":"sec","queries":${fmtQueries(pass1)},"errors":$errJson$extra,"sf":"$sfDir","runs_per_query":$runs,"passes":$passes,"stat":"median"}""")
    spark.stop()
  }
}
