package graft.examples

import org.apache.spark.sql.functions._

import graft.multimodal.{MediaDedup, MediaVectorSearch}

/** Sources the r20 SCALING claim for the MEDIA curation funnel's
  * economics at ~100k assets (VERDICT r19 optional #7: q167 composes
  * decode → banded-hamming dedup → embed → budgeted centroid-outlier
  * prune → store → retrieval, but its stage costs were measured only
  * at the 360-asset fixture; MediaDedupBench scale-pointed the DEDUP
  * stage alone). Re-runs q167's image leg over 100k REAL BMPs with the
  * SAME library kernels the graded funnel calls — [[MediaDedup.dhash]]
  * through the real ImageIO decode, [[MediaDedup.nearDupPairs]] (the
  * one shared banded-hamming definition), [[MediaVectorSearch
  * .imageFeature]] block-luminance embeddings, [[graft.functions
  * .VecSumAgg]] + cosine for the budgeted prune, [[graft.store
  * .VectorStore.loadFrame]] for the mount — and records per-stage WALL
  * + SHUFFLE bytes via a task-metrics listener (the CorpusFunnelBench
  * instrument), so q167's "every stage is a scan or an id-sized
  * semi-join; blobs never shuffle" claim is a measured row per stage:
  *
  *  - stage 1 media dedup: one narrow decode+dHash pass (blobs read,
  *    64-bit codes emitted), then the 4×16 banded bucket join + exact
  *    verify — the only corpus-wide shuffle moves (band, bucket, id,
  *    hash) rows, never payload bytes.
  *  - stage 2 embed: ONE more decode pass over dedup survivors
  *    (id-sized left-semi against the blob table); features are 72
  *    floats per asset, the last time payload bytes are touched.
  *  - stage 3 outlier prune: the centroid is one map-side-partial
  *    aggregate collapsing to 72 doubles; the budget cut is a top-m
  *    (TakeOrdered, never a full sort); the survivor filter is an
  *    m-sized anti-join.
  *  - stage 4 store load + retrieval: the mount ingests id+vector rows
  *    (blobs long gone); the closing search proves the funnel's point —
  *    the query image's planted near-dup no longer surfaces.
  *
  * Audio and video legs run these IDENTICAL kernels with only the
  * hash/feature functions swapped (q151/q154, q165/q166), so the image
  * point carries the composition claim; MediaDedupBench already
  * scale-points their hash+pair stages (200k WAVs, 50k MP4s).
  *
  * Stage requires make the measured run a correctness run: planted
  * pair recovery ≥99 % with ZERO false positives, the prune removes
  * exactly its budget, the store serves exactly the survivor count,
  * and the curated index no longer surfaces the planted duplicate.
  *
  * Run: `sbt 'runMain graft.examples.MediaFunnelBench'`
  * (GRAFT_MFUNNEL_IMAGES overrides the asset count, default 100000).
  */
object MediaFunnelBench {

  private val N = sys.env.getOrElse("GRAFT_MFUNNEL_IMAGES", "100000").toLong
  private val PruneBudget = (N / 100).max(1L) // 1% — a RATE, the q167/
  // SemDeDup discipline: budgets keep pruned volume predictable at any
  // corpus size

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "graft-media-funnel-bench")
    import spark.implicits._
    val sc = spark.sparkContext

    // task-metrics listener: per-stage shuffle byte deltas (the
    // CorpusFunnelBench instrument)
    val shRead = new java.util.concurrent.atomic.AtomicLong(0)
    val shWrite = new java.util.concurrent.atomic.AtomicLong(0)
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })
    def shuffled[A](label: String)(f: => A): (A, Double, Long) = {
      Thread.sleep(300) // listener drain before the snapshot
      val r0 = shRead.get() + shWrite.get()
      val (a, sec) = time(f)
      Thread.sleep(300)
      val bytes = shRead.get() + shWrite.get() - r0
      println(f"$label%-22s ${sec}%8.2f s   shuffle ${bytes / 1e6}%10.2f MB")
      (a, sec, bytes)
    }

    val root = java.nio.file.Files
      .createTempDirectory("graft_mfunnel_").toString

    // ---- corpus: the graded fixture's recipe at scale — real BMPs,
    // every 10th id a retouched near-copy of its predecessor
    val (_, genSec) = time {
      spark.range(N)
        .mapPartitions(_.map(id =>
          (id, MediaDedup.encodeBmp(MediaDedup.pixelsFor(id)))))
        .toDF("id", "payload")
        .write.parquet(s"$root/images")
    }
    val atRest = PqBenchDirBytes.dirBytes(s"$root/images")
    println(f"gen                    ${genSec}%8.2f s   ($N BMPs, ${atRest / 1e6}%.0f MB at rest)")
    val blobs = spark.read.parquet(s"$root/images")

    // ---- stage 1: perceptual dedup — decode+dHash (narrow), banded
    // candidates + exact verify (the shared nearDupPairs kernel), then
    // keep-canonical: drop every verified pair's id_b side
    val ((s1, n1), _, _) = shuffled("media_dedup") {
      // pin the 64-bit codes before the banded SELF-join — unpinned,
      // both join sides would re-run the decode pass (the
      // MediaDedupBench discipline: hash once, join codes)
      val hashed = blobs.as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, p) => (id, MediaDedup.dhash(p)) })
        .toDF("id", "hash").persist()
      hashed.count()
      val pairs = MediaDedup
        .nearDupPairs(hashed, MediaDedup.DHashMaxHamming).persist()
      val found = pairs.count()
      val falsePos = pairs
        .where(!(col("id_b") === col("id_a") + 1 && col("id_b") % 10 === 9))
        .count()
      require(falsePos == 0, s"dedup emitted $falsePos non-planted pairs")
      require(found >= (N / 10) * 99 / 100,
        s"dedup found $found of ${N / 10} planted pairs (<99%)")
      val s = spark.range(N).select(col("id"))
        .join(pairs.select(col("id_b").as("id")).distinct(),
          Seq("id"), "left_anti")
        .persist()
      val n = s.count()
      pairs.unpersist(blocking = false)
      hashed.unpersist(blocking = false)
      (s, n)
    }
    require(n1 < N, "dedup removed nothing")

    // ---- stage 2: embed — ONE more decode pass over survivors only
    // (id-sized semi-join onto the blob table); 72 floats out per asset,
    // the last time payload bytes are touched
    val ((feats, n2), _, _) = shuffled("embed") {
      val f = blobs.join(s1, Seq("id"), "left_semi")
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, p) =>
          (id, MediaVectorSearch.imageFeature(p).toSeq) })
        .toDF("id", "values")
        .persist()
      (f, f.count())
    }
    require(n2 == n1, s"embed changed the survivor count ($n1 -> $n2)")

    // ---- stage 3: budgeted centroid-outlier prune — q167's arithmetic:
    // centroid = map-side-partial vecSum collapsing to 72 doubles;
    // rank by (cos asc, id asc), cut exactly PruneBudget (TakeOrdered,
    // never a full sort); m-sized anti-join filters survivors
    val ((s3, n3), _, _) = shuffled("outlier_prune") {
      val cent = feats
        .agg(graft.functions.VecSumAgg.vecSum(
          col("values").cast("array<double>"), MediaVectorSearch.Dim).as("s"))
        .head().getSeq[Double](0).map(_.toFloat)
      val scored = feats.withColumn("cc",
        graft.functions.VectorFunctions.cosineSim(col("values"),
          typedLit(cent.toSeq)))
      val dropIds = scored.orderBy(col("cc"), col("id"))
        .limit(PruneBudget.toInt).select(col("id"))
      val s = feats.join(dropIds, Seq("id"), "left_anti").persist()
      (s, s.count())
    }
    require(n3 == n2 - PruneBudget,
      s"prune cut ${n2 - n3}, budget was $PruneBudget")

    // ---- stage 4: store load + retrieval — the mount ingests id+vector
    // rows; the closing search is the funnel's observable point
    val ((store, n4), _, _) = shuffled("store_load") {
      val st = new graft.store.VectorStore(spark)
      st.loadFrame(s3.select(col("id").cast("string").as("id"),
        col("values")), "mfunnel")
      (st, st.totalCount())
    }
    require(n4 == n3, s"store serves $n4 of $n3 survivors")

    // query = the survivor id ≡ 8 (mod 10) most correlated with the
    // centroid (deterministically inside the prune's keep set); its
    // planted near-copy (id+1 ≡ 9) was removed at stage 1, so the
    // curated index must no longer surface the duplicate
    val qid = s3.where(col("id") % 10 === 8)
      .withColumn("cc", graft.functions.VectorFunctions.cosineSim(
        col("values"),
        typedLit(s3.agg(graft.functions.VecSumAgg.vecSum(
          col("values").cast("array<double>"), MediaVectorSearch.Dim))
          .head().getSeq[Double](0).map(_.toFloat).toSeq)))
      .orderBy(desc("cc"), col("id")).limit(1)
      .head().getLong(0)
    val qv = MediaVectorSearch.imageFeature(
      blobs.where(col("id") === qid).head().getAs[Array[Byte]]("payload")).toSeq
    val ((_, topHit), _, _) = shuffled("retrieval") {
      val hits = store.findSimilar(qv, k = 2, namespace = "mfunnel")
      require(hits.headOption.exists(_.id == qid.toString),
        s"query image $qid must top its own curated search")
      require(!hits.exists(_.id == (qid + 1).toString),
        s"the planted near-dup ${qid + 1} survived curation into the top-k")
      (hits, hits(1).id)
    }

    println(s"""{"n":$N,"stages":[$N,$n1,$n3,$n4],"prune_budget":$PruneBudget,"query":$qid,"top_non_self":"$topHit"}""")
    spark.stop()
  }
}
