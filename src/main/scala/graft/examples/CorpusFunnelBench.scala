package graft.examples

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{AdcKernels, FeatureHashVec}

/** Sources the r19 SCALING claim for the TEXT curation funnel's
  * economics at ~1M documents (VERDICT r18 "Next round" #7: q161/q167/
  * q177 are the composed product shape, but their stage costs were
  * measured only at fixture scale). Re-expresses q177's four gates over
  * a synthetic 1M-doc corpus with planted exact duplicates and a
  * benchmark set drawn from the corpus, using the SAME library kernels
  * the graded funnel runs ([[FeatureHashVec]] signed hash features,
  * [[AdcKernels.dotDD]] + sigmoid quality gate, md5-digest dedup,
  * word-13-gram containment vs a broadcast bench-gram literal, fused
  * 64-way cosine vs broadcast bench vectors), and records per-stage
  * WALL + SHUFFLE bytes via a task-metrics listener, so the "text never
  * re-shuffles; every stage is a scan + an id-sized semi-join" claim is
  * a measured row per stage instead of a plan-shape argument.
  *
  *  - stage 1 quality gate: one fused feature-hash scan, no shuffle.
  *  - stage 2 exact dedup: the funnel's ONLY corpus-wide shuffle, and
  *    it moves (digest, doc_id) pairs — never text.
  *  - stage 3 n-gram decontam: gram hashes as a fused HOF column,
  *    containment vs a ~1.8k-long broadcast literal — no shuffle.
  *  - stage 4 semantic decontam: one feature evaluation per doc joined
  *    against the broadcast bench side (q174's shape) — the only
  *    shuffle is the map-side-collapsed per-doc max.
  *  - semi-joins between stages broadcast id-sized survivor frames.
  *
  * Stage requires make the measured run a correctness run: the quality
  * gate keeps a nontrivial fraction, dedup removes the planted dup
  * mass among survivors, decontam removes the bench docs' keepers.
  *
  * Run: `sbt 'runMain graft.examples.CorpusFunnelBench'`
  * (SPARK_GRAFT_CFUNNEL_N overrides the doc count, default 1000000).
  */
object CorpusFunnelBench {

  private val N = sys.env.getOrElse("SPARK_GRAFT_CFUNNEL_N", "1000000").toLong
  private val Words = 40
  private val DupMod = 50L   // id % 50 == 1 → exact copy of id-1
  private val BenchN = 64

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "graft-corpus-funnel-bench")
    import spark.implicits._
    val sc = spark.sparkContext

    // task-metrics listener: per-stage shuffle byte deltas
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
      .createTempDirectory("graft_cfunnel_").toString

    // ---- corpus: 40 md5-derived words per doc; every 50th doc is an
    // exact copy of its predecessor (the dedup stage's planted mass)
    val (_, genSec) = time {
      spark.range(N)
        .withColumn("seed",
          when(col("id") % DupMod === 1, col("id") - 1).otherwise(col("id")))
        .withColumn("text", concat_ws(" ",
          (0 until Words).map(j =>
            substring(md5(concat(col("seed"), lit(s"_$j"))), 1, 8)): _*))
        .select(col("id").as("doc_id"), col("text"))
        .write.parquet(s"$root/docs")
    }
    println(f"gen                    ${genSec}%8.2f s   ($N docs)")
    val docs = spark.read.parquet(s"$root/docs")

    // fixed 64-dim weights: alternating ±0.05 over the signed hash
    // counts → the gate keeps a data-derived ~half of the corpus
    val w: Seq[Double] =
      (0 until FeatureHashVec.Dims).map(i => if (i % 2 == 0) 0.05 else -0.05)
    def feats(c: Column): Column = FeatureHashVec(c).cast("array<double>")
    val wlit = typedLit(w)

    // ---- stage 1: model quality gate — one fused feature-hash scan
    val ((quality, n1), _, _) = shuffled("quality_gate") {
      val q = docs
        .withColumn("p",
          lit(1.0) / (lit(1.0) + exp(-AdcKernels.dotDD(feats(col("text")), wlit))))
        .where(col("p") >= 0.5)
        .select(col("doc_id"))
        .persist()
      (q, q.count())
    }
    val n0 = N
    require(n1 > N / 5 && n1 < N * 4 / 5,
      s"quality gate kept $n1 of $N - the fixed weights stopped splitting")

    // ---- stage 2: exact dedup — digest groupBy; the ONLY corpus-wide
    // shuffle, and it moves (digest, doc_id), never text
    val ((deduped, n2), dedupSec, dedupBytes) = shuffled("exact_dedup") {
      val keepers = docs
        .select(col("doc_id"), md5(col("text")).as("digest"))
        .groupBy(col("digest")).agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
      val d = quality.join(keepers, Seq("doc_id"), "left_semi").persist()
      (d, d.count())
    }
    require(n2 < n1, s"dedup removed nothing ($n1 -> $n2)")

    // ---- bench set: 64 quality-surviving docs → their word-13-gram
    // hashes (computed by the SAME expression the corpus scan runs) and
    // their feature vectors, both broadcast as literals
    val benchIds = quality.orderBy(col("doc_id")).limit(BenchN)
      .collect().map(_.getLong(0)).toSeq
    val gramCol = {
      val ws = split(col("text"), " ")
      transform(sequence(lit(1), size(ws) - lit(12)),
        i => xxhash64(concat_ws(" ", slice(ws, i, lit(13)))))
    }
    val benchDocs = docs.where(col("doc_id").isInCollection(benchIds))
    val benchGrams: Seq[Long] = benchDocs.select(explode(gramCol))
      .distinct().collect().map(_.getLong(0)).toSeq

    // ---- stage 3: n-gram decontamination — fused gram-hash HOF +
    // containment vs the broadcast literal; no shuffle
    val ((s3, n3), _, _) = shuffled("ngram_decontam") {
      val clean = docs
        .where(!arrays_overlap(gramCol, typedLit(benchGrams)))
        .select(col("doc_id"))
      val s = deduped.join(clean, Seq("doc_id"), "left_semi").persist()
      (s, s.count())
    }
    require(n3 < n2,
      s"ngram decontam removed nothing ($n2 -> $n3) - bench keepers were present")

    // ---- stage 4: semantic decontamination — q174's shape verbatim:
    // features computed ONCE per doc, broadcast bench side, fused dot +
    // map-side-partial max per doc. (The first cut of this bench used
    // greatest(64 × cosineSim(FeatureHashVec(text), lit)) in one
    // projection — Catalyst inlines the feature expression into every
    // cosine, so each row md5-hashed its tokens 64× and the stage took
    // 538 s; the broadcast-join shape runs it in ~8 s. The q174 design
    // comment's "one fused corpus scan" means ONE feature evaluation,
    // joined against the broadcast bench — not N fused copies.)
    val ((survivors, n4), _, _) = shuffled("semantic_decontam") {
      def hv(df: DataFrame, vcol: String, ncol: String): DataFrame = df
        .select(col("doc_id"),
          FeatureHashVec(col("text")).cast("array<double>").as(vcol))
        .withColumn(ncol, AdcKernels.dotDD(col(vcol), col(vcol)))
        .where(col(ncol) > 0)
      val corpus = hv(docs, "v", "n2")
      val bench = hv(benchDocs, "bv", "bn2").drop("doc_id")
      val clean = corpus.crossJoin(broadcast(bench))
        .withColumn("cos",
          AdcKernels.dotDD(col("v"), col("bv")) / sqrt(col("n2") * col("bn2")))
        .groupBy(col("doc_id")).agg(max(col("cos")).as("mc"))
        .where(col("mc") < 0.999).select(col("doc_id"))
      val s = s3.join(clean, Seq("doc_id"), "left_semi").persist()
      (s, s.count())
    }
    require(n4 <= n3, s"semantic decontam grew the survivor set")

    // ---- survivor token mass — one semi-joined scan
    val ((tokens, _), _, _) = shuffled("token_mass") {
      val t = docs.join(survivors, Seq("doc_id"), "left_semi")
        .agg(sum(size(split(col("text"), " ")))).head().getLong(0)
      (t, t)
    }

    println(s"""{"n":$N,"stages":[$n0,$n1,$n2,$n3,$n4],"survivor_tokens":$tokens}""")
    spark.stop()
  }
}
