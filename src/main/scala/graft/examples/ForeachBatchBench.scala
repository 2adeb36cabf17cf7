package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.GraftSession
import graft.operators.Bq

/** Sources the r17 SCALING claim for the foreachBatch streaming route
  * (q188/q189/q191): a kernel a stream-static join cannot express (the
  * BQ hamming cut has no pruning key; the HNSW beam is iterative) still
  * serves a query stream at throughput that tracks ARRIVAL BATCHING —
  * each micro-batch pays one batch-kernel invocation (one standing-codes
  * sweep + bounded-heap cut), so per-query cost is that fixed dispatch
  * amortized over the batch's queries.
  *
  * Setup: 8k×64d corpus, midpoint grid + one-BIGINT sign-bit codes
  * standing (the q188 artifacts); 128 queries delivered twice — as 128
  * single-query files and as 4 files of 32 — each drained with
  * maxFilesPerTrigger=1, so the file count IS the micro-batch count.
  * Identical per-query answers both ways (the q188 parity claim);
  * identical total candidate volume; only the batching differs.
  *
  * Measured (local[32]): see the printed lines — the single-query
  * drain pays ~the per-batch kernel floor × 128, the 32-query drain
  * pays it × 4; the one-shot batch kernel over all 128 queries is the
  * lower bound the stream approaches as arrival batches widen.
  *
  * The 10×-scale point (r18, SPARK_GRAFT_FB_N=655360 — 640k×64d, 80×
  * the default corpus): one-shot 4.8 s, 4-batch stream 5.0 s (26 q/s),
  * 128-batch stream 31.0 s (4 q/s), per-micro-batch kernel floor
  * ~0.24 s, 4-vs-128-batch amortization 6.2× — the amortization claim
  * holds with the corpus 80× larger because the floor is DISPATCH, not
  * data: the standing 8-byte codes sweep (5 MB at 640k) rides inside
  * it. Candidate counts asserted batching-invariant at both scales. */
object ForeachBatchBench {

  // default 8k; SPARK_GRAFT_FB_N=655360 is the 10×-scale point (80× this
  // default) recorded in SCALING.md r18
  private val N = sys.env.getOrElse("SPARK_GRAFT_FB_N", "8192").toLong
  private val Dim = 64
  private val Q = 128L

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "foreach-batch-bench")

    val corpus = spark.range(N).select(
      col("id").as("vec_id"),
      expr(s"transform(sequence(0, ${Dim - 1}), " +
        "j -> cast(sin(id * 0.137 + j * 1.71) + cos(id * 0.011 * (j + 1)) as float))")
        .as("embedding"))
      .persist()
    corpus.count()
    val mids = Bq.midpointGrid(corpus)
    val codes = corpus
      .withColumn("__mids", typedLit(mids.toSeq))
      .withColumn("code", expr(Bq.packExpr64("embedding", "__mids")))
      .select(col("vec_id"), col("code"))
      .persist()
    val (_, tCodes) = time(codes.count())

    val queries = spark.range(N, N + Q).select(
      col("id").as("qid"),
      expr(s"transform(sequence(0, ${Dim - 1}), " +
        "j -> cast(sin(id * 0.137 + j * 1.71) + cos(id * 0.013 * (j + 1)) as float))")
        .as("qv"))

    val qSchema = StructType(Seq(
      StructField("qid", LongType),
      StructField("qv", ArrayType(FloatType))))

    // the lower bound: ONE batch-kernel invocation over all Q queries
    val allQCodes = queries
      .withColumn("__mids", typedLit(mids.toSeq))
      .withColumn("qcode", expr(Bq.packExpr64("qv", "__mids")))
      .select(col("qid"), col("qcode"))
    val (nOneShot, tOneShot) = time(
      Bq.hammingCut(codes, allQCodes).count())

    def drain(files: Int): (Long, Double) = {
      val qdir = java.nio.file.Files
        .createTempDirectory(s"graft_fbb_q$files-").toString
      queries.repartition(files).write.mode("overwrite").parquet(qdir)
      val got = new java.util.concurrent.atomic.AtomicLong(0)
      val stream = spark.readStream.schema(qSchema)
        .option("maxFilesPerTrigger", "1").parquet(qdir)
        .withColumn("__mids", typedLit(mids.toSeq))
        .withColumn("qcode", expr(Bq.packExpr64("qv", "__mids")))
        .select(col("qid"), col("qcode"))
        .writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          got.addAndGet(Bq.hammingCut(codes, batch).count())
          ()
        }.start()
      val (_, t) = time { try stream.processAllAvailable() finally stream.stop() }
      (got.get(), t)
    }

    val (nWide, tWide) = drain(4)      // 4 micro-batches of 32
    val (nNarrow, tNarrow) = drain(128) // 128 micro-batches of 1
    require(nWide == nNarrow && nWide == nOneShot,
      "candidate volume must not depend on arrival batching")

    println(f"codes standing ($N%d×$Dim, 8 B/row): $tCodes%.1f s")
    println(f"one-shot kernel, $Q%d queries in ONE call: $tOneShot%.1f s " +
      f"($nOneShot%d candidate rows)")
    println(f"stream, 4 micro-batches of 32:  $tWide%.1f s = ${Q / tWide}%.0f q/s")
    println(f"stream, 128 micro-batches of 1: $tNarrow%.1f s = ${Q / tNarrow}%.0f q/s")
    println(f"per-micro-batch kernel floor: ~${tNarrow / 128}%.2f s; " +
      f"amortization 4-batch/128-batch = ${tNarrow / tWide}%.1fx")
    println("claim: foreachBatch pays one batch-kernel dispatch per " +
      "micro-batch - throughput tracks arrival batching and approaches " +
      "the one-shot kernel as batches widen; answers are batching-" +
      "invariant (candidate counts asserted equal)")
    spark.stop()
  }
}
