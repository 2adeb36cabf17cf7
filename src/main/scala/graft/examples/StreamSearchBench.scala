package graft.examples

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.GraftSession
import graft.operators.Ann

/** Sources the r16 SCALING claim for q176 (streaming ANN retrieval):
  * the stream-static probe amortizes job dispatch across the
  * micro-batch — per-query cost is join work, NOT a fresh per-request
  * job — and no state store exists, so throughput tracks arrival rate.
  *
  * Setup: 8k×64d corpus, band signatures persisted once; 256 queries
  * land as 8 parquet files drained with maxFilesPerTrigger=1 → 8
  * micro-batches of 32. Each batch pays: one fused LshSignature pass
  * over its rows, the stream-static (band, bucket) equi-join, the
  * record join, stateless cosine. Dedup + per-query top-k run once,
  * post-drain, on the sink.
  *
  * Measured (local[32]): drain 256 queries in 7.5 s ≈ 34 q/s
  * end-to-end (~0.9 s per micro-batch incl. the job-dispatch floor);
  * the post-drain dedup+top-k cut over the 2.9 M scored rows adds
  * 6.1 s once. Sequential single probes pay the ~0.3 s dispatch floor
  * PER QUERY (FilteredAnnBench), so the stream form is ~10× per query
  * at this batch size and scales with it.
  *
  * A finding this bench surfaced, stated rather than hidden: the
  * 16-band × 4-bit signature policy has 16 buckets per band, so
  * beyond ~16·2⁴ rows the union of band buckets recalls most of the
  * namespace (measured here: 2.9 M scored rows ≈ 256 × corpus). The
  * md5-LSH mount is a HIGH-RECALL policy matched to the reference's
  * ≤10k-vectors-per-namespace envelope (`SURVEY §0`); a 100 TB
  * deployment serves streams from the PRUNING mounts (ivf/imi/pq/bq)
  * by swapping the probe join — the q176 shape (stateless signature →
  * stream-static probe → sink-side cut) transfers unchanged. */
object StreamSearchBench {

  private val N = 8192L
  private val Dim = 64
  private val Q = 256L
  private val Files = 8
  private val K = 10

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "stream-search-bench")

    val corpus = spark.range(N).select(
      col("id").as("vec_id"),
      expr(s"transform(sequence(0, ${Dim - 1}), " +
        "j -> cast(sin(id * 0.137 + j * 1.71) + cos(id * 0.011 * (j + 1)) as float))")
        .as("embedding"))
      .persist()
    val (_, tCorpus) = time(corpus.count())
    val sigs = Ann.withBandSigs(corpus, col("embedding"))
      .select(col("vec_id"), col("band"), col("bucket"))
      .persist()
    val (_, tSigs) = time(sigs.count())

    // Q queries as `Files` files → one micro-batch per file under
    // maxFilesPerTrigger=1 (the steady arrival shape)
    val qdir = java.nio.file.Files
      .createTempDirectory("graft_ssb_queries_").toString
    spark.range(N, N + Q).select(
      col("id").as("qid"),
      expr(s"transform(sequence(0, ${Dim - 1}), " +
        "j -> cast(sin(id * 0.137 + j * 1.71) + cos(id * 0.013 * (j + 1)) as float))")
        .as("qv"))
      .repartition(Files)
      .write.mode("overwrite").parquet(qdir)

    val qSchema = StructType(Seq(
      StructField("qid", LongType),
      StructField("qv", ArrayType(FloatType))))
    spark.catalog.dropTempView("ssb_sink")
    val stream = Ann.withBandSigs(
      spark.readStream.schema(qSchema)
        .option("maxFilesPerTrigger", "1").parquet(qdir),
      col("qv"))
      .select(col("qid"), col("qv"), col("band"), col("bucket"))
      .join(sigs, Seq("band", "bucket"))
      .join(corpus, Seq("vec_id"))
      .select(col("qid"),
        round(graft.functions.VectorFunctions
          .cosineSim(col("embedding"), col("qv")), 4).as("score"),
        col("vec_id"))
      .writeStream.outputMode("append").format("memory")
      .queryName("ssb_sink").start()
    val (_, tDrain) = time { try stream.processAllAvailable() finally stream.stop() }
    val scored = spark.table("ssb_sink")
    val nScored = scored.count()

    val (nTop, tCut) = time {
      Ann.rankTopK(scored.distinct(), K, descending = true).count()
    }

    println(f"corpus $N%d×$Dim cache: $tCorpus%.1f s; signatures: $tSigs%.1f s")
    println(f"drain $Q%d queries / $Files%d micro-batches: $tDrain%.1f s " +
      f"= ${Q / tDrain}%.0f q/s end-to-end ($nScored%d scored candidate rows)")
    println(f"post-drain dedup+top-$K%d cut: $tCut%.1f s ($nTop%d result rows)")
    println("claim: per-query cost is bucket-occupancy work amortized " +
      "over the micro-batch - no state store, no per-request job; " +
      "throughput tracks arrival rate")
    spark.stop()
  }
}
