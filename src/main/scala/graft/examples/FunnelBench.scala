package graft.examples

import org.apache.spark.sql.functions._

import graft.store.VectorStore

/** Sources the q167 funnel's scale claims with measured numbers (the
  * MediaDedupBench discipline, which covers the dedup stage at 100k/
  * 200k/50k — this bench measures the funnel's OTHER stages on the
  * heaviest modality at GRAFT_FUNNEL_N images, default 50k):
  *
  *  1. embed — decode + centered block-sum features: one narrow
  *     mapPartitions pass, must stay linear;
  *  2. centroid — ONE map-side-partial aggregate collapsing to 72
  *     doubles on the driver regardless of corpus size (the flat-
  *     marginal claim: driver traffic is dim-sized, like the GD loop);
  *  3. prune cut — cos-to-centroid + top-m (budgeted): a scan plus a
  *     bounded heap, no shuffle of features;
  *  4. store load + one retrieval over the curated namespace.
  *
  * Asserts the prune returns exactly its budget and retrieval returns
  * k, so the measured run is also a correctness run.
  * Run: `sbt 'runMain graft.examples.FunnelBench'`. */
object FunnelBench {

  private val PruneM = 500
  private val K = 10

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "graft-funnel-bench")
    import spark.implicits._
    val n = sys.env.getOrElse("GRAFT_FUNNEL_N", "50000").toLong
    val root = java.nio.file.Files.createTempDirectory("graft_funnelbench_").toString

    val (_, genSec) = time {
      spark.range(n)
        .mapPartitions(_.map(id =>
          (id, graft.multimodal.MediaDedup.encodeBmp(
            graft.multimodal.MediaDedup.pixelsFor(id)))))
        .toDF("id", "payload")
        .write.parquet(s"$root/images")
    }

    def features() = spark.read.parquet(s"$root/images")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        (id.toString, graft.multimodal.MediaVectorSearch.imageFeature(p).toSeq)
      })
      .toDF("id", "values")
    features().write.format("noop").mode("overwrite").save() // warm
    val (_, embedSec) = time(
      features().write.format("noop").mode("overwrite").save())

    val feats = features().persist()
    feats.count()

    // centroid: the integer-exact sum via the GD loop's one-pass typed
    // aggregate — 72 doubles reach the driver
    val (cent, centSec) = time {
      feats.agg(graft.functions.VecSumAgg.vecSum(
        col("values").cast("array<double>"), 72).as("s"))
        .head().getSeq[Double](0).map(_.toFloat).toArray
    }

    val (cutN, cutSec) = time {
      feats.withColumn("cc",
        graft.functions.VectorFunctions.cosineSim(col("values"),
          typedLit(cent.toSeq)))
        .orderBy(col("cc"), col("id")).limit(PruneM)
        .count()
    }
    require(cutN == PruneM, s"prune cut returned $cutN, budget $PruneM")

    val store = new VectorStore(spark)
    val (_, loadSec) = time { store.loadFrame(feats, "funnel") }
    val q = graft.multimodal.MediaVectorSearch.imageFeature(
      graft.multimodal.MediaDedup.encodeBmp(
        graft.multimodal.MediaDedup.pixelsFor(8L))).toSeq
    store.findSimilar(q, k = K, namespace = "funnel") // warm
    val (hits, searchSec) = time(
      store.findSimilar(q, k = K, namespace = "funnel"))
    require(hits.size == K)

    println(f"n=$n gen=$genSec%.1fs embed=$embedSec%.1fs " +
      f"(${n / embedSec}%.0f imgs/s) centroid=$centSec%.2fs " +
      f"(72 doubles to driver) prune_cut=$cutSec%.2fs " +
      f"load=$loadSec%.1fs search=$searchSec%.2fs")
    spark.stop()
  }
}
