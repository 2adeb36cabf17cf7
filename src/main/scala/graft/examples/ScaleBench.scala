package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Scaling experiment: exact all-pairs near-dup vs LSH-blocked candidates
  * + exact verify, on replicated copies of the sf0.1 embeddings corpus
  * (2k → 16k vectors; each copy id-offset and deterministically
  * perturbed so vectors stay distinct while preserving the similarity
  * structure). Quantifies the crossover SCALING.md argues for.
  * Run: `sbt 'runMain graft.examples.ScaleBench'`.
  */
object ScaleBench {

  // two regimes: 0.35 = "loosely similar" (≈70° — adversarial for
  // hyperplane LSH), 0.9 = true near-duplicates (the dedup regime, where
  // the replicated copies plant cross-copy pairs at sim ≈ 0.9999)
  private val Thresholds = Seq(0.35, 0.9)
  private val Bands = 16
  private val BitsPerBand = 8 // coarser than Ann: near-dup pairs are much
                              // more similar than knn neighbors
  private val Dim = 64

  private lazy val planes: IndexedSeq[IndexedSeq[Array[Float]]] = {
    val rnd = new scala.util.Random(11)
    IndexedSeq.fill(Bands)(IndexedSeq.fill(BitsPerBand)(
      Array.fill(Dim)(rnd.nextGaussian().toFloat)))
  }

  private def corpus(spark: SparkSession, copies: Int): DataFrame = {
    val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    (0 until copies).map { i =>
      base.select(
        (col("vec_id") + lit(i.toLong * 1000000L)).as("vec_id"),
        transform(col("embedding"),
          x => (x + lit(i * 1e-4f)).cast("float")).as("embedding"))
    }.reduce(_ union _).localCheckpoint(true)
  }

  private def exactPairs(e: DataFrame, simT: Double): Long = {
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    a.join(broadcast(b), col("ia") < col("ib"))
      .where(cosineSim(col("va"), col("vb")) >= simT)
      .count()
  }

  /** The engine's ACTUAL below-gate exact shape since round 5: one scan
    * through the CosNeighbors kernel (matrix rides the plan). */
  private def kernelPairs(e: DataFrame, simT: Double): Long = {
    val rows = e.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    e.select(col("vec_id").as("ia"),
        explode(graft.functions.CosNeighbors(col("vec_id"), col("embedding"),
          rows.map(_._1), rows.map(_._2), simT)).as("p"))
      .where(col("p.score") >= simT)
      .count()
  }

  private def lshPairs(e: DataFrame, simT: Double): Long = {
    val planesSeq: Seq[Seq[Seq[Float]]] =
      planes.map(_.map(_.toSeq: Seq[Float]).toSeq).toSeq
    val banded = e
      .withColumn("sig_arr", graft.functions.LshSignature(col("embedding"), planesSeq))
      .select(col("vec_id"), col("embedding"),
        posexplode(col("sig_arr")).as(Seq("band", "bucket")))
      .localCheckpoint(true)
    val x = banded.select(col("vec_id").as("ia"), col("embedding").as("va"),
      col("band"), col("bucket"))
    val y = banded.select(col("vec_id").as("ib"), col("embedding").as("vb"),
      col("band"), col("bucket"))
    x.join(y, Seq("band", "bucket"))
      .where(col("ia") < col("ib"))
      .select(col("ia"), col("ib"), col("va"), col("vb"))
      .distinct()
      .where(cosineSim(col("va"), col("vb")) >= simT)
      .count()
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(16, "graft-scale-bench")
    spark.range(10).count()
    for (copies <- Seq(2, 4, 8); simT <- Thresholds) {
      val e = corpus(spark, copies)
      val n = e.count()
      def t(body: => Long): (Long, Double) = {
        val t0 = System.nanoTime()
        val r = body
        (r, (System.nanoTime() - t0) / 1e9)
      }
      val (exactN, exactS) = t(exactPairs(e, simT))
      val (kernN, kernS) = t(kernelPairs(e, simT))
      val (lshN, lshS) = t(lshPairs(e, simT))
      val recall = if (exactN == 0) 1.0 else lshN.toDouble / exactN
      println(f"[scale] n=$n%6d t=$simT%.2f exactJoin=${exactS}%7.2fs ($exactN%9d)  " +
        f"kernel=${kernS}%7.2fs ($kernN%9d)  " +
        f"lsh=${lshS}%7.2fs ($lshN%9d, recall=$recall%.3f)")
    }
    spark.stop()
  }
}
