package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.sources.Tables

/** Approximate-nearest-neighbor search over the embedding column — the
  * scale path for the reference's HNSW index (SURVEY §2.3/§7: HNSW parity
  * is not required; its *semantics* — approximate top-k — are met by
  * LSH-bucketed candidate generation + exact rerank).
  *
  *  - q31 (correctness contract): brute-force batch top-k. One broadcast
  *    of the query set, one scan of the corpus, per-query window rank.
  *    At 100 TB this is the exact-rerank building block, not the index.
  *  - q32 (scale path): random-hyperplane LSH for cosine. Each vector gets
  *    B band signatures (R sign-bits each, packed to a long); candidates
  *    are vectors sharing any band bucket with the query; exact cosine
  *    reranks the candidates. Corpus signatures are one linear pass;
  *    the candidate join is an equi-join on (band, bucket) — at scale the
  *    shuffle carries only (band, bucket, id), never raw vectors, and the
  *    rerank joins values back by id. Recall is tunable via B and R:
  *    B=16 bands × R=4 bits measures recall@5 ≈ 0.84 on the synthetic
  *    corpus (near-orthogonal vectors — the adversarial case for
  *    hyperplane LSH; clustered real-world corpora allow wider bands).
  *    AnnSpec asserts the floor vs q31.
  *
  * Hyperplanes are seeded-deterministic so signatures are stable across
  * runs and executors.
  */
object Ann {

  private val NumQueries = 5
  private val K = 5
  private val Bands = 16
  private val BitsPerBand = 4
  private val Dim = 64

  private def embeddings(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "embeddings")

  private def queryFrame(spark: SparkSession, dir: String): DataFrame =
    embeddings(spark, dir)
      .where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))

  // ---- Q31: brute-force batch top-k (exact, oracle-checked) -----------

  def q31(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("vec_id"))
    embeddings(spark, dir)
      .crossJoin(broadcast(queryFrame(spark, dir)))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("score", round(cosineSim(col("embedding"), col("qv")), 4))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= K)
      .select(col("qid"), col("rank"), col("vec_id").as("id"), col("score"))
      .orderBy(col("qid"), col("rank"))
  }

  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), p -> p[1]::DOUBLE * p[2]::DOUBLE))"
  private def cosSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"

  val q31Sql: String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
       |           WHERE vec_id < $NumQueries),
       |s AS (
       |  SELECT q.qid, e.vec_id AS id,
       |         round(${cosSql("e.embedding", "q.qv")}, 4) AS score
       |  FROM embeddings e, q WHERE e.vec_id <> q.qid),
       |r AS (
       |  SELECT qid, id, score,
       |         row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rank
       |  FROM s)
       |SELECT qid, rank::INT AS rank, id, score FROM r WHERE rank <= $K
       |ORDER BY qid, rank""".stripMargin

  // ---- Q32: LSH-bucketed ANN (approximate, measured by AnnSpec) -------

  /** Seeded random hyperplanes: Bands × BitsPerBand unit-free gaussian
    * directions in R^Dim. */
  private lazy val hyperplanes: IndexedSeq[IndexedSeq[Array[Float]]] = {
    val rnd = new scala.util.Random(7)
    IndexedSeq.fill(Bands)(IndexedSeq.fill(BitsPerBand)(
      Array.fill(Dim)(rnd.nextGaussian().toFloat)))
  }

  /** (row..., band, bucket) — one row per band per input row. All band
    * signatures come from one fused LshSignature pass (the composed
    * one-Column-per-plane form re-read the vector 64×); posexplode turns
    * the signature array into (band index, bucket) rows. */
  private def withBandSigs(df: DataFrame, vec: Column): DataFrame = {
    val planesSeq: Seq[Seq[Seq[Float]]] =
      hyperplanes.map(_.map(_.toSeq: Seq[Float]).toSeq).toSeq
    df.withColumn("sig_arr", graft.functions.LshSignature(vec, planesSeq))
      .select(col("*"), posexplode(col("sig_arr")).as(Seq("band", "bucket")))
      .drop("sig_arr")
  }

  def q32(spark: SparkSession, dir: String): DataFrame = {
    val corpusSigs = withBandSigs(
      embeddings(spark, dir).select(col("vec_id"), col("embedding")),
      col("embedding"))
      .select(col("vec_id"), col("band"), col("bucket"))
    val querySigs = withBandSigs(queryFrame(spark, dir), col("qv"))
      .select(col("qid"), col("band"), col("bucket"))
    val cand = corpusSigs.join(broadcast(querySigs), Seq("band", "bucket"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"))
      .distinct()
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("vec_id"))
    cand
      .join(embeddings(spark, dir).select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(broadcast(queryFrame(spark, dir)), Seq("qid"))
      .withColumn("score", round(cosineSim(col("embedding"), col("qv")), 4))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= K)
      .select(col("qid"), col("rank"), col("vec_id").as("id"), col("score"))
      .orderBy(col("qid"), col("rank"))
  }

  // ---- IVF: k-means coarse quantizer + nprobe (the second scale path) --
  // The inverted-file layout: vectors are bucketed by nearest centroid;
  // a query probes only its nProbe closest cells and reranks exactly.
  // At 100 TB the cell id becomes the partition/bucket column, so a
  // search touches nProbe/nCells of the data. MLlib KMeans (seeded)
  // plays the role of the coarse quantizer; training is a sample-sized
  // job, assignment is one linear pass.

  private val NumCells = 16
  private val NumProbe = 4
  private val KmeansSeed = 42L

  def ivfTopK(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val e = embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .withColumn("fv", array_to_vector(col("embedding")))
      .localCheckpoint(true)
    val model = new KMeans()
      .setK(NumCells).setSeed(KmeansSeed).setFeaturesCol("fv")
      .setMaxIter(5).setInitMode("random") // coarse quantizer: cheap training is fine
      .fit(e)
    val assigned = model.transform(e)
      .select(col("vec_id"), col("embedding"), col("prediction").as("cell"))

    // probe list per query: nProbe nearest centroids (driver-side — the
    // query batch and the centroid table are both request-sized)
    val centers = model.clusterCenters.map(_.toArray.map(_.toFloat))
    val queries = queryFrame(spark, dir).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val probeRows = queries.flatMap { case (qid, qv) =>
      centers.zipWithIndex
        .map { case (c, i) =>
          var d = 0.0
          var k = 0
          while (k < qv.length) {
            val diff = qv(k).toDouble - c(k).toDouble; d += diff * diff; k += 1
          }
          (i, d)
        }
        .sortBy(_._2).take(NumProbe)
        .map { case (cell, _) => (qid, cell) }
    }
    import spark.implicits._
    val probes = probeRows.toSeq.toDF("qid", "cell")

    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("vec_id"))
    assigned.join(broadcast(probes), Seq("cell"))
      .where(col("vec_id") =!= col("qid"))
      .join(broadcast(queryFrame(spark, dir)), Seq("qid"))
      .withColumn("score", round(cosineSim(col("embedding"), col("qv")), 4))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= K)
      .select(col("qid"), col("rank"), col("vec_id").as("id"), col("score"))
      .orderBy(col("qid"), col("rank"))
  }

  // ---- registry -------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31_ann_brute_topk" -> (q31 _),
    "q32_ann_lsh_topk" -> (q32 _),
    "q33_ann_ivf_topk" -> (ivfTopK _))

  /** q32 is approximate by design → no SQL oracle (rows-only check);
    * AnnSpec asserts its recall against q31. */
  val oracles: Map[String, String] = Map(
    "q31_ann_brute_topk" -> q31Sql)
}
