package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Det
import graft.functions.VectorFunctions.l2sq
import graft.sources.Tables

/** Embedding-space clustering — the grouping primitive a training-data
  * pipeline uses for diversity sampling, topic balancing, and semantic
  * dedup cohorts (and the same step IVF's coarse quantizer trains with,
  * `Ann.scala` q33).
  *
  * q80 grades ONE full Lloyd iteration — assignment + centroid update —
  * because one iteration exercises every distributed shape k-means has:
  *  - assignment: corpus ⨯ broadcast(seeds) → per-row argmin. The agg is
  *    `min(struct(dist, cid))` — map-side combinable, no window sort, and
  *    the struct order encodes the tie-break (lowest cell id) that the
  *    oracle replays with `ORDER BY d, cid`.
  *  - update: posexplode to (cid, dim) cells → avg. Per-partition partial
  *    aggs collapse to ≤ k×dim rows each before the exchange, so the
  *    shuffle is k×dim-sized regardless of corpus size — the same
  *    register-matrix shape as the q76/q77 sketches.
  * Iterating is a driver loop over this plan with the new centroids
  * re-broadcast; at 100 TB each iteration is one corpus scan (the thing
  * to minimize) and nothing else grows with the data.
  *
  * Determinism: seeds are the k lowest-id vectors (k-means++ would need
  * an RNG the oracle can't replay); distances are the shared float32→
  * double kernels, bit-identical in DuckDB via [[Det.l2sqSql]], so ties
  * break identically and the ASSIGNMENT is exact — only the averaged
  * centroid statistics carry float-sum noise, absorbed by [[Det.r4]].
  */
object Clustering {

  private[graft] val KmK = 8 // seed count: vec_id < 8

  private def embeddings(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "embeddings")

  def q80(spark: SparkSession, dir: String): DataFrame = {
    val seeds = embeddings(spark, dir).where(col("vec_id") < KmK)
      .select(col("vec_id").as("cid"), col("embedding").as("sv"))
    // assignment: argmin over k broadcast seeds; embedding carried
    // through the agg (first() over identical per-group values) so the
    // update step needs no corpus self-join
    val asg = embeddings(spark, dir)
      .crossJoin(broadcast(seeds))
      .withColumn("d", l2sq(col("embedding"), col("sv")))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d"), col("cid"))).as("m"),
        first(col("embedding")).as("embedding"))
      .select(col("vec_id"), col("m.cid").as("cid"), col("m.d").as("d"),
        col("embedding"))
    // update: per-(cluster, dim) mean — the k×dim register matrix
    val centroids = asg
      .select(col("cid"), posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy(col("cid"), col("i"))
      .agg(avg(col("x").cast("double")).as("mu"))
    val drift = centroids
      .join(broadcast(seeds.select(col("cid"),
        posexplode(col("sv")).as(Seq("i", "sx")))), Seq("cid", "i"))
      .withColumn("t", (col("sx").cast("double") - col("mu")) *
        (col("sx").cast("double") - col("mu")))
      .groupBy(col("cid")).agg(sum(col("t")).as("drift"))
    asg.groupBy(col("cid"))
      .agg(count(lit(1)).as("n"), avg(col("d")).as("avg_d"))
      .join(drift, Seq("cid"))
      .select(col("cid"), col("n"), Det.r4(col("avg_d")).as("avg_d"),
        Det.r4(col("drift")).as("drift"))
      .orderBy(col("cid"))
  }

  val q80Sql: String = {
    val dim = 64
    s"""WITH seeds AS (
       |  SELECT vec_id AS cid, embedding AS sv FROM embeddings
       |  WHERE vec_id < $KmK),
       |d AS (
       |  SELECT e.vec_id, s.cid, e.embedding,
       |         ${Det.l2sqSql("e.embedding", "s.sv")} AS d
       |  FROM embeddings e, seeds s),
       |asg AS (
       |  SELECT vec_id, cid, d, embedding FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |                                 ORDER BY d, cid) AS rn FROM d)
       |  WHERE rn = 1),
       |m AS (
       |  SELECT cid, g.i, avg(embedding[g.i + 1]::DOUBLE) AS mu
       |  FROM asg, range($dim) g(i) GROUP BY 1, 2),
       |dr AS (
       |  SELECT s.cid,
       |         sum((s.sv[m.i + 1]::DOUBLE - m.mu) *
       |             (s.sv[m.i + 1]::DOUBLE - m.mu)) AS drift
       |  FROM seeds s JOIN m ON m.cid = s.cid GROUP BY 1)
       |SELECT a.cid, count(*) AS n,
       |       ${Det.r4Sql("avg(a.d)")} AS avg_d,
       |       ${Det.r4Sql("any_value(dr.drift)")} AS drift
       |FROM asg a JOIN dr ON dr.cid = a.cid
       |GROUP BY a.cid ORDER BY a.cid""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q80_kmeans_step" -> (q80 _))

  val oracles: Map[String, String] = Map(
    "q80_kmeans_step" -> q80Sql)
}
