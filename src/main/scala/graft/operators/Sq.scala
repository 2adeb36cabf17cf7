package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Det
import graft.functions.VectorFunctions.l2sq
import graft.sources.Tables

/** Scalar quantization (SQ8) — the third compression point on the ANN
  * memory/recall curve, between raw float32 (q31: 4 B/dim, exact) and
  * product quantization (q58: ~1 bit/dim, coarse). Each dimension is
  * affinely mapped to an unsigned byte against per-dim corpus min/max:
  * 4× smaller scan footprint with near-exact recall, the quantization
  * most serving systems reach for FIRST because it needs no codebook
  * training — the "codebook" is 2×dim floats.
  *
  * Distributed shape: the stats pass is a posexplode → per-dim min/max —
  * partial aggs collapse every partition to ≤ dim rows (the q76/q77
  * register-matrix shape), and min/max are ORDER-INDEPENDENT, so unlike
  * averaged statistics the quantization grid is bit-deterministic under
  * any partitioning. The grid (dim-sized, corpus-independent) rides to
  * executors as array literals; encoding is a narrow per-row `transform`,
  * no shuffle. The ADC sweep is the PQ asymmetric contract: the query
  * stays float, each row costs a fused dequantize-and-accumulate over
  * its codes; top `CandN` by (rounded ADC, id) then get an EXACT l2
  * rerank over the full vectors — candidates-are-policy, rerank-is-
  * contract, metric-coherent end to end (ADC approximates the same l2sq
  * the rerank computes, no cross-metric mixing).
  *
  * Determinism/oracle: min/max are exact, and the encode/dequantize
  * formulas are plain IEEE-754 compositions written with identical
  * association in both engines, so the oracle rebuilds the ENTIRE
  * pipeline from the base table — no persisted layout needed (vs
  * q33/q58 whose trained quantizers must be persisted to replay).
  */
object Sq {

  // ANN-family query contract (Ann.scala): 5 queries, top-5, self-excluded
  private def NumQueries = Ann.NumQueries
  private def K = Ann.K
  private[graft] val CandN = 50
  private val Levels = 255.0

  private def embeddings(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "embeddings")

  def q81(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddings(spark, dir)
    // per-dim grid: dim-sized and order-independent — safe to collect
    val stats = e.select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .orderBy(col("i")).collect()
    val mnL = typedLit(stats.map(_.getFloat(1).toDouble).toSeq)
    val mxL = typedLit(stats.map(_.getFloat(2).toDouble).toSeq)
    def mn(i: org.apache.spark.sql.Column) = element_at(mnL, i + 1)
    def sc(i: org.apache.spark.sql.Column) = element_at(mxL, i + 1) - mn(i)
    // encode: uint8 code per dim; constant dims collapse to code 0
    val coded = e
      .withColumn("codes", transform(col("embedding"), (x, i) =>
        when(sc(i) === 0.0, lit(0L)).otherwise(
          least(lit(Levels.toLong), greatest(lit(0L),
            floor(((x.cast("double") - mn(i)) / sc(i)) * lit(Levels) + lit(0.5)))))
          .cast("int")))
    // both cuts are the bounded-heap TopKAgg in ASCENDING order (l2):
    // map-side partials prune each partition to CandN/K rows, so neither
    // the ADC-scored corpus×Q frame nor the candidate scores ride a
    // row_number window's full exchange (the q74 thesis).
    // The ADC itself is the fused codegen Sq8Adc kernel (r15): the
    // composed `aggregate(zip_with(qv, xhat, …))` form ran the n×Q×dim
    // hot loop through the interpreted HOF path — measured as q81's
    // pass-1 JIT magnet (12.3 s of C2 on a 0.7 s query, bench audit) —
    // while the fused loop dequantizes-and-accumulates inside
    // whole-stage codegen with bit-identical double arithmetic, so the
    // oracle is unchanged. At 100 TB this is also the honest physical
    // shape: the scan reads CODES (1 B/dim), dequantizing on the fly.
    val cand = coded.crossJoin(broadcast(Ann.queryFrame(spark, dir)))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("adc", round(
        graft.functions.Sq8Adc(col("qv"), col("codes"), mnL, mxL), 6))
      .groupBy(col("qid"))
      .agg(graft.functions.TopKAgg.topk(col("adc"), col("vec_id"), CandN,
        descending = false).as("top"))
      .select(col("qid"), explode(col("top.id")).as("vec_id"))
    Ann.rankTopK(
      cand
        .join(e.select(col("vec_id"), col("embedding")), Seq("vec_id"))
        .join(broadcast(Ann.queryFrame(spark, dir)), Seq("qid"))
        .select(col("qid"),
          round(l2sq(col("embedding"), col("qv")), 4).as("score"),
          col("vec_id")),
      K, descending = false)
  }

  val q81Sql: String = {
    val dim = 64
    s"""WITH st AS (
       |  SELECT g.i, min(embedding[g.i + 1])::DOUBLE AS mn,
       |         max(embedding[g.i + 1])::DOUBLE AS mx
       |  FROM embeddings, range($dim) g(i) GROUP BY 1),
       |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
       |      WHERE vec_id < $NumQueries),
       |xh AS (
       |  SELECT e.vec_id, st.i,
       |         st.mn + (((CASE WHEN st.mx = st.mn THEN 0
       |            ELSE least(${Levels.toLong}, greatest(0,
       |              floor(((e.embedding[st.i + 1]::DOUBLE - st.mn)
       |                     / (st.mx - st.mn)) * $Levels + 0.5)))::BIGINT
       |            END) * (st.mx - st.mn)) / $Levels) AS xhat
       |  FROM embeddings e, st),
       |adc AS (
       |  SELECT q.qid, x.vec_id,
       |         sum((q.qv[x.i + 1]::DOUBLE - x.xhat) *
       |             (q.qv[x.i + 1]::DOUBLE - x.xhat)) AS adc
       |  FROM xh x, q WHERE x.vec_id <> q.qid GROUP BY 1, 2),
       |cand AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id,
       |           row_number() OVER (PARTITION BY qid
       |                              ORDER BY round(adc, 6), vec_id) AS crank
       |    FROM adc) WHERE crank <= $CandN),
       |r AS (
       |  SELECT c.qid, c.vec_id,
       |         round(${Det.l2sqSql("e.embedding", "q.qv")}, 4) AS score
       |  FROM cand c
       |  JOIN embeddings e ON e.vec_id = c.vec_id
       |  JOIN q ON q.qid = c.qid)
       |SELECT qid, rank::INT AS rank, vec_id AS id, score FROM (
       |  SELECT qid, vec_id, score,
       |         row_number() OVER (PARTITION BY qid
       |                            ORDER BY score, vec_id) AS rank
       |  FROM r)
       |WHERE rank <= $K ORDER BY qid, rank""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q81_sq8_ann" -> (q81 _))

  val oracles: Map[String, String] = Map(
    "q81_sq8_ann" -> q81Sql)
}
