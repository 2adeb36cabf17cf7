package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Det
import graft.functions.VectorFunctions.cosineSim
import graft.sources.Tables

/** Binary quantization (BQ) — the fourth and most extreme compression
  * point on the ANN memory/recall curve (q31 raw float32 → q81 SQ8 →
  * q58 PQ → here): ONE BIT per dimension. Each dim is thresholded at
  * its corpus midpoint `(min+max)/2`; the 64 sign bits pack into a
  * single BIGINT, so the candidate scan reads 8 bytes per vector —
  * 32× smaller than the raw 256 B row, and the "distance" is one
  * `bit_count(code ^ qcode)` popcount, the cheapest kernel a vector
  * engine can run (reference: `implementations/index.py` serves raw
  * float vectors; this is the scale path it has no analogue for).
  *
  * Distributed shape: the threshold grid is the q81 stats pass —
  * posexplode → per-dim min/max, partial aggs collapse each partition
  * to ≤ dim rows, and min/max are ORDER-INDEPENDENT so the grid is
  * bit-deterministic under any partitioning. The grid rides to
  * executors as one dim-sized array literal; encoding is a narrow
  * per-row fold (no shuffle). Hamming ranking crossJoins the 8-byte
  * codes against a broadcast Q-sized query frame — the shuffled frame
  * carries (id, code), never embeddings — and the candidate cut is the
  * bounded-heap [[graft.functions.TopKAgg]] (map-side partials prune to
  * CandN rows; PlanSpec pins zero Window). Top `CandN` candidates by
  * (hamming, id) then get an EXACT cosine rerank over full vectors:
  * candidates-are-policy, rerank-is-contract. Sign-bit codes preserve
  * ANGULAR structure (two vectors agree on a bit iff they fall the
  * same side of the midpoint hyperplane), so the rerank metric is
  * cosine — metric-coherent with what the code approximates.
  *
  * Determinism/oracle: min/max are exact; the midpoint `(mn+mx)/2` is
  * the same double computation in both engines; hamming is INTEGER so
  * the (ham, id) candidate order has no float boundary at the CandN
  * cut — the oracle rebuilds the entire pipeline from the base table
  * (the q81 property; no persisted layout needed). DuckDB refuses
  * `1::BIGINT << 63` as overflow, so the oracle spells the sign bit as
  * the literal min-long — same bit pattern Spark's `shiftleft(1L, 63)`
  * produces.
  */
object Bq {

  // ANN-family query contract (Ann.scala): 5 queries, top-5, self-excluded
  private def NumQueries = Ann.NumQueries
  private def K = Ann.K
  private[graft] val CandN = 50
  private val Dim = 64

  // ---- shared packing kernels (the store-attached index reuses these;
  // q95 below keeps the one-BIGINT 64-dim specialization its oracle
  // replays) ------------------------------------------------------------

  /** SQL for packing `valuesCol` (any dim) into ceil(dim/64) BIGINT
    * words against the `midsCol` threshold array. The null guard makes
    * the trailing partial word safe under ANSI mode: `slice` past the
    * array end yields nulls, and the IF short-circuits before the
    * out-of-bounds `element_at`. */
  private[graft] def packExprSql(dim: Int, valuesCol: String,
                                 midsCol: String): String = {
    val words = (dim + 63) / 64
    s"""transform(sequence(0, ${words - 1}), w ->
       |  aggregate(
       |    zip_with(slice($valuesCol, w * 64 + 1, 64), sequence(0, 63), (x, j) ->
       |      IF(x IS NULL, CAST(0 AS BIGINT),
       |         IF(CAST(x AS DOUBLE) > element_at($midsCol, w * 64 + j + 1),
       |            shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT)))),
       |    CAST(0 AS BIGINT), (a, b) -> a | b))""".stripMargin
  }

  /** Driver-side twin of [[packExprSql]] for the QUERY vector — same
    * bit order, same strict-greater threshold rule. */
  private[graft] def packBits(v: Seq[Float], mids: Array[Double]): Array[Long] = {
    val words = (mids.length + 63) / 64
    val out = new Array[Long](words)
    var i = 0
    while (i < mids.length && i < v.length) {
      if (v(i).toDouble > mids(i)) out(i / 64) |= (1L << (i % 64))
      i += 1
    }
    out
  }

  private def embeddings(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "embeddings")

  /** Per-dim midpoint grid — dim-sized and order-independent (exact
    * min/max), safe to collect. Shared by q95 and the streaming cell
    * (q188), so the threshold policy lives in one place. */
  private[graft] def midpointGrid(e: DataFrame): Array[Double] =
    e.select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .orderBy(col("i")).collect()
      .map(r => (r.getFloat(1).toDouble + r.getFloat(2).toDouble) / 2.0)

  /** The 64-dim one-BIGINT sign-bit pack against a `midsCol` threshold
    * array (strict-greater; bit i = dim i). q95's oracle replays this
    * exact text's arithmetic — one definition, every consumer. */
  private[graft] def packExpr64(valuesCol: String, midsCol: String): String =
    s"""aggregate(
       |  zip_with($valuesCol, sequence(0, ${Dim - 1}), (x, i) ->
       |    IF(CAST(x AS DOUBLE) > element_at($midsCol, i + 1),
       |       shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT))),
       |  CAST(0 AS BIGINT), (a, b) -> a | b)""".stripMargin

  /** The hamming candidate cut: codes × broadcast query codes, integer
    * popcount, bounded-heap CandN on (ham, id) — partitions × Q × CandN
    * heap entries in the exchange, no float tie boundary. Emits
    * (qid, vec_id). */
  private[graft] def hammingCut(coded: DataFrame, qcodes: DataFrame): DataFrame =
    coded.crossJoin(broadcast(qcodes))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("ham",
        expr("CAST(bit_count(code ^ qcode) AS DOUBLE)"))
      .groupBy(col("qid"))
      .agg(graft.functions.TopKAgg.topk(col("ham"), col("vec_id"), CandN,
        descending = false).as("top"))
      .select(col("qid"), explode(col("top.id")).as("vec_id"))

  def q95(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddings(spark, dir)
    val mids = midpointGrid(e)
    // encode: fold 64 sign bits into one BIGINT; at 100 TB this 8-byte
    // column is what the candidate scan stores and reads — the raw
    // embedding is touched only by the rerank's candidate-sized fetch
    val coded = e
      .withColumn("mids", typedLit(mids.toSeq))
      .withColumn("code", expr(packExpr64("embedding", "mids")))
      .select(col("vec_id"), col("embedding"), col("code"))
    val q = coded
      .where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("code").as("qcode"),
        col("embedding").as("qv"))
    val cand = hammingCut(coded, q.select(col("qid"), col("qcode")))
    Ann.rankTopK(
      cand
        .join(e.select(col("vec_id"), col("embedding")), Seq("vec_id"))
        .join(broadcast(q.select(col("qid"), col("qv"))), Seq("qid"))
        .select(col("qid"),
          round(cosineSim(col("embedding"), col("qv")), 4).as("score"),
          col("vec_id")),
      K, descending = true)
  }

  /** The full BQ replay (grid → codes → hamming CandN cut → exact
    * rerank), parameterized by the query predicate and k so q95 and the
    * streaming cell (q188) grade through ONE text — a threshold-policy
    * or sign-bit change cannot drift between them. Everything rebuilds
    * from the base table: integer hamming has no float boundary at the
    * cut, so no persisted layout is needed. */
  private[graft] def bqReplaySql(qWhere: String, k: Int): String = {
    // DuckDB overflows on 1<<63: spell the sign bit as min-long directly
    val bit =
      """CASE WHEN st.i = 63 THEN (-9223372036854775807 - 1)::BIGINT
        |     ELSE (1::BIGINT << st.i::INT) END""".stripMargin
    s"""WITH st AS (
       |  SELECT g.i,
       |         (min(embedding[g.i + 1])::DOUBLE
       |          + max(embedding[g.i + 1])::DOUBLE) / 2 AS mid
       |  FROM embeddings, range($Dim) g(i) GROUP BY 1),
       |codes AS (
       |  SELECT e.vec_id,
       |         bit_or(CASE WHEN e.embedding[st.i + 1]::DOUBLE > st.mid
       |                     THEN $bit ELSE 0::BIGINT END) AS code
       |  FROM embeddings e, st GROUP BY 1),
       |q AS (
       |  SELECT c.vec_id AS qid, c.code AS qcode, e.embedding AS qv
       |  FROM codes c JOIN embeddings e ON e.vec_id = c.vec_id
       |  WHERE $qWhere),
       |ham AS (
       |  SELECT q.qid, c.vec_id, bit_count(xor(c.code, q.qcode)) AS ham
       |  FROM codes c, q WHERE c.vec_id <> q.qid),
       |cand AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id,
       |           row_number() OVER (PARTITION BY qid
       |                              ORDER BY ham, vec_id) AS crank
       |    FROM ham) WHERE crank <= $CandN),
       |r AS (
       |  SELECT c.qid, c.vec_id,
       |         round(${Det.cosSql("e.embedding", "q.qv")}, 4) AS score
       |  FROM cand c
       |  JOIN embeddings e ON e.vec_id = c.vec_id
       |  JOIN q ON q.qid = c.qid)
       |SELECT qid, rank::INT AS rank, vec_id AS id, score FROM (
       |  SELECT qid, vec_id, score,
       |         row_number() OVER (PARTITION BY qid
       |                            ORDER BY score DESC, vec_id) AS rank
       |  FROM r)
       |WHERE rank <= $k ORDER BY qid, rank""".stripMargin
  }

  val q95Sql: String = bqReplaySql(s"c.vec_id < $NumQueries", K)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q95_bq_hamming_ann" -> (q95 _))

  val oracles: Map[String, String] = Map(
    "q95_bq_hamming_ann" -> q95Sql)
}
