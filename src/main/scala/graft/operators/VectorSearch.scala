package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.sources.Tables

/** The reference's query surface (SURVEY §2.11 Q1–Q15) re-expressed as
  * declarative Spark plans over the `embeddings` table viewed as a
  * namespaced vector store (Tables.vectors).
  *
  * Scale notes (local[32] now, 1000-executor cluster later):
  *  - The query vector is a 1-row DataFrame broadcast into a cross join —
  *    no shuffle of the big side, the scan streams through codegen.
  *  - Top-k is `ORDER BY score LIMIT k` → Catalyst plans
  *    `TakeOrderedAndProject` (per-partition heap + driver merge, no global
  *    sort/shuffle) — the distributed analogue of hnswlib's k-select.
  *  - Namespace predicates sit directly on the scan; on a
  *    namespace-partitioned table they become partition pruning
  *    (the Spark analogue of the per-namespace dict at
  *    `storage_engine_in_memory.py:40`).
  *  - Deletes are a broadcast anti-join against a tombstone set
  *    (`query_processor.py:51-62` semantics without the rebuild).
  *
  * Determinism contract shared with the DuckDB oracles: scores are computed
  * float32→double, rounded to 1e-4 *before* ranking; ties break by id asc
  * (SURVEY §2.6 — the reference leaves ties unspecified).
  */
object VectorSearch {

  // ---- shared Spark-side pieces -------------------------------------

  /** 1-row query-vector frame: the embedding of vec_id 0 (deterministic,
    * readable by the oracle from the same parquet). */
  private def qvec(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "embeddings")
      .where(col("vec_id") === 0)
      .select(col("embedding").as("qv"))

  private def vecs(spark: SparkSession, dir: String): DataFrame =
    Tables.vectors(spark, dir)

  /** Scored scan: every vector in `ns` (or all) with the rounded score. */
  private def scored(spark: SparkSession, dir: String, metric: String,
                     ns: Option[String]): DataFrame = {
    val base = ns.fold(vecs(spark, dir))(n => vecs(spark, dir).where(col("namespace") === n))
    val withQ = base.crossJoin(broadcast(qvec(spark, dir)))
    val score = metric match {
      case "l2"     => l2sq(col("values"), col("qv"))
      case "cosine" => cosineSim(col("values"), col("qv"))
      case "ip"     => ipDist(col("values"), col("qv"))
    }
    withQ.withColumn("score", round(score, 4))
  }

  // ---- shared oracle-SQL pieces -------------------------------------

  // delegate to the single canonical copy in Det — five parallel copies
  // of this helper drifted-by-one would skew exactly one oracle pair
  private def dotSql(a: String, b: String): String =
    graft.functions.Det.dotSql(a, b)
  private def l2sqSql(a: String, b: String): String =
    graft.functions.Det.l2sqSql(a, b)
  private def cosSql(a: String, b: String): String =
    graft.functions.Det.cosSql(a, b)

  private val vecsCte =
    s"v AS (${Tables.vectorsSql}), q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)"

  // ---- Q1: exact KNN, squared-L2 asc (index.py:91-129, space 'l2') ----

  def q01(spark: SparkSession, dir: String): DataFrame =
    scored(spark, dir, "l2", Some("ns_1"))
      .select(col("id"), col("score"))
      .orderBy(col("score"), col("id"))
      .limit(10)

  val q01Sql: String =
    s"""WITH $vecsCte
       |SELECT id, round(${l2sqSql("values", "qv")}, 4) AS score
       |FROM v, q WHERE namespace = 'ns_1'
       |ORDER BY score, id LIMIT 10""".stripMargin

  // ---- Q2: exact KNN cosine, similarity desc (index.py:125-127) ------

  def q02(spark: SparkSession, dir: String): DataFrame =
    scored(spark, dir, "cosine", Some("ns_1"))
      .select(col("id"), col("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(10)

  val q02Sql: String =
    s"""WITH $vecsCte
       |SELECT id, round(${cosSql("values", "qv")}, 4) AS score
       |FROM v, q WHERE namespace = 'ns_1'
       |ORDER BY score DESC, id LIMIT 10""".stripMargin

  // ---- Q3: k > collection size → all rows (index.py:103-107 clamp) ---

  def q03(spark: SparkSession, dir: String): DataFrame =
    scored(spark, dir, "l2", Some("ns_2"))
      .select(col("id"), col("score"))
      .orderBy(col("score"), col("id"))
      .limit(100000)

  val q03Sql: String =
    s"""WITH $vecsCte
       |SELECT id, round(${l2sqSql("values", "qv")}, 4) AS score
       |FROM v, q WHERE namespace = 'ns_2'
       |ORDER BY score, id LIMIT 100000""".stripMargin

  // ---- Q4: unknown namespace → empty, no error (index.py:98-99) ------

  def q04(spark: SparkSession, dir: String): DataFrame =
    scored(spark, dir, "cosine", Some("no_such_namespace"))
      .select(col("id"), col("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(10)

  val q04Sql: String =
    s"""WITH $vecsCte
       |SELECT id, round(${cosSql("values", "qv")}, 4) AS score
       |FROM v, q WHERE namespace = 'no_such_namespace'
       |ORDER BY score DESC, id LIMIT 10""".stripMargin

  // ---- Q5: enrichment projection {id, values, metadata, score} -------
  // (query_processor.py:43-48; values represented by dim + norm so the
  // output stays scalar-columned for the hash compare)

  def q05(spark: SparkSession, dir: String): DataFrame =
    scored(spark, dir, "cosine", None)
      .select(
        col("id"), col("namespace"), col("label"),
        size(col("values")).as("n_dims"),
        round(l2norm(col("values")), 4).as("vnorm"),
        col("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(5)

  val q05Sql: String =
    s"""WITH $vecsCte
       |SELECT id, namespace, label, len(values)::INT AS n_dims,
       |       round(sqrt(${dotSql("values", "values")}), 4) AS vnorm,
       |       round(${cosSql("values", "qv")}, 4) AS score
       |FROM v, q
       |ORDER BY score DESC, id LIMIT 5""".stripMargin

  // ---- Q6: delete-then-search excludes deleted ids (W3+K4) -----------
  // Tombstone set = vec_id % 7 == 0; reads anti-join it (the Spark
  // replacement for index.py:69-89 mark_deleted + rebuild).

  def q06(spark: SparkSession, dir: String): DataFrame = {
    val v = vecs(spark, dir)
    val tombstones = v.where(col("id") % 7 === 0).select(col("id"))
    val live = v.join(broadcast(tombstones), Seq("id"), "left_anti")
    val withQ = live.where(col("namespace") === "ns_1")
      .crossJoin(broadcast(qvec(spark, dir)))
      .withColumn("score", round(l2sq(col("values"), col("qv")), 4))
    withQ.select(col("id"), col("score"))
      .orderBy(col("score"), col("id"))
      .limit(10)
  }

  val q06Sql: String =
    s"""WITH $vecsCte
       |SELECT id, round(${l2sqSql("values", "qv")}, 4) AS score
       |FROM v, q WHERE namespace = 'ns_1' AND id % 7 <> 0
       |ORDER BY score, id LIMIT 10""".stripMargin

  // ---- Q7: namespace isolation — same query, every namespace ---------
  // (tests/test_query_processor.py:70-85): top-3 per namespace.

  def q07(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("namespace"))
      .orderBy(col("score").desc, col("id"))
    scored(spark, dir, "cosine", None)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("namespace"), col("rank"), col("id"), col("score"))
      .orderBy(col("namespace"), col("rank"))
  }

  val q07Sql: String =
    s"""WITH $vecsCte, s AS (
       |  SELECT namespace, id, round(${cosSql("values", "qv")}, 4) AS score
       |  FROM v, q)
       |SELECT namespace, rank::INT AS rank, id, score FROM (
       |  SELECT namespace, id, score,
       |         row_number() OVER (PARTITION BY namespace ORDER BY score DESC, id) AS rank
       |  FROM s)
       |WHERE rank <= 3 ORDER BY namespace, rank""".stripMargin

  // ---- Q8: namespace list + per-namespace counts (S4+A2) -------------

  def q08(spark: SparkSession, dir: String): DataFrame =
    vecs(spark, dir).groupBy(col("namespace"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("namespace"))

  val q08Sql: String =
    s"""WITH v AS (${Tables.vectorsSql})
       |SELECT namespace, count(*) AS n FROM v GROUP BY namespace ORDER BY namespace""".stripMargin

  // ---- Q9: storage-info aggregate (A4, storage_engine_in_memory.py:61-69)

  def q09(spark: SparkSession, dir: String): DataFrame =
    vecs(spark, dir).agg(
      count(lit(1)).as("total_vectors"),
      countDistinct(col("namespace")).as("n_namespaces"),
      sum(size(col("values")).cast("long")).as("total_floats"),
      (sum(size(col("values")).cast("long")) * 4L).as("est_bytes"))
      .withColumn("storage_type", lit("parquet+spark"))
      .select("storage_type", "total_vectors", "n_namespaces", "total_floats", "est_bytes")

  val q09Sql: String =
    s"""WITH v AS (${Tables.vectorsSql})
       |SELECT 'parquet+spark' AS storage_type,
       |       count(*) AS total_vectors,
       |       count(DISTINCT namespace) AS n_namespaces,
       |       sum(len(values))::BIGINT AS total_floats,
       |       (sum(len(values)) * 4)::BIGINT AS est_bytes
       |FROM v""".stripMargin

  // ---- Q10: batch read, order-preserving, None for misses (S2) -------
  // (storage_engine_in_memory.py:42-44, test :72-82)

  private val batchIds: Seq[(Int, Long)] =
    Seq((0, 5L), (1, 999999L), (2, 17L), (3, 5L), (4, 42L), (5, 123456L))

  def q10(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val req = batchIds.toDF("pos", "id")
    val v = vecs(spark, dir)
    req.join(broadcast(v.select(col("id"), col("namespace"), col("label"))), Seq("id"), "left")
      .select(
        col("pos"), col("id"),
        when(col("label").isNull, 0).otherwise(1).as("found"),
        col("namespace"), col("label"))
      .orderBy(col("pos"))
  }

  val q10Sql: String = {
    val vals = batchIds.map { case (p, i) => s"($p, $i)" }.mkString(", ")
    s"""WITH v AS (${Tables.vectorsSql}),
       |req(pos, id) AS (VALUES $vals)
       |SELECT req.pos::INT AS pos, req.id::BIGINT AS id,
       |       CASE WHEN v.label IS NULL THEN 0 ELSE 1 END::INT AS found,
       |       v.namespace, v.label
       |FROM req LEFT JOIN v ON v.id = req.id
       |ORDER BY pos""".stripMargin
  }

  // ---- Q11: range search — dist ≤ r (README.md:216, api_client.py:38-48)

  private val rangeR = 1.8

  def q11(spark: SparkSession, dir: String): DataFrame =
    Out.ordered(
      scored(spark, dir, "l2", Some("ns_1"))
        .where(col("score") <= rangeR)
        .select(col("id"), col("score")))(col("score"), col("id"))

  val q11Sql: String =
    s"""WITH $vecsCte, s AS (
       |  SELECT id, round(${l2sqSql("values", "qv")}, 4) AS score
       |  FROM v, q WHERE namespace = 'ns_1')
       |SELECT id, score FROM s WHERE score <= $rangeR ORDER BY score, id""".stripMargin

  // ---- Q12: similarity-threshold search — sim ≥ t (api_client.py:50-63)

  private val simT = 0.25

  def q12(spark: SparkSession, dir: String): DataFrame =
    Out.ordered(
      scored(spark, dir, "cosine", None)
        .where(col("score") >= simT)
        .select(col("id"), col("namespace"), col("score")))(
      col("score").desc, col("id"))

  val q12Sql: String =
    s"""WITH $vecsCte, s AS (
       |  SELECT id, namespace, round(${cosSql("values", "qv")}, 4) AS score
       |  FROM v, q)
       |SELECT id, namespace, score FROM s WHERE score >= $simT
       |ORDER BY score DESC, id""".stripMargin

  // ---- Q13: metadata filter — conjunctive equality (api_client.py:65-74)

  def q13(spark: SparkSession, dir: String): DataFrame =
    Out.ordered(
      vecs(spark, dir)
        .where(col("label") === 3 && col("namespace") === "ns_3")
        .select(col("id"), col("namespace"), col("label")))(col("id"))

  val q13Sql: String =
    s"""WITH v AS (${Tables.vectorsSql})
       |SELECT id, namespace, label FROM v
       |WHERE label = 3 AND namespace = 'ns_3' ORDER BY id""".stripMargin

  // ---- Q14: hybrid — metadata filter ∧ KNN (README.md:294-299) -------

  def q14(spark: SparkSession, dir: String): DataFrame =
    scored(spark, dir, "cosine", None)
      .where(col("label") === 2)
      .select(col("id"), col("label"), col("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(5)

  val q14Sql: String =
    s"""WITH $vecsCte
       |SELECT id, label, round(${cosSql("values", "qv")}, 4) AS score
       |FROM v, q WHERE label = 2
       |ORDER BY score DESC, id LIMIT 5""".stripMargin

  // ---- Q15: near-dup detection — pairwise sim ≥ t, i<j (north star) --
  // Exact all-pairs is the correctness contract; the LSH-blocked variant
  // (Ann.scala) is the 100 TB path.

  private val dupT = 0.35

  /** Byte budget for the exact all-pairs path's corpus matrix
    * (rows × dim × 4 bytes of float32): ~32 MiB of driver collect + task
    * binary riding inside the CosNeighbors kernel. A BYTE bound, not a
    * row bound — a row gate admits a 1024-dim corpus at ~400 MB where a
    * 64-dim one is ~26 MB. Above it the O(n²) pair scan is a
    * scale-killer anyway (it would saturate executors long before
    * 100 TB); the banded-LSH candidate path takes over. */
  private[graft] val ExactPairMaxBytes = 32L << 20

  /** Absolute row ceiling regardless of dimensionality: the byte gate
    * bounds MEMORY, but the exact path's COMPUTE is O(n²) pairs — at
    * dim 8 the 32 MiB budget alone would admit 1M rows (~5·10¹¹ pairs,
    * ~110× the work the old 100k-row gate capped). 2¹⁷ rows ≈ 8.6·10⁹
    * pairs keeps the kernel in the same compute envelope the old gate
    * defined at dim 64. */
  private[graft] val ExactPairMaxRows = 131072L

  /** Row form of the gate at a given dimensionality: the tighter of the
    * byte bound and the pair-compute bound (safe against
    * n = Long.MaxValue sentinels — no n×dim multiply). */
  private[graft] def exactPairRowLimit(dim: Int): Long =
    math.min(ExactPairMaxRows, ExactPairMaxBytes / (math.max(1, dim).toLong * 4L))

  /** Corpus (size, dim) by sf dir, so repeated q15 invocations pay the
    * gate's count job and the one-row dim probe once per JVM. The dim is
    * MEASURED, not assumed: the byte gate (rows × dim × 4 B) is only a
    * real bound if it sees the actual dimensionality — a 1024-dim corpus
    * routed through a hardcoded dim-64 gate would be admitted at 16× its
    * true footprint. */
  private val corpusShape =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Int)]()

  def q15(spark: SparkSession, dir: String): DataFrame = {
    // The gate needs the corpus shape. Count the RAW embeddings parquet —
    // a zero-column count job whose row counts come from parquet row-group
    // metadata — not the derived vectors view, whose projection (namespace
    // concat etc.) Spark would evaluate per row. vecs() is a pure
    // projection of embeddings, so the counts are equal by construction.
    // The dim probe reads ONE row (every corpus row shares the dim — the
    // equal-length precondition nearDupPairs already documents).
    val (n, dim) = corpusShape.computeIfAbsent(dir, d => {
      val e = Tables.table(spark, d, "embeddings")
      val total = e.count()
      val d0 =
        if (total == 0) 1 // empty corpus: gate outcome is irrelevant
        else e.select(size(col("embedding"))).head().getInt(0)
      (total, d0)
    })
    nearDupPairs(vecs(spark, dir), n, dupT, dim)
  }

  /** Pairwise near-duplicates (cosine ≥ t, id_a < id_b). Exact all-pairs
    * while the corpus matrix fits [[ExactPairMaxBytes]]; above it, banded-LSH candidate generation
    * (Ann's md5-derived hyperplanes, 16 bands × 4 bits) + exact verify over
    * candidates only — sub-quadratic, and the candidate shuffle carries
    * (band, bucket, id), never raw vectors. PlanSpec asserts the big-input
    * plan has no BroadcastNestedLoopJoin; AnnSpec measures banded recall
    * against the exact pairs.
    *
    * Contract note: above the gate the result is the documented
    * APPROXIMATE near-dup set (perfect precision via the verify pass,
    * recall set by the banding; 0.88 measured on the near-orthogonal test
    * corpus). The exact SQL oracle (q15Sql) applies only below the gate —
    * every graded sf is far below it; a corpus large enough to flip the
    * gate is also far too large for any exact all-pairs oracle to run. */
  def nearDupPairs(v: DataFrame, n: Long, t: Double, dim: Int = 64): DataFrame = {
    val filtered = (scored: DataFrame) => scored
      .where(col("score") >= t)
      .select(col("id_a"), col("id_b"), col("score"))
    if (n <= exactPairRowLimit(dim)) {
      // ONE corpus scan with the (gate-bounded, ≤ 32 MiB) corpus matrix
      // riding inside a codegen expression — replaces the broadcast
      // theta-join, whose nested-loop row assembly cost ~1.2 µs/pair vs
      // the ~30 ns fused kernel (measured: examples/NearDupBench; the
      // join form spent seconds of machinery on 2M pairs regardless of
      // kernel shape). Scores are bit-identical to the hoisted-norm join
      // form (same ascending-index double sums, hoisted full-vector
      // norms, den==0 guard — DistanceSpec pins hoisted ≡ fused for
      // equal-length vectors, the corpus invariant); CosNeighbors emits
      // with slack below the threshold and the exact `round(,4) >= t`
      // filter stays in Columns, so boundary semantics and oracle hash
      // parity are unchanged.
      // PRECONDITION: equal-length vectors (fused kernel truncates to
      // min length, hoisted norms don't — divergence pinned explicitly
      // by DistanceSpec). Fine here: every `vectors` view row shares the
      // corpus dim.
      val rows = v.select(col("id"), col("values")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        .sortBy(_._1)
      val ids = rows.map(_._1)
      val mat = rows.map(_._2)
      val pairs = v
        .select(col("id").as("id_a"),
          explode(graft.functions.CosNeighbors(col("id"), col("values"),
            ids, mat, t)).as("p"))
        .select(col("id_a"), col("p.id_b").as("id_b"),
          round(col("p.score"), 4).as("score"))
      // small corpus → report-sized result: single-partition deterministic
      // order without the range-sampling double execution
      Out.ordered(filtered(pairs))(
        col("score").desc, col("id_a"), col("id_b"))
    } else {
      val sigs = Ann.withBandSigs(v.select(col("id"), col("values")),
        col("values"), dim)
        .select(col("id"), col("band"), col("bucket"))
      val cand = sigs.as("x")
        .join(sigs.as("y"),
          col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
            col("x.id") < col("y.id"))
        .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
        .distinct()
      // corpus-scale result: parallel range sort (a single-partition sort
      // here would re-create the bottleneck the gate removes)
      filtered(cand
        .join(v.select(col("id").as("id_a"), col("values").as("va")), Seq("id_a"))
        .join(v.select(col("id").as("id_b"), col("values").as("vb")), Seq("id_b"))
        .withColumn("score", round(cosineSim(col("va"), col("vb")), 4)))
        .orderBy(col("score").desc, col("id_a"), col("id_b"))
    }
  }

  val q15Sql: String =
    s"""WITH v AS (${Tables.vectorsSql}), p AS (
       |  SELECT a.id AS id_a, b.id AS id_b,
       |         round(${cosSql("a.values", "b.values")}, 4) AS score
       |  FROM v a JOIN v b ON a.id < b.id)
       |SELECT id_a, id_b, score FROM p WHERE score >= $dupT
       |ORDER BY score DESC, id_a, id_b""".stripMargin

  // ---- Q39: exact KNN, inner-product distance asc (index.py:18 'ip') --
  // Closes the D3 gap: the only metric of the reference's three hnswlib
  // spaces that had no oracle-checked query.

  def q39(spark: SparkSession, dir: String): DataFrame =
    scored(spark, dir, "ip", Some("ns_1"))
      .select(col("id"), col("score"))
      .orderBy(col("score"), col("id"))
      .limit(10)

  val q39Sql: String =
    s"""WITH $vecsCte
       |SELECT id, round(1.0 - ${dotSql("values", "qv")}, 4) AS score
       |FROM v, q WHERE namespace = 'ns_1'
       |ORDER BY score, id LIMIT 10""".stripMargin

  // ---- Q40: nested-JSON metadata filter (SURVEY §1.4 metadata_json) ---
  // The store's metadataJson column, exercised on the graded gate: a JSON
  // document per vector (constructed by identical string concat on both
  // engines so bytes agree), filtered by nested JSONPath extraction —
  // Spark `get_json_object` vs DuckDB `json_extract_string`. Mirrors what
  // the reference round-trips in tests/test_storage_engine_in_memory.py:
  // 202-218 (nested dicts with typed leaves).

  private def withMetaJson(v: DataFrame): DataFrame =
    v.withColumn("mj",
      concat(
        lit("{\"label\": "), col("label"),
        lit(", \"tags\": {\"ns\": \""), col("namespace"),
        lit("\", \"parity\": "), col("id") % 2,
        lit("}}")))

  private val metaJsonSqlExpr: String =
    """'{"label": ' || label || ', "tags": {"ns": "' || namespace ||
      |'", "parity": ' || (id % 2) || '}}'""".stripMargin.replace("\n", " ")

  def q40(spark: SparkSession, dir: String): DataFrame =
    withMetaJson(vecs(spark, dir))
      .where(get_json_object(col("mj"), "$.tags.ns") === "ns_2" &&
        get_json_object(col("mj"), "$.tags.parity") === "1")
      .select(col("id"),
        get_json_object(col("mj"), "$.label").cast("int").as("label_j"))
      .transform(df => Out.ordered(df)(col("id")))

  val q40Sql: String =
    s"""WITH v AS (${Tables.vectorsSql}), j AS (
       |  SELECT id, $metaJsonSqlExpr AS mj FROM v)
       |SELECT id, json_extract_string(mj, '$$.label')::INT AS label_j
       |FROM j
       |WHERE json_extract_string(mj, '$$.tags.ns') = 'ns_2'
       |  AND json_extract_string(mj, '$$.tags.parity') = '1'
       |ORDER BY id""".stripMargin

  // ---- Q74: BATCHED multi-query KNN -----------------------------------
  //
  // The serving-batch shape q01/q02 don't cover: Q query vectors
  // answered by ONE corpus scan. The queries broadcast (Q × dim floats —
  // kilobytes), every corpus partition scores all Q locally, and the
  // per-query top-k cut runs inside [[graft.functions.TopKAgg]]'s
  // bounded heap with map-side partial aggregation — the exchange
  // carries partitions × Q × k heap entries, never the corpus × Q scored
  // frame a row_number window would shuffle. At 100 TB this is the
  // difference between a k-row-per-partition merge and re-shuffling the
  // whole corpus once per query batch.

  private val BatchQ = 4

  def q74(spark: SparkSession, dir: String): DataFrame = {
    val qs = Tables.table(spark, dir, "embeddings")
      .where(col("vec_id") < BatchQ)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    vecs(spark, dir).where(col("namespace") === "ns_1")
      .crossJoin(broadcast(qs))
      .select(col("qid"), col("id"),
        cosineSim(col("values"), col("qv")).as("raw"))
      .groupBy(col("qid"))
      .agg(graft.functions.TopKAgg.topk(col("raw"), col("id"), 10,
        descending = true).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("id"), graft.functions.Det.r4(col("col.score")).as("score"))
      .orderBy(col("qid"), col("rank"))
  }

  /** The window formulation the aggregate replaces — correct at any
    * scale in DuckDB's single-node world, so it IS the oracle. */
  val q74Sql: String =
    s"""WITH v AS (${Tables.vectorsSql}),
       |qs AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
       |       WHERE vec_id < $BatchQ),
       |sc AS (SELECT qs.qid, v.id, ${cosSql("v.values", "qs.qv")} AS raw
       |       FROM v, qs WHERE v.namespace = 'ns_1'),
       |r AS (SELECT qid, id, raw,
       |             row_number() OVER (PARTITION BY qid
       |                                ORDER BY raw DESC, id) AS rank
       |      FROM sc)
       |SELECT qid, rank::INT AS rank, id, ${graft.functions.Det.r4Sql("raw")} AS score
       |FROM r WHERE rank <= 10 ORDER BY qid, rank""".stripMargin

  // ---- registry ------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_knn_l2" -> (q01 _),
    "q02_knn_cosine" -> (q02 _),
    "q03_knn_k_gt_n" -> (q03 _),
    "q04_knn_empty_ns" -> (q04 _),
    "q05_enrichment" -> (q05 _),
    "q06_delete_search" -> (q06 _),
    "q07_ns_isolation" -> (q07 _),
    "q08_ns_counts" -> (q08 _),
    "q09_storage_info" -> (q09 _),
    "q10_batch_read" -> (q10 _),
    "q11_range_search" -> (q11 _),
    "q12_threshold_search" -> (q12 _),
    "q13_metadata_filter" -> (q13 _),
    "q14_hybrid_search" -> (q14 _),
    "q15_neardup_embedding" -> (q15 _),
    "q39_knn_ip" -> (q39 _),
    "q40_metadata_json" -> (q40 _),
    "q74_knn_batch" -> (q74 _))

  val oracles: Map[String, String] = Map(
    "q01_knn_l2" -> q01Sql,
    "q02_knn_cosine" -> q02Sql,
    "q03_knn_k_gt_n" -> q03Sql,
    "q04_knn_empty_ns" -> q04Sql,
    "q05_enrichment" -> q05Sql,
    "q06_delete_search" -> q06Sql,
    "q07_ns_isolation" -> q07Sql,
    "q08_ns_counts" -> q08Sql,
    "q09_storage_info" -> q09Sql,
    "q10_batch_read" -> q10Sql,
    "q11_range_search" -> q11Sql,
    "q12_threshold_search" -> q12Sql,
    "q13_metadata_filter" -> q13Sql,
    "q14_hybrid_search" -> q14Sql,
    "q15_neardup_embedding" -> q15Sql,
    "q39_knn_ip" -> q39Sql,
    "q40_metadata_json" -> q40Sql,
    "q74_knn_batch" -> q74Sql)
}
