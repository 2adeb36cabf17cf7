package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Det
import graft.sources.Tables
import graft.store.VectorStore

/** q45: the MUTATION surface behind the correctness gate. Every other
  * graded query reads static parquet; this one executes the live
  * [[VectorStore]] facade end-to-end — bulk load, overwrite-by-id,
  * delete-with-report, then a top-k search over the mutated state — the
  * flows the reference's richest tests exercise
  * (`tests/test_storage_engine_in_memory.py:46-106`,
  * `tests/test_query_processor.py:88-105`). The script is deterministic
  * (caller-supplied ids, vectors taken from the embeddings table), so a
  * DuckDB oracle can replay the same mutations relationally and the
  * driver's hash compare grades the whole facade, not a static filter.
  */
object StoreOps {

  private val LoadN = 200L        // ids "0".."199" hydrate the store
  private val UpsertId = "7"      // overwritten with vec 400's embedding
  private val UpsertSrc = 400L
  private val DeleteIds = Seq("3", "5")
  private val QueryId = 1L
  private val K = 10
  private val Ns = "q45"

  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), p -> p[1]::DOUBLE * p[2]::DOUBLE))"
  private def cosSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"

  def q45(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.table(spark, dir, "embeddings")
    val store = new VectorStore(spark)

    // 1. bulk load: one commit, ids are the vec_ids as strings
    store.loadFrame(
      e.where(col("vec_id") < LoadN)
        .select(col("vec_id").cast("string").as("id"),
          col("embedding").as("values")),
      Ns)

    // 2. overwrite-by-id: id "7" takes vec 400's embedding (one commit)
    val newVals = e.where(col("vec_id") === UpsertSrc)
      .select(col("embedding")).collect()(0).getSeq[Float](0)
    store.upsert(UpsertId, newVals, namespace = Ns)

    // 3. delete with per-id report — the report itself is asserted here
    val deleted = store.delete(DeleteIds, Ns)
    require(deleted.sorted == DeleteIds.sorted,
      s"delete reported $deleted, expected $DeleteIds")

    // 4. top-k over the mutated state (ranked on the RAW score; the
    // deterministic 4-digit rounding applies to the reported column only)
    val qv = e.where(col("vec_id") === QueryId)
      .select(col("embedding")).collect()(0).getSeq[Float](0)
    val hits = store.findSimilar(qv, k = K, metric = "cosine", namespace = Ns)
    hits.zipWithIndex
      .map { case (h, i) => (i + 1, h.id, h.score) }
      .toDF("rank", "id", "score")
      .withColumn("score", Det.r4(col("score")))
      .orderBy("rank")
  }

  /** Relational replay of the same mutation script: load WHERE vec_id <
    * 200, drop the deleted AND the overwritten id, re-insert the
    * overwritten id with its new vector, rank by raw cosine (tie-break on
    * the string id, as the store does), round for the report. */
  val q45Sql: String =
    s"""WITH base AS (
       |  SELECT vec_id::VARCHAR AS id, embedding AS v FROM embeddings
       |  WHERE vec_id < $LoadN),
       |upd AS (
       |  SELECT id, v FROM base
       |  WHERE id NOT IN (${(DeleteIds :+ UpsertId).map("'" + _ + "'").mkString(", ")})
       |  UNION ALL
       |  SELECT '$UpsertId' AS id,
       |         (SELECT embedding FROM embeddings WHERE vec_id = $UpsertSrc) AS v),
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $QueryId),
       |sc AS (SELECT u.id, ${cosSql("u.v", "q.qv")} AS raw FROM upd u, q),
       |r AS (
       |  SELECT id, raw,
       |         row_number() OVER (ORDER BY raw DESC, id) AS rank
       |  FROM sc)
       |SELECT rank::INT AS rank, id, ${Det.r4Sql("raw")} AS score
       |FROM r WHERE rank <= $K ORDER BY rank""".stripMargin

  // ---- q48: the store's INDEX-BACKED read path behind the gate ---------

  private val ApproxN = 300L
  private val ApproxNs = "q48"
  // the store's index hashes with Ann's plane family — the oracle MUST
  // derive from the same constants, never a hard copy (a retune of
  // Ann's banding would otherwise silently split engine and oracle)
  private val ApproxBands = Ann.Bands
  private val ApproxBits = Ann.BitsPerBand
  private val ApproxDim = Ann.Dim

  /** q48: `findSimilar(approx = true)` end-to-end through the LIVE store —
    * bulk load, store-attached LSH signature index, driver-side query
    * bucketing, candidate semi-join, exact rerank — hash-matched against
    * a FULL SQL replay of the same pipeline (md5-derived hyperplanes →
    * sign bits → band buckets → bucket-sharing candidates → cosine
    * rerank). This upgrades the facade's ANN wiring from spec-verified
    * (recall floor) to oracle-verified (exact candidate set + scores).
    * Query = vec 1's embedding, which is itself loaded — the reference
    * returns self-hits too, so rank 1 is the query at sim 1.0. */
  def q48(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.table(spark, dir, "embeddings")
    val store = new VectorStore(spark)
    store.loadFrame(
      e.where(col("vec_id") < ApproxN)
        .select(col("vec_id").cast("string").as("id"),
          col("embedding").as("values")),
      ApproxNs)
    val qv = e.where(col("vec_id") === QueryId)
      .select(col("embedding")).collect()(0).getSeq[Float](0)
    val hits = store.findSimilar(qv, k = K, metric = "cosine",
      namespace = ApproxNs, approx = true)
    hits.zipWithIndex
      .map { case (h, i) => (i + 1, h.id, h.score) }
      .toDF("rank", "id", "score")
      .withColumn("score", Det.r4(col("score")))
      .orderBy("rank")
  }

  /** SQL replay of the store's whole approx pipeline. Plane coefficients,
    * sign bits and band buckets replay exactly as in the q32 oracle (the
    * store uses the same md5 family via Ann.hyperplanesFor); candidates
    * are rows sharing ANY band bucket with the query; rerank is exact
    * cosine on the RAW score with the store's string-id tie-break. */
  val q48Sql: String = {
    val nPlanes = ApproxBands * ApproxBits
    s"""WITH planes AS (
       |  SELECT f, list(CAST((('0x' || substr(md5('graft_lsh_' || f || '_' || j), 1, 8))::BIGINT
       |                       / 2147483648.0 - 1.0) AS FLOAT) ORDER BY j) AS pl
       |  FROM range($nPlanes) tp(f), range($ApproxDim) td(j)
       |  GROUP BY f),
       |base AS (
       |  SELECT vec_id::VARCHAR AS id, embedding AS v FROM embeddings
       |  WHERE vec_id < $ApproxN),
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $QueryId),
       |sigs AS (
       |  SELECT b.id, (p.f // $ApproxBits)::INT AS band,
       |         sum(CASE WHEN ${dotSql("b.v", "p.pl")} > 0
       |                  THEN (1::BIGINT << (p.f % $ApproxBits)) ELSE 0 END) AS bucket
       |  FROM base b, planes p GROUP BY b.id, band),
       |qsig AS (
       |  SELECT (p.f // $ApproxBits)::INT AS band,
       |         sum(CASE WHEN ${dotSql("q.qv", "p.pl")} > 0
       |                  THEN (1::BIGINT << (p.f % $ApproxBits)) ELSE 0 END) AS bucket
       |  FROM q, planes p GROUP BY band),
       |cand AS (
       |  SELECT DISTINCT s.id FROM sigs s
       |  JOIN qsig ON s.band = qsig.band AND s.bucket = qsig.bucket),
       |sc AS (
       |  SELECT c.id, ${cosSql("b.v", "q.qv")} AS raw
       |  FROM cand c JOIN base b ON b.id = c.id, q),
       |r AS (
       |  SELECT id, raw,
       |         row_number() OVER (ORDER BY raw DESC, id) AS rank
       |  FROM sc)
       |SELECT rank::INT AS rank, id, ${Det.r4Sql("raw")} AS score
       |FROM r WHERE rank <= $K ORDER BY rank""".stripMargin
  }

  // ---- q50: the DURABLE store lifecycle behind the gate ----------------

  /** Conf key for q50's layout root — same contract as
    * [[Ann.IvfDirConf]]: on a cluster it MUST point at a shared
    * filesystem, because executors write the partitioned layout and the
    * driver-side compact/read-back must see every fragment. Local/test
    * runs can leave it unset (process-private temp root). */
  val DurableDirConf = "spark.graft.durable.dir"

  /** Process-private fallback root for q50's throwaway layouts (one
    * subdir per invocation — the write/compact cycle IS the thing under
    * test, so repeat runs must not reuse a previous layout). Unlike the
    * IVF aux dirs, nothing external reads these after the JVM exits. */
  private lazy val durableRoot: String =
    java.nio.file.Files.createTempDirectory("graft_q50_").toString
  private val durableRuns = new java.util.concurrent.atomic.AtomicInteger(0)

  /** q50: the durable store path end-to-end — write the namespace-
    * partitioned parquet layout, tombstone `id % 7 == 0`, compact (the
    * anti-join rewrite that replaces the reference's index rebuild,
    * `query_processor.py:58-61` / `index.py:131-162`), then aggregate a
    * namespace-pruned read-back. The oracle replays the same delete
    * relationally over the source table, so a row lost or duplicated
    * anywhere in write → compact → partitioned read breaks the hash. */
  def q50(spark: SparkSession, dir: String): DataFrame = {
    val path = spark.conf.getOption(DurableDirConf).getOrElse(durableRoot) +
      "/" + durableRuns.incrementAndGet()
    val v = Tables.vectors(spark, dir)
    graft.sources.VectorParquet.write(v, path)
    val deletes = v.where(col("id") % 7 === 0).select(col("id"))
    graft.sources.VectorParquet.compact(spark, path, deletes)
    graft.sources.VectorParquet.read(spark, path)
      .groupBy(col("namespace"))
      .agg(count(lit(1)).as("n"),
        sum(col("id")).cast("long").as("id_sum"),
        sum(col("label")).cast("long").as("label_sum"))
      .orderBy(col("namespace"))
  }

  val q50Sql: String =
    s"""WITH v AS (${Tables.vectorsSql})
       |SELECT namespace, count(*) AS n, sum(id)::BIGINT AS id_sum,
       |       sum(label)::BIGINT AS label_sum
       |FROM v WHERE id % 7 <> 0
       |GROUP BY 1 ORDER BY namespace""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q45_store_mutations" -> (q45 _),
      "q48_store_approx_search" -> (q48 _),
      "q50_durable_compact" -> (q50 _))

  val oracles: Map[String, String] =
    Map("q45_store_mutations" -> q45Sql,
      "q48_store_approx_search" -> q48Sql,
      "q50_durable_compact" -> q50Sql)
}
