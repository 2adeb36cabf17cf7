package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVFADC — the composition of the engine's two persisted ANN layouts
  * (q60), and the architecture every billion-vector deployment actually
  * runs (FAISS's IVFPQ): the IVF coarse quantizer bounds WHICH rows a
  * query reads (probe ≈ 2/√cells of the corpus, partition-pruned), and
  * PQ bounds the BYTES each of those rows costs (8 codes, not 256 B of
  * floats). Multiplied out at 100 TB with 4096 cells: a probe reads
  * ~3.1 % of a 3 TB code table ≈ 100 GB — against the 100 TB the exact
  * scan reads, three orders of magnitude less I/O before the exact
  * rerank touches a few dozen full vectors.
  *
  * Layout (`index/` = (vec_id, codes) PARTITIONED BY cell — the
  * inverted file stores codes, not vectors): built once by joining the
  * IVF assignment ([[Ann.ensureLayout]]) with the PQ codes
  * ([[Pq.ensureLayout]]) — a one-off build-time join of two
  * narrow tables, never a query-time one. A probe is: rank centroids
  * driver-side (request-sized), scan ONLY the probed cell partitions,
  * ADC-sweep their codes ([[Pq.adcExpr]]), cut `Pq.CandN` candidates on
  * (rounded ADC, id), exact-rerank ([[Pq.rerank]]).
  *
  * Oracle contract: probes, the flat cell assignment, the flat codes,
  * and the per-query LUTs are all persisted parquet; the DuckDB oracle
  * replays candidates = (probed cells' members, ADC-summed, cut) +
  * exact rerank — the q33/q58 pattern composed. The two quantizers
  * disagree on normalization by design (IVF cells partition RAW space,
  * PQ codes normalized space for the cosine proxy); both are candidate
  * POLICY, replayed from disk, never recomputed by the oracle.
  */
object IvfPq {

  /** Conf key for the IVFADC layout root — the [[Ann.IvfDirConf]]
    * cluster contract. */
  val IvfPqDirConf = "spark.graft.ivfpq.dir"

  private val root = new LayoutRoot(IvfPqDirConf, "graft_ivfpq_")

  def auxDir(spark: SparkSession, dir: String): String =
    root.auxDir(spark, dir)

  @volatile private var lastAux: Option[(String, String)] = None

  private val layoutCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] val buildCount = new java.util.concurrent.atomic.AtomicInteger(0)

  /** BUILD: ensure both source layouts, then join IVF's (vec_id, cell)
    * with PQ's (vec_id, codes) into the cell-partitioned code table,
    * plus the flat `assign/` replay copy derived by reading the index
    * back. Returns the layout dir. */
  def buildLayout(spark: SparkSession, dir: String): String = {
    buildCount.incrementAndGet()
    val aux = auxDir(spark, dir)
    val ivfAux = Ann.ensureLayout(spark, dir)
    val pqAux = Pq.ensureLayout(spark, dir)
    val assign = spark.read.parquet(s"$ivfAux/assign")
    val codes = spark.read.parquet(s"$pqAux/codes")
    assign.join(codes, Seq("vec_id"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$aux/index")
    spark.read.parquet(s"$aux/index")
      .select(col("vec_id"), col("cell"))
      .coalesce(1).write.mode("overwrite").parquet(s"$aux/assign")
    aux
  }

  /** PROBE: centroid ranking and ADC tables are driver-side
    * (request-sized); the corpus-side work is a partition-pruned scan
    * of the probed cells' CODES — the only distributed cost — then the
    * exact rerank of `Pq.CandN` ids. */
  /** Centroids cached per IVF layout dir — same immutability argument as
    * [[Pq.readCodebook]]'s cache: no Spark job per probe for ~KBs of
    * request-independent metadata. */
  private val centroidCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Float]]]()

  // corpus-epoch eviction (r21, per advice — the Ann.centersCache wiring)
  StandingCache.registerEvictHook(() =>
    { centroidCache.clear(); layoutCache.clear(); opqLayoutCache.clear() })

  def probe(spark: SparkSession, dir: String, aux: String,
            persistAux: Boolean = false): DataFrame =
    probeWith(spark, dir, aux, Pq.ensureLayout(spark, dir), rot = None,
      persistAux)

  /** The one probe recipe, parameterized by WHOSE codes it sweeps:
    * `codesAux` carries the codebook the LUTs tabulate against, and
    * `rot` (when the codes are OPQ-rotated — q152) rotates each query
    * into that code space first. Cell ranking always runs on the RAW
    * query against the raw-space IVF centers — rotation never touches
    * the coarse quantizer, exactly the serving mounts' discipline. */
  private def probeWith(spark: SparkSession, dir: String, aux: String,
                        codesAux: String, rot: Option[Array[Array[Float]]],
                        persistAux: Boolean): DataFrame = {
    val ivfAux = Ann.ensureLayout(spark, dir)
    val centers = centroidCache.computeIfAbsent(ivfAux, a =>
      spark.read.parquet(s"$a/centroids").collect()
        .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
        .sortBy(_._1).map(_._2))
    val nProbe = Ann.ivfProbeFor(centers.length)
    val queries = Ann.queryFrame(spark, dir).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val probeRows = queries.toSeq.flatMap { case (qid, qv) =>
      Ann.rankCells(qv, centers, nProbe).map(cell => (qid, cell))
    }
    val codebook = Pq.readCodebook(spark, codesAux)
    val luts = queries.toSeq.map { case (qid, qv) =>
      val qEff = rot.map(Opq.rotateQuery(_, qv)).getOrElse(qv)
      (qid, Pq.lutFor(qEff, codebook))
    }

    import spark.implicits._
    if (persistAux) {
      probeRows.toDF("qid", "cell")
        .coalesce(1).write.mode("overwrite").parquet(s"$aux/probes")
      Pq.writeLuts(spark, luts, s"$aux/lut")
    }

    // one stable plan for the whole query batch: the union of probed
    // cells prunes partitions (a literal, so pruning stays static), the
    // broadcast (qid, cell) frame scopes rows to each query's own cells,
    // and the broadcast (qid, lut) frame carries the ADC tables as a
    // COLUMN — no per-query literals, so codegen compiles once and the
    // cache serves every later probe (see Pq.adcCol)
    val allCells = probeRows.map(_._2).distinct.sorted
    val probesDf = probeRows.toDF("qid", "cell")
    val cand = Pq.candCut(spark.read.parquet(s"$aux/index")
      .where(col("cell").isin(allCells: _*))
      .join(broadcast(probesDf), Seq("cell"))
      .where(col("vec_id") =!= col("qid"))
      .join(broadcast(Pq.lutFrame(spark, luts)), Seq("qid"))
      .withColumn("adc", Pq.adcCol)
      .select(col("qid"), col("adc"), col("vec_id")))
    Pq.rerank(spark, dir, cand)
  }

  /** Build-or-reuse the IVFADC layout for `dir` (the [[Ann.ensureLayout]]
    * contract) — shared by q60 and the streaming retrieval cell (q180),
    * which sweeps this layout's cell-partitioned codes as the static
    * side of its stream-static join. */
  private[graft] def ensureLayout(spark: SparkSession, dir: String): String =
    layoutCache.computeIfAbsent(auxDir(spark, dir),
      _ => buildLayout(spark, dir))

  /** q60 = cached build + probe (build once per JVM; bench repeats
    * measure probe + rerank, the serving path). */
  def ivfPqTopK(spark: SparkSession, dir: String): DataFrame = {
    val aux = ensureLayout(spark, dir)
    lastAux = Some((aux, Pq.ensureLayout(spark, dir)))
    probe(spark, dir, aux, persistAux = true)
  }

  // ---- q152: OPQ ∘ IVFADC (r14) ---------------------------------------

  /** Conf key for the OPQ-IVFADC layout root. */
  val OpqIvfPqDirConf = "spark.graft.opqivfpq.dir"

  private val opqRoot = new LayoutRoot(OpqIvfPqDirConf, "graft_opqivfpq_")

  @volatile private var lastOpqAux: Option[(String, String)] = None

  private val opqLayoutCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** BUILD: the [[buildLayout]] join with [[Opq]]'s ROTATED codes in
    * place of [[Pq]]'s raw ones — cells stay the raw-space IVF
    * assignment (pruning identical), only the code space rotates. This
    * is FAISS's `OPQ..,IVF..,PQ..` factory composition, and with r14's
    * serving mounts it closes the last raw-PQ surface where a rotated
    * variant is meaningful (q58 stays raw deliberately: it is q138's
    * A/B baseline). */
  def buildOpqLayout(spark: SparkSession, dir: String): String = {
    buildCount.incrementAndGet()
    val aux = opqRoot.auxDir(spark, dir)
    val ivfAux = Ann.ensureLayout(spark, dir)
    val opqAux = Opq.ensureLayout(spark, dir)
    val assign = spark.read.parquet(s"$ivfAux/assign")
    val codes = spark.read.parquet(s"$opqAux/codes")
    assign.join(codes, Seq("vec_id"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$aux/index")
    spark.read.parquet(s"$aux/index")
      .select(col("vec_id"), col("cell"))
      .coalesce(1).write.mode("overwrite").parquet(s"$aux/assign")
    aux
  }

  /** q152 = cached OPQ-IVFADC build + the shared probe with rotated
    * LUTs. The oracle is [[q60Sql]] verbatim over this layout's tables
    * — probes/assign/lut/codes_flat fully capture the policy, rotation
    * included (the q138 contract; the rotation DERIVATION itself is
    * graded by q147/q149). */
  def opqIvfPqTopK(spark: SparkSession, dir: String): DataFrame = {
    val aux = opqLayoutCache.computeIfAbsent(opqRoot.auxDir(spark, dir),
      _ => buildOpqLayout(spark, dir))
    val opqAux = Opq.ensureLayout(spark, dir)
    lastOpqAux = Some((aux, opqAux))
    probeWith(spark, dir, aux, opqAux,
      rot = Some(Opq.readRotation(spark, opqAux)), persistAux = true)
  }

  /** Oracle replay from the persisted layouts: candidates = members of
    * the probed cells, ADC-summed from codes⋈lut and cut on (rounded
    * ADC, id); rerank = exact cosine — the q33 and q58 replays
    * composed. */
  def q60Sql(aux: String, pqAux: String): String =
    s"""WITH probes AS (SELECT qid, cell FROM read_parquet('$aux/probes/*.parquet')),
       |a AS (SELECT vec_id, cell FROM read_parquet('$aux/assign/*.parquet')),
       |lut AS (SELECT qid, sub, code, d FROM read_parquet('$aux/lut/*.parquet')),
       |cf AS (SELECT vec_id, sub, code FROM read_parquet('$pqAux/codes_flat/*.parquet')),
       |cells AS (
       |  SELECT p.qid, a.vec_id FROM probes p JOIN a ON a.cell = p.cell
       |  WHERE a.vec_id <> p.qid),
       |adc AS (
       |  SELECT cl.qid, cl.vec_id, round(sum(l.d), 6) AS adc
       |  FROM cells cl
       |  JOIN cf c ON c.vec_id = cl.vec_id
       |  JOIN lut l ON l.qid = cl.qid AND l.sub = c.sub AND l.code = c.code
       |  GROUP BY cl.qid, cl.vec_id),
       |cand AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id,
       |           row_number() OVER (PARTITION BY qid ORDER BY adc, vec_id) AS cr
       |    FROM adc) WHERE cr <= ${Pq.CandN}),
       |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < ${Ann.NumQueries}),
       |sc AS (
       |  SELECT c.qid, c.vec_id AS id, round(${Pq.cosSql("e.embedding", "q.qv")}, 4) AS score
       |  FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id JOIN q ON q.qid = c.qid),
       |r AS (
       |  SELECT qid, id, score,
       |         row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rank
       |  FROM sc)
       |SELECT qid, rank::INT AS rank, id, score FROM r WHERE rank <= ${Ann.K}
       |ORDER BY qid, rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_ann_ivfpq_topk" -> (ivfPqTopK _),
    "q152_ann_opq_ivfadc" -> (opqIvfPqTopK _))

  /** Emitted only after the entry ran in this JVM (the q33/q58 honesty
    * contract — never a stale layout). */
  def oracles: Map[String, String] =
    lastAux.map { case (aux, pqAux) =>
      "q60_ann_ivfpq_topk" -> q60Sql(aux, pqAux)
    }.toMap ++
      lastOpqAux.map { case (aux, opqAux) =>
        "q152_ann_opq_ivfadc" -> q60Sql(aux, opqAux)
      }
}
