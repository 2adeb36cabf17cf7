package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}

import graft.functions.VectorDistance
import graft.operators.Ann

/** DECLARATIVE index selection — the Catalyst rewrite SURVEY §7 scoped
  * as the one optional plan-level item: a [[Rule]] that recognizes
  * `ORDER BY vec_l2sq(vecCol, <literal query>) LIMIT k` (or the
  * descending `vec_cos` form) over a parquet table with an ATTACHED IVF
  * index and rewrites the scan onto the probe+rerank path — the same
  * candidates-are-policy / rerank-is-exact contract every facade probe
  * serves (`q33`/`q53`), but chosen by the OPTIMIZER from the query's
  * shape instead of by a facade parameter. A plain SQL user writing the
  * naive full-scan top-k gets the partition-pruned probe automatically;
  * at 100 TB that is the difference between scanning the corpus per
  * query and reading ~2/√cells of it.
  *
  * This mirrors what the reference does imperatively on every request
  * (`query_processor.py:26-49` always routes reads through the
  * per-namespace hnswlib index, `implementations/index.py:91-129`):
  * there the index IS the read path; here attaching one declares the
  * same policy to Catalyst.
  *
  * OPT-IN, twice over — the rewrite changes results from exact to the
  * index's candidate policy (perfect precision on returned scores,
  * recall set by the probe), which an optimizer must never do silently:
  *  1. the table must be [[IndexedTopK.attachIvf attached]] (build +
  *     registry), and
  *  2. `spark.graft.index.topkRewrite.enabled` must be `true`.
  * Everything else — other tables, other sort shapes, non-literal
  * queries, mismatched vector columns, ascending-cosine/descending-l2
  * (wrong-direction) sorts — is left untouched.
  *
  * Shapes matched: `Limit(k, Sort(dist, ...))` where the FIRST sort key
  * is a [[VectorDistance]] between the attached table's vector column
  * and a foldable literal vector, over the attached relation with any
  * stack of `Project`/`Filter` in between (a Filter composes exactly
  * like the facades' metadata filters: the index proposes, the filtered
  * scan decides). The rewrite substitutes the RELATION only — the
  * original projections, filters, sort, and limit stay in place above
  * the cell-pruned candidate scan, re-aliased to the original attribute
  * ids so every upstream expression binds unchanged.
  */
object IndexedTopK {

  /** Master switch for the rewrite (default off — see the opt-in
    * contract above). */
  val EnabledConf = "spark.graft.index.topkRewrite.enabled"

  /** Kill-switch for the FILTERED rewrite's plan-time saturation probe
    * (default on). The probe executes a bounded Spark job (limit-k
    * count over the pruned filtered candidate scan) INSIDE the
    * optimizer rule — so merely PLANNING a filtered top-k over an
    * attached table (`explain()`, UI plan rendering, plan-change
    * validation) runs driver-blocking jobs, and a caller embedding the
    * extension whose planner threads must never execute jobs (custom
    * schedulers, planning under locks) can be surprised by the
    * reentrancy. Setting this to `false` removes every plan-time job:
    * filtered rewrites then DECLINE unconditionally (fail closed — an
    * uncertified rewrite could return fewer than min(k, matching) rows,
    * which no conf may risk) and the exact filtered scan serves.
    * Unfiltered rewrites never probe regardless (spec-pinned): an
    * unfiltered top-k over a total layout cannot starve. */
  val SaturationProbeConf = "spark.graft.index.topkRewrite.saturationProbe"

  /** Root for attached layouts — the `spark.graft.ivf.dir` cluster
    * contract (shared FS on a real deployment); mkdtemp fallback for
    * local/test use. */
  val DirConf = "spark.graft.index.topkRewrite.dir"

  private val AttachSeed = 1717L

  private[graft] case class IndexInfo(layoutDir: String, vecCol: String,
                                      centers: Array[Array[Float]])

  /** Attached indexes, keyed by the source's scheme-less root path. */
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, IndexInfo]()

  /** Probe list of the most recent rewrite — oracle/spec hook (the
    * lastAux honesty contract: the grading replay must see the cells
    * THIS rewrite probed). */
  @volatile private[graft] var lastProbed: Option[Seq[Int]] = None

  /** Plan-time saturation verdicts for FILTERED rewrites, keyed by
    * (layout, probed cells, canonical predicates, k) — valid for the
    * attachment's lifetime because the layout is a static snapshot.
    * Invalidation (r19 — ADVICE r18): [[detach]] and an [[attachIvf]]
    * rebuild clear the layout's entries — attachIvf derives the layout
    * dir deterministically from the source path, so a detach →
    * source-change → re-attach sequence rebuilds under the SAME dir and
    * stale `saturated=true` verdicts would otherwise ride the rewrite
    * into under-k answers. Bounded as an access-ordered LRU (r20 —
    * ADVICE r19: the old guard CLEARED the whole map at
    * [[SaturationCacheMax]], so sustained distinct-query traffic
    * dropped every hot layout's verdicts and re-ran the driver-blocking
    * plan-time probe on effectively every planning; now only the
    * least-recently-USED entry is evicted, so hot verdicts survive any
    * number of cold inserts). Plan-time access is driver-side and
    * low-contention, so the synchronized wrapper costs nothing real;
    * the probe itself runs OUTSIDE the map lock (a racing duplicate
    * probe is a bounded count, never a correctness issue). */
  private[graft] val SaturationCacheMax = 4096

  private[graft] val saturationCache: java.util.Map[String, java.lang.Boolean] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, java.lang.Boolean](64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, java.lang.Boolean]): Boolean =
          size() > SaturationCacheMax
      })

  private def invalidateSaturation(layoutDir: String): Unit =
    saturationCache.synchronized {
      saturationCache.keySet.removeIf(_.startsWith(layoutDir + "|"))
    }

  /** Rewrites DECLINED by the starved check — the branch indicator. */
  private[graft] val starvedDeclines =
    new java.util.concurrent.atomic.AtomicLong(0)

  private[graft] def normPath(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  private def sha1Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-1")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private[graft] def lookup(path: String): Option[IndexInfo] =
    Option(registry.get(normPath(path)))

  /** Layout dir of the index attached to `sourcePath` — oracle hook. */
  private[graft] def layoutDirOf(sourcePath: String): Option[String] =
    lookup(sourcePath).map(_.layoutDir)

  /** Build an IVF layout over the parquet table at `sourcePath` and
    * register it for the rewrite. The layout carries the FULL source
    * row partitioned by cell (so any projection upstream of the rewrite
    * binds against it) plus the flat `assign/` replay table; training
    * is the one shared recipe ([[Ann.trainQuantizer]] — the q33/q53/q87
    * policy). Idempotent per path: re-attaching reuses the build. */
  def attachIvf(spark: SparkSession, sourcePath: String, idCol: String,
                vecCol: String): String = {
    val key = normPath(sourcePath)
    registry.computeIfAbsent(key, _ => {
      val src = spark.read.parquet(sourcePath)
      require(!src.columns.contains("cell"),
        s"cannot attach $sourcePath: the layout partitions by an added " +
          "'cell' column, and the source already has one — the rewrite " +
          "would silently rebind the user's column to index cell ids")
      val total = src.count()
      require(total > 0, s"cannot attach an index to an empty table ($sourcePath)")
      val centers = Ann.trainQuantizer(src, idCol, vecCol, total,
        Ann.ivfCellsFor(total), AttachSeed)
      val root = spark.conf.getOption(DirConf).getOrElse(
        java.nio.file.Files.createTempDirectory("graft_topk_rw_").toString)
      // sanitized-path + raw-path hash: sanitization alone is not
      // injective (/a/b_c and /a_b/c collide), and under a shared
      // DirConf root a collision would overwrite another table's layout
      // while its registry entry keeps pointing here (the annSharedRoot
      // lesson)
      val layout = root + "/idx_" +
        key.replaceAll("[^A-Za-z0-9._-]", "_") + "_" + sha1Hex(key).take(8)
      // the layout dir is deterministic from the source path, so a
      // rebuild (re-attach after detach) reuses it — any saturation
      // verdicts proven against the PREVIOUS build are stale now
      invalidateSaturation(layout)
      val centerSeqs: Seq[Seq[Float]] = centers.map(_.toSeq).toSeq
      src.withColumn("cell",
          graft.functions.NearestCell(col(vecCol), centerSeqs))
        .write.mode("overwrite").partitionBy("cell")
        .parquet(s"$layout/index")
      spark.read.parquet(s"$layout/index")
        .select(col(idCol).as("id"), col("cell"))
        .coalesce(1).write.mode("overwrite").parquet(s"$layout/assign")
      IndexInfo(layout, vecCol, centers)
    }).layoutDir
  }

  /** Drop the attachment for `sourcePath` (the layout dir is left on
    * disk — probes holding it keep serving, like every facade epoch).
    * The layout's saturation verdicts go with it: they certified the
    * DETACHED build's candidate counts, and a re-attach after the
    * source changed rebuilds under the same deterministic dir. */
  def detach(sourcePath: String): Unit =
    Option(registry.remove(normPath(sourcePath)))
      .foreach(info => invalidateSaturation(info.layoutDir))

  /** Inject [[IndexedTopKRule]] into a LIVE session via
    * `experimental.extraOptimizations` (idempotent). For sessions built
    * from config, register [[GraftSparkExtensions]] under
    * `spark.sql.extensions` instead. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[IndexedTopKRule]))
      spark.experimental.extraOptimizations = cur :+ new IndexedTopKRule(spark)
  }

  // ---- q112: the rewrite graded end-to-end ----------------------------

  private val Q112K = 10
  private val Q112QueryId = 7L

  /** (layout dir, probes dir) of the most recent q112 run — oracle
    * hook. */
  @volatile private var lastQ112Aux: Option[(String, String)] = None

  /** q112: the DECLARATIVE read path end-to-end — a plain DataFrame
    * top-k (`ORDER BY l2sq LIMIT k`, no facade call anywhere) over the
    * attached embeddings table, rewritten by the optimizer onto the
    * cell-pruned probe, results reported (rank, id, score). The script
    * REQUIRES the rewrite to have fired (the physical plan must scan
    * the layout, not the source) so a silently-disabled rule cannot
    * grade the exact scan; the probe list persists next to the layout
    * and the oracle replays candidates = probed cells' `assign/`
    * members with the exact ascending-l2 rerank — the q33/q53 contract,
    * reached through Catalyst instead of an API. */
  def q112(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val srcPath = s"$dir/embeddings.parquet"
    val layout = attachIvf(spark, srcPath, "vec_id", "embedding")
    install(spark)
    val qv = spark.read.parquet(srcPath)
      .where(col("vec_id") === Q112QueryId)
      .select(col("embedding")).head().getSeq[Float](0)
    val qlit = array(qv.map(v => lit(v)): _*).cast("array<float>")
    spark.conf.set(EnabledConf, "true")
    val ids = try {
      val df = spark.read.parquet(srcPath)
        .orderBy(graft.functions.VectorFunctions.l2sq(col("embedding"), qlit),
          col("vec_id"))
        .limit(Q112K)
        .select(col("vec_id"))
      val plan = df.queryExecution.executedPlan.toString
      require(plan.contains("idx_"),
        "q112's top-k did not rewrite onto the index - the graded result " +
          "would be the exact scan, not the declarative probe path")
      df.collect().map(_.getLong(0)).toSeq
    } finally spark.conf.unset(EnabledConf)
    val probed = lastProbed.getOrElse(
      throw new IllegalStateException("q112 rewrite left no probe list"))
    probed.toDF("cell").coalesce(1)
      .write.mode("overwrite").parquet(s"$layout/probes")
    lastQ112Aux = Some((layout, s"$layout/probes"))
    // k-sized exact score fetch for the report (the rewrite's own sort
    // ran on the raw distance expression, which must stay the bare sort
    // key for the rule to see it)
    val scores = spark.read.parquet(srcPath)
      .where(col("vec_id").isInCollection(ids))
      .select(col("vec_id"),
        graft.functions.VectorFunctions.l2sq(col("embedding"), qlit).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ids.zipWithIndex
      .map { case (id, i) => (i + 1, id, scores(id)) }
      .toDF("rank", "id", "score")
      .withColumn("score", graft.functions.Det.r4(col("score")))
      .orderBy("rank")
  }

  /** Oracle: candidates = probed cells' assigned ids, rerank = exact
    * ascending squared-L2 with the id tiebreak. */
  def q112Sql(aux: String, probesDir: String): String =
    s"""WITH probes AS (SELECT cell FROM read_parquet('$probesDir/*.parquet')),
       |a AS (SELECT id, cell FROM read_parquet('$aux/assign/*.parquet')),
       |cand AS (SELECT DISTINCT a.id FROM a JOIN probes USING (cell)),
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $Q112QueryId),
       |sc AS (
       |  SELECT c.id, ${graft.functions.Det.l2sqSql("e.embedding", "q.qv")} AS raw
       |  FROM cand c JOIN embeddings e ON e.vec_id = c.id, q),
       |r AS (
       |  SELECT id, raw,
       |         row_number() OVER (ORDER BY raw, id) AS rank
       |  FROM sc)
       |SELECT rank::INT AS rank, id, ${graft.functions.Det.r4Sql("raw")} AS score
       |FROM r WHERE rank <= $Q112K ORDER BY rank""".stripMargin

  // ---- q193: the rewrite composed with the hybrid predicate (r18 —
  // VERDICT r17 "Next round" #5) -----------------------------------------

  private val Q193K = 10
  private val Q193QueryId = 11L
  private val Q193Label = 3

  /** (layout dir, probes dir) of the most recent q193 run — oracle
    * hook. */
  @volatile private var lastQ193Aux: Option[(String, String)] = None

  /** q193: the DECLARATIVE hybrid read — `WHERE label = c ORDER BY l2sq
    * LIMIT k` over the attached table, rewritten onto the cell-pruned
    * probe with the predicate evaluating at CANDIDATE time (the Filter
    * rides above the substituted layout scan, before the sort — never a
    * post-filtered top-k), exactly the composition q164 serves
    * imperatively on the store facade. The rule's plan-time saturation
    * probe has already certified ≥ k matching candidates, or the
    * rewrite would have DECLINED and left the exact filtered scan (the
    * starved fallback — pinned by IndexedTopKSpec with a selective
    * predicate); the in-script requires assert the rewrite fired AND
    * that the label predicate reached the layout scan as a pushed
    * filter. Oracle: candidates = probed cells' assigned ids ∩ label,
    * exact ascending-l2 rerank. */
  def q193(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val srcPath = s"$dir/embeddings.parquet"
    val layout = attachIvf(spark, srcPath, "vec_id", "embedding")
    install(spark)
    val qv = spark.read.parquet(srcPath)
      .where(col("vec_id") === Q193QueryId)
      .select(col("embedding")).head().getSeq[Float](0)
    val qlit = array(qv.map(v => lit(v)): _*).cast("array<float>")
    spark.conf.set(EnabledConf, "true")
    val ids = try {
      val df = spark.read.parquet(srcPath)
        .where(col("label") === Q193Label)
        .orderBy(graft.functions.VectorFunctions.l2sq(col("embedding"), qlit),
          col("vec_id"))
        .limit(Q193K)
        .select(col("vec_id"))
      val plan = df.queryExecution.executedPlan.toString
      require(plan.contains("idx_"),
        "q193's filtered top-k did not rewrite onto the index - the graded " +
          "result would be the exact scan, not the hybrid probe path")
      require(plan.contains(s"EqualTo(label,$Q193Label)"),
        "q193's predicate did not reach the rewritten candidate scan - a " +
          "post-filtered top-k would break the hybrid contract\n" +
          plan.take(1200))
      df.collect().map(_.getLong(0)).toSeq
    } finally spark.conf.unset(EnabledConf)
    require(ids.size == Q193K,
      s"q193 returned ${ids.size} rows - the saturation probe certified " +
        s"$Q193K matching candidates, so a short result is a rewrite bug")
    val probed = lastProbed.getOrElse(
      throw new IllegalStateException("q193 rewrite left no probe list"))
    probed.toDF("cell").coalesce(1)
      .write.mode("overwrite").parquet(s"$layout/probes_f")
    lastQ193Aux = Some((layout, s"$layout/probes_f"))
    val scores = spark.read.parquet(srcPath)
      .where(col("vec_id").isInCollection(ids))
      .select(col("vec_id"),
        graft.functions.VectorFunctions.l2sq(col("embedding"), qlit).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ids.zipWithIndex
      .map { case (id, i) => (i + 1, id, scores(id)) }
      .toDF("rank", "id", "score")
      .withColumn("score", graft.functions.Det.r4(col("score")))
      .orderBy("rank")
  }

  /** Oracle: q112's replay with the predicate inside the candidate CTE
    * (a post-filtering implementation would rank non-matching rows and
    * break the hash). */
  def q193Sql(aux: String, probesDir: String): String =
    s"""WITH probes AS (SELECT cell FROM read_parquet('$probesDir/*.parquet')),
       |a AS (SELECT id, cell FROM read_parquet('$aux/assign/*.parquet')),
       |cand AS (
       |  SELECT DISTINCT a.id FROM a JOIN probes USING (cell)
       |  JOIN embeddings e ON e.vec_id = a.id
       |  WHERE e.label = $Q193Label),
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $Q193QueryId),
       |sc AS (
       |  SELECT c.id, ${graft.functions.Det.l2sqSql("e.embedding", "q.qv")} AS raw
       |  FROM cand c JOIN embeddings e ON e.vec_id = c.id, q),
       |r AS (
       |  SELECT id, raw,
       |         row_number() OVER (ORDER BY raw, id) AS rank
       |  FROM sc)
       |SELECT rank::INT AS rank, id, ${graft.functions.Det.r4Sql("raw")} AS score
       |FROM r WHERE rank <= $Q193K ORDER BY rank""".stripMargin

  // ---- q198: the DECLINE branch graded (r19 — VERDICT r18 "What's
  // missing" #3) ---------------------------------------------------------

  private val Q198K = 10

  /** Starving modulus of the most recent q198 run — oracle hook. */
  @volatile private var lastQ198Mod: Option[Long] = None

  /** q198: q193's starved complement — the same declarative hybrid
    * shape (`WHERE pred ORDER BY l2sq LIMIT k`) with a predicate the
    * plan-time saturation probe CANNOT certify: `vec_id % mod = 1` with
    * `mod = ceil(n/5)` matches ~5 rows of the whole table (scale-proof
    * by construction — vec_id is dense 0..n-1), so the probed cells
    * hold < k matching candidates and the rule DECLINES, leaving the
    * exact filtered scan to serve min(k, matching) rows. In-script
    * pins: the decline counter moved, the executed plan scans the
    * SOURCE (no `idx_` path anywhere), and the probe's verdict was
    * memoized `false`. The oracle is the exact filtered top-k replay
    * (q164's filtered-exact form) — the answer the decline exists to
    * protect. */
  def q198(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val srcPath = s"$dir/embeddings.parquet"
    attachIvf(spark, srcPath, "vec_id", "embedding")
    install(spark)
    val src = spark.read.parquet(srcPath)
    val n = src.count()
    val mod = (n + 4) / 5 // ~5 matching rows at any scale, always < k
    val qv = src.where(col("vec_id") === Q193QueryId)
      .select(col("embedding")).head().getSeq[Float](0)
    val qlit = array(qv.map(v => lit(v)): _*).cast("array<float>")
    val declines0 = starvedDeclines.get()
    spark.conf.set(EnabledConf, "true")
    val rows = try {
      val df = src
        .where(col("vec_id") % mod === 1)
        .orderBy(graft.functions.VectorFunctions.l2sq(col("embedding"), qlit),
          col("vec_id"))
        .limit(Q198K)
        .select(col("vec_id"))
      val plan = df.queryExecution.executedPlan.toString
      require(!plan.contains("idx_"),
        "q198's starved top-k rewrote onto the index - the saturation " +
          "probe certified a filter that cannot reach k, an under-k " +
          "answer would have served\n" + plan.take(1200))
      df.collect().map(_.getLong(0)).toSeq
    } finally spark.conf.unset(EnabledConf)
    require(starvedDeclines.get() > declines0,
      "q198 planned without a starved decline - the exact plan came from " +
        "some other non-match, not the certified starvation branch")
    require(rows.size < Q198K && rows.nonEmpty,
      s"q198 expected an under-k exact answer (~${n / mod} rows), got " +
        s"${rows.size} - the starving modulus no longer starves at n=$n")
    lastQ198Mod = Some(mod)
    val scores = src.where(col("vec_id").isInCollection(rows))
      .select(col("vec_id"),
        graft.functions.VectorFunctions.l2sq(col("embedding"), qlit).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.zipWithIndex
      .map { case (id, i) => (i + 1, id, scores(id)) }
      .toDF("rank", "id", "score")
      .withColumn("score", graft.functions.Det.r4(col("score")))
      .orderBy("rank")
  }

  /** Oracle: the EXACT filtered top-k — no layout, no probes; the
    * decline's whole point is that this is the answer the user gets. */
  def q198Sql(mod: Long): String =
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $Q193QueryId),
       |sc AS (
       |  SELECT e.vec_id AS id, ${graft.functions.Det.l2sqSql("e.embedding", "q.qv")} AS raw
       |  FROM embeddings e, q WHERE e.vec_id % $mod = 1),
       |r AS (
       |  SELECT id, raw,
       |         row_number() OVER (ORDER BY raw, id) AS rank
       |  FROM sc)
       |SELECT rank::INT AS rank, id, ${graft.functions.Det.r4Sql("raw")} AS score
       |FROM r WHERE rank <= $Q198K ORDER BY rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q112_indexed_topk_rewrite" -> (q112 _),
    "q193_indexed_topk_filtered" -> (q193 _),
    "q198_indexed_topk_declined" -> (q198 _))

  def oracles: Map[String, String] =
    lastQ112Aux.map { case (aux, p) =>
      "q112_indexed_topk_rewrite" -> q112Sql(aux, p)
    }.toMap ++
    lastQ193Aux.map { case (aux, p) =>
      "q193_indexed_topk_filtered" -> q193Sql(aux, p)
    }.toMap ++
    lastQ198Mod.map(mod => "q198_indexed_topk_declined" -> q198Sql(mod)).toMap
}

/** The rewrite itself — see [[IndexedTopK]] for the contract. Runs in
  * the user-provided optimizer batch (after constant folding, so the
  * query vector literal is already folded). Idempotent: the rewritten
  * child scans the LAYOUT path, which is never registered, so a
  * fixed-point re-application finds nothing to match. */
class IndexedTopKRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.getOption(IndexedTopK.EnabledConf).contains("true")

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformDown {
      // column pruning may slide a Project between the limit and the
      // sort (a trailing `.select(id)` lands there), so both shapes
      // must match — the Project is preserved above the rewritten sort
      case lim @ GlobalLimit(IntegerLiteral(k), ll @ LocalLimit(_, inner)) =>
        inner match {
          case sort @ Sort(SortOrder(dist, direction, _, _) +: _,
              true, child, _) =>
            rewrite(dist, direction, child, k) match {
              case Some(nc) => GlobalLimit(lim.limitExpr,
                LocalLimit(ll.limitExpr, sort.copy(child = nc)))
              case None => lim
            }
          case proj @ Project(_, sort @ Sort(
              SortOrder(dist, direction, _, _) +: _, true, child, _)) =>
            rewrite(dist, direction, child, k) match {
              case Some(nc) => GlobalLimit(lim.limitExpr,
                LocalLimit(ll.limitExpr,
                  proj.copy(child = sort.copy(child = nc))))
              case None => lim
            }
          case _ => lim
        }
    }

  /** (vector attribute, query literal, metric) when the sort key is a
    * distance between an attribute and a folded float-array literal. */
  private def distParts(dist: Expression): Option[(AttributeReference, Array[Float], String)] =
    dist match {
      case VectorDistance(a: AttributeReference,
          Literal(ad: ArrayData, ArrayType(FloatType, _)), m) =>
        Some((a, ad.toFloatArray(), m))
      case VectorDistance(Literal(ad: ArrayData, ArrayType(FloatType, _)),
          a: AttributeReference, m) =>
        Some((a, ad.toFloatArray(), m)) // both kernels are symmetric
      case _ => None
    }

  /** The metric/direction pairs the index serves: ascending squared-L2
    * (IVF's native geometry) and descending cosine similarity (the
    * facade's cosine policy on the same raw cells). A wrong-direction
    * sort is farthest-first — not a top-k read, never rewritten. */
  private def directionOk(metric: String, d: SortDirection): Boolean =
    (metric == "l2sq" && d == Ascending) || (metric == "cos" && d == Descending)

  /** The attached relation under an optional Project/Filter stack. */
  private def relationUnder(p: LogicalPlan): Option[LogicalRelation] = p match {
    case l: LogicalRelation => Some(l)
    case Project(_, c) => relationUnder(c)
    case Filter(_, c) => relationUnder(c)
    case _ => None
  }

  private def infoFor(rel: LogicalRelation): Option[IndexedTopK.IndexInfo] =
    rel.relation match {
      case h: HadoopFsRelation =>
        // exactly ONE root, and it must be attached: a multi-root scan
        // (spark.read.parquet(a, b)) covers rows a single root's layout
        // does not — substituting it would silently drop the other
        // roots' rows from the top-k
        h.location.rootPaths.toSeq match {
          case Seq(only) => IndexedTopK.lookup(only.toString)
          case _ => None
        }
      case _ => None
    }

  private def rewrite(dist: Expression, direction: SortDirection,
                      child: LogicalPlan, k: Int): Option[LogicalPlan] =
    (for {
      rel <- relationUnder(child)
      info <- infoFor(rel)
      (attr, qv, metric) <- distParts(dist)
      if directionOk(metric, direction) &&
        attr.name == info.vecCol && rel.outputSet.contains(attr) &&
        qv.length == info.centers.headOption.map(_.length).getOrElse(-1)
    } yield {
      val probed = Ann.rankCells(qv, info.centers,
        Ann.ivfProbeFor(info.centers.length))
      // cell-pruned candidate scan of the full-record layout, re-aliased
      // to the relation's attribute ids so the untouched Sort/Limit (and
      // any Project/Filter in between) bind unchanged
      val cand = spark.read.parquet(s"${info.layoutDir}/index")
        .where(col("cell").isInCollection(probed))
      val candPlan = cand.queryExecution.analyzed
      val byName = candPlan.output.map(a => a.name -> a).toMap
      val aliases: Seq[NamedExpression] = rel.output.map { o =>
        Alias(byName(o.name), o.name)(exprId = o.exprId,
          qualifier = o.qualifier)
      }
      val remapped = Project(aliases, candPlan)
      val rewritten = child.transformUp {
        case l: LogicalRelation if l.eq(rel) => remapped
      }
      // THE STARVED FALLBACK, decided at plan time (r18 — the q164
      // discipline reaching the declarative path): with a Filter in the
      // stack, the rewritten top-k ranks MATCHING CANDIDATES — a
      // selective predicate can starve the probed cells below k even
      // when the table holds ≥ k matching rows, and a facade probe
      // would rescue to the exact filtered scan. A Catalyst rule cannot
      // bolt a runtime fallback onto one plan, but it sits exactly
      // where the decision belongs: count the matching candidates
      // (limit-k over the pruned filtered scan — k rows, one cheap
      // nested job) and DECLINE the rewrite when they cannot reach k,
      // leaving the exact scan to serve min(k, matching) — "the index
      // proposes, the filtered scan decides", now literally. Sound for
      // the attachment's lifetime because the layout is a static
      // snapshot of the source (the attach contract); memoized per
      // (layout, probes, predicate, k) so optimizer re-runs and bench
      // repeats pay the count once.
      // NOTE the probe below executes a bounded nested Spark job AT PLAN
      // TIME (see [[IndexedTopK.SaturationProbeConf]] for the
      // reentrancy contract and the kill-switch); it never runs for an
      // unfiltered rewrite, and with the probe disabled a filtered
      // rewrite declines unconditionally (fail closed). Counting the
      // full rewritten plan (not assign/ ⋈ filter) is deliberate: the
      // predicate may reference any source column, and assign/ carries
      // only (id, cell) — the limit-k count is bounded at k rows either
      // way.
      val hasFilter = child.collectFirst { case f: Filter => f }.isDefined
      val probeEnabled =
        !spark.conf.getOption(IndexedTopK.SaturationProbeConf).contains("false")
      val saturated = !hasFilter || (probeEnabled && {
        val preds = child.collect { case Filter(c, _) => c.canonicalized.toString }
        val key = s"${info.layoutDir}|${probed.mkString(",")}|${preds.mkString("&")}|$k"
        // get-then-put, probe OUTSIDE the map lock: a racing duplicate
        // probe costs one bounded count; holding the LRU's mutex across
        // a plan-time Spark job would serialize planning instead
        val cached = IndexedTopK.saturationCache.get(key)
        if (cached != null) cached.booleanValue()
        else {
          val v = org.apache.spark.sql.graft.CatalystBridge.ofRows(spark, rewritten)
            .limit(k).count() >= k
          IndexedTopK.saturationCache.put(key, v)
          v
        }
      })
      if (saturated) {
        IndexedTopK.lastProbed = Some(probed)
        Some(rewritten)
      } else {
        IndexedTopK.starvedDeclines.incrementAndGet()
        None
      }
    }).flatten
}

/** `spark.sql.extensions` entry point: registers the rewrite at session
  * build time (config-driven deployments; live sessions can use
  * [[IndexedTopK.install]]). */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(sp => new IndexedTopKRule(sp))
}
