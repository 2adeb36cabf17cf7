package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  // ---- q104: the FULL Lloyd's loop (VERDICT r10 #7) -------------------
  //
  // q80 grades one iteration; q104 grades the LOOP — three chained
  // assignment+update rounds whose centroid hand-off is deterministic
  // across engines: each round's updated centroids are quantized with
  // the floor-based [[Det.r6]] formula (identical arithmetic in Spark
  // and DuckDB — no engine rounding-mode semantics), so round t+1's
  // assignment runs on byte-identical centroid inputs in both engines
  // and the only float tolerance left is the r4 on the REPORTED
  // statistics, q80's own contract. Per round the distributed shape is
  // exactly q80's: one corpus scan, broadcast k×dim centroids,
  // map-side-combinable argmin, k×dim-sized update shuffle, and a
  // k×dim driver collect (the re-broadcast hand-off — the loop's only
  // driver traffic). At 100 TB: rounds × one-scan-each, nothing else
  // grows with the data.

  private[graft] val LloydRounds = 3

  /** Distance to a DOUBLE centroid array — the same sequential
    * zip-fold shape as [[graft.functions.VectorFunctions.l2sq]], so the
    * DuckDB twin (list_sum over list_zip) sums in the same order. */
  private def dToCv: Column =
    // fused codegen kernel since r15 — identical double arithmetic in
    // index order, so the chained-CTE oracles transfer; the composed
    // HOF form ran the n×k×dim argmin through the interpreter
    graft.functions.AdcKernels.l2sqFD(col("embedding"), col("cv"))

  /** One Lloyd round: argmin assignment against the broadcast centroid
    * frame `(cid, cv: array<double>)`, returning (vec_id, cid, d,
    * embedding). */
  private def assignRound(e: DataFrame, cents: DataFrame): DataFrame =
    e.crossJoin(broadcast(cents))
      .withColumn("d", dToCv)
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d"), col("cid"))).as("m"),
        first(col("embedding")).as("embedding"))
      .select(col("vec_id"), col("m.cid").as("cid"), col("m.d").as("d"),
        col("embedding"))

  /** Centroid update: per-(cid, dim) mean quantized at [[Det.r6]],
    * collected k×dim-sized and rebuilt as the next round's broadcast
    * frame. Clusters that lost every member drop out (both engines
    * agree — the replay builds its next round from the same rows).
    *
    * Residual cross-engine risk (documented, accepted): the two engines'
    * `avg()` may sum the group's doubles in different orders, and a mean
    * landing within an ulp of a 0.5e-6 floor-cell boundary would flip
    * one quantized centroid, after which the chained rounds diverge
    * wholesale. The probability per cell is ~ulp/0.5e-6 ≈ 1e-10 (k×dim
    * = 512 cells × 3 rounds ≈ 1.5e3 draws per corpus), so the flake is
    * latent rather than observed. The robust alternative — an
    * order-pinned sum via `aggregate(sort_array(collect_list(...)))` —
    * needs a per-(cid, dim) collected list, i.e. cluster-membership-
    * sized driver-shape state per group, which is exactly the
    * corpus-growing structure this operator exists to avoid at 100 TB;
    * the boundary risk is the cheaper side of that trade. */
  private def updateRound(asg: DataFrame): Seq[(Int, Seq[Double])] =
    asg.select(col("cid"), posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy(col("cid"), col("i"))
      .agg(Det.r6(avg(col("x").cast("double"))).as("mu"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (cid, rows) =>
        (cid, rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq)
      }
      .toSeq.sortBy(_._1)

  private def centFrame(spark: SparkSession,
                        cs: Seq[(Int, Seq[Double])]): DataFrame = {
    import spark.implicits._
    cs.toDF("cid", "cv")
  }

  /** The library surface: iterate to a movement threshold (total
    * squared centroid displacement ≤ `eps`) or `maxRounds`. Returns the
    * final centroids and the number of UPDATE rounds run. Seeds are the
    * k lowest-id vectors (the graded queries' deterministic policy). */
  def lloydLoop(spark: SparkSession, dir: String, k: Int, eps: Double,
                maxRounds: Int): (Seq[(Int, Seq[Double])], Int) = {
    val e = embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    var cents = embeddings(spark, dir).where(col("vec_id") < k)
      .select(col("vec_id").cast("int"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).map(_.toDouble)))
      .toSeq.sortBy(_._1)
    var rounds = 0
    var movement = Double.MaxValue
    while (rounds < maxRounds && movement > eps) {
      val next = updateRound(assignRound(e, centFrame(spark, cents)))
      val prev = cents.toMap
      movement = next.map { case (cid, cv) =>
        prev.get(cid).map(p =>
          cv.zip(p).map { case (a, b) => (a - b) * (a - b) }.sum)
          .getOrElse(Double.MaxValue)
      }.sum
      cents = next
      rounds += 1
    }
    (cents, rounds)
  }

  def q104(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    // round 0: exact float seeds as doubles (no quantization needed —
    // float→double is exact in both engines)
    var cents = embeddings(spark, dir).where(col("vec_id") < KmK)
      .select(col("vec_id").cast("int"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).map(_.toDouble)))
      .toSeq.sortBy(_._1)
    var prev = cents
    var asg: DataFrame = null
    (1 to LloydRounds).foreach { _ =>
      asg = assignRound(e, centFrame(spark, cents))
      prev = cents
      cents = updateRound(asg)
    }
    // report: final-round assignment stats + last-round movement
    val mv = cents.map { case (cid, cv) =>
      val p = prev.toMap.apply(cid)
      (cid, cv.zip(p).map { case (a, b) => (a - b) * (a - b) }.sum)
    }
    asg.groupBy(col("cid"))
      .agg(count(lit(1)).as("n"), avg(col("d")).as("avg_d"))
      .join(broadcast(centFrame(spark, mv.map { case (c, m) => (c, Seq(m)) })
        .select(col("cid"), col("cv").getItem(0).as("movement"))), Seq("cid"))
      .select(col("cid"), col("n"), Det.r4(col("avg_d")).as("avg_d"),
        Det.r4(col("movement")).as("movement"))
      .orderBy(col("cid"))
  }

  val q104Sql: String = {
    val dim = 64
    def l2d(a: String, cv: String): String =
      s"list_sum(list_transform(list_zip($a, $cv), p -> (p[1]::DOUBLE - p[2]) * (p[1]::DOUBLE - p[2])))"
    def round(t: Int, prevC: String): String =
      s"""d$t AS (
         |  SELECT e.vec_id, c.cid, e.embedding,
         |         ${l2d("e.embedding", "c.cv")} AS d
         |  FROM e, $prevC c),
         |a$t AS (
         |  SELECT vec_id, cid, d, embedding FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                 ORDER BY d, cid) AS rn FROM d$t)
         |  WHERE rn = 1),
         |m$t AS (
         |  SELECT cid, g.i,
         |         ${Det.r6Sql(s"avg(embedding[g.i + 1]::DOUBLE)")} AS mu
         |  FROM a$t, range($dim) g(i) GROUP BY 1, 2),
         |c$t AS (SELECT cid, list(mu ORDER BY i) AS cv FROM m$t GROUP BY cid)"""
        .stripMargin
    val rounds = (1 to LloydRounds)
      .map(t => round(t, if (t == 1) "c0" else s"c${t - 1}"))
      .mkString(",\n")
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       |c0 AS (
       |  SELECT vec_id::INT AS cid,
       |         list_transform(embedding, x -> x::DOUBLE) AS cv
       |  FROM embeddings WHERE vec_id < $KmK),
       |$rounds,
       |mv AS (
       |  SELECT a.cid,
       |         list_sum(list_transform(list_zip(a.cv, b.cv),
       |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS movement
       |  FROM c$LloydRounds a JOIN c${LloydRounds - 1} b USING (cid))
       |SELECT a.cid, count(*) AS n,
       |       ${Det.r4Sql("avg(a.d)")} AS avg_d,
       |       ${Det.r4Sql("any_value(mv.movement)")} AS movement
       |FROM a$LloydRounds a JOIN mv ON mv.cid = a.cid
       |GROUP BY a.cid ORDER BY a.cid""".stripMargin
  }

  // ---- q111: the CONVERGENCE surface of lloydLoop (VERDICT r11 #7) ----
  //
  // q104 grades a fixed 3-round loop; q111 grades the loop whose round
  // count is DECIDED BY THE MOVEMENT THRESHOLD — the [[lloydLoop]]
  // library contract. The graded run iterates until total squared
  // centroid displacement ≤ eps (or maxRounds) and reports one row per
  // executed round: (round, movement, stopped). The oracle replays the
  // SAME quantized centroid chain (the q104 machinery) unrolled to the
  // run's round count and re-evaluates the same scalar stop condition
  // per round — if the engines disagreed on where the threshold fires,
  // the `stopped` flags (or an extra/missing row) would hash-mismatch.
  // eps = 0.03 sits in a measured magnitude gap (round-wise movements:
  // ~5.4 → 0.016-0.048 → ≤ 0.02 across sf dirs), so the raw-double
  // comparison both engines make is orders of magnitude away from the
  // boundary.

  private[graft] val Q111Eps = 0.03
  private[graft] val Q111MaxRounds = 6

  /** Round count of the most recent q111 run — the oracle unrolls this
    * many rounds (the lastAux dynamic-oracle contract: None until q111
    * executed). */
  @volatile private var lastQ111Rounds: Option[Int] = None

  def q111(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    var cents = embeddings(spark, dir).where(col("vec_id") < KmK)
      .select(col("vec_id").cast("int"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).map(_.toDouble)))
      .toSeq.sortBy(_._1)
    val hist = scala.collection.mutable.ListBuffer[(Int, Double)]()
    var rounds = 0
    var movement = Double.MaxValue
    while (rounds < Q111MaxRounds && movement > Q111Eps) {
      val next = updateRound(assignRound(e, centFrame(spark, cents)))
      val prev = cents.toMap
      movement = next.map { case (cid, cv) =>
        prev.get(cid).map(p =>
          cv.zip(p).map { case (a, b) => (a - b) * (a - b) }.sum)
          .getOrElse(Double.MaxValue)
      }.sum
      cents = next
      rounds += 1
      hist += ((rounds, movement))
    }
    lastQ111Rounds = Some(rounds)
    hist.toSeq
      .map { case (t, m) => (t, m, m <= Q111Eps) }
      .toDF("round", "movement", "stopped")
      .withColumn("movement", Det.r4(col("movement")))
      .orderBy("round")
  }

  /** Oracle for q111, unrolled to the graded run's round count: the q104
    * chained-CTE centroid chain, one movement row per round, the same
    * `m ≤ eps` stop predicate. */
  def q111Sql(r: Int): String = {
    val dim = 64
    def l2d(a: String, cv: String): String =
      s"list_sum(list_transform(list_zip($a, $cv), p -> (p[1]::DOUBLE - p[2]) * (p[1]::DOUBLE - p[2])))"
    def round(t: Int, prevC: String): String =
      s"""d$t AS (
         |  SELECT e.vec_id, c.cid, e.embedding,
         |         ${l2d("e.embedding", "c.cv")} AS d
         |  FROM e, $prevC c),
         |a$t AS (
         |  SELECT vec_id, cid, d, embedding FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                 ORDER BY d, cid) AS rn FROM d$t)
         |  WHERE rn = 1),
         |m$t AS (
         |  SELECT cid, g.i,
         |         ${Det.r6Sql(s"avg(embedding[g.i + 1]::DOUBLE)")} AS mu
         |  FROM a$t, range($dim) g(i) GROUP BY 1, 2),
         |c$t AS (SELECT cid, list(mu ORDER BY i) AS cv FROM m$t GROUP BY cid)"""
        .stripMargin
    val rounds = (1 to r)
      .map(t => round(t, if (t == 1) "c0" else s"c${t - 1}"))
      .mkString(",\n")
    val movs = (1 to r).map { t =>
      s"""mv$t AS (
         |  SELECT sum(list_sum(list_transform(list_zip(a.cv, b.cv),
         |    p -> (p[1] - p[2]) * (p[1] - p[2])))) AS m
         |  FROM c$t a JOIN c${if (t == 1) "0" else (t - 1).toString} b USING (cid))"""
        .stripMargin
    }.mkString(",\n")
    val sel = (1 to r)
      .map(t => s"SELECT $t AS round, m FROM mv$t")
      .mkString(" UNION ALL ")
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       |c0 AS (
       |  SELECT vec_id::INT AS cid,
       |         list_transform(embedding, x -> x::DOUBLE) AS cv
       |  FROM embeddings WHERE vec_id < $KmK),
       |$rounds,
       |$movs
       |SELECT round::INT AS round, ${Det.r4Sql("m")} AS movement,
       |       m <= $Q111Eps AS stopped
       |FROM ($sel) ORDER BY round""".stripMargin
  }

  // ---- Q114: centroid-distance outlier gate (prototypicality filter) --
  //
  // The embedding-space quality gate of a curation pipeline (the
  // outlier-removal step that runs beside SemDeDup/q90): vectors far
  // from their group's centroid are atypical for the group —
  // mislabeled, noisy, or off-distribution — and get flagged before
  // training. Groups here are the `label` column (at 100 TB: the
  // cluster id a k-means pass assigned, the q80/q104 output).
  //
  // Shape: one (label × dim)-sized mean agg (map-side combinable)
  // builds the centroids — quantized at [[Det.r6]], the q104 hand-off
  // convention, so both engines score against byte-identical centroid
  // inputs and the θ comparison flips identically — then ONE corpus
  // scan with the label-count-sized centroid frame broadcast. Nothing
  // but the k×dim frame crosses stages; no window, no driver collect.

  private[graft] val OutlierTheta = 1.02 // ≈ the p95 of the d² mass

  def q114(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddings(spark, dir)
    val cents = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy(col("label"), col("i"))
      .agg(Det.r6(avg(col("x").cast("double"))).as("mu"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("mu")))),
        s => s("mu")).as("cv"))
    e.join(broadcast(cents), Seq("label"))
      .withColumn("d", dToCv)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("d") > OutlierTheta, 1L).otherwise(0L)).as("n_outliers"),
        Det.r4(avg(col("d"))).as("avg_d"),
        Det.r4(max(col("d"))).as("max_d"))
      .orderBy(col("label"))
  }

  val q114Sql: String = {
    val dim = 64
    s"""WITH m AS (
       |  SELECT label, g.i,
       |         ${Det.r6Sql(s"avg(embedding[g.i + 1]::DOUBLE)")} AS mu
       |  FROM embeddings, range($dim) g(i) GROUP BY 1, 2),
       |c AS (SELECT label, list(mu ORDER BY i) AS cv FROM m GROUP BY 1),
       |d AS (
       |  SELECT e.label, ${Det.l2sqSql("e.embedding", "c.cv")} AS d
       |  FROM embeddings e JOIN c USING (label))
       |SELECT label, count(*)::BIGINT AS n,
       |       sum(CASE WHEN d > $OutlierTheta THEN 1 ELSE 0 END)::BIGINT
       |         AS n_outliers,
       |       ${Det.r4Sql("avg(d)")} AS avg_d,
       |       ${Det.r4Sql("max(d)")} AS max_d
       |FROM d GROUP BY label ORDER BY label""".stripMargin
  }

  // ---- q121: PCA via distributed power iteration ----------------------
  //
  // The whitening/rotation pre-step of the compression families (OPQ
  // rotates before PQ; SQ ranges tighten after decorrelation) and the
  // standard embedding-drift diagnostic. A 100 TB corpus cannot
  // materialize its covariance matrix, but power iteration never needs
  // it: each round is ONE corpus scan computing s = Σᵢ xᵢ(xᵢ·v) — a
  // per-row dot against the broadcast v (dim-sized literal), then a
  // dim-sized partial-aggregable sum — followed by a dim-sized driver
  // normalization, exactly the Lloyd-loop cost shape (rounds × one
  // scan; nothing else grows with data). Component 2 runs on the
  // deflated residual xᵢ − (xᵢ·v₁)v₁, computed on the fly per row.
  //
  // Determinism is the q104 convention: every driver hand-off (mean
  // vector, per-round s, normalized v) is r6-floor-quantized, so both
  // engines replay the identical chain; the md5 seed family (q32's)
  // regenerates v₀ bit-identically in SQL. Residual risk is the
  // documented grid-mean boundary class (SCALING.md) — a cross-engine
  // summation-order ulp only matters within an ulp of a 1e-6 floor
  // boundary.

  private[graft] val PcaComponents = 2
  private[graft] val PcaRounds = 3
  private val PcaDim = Ann.Dim

  private def q6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
  private def q4d(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  /** md5-seeded start vector for component `c`, normalized then
    * r6-quantized — the q32 plane family, regenerable in SQL. */
  private def pcaSeed(c: Int): Array[Double] = {
    val raw = Array.tabulate(PcaDim)(j => Ann.md5Coef(s"graft_pca_${c}_$j"))
    val norm = math.sqrt(raw.map(x => x * x).sum)
    raw.map(x => q6d(x / norm))
  }

  /** Per-row dot of an array<double> column against a quantized driver
    * vector (broadcast as a literal array; `aggregate` folds left like
    * the oracle's list_sum). */
  private def dotVec(a: Column, v: Array[Double]): Column =
    // fused codegen kernel since r15 (same fold-left double sum in
    // index order — the oracle's list_sum transfer holds); v stays a
    // literal, so the plan is per-round unique either way, but the
    // inner loop is now generated instead of interpreted
    graft.functions.AdcKernels.dotDD(a, array(v.map(lit): _*))

  /** One power-iteration round over `xc` (vec_id, xc: array<double>):
    * s = Σᵢ xcᵢ(xcᵢ·v) as ONE global aggregate — dim `sum` columns,
    * partial per partition, a single-row final (an explode + groupBy(j)
    * formulation shuffled 64×n rows across 32 tasks and tripled the
    * round's wall time on job overhead alone) — collected, r6-quantized,
    * normalized, r6-quantized again. Returns (v', ‖s‖). */
  private def powerRound(xc: DataFrame, v: Array[Double]): (Array[Double], Double) = {
    val row = xc.withColumn("d", dotVec(col("xc"), v))
      .select((0 until PcaDim).map(j =>
        sum(col("xc").getItem(j) * col("d")).as(s"s$j")): _*)
      .head()
    val s = Array.tabulate(PcaDim)(j => q6d(row.getDouble(j)))
    val norm = math.sqrt(s.map(x => x * x).sum)
    (s.map(x => q6d(x / norm)), norm)
  }

  /** q121: top-2 principal loadings of the embedding corpus + eigenvalue
    * estimates (‖s‖/n of the final round). 128 graded rows — every
    * loading of both components must match the oracle's replay of the
    * full quantized chain. */
  def q121(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    // count + per-dim means in ONE scan/job
    val muRow = e.select(count(lit(1)).as("n") +:
      (0 until PcaDim).map(j =>
        avg(col("embedding").getItem(j).cast("double")).as(s"m$j")): _*).head()
    val n = muRow.getLong(0)
    val mu = Array.tabulate(PcaDim)(j => q6d(muRow.getDouble(j + 1)))
    // centered corpus is scanned by every power round (3 per component)
    // — materialize once instead of re-reading parquet + re-centering.
    // persist + explicit free (not localCheckpoint: r12 leaked two
    // corpus-sized never-unpersisted checkpoints per invocation — the
    // largest single contributor to the bench's checkpoint debt); every
    // driver hand-off is collected, so nothing lazy outlives the pins
    val xc = e.select(col("vec_id"),
      zip_with(col("embedding"), array(mu.map(lit): _*),
        (x, m) => x.cast("double") - m).as("xc"))
      .persist()
    xc.count()

    def iterate(base: DataFrame, c: Int): (Array[Double], Double) = {
      var v = pcaSeed(c)
      var lastNorm = 0.0
      (1 to PcaRounds).foreach { _ =>
        val (nv, norm) = powerRound(base, v); v = nv; lastNorm = norm
      }
      (v, lastNorm)
    }
    val (v1, norm1) = iterate(xc, 1)
    // deflate: component 2 searches the subspace orthogonal to v1
    val rc = xc.withColumn("dw", dotVec(col("xc"), v1))
      .select(col("vec_id"),
        zip_with(col("xc"), array(v1.map(lit): _*),
          (x, wj) => x - col("dw") * wj).as("xc"))
      .persist()
    rc.count()
    xc.unpersist(blocking = false)
    val (v2, norm2) = iterate(rc, 2)
    rc.unpersist(blocking = false)

    (v1.zipWithIndex.map { case (l, j) => (1, j, l, q4d(norm1 / n)) } ++
      v2.zipWithIndex.map { case (l, j) => (2, j, l, q4d(norm2 / n)) })
      .toSeq.toDF("component", "j", "loading", "eigval")
      .orderBy(col("component"), col("j"))
  }

  /** Oracle: the identical quantized chain in SQL — r6 means, md5 seeds,
    * three rounds per component (per-row list dot, dim-sized r6 sums,
    * r6 normalization), deflation, r4 eigenvalues. */
  val q121Sql: String = {
    val d = PcaDim
    def r6 = Det.r6Sql _
    // one power round: (xc table, vPrev) -> d/s/n/v CTEs with suffix t
    def round(t: String, xcT: String, vPrev: String): String =
      s"""d$t AS (
         |  SELECT x.vec_id, x.x,
         |         list_sum(list_transform(list_zip(x.x, v.v),
         |           p -> p[1] * p[2])) AS d
         |  FROM $xcT x, $vPrev v),
         |s$t AS (
         |  SELECT g.i AS j, ${r6(s"sum(x[g.i + 1] * d)")} AS s
         |  FROM d$t, range($d) g(i) GROUP BY 1),
         |n$t AS (SELECT sqrt(sum(s * s)) AS nr FROM s$t),
         |v$t AS (SELECT list(${r6("s / nr")} ORDER BY j) AS v
         |        FROM s$t, n$t)""".stripMargin
    def seed(c: Int): String =
      s"""seed$c AS (
         |  SELECT j,
         |         ('0x' || substr(md5('graft_pca_${c}_' || j), 1, 8))::BIGINT
         |           / 2147483648.0 - 1.0 AS raw
         |  FROM range($d) t(j)),
         |sn$c AS (SELECT sqrt(sum(raw * raw)) AS nr FROM seed$c),
         |v${c}0 AS (SELECT list(${r6("raw / nr")} ORDER BY j) AS v
         |           FROM seed$c, sn$c)""".stripMargin
    s"""WITH mu0 AS (
       |  SELECT g.i AS j,
       |         ${r6(s"avg(embedding[g.i + 1]::DOUBLE)")} AS m
       |  FROM embeddings, range($d) g(i) GROUP BY 1),
       |mul AS (SELECT list(m ORDER BY j) AS m FROM mu0),
       |xc AS (
       |  SELECT e.vec_id,
       |         list_transform(list_zip(e.embedding, mul.m),
       |           p -> p[1]::DOUBLE - p[2]) AS x
       |  FROM embeddings e, mul),
       |${seed(1)},
       |${round("11", "xc", "v10")},
       |${round("12", "xc", "v11")},
       |${round("13", "xc", "v12")},
       |dw AS (
       |  SELECT x.vec_id, x.x,
       |         list_sum(list_transform(list_zip(x.x, v.v),
       |           p -> p[1] * p[2])) AS dw
       |  FROM xc x, v13 v),
       |rc AS (
       |  SELECT w.vec_id,
       |         list_transform(list_zip(w.x, v.v),
       |           p -> p[1] - w.dw * p[2]) AS x
       |  FROM dw w, v13 v),
       |${seed(2)},
       |${round("21", "rc", "v20")},
       |${round("22", "rc", "v21")},
       |${round("23", "rc", "v22")},
       |nn AS (SELECT count(*)::DOUBLE AS n FROM embeddings),
       |out1 AS (
       |  SELECT 1 AS component, g.i AS j, v.v[g.i + 1] AS loading,
       |         ${Det.r4Sql("n13.nr / nn.n")} AS eigval
       |  FROM v13 v, n13, nn, range($d) g(i)),
       |out2 AS (
       |  SELECT 2 AS component, g.i AS j, v.v[g.i + 1] AS loading,
       |         ${Det.r4Sql("n23.nr / nn.n")} AS eigval
       |  FROM v23 v, n23, nn, range($d) g(i))
       |SELECT component::INT AS component, j::INT AS j, loading, eigval
       |FROM (SELECT * FROM out1 UNION ALL SELECT * FROM out2)
       |ORDER BY component, j""".stripMargin
  }

  // ---- q142: embedding distribution-drift monitor (r13) ----------------
  //
  // The embedding-ops check a production pipeline runs when a new model
  // version (or a new corpus month) lands: per-dimension mean comparison
  // between two embedding populations, flagging dimensions whose shift
  // exceeds a threshold — upstream of every ANN/cluster consumer whose
  // trained state (codebooks, grids, rotations) silently degrades under
  // drift. Versions are simulated from the one corpus (the q130
  // precedent): A = even vec_ids, B = odd vec_ids with a deterministic
  // +0.08 shift injected on dims 0–7 IN DOUBLE (both engines apply the
  // identical literal, so the planted drift is engine-exact); the
  // report must flag exactly those dims. Means average RAW doubles (the
  // q115/q117 lesson: continuous float inputs sit off the r4 grid, the
  // q89 margin argument) and round once at the readout.
  //
  // 100 TB shape: ONE scan of both populations, a dim-keyed (64-group)
  // map-side-combinable aggregate, zero joins.

  private val DriftDims = 8
  private val DriftShift = 0.08
  private val DriftFlag = 0.05

  def q142(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val rows = e.select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("j", "x")))
      .select(col("j"), (col("vec_id") % 2 === 0).as("isA"),
        (col("x").cast("double") +
          when(col("vec_id") % 2 =!= 0 && col("j") < DriftDims,
            lit(DriftShift)).otherwise(lit(0.0))).as("xv"))
    rows.groupBy(col("j"))
      .agg(avg(when(col("isA"), col("xv"))).as("rawA"),
        avg(when(!col("isA"), col("xv"))).as("rawB"))
      .select(col("j"),
        graft.functions.Det.r4(col("rawA")).as("mean_a"),
        graft.functions.Det.r4(col("rawB")).as("mean_b"),
        graft.functions.Det.r4(col("rawB") - col("rawA")).as("shift"),
        (abs(col("rawB") - col("rawA")) > DriftFlag).as("drifted"))
      .orderBy(col("j"))
  }

  val q142Sql: String =
    s"""WITH x AS (
       |  SELECT g.i AS j, vec_id % 2 = 0 AS isA,
       |         embedding[g.i + 1]::DOUBLE +
       |           CASE WHEN vec_id % 2 <> 0 AND g.i < $DriftDims
       |                THEN $DriftShift ELSE 0.0 END AS xv
       |  FROM embeddings, range($PcaDim) g(i)),
       |m AS (
       |  SELECT j,
       |         avg(CASE WHEN isA THEN xv END) AS rawA,
       |         avg(CASE WHEN NOT isA THEN xv END) AS rawB
       |  FROM x GROUP BY 1)
       |SELECT j::INT AS j, ${Det.r4Sql("rawA")} AS mean_a,
       |       ${Det.r4Sql("rawB")} AS mean_b,
       |       ${Det.r4Sql("rawB - rawA")} AS shift,
       |       abs(rawB - rawA) > $DriftFlag AS drifted
       |FROM m ORDER BY j""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q80_kmeans_step" -> (q80 _),
    "q104_kmeans_lloyd" -> (q104 _),
    "q111_kmeans_converged" -> (q111 _),
    "q114_centroid_outliers" -> (q114 _),
    "q121_pca_power" -> (q121 _),
    "q142_embedding_drift" -> (q142 _))

  def oracles: Map[String, String] = Map(
    "q142_embedding_drift" -> q142Sql,
    "q80_kmeans_step" -> q80Sql,
    "q104_kmeans_lloyd" -> q104Sql,
    "q114_centroid_outliers" -> q114Sql,
    "q121_pca_power" -> q121Sql) ++
    lastQ111Rounds.map(r => "q111_kmeans_converged" -> q111Sql(r))
}
