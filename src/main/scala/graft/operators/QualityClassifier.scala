package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{AdcKernels, FeatureHashVec, LogisticGrad, VecSumAgg}
import graft.functions.Det.{r4, r4Sql}
import graft.sources.Tables

/** q158–q160: TRAINED quality classifier — logistic regression
  * distilling the Gopher structural gate (q59's rule outcome) into a
  * fastText-style scorer over hashed bag-of-words + document-statistics
  * features, plus the two APPLY shapes a production curation pipeline
  * runs. This is the model-based half of the standard two-stage quality
  * pipeline (CCNet / GPT-3 / LLaMA data recipes, all public): run the
  * expensive rule gate (or a curated reference corpus) once to produce
  * labels, fit a cheap linear scorer on them, and from then on score new
  * corpus batches with one narrow scan instead of the full rule cascade.
  * The rule gate already exists as q59; q158 LEARNS it, q159 grades the
  * learned scorer on a HELD-OUT half (the generalization claim — the
  * whole point of distilling is scoring docs the gate never labeled),
  * and q160 runs the apply side as a genuine Structured Streaming query
  * against a standing model (the live-crawl shape, the q157 pattern).
  *
  * Features (72 dims, all exact or single-division arithmetic so both
  * engines build bit-identical vectors):
  *  - 0..63  — [[FeatureHashVec]] signed unigram+bigram counts (the
  *    q129 hashing-trick embedding), normalized by token count (the
  *    fastText averaging that keeps per-dim magnitudes O(1); raw counts
  *    made full-batch GD oscillate — measured: all-negative →
  *    all-positive flips at every tested lr).
  *  - 64..70 — the q59 statistics the gate actually thresholds, scaled
  *    to O(1): n_words/100, mean_word_len/10, alpha_frac, sym_ratio,
  *    bullet_frac, ellipsis_frac, n_stop/10. A linear model cannot
  *    represent the gate's two-sided bands exactly, so train accuracy
  *    saturates ~0.84 — the honest distillation ceiling, not a bug.
  *  - 71     — bias.
  *
  * Training: [[Rounds]] full-batch gradient-descent rounds,
  * w ← q6(w − lr·q6(Σ(p−y)x)/n), every aggregate and every weight
  * r6-quantized exactly like the q104/q121 loop chains — the
  * quantization grid (1e-6) sits far above the cross-engine float noise
  * (≤1e-10 on these sums), so DuckDB replays the ENTIRE trajectory
  * bit-for-bit. lr=3, R=10 chosen on the measured grid (0.832–0.842
  * accuracy across sf0.001/0.01/0.1 vs 0.58–0.60 majority baseline;
  * all four confusion cells populated at sf0.01/0.1 — sf0.001's 500
  * docs leave the false-negative cell empty; lr=3 reaches the lr=2/
  * R=20 plateau in half the rounds and holds it flat, lr≥4
  * oscillates).
  *
  * q158's output grades BOTH halves: the 72 learned weights (sect='w' —
  * any divergence anywhere in the round trajectory shows here) and the
  * label×prediction confusion matrix with mean score (sect='cm' — the
  * applied-scorer contract). q159 emits the same shape with the model
  * fit on even doc_ids and the confusion measured on odd ones. q160
  * emits per-document scores of the streamed (odd) half.
  *
  * 100 TB shape: feature build is ONE narrow scan (the hash
  * accumulation is a fused codegen expression; the stats are per-row
  * splits), persisted once and scanned by every round; each round is
  * one fused [[LogisticGrad]] row kernel under a single [[VecSumAgg]]
  * map-side-partial buffer collapsing to 72 doubles on the driver (the
  * q121 powerRound shape — no explode, no (doc, dim) shuffle; the
  * composed 72-sum-columns form paid ≈0.23 s/round in Catalyst alone).
  * Scoring new data afterward is a single fused-kernel pass — batch
  * (q159) or per-micro-batch on a stream (q160).
  * Reference: the reference has no model-based curation at all
  * (SURVEY §2 — its quality surface stops at stored metadata), so this
  * extends the engine along the axis its users curate training data on.
  */
object QualityClassifier {

  private[graft] val HashDims = FeatureHashVec.Dims // 64
  private[graft] val Dims = HashDims + 7 + 1 // + q59 stats + bias
  private[graft] val Rounds = 10
  private[graft] val Lr = 3.0
  // floor for the in-script gates: train-side measured 0.832–0.842
  // across sf dirs (lr=3 reaches the lr=2/R=20 plateau by round 10 and
  // holds it flat through r24 on every dir; lr≥4 oscillates — grid
  // re-measured); majority baseline 0.58–0.60. Anything under 0.75
  // means the trajectory diverged (wrong data, wrong arithmetic), not
  // noise. The held-out floor is looser: the even/odd halves are iid
  // splits of the same synthetic corpus, but half the data fits a
  // slightly different boundary.
  private val AccFloor = 0.75
  private val HoldoutFloor = 0.70

  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "documents")

  /** The feature/label columns over ANY documents frame (batch or
    * stream — every expression is stateless per-row): (doc_id,
    * x: array<double>[72], y: int). Stats columns replicate q59's
    * expressions verbatim (same splits, same int/int divisions) so the
    * label IS the q59 gate. */
  private def featureCols(docsDf: DataFrame): DataFrame =
    docsDf
      .withColumn("fh", FeatureHashVec(col("text")))
      .withColumn("ntg",
        greatest(size(regexp_extract_all(lower(col("text")),
          lit("[a-z0-9]+"), lit(0))), lit(1)).cast("double"))
      .withColumn("words", expr("filter(split(text, '\\\\s+'), w -> w != '')"))
      .withColumn("lines", split(col("text"), "\n"))
      .withColumn("n_words", size(col("words")))
      .withColumn("mean_word_len_raw",
        expr("aggregate(words, 0L, (a, w) -> a + length(w))").cast("double")
          / col("n_words"))
      .withColumn("alpha_frac_raw",
        expr("size(filter(words, w -> w rlike '[A-Za-z]'))").cast("double")
          / col("n_words"))
      .withColumn("sym_ratio_raw",
        ((length(col("text")) - length(regexp_replace(col("text"), "#", ""))) +
          expr("(length(text) - length(regexp_replace(text, '\\\\.\\\\.\\\\.', ''))) div 3"))
          .cast("double") / col("n_words"))
      .withColumn("bullet_frac_raw",
        expr("size(filter(lines, l -> l rlike '^\\\\s*[-*]'))").cast("double")
          / size(col("lines")))
      .withColumn("ellipsis_frac_raw",
        expr("size(filter(lines, l -> l rlike '\\\\.\\\\.\\\\.\\\\s*$'))").cast("double")
          / size(col("lines")))
      .withColumn("n_stop",
        expr(s"size(array_intersect(array_distinct(transform(words, w -> lower(w))), array(${TextAnalysis.StopEn.map(w => s"'$w'").mkString(",")})))"))
      .withColumn("y",
        (col("n_words").between(TextAnalysis.GopherMinWords, TextAnalysis.GopherMaxWords) &&
          col("mean_word_len_raw").between(3.0, 10.0) &&
          col("sym_ratio_raw") <= 0.1 &&
          col("bullet_frac_raw") <= 0.9 &&
          col("ellipsis_frac_raw") <= 0.3 &&
          col("alpha_frac_raw") >= 0.8 &&
          col("n_stop") >= 2).cast("int"))
      .select(col("doc_id"),
        concat(
          transform(col("fh"), f => f.cast("double") / col("ntg")),
          array(
            col("n_words").cast("double") / lit(100.0),
            col("mean_word_len_raw") / lit(10.0),
            col("alpha_frac_raw"),
            col("sym_ratio_raw"),
            col("bullet_frac_raw"),
            col("ellipsis_frac_raw"),
            col("n_stop").cast("double") / lit(10.0),
            lit(1.0))).as("x"),
        col("y"),
        // raw [a-z0-9]+ token count (NOT the ntg greatest(…,1) floor) —
        // q161's survivor-token stage sums this instead of re-scanning
        // text a fourth time
        size(regexp_extract_all(lower(col("text")),
          lit("[a-z0-9]+"), lit(0))).as("ntok"))

  /** (doc_id, x, y) — the batch training matrix.
    *
    * The doc_id hash repartition exists for the build, not the loop:
    * the regex/hash feature pass is the expensive scan, and the sf-dir
    * parquet arrives as ONE file-partition, which would run it
    * single-threaded (measured 0.86 s at sf0.1 vs ~0.1 s spread). At
    * 100 TB the source is already thousands of splits and the exchange
    * is a no-op cost next to the scan it parallelizes. */
  private[graft] def featureFrame(spark: SparkSession, dir: String): DataFrame =
    featureCols(docs(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id")))

  /** The feature matrix as a STANDING per-dir pin — it is a pure
    * function of the immutable dir (the StandingCache contract), and
    * WITHOUT materialization the collapsed projection re-evaluates the
    * interpreted-HOF stat expressions once per downstream REFERENCE
    * (measured: one scoring pass over the unpersisted frame cost 4.0 s
    * at sf0.1 vs ~0.1 s over the cache). q158/q159/q161 and the q160
    * standing model all scan this one pin; coalesce(8) keeps the
    * per-round training jobs dispatch-light (see [[q158]]). */
  private def standingFeat(spark: SparkSession, dir: String): DataFrame =
    StandingCache.frame(dir, "qc_features")(
      featureFrame(spark, dir).coalesce(8))

  private def sigmoid(z: Column): Column =
    lit(1.0) / (lit(1.0) + exp(-z))

  private def wlit(wv: Array[Double]): Column =
    array(wv.map(lit).toIndexedSeq: _*)

  /** The quantized full-batch GD loop over a (persisted) feature frame.
    * Each round is ONE fused-kernel aggregate (LogisticGrad row sweep
    * under a single VecSumAgg buffer) — the composed form (72-literal
    * dot + 72 separate sum() columns) cost ≈0.23 s/round in CATALYST
    * alone, paid R× per fit; fused, a round is the job dispatch. */
  private def fit(feat: DataFrame, n: Double): Array[Double] = {
    var wv = Array.fill(Dims)(0.0)
    (1 to Rounds).foreach { _ =>
      val g = feat
        .select(VecSumAgg.vecSum(
          LogisticGrad.grad(col("x"), wlit(wv), col("y")), Dims).as("g"))
        .head().getSeq[Double](0)
      wv = Array.tabulate(Dims)(j => q6(wv(j) - Lr * q6(g(j)) / n))
    }
    wv
  }

  /** label×prediction confusion cells with mean score — the applied-
    * scorer pass (one fused dot per row). */
  private def confusion(feat: DataFrame, wv: Array[Double]): Array[Row] =
    feat
      .withColumn("p", sigmoid(AdcKernels.dotDD(col("x"), wlit(wv))))
      .withColumn("pred", (col("p") >= 0.5).cast("int"))
      .groupBy(col("y"), col("pred"))
      .agg(count(lit(1)).as("n_docs"), r4(avg(col("p"))).as("avg_p"))
      .collect()

  private def accuracyOf(cm: Array[Row]): Double = {
    val total = cm.map(_.getLong(2)).sum.toDouble
    cm.filter(r => r.getInt(0) == r.getInt(1)).map(_.getLong(2)).sum / total
  }

  private def emit(spark: SparkSession, wv: Array[Double],
      cm: Array[Row]): DataFrame = {
    import spark.implicits._
    val wRows = wv.zipWithIndex.map { case (w, j) => ("w", j, 0, 0L, w) }
    val cmRows = cm.map(r =>
      ("cm", r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    (wRows ++ cmRows).toSeq
      .toDF("sect", "i", "j", "n", "v")
      .orderBy(col("sect"), col("i"), col("j"))
  }

  /** q158: fit on the full corpus, grade weights + in-sample confusion.
    *
    * The feature matrix is the standing per-dir pin; the WEIGHTS are
    * per-invocation state (the refit IS the graded work — q160's
    * standing model memoizes the even-half fit separately).
    * coalesce(8) on the pin: the loop re-scans it R+1 times and each
    * round's aggregate is driver-bound on task dispatch, not compute —
    * 8 cached partitions keep the build parallel while the per-round
    * job stays small. Local[32] tuning only in degree; the shape
    * (partial agg → 72 doubles) is partition-count-independent. */
  def q158(spark: SparkSession, dir: String): DataFrame = {
    val feat = standingFeat(spark, dir)
    val n = feat.count().toDouble
    val wv = fit(feat, n)
    val cm = confusion(feat, wv)

    val acc = accuracyOf(cm)
    require(acc >= AccFloor,
      f"q158 distillation accuracy $acc%.3f under the $AccFloor floor " +
        "(measured 0.832-0.842 across sf dirs) - the quantized GD " +
        "trajectory diverged; check the feature/label arithmetic")
    emit(spark, wv, cm)
  }

  /** q159: the GENERALIZATION grade — fit on even doc_ids only, emit
    * the same (weights, confusion) shape with the confusion measured on
    * the held-out odd half. This is the claim that justifies the
    * distillation: the scorer prices documents the gate never labeled.
    * One cache serves both halves (the filters prune the cached
    * partitions, not re-scan the dir). */
  def q159(spark: SparkSession, dir: String): DataFrame = {
    val all = standingFeat(spark, dir)
    // the even-half fit is deterministic by construction (that is what
    // the oracle's full-trajectory replay grades), so q159 serves the
    // SAME weights [[standingModel]] memoizes for q160-q163 rather than
    // refitting per invocation; the refit-is-the-graded-work claim
    // belongs to q158 alone (the full-corpus fit nothing else computes)
    val wv = standingModel(spark, dir)
    val cm = confusion(all.where(pmod(col("doc_id"), lit(2)) === 1), wv)

    val acc = accuracyOf(cm)
    require(acc >= HoldoutFloor,
      f"q159 held-out accuracy $acc%.3f under the $HoldoutFloor floor - " +
        "the even-half model does not generalize to the odd half")
    emit(spark, wv, cm)
  }

  /** The standing model for q160 — the even-half weights, fit once per
    * JVM per dir (the [[StandingCache]] artifact contract: the dir is
    * immutable while cached; `invalidate(dir)`/`clear()` evict). The
    * production analogue: the quality model is trained offline and
    * SERVED to the ingest stream, not refit per micro-batch. */
  private[graft] def standingModel(spark: SparkSession, dir: String): Array[Double] =
    StandingCache.artifact(dir, "q158_model_even") {
      val train = standingFeat(spark, dir)
        .where(pmod(col("doc_id"), lit(2)) === 0)
      fit(train, train.count().toDouble)
    }

  /** q160: STREAMING quality scoring — the apply side of the two-stage
    * pipeline as a genuine Structured Streaming query (the q157/q132
    * shape): documents arrive as a file-source stream, each micro-batch
    * pays the stateless feature pass + one fused dot against the
    * standing even-half model (append mode, no state), and the drained
    * sink holds per-document scores of the streamed (odd) half. Graded
    * against the SAME trajectory replay as q159 with a per-document
    * tail — stream/batch parity through the model itself. */
  def q160(spark: SparkSession, dir: String): DataFrame = {
    val wv = standingModel(spark, dir)
    val scoredStream = featureCols(
      graft.streaming.EventStream.docStream(spark, dir))
      .where(pmod(col("doc_id"), lit(2)) === 1)
      .withColumn("p", sigmoid(AdcKernels.dotDD(col("x"), wlit(wv))))
      .select(col("doc_id"), col("y"),
        (col("p") >= 0.5).cast("int").as("pred"), r4(col("p")).as("p"))
    graft.streaming.EventStream.drainToTable(spark, "graft_q160_sink",
      scoredStream.writeStream.outputMode("append").format("memory")
        .queryName("graft_q160_sink").start())
      .orderBy(col("doc_id"))
  }

  /** q161: the end-to-end curation FUNNEL with the trained scorer in
    * its production role — the composed loop a pre-training pipeline
    * actually runs (CurationDemo's arc, now graded):
    *
    *   corpus → model quality gate (the q158/q160 standing even-half
    *   model scoring EVERY doc, the CCNet shape: the cheap learned
    *   scorer replaces the rule cascade corpus-wide) → exact dedup
    *   (q16's digest keepers) → decontamination (q63's benchmark
    *   n-gram overlap; the bench docs themselves leave here — they ARE
    *   the eval set) → surviving token mass.
    *
    * Emits one row per stage (stage, name, n). Every stage is a
    * doc_id semi-join on the previous survivor set — at 100 TB the
    * stage frames are two-column id+flag sets and each semi-join
    * broadcasts or shuffles ids, never text. The oracle composes the
    * SAME SQL the component gates are graded by (chainSql + q16Sql +
    * q63Sql verbatim), so the funnel can only pass if the composition
    * semantics match end-to-end. */
  def q161(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wv = standingModel(spark, dir)
    val feat = standingFeat(spark, dir)
    // ONE flag-conjunction pass (r21 — guide §2.4/§1.2: don't run six
    // jobs for numbers one plan derives). The pre-r21 form materialized
    // each stage as persist+count over chained left_semi joins — five
    // actions per invocation, each re-dispatching over the same pinned
    // frame. Every gate set is keyed 1:1 by doc_id (q16 keepers are the
    // per-digest min — one row per doc; q63 emits one row per non-bench
    // doc), so a LEFT join cannot fan out and flag conjunction is
    // exactly the chained semi-join: all four stage counts AND the
    // survivor token mass are sums over ONE plan, one action.
    val keepers = Dedup.q16(spark, dir)
      .select(col("keeper").as("doc_id"), lit(true).as("k"))
    val clean = TextAnalysis.q63(spark, dir)
      .where(!col("contaminated"))
      .select(col("doc_id"), lit(true).as("c"))
    val row = feat
      .withColumn("q",
        sigmoid(AdcKernels.dotDD(col("x"), wlit(wv))) >= 0.5)
      .join(keepers, Seq("doc_id"), "left")
      .join(clean, Seq("doc_id"), "left")
      .select(col("q"),
        (col("q") && coalesce(col("k"), lit(false))).as("qk"),
        (col("q") && coalesce(col("k"), lit(false))
          && coalesce(col("c"), lit(false))).as("qkc"),
        col("ntok"))
      .agg(count(lit(1)).as("n0"),
        sum(when(col("q"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("qk"), 1L).otherwise(0L)).as("n2"),
        sum(when(col("qkc"), 1L).otherwise(0L)).as("n3"),
        sum(when(col("qkc"), col("ntok")).otherwise(0L)).as("toks"))
      .head()

    Seq(
      (0, "corpus", row.getLong(0)),
      (1, "model_quality", row.getLong(1)),
      (2, "exact_dedup", row.getLong(2)),
      (3, "decontaminated", row.getLong(3)),
      (4, "survivor_tokens", row.getLong(4)))
      .toDF("stage", "name", "n")
      .orderBy(col("stage"))
  }

  /** q177: the FULL curation funnel — q161 with BOTH decontamination
    * modalities in sequence, the shape a production pre-training
    * pipeline actually ships (verbatim leakage AND paraphrase leakage
    * are different failure modes; q174 measured the two gates' flag
    * sets differing in both directions):
    *
    *   corpus → model quality gate → exact dedup → n-gram decontam
    *   (q63) → SEMANTIC decontam (q174, embedding cosine vs the bench
    *   set) → surviving token mass.
    *
    * Same 100 TB shape as q161 — every stage an id-sized semi-join on
    * the previous survivor set, text never re-shuffles; the semantic
    * stage adds one fused feature-hash scan + a broadcast argmax (the
    * q174 cost, already linear). The oracle composes the component
    * gates' graded SQL verbatim (chainSql + q16Sql + q63Sql + q174Sql),
    * so the funnel passes only if the four-gate composition matches
    * end-to-end. */
  def q177(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wv = standingModel(spark, dir)
    val feat = standingFeat(spark, dir)
    // ONE flag-conjunction pass — the q161 rework (see its comment) with
    // the semantic gate as a fourth 1:1-keyed flag: seven actions become
    // one (r21, guide §2.4/§1.2).
    val keepers = Dedup.q16(spark, dir)
      .select(col("keeper").as("doc_id"), lit(true).as("k"))
    val clean = TextAnalysis.q63(spark, dir)
      .where(!col("contaminated"))
      .select(col("doc_id"), lit(true).as("c"))
    val semClean = TextAnalysis.q174(spark, dir)
      .where(!col("contaminated"))
      .select(col("doc_id"), lit(true).as("s"))
    val row = feat
      .withColumn("q",
        sigmoid(AdcKernels.dotDD(col("x"), wlit(wv))) >= 0.5)
      .join(keepers, Seq("doc_id"), "left")
      .join(clean, Seq("doc_id"), "left")
      .join(semClean, Seq("doc_id"), "left")
      .select(col("q"),
        (col("q") && coalesce(col("k"), lit(false))).as("qk"),
        (col("q") && coalesce(col("k"), lit(false))
          && coalesce(col("c"), lit(false))).as("qkc"),
        (col("q") && coalesce(col("k"), lit(false))
          && coalesce(col("c"), lit(false))
          && coalesce(col("s"), lit(false))).as("qkcs"),
        col("ntok"))
      .agg(count(lit(1)).as("n0"),
        sum(when(col("q"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("qk"), 1L).otherwise(0L)).as("n2"),
        sum(when(col("qkc"), 1L).otherwise(0L)).as("n3"),
        sum(when(col("qkcs"), 1L).otherwise(0L)).as("n4"),
        sum(when(col("qkcs"), col("ntok")).otherwise(0L)).as("toks"))
      .head()
    Seq(
      (0, "corpus", row.getLong(0)),
      (1, "model_quality", row.getLong(1)),
      (2, "exact_dedup", row.getLong(2)),
      (3, "ngram_decontam", row.getLong(3)),
      (4, "semantic_decontam", row.getLong(4)),
      (5, "survivor_tokens", row.getLong(5)))
      .toDF("stage", "name", "n")
      .orderBy(col("stage"))
  }

  // ---- q162: quality-gated retrieval -------------------------------------

  private val Q162Ns = "q162"
  private val Q162K = 10
  private val Q162Query = 1L

  /** One loaded q162 store per sf dir per JVM (the q48 steady-state
    * rationale: bulk load once, serve many). */
  private val q162Stores =
    new java.util.concurrent.ConcurrentHashMap[String, graft.store.VectorStore]()

  /** q162: quality-GATED similarity retrieval — the RAG-curation loop
    * that joins the library's two halves the way q153 joined media and
    * the store: every document loads into a live [[graft.store.VectorStore]]
    * with its q129 feature-hash count vector as the embedding AND its
    * standing-model verdict as per-row metadata (`pass`), and retrieval
    * runs `findSimilar(filter = pass=true)` — top-k similar among
    * model-approved documents only. Docs with zero [a-z0-9] tokens are
    * excluded at load (their count vector could be zero-norm; with ≥1
    * token the 2t−1 signed features have odd total mass, so some dim is
    * odd and the norm is provably nonzero). The query is doc 1's vector
    * through the SAME driver kernel `/score` uses. At 100 TB this is a
    * bulk embed+score load (two narrow scans) and a metadata-pushed
    * filtered scan per query. */
  /** (id, values, metadata) — every ≥1-token document's count vector
    * with its standing-model verdict attached; the load frame both
    * quality-retrieval mounts share. */
  private def gatedVectorFrame(spark: SparkSession, dir: String): DataFrame = {
    val wv = standingModel(spark, dir)
    val verdicts = standingFeat(spark, dir)
      .where(col("ntok") >= 1)
      .withColumn("p", sigmoid(AdcKernels.dotDD(col("x"), wlit(wv))))
      .select(col("doc_id"), (col("p") >= 0.5).cast("string").as("pass"))
    docs(spark, dir)
      .select(col("doc_id"), FeatureHashVec(col("text")).as("counts"))
      .join(verdicts, "doc_id")
      .select(col("doc_id").cast("string").as("id"),
        expr("transform(counts, c -> cast(c AS float))").as("values"),
        map(lit("pass"), col("pass")).as("metadata"))
  }

  private def q162QueryVec(spark: SparkSession, dir: String): Seq[Float] = {
    val qText = docs(spark, dir).where(col("doc_id") === Q162Query)
      .select(col("text")).head().getString(0)
    graft.functions.FeatureHash.counts(qText).map(_.toFloat).toSeq
  }

  private def emitHits(spark: SparkSession,
      hits: Seq[graft.model.SearchHit]): DataFrame = {
    import spark.implicits._
    hits.zipWithIndex
      .map { case (h, i) => (i + 1, h.id, h.score) }
      .toDF("rank", "id", "score")
      .withColumn("score", r4(col("score")))
      .orderBy(col("rank"))
  }

  def q162(spark: SparkSession, dir: String): DataFrame = {
    val store = q162Stores.computeIfAbsent(dir, d => {
      val s = new graft.store.VectorStore(spark)
      s.loadFrame(gatedVectorFrame(spark, d), Q162Ns)
      s
    })
    emitHits(spark, store.findSimilar(q162QueryVec(spark, dir), k = Q162K,
      metric = "cosine", namespace = Q162Ns, filter = Map("pass" -> "true")))
  }

  /** One durable q163 store per sf dir per JVM (the q87 pattern: load +
    * layout once, serve many). Keyed by the RESOLVED root (conf included),
    * not the data dir alone — see the root construction in [[q163]]. */
  private val q163Stores =
    new java.util.concurrent.ConcurrentHashMap[String, graft.store.DurableVectorStore]()
  private val q163Attempts = new java.util.concurrent.atomic.AtomicInteger(0)
  // per-process disambiguator for shared conf roots (the StoreOps
  // facadeToken pattern): two JVMs grading against one cluster mount must
  // not append onto each other's layout
  private lazy val q163Token: String =
    ProcessHandle.current().pid().toString + "_" +
      java.util.UUID.randomUUID().toString.take(8)

  /** q163: q162 on the DURABLE mount — the same gated load frame
    * appended to the LSM layout (metadata rides the append), the same
    * exact cosine search with the pass=true metadata filter pushed into
    * the layout scan (the durable exact path's new filter support, r15 —
    * the last live/durable read asymmetry). Graded by q162's oracle
    * text VERBATIM: that equality IS the cross-mount parity claim (the
    * q157 contract applied to stores). */
  def q163(spark: SparkSession, dir: String): DataFrame = {
    // durable layout lands on the configured mount when set (the
    // StoreOps.DurableDirConf pattern — on a cluster a driver-local
    // temp dir would not survive, let alone serve executors). The base
    // mangles in the DATA dir + a per-process token, and each build gets
    // a fresh /a<attempt> subdir (the StoreOps dfStoreFor discipline):
    // a bare conf+"/q163" root was one fixed path shared across every
    // corpus dir and every JVM run, so two dirs in one process — or a
    // corpus regeneration across runs — would load DIFFERENT gated
    // vector sets into the SAME persisted namespace and serve rows from
    // the other corpus (ADVICE r16).
    val base = spark.conf.getOption(StoreOps.DurableDirConf)
      .map(_ + "/q163_" + q163Token + "_" +
        graft.PathToken.token(dir))
      .getOrElse("tmp:" + dir) // no conf: per-dir temp root, made below
    val store = q163Stores.computeIfAbsent(base, b => {
      val root =
        if (b.startsWith("tmp:"))
          java.nio.file.Files.createTempDirectory("graft_q163_").toString
        else b + "/a" + q163Attempts.incrementAndGet()
      val s = new graft.store.DurableVectorStore(spark, root)
      s.loadFrame(gatedVectorFrame(spark, dir), Q162Ns)
      s
    })
    emitHits(spark, store.findSimilar(q162QueryVec(spark, dir), k = Q162K,
      metric = "cosine", namespace = Q162Ns, filter = Map("pass" -> "true")))
  }

  // ---- driver-side serving kernel ---------------------------------------

  /** The 72-dim feature vector of ONE text, computed on the DRIVER —
    * the [[graft.functions.FeatureHash]] pattern: the same semantics as
    * [[featureCols]] reimplemented over plain Scala so a serving
    * request scores one document without a Spark job (the REST `/score`
    * route). QualityClassifierSpec pins bit-parity against the
    * distributed frame across every corpus document. */
  private[graft] def localFeatures(text: String): Array[Double] = {
    val hashed = graft.functions.FeatureHash.counts(text)
    val ntg = math.max(graft.functions.FeatureHash.tokens(text).size, 1).toDouble
    // split(text, '\\s+') keeps trailing empties (limit -1) before the
    // != '' filter — mirror it exactly
    val words = text.split("\\s+", -1).filter(_.nonEmpty)
    val lines = text.split("\n", -1)
    val nWords = words.length
    val meanWordLen = words.map(_.length.toLong).sum.toDouble / nWords
    val alphaFrac =
      words.count(w => w.exists(c => (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')))
        .toDouble / nWords
    val symRatio =
      (text.count(_ == '#') +
        (text.length - text.replace("...", "").length) / 3).toDouble / nWords
    val bulletRe = java.util.regex.Pattern.compile("^\\s*[-*]")
    val ellipsisRe = java.util.regex.Pattern.compile("\\.\\.\\.\\s*$")
    val bulletFrac =
      lines.count(l => bulletRe.matcher(l).find()).toDouble / lines.length
    val ellipsisFrac =
      lines.count(l => ellipsisRe.matcher(l).find()).toDouble / lines.length
    val nStop = words.map(_.toLowerCase(java.util.Locale.ROOT))
      .distinct.count(TextAnalysis.StopEn.contains)
    hashed.map(_.toDouble / ntg) ++ Array(
      nWords.toDouble / 100.0, meanWordLen / 10.0, alphaFrac, symRatio,
      bulletFrac, ellipsisFrac, nStop.toDouble / 10.0, 1.0)
  }

  /** σ(x·w) for one text against a weight vector — the `/score` route's
    * whole computation (ascending-index dot, the fused-kernel order). */
  private[graft] def localScore(text: String, wv: Array[Double]): Double = {
    val x = localFeatures(text)
    var dot = 0.0
    var i = 0
    val n = math.min(x.length, wv.length)
    while (i < n) { dot += x(i) * wv(i); i += 1 }
    1.0 / (1.0 + math.exp(-dot))
  }

  // ---- oracles ---------------------------------------------------------

  /** The oracles replay the FULL quantized trajectory in SQL — R
    * generated round-CTEs over the same feature CTE (the q121
    * full-replay standard, not the persisted-artifact shortcut): any
    * arithmetic drift anywhere in training lands in the graded weights.
    * `trainWhere` picks the fit subset (q158: all; q159/q160: even
    * doc_ids); `scoreWhere` picks the rows the final pass prices. */
  private def chainSql(trainWhere: String, scoreWhere: String): String = {
    val q6s = (e: String) => s"(floor(($e) * 1000000.0 + 0.5) / 1000000.0)"
    val dot = (w: String) =>
      s"list_sum(list_transform(range($Dims), i -> f.x[i + 1] * $w.wl[i + 1]))"
    val pExpr = (w: String) =>
      s"1.0::DOUBLE / (1.0::DOUBLE + exp(-(${dot(w)})))"
    // every round CTE is MATERIALIZED: w{r-1} is referenced twice per
    // round (p$r and w$r), and DuckDB 1.0 INLINES multiply-referenced
    // CTEs — without the keyword the R-round chain is 2^R re-
    // evaluations of the whole trajectory (measured: a 12-level toy
    // chain already takes 7 s; materialized, 0.02 s)
    val rounds = (1 to Rounds).map { r =>
      s"""p$r AS MATERIALIZED (
         |  SELECT f.doc_id, f.y, ${pExpr(s"w${r - 1}")} AS p
         |  FROM trn f, w${r - 1} w${r - 1}),
         |g$r AS MATERIALIZED (
         |  SELECT rj.j AS j, ${q6s(s"sum((p.p - f.y) * f.x[rj.j + 1])")} AS g
         |  FROM p$r p JOIN trn f USING (doc_id) CROSS JOIN range($Dims) rj(j)
         |  GROUP BY rj.j),
         |w$r AS MATERIALIZED (
         |  SELECT list(${q6s(s"w.wl[g.j + 1] - $Lr * g.g / cnt.n")} ORDER BY g.j) AS wl
         |  FROM g$r g, w${r - 1} w, cnt)""".stripMargin
    }.mkString(",\n")
    s"""WITH tl AS MATERIALIZED (
       |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
       |  FROM documents),
       |u AS (
       |  SELECT doc_id, unnest(toks) AS f FROM tl
       |  UNION ALL
       |  SELECT doc_id,
       |         unnest(list_transform(range(1, len(toks)),
       |                               i -> toks[i] || '_' || toks[i + 1])) AS f
       |  FROM tl),
       |hd AS (
       |  SELECT doc_id,
       |         (('0x' || substr(md5('fh_' || f), 1, 8))::BIGINT
       |            % $HashDims)::INT AS dim,
       |         CASE WHEN ('0x' || substr(md5('fh_' || f), 9, 1))::BIGINT
       |                     % 2 = 0
       |              THEN 1 ELSE -1 END AS sgn
       |  FROM u),
       |sp AS (SELECT doc_id, dim, sum(sgn)::DOUBLE AS val FROM hd GROUP BY 1, 2),
       |hv AS (
       |  SELECT t.doc_id, list(coalesce(sp.val, 0)::DOUBLE ORDER BY r.j) AS hvec,
       |         greatest(any_value(len(t.toks)), 1)::DOUBLE AS ntg
       |  FROM tl t CROSS JOIN range($HashDims) r(j)
       |  LEFT JOIN sp ON sp.doc_id = t.doc_id AND sp.dim = r.j
       |  GROUP BY t.doc_id),
       |wd AS (
       |  SELECT doc_id,
       |         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS words,
       |         string_split(text, chr(10)) AS lines, text
       |  FROM documents),
       |m AS (
       |  SELECT doc_id,
       |         len(words)::INT AS n_words,
       |         list_sum(list_transform(words, x -> length(x)))::DOUBLE / len(words) AS mwl,
       |         len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE / len(words) AS af,
       |         ((length(text) - length(replace(text, '#', ''))) +
       |          (length(text) - length(replace(text, '...', ''))) // 3)::DOUBLE / len(words) AS sr,
       |         len(list_filter(lines, l -> regexp_matches(l, '^\\s*[-*]')))::DOUBLE / len(lines) AS bf,
       |         len(list_filter(lines, l -> regexp_matches(l, '\\.\\.\\.\\s*$$')))::DOUBLE / len(lines) AS ef,
       |         len(list_intersect(list_distinct(list_transform(words, x -> lower(x))), ${TextAnalysis.sqlList(TextAnalysis.StopEn)}))::INT AS n_stop
       |  FROM wd),
       |feat AS MATERIALIZED (
       |  SELECT m.doc_id,
       |         list_concat(
       |           list_transform(hv.hvec, v -> v / hv.ntg),
       |           [m.n_words / 100.0, m.mwl / 10.0, m.af, m.sr, m.bf, m.ef,
       |            m.n_stop / 10.0, 1.0::DOUBLE]) AS x,
       |         (m.n_words BETWEEN ${TextAnalysis.GopherMinWords} AND ${TextAnalysis.GopherMaxWords}
       |          AND m.mwl BETWEEN 3.0 AND 10.0
       |          AND m.sr <= 0.1 AND m.bf <= 0.9 AND m.ef <= 0.3
       |          AND m.af >= 0.8 AND m.n_stop >= 2)::INT AS y
       |  FROM m JOIN hv ON hv.doc_id = m.doc_id),
       |trn AS MATERIALIZED (SELECT * FROM feat WHERE $trainWhere),
       |cnt AS MATERIALIZED (SELECT count(*)::DOUBLE AS n FROM trn),
       |w0 AS MATERIALIZED (SELECT list_transform(range($Dims), j -> 0.0::DOUBLE) AS wl),
       |$rounds,
       |pf AS (
       |  SELECT f.doc_id, f.y, ${pExpr(s"w$Rounds")} AS p
       |  FROM feat f, w$Rounds w$Rounds
       |  WHERE $scoreWhere)""".stripMargin
  }

  /** weights + confusion tail (q158/q159's output shape). */
  private def cmTailSql: String =
    s""",
       |wout AS (
       |  SELECT 'w' AS sect, rj.j::INT AS i, 0::INT AS j, 0::BIGINT AS n,
       |         w.wl[rj.j + 1] AS v
       |  FROM w$Rounds w CROSS JOIN range($Dims) rj(j)),
       |cm AS (
       |  SELECT 'cm' AS sect, y::INT AS i, (p >= 0.5)::INT AS j,
       |         count(*)::BIGINT AS n, ${r4Sql("avg(p)")} AS v
       |  FROM pf GROUP BY 2, 3)
       |SELECT * FROM (SELECT * FROM wout UNION ALL SELECT * FROM cm)
       |ORDER BY sect, i, j""".stripMargin

  def q158Sql: String = chainSql("TRUE", "TRUE") + cmTailSql

  def q159Sql: String =
    chainSql("doc_id % 2 = 0", "doc_id % 2 = 1") + cmTailSql

  /** per-document score tail (q160's output shape). */
  def q160Sql: String =
    chainSql("doc_id % 2 = 0", "doc_id % 2 = 1") +
      s"""
         |SELECT doc_id, y::INT AS y, (p >= 0.5)::INT AS pred,
         |       ${r4Sql("p")} AS p
         |FROM pf ORDER BY doc_id""".stripMargin

  /** The funnel oracle composes the component gates' own graded SQL
    * verbatim: the trajectory chain (even-half model, scored
    * corpus-wide), [[Dedup.q16Sql]] for the digest keepers, and
    * [[TextAnalysis.q63Sql]] for the contamination flags. */
  def q161Sql: String =
    chainSql("doc_id % 2 = 0", "TRUE") +
      s""",
         |q AS MATERIALIZED (SELECT doc_id FROM pf WHERE p >= 0.5),
         |k AS MATERIALIZED (SELECT keeper AS doc_id FROM (${Dedup.q16Sql})),
         |s2 AS MATERIALIZED (SELECT doc_id FROM q WHERE doc_id IN (SELECT doc_id FROM k)),
         |cln AS MATERIALIZED (
         |  SELECT doc_id FROM (${TextAnalysis.q63Sql}) WHERE NOT contaminated),
         |s3 AS MATERIALIZED (
         |  SELECT doc_id FROM s2 WHERE doc_id IN (SELECT doc_id FROM cln))
         |SELECT * FROM (
         |  SELECT 0 AS stage, 'corpus' AS name, count(*)::BIGINT AS n FROM documents
         |  UNION ALL
         |  SELECT 1, 'model_quality', count(*)::BIGINT FROM q
         |  UNION ALL
         |  SELECT 2, 'exact_dedup', count(*)::BIGINT FROM s2
         |  UNION ALL
         |  SELECT 3, 'decontaminated', count(*)::BIGINT FROM s3
         |  UNION ALL
         |  SELECT 4, 'survivor_tokens',
         |         sum(len(regexp_extract_all(lower(d.text), '[a-z0-9]+')))::BIGINT
         |  FROM documents d WHERE d.doc_id IN (SELECT doc_id FROM s3))
         |ORDER BY stage""".stripMargin

  /** q177's oracle: [[q161Sql]]'s composition with the semantic gate's
    * graded SQL ([[TextAnalysis.q174Sql]]) nested verbatim as the fourth
    * stage. */
  def q177Sql: String =
    chainSql("doc_id % 2 = 0", "TRUE") +
      s""",
         |q AS MATERIALIZED (SELECT doc_id FROM pf WHERE p >= 0.5),
         |k AS MATERIALIZED (SELECT keeper AS doc_id FROM (${Dedup.q16Sql})),
         |s2 AS MATERIALIZED (SELECT doc_id FROM q WHERE doc_id IN (SELECT doc_id FROM k)),
         |cln AS MATERIALIZED (
         |  SELECT doc_id FROM (${TextAnalysis.q63Sql}) WHERE NOT contaminated),
         |s3 AS MATERIALIZED (
         |  SELECT doc_id FROM s2 WHERE doc_id IN (SELECT doc_id FROM cln)),
         |sem AS MATERIALIZED (
         |  SELECT doc_id FROM (${TextAnalysis.q174Sql}) WHERE NOT contaminated),
         |s4 AS MATERIALIZED (
         |  SELECT doc_id FROM s3 WHERE doc_id IN (SELECT doc_id FROM sem))
         |SELECT * FROM (
         |  SELECT 0 AS stage, 'corpus' AS name, count(*)::BIGINT AS n FROM documents
         |  UNION ALL
         |  SELECT 1, 'model_quality', count(*)::BIGINT FROM q
         |  UNION ALL
         |  SELECT 2, 'exact_dedup', count(*)::BIGINT FROM s2
         |  UNION ALL
         |  SELECT 3, 'ngram_decontam', count(*)::BIGINT FROM s3
         |  UNION ALL
         |  SELECT 4, 'semantic_decontam', count(*)::BIGINT FROM s4
         |  UNION ALL
         |  SELECT 5, 'survivor_tokens',
         |         sum(len(regexp_extract_all(lower(d.text), '[a-z0-9]+')))::BIGINT
         |  FROM documents d WHERE d.doc_id IN (SELECT doc_id FROM s4))
         |ORDER BY stage""".stripMargin

  /** The q162 oracle rides chainSql's own CTEs: `hv` already holds each
    * document's raw 64-dim signed-count vector (the loaded embedding —
    * integer-valued, so the store's float32 cast is lossless and both
    * engines' cosine arithmetic is exact), `tl` its token list (the
    * ntok ≥ 1 load gate), and `pf` the even-half model's score for
    * every doc. Rerank replays the store's raw-cosine ordering with its
    * string-id tie-break (the q48 discipline). */
  def q162Sql: String =
    chainSql("doc_id % 2 = 0", "TRUE") +
      s""",
         |qd AS (SELECT hvec AS qv FROM hv WHERE doc_id = $Q162Query),
         |keep AS (
         |  SELECT p.doc_id FROM pf p JOIN tl t USING (doc_id)
         |  WHERE p.p >= 0.5 AND len(t.toks) >= 1),
         |base AS (
         |  SELECT h.doc_id::VARCHAR AS id, h.hvec AS v
         |  FROM hv h JOIN keep USING (doc_id)),
         |sc AS (
         |  SELECT b.id, ${graft.functions.Det.cosSql("b.v", "q.qv")} AS raw
         |  FROM base b, qd q),
         |r AS (
         |  SELECT id, raw, row_number() OVER (ORDER BY raw DESC, id) AS rank
         |  FROM sc)
         |SELECT rank::INT AS rank, id, ${r4Sql("raw")} AS score
         |FROM r WHERE rank <= $Q162K ORDER BY rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q158_quality_classifier" -> (q158 _),
    "q159_quality_holdout" -> (q159 _),
    "q160_stream_quality_score" -> (q160 _),
    "q161_curation_funnel" -> (q161 _),
    "q177_full_curation_funnel" -> (q177 _),
    "q162_quality_gated_retrieval" -> (q162 _),
    "q163_durable_quality_retrieval" -> (q163 _))

  val oracles: Map[String, String] = Map(
    "q158_quality_classifier" -> q158Sql,
    "q159_quality_holdout" -> q159Sql,
    "q160_stream_quality_score" -> q160Sql,
    "q161_curation_funnel" -> q161Sql,
    "q177_full_curation_funnel" -> q177Sql,
    "q162_quality_gated_retrieval" -> q162Sql,
    // graded by the LIVE mount's oracle text verbatim — the equality IS
    // the live/durable parity claim (the q157 contract)
    "q163_durable_quality_retrieval" -> q162Sql)
}
