package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{QualityClassifier, TextAnalysis}

/** q158's product claims, beyond the hash-graded trajectory:
  *  - the LABEL is q59's gate, not a lookalike (distillation fidelity
  *    starts with the teacher being the real teacher);
  *  - the learned scorer actually beats the majority-class baseline
  *    (a weight vector can hash-match and still have learned nothing
  *    if the floor were mis-set);
  *  - the trajectory is bit-deterministic across invocations (the q6
  *    quantization grid's whole purpose);
  *  - the per-round gradient plan stays in the q121 powerRound shape:
  *    no Generate (explode) anywhere, so the (doc, dim) blow-up that
  *    would dominate at 100 TB never materializes.
  */
class QualityClassifierSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q158 labels are exactly q59's gate outcome, features are 72-dim with bias") {
    val feat = QualityClassifier.featureFrame(spark, dir)
      .select(col("doc_id"), col("x"), col("y"))
    val gate = TextAnalysis.q59(spark, dir)
      .select(col("doc_id"), col("pass").cast("int").as("y59"))
    val joined = feat.join(gate, "doc_id")
    assert(joined.where(col("y") =!= col("y59")).count() === 0,
      "q158 label diverges from the q59 gate it claims to distill")
    val shapes = joined
      .agg(
        countDistinct(size(col("x"))).as("n_shapes"),
        max(size(col("x"))).as("dims"),
        min(element_at(col("x"), QualityClassifier.Dims)).as("bias_min"),
        max(element_at(col("x"), QualityClassifier.Dims)).as("bias_max"))
      .head()
    assert(shapes.getLong(0) === 1L && shapes.getInt(1) === QualityClassifier.Dims)
    assert(shapes.getDouble(2) === 1.0 && shapes.getDouble(3) === 1.0)
    // both classes must exist or the fit is vacuous
    val classes = joined.select(col("y")).distinct().count()
    assert(classes === 2, s"gate produced $classes classes at sf0.001")
  }

  test("q158 beats the majority baseline with both correct cells populated") {
    val out = QualityClassifier.q158(spark, dir).collect()
    val w = out.filter(_.getString(0) == "w")
    val cm = out.filter(_.getString(0) == "cm")
    assert(w.length === QualityClassifier.Dims)
    assert(w.exists(_.getDouble(4) != 0.0), "all-zero weights: no learning happened")
    // sf0.001's 500 docs leave the false-negative cell empty (all
    // errors are one-sided at this size); sf0.01/0.1 populate all four
    assert(cm.length >= 3, s"confusion cells: ${cm.length} (expected >= 3)")
    assert(cm.exists(r => r.getInt(1) == 0 && r.getInt(2) == 0)
      && cm.exists(r => r.getInt(1) == 1 && r.getInt(2) == 1),
      "a correct-prediction cell is empty: the scorer collapsed to one class")
    val n = cm.map(_.getLong(3)).sum.toDouble
    val correct = cm.filter(r => r.getInt(1) == r.getInt(2)).map(_.getLong(3)).sum
    val majority = cm.groupBy(_.getInt(1)).map(_._2.map(_.getLong(3)).sum).max / n
    val acc = correct / n
    info(f"acc=$acc%.3f majority=$majority%.3f")
    assert(acc > majority,
      f"learned scorer ($acc%.3f) does not beat majority baseline ($majority%.3f)")
  }

  test("q158 trajectory is bit-deterministic across invocations") {
    def weights() = QualityClassifier.q158(spark, dir).collect()
      .filter(_.getString(0) == "w").map(r => (r.getInt(1), r.getDouble(4))).toSeq
    assert(weights() === weights())
  }

  test("q159 held-out confusion beats the held-out majority baseline") {
    val cm = QualityClassifier.q159(spark, dir).collect()
      .filter(_.getString(0) == "cm")
    val n = cm.map(_.getLong(3)).sum.toDouble
    val correct = cm.filter(r => r.getInt(1) == r.getInt(2)).map(_.getLong(3)).sum
    val majority = cm.groupBy(_.getInt(1)).map(_._2.map(_.getLong(3)).sum).max / n
    val acc = correct / n
    info(f"held-out acc=$acc%.3f majority=$majority%.3f over ${n.toLong} docs")
    assert(acc > majority,
      f"even-half model ($acc%.3f) does not beat the odd-half majority ($majority%.3f)")
  }

  test("q160 streamed scores equal the batch scoring of the same model (stream/batch parity)") {
    val streamed = QualityClassifier.q160(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3))).toSeq
    val wv = QualityClassifier.standingModel(spark, dir)
    val batch = QualityClassifier.featureFrame(spark, dir)
      .where(pmod(col("doc_id"), lit(2)) === 1)
      .withColumn("p", lit(1.0) / (lit(1.0) +
        exp(-graft.functions.AdcKernels.dotDD(col("x"),
          array(wv.map(lit).toIndexedSeq: _*)))))
      .select(col("doc_id"), col("y"),
        (col("p") >= 0.5).cast("int").as("pred"),
        graft.functions.Det.r4(col("p")).as("p"))
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3))).toSeq
    assert(streamed.nonEmpty && streamed === batch)
  }

  test("q161 funnel stages are monotone and every gate actually gates") {
    val rows = QualityClassifier.q161(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(rows.map(_._2).toSeq ===
      Seq("corpus", "model_quality", "exact_dedup", "decontaminated", "survivor_tokens"))
    val counts = rows.take(4).map(_._3)
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"funnel counts not monotone: ${counts.mkString(" -> ")}")
    assert(counts(1) < counts(0), "the model quality gate passed everything")
    assert(counts(3) > 0, "nothing survived the funnel")
    assert(rows(4)._3 > 0, "survivors carry no tokens")
  }

  test("q177 full funnel: monotone stages, the semantic gate removes docs the n-gram gate kept") {
    val rows = QualityClassifier.q177(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    assert(rows.map(_._2).toSeq == Seq("corpus", "model_quality",
      "exact_dedup", "ngram_decontam", "semantic_decontam",
      "survivor_tokens"))
    val n = rows.map(_._3)
    // doc-count stages shrink monotonically
    (0 until 4).foreach(i => assert(n(i) >= n(i + 1),
      s"stage ${i + 1} grew: ${n(i)} -> ${n(i + 1)}"))
    // the semantic gate earns its place IN the funnel: it removes docs
    // every earlier gate (incl. the n-gram decontam) kept
    assert(n(4) < n(3),
      "semantic decontam removed nothing the n-gram gate kept at this sf")
    assert(n(5) > 0, "survivors carry no tokens")
  }

  test("driver-side feature kernel is bit-identical to the distributed frame") {
    val docs = graft.sources.Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val dist = QualityClassifier.featureFrame(spark, dir)
      .select(col("doc_id"), col("x")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    assert(dist.nonEmpty)
    dist.foreach { case (id, x) =>
      val local = QualityClassifier.localFeatures(docs(id))
      assert(java.util.Arrays.equals(local, x),
        s"doc $id: driver kernel diverges from the distributed features at dims " +
          x.indices.filter(j => local(j) != x(j)).take(3).mkString(","))
    }
  }

  test("q162 gate actually gates: every hit is model-approved, and the filter changes the set") {
    val hits = QualityClassifier.q162(spark, dir).collect()
      .map(_.getString(1)).toSeq
    assert(hits.size === 10)
    val wv = QualityClassifier.standingModel(spark, dir)
    val verdicts = graft.sources.Tables.table(spark, dir, "documents")
      .select(col("doc_id").cast("string").as("id"), col("text")).collect()
      .map(r => r.getString(0) ->
        (QualityClassifier.localScore(r.getString(1), wv) >= 0.5)).toMap
    hits.foreach(id => assert(verdicts(id), s"hit $id failed the quality gate"))
    // the corpus has rejected docs, so an ungated search over the same
    // vectors COULD differ; at minimum the gate must be live in the store
    assert(verdicts.values.exists(v => !v), "no rejected docs at this sf: gate untestable")
  }

  test("logistic_grad codegen path is bit-identical to the composed HOF form") {
    // a plain projection exercises doGenCode (the training loop runs the
    // expression under the imperative vec_sum aggregate, i.e. the
    // INTERPRETED eval — this pins the other path before any future
    // caller relies on it)
    val spark2 = spark
    import spark2.implicits._
    val w = Array(0.25, -1.5, 3.0, 0.0625)
    val rows = Seq(
      (Array(1.0, 2.0, -0.5, 4.0), 1),
      (Array(0.0, 0.0, 0.0, 0.0), 0),
      (Array(-3.25, 0.125, 7.0, -2.0), 0))
    val df = rows.toDF("x", "y")
    val wl = array(w.map(lit).toIndexedSeq: _*)
    val fused = df.select(
      graft.functions.LogisticGrad.grad(col("x"), wl, col("y")).as("g"))
      .collect().map(_.getSeq[Double](0).toArray)
    val composed = df.select(expr(
      s"transform(x, v -> (1.0D / (1.0D + exp(-aggregate(zip_with(x, array(${w.mkString(",")}), (a, b) -> a * b), 0.0D, (acc, t) -> acc + t))) - cast(y as double)) * v)").as("g"))
      .collect().map(_.getSeq[Double](0).toArray)
    fused.zip(composed).foreach { case (f, c) =>
      assert(java.util.Arrays.equals(f, c), s"${f.toSeq} != ${c.toSeq}")
    }
    // and vec_sum against the per-column sums it replaced
    val viaAgg = df.select(graft.functions.VecSumAgg.vecSum(col("x"), 4))
      .head().getSeq[Double](0).toArray
    val viaCols = df.select((0 until 4).map(j => sum(col("x").getItem(j))): _*)
      .head()
    assert((0 until 4).forall(j => viaAgg(j) == viaCols.getDouble(j)))
  }

  test("q158 gradient plan has no Generate: the (doc, dim) explode never materializes") {
    val feat = QualityClassifier.featureFrame(spark, dir)
    val grad = feat
      .withColumn("p", lit(0.5))
      .select((0 until QualityClassifier.Dims).map(j =>
        sum((col("p") - col("y")) * col("x").getItem(j)).as(s"g$j")): _*)
    val plan = grad.queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"),
      "gradient aggregate plan contains an explode — the powerRound shape is lost")
  }
}
