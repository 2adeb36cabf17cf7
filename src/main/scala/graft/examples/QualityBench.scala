package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sources the trained-quality-scorer (q158) 100 TB-shape claims with
  * measured points beyond sf0.1's 5k docs (the SpanDedupBench
  * discipline: generate a synthetic corpus distributedly, then run the
  * GRADED operator verbatim at doubling scales).
  *
  * The synthetic gate is learnable by construction — a hash of doc_id
  * (NOT its parity: the q159/q160 train split is even/odd, and a
  * parity-encoded class would hand the standing model a single-class
  * training set) picks between ~50-word documents with English
  * stopwords (pass every q59 band) and 15-word stopword-free gibberish
  * (fail the word-count and stopword floors) — so the fit's accuracy
  * `require` holds and the measured trajectory is a REAL convergent
  * fit, not a degenerate one.
  *
  * What linear-ish wall growth demonstrates: the feature build is one
  * narrow scan (volume ∝ token mass), each GD round is a map-side
  * partial aggregate whose driver traffic is 72 doubles regardless of
  * corpus size, and the scoring pass is one fused-kernel scan — no
  * stage is corpus-global. A super-linear bend would indicate a hidden
  * one; the 100 TB claim is the absence of that bend. The per-scale
  * `StandingCache.invalidate` is the library's own eviction surface
  * doing its job between corpus epochs.
  * Run: `sbt 'runMain graft.examples.QualityBench'`.
  */
object QualityBench {

  private val Scales: Seq[Long] =
    sys.env.get("SPARK_GRAFT_QUALITY_SCALES")
      .map(_.split(",").map(_.trim.toLong).toSeq)
      .getOrElse(Seq(125000L, 500000L))

  private def genCorpus(spark: SparkSession, n: Long, dir: String): Unit =
    spark.range(n).select(
      col("id").as("doc_id"),
      expr(
        """CASE WHEN pmod(hash(id, 7777), 2) = 0
          |THEN concat_ws(' ',
          |  transform(sequence(0, 49), j ->
          |    CASE WHEN j % 7 = 0 THEN element_at(
          |           array('the', 'a', 'of', 'and', 'to', 'in', 'is'),
          |           cast(pmod(hash(id, j), 7) AS INT) + 1)
          |         ELSE 'word' || pmod(hash(id, j), 4096) END))
          |ELSE concat_ws(' ',
          |  transform(sequence(0, 14), j -> 'zq' || pmod(hash(id, j), 4096)))
          |END""".stripMargin).as("text"),
      lit("en").as("lang"),
      lit("synth").as("source"),
      lit(0L).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "graft-quality-scale")
    spark.range(10).count()
    println(s"[quality-scale] scales=${Scales.mkString(",")} rounds=" +
      s"${graft.operators.QualityClassifier.Rounds}")
    Scales.foreach { n =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_quality_scale_${n}_").toString
      genCorpus(spark, n, dir)
      // full graded fit (feature pin build + R rounds + confusion)
      val t0 = System.nanoTime()
      val out = graft.operators.QualityClassifier.q158(spark, dir)
      val cm = out.where(col("sect") === "cm").collect()
      val fitSec = (System.nanoTime() - t0) / 1e9
      val total = cm.map(_.getLong(3)).sum.toDouble
      val acc = cm.filter(r => r.getInt(1) == r.getInt(2))
        .map(_.getLong(3)).sum / total
      // the apply path: one fused scoring pass over the standing pin —
      // the pass a 100 TB pipeline runs per corpus batch
      val wv = graft.operators.QualityClassifier.standingModel(spark, dir)
      val t1 = System.nanoTime()
      val kept = graft.operators.QualityClassifier.q161(spark, dir)
        .where(col("name") === "model_quality").head().getLong(2)
      val funnelSec = (System.nanoTime() - t1) / 1e9
      println(f"[quality-scale] n=$n%8d docs  q158=$fitSec%7.2f s " +
        f"(${fitSec / n * 1e6}%6.2f us/doc)  acc=$acc%.3f  " +
        f"funnel=$funnelSec%7.2f s  kept=$kept%8d  wdims=${wv.length}")
      graft.operators.StandingCache.invalidate(dir)
    }
    spark.stop()
  }
}
