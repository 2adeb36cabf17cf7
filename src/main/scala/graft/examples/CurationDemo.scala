package graft.examples

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

/** The end-to-end training-data curation chain, composed from the graded
  * operator surfaces — the way a user of the library would wire a
  * pre-training corpus pipeline:
  *
  *   quality gate (q21) → exact dedup (q16) → span dedup (q113)
  *     → decontamination (q63) → DSIR target selection (q115)
  *     → packing estimate (the q108 budget)
  *
  * Each stage is a doc_id semi-join on the previous survivor set, so the
  * whole chain stays one declarative plan per stage — at scale the
  * stage outputs are doc_id+flag frames (corpus-row-sized but two
  * columns), and the final survivor set is the id list a packing job
  * consumes. Prints a per-stage funnel.
  *
  * Run: `sbt 'runMain graft.examples.CurationDemo [sfDir]'`.
  */
object CurationDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.GraftSession.local(8, "graft-curation-demo")
    def stage(name: String, n: Long, prev: Long): Long = {
      val pct = if (prev > 0) 100.0 * n / prev else 100.0
      println(f"[curate] $name%-22s $n%6d docs ($pct%5.1f%% of previous)")
      n
    }

    val all = graft.sources.Tables.table(spark, dir, "documents")
      .select(col("doc_id"))
    val n0 = stage("corpus", all.count(), 0)

    // 1. quality gate: q21's composite score at its training floor
    val quality = TextAnalysis.q21(spark, dir)
      .where(col("quality") >= 0.6).select(col("doc_id"))
    val n1 = stage("quality >= 0.6", quality.count(), n0)

    // 2. exact dedup: q16 keeps one doc per canonical-text digest
    val keepers = Dedup.q16(spark, dir)
      .select(col("keeper").as("doc_id"))
    val afterExact = quality.join(keepers, Seq("doc_id"), "left_semi")
    val n2 = stage("exact-dedup keeper", afterExact.count(), n1)

    // 3. span dedup: drop docs that are mostly duplicated substance
    val spanOk = Dedup.q113(spark, dir)
      .where(col("dup_frac") < 0.8).select(col("doc_id"))
    val afterSpan = afterExact.join(spanOk, Seq("doc_id"), "left_semi")
    val n3 = stage("span dup_frac < 0.8", afterSpan.count(), n2)

    // 4. decontamination: q63 flags benchmark n-gram overlap. Docs below
    //    its split PLAY the benchmark, so they leave the training set
    //    here too (they are the eval data) — survivors are the
    //    above-split, no-overlap docs.
    val clean = TextAnalysis.q63(spark, dir)
      .where(!col("contaminated")).select(col("doc_id"))
    val afterDecon = afterSpan.join(clean, Seq("doc_id"), "left_semi")
    val n4 = stage("decontaminated", afterDecon.count(), n3)

    // 5. DSIR: keep the target-domain-like mass
    val dsir = TextAnalysis.q115(spark, dir)
      .where(col("keep")).select(col("doc_id"))
    val survivors = afterDecon.join(dsir, Seq("doc_id"), "left_semi")
    val n5 = stage("DSIR target-like", survivors.count(), n4)

    // 6. packing estimate: the q108 budget over the survivor token mass
    val toks = graft.sources.Tables.table(spark, dir, "documents")
      .join(survivors, Seq("doc_id"), "left_semi")
      .select(size(expr(
        "regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("n_tok"))
      .agg(sum(col("n_tok"))).head().getLong(0)
    println(s"[curate] survivor tokens: $toks -> ~${toks / 512} packed 512-token sequences")
    spark.stop()
  }
}
