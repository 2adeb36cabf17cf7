package graft.examples

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Stage-level timing for the MinHash+LSH dedup pipeline (q18) — the
  * measurement behind its bench adjudication. Prints per-stage seconds so
  * "q18 is slow" decomposes into WHICH stage (postings materialization,
  * minhash aggregation + banding, bucket join, exact verify). Run:
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt 'runMain graft.examples.DedupBench'`
  */
object DedupBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "graft-dedup-bench")
    import graft.functions.TextFunctions._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[dedupbench] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    // one full warm pass so codegen/file-listing costs don't land on stage 1
    graft.operators.Dedup.queries("q18_dedup_minhash_lsh")(spark, dir)
      .write.format("noop").mode("overwrite").save()

    (1 to 2).foreach { round =>
      println(s"[dedupbench] --- round $round ---")
      val sh0 = time("postings scan + checkpoint") {
        spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"),
            explode(graft.functions.TokenShingleHashes(col("text"), 3)).as("h"))
          .localCheckpoint(eager = true)
      }
      val sh = sh0.withColumn("h32", pmod(col("h"), lit(4294967296L)))
      def band(sig: org.apache.spark.sql.DataFrame) = {
        val bandCols = (0 until 32).map { bd =>
          struct(lit(bd).as("band"),
            md5(concat_ws("_", (0 until 2).map(r =>
              element_at(col("ms"), bd * 2 + r + 1)): _*)).as("sig"))
        }
        sig.select(col("doc_id"), explode(array(bandCols: _*)).as("b"))
          .select(col("doc_id"), col("b.band").as("band"), col("b.sig").as("sig"))
          .localCheckpoint(eager = true)
      }
      // A: the aggregate shape (explode -> groupBy ObjectHashAggregate)
      time("sig A: MinhashAgg (agg) + banding") {
        band(sh.groupBy(col("doc_id"))
          .agg(graft.functions.MinhashAgg
            .minhash(col("h32"), minhashParams(64), MinhashP).as("ms"))
          .where(col("ms").isNotNull))
      }
      // B: the narrow shape (per-row codegen over the hash array)
      val banded = time("sig B: MinhashArray (narrow) + banding") {
        band(spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"),
            graft.functions.MinhashArray(
              graft.functions.TokenShingleHashes(col("text"), 3),
              minhashParams(64), MinhashP).as("ms"))
          .where(size(col("ms")) > 0))
      }
      val cand = time("bucket join + distinct (materialize)") {
        val x = banded.select(col("doc_id").as("id_a"), col("band"), col("sig"))
        val y = banded.select(col("doc_id").as("id_b"), col("band"), col("sig"))
        x.join(y, Seq("band", "sig"))
          .where(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"))
          .distinct()
          .localCheckpoint(eager = true)
      }
      println(s"[dedupbench] candidates: ${cand.count()}")
      time("exact verify tail -> noop") {
        val sizes = sh0.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        val a = sh0.select(col("doc_id").as("id_a"), col("h"))
        val b = sh0.select(col("doc_id").as("id_b"), col("h"))
        cand.join(a, Seq("id_a"))
          .join(b, Seq("id_b", "h"))
          .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("c"))
          .join(sizes.select(col("doc_id").as("id_a"), col("n").as("na")), Seq("id_a"))
          .join(sizes.select(col("doc_id").as("id_b"), col("n").as("nb")), Seq("id_b"))
          .withColumn("jaccard", graft.functions.Det.r4(
            col("c").cast("double") / (col("na") + col("nb") - col("c"))))
          .where(col("jaccard") >= 0.5)
          .select(col("id_a"), col("id_b"), col("jaccard"))
          .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
          .write.format("noop").mode("overwrite").save()
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
