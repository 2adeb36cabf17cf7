package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.Tables

/** r21 lab for q17's pair-generation shape: the shipped form self-joins
  * the shingle postings on `h` (Spark elects a broadcast of the whole
  * 850k-row postings side at sf0.1), the candidate replaces the join
  * with per-shingle doc-list aggregation + in-partition pair explosion
  * (guide §2.3 "aggregate before you shuffle" — the pair multiset is
  * identical because posting lists are per-doc-distinct). Results are
  * asserted equal before timing.
  */
object JaccardVariantsBench {

  private val JaccT = 0.5
  private val ShingleN = 3

  private def postings(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "documents").select(
      col("doc_id"),
      explode(graft.functions.TokenShingleHashes(col("text"), ShingleN)).as("h"))
      .persist()

  /** shipped q17 core (jaccardFrom with candidates=None) */
  private def vJoin(sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val a = sh.select(col("doc_id").as("id_a"), col("h"))
    val b = sh.select(col("doc_id").as("id_b"), col("h"))
    val common = a.join(b, Seq("h")).where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("c"))
    score(common, sizes)
  }

  /** aggregate-first: per-h sorted doc list, explode i<j pairs in place */
  private def vAggPairs(sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val common = sh.groupBy(col("h"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .where(size(col("ds")) >= 2)
      .select(explode(expr(
        "flatten(transform(ds, (x, i) -> transform(slice(ds, i + 2, size(ds) - i - 1), y -> struct(x AS id_a, y AS id_b))))"))
        .as("p"))
      .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .agg(count(lit(1)).as("c"))
    score(common, sizes)
  }

  private def score(common: DataFrame, sizes: DataFrame): DataFrame =
    common
      .join(sizes.select(col("doc_id").as("id_a"), col("n").as("na")), Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"), col("n").as("nb")), Seq("id_b"))
      .withColumn("jaccard",
        graft.functions.Det.r4(
          col("c").cast("double") / (col("na") + col("nb") - col("c"))))
      .where(col("jaccard") >= JaccT)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val samples = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-jaccard-lab")
    spark.range(1000).selectExpr("sum(id)").collect()
    val sh = postings(spark, sfDir)
    sh.count()
    val variants = Seq("join" -> (vJoin _), "agg_pairs" -> (vAggPairs _))
    var golden: Seq[String] = null
    variants.foreach { case (name, fn) =>
      val rows = fn(sh).collect().map(_.toString).toSeq
      if (golden == null) golden = rows
      require(rows == golden, s"$name diverged")
      val times = (1 to samples).map { _ =>
        val t0 = System.nanoTime()
        fn(sh).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"JACLAB $name%-10s median=${times.sorted.apply(times.size / 2)}%.3fs samples=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
