package graft.examples

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens
import graft.sources.Tables

/** Stage-level adjudication of the two reproducible r5 slowdowns
  * (VERDICT r5 "what's wrong" #1): q35_bigram_freq 0.78→2.66 s and
  * q24_pricing_summary 0.65→1.25 s on unchanged code. Decomposes each
  * query into cumulative slices so the cost lands on a specific stage,
  * and A/Bs candidate plan changes. Warm + median-of-3 per slice (same
  * discipline as Bench). Run:
  * `sbt 'runMain graft.examples.HotspotBench [sfDir]'`. */
object HotspotBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32, "graft-hotspot-bench")
    spark.range(1000).selectExpr("sum(id)").collect()

    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      val m = Seq.fill(3)(once()).sorted.apply(1)
      println(f"[hotspot] $label%-28s $m%8.3f s")
      m
    }

    val docs = Tables.table(spark, dir, "documents")

    println(s"[hotspot] --- q35 decomposition ($dir) ---")
    time("q35_scan_only")(docs.select(col("text")))
    time("q35_tokenize")(docs.select(tokens(col("text")).as("toks")))
    val bigramsExpr = expr(
      "transform(sequence(0, size(toks) - 2), " +
        "i -> concat(element_at(toks, i + 1), ' ', element_at(toks, i + 2)))")
    time("q35_bigram_arrays")(
      docs.withColumn("toks", tokens(col("text")))
        .where(size(col("toks")) >= 2)
        .select(bigramsExpr.as("bi")))
    time("q35_explode")(
      docs.withColumn("toks", tokens(col("text")))
        .where(size(col("toks")) >= 2)
        .select(explode(bigramsExpr).as("bigram")))
    time("q35_full")(graft.operators.Analytics.q35(spark, dir))
    // A/B: zip_with over two slices instead of transform+element_at
    val zipBigrams = expr(
      "zip_with(slice(toks, 1, size(toks) - 1), slice(toks, 2, size(toks) - 1), " +
        "(a, b) -> concat(a, ' ', b))")
    time("q35_zipwith_variant")(
      docs.withColumn("toks", tokens(col("text")))
        .where(size(col("toks")) >= 2)
        .select(explode(zipBigrams).as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram")).limit(20))

    println(s"[hotspot] --- q24 decomposition ($dir) ---")
    val li = Tables.table(spark, dir, "lineitem")
    val cutoff = lit("1998-09-02").cast("timestamp")
    time("q24_scan_filter")(
      li.where(col("l_shipdate") <= cutoff)
        .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount")))
    time("q24_agg_no_round")(
      li.where(col("l_shipdate") <= cutoff)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          avg(col("l_quantity")).as("avg_qty"),
          avg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order")))
    time("q24_full")(graft.operators.Relational.q24(spark, dir))
    def q24Agg = {
      import graft.functions.Det.r4
      li.where(col("l_shipdate") <= cutoff)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(r4(sum(col("l_quantity"))).as("sum_qty"),
          r4(sum(col("l_extendedprice"))).as("sum_base_price"),
          r4(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc_price"),
          r4(avg(col("l_quantity"))).as("avg_qty"),
          r4(avg(col("l_discount"))).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }
    time("q24_r4_no_order")(q24Agg)
    time("q24_out_ordered")(
      graft.operators.Out.ordered(q24Agg)(col("l_returnflag"), col("l_linestatus")))

    spark.stop()
  }
}
