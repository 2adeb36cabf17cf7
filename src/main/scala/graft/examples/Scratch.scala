package graft.examples

import org.apache.spark.sql.SparkSession

/** Throwaway profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.requiredConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    spark.range(1000).selectExpr("sum(id)").collect()

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    // warm
    graft.sources.Tables.table(spark, dir, "embeddings").count()

    time("q15 noop x1") {
      graft.operators.VectorSearch.q15(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    time("q15 noop x2") {
      graft.operators.VectorSearch.q15(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    time("q15 count") {
      graft.operators.VectorSearch.q15(spark, dir).count()
    }
    val v = graft.sources.Tables.vectors(spark, dir)
    time("count only") { v.count() }
    time("pairs only (no sort)") {
      import org.apache.spark.sql.functions._
      val a = v.select(col("id").as("id_a"), col("values").as("va"))
      val bdf = v.select(col("id").as("id_b"), col("values").as("vb"))
      a.join(broadcast(bdf), col("id_a") < col("id_b"))
        .withColumn("score", round(graft.functions.VectorFunctions.cosineSim(col("va"), col("vb")), 4))
        .where(col("score") >= 0.35)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
