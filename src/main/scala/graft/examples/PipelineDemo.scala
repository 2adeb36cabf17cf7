package graft.examples


import graft.multimodal.Multimodal
import graft.streaming.EventStream

/** Drives the streaming and multimodal paths end-to-end on sf0.001.
  * Run: `sbt 'runMain graft.examples.PipelineDemo'`. */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.GraftSession.local(4, "graft-pipeline-demo")

    val q = EventStream.startToMemory(spark, dir, "demo_hourly")
    q.processAllAvailable()
    val windows = spark.table("demo_hourly").orderBy("bucket_us", "event_type")
    println(s"[pipeline] streaming drained: ${windows.count()} hourly windows; first 3:")
    windows.limit(3).collect().foreach(r => println(s"[pipeline]   $r"))
    println(s"[pipeline] stream progress: batches=${q.recentProgress.length}, " +
      s"rows=${q.recentProgress.map(_.numInputRows).sum}")
    q.stop()

    // skew + durable-store maintenance
    import org.apache.spark.sql.functions.col
    val hot = graft.operators.Skew
      .saltedSumCount(graft.sources.Tables.table(spark, dir, "lineitem"),
        col("l_returnflag"), col("l_quantity"), salts = 8)
      .orderBy(col("key")).collect()
      .map(r => s"${r.getString(0)}=${r.getAs[Long]("count")}").mkString(", ")
    println(s"[pipeline] salted per-flag counts: $hot")
    val tmp = java.nio.file.Files.createTempDirectory("graft_pd").toString
    graft.sources.VectorParquet.write(graft.sources.Tables.vectors(spark, dir), tmp)
    val tomb = graft.sources.VectorParquet.read(spark, tmp)
      .where(col("id") % 3 === 0).select("id")
    val left = graft.sources.VectorParquet.compact(spark, tmp, tomb)
    println(s"[pipeline] compaction left $left rows after deleting id%3==0")

    val media = Multimodal.syntheticMedia(spark, dir)
    val feats = Multimodal.extractFeatures(media)
    println(s"[pipeline] media records: ${media.count()}, features: ${feats.count()}")
    Multimodal.featureSummary(spark, dir).collect()
      .foreach(r => println(s"[pipeline]   kind=$r"))
    spark.stop()
  }
}
