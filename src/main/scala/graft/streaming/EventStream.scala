package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.functions.Det.r4

/** Structured Streaming over the `events` table (SURVEY §7 step 7): the
  * streaming twin of EventOps.q29 — identical grouping, so draining the
  * stream over the same files must reproduce the batch answer exactly
  * (batch/stream parity is asserted by StreamingSpec).
  *
  * Scale shape: a 1-hour tumbling window with a 1-hour watermark keeps
  * state bounded to ~one window per key; at 100 TB the same plan runs
  * against a Kafka/files source with checkpointing — only the source and
  * sink lines change.
  */
object EventStream {

  /** Raw parquet schema of `events` (ts read as nanosecond longs — Spark 4
    * rejects TIMESTAMP(NANOS) otherwise; see Tables.events). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming source over the events parquet with the same µs-timestamp
    * normalization as the batch loader. */
  def source(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(rawSchema)
      // the streaming file source wants a directory; glob down to the
      // events table inside the sf dir
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Tumbling 1-hour windowed counts + value sums per event type. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), r4(sum(col("value"))).as("sum_value"))
      .select(unix_micros(col("window.start")).as("bucket_us"),
        col("event_type"), col("n"), col("sum_value"))

  /** Start the job into an in-memory sink (complete mode: every window is
    * visible once the finite input drains — the local test harness shape;
    * a production sink would use append + checkpointing). */
  def startToMemory(spark: SparkSession, dir: String,
                    queryName: String): StreamingQuery =
    hourlyAgg(source(spark, dir))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
}
