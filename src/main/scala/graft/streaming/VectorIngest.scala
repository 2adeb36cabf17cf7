package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.store.DurableVectorStore

/** Structured-Streaming ingestion into the durable store — the 100 TB
  * write path as a STREAM: `readStream` file source → `foreachBatch` →
  * [[DurableVectorStore.loadFrame]]. The reference's only write surface
  * is a synchronous REST insert (`rest_api.py:96-161`); at scale the
  * same contract is "whatever lands in the drop directory becomes
  * searchable", which is exactly a file-source stream feeding the
  * LSM facade:
  *
  *  - each micro-batch is ONE durable commit (loadFrame's data append +
  *    overlap-sized shadow tombstones), so upsert semantics hold per
  *    batch and replaying an id in a later batch shadows the earlier
  *    row — at-least-once delivery from the source converges to the
  *    same live set;
  *  - the checkpoint dir carries source progress: a crashed ingester
  *    resumes at the unprocessed files, and a batch that died between
  *    loadFrame's two appends leaves a transient duplicate the re-run
  *    resolves (the store's documented crash contract);
  *  - rate control is the file source's (`maxFilesPerTrigger`);
  *    `Trigger.AvailableNow` drains a finite backlog in bounded batches
  *    and exits — the batch-refill deployment shape. A live deployment
  *    drops the trigger and lets the stream run.
  *
  * The store's commit-marker seq allocation makes a streaming ingester
  * safe to run NEXT TO other writers (a bulk backfill, a second drop
  * directory): batches interleave as ordinary commits.
  */
object VectorIngest {

  /** Raw parquet schema of the `embeddings` table (readStream requires
    * an explicit schema — streaming sources never infer). */
  val EmbeddingsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** Drain `sourceDir`'s files matching `pathGlobFilter` into `store`:
    * `toRecords` maps the raw source frame to loadFrame's (id, values)
    * contract, each micro-batch commits through the facade, and the
    * call blocks until the backlog is drained (AvailableNow). Returns
    * the number of non-empty micro-batches committed. */
  def ingest(spark: SparkSession, sourceDir: String, schema: StructType,
             pathGlobFilter: String, toRecords: DataFrame => DataFrame,
             store: DurableVectorStore, namespace: String,
             checkpointDir: String,
             maxFilesPerTrigger: Option[Int] = None): Long = {
    val committed = new java.util.concurrent.atomic.AtomicLong(0L)
    var reader = spark.readStream.schema(schema)
      .option("pathGlobFilter", pathGlobFilter)
    maxFilesPerTrigger.foreach(n =>
      reader = reader.option("maxFilesPerTrigger", n.toString))
    val query = toRecords(reader.parquet(sourceDir))
      .writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty) {
          store.loadFrame(batch.toDF(), namespace)
          committed.incrementAndGet()
          ()
        }
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .start()
    query.awaitTermination()
    committed.get()
  }
}
