package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durable form of the vector store (SURVEY §1.4, S6): parquet partitioned
  * by `namespace`. At rest, each namespace is its own directory — so the
  * reference's per-namespace dict lookup
  * (`storage_engine_in_memory.py:40`) becomes partition PRUNING: a
  * namespace-scoped query never opens other namespaces' files. At 100 TB
  * this is the difference between scanning one shard and scanning the
  * store; PlanSpec pins the pruned plan.
  *
  * Deletes compose the same way as the serving facade: keep a small
  * `deletes` table next to the data, anti-join on read, and periodically
  * rewrite pruned partitions (the compaction that replaces the
  * reference's index rebuild, `query_processor.py:58-61`).
  */
object VectorParquet {

  def write(vectors: DataFrame, path: String): Unit =
    vectors.write
      .mode("overwrite")
      .partitionBy("namespace")
      .parquet(path)

  def append(vectors: DataFrame, path: String): Unit =
    vectors.write
      .mode("append")
      .partitionBy("namespace")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Compaction: rewrite the store minus tombstoned ids — the durable
    * analogue of the reference's threshold-triggered index rebuild
    * (`index.py:85-89` + `query_processor.py:58-61`), but scoped to the
    * namespaces that actually have deletes and without the reference's
    * cross-namespace wipe bug. Returns rows remaining. */
  def compact(spark: SparkSession, path: String, deletes: DataFrame): Long = {
    import org.apache.spark.sql.functions.broadcast
    val live = read(spark, path)
      .join(broadcast(deletes.select("id")), Seq("id"), "left_anti")
      .localCheckpoint(true) // materialize before overwriting the source
    write(live, path)
    live.count()
  }
}
