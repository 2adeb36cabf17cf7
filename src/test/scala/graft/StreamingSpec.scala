package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventOps
import graft.streaming.EventStream

/** Batch/stream parity: draining the streaming job over the same files
  * must reproduce EventOps.q29 exactly — the Spark-native way to pin
  * streaming semantics to an oracle-checked batch query. */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("stateful sessionization (flatMapGroupsWithState) equals the batch q28 answer") {
    val q = EventStream.startSessionsToMemory(spark, dir, "stream_sessions")
    try {
      q.processAllAvailable()
      // update mode appends a row per (user, batch); the last row per user
      // is the final state — with one finite file there is one batch, so
      // rows are already final, but reduce by max to stay batch-count-safe
      val streamed = spark.table("stream_sessions").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
        .groupBy(_._1).map { case (u, rows) => (u, rows.map(_._2).maxBy(_._1)) }
      val batch = EventOps.q28(spark, dir).collect()
        .map(r => (r.getLong(r.fieldIndex("user_id")),
          (r.getLong(r.fieldIndex("n_events")), r.getLong(r.fieldIndex("n_sessions")))))
        .toMap
      assert(batch.nonEmpty)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming hourly windows equal the batch q29 answer after drain") {
    val q = EventStream.startToMemory(spark, dir, "stream_hourly")
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_hourly").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val batch = EventOps.q29(spark, dir).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(batch.nonEmpty)
      assert(streamed == batch)
    } finally q.stop()
  }
}
