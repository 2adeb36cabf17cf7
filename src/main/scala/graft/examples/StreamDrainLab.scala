package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.GraftSession

/** r21 instrument for VERDICT r20 #7 (the drain floor): run named
  * streaming drain queries with a [[StreamingQueryListener]] attached and
  * print every micro-batch's engine-reported phase durations
  * (`durationMs`: addBatch / getBatch / latestOffset / queryPlanning /
  * walCommit / commitOffsets / triggerExecution) plus batch counts — the
  * measured batches-per-drain split the verdict asked for. A/B knobs ride
  * SPARK_GRAFT_EXTRA_CONF (e.g. the drain shuffle-partition pin or the
  * no-data-batch gate).
  *
  * Usage: runMain graft.examples.StreamDrainLab <sfDir> <samples> <name>[,..]
  */
object StreamDrainLab {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val samples = if (args.length > 1) args(1).toInt else 3
    val wanted = args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark: SparkSession = GraftSession.local(cpus, "graft-drain-lab")
    spark.range(1000).selectExpr("sum(id)").collect()

    val batches =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, String)]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        import scala.jdk.CollectionConverters._
        val dur = p.durationMs.asScala.toSeq.sortBy(-_._2)
          .map { case (k, v) => s"$k=$v" }.mkString(",")
        batches.add((Option(p.name).getOrElse("?"), p.batchId,
          s"rows=${p.numInputRows} $dur"))
      }
    })

    SparkEntryRef.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (wanted.exists(name.contains)) {
        (0 until samples).foreach { i =>
          batches.clear()
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          Thread.sleep(200) // listener events are async
          val bl = batches.toArray(Array.empty[(String, Long, String)])
          println(f"DRAINLAB $name sample=$i total=${dt}%.3fs batches=${bl.length}")
          bl.foreach { case (q, b, d) => println(s"  BATCH $q#$b $d") }
        }
      }
    }
    spark.stop()
  }

  /** Indirection kept tiny so the lab never shadows the graded registry. */
  private object SparkEntryRef {
    def queries = graft.SparkEntry.queries
  }
}
