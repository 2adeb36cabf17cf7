package graft

/** Optimization-round instrument: split a declared query's per-invocation
  * wall into (plan-construction, analysis+physical-planning, execution)
  * and print per-sample Spark job counts — the cheap stand-in for the UI
  * at guide §1.1 when the UI is off.
  *
  * Usage: runMain graft.ProfileQuery <sfDir> <samples> <name>[,<name>...]
  * Names match by substring (the SPARK_GRAFT_BENCH_ONLY convention).
  * First sample per query is the warm run (reported separately).
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val samples = args(1).toInt
    val wanted = args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus.toInt, "graft-profile")
    val sc = spark.sparkContext
    // job/stage counters via a listener — per-sample deltas show how many
    // scheduler round-trips one invocation pays
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks)
      }
    })
    def persistedIds(): Set[Int] = sc.getPersistentRDDs.keySet.toSet
    def dropNewSince(base: Set[Int]): Unit =
      sc.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!base.contains(id)) rdd.unpersist(blocking = false)
      }
    spark.range(1000).selectExpr("sum(id)").collect()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (wanted.exists(name.contains)) {
        val pre = persistedIds()
        (0 until samples).foreach { i =>
          val j0 = jobs.get(); val s0 = stages.get(); val t0 = tasks.get()
          val c0 = System.nanoTime()
          val df = fn(spark, sfDir)
          val c1 = System.nanoTime()
          df.queryExecution.executedPlan // force analysis+planning
          val c2 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          val c3 = System.nanoTime()
          println(f"PROFILE $name%s sample=$i%d construct=${(c1 - c0) / 1e3}%.0fus " +
            f"plan=${(c2 - c1) / 1e3}%.0fus exec=${(c3 - c2) / 1e3}%.0fus " +
            f"total=${(c3 - c0) / 1e6}%.1fms jobs=${jobs.get() - j0}%d " +
            f"stages=${stages.get() - s0}%d tasks=${tasks.get() - t0}%d")
          dropNewSince(pre)
        }
      }
    }
    spark.stop()
  }
}
