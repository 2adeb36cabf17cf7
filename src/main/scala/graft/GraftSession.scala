package graft

import org.apache.spark.sql.SparkSession

/** Library-blessed local session builder: one place that applies
  * [[graft.sources.Tables.requiredConfs]] (e.g. nanosAsLong for the
  * events source) so no entry point can forget it — loaders themselves
  * never mutate a live session's conf.
  */
object GraftSession {
  def local(cores: Int, appName: String): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.requiredConfs.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
