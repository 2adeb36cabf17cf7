package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (SparkSession.builder is
  * idempotent per JVM — every suite gets the same instance). */
object TestSpark {
  lazy val spark: SparkSession = {
    val b = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      // under target/ so `sbt clean` reclaims it (a fresh /tmp dir per
      // run would strand a table copy per test invocation)
      .config("spark.sql.warehouse.dir",
        new java.io.File("target/graft_wh").getAbsolutePath)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.requiredConfs.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
