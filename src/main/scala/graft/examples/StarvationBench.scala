package graft.examples

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.store.DurableVectorStore

/** Sources the r19 SCALING claim for the durable starvation cache's
  * O(1) revalidation (VERDICT r18 "What's missing" #4): a validated
  * cache hit re-checks the observed-max commit stamp via the
  * `commits/_MAX` sidecar — ONE small file read, flat in commit count —
  * where the r18 form listed the `commits/` marker directory, whose
  * size grows with every commit until the next compaction GCs it.
  *
  * Script: prove a starvation fact (5 matching rows ≪ k) on a fresh
  * store, measure the steady validated-skip query median with STRICT
  * validation (`spark.graft.durable.starvedCheckMs=0` — every hit
  * revalidates); then simulate a busy multi-process root by minting
  * N empty marker files (exactly what other processes' claims leave
  * behind) + advancing the sidecar, re-prove at the moved stamp, and
  * measure again. Alongside, time the two validation PRIMITIVES
  * directly on the same dir: `listStatus` (the r18 cost) vs the
  * one-file sidecar read (the r19 cost).
  *
  * Run: `sbt 'runMain graft.examples.StarvationBench'`
  * (SPARK_GRAFT_STARVE_MARKERS overrides the busy-root marker count,
  * default 10000).
  */
object StarvationBench {

  private val Markers =
    sys.env.getOrElse("SPARK_GRAFT_STARVE_MARKERS", "10000").toInt
  private val Runs = 9

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "graft-starvation-bench")
    import spark.implicits._
    spark.conf.set("spark.graft.durable.starvedCheckMs", "0") // strict
    val root = java.nio.file.Files
      .createTempDirectory("graft_starve_bench_").toString
    val d = new DurableVectorStore(spark, root)
    // 5k common rows near the probe cells + 5 rare rows far from them:
    // the q164 starved-selectivity fixture at a benchable size
    val rows =
      (0 until 5000).map { i =>
        (s"c$i", Seq((i % 11).toFloat / 10f, (i % 7).toFloat / 10f,
          (i % 5).toFloat / 10f, 1f), Map("grp" -> "common"))
      } ++ (0 until 5).map { i =>
        (s"r$i", Seq(100f + i, 100f, 100f, 1f), Map("grp" -> "rare"))
      }
    d.loadFrame(rows.toDF("id", "values", "metadata"), "sb")
    val q = Seq(0.5f, 0.3f, 0.2f, 1f)
    d.findSimilar(q, k = 5, namespace = "sb", approx = true, index = "ivf")

    def skipMedian(): Double = {
      // first call proves (probe + rescue, counted); the timed tail are
      // validated skips — the steady state under measurement
      d.findSimilar(q, k = 10, namespace = "sb", approx = true,
        index = "ivf", filter = Map("grp" -> "rare"))
      val skips0 = d.starvedProbeSkips.get()
      val med = median((1 to Runs).map { _ =>
        time(d.findSimilar(q, k = 10, namespace = "sb", approx = true,
          index = "ivf", filter = Map("grp" -> "rare")))
      })
      require(d.starvedProbeSkips.get() == skips0 + Runs,
        "the timed queries did not all serve from the validated skip")
      med
    }

    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val commits = new org.apache.hadoop.fs.Path(s"$root/commits")
    def nMarkers = fs.listStatus(commits).length
    def listMs = median((1 to Runs).map(_ => time(fs.listStatus(commits)))) * 1000
    def sidecarMs = median((1 to Runs).map { _ =>
      time {
        val in = fs.open(new org.apache.hadoop.fs.Path(s"$root/commits/_MAX"))
        try in.read(new Array[Byte](32)) finally in.close()
      }
    }) * 1000

    val quietSkip = skipMedian()
    val quietN = nMarkers
    val quietList = listMs
    val quietSidecar = sidecarMs

    // the busy multi-process root: N claims by "other processes" — a
    // claim is exactly an empty zero-padded marker file plus the sidecar
    // advance the claimant writes
    val maxNow = fs.listStatus(commits).iterator
      .map(st => scala.util.Try(st.getPath.getName.toLong).getOrElse(0L))
      .foldLeft(0L)(math.max)
    (1 to Markers).foreach { i =>
      fs.create(new org.apache.hadoop.fs.Path(
        f"$root/commits/${maxNow + i}%020d"), true).close()
    }
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$root/commits/_MAX"), true)
    out.write((maxNow + Markers).toString.getBytes("UTF-8")); out.close()

    val busySkip = skipMedian() // stamp moved: re-proves once, then skips
    val busyN = nMarkers
    val busyList = listMs
    val busySidecar = sidecarMs

    println(f"""{"quiet_markers":$quietN,"quiet_skip_sec":$quietSkip%.4f,"quiet_list_ms":$quietList%.3f,"quiet_sidecar_ms":$quietSidecar%.3f,"busy_markers":$busyN,"busy_skip_sec":$busySkip%.4f,"busy_list_ms":$busyList%.3f,"busy_sidecar_ms":$busySidecar%.3f}""")
    spark.stop()
  }
}
