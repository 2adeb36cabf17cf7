package graft.examples

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.store.DurableVectorStore

/** Sources the r17 SCALING claim for TIME-TRAVEL reads (q175/q181/
  * q183–q186): serving a recorded snapshot through the index costs the
  * SAME probe as the live read plus two seq-bounded joins — the kill
  * set (tombstones in (builtSeq, asOf], mutation-window-sized,
  * broadcast) and the delta tail (as-of rows in (builtSeq, asOf], seq
  * bounds pushed to parquet footers) — NOT a second scan, and NOT the
  * exact as-of scan the naive implementation would run.
  *
  * Setup: 64k×64d corpus (the FilteredAnnBench recipe), IVF layout +
  * PQ codes built BEFORE the horizon, `h = currentSeq()` recorded, then
  * a realistic post-horizon mutation wave (1k deletes + 1k appends —
  * ~3 % of rows, inside the staleness ratio so the first layout keeps
  * serving). Measures, steady state (medians over repeat runs):
  *
  *  - live ivf probe                  (the q87 baseline)
  *  - as-of ivf probe at h            (the q175 read)
  *  - live pq probe                   (the q92 baseline)
  *  - as-of pq probe at h             (the q181 read)
  *  - exact as-of scan at h           (the naive denominator)
  *
  * Measured (64k×64d, 1k+1k wave, local[32]): as-of/live ratio
  * **ivf 0.95, pq 1.04** (0.441 vs 0.464 s; 0.699 vs 0.675 s) — the
  * horizon costs within noise of the live probe at a 3 % mutation
  * window, i.e. the bounded kill/delta joins, nothing corpus-shaped.
  * The exact as-of scan (0.117 s) still beats the probes at this
  * overhead-bound 64k scale — the same caveat every *AnnBench
  * states — but it reads the WHOLE snapshot, while the probes read
  * ≈ 2/√cells of it; the snapshot correctness itself (appends
  * invisible, top-1 parity with the exact snapshot) is asserted
  * in-run, not assumed.
  *
  * The 10× point (r18, SPARK_GRAFT_ASOF_N=655360 — 640k×64d, same
  * 1k+1k wave): as-of/live ratio **ivf 1.08, pq 0.97** (0.882 vs
  * 0.817 s; 1.360 vs 1.395 s) — the horizon claim holds at both
  * measured scales. The exact as-of scan (0.213 s) grew 1.8× on 10×
  * the data while the probes grew ~1.9× — BOTH are floor-bound at
  * local[32] (the probe pays a multi-job dispatch floor, the exact
  * scan is one codegen'd scan of 164 MB), so the wall-clock crossover
  * is still above this scale; the claim that transfers to 100 TB is
  * the BYTES one (probes read ~2/√cells of the snapshot, the exact
  * scan reads all of it) plus the measured fact that the HORIZON
  * itself stays free at 10×.
  *
  * Run: `sbt 'runMain graft.examples.AsOfBench'`. */
object AsOfBench {

  // default 64k; SPARK_GRAFT_ASOF_N=655360 is the 10× point recorded in
  // SCALING.md r18 (two measured points beat one extrapolation)
  private val N = sys.env.getOrElse("SPARK_GRAFT_ASOF_N", "65536").toLong
  private val Dim = 64
  private val K = 10
  private val Runs = 5
  private val WaveDel = 1000
  private val WaveAdd = 1000L

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "asof-bench")

    val root = java.nio.file.Files.createTempDirectory("graft_asof_bench_").toString
    val store = new DurableVectorStore(spark, root)

    val corpus = spark.range(N).select(
      col("id").cast("string").as("id"),
      expr(s"transform(sequence(0, ${Dim - 1}), " +
        "j -> cast(sin(id * 0.137 + j * 1.71) + cos(id * 0.011 * (j + 1)) as float))")
        .as("values"))
    val (_, tLoad) = time { store.loadFrame(corpus, "ao") }

    val queries: Seq[Seq[Float]] = corpus.limit(5).collect()
      .map(_.getSeq[Float](1).toSeq).toSeq

    // both derived structures BEFORE the horizon, so builtSeq ≤ h and
    // the as-of reads serve from the index (a younger layout would
    // honestly fall back exact — the opposite of what this measures)
    val (_, tBuild) = time {
      store.findSimilar(queries.head, k = K, namespace = "ao", approx = true)
      store.findSimilar(queries.head, k = K, namespace = "ao",
        approx = true, index = "pq")
    }
    val h = store.currentSeq()

    // post-horizon wave: ~3 % of rows — inside the staleness ratio
    val delIds = (0 until WaveDel).map(i => (i * 7L % N).toString).distinct
    store.delete(delIds, "ao")
    store.loadFrame(
      spark.range(N, N + WaveAdd).select(
        concat(lit("n"), col("id")).as("id"),
        expr(s"transform(sequence(0, ${Dim - 1}), " +
          "j -> cast(sin(id * 0.137 + j * 1.71) + cos(id * 0.011 * (j + 1)) as float))")
          .as("values")),
      "ao")

    def steady(tag: String)(f: Seq[Float] => Unit): Double = {
      queries.foreach(f) // warm
      val m = median((1 to Runs).flatMap(_ => queries.map { q =>
        time(f(q))._2
      }))
      println(f"$tag%-30s $m%8.3f s (median of ${Runs * queries.size})")
      m
    }

    println(f"load ${N}x$Dim: $tLoad%.1f s; cold ivf+pq builds: $tBuild%.1f s; " +
      s"horizon h=$h, wave ${delIds.size} deletes + $WaveAdd appends")
    val tLiveIvf = steady("live ivf probe") { q =>
      store.findSimilar(q, k = K, namespace = "ao", approx = true)
    }
    val tAsOfIvf = steady("as-of ivf probe") { q =>
      val hits = store.findSimilarAsOf(q, h, k = K, namespace = "ao",
        approx = true)
      // snapshot correctness rides every timed run: post-horizon
      // appends must never rank
      require(hits.size == K && !hits.exists(_.id.startsWith("n")))
    }
    val tLivePq = steady("live pq probe") { q =>
      store.findSimilar(q, k = K, namespace = "ao", approx = true,
        index = "pq")
    }
    val tAsOfPq = steady("as-of pq probe") { q =>
      val hits = store.findSimilarAsOf(q, h, k = K, namespace = "ao",
        approx = true, index = "pq")
      require(hits.size == K && !hits.exists(_.id.startsWith("n")))
    }
    val tExact = steady("exact as-of scan") { q =>
      store.findSimilarAsOf(q, h, k = K, namespace = "ao")
    }
    // deletes-still-served: the as-of top-k must agree with the exact
    // snapshot ranking on the nearest neighbor, deleted or not
    val q0 = queries.head
    val exactTop = store.findSimilarAsOf(q0, h, k = 1, namespace = "ao").head
    val ivfTop = store.findSimilarAsOf(q0, h, k = 1, namespace = "ao",
      approx = true).head
    require((ivfTop.id, ivfTop.score) == (exactTop.id, exactTop.score),
      "as-of probe top-1 diverged from the exact snapshot")
    println(f"as-of/live ratio: ivf ${tAsOfIvf / tLiveIvf}%.2f, " +
      f"pq ${tAsOfPq / tLivePq}%.2f " +
      "(claim: ~1 — the horizon adds two bounded seq joins, nothing " +
      f"corpus-shaped); exact as-of scan $tExact%.3f s reads the whole " +
      "snapshot, the probes read ~2/sqrt(cells) of it")
    spark.stop()
  }
}
