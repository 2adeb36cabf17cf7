package graft.operators

import org.apache.spark.sql.SparkSession

/** Per-process layout-root plumbing shared by the persisted index
  * layouts (IVF / PQ / IVFADC) — one copy of the cluster contract each
  * object used to restate:
  *
  *  - root = the object's conf key when set (cluster deployments point
  *    every executor-visible process at one shared filesystem), else a
  *    mkdtemp-style private directory (0700, unpredictable name — not a
  *    fixed world-writable `/tmp/...` parent a hostile symlink could
  *    pre-claim on a shared host). The private root is correct for
  *    local mode only, hence the conf.
  *  - a per-process token inside the path: concurrent processes grading
  *    the same input dir (or sharing one cluster-wide root) must not
  *    clobber each other's layout mid-read.
  *  - input-dir sanitization so arbitrary paths become safe single path
  *    segments.
  *
  * Deliberately NO shutdown-hook cleanup: the graded oracles are
  * EXTERNAL DuckDB processes that replay persisted layouts after this
  * JVM exits; exit-time removal would grade them against deleted paths.
  * The leak is bounded (small layouts under the system temp dir, reaped
  * by normal tmp cleanup).
  */
private[graft] final class LayoutRoot(confKey: String, tmpPrefix: String) {

  private lazy val privateRoot: String =
    java.nio.file.Files.createTempDirectory(tmpPrefix).toString

  private val processToken: String =
    ProcessHandle.current().pid().toString + "_" +
      java.util.UUID.randomUUID().toString.take(8)

  /** Where `dir`'s layout lives for THIS process. Consumers never
    * reconstruct the path — it flows through build return values into
    * the oracle SQL. */
  def auxDir(spark: SparkSession, dir: String): String =
    spark.conf.getOption(confKey).getOrElse(privateRoot) +
      "/" + processToken + "/" + graft.PathToken.token(dir)
}
