package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's Parquet corpus (TESTDATA.md / FIXTURES.md §B).
  *
  * At 100 TB these would be partitioned tables behind the catalog; the
  * access pattern (predicate pushdown + column pruning via plain
  * `spark.read.parquet`) is identical.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Session confs this library's sources depend on. Apply at session
    * build ([[https://spark.apache.org SparkSession.builder]].config —
    * `GraftSession.local` does). For sessions built elsewhere,
    * [[events]] calls [[adoptRequiredConfs]]: a GUARDED one-time set of
    * any missing/incorrect key. The guard means an already-correct
    * session is never written to; a foreign session whose first `events`
    * read races another query can still observe the one-time set (and
    * the conf stays set afterwards) — build with the confs up front to
    * avoid even that window. */
  val requiredConfs: Map[String, String] =
    Map("spark.sql.legacy.parquet.nanosAsLong" -> "true")

  /** Session adoption: set any [[requiredConfs]] key the session is
    * missing (or carries with the wrong value). Idempotent, and a no-op
    * on sessions built via `GraftSession` — the conf writes happen only
    * on a foreign session's first use, which is the documented trade-off:
    * a concurrent reader on that session can observe the one-time set,
    * and the conf is deliberately NOT restored (the sources need it for
    * every subsequent read). Call this once at adoption time to keep the
    * write out of the read path entirely. */
  def adoptRequiredConfs(spark: SparkSession): Unit =
    requiredConfs.foreach { case (k, v) =>
      if (!spark.conf.getOption(k).contains(v)) spark.conf.set(k, v)
    }

  /** `events` with its timestamp column normalized to a microsecond
    * TIMESTAMP, ADAPTIVE to how the corpus was written (the driver's
    * generator has shipped both):
    *
    *  - `timestamp[ns]` parquet: Spark 4 refuses TIMESTAMP(NANOS)
    *    (PARQUET_TYPE_ILLEGAL) unless the legacy nanosAsLong conf is on
    *    — set [[requiredConfs]] at session build; the column then reads
    *    as a nanos LONG and `ts div 1000` truncates to µs in long
    *    arithmetic (a double round-trip would lose precision at 1.7e18
    *    ns epochs), exactly what DuckDB does loading the same file.
    *  - `timestamp[us]` parquet (r11 corpus): reads as TIMESTAMP_NTZ;
    *    cast to the session-zone TIMESTAMP (sessions run UTC — the cast
    *    is a type relabel, not a value shift), keeping every downstream
    *    window/watermark/epoch expression on the type they were built
    *    for.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Sessions built by GraftSession already carry requiredConfs;
    // getOrCreate ignores builder confs when a session pre-exists, so
    // foreign sessions are adopted on first use (guarded: no write — and
    // no race with concurrent readers — when already correct).
    adoptRequiredConfs(spark)
    val t = table(spark, dir, "events")
    t.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        t.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        t.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => t // already a session-zone µs TIMESTAMP
    }
  }

  /** Reference-shaped vector view over `embeddings` (SURVEY §1.4):
    * `(id, namespace, values, label)` where namespace is derived from the
    * label — the Spark analogue of the per-namespace dict at
    * `storage_engine_in_memory.py:12`. On a partitioned table the
    * `namespace` predicate becomes partition pruning.
    */
  def vectors(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "embeddings").select(
      col("vec_id").as("id"),
      concat(lit("ns_"), col("label") % 4).as("namespace"),
      col("embedding").as("values"),
      col("label"))

  /** Matching DuckDB-side view of [[vectors]], spliced into oracle SQL. */
  val vectorsSql: String =
    "SELECT vec_id AS id, 'ns_' || (label % 4) AS namespace, " +
      "embedding AS values, label FROM embeddings"
}
