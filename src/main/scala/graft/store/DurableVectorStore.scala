package graft.store

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.model.SearchHit

/** The durable, cluster-scale variant of [[VectorStore]] — the store the
  * 100 TB deployment actually serves from. [[VectorStore]]'s scaladoc
  * promises it ("a parquet table partitioned by namespace plus a deletes
  * table — identical plans, different source"); this class makes it real
  * with the same read semantics (`query_processor.py:26-49` always reads
  * from the store; `storage_engine_in_memory.py:39-44`'s per-namespace
  * dict lookup becomes partition PRUNING on the `namespace` directory).
  *
  * Layout under `path`:
  *  - `data/` — namespace-partitioned parquet of
  *    (id, values, metadata, metadataJson, seq), append-only;
  *  - `deletes/` — flat parquet tombstone log of (id, namespace, seq),
  *    append-only and deletes-sized (it never carries vectors).
  *
  * `seq` is a strictly-increasing commit stamp (seeded from the layout's
  * max on open, then an in-process counter). A row is LIVE iff no
  * tombstone for its (id, namespace) carries a HIGHER seq — so deleting
  * an id and re-adding it later works without rewriting anything: the
  * re-add's seq outranks the tombstone. This is the LSM discipline
  * (append + tombstone + periodic [[compact]]) instead of the
  * reference's in-place dict mutation + stop-the-world index rebuild
  * (`index.py:131-162`), because at scale rewriting the store per delete
  * is the thing that cannot happen.
  *
  * Cluster contract (same as `spark.graft.ivf.dir`): `path` must be a
  * shared filesystem — executors write the partitioned appends, any
  * driver may read them back. Single-writer per store at a time: the seq
  * counter serializes commits in ONE process; multi-writer deployments
  * put a commit log (or a table format) in front, which is out of scope
  * here and documented rather than half-built. Reads are always safe —
  * they see whatever appends have landed.
  */
class DurableVectorStore(val spark: SparkSession, val path: String) {

  import spark.implicits._

  private def dataPath = s"$path/data"
  private def delPath = s"$path/deletes"

  /** Hadoop-FS existence probe, NOT java.io.File: the documented cluster
    * contract is a shared filesystem, and an hdfs://- or s3a://-rooted
    * path must resolve through the same FileSystem the writes go to. */
  private def exists(p: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)
  }

  /** Seeded once from the layout (max over two small long columns —
    * parquet answers this from footer statistics), then monotonic
    * in-process. */
  private lazy val seq: AtomicLong = {
    def maxSeq(p: String): Long =
      if (!exists(p)) 0L
      else spark.read.parquet(p).agg(max(col("seq"))).head() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
    new AtomicLong(math.max(maxSeq(dataPath), maxSeq(delPath)))
  }

  private def nextSeq(): Long = seq.incrementAndGet()

  // ---- writes ---------------------------------------------------------

  /** Bulk append with caller-supplied ids — the ingestion surface.
    * `df` needs `id` (castable to string) and `values: array<float>`
    * columns. UPSERT semantics, matching [[VectorStore.loadFrame]]:
    * ids already live in the namespace are SHADOWED, not duplicated —
    * before the data append, one tombstone append covers exactly the
    * overlap (computed by a semi-join probe, so the tombstone batch is
    * overlap-sized: empty for the common disjoint load, never a copy of
    * the whole id set). The incoming rows' higher seq then outranks
    * those tombstones like any re-add. Re-adding a previously deleted id
    * resurrects it the same way. */
  def loadFrame(df: DataFrame, namespace: String): Unit = {
    val incoming = df.select(col("id").cast("string").as("id"),
      col("values").cast("array<float>").as("values"))
    if (exists(dataPath)) {
      val shadowSeq = nextSeq()
      live().filter(col("namespace") === namespace)
        .join(incoming.select(col("id").as("__iid")),
          col("id") === col("__iid"), "left_semi")
        .select(col("id"),
          lit(namespace).as("namespace"),
          lit(shadowSeq).as("seq"))
        .write.mode("append").parquet(delPath)
    }
    incoming
      .withColumn("metadata", typedLit(Map.empty[String, String]))
      .withColumn("metadataJson", lit("{}"))
      .withColumn("seq", lit(nextSeq()))
      .withColumn("namespace", lit(namespace))
      .write.mode("append").partitionBy("namespace").parquet(dataPath)
  }

  /** Tombstone-append delete. Returns the ids that were actually live
    * (report semantics of `query_processor.py:51-62`); the tombstones
    * are written regardless — a dead tombstone is harmless and saves the
    * read-verify-write round trip at scale. */
  /** Above this many ids the presence probe switches from a literal
    * `isInCollection` predicate to a broadcast semi-join — same
    * constant-plan-size rationale as [[VectorStore]]'s bulk forms. */
  private val InListMax = 1000

  def delete(ids: Seq[String], namespace: String): Seq[String] = {
    val inNs = live().filter(col("namespace") === namespace)
    val present =
      if (ids.size <= InListMax)
        inNs.filter(col("id").isInCollection(ids))
          .select("id").as[String].collect().toSeq
      else
        inNs.join(broadcast(ids.distinct.toDF("__did")),
            col("id") === col("__did"), "left_semi")
          .select("id").as[String].collect().toSeq
    ids.distinct.toDF("id")
      .withColumn("namespace", lit(namespace))
      .withColumn("seq", lit(nextSeq()))
      .write.mode("append").parquet(delPath)
    present
  }

  // ---- reads ----------------------------------------------------------

  /** Live rows: data minus newer tombstones. The tombstone side is
    * deletes-sized and broadcast; the data side is never shuffled. On a
    * freshly-compacted (or never-deleted) store this is a plain scan. */
  def live(): DataFrame = {
    require(exists(dataPath), s"no durable store at $path")
    val d = spark.read.parquet(dataPath)
    if (!exists(delPath)) d
    else {
      val t = spark.read.parquet(delPath)
        .select(col("id").as("__tid"), col("namespace").as("__tns"),
          col("seq").as("__tseq"))
      d.join(broadcast(t),
        col("id") === col("__tid") && col("namespace") === col("__tns") &&
          col("__tseq") > col("seq"),
        "left_anti")
    }
  }

  /** Top-k search over the durable layout — the q01/q02 plan reading
    * parquet: namespace partition pruning → codegen'd distance →
    * `TakeOrderedAndProject`. Same metric/tie-break contract as
    * [[VectorStore.findSimilar]]: ranked on the RAW score (callers round
    * for reports), ties broken by string id ascending. */
  def findSimilar(query: Seq[Float], k: Int = 10, metric: String = "cosine",
                  namespace: String = "default"): Seq[SearchHit] = {
    require(k >= 1 && k <= 1000, "top_k must be in [1, 1000]")
    val qv = array(query.map(v => lit(v)): _*).cast("array<float>")
    val base = live().filter(col("namespace") === namespace)
    val score = metric match {
      case "l2"     => l2sq(col("values"), qv)
      case "cosine" => cosineSim(col("values"), qv)
      case "ip"     => ipDist(col("values"), qv)
      case other    => throw new IllegalArgumentException(s"unknown metric '$other'")
    }
    val scored = base.withColumn("score", score)
    val ranked =
      if (metric == "cosine") scored.orderBy(col("score").desc, col("id"))
      else scored.orderBy(col("score"), col("id"))
    ranked.limit(k)
      .select(col("id"), col("score"), col("values"), col("metadata"),
        col("metadataJson"))
      .as[SearchHit].collect().toSeq
  }

  /** Point read (S1 on the durable path): partition-pruned single-row
    * lookup. */
  def read(id: String, namespace: String): Option[graft.model.VectorRecord] =
    live().filter(col("namespace") === namespace && col("id") === id)
      .select(col("id"), col("namespace"), col("values"), col("metadata"),
        col("metadataJson"))
      .as[graft.model.VectorRecord].collect().headOption

  /** Positional batch read (S2): result(i) corresponds to ids(i), None
    * for misses — one pruned scan, not N; broadcast semi-join above
    * [[InListMax]] like [[delete]]. */
  def readBatch(ids: Seq[String], namespace: String): Seq[Option[graft.model.VectorRecord]] = {
    val inNs = live().filter(col("namespace") === namespace)
    val matched =
      if (ids.size <= InListMax) inNs.filter(col("id").isInCollection(ids))
      else inNs.join(broadcast(ids.distinct.toDF("__rid")),
        col("id") === col("__rid"), "left_semi")
    val found = matched
      .select(col("id"), col("namespace"), col("values"), col("metadata"),
        col("metadataJson"))
      .as[graft.model.VectorRecord].collect().map(r => r.id -> r).toMap
    ids.map(found.get)
  }

  def totalCount(): Long = live().count()

  def listNamespaces(): Seq[String] =
    live().select("namespace").distinct().as[String].collect().toSeq.sorted

  // ---- maintenance ----------------------------------------------------

  /** Fold the tombstone log into the data: rewrite live rows, clear
    * deletes. The offline job a deployment schedules (the rebuild
    * analogue of `index.py:131-162`); readers before/after see the same
    * live set, they just stop paying the anti-join. Returns rows
    * remaining. */
  def compact(): Long = {
    val kept = live().localCheckpoint(true)
    kept.write.mode("overwrite").partitionBy("namespace").parquet(dataPath)
    if (exists(delPath)) {
      // overwrite with an empty frame of the same schema rather than
      // filesystem-deleting the directory: keeps the operation a pure
      // Spark write (works on any shared FS the layout lives on)
      spark.emptyDataset[(String, String, Long)]
        .toDF("id", "namespace", "seq")
        .write.mode("overwrite").parquet(delPath)
    }
    kept.count()
  }
}
