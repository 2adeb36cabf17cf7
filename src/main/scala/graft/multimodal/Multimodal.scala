package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal record: an opaque binary payload + typed metadata — the
  * schema shape a 100 TB training-data pipeline uses for image/audio/video
  * columns (media stays `binary`, everything filterable lives in typed
  * columns / the metadata map). */
final case class MediaRecord(
    media_id: Long,
    kind: String,
    payload: Array[Byte],
    meta: Map[String, String])

/** Decoded/extracted features for one media payload. In a real pipeline
  * width/height/duration come from the codec; here they come from the
  * deterministic stub below. */
final case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Int,
    checksum: Long,
    width: Int,
    height: Int,
    aspect: Double)

/** Multimodal-column plumbing (north-star requirement): binary payload
  * columns, partition-iterator batch processing, typed feature extraction.
  *
  * The heavy step runs in `mapPartitions` — the Scala analogue of a
  * Pandas-UDF/`mapInPandas` stage: one iterator per partition, so a real
  * decoder would amortize per-partition setup (codec contexts, model
  * weights) across rows exactly like a Pandas batch. Partitioning, schema,
  * and batch shape are real and tested (MultimodalSpec); only the codec
  * call is stubbed.
  */
object Multimodal {

  /** STUB — deterministic fake decode. The container ships no image/audio
    * codecs, so this derives plausible dimensions from a payload checksum.
    * A real deployment replaces ONLY this function (e.g. javacv/libvips
    * behind the same signature); everything around it is production
    * plumbing. */
  def decodeStub(payload: Array[Byte]): (Long, Int, Int) = {
    var crc = 0xcbf29ce484222325L
    var i = 0
    while (i < payload.length) {
      crc = (crc ^ (payload(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    val width = 160 + (math.abs(crc) % 8 * 80).toInt   // 160..720 step 80
    val height = 120 + (math.abs(crc >> 16) % 6 * 90).toInt
    (crc, width, height)
  }

  /** Synthesize a media table from the documents corpus: payload = utf-8
    * bytes standing in for an encoded image/audio blob. Deterministic, so
    * specs and demos are stable. */
  def syntheticMedia(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.table(spark, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        map(lit("source"), col("source"), lit("lang"), col("lang")).as("meta"))
      .as[MediaRecord]
  }

  /** Feature extraction over partition iterators (the mapInPandas-shaped
    * stage). Narrow transformation: no shuffle, scales with input. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition setup would go here (codec/context init, model load)
      it.map { m =>
        val (crc, w, h) = decodeStub(m.payload)
        MediaFeatures(m.media_id, m.kind, m.payload.length, crc, w, h,
          w.toDouble / h.toDouble)
      }
    }
  }

  /** Example downstream use: per-kind feature aggregate over the extracted
    * features — joins the multimodal path back into plain SQL analytics. */
  def featureSummary(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(syntheticMedia(spark, dir))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        avg(col("n_bytes")).as("avg_bytes"),
        avg(col("aspect")).as("avg_aspect"))
      .orderBy(col("kind"))
}
