package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

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

/** Decoded/extracted features for one media payload. `format` is sniffed
  * from magic bytes; width/height come from a REAL image decode
  * (javax.imageio), sample_rate/duration_ms from a REAL WAV parse
  * (javax.sound.sampled). Video has no JDK codec → dimensions stay a
  * clearly-marked deterministic stub. */
final case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Int,
    checksum: Long,
    format: String,
    width: Int,
    height: Int,
    aspect: Double,
    sample_rate: Int,
    duration_ms: Double,
    entropy: Double)

/** Multimodal-column plumbing (north-star requirement): binary payload
  * columns, partition-iterator batch processing, typed feature extraction.
  *
  * The heavy step runs in `mapPartitions` — the Scala analogue of a
  * Pandas-UDF/`mapInPandas` stage: one iterator per partition, so decoder
  * setup (codec contexts, model weights) amortizes across rows exactly
  * like a Pandas batch. Image and audio decoding are REAL (the JDK ships
  * PNG/JPEG and WAV codecs); only video decode is stubbed, because no
  * video codec exists in the JDK or this container.
  */
object Multimodal {

  locally { System.setProperty("java.awt.headless", "true") }

  // ---- real decoders (JDK codecs, no new dependencies) ----------------

  /** Magic-number format sniff — the real first step of any media
    * pipeline (content-type can lie; bytes don't). */
  def sniffFormat(p: Array[Byte]): String = {
    def at(i: Int): Int = if (i < p.length) p(i) & 0xff else -1
    if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') "png"
    else if (at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) "jpeg"
    else if (at(0) == 'G' && at(1) == 'I' && at(2) == 'F') "gif"
    else if (at(0) == 'R' && at(1) == 'I' && at(2) == 'F' && at(3) == 'F' &&
      at(8) == 'W' && at(9) == 'A' && at(10) == 'V' && at(11) == 'E') "wav"
    else if (at(4) == 'f' && at(5) == 't' && at(6) == 'y' && at(7) == 'p') "mp4"
    else "unknown"
  }

  /** Real image decode via javax.imageio (PNG/JPEG/GIF/BMP). */
  def decodeImage(p: Array[Byte]): Option[(Int, Int)] =
    try Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(p)))
      .map(img => (img.getWidth, img.getHeight))
    catch { case _: Exception => None }

  /** Real WAV parse via javax.sound.sampled → (sample rate, duration ms). */
  def decodeWav(p: Array[Byte]): Option[(Int, Double)] =
    try {
      val in = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new ByteArrayInputStream(p))
      try {
        val fmt = in.getFormat
        val frames = in.getFrameLength
        if (fmt.getSampleRate > 0 && frames > 0)
          Some((fmt.getSampleRate.toInt, frames * 1000.0 / fmt.getSampleRate))
        else None
      } finally in.close()
    } catch { case _: Exception => None }

  /** Shannon entropy of the byte distribution, bits/byte ∈ [0, 8] — a
    * cheap corruption/compressibility signal computable for every kind. */
  def byteEntropy(p: Array[Byte]): Double = {
    if (p.isEmpty) return 0.0
    val counts = new Array[Long](256)
    var i = 0
    while (i < p.length) { counts(p(i) & 0xff) += 1; i += 1 }
    var h = 0.0
    var c = 0
    while (c < 256) {
      if (counts(c) > 0) {
        val q = counts(c).toDouble / p.length
        h -= q * math.log(q) / math.log(2)
      }
      c += 1
    }
    h
  }

  def checksum(payload: Array[Byte]): Long = {
    var crc = 0xcbf29ce484222325L
    var i = 0
    while (i < payload.length) {
      crc = (crc ^ (payload(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    crc
  }

  /** STUB — video only. No video codec exists in the JDK or this
    * container, so video dimensions derive deterministically from the
    * checksum. A real deployment replaces ONLY this function (javacv /
    * ffmpeg behind the same signature). */
  def decodeVideoStub(payload: Array[Byte]): (Int, Int) = {
    val crc = checksum(payload)
    (160 + (math.abs(crc) % 8 * 80).toInt, 120 + (math.abs(crc >> 16) % 6 * 90).toInt)
  }

  // ---- deterministic payload synthesis (real encodings) ---------------

  /** Deterministic small PNG: dimensions and pixels derive from the id, so
    * the decode path is exercised against a known-answer. */
  def syntheticPng(id: Long): Array[Byte] = {
    val w = 16 * (1 + (id % 8)).toInt
    val h = 16 * (1 + ((id / 8) % 6)).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (((id * 2654435761L) ^ (x * 31L + y)) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic mono 16-bit PCM WAV at 8 kHz; length varies with id. */
  def syntheticWav(id: Long): Array[Byte] = {
    val sampleRate = 8000
    val nSamples = 800 + (id % 5).toInt * 400
    val dataLen = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      buf.putShort((8000 * math.sin(2 * math.Pi * (220 + id % 7 * 55) * i / sampleRate)).toShort)
      i += 1
    }
    buf.array()
  }

  /** Synthesize a media table from the documents corpus. Image rows carry
    * REAL PNG bytes, audio rows REAL WAV bytes (both deterministic from
    * the id); video rows carry opaque utf-8 bytes (no JDK video codec to
    * encode with — the honest analogue of a payload the pipeline cannot
    * decode). */
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
      .mapPartitions(_.map { m =>
        m.kind match {
          case "image" => m.copy(payload = syntheticPng(m.media_id))
          case "audio" => m.copy(payload = syntheticWav(m.media_id))
          case _ => m
        }
      })
  }

  /** Feature extraction over partition iterators (the mapInPandas-shaped
    * stage). Narrow transformation: no shuffle, scales with input. Image
    * and audio features come from real decodes; video from the marked
    * stub. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition setup would go here (codec/context init, model load)
      it.map { m =>
        val fmt = sniffFormat(m.payload)
        val crc = checksum(m.payload)
        val ent = byteEntropy(m.payload)
        val (w, h) = m.kind match {
          case "image" => decodeImage(m.payload).getOrElse((0, 0))
          case "video" => decodeVideoStub(m.payload)
          case _ => (0, 0)
        }
        val (rate, durMs) =
          if (m.kind == "audio") decodeWav(m.payload).getOrElse((0, 0.0))
          else (0, 0.0)
        MediaFeatures(m.media_id, m.kind, m.payload.length, crc, fmt, w, h,
          if (h > 0) w.toDouble / h else 0.0, rate, durMs, ent)
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
        avg(col("entropy")).as("avg_entropy"))
      .orderBy(col("kind"))
}
