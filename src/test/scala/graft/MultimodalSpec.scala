package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("binary payload round-trips through the media schema") {
    val m = Multimodal.syntheticMedia(spark, dir)
    val first = m.filter(_.media_id == 0).collect().head
    assert(first.payload.nonEmpty)
    assert(Set("image", "audio", "video").contains(first.kind))
    assert(first.meta.contains("source") && first.meta.contains("lang"))
  }

  test("image features come from a REAL PNG decode (javax.imageio)") {
    val feats = Multimodal.extractFeatures(Multimodal.syntheticMedia(spark, dir))
      .filter(_.kind == "image").collect()
    assert(feats.nonEmpty)
    // every image payload sniffs as png and decodes to the known-answer dims
    feats.foreach { f =>
      assert(f.format == "png", s"media ${f.media_id} sniffed as ${f.format}")
      val expW = 16 * (1 + (f.media_id % 8)).toInt
      val expH = 16 * (1 + ((f.media_id / 8) % 6)).toInt
      assert(f.width == expW && f.height == expH,
        s"media ${f.media_id}: got ${f.width}x${f.height}, want ${expW}x$expH")
      assert(math.abs(f.aspect - expW.toDouble / expH) < 1e-12)
    }
  }

  test("audio features come from a REAL WAV parse (javax.sound.sampled)") {
    val feats = Multimodal.extractFeatures(Multimodal.syntheticMedia(spark, dir))
      .filter(_.kind == "audio").collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.format == "wav")
      assert(f.sample_rate == 8000)
      val expSamples = 800 + (f.media_id % 5).toInt * 400
      assert(math.abs(f.duration_ms - expSamples * 1000.0 / 8000) < 1e-9,
        s"media ${f.media_id}: duration ${f.duration_ms}")
    }
  }

  test("video features come from a REAL MP4 container parse (ISO BMFF box walk)") {
    val feats = Multimodal.extractFeatures(Multimodal.syntheticMedia(spark, dir))
      .collect()
    val video = feats.filter(_.kind == "video")
    assert(video.nonEmpty)
    video.foreach { f =>
      assert(f.format == "mp4", s"media ${f.media_id} sniffed as ${f.format}")
      val expW = 160 + (f.media_id % 8).toInt * 80
      val expH = 120 + ((f.media_id / 8) % 6).toInt * 90
      assert(f.width == expW && f.height == expH,
        s"media ${f.media_id}: got ${f.width}x${f.height}, want ${expW}x$expH")
      // mvhd timescale is 1000, so duration_ms equals the raw duration
      val expDur = (2000 + (f.media_id % 10).toInt * 500).toDouble
      assert(math.abs(f.duration_ms - expDur) < 1e-9,
        s"media ${f.media_id}: duration ${f.duration_ms}, want $expDur")
    }
    feats.foreach(f => assert(f.entropy > 0 && f.entropy <= 8.0))
  }

  test("frame sampling slices REAL sample-table extents (container-level, no codec)") {
    val id = 6L
    val p = Multimodal.syntheticMp4(id)
    val nFrames = 4 + (id % 4).toInt
    val all = Multimodal.sampleFrames(p, every = 1)
    assert(all.map(_._1) == (0 until nFrames))
    all.foreach { case (i, bytes) =>
      val expSize = 24 + ((id + i) % 5).toInt * 8
      assert(bytes.length == expSize, s"frame $i size ${bytes.length} != $expSize")
      // contents are the known-answer generator bytes, byte-for-byte
      val exp = Array.tabulate[Byte](expSize)(k => (((id * 131) + i * 17 + k) & 0xff).toByte)
      assert(bytes.sameElements(exp), s"frame $i payload mismatch")
    }
    // stride sampling takes frames 0, 2, 4, ...
    assert(Multimodal.sampleFrames(p, every = 2).map(_._1) ==
      (0 until nFrames by 2))
    // non-mp4 payloads sample nothing rather than erroring
    assert(Multimodal.sampleFrames(Multimodal.syntheticPng(1), 1).isEmpty)
    // the Dataset stage explodes video rows only
    val fs = Multimodal.frameSamples(Multimodal.syntheticMedia(spark, dir), 2)
      .collect()
    assert(fs.nonEmpty)
    assert(fs.forall(_.n_bytes >= 24))
  }

  test("image resize is a REAL decode->scale->re-encode (north-star resize stage)") {
    val resized = Multimodal.resizeImage(Multimodal.syntheticPng(5), 40, 24)
    assert(resized.isDefined)
    assert(Multimodal.sniffFormat(resized.get) == "png")
    assert(Multimodal.decodeImage(resized.get).contains((40, 24)))
    // undecodable input -> None, never an exception
    assert(Multimodal.resizeImage("not an image".getBytes("UTF-8"), 8, 8).isEmpty)
    // the Dataset stage resizes images and passes other kinds through
    val media = Multimodal.syntheticMedia(spark, dir)
    val out = Multimodal.resizeImages(media, 32, 32).collect()
    out.filter(_.kind == "image").foreach { m =>
      assert(Multimodal.decodeImage(m.payload).contains((32, 32)))
    }
    val vidIn = media.filter(_.kind == "video").collect()
      .map(m => m.media_id -> m.payload.toSeq).toMap
    out.filter(_.kind == "video").foreach { m =>
      assert(m.payload.toSeq == vidIn(m.media_id), "non-image payload mutated")
    }
  }

  test("mp4 parse rejects non-video bytes instead of fabricating dims") {
    assert(Multimodal.decodeMp4Meta("not a video at all".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeMp4Meta(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeMp4Meta(Multimodal.syntheticPng(1)).isEmpty)
    // known-answer sanity on a well-formed container
    assert(Multimodal.decodeMp4Meta(Multimodal.syntheticMp4(3))
      .contains((160 + 3 * 80, 120, 3500.0)))
  }

  test("feature extraction is deterministic, typed, and narrow") {
    val media = Multimodal.syntheticMedia(spark, dir)
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.forall(f => f.n_bytes > 0))
    // narrow: partition count is preserved through mapPartitions
    assert(Multimodal.extractFeatures(media).rdd.getNumPartitions ==
      media.rdd.getNumPartitions)
  }

  test("feature summary aggregates by kind") {
    val s = Multimodal.featureSummary(spark, dir).collect()
    assert(s.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    assert(s.map(_.getLong(1)).sum == 500)
  }
}
