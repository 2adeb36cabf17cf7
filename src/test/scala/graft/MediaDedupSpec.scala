package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.MediaDedup

/** Semantic invariants of the perceptual-dedup family (q150/q151) that
  * the oracle replay cannot check — the oracle proves both engines
  * compute the same hashes over the same bytes; these pin that the
  * hashes MEAN near-duplicate. */
class MediaDedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("BMP encoder round-trips through ImageIO pixel-exact") {
    val px = MediaDedup.pixelsFor(7L)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(MediaDedup.encodeBmp(px)))
    assert(img.getWidth == MediaDedup.ImgW && img.getHeight == MediaDedup.ImgH)
    for (y <- 0 until MediaDedup.ImgH; x <- 0 until MediaDedup.ImgW)
      assert((img.getRGB(x, y) & 0xffffff) == px(y)(x),
        s"pixel ($x,$y) drifted through encode/decode")
  }

  test("dHash separates: plants near, unrelated pairs at the random-code expectation") {
    val hashes = (0L until 60L)
      .map(id => id -> MediaDedup.dhash(
        MediaDedup.encodeBmp(MediaDedup.pixelsFor(id)))).toMap
    // planted pairs within threshold
    Seq(9L, 19L, 29L, 39L, 49L, 59L).foreach { p =>
      val d = hamming(hashes(p), hashes(p - 1))
      assert(d <= MediaDedup.DHashMaxHamming, s"plant $p at hamming $d")
    }
    // unrelated pairs far — min over all non-planted pairs well above
    // the threshold (the separation that makes the threshold a policy,
    // not a coin flip)
    val unrelated = for {
      a <- 0L until 60L; b <- a + 1 until 60L
      if !(b == a + 1 && b % 10 == 9)
    } yield hamming(hashes(a), hashes(b))
    assert(unrelated.min > MediaDedup.DHashMaxHamming + 6,
      s"unrelated images too close: min hamming ${unrelated.min}")
    assert(unrelated.sum.toDouble / unrelated.size > 24,
      "unrelated mean hamming should sit near the random expectation of 32")
  }

  test("audio fingerprint separates the same way") {
    val hashes = (0L until 60L)
      .map(id => id -> MediaDedup.audioFingerprint(
        MediaDedup.encodeWav(MediaDedup.samplesFor(id)))).toMap
    Seq(9L, 19L, 29L, 39L, 49L, 59L).foreach { p =>
      val d = hamming(hashes(p), hashes(p - 1))
      assert(d <= MediaDedup.AudioMaxHamming, s"plant $p at hamming $d")
    }
    val unrelated = for {
      a <- 0L until 60L; b <- a + 1 until 60L
      if !(b == a + 1 && b % 10 == 9)
    } yield hamming(hashes(a), hashes(b))
    assert(unrelated.min > MediaDedup.AudioMaxHamming + 6,
      s"unrelated audio too close: min hamming ${unrelated.min}")
  }

  test("banded candidates guarantee every within-threshold pair by pigeonhole") {
    // 4 bands × 16 bits: at hamming ≤ 3 (= the graded thresholds) at
    // most 3 bands are touched, so ≥ 1 band's bucket matches — and at
    // hamming 4 the guarantee genuinely ENDS (one flip per band), which
    // is why the threshold sits at 3. Pin both directions.
    val a = 0x0123456789abcdefL
    val rnd = new scala.util.Random(11)
    def bandsOf(v: Long) = (0 until 4).map(band => (v >> (band * 16)) & 0xffff)
    for (_ <- 0 until 200; h <- 0 to 3) {
      var b = a
      rnd.shuffle((0 until 64).toList).take(h).foreach(i => b ^= 1L << i)
      assert(bandsOf(a).zip(bandsOf(b)).exists { case (x, y) => x == y },
        s"hamming-$h pair shared no band bucket")
    }
    assert(math.max(MediaDedup.DHashMaxHamming, MediaDedup.AudioMaxHamming) <= 3,
      "threshold exceeds the 4-band pigeonhole bound — pair set no longer exact")
    // the boundary case: one flip in EVERY band shares no bucket
    val b4 = a ^ 1L ^ (1L << 16) ^ (1L << 32) ^ (1L << 48)
    assert(!bandsOf(a).zip(bandsOf(b4)).exists { case (x, y) => x == y })
  }

  test("video container round-trips through the real sample-table walk") {
    val frames = MediaDedup.videoFramesFor(7L)
    val payload = MediaDedup.encodeVideoMp4(frames)
    val walked = graft.multimodal.Multimodal.sampleFrames(payload, every = 1)
    assert(walked.size == frames.length, "frame count drifted through the container")
    walked.foreach { case (idx, bytes) =>
      assert(bytes.length == MediaDedup.VFrameW * MediaDedup.VFrameH)
      assert(bytes.sameElements(frames(idx).map(_.toByte)),
        s"frame $idx bytes drifted through encode/walk")
    }
    // trimmed plants carry fewer frames but ALL fingerprint-sampled ones
    val trimmed = graft.multimodal.Multimodal.sampleFrames(
      MediaDedup.encodeVideoMp4(MediaDedup.videoFramesFor(4L)), every = 1)
    assert(trimmed.size == MediaDedup.VTrimFrames)
    assert(trimmed.size >= MediaDedup.VFpFrames)
  }

  test("video fingerprint separates: both plant classes near, unrelated far") {
    val hashes = (0L until 60L)
      .map(id => id -> MediaDedup.videoFingerprint(
        MediaDedup.encodeVideoMp4(MediaDedup.videoFramesFor(id)))).toMap
    // re-encoded plants (id ≡ 9): copy of id−1 with noise + banner
    Seq(9L, 19L, 29L, 39L, 49L, 59L).foreach { p =>
      val d = hamming(hashes(p), hashes(p - 1))
      assert(d <= MediaDedup.VideoMaxHamming, s"re-encoded plant $p at hamming $d")
    }
    // trimmed plants (id ≡ 4): tail-trim of id−3 + noise
    Seq(4L, 14L, 24L, 34L, 44L, 54L).foreach { p =>
      val d = hamming(hashes(p), hashes(p - 3))
      assert(d <= MediaDedup.VideoMaxHamming, s"trimmed plant $p at hamming $d")
    }
    val planted = (0L until 60L).flatMap { p =>
      if (p % 10 == 9) Some((p - 1, p))
      else if (p % 10 == 4) Some((p - 3, p))
      else None
    }.toSet
    val unrelated = for {
      a <- 0L until 60L; b <- a + 1 until 60L
      if !planted((a, b))
    } yield hamming(hashes(a), hashes(b))
    assert(unrelated.min > MediaDedup.VideoMaxHamming + 6,
      s"unrelated videos too close: min hamming ${unrelated.min}")
    assert(unrelated.sum.toDouble / unrelated.size > 24,
      "unrelated mean hamming should sit near the random expectation of 32")
  }

  test("q154 flags exactly the planted pairs (re-encoded AND trimmed) on the graded fixture") {
    val dir = "/root/testdata/sf0.001"
    val vid = MediaDedup.q154(spark, dir).collect()
    val want = (0L until MediaDedup.NVideos.toLong).flatMap { p =>
      if (p % 10 == 9) Some((p - 1, p))
      else if (p % 10 == 4) Some((p - 3, p))
      else None
    }.toSet
    assert(vid.map(r => (r.getLong(0), r.getLong(1))).toSet == want,
      "video dedup pair set != planted set (both classes)")
    // the re-encoded class lands at nonzero distance (the banner);
    // trimmed-tail copies may be hash-identical — that's their point
    assert(vid.exists(_.getInt(2) > 0), "video plants all hash-identical")
  }

  test("q156 incremental: exactly the cross-boundary plants, corpus pin amortized") {
    val dir = "/root/testdata/sf0.001"
    val rows = MediaDedup.q156(spark, dir).collect()
    val want = (9L until MediaDedup.NImages.toLong by 10L)
      .map(p => (p - 1, p)).toSet // sources even, plants odd — all cross
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet == want,
      "incremental pair set != cross-boundary planted set")
    // the q71 thesis on media: the corpus hash table is standing state —
    // a second batch probe must not add pins (rebuild) for the corpus
    val base = spark.sparkContext.getPersistentRDDs.size
    MediaDedup.q156(spark, dir).collect()
    assert(spark.sparkContext.getPersistentRDDs.size == base,
      "repeat incremental batch re-pinned the corpus")
  }

  test("q157 streaming form equals the q156 batch form (stream/batch parity)") {
    val dir = "/root/testdata/sf0.001"
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val batch = asSet(MediaDedup.q156(spark, dir))
    val stream = asSet(MediaDedup.q157(spark, dir))
    assert(stream == batch,
      s"streaming media dedup diverged from the batch twin: " +
        s"stream-only=${stream -- batch}, batch-only=${batch -- stream}")
    assert(stream.nonEmpty)
  }

  test("q150/q151 flag exactly the planted pairs on the graded fixture") {
    val dir = "/root/testdata/sf0.001"
    val img = MediaDedup.q150(spark, dir).collect()
    val aud = MediaDedup.q151(spark, dir).collect()
    val want = (9L until MediaDedup.NImages.toLong by 10L)
      .map(p => (p - 1, p)).toSet
    assert(img.map(r => (r.getLong(0), r.getLong(1))).toSet == want,
      "image dedup pair set != planted set")
    assert(aud.map(r => (r.getLong(0), r.getLong(1))).toSet == want,
      "audio dedup pair set != planted set")
    // and they are NEAR-dups, not byte-dups: some nonzero distances
    assert(img.exists(_.getInt(2) > 0), "image plants all hash-identical")
    assert(aud.exists(_.getInt(2) > 0), "audio plants all hash-identical")
  }
}
