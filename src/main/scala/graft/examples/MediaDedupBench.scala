package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sources the q150/q151 scale claims with measured numbers (the
  * SpanDedupBench/HnswBench discipline): generate a corpus of REAL
  * BMP / WAV payloads with the graded fixture's recipe (every 10th id
  * a planted near-duplicate of its predecessor), persist as parquet,
  * then measure the two pipeline stages separately:
  *
  *  1. hash — read blobs, decode (ImageIO / PCM), emit the 64-bit
  *     code: one narrow mapPartitions pass, the stage that must stay
  *     LINEAR in corpus size;
  *  2. pairs — 4×16 banded bucket join + exact hamming verify at the
  *     pigeonhole-exact threshold: the stage that must stay an
  *     equi-join (bucket occupancy ~n/65536 per band), never
  *     all-pairs.
  *
  * Asserts the planted pair count comes back exactly (n/10 pairs, no
  * false positives at the graded threshold) so the measured run is
  * also a correctness run. r15 adds the q154 VIDEO point: container
  * walk + temporal fingerprint over the ISO-BMFF fixture, both planted
  * classes (re-encoded AND tail-trimmed) recovered. Sizes via
  * GRAFT_MDD_IMAGES / GRAFT_MDD_AUDIO / GRAFT_MDD_VIDEOS (defaults
  * 100k / 200k / 50k).
  * Run: `sbt 'runMain graft.examples.MediaDedupBench'`.
  */
object MediaDedupBench {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  // the graded queries' own banded-hamming kernel — one definition,
  // so the bench measures exactly the shipped candidate discipline
  private def pairs(hashed: DataFrame, maxHamming: Int): DataFrame =
    graft.multimodal.MediaDedup.nearDupPairs(hashed, maxHamming)

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "graft-mdd-bench")
    import spark.implicits._
    val nImg = sys.env.getOrElse("GRAFT_MDD_IMAGES", "100000").toLong
    val nAud = sys.env.getOrElse("GRAFT_MDD_AUDIO", "200000").toLong
    val root = java.nio.file.Files.createTempDirectory("graft_mddbench_").toString

    // ---- images ------------------------------------------------------
    val (_, imgGenSec) = time {
      spark.range(nImg)
        .mapPartitions(_.map(id =>
          (id, graft.multimodal.MediaDedup.encodeBmp(
            graft.multimodal.MediaDedup.pixelsFor(id)))))
        .toDF("id", "payload")
        .write.parquet(s"$root/images")
    }
    val imgBytes = PqBenchDirBytes.dirBytes(s"$root/images")
    def imgHashes() = spark.read.parquet(s"$root/images")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        (id, graft.multimodal.MediaDedup.dhash(p)) })
      .toDF("id", "hash")
    imgHashes().write.format("noop").mode("overwrite").save() // warm
    val (_, imgHashSec) = time(
      imgHashes().write.format("noop").mode("overwrite").save())
    val hashedImg = imgHashes().persist()
    hashedImg.count()
    val (imgPairs, imgPairSec) = time(
      pairs(hashedImg, graft.multimodal.MediaDedup.DHashMaxHamming).count())
    val wantImg = nImg / 10
    // at this scale a small tail of plants drifts past the exact
    // threshold (the stamp + nudge usually flips ≤3 bits; rarely more)
    // — the threshold bounds the EMITTED pair set, not every retouch.
    // Zero false positives is the hard claim: every found pair must be
    // a planted (id−1, id ≡ 9 mod 10) pair.
    val imgFalse = pairs(hashedImg, graft.multimodal.MediaDedup.DHashMaxHamming)
      .where(!(col("id_b") === col("id_a") + 1 && col("id_b") % 10 === 9))
      .count()
    require(imgFalse == 0, s"image dedup emitted $imgFalse non-planted pairs")
    require(imgPairs >= (wantImg * 99) / 100,
      s"image dedup found $imgPairs of $wantImg planted pairs (<99%)")
    hashedImg.unpersist(blocking = false)

    // ---- audio -------------------------------------------------------
    val (_, audGenSec) = time {
      spark.range(nAud)
        .mapPartitions(_.map(id =>
          (id, graft.multimodal.MediaDedup.encodeWav(
            graft.multimodal.MediaDedup.samplesFor(id)))))
        .toDF("id", "payload")
        .write.parquet(s"$root/audio")
    }
    val audBytes = PqBenchDirBytes.dirBytes(s"$root/audio")
    def audHashes() = spark.read.parquet(s"$root/audio")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        (id, graft.multimodal.MediaDedup.audioFingerprint(p)) })
      .toDF("id", "hash")
    audHashes().write.format("noop").mode("overwrite").save() // warm
    val (_, audHashSec) = time(
      audHashes().write.format("noop").mode("overwrite").save())
    val hashedAud = audHashes().persist()
    hashedAud.count()
    val (audPairs, audPairSec) = time(
      pairs(hashedAud, graft.multimodal.MediaDedup.AudioMaxHamming).count())
    val wantAud = nAud / 10
    val audFalse = pairs(hashedAud, graft.multimodal.MediaDedup.AudioMaxHamming)
      .where(!(col("id_b") === col("id_a") + 1 && col("id_b") % 10 === 9))
      .count()
    require(audFalse == 0, s"audio dedup emitted $audFalse non-planted pairs")
    require(audPairs >= (wantAud * 99) / 100,
      s"audio dedup found $audPairs of $wantAud planted pairs (<99%)")
    hashedAud.unpersist(blocking = false)

    // ---- video (r15) ---------------------------------------------------
    // payloads are ~18 KB each (70 × 256-byte frames in the ISO-BMFF
    // shell), so the default corpus is smaller than audio's; the claim
    // is the same: container walk + fingerprint LINEAR and narrow,
    // candidates an equi-join, both planted classes recovered exactly.
    val nVid = sys.env.getOrElse("GRAFT_MDD_VIDEOS", "50000").toLong
    val (_, vidGenSec) = time {
      spark.range(nVid)
        .mapPartitions(_.map(id =>
          (id, graft.multimodal.MediaDedup.encodeVideoMp4(
            graft.multimodal.MediaDedup.videoFramesFor(id)))))
        .toDF("id", "payload")
        .write.parquet(s"$root/videos")
    }
    val vidBytes = PqBenchDirBytes.dirBytes(s"$root/videos")
    def vidHashes() = spark.read.parquet(s"$root/videos")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        (id, graft.multimodal.MediaDedup.videoFingerprint(p)) })
      .toDF("id", "hash")
    vidHashes().write.format("noop").mode("overwrite").save() // warm
    val (_, vidHashSec) = time(
      vidHashes().write.format("noop").mode("overwrite").save())
    val hashedVid = vidHashes().persist()
    hashedVid.count()
    val (vidPairs, vidPairSec) = time(
      pairs(hashedVid, graft.multimodal.MediaDedup.VideoMaxHamming).count())
    // both planted classes: re-encodes (id−1, id ≡ 9) + trims (id−3, id ≡ 4)
    val wantVid = (nVid / 10) * 2
    val vidFalse = pairs(hashedVid, graft.multimodal.MediaDedup.VideoMaxHamming)
      .where(!((col("id_b") === col("id_a") + 1 && col("id_b") % 10 === 9) ||
               (col("id_b") === col("id_a") + 3 && col("id_b") % 10 === 4)))
      .count()
    require(vidFalse == 0, s"video dedup emitted $vidFalse non-planted pairs")
    require(vidPairs >= (wantVid * 99) / 100,
      s"video dedup found $vidPairs of $wantVid planted pairs (<99%)")
    hashedVid.unpersist(blocking = false)

    println(f"images: $nImg%d BMPs ($imgBytes%d B at rest; gen $imgGenSec%.1f s one-off)")
    println(f"  decode+dhash (ImageIO, narrow):  $imgHashSec%6.2f s  (${nImg / imgHashSec}%.0f imgs/s)")
    println(f"  banded candidates + verify:      $imgPairSec%6.2f s  -> $imgPairs%d of $wantImg%d planted pairs, 0 false positives")
    println(f"audio: $nAud%d WAVs ($audBytes%d B at rest; gen $audGenSec%.1f s one-off)")
    println(f"  decode+fingerprint (PCM, narrow):$audHashSec%6.2f s  (${nAud / audHashSec}%.0f clips/s)")
    println(f"  banded candidates + verify:      $audPairSec%6.2f s  -> $audPairs%d of $wantAud%d planted pairs, 0 false positives")
    println(f"video: $nVid%d MP4s ($vidBytes%d B at rest; gen $vidGenSec%.1f s one-off)")
    println(f"  walk+fingerprint (BMFF, narrow): $vidHashSec%6.2f s  (${nVid / vidHashSec}%.0f vids/s)")
    println(f"  banded candidates + verify:      $vidPairSec%6.2f s  -> $vidPairs%d of $wantVid%d planted pairs (re-enc + trim), 0 false positives")
    spark.stop()
  }
}

/** dirBytes shared with PqBench's accounting. */
private[examples] object PqBenchDirBytes {
  def dirBytes(p: String): Long = {
    val f = new java.io.File(p)
    Option(f.listFiles()).map(_.map(x =>
      if (x.isDirectory) dirBytes(x.getPath) else x.length()).sum).getOrElse(0L)
  }
}
