package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("binary payload round-trips through the media schema") {
    val m = Multimodal.syntheticMedia(spark, dir)
    val first = m.filter(_.media_id == 0).collect().head
    assert(new String(first.payload, "UTF-8").nonEmpty)
    assert(Set("image", "audio", "video").contains(first.kind))
    assert(first.meta.contains("source") && first.meta.contains("lang"))
  }

  test("feature extraction is deterministic, typed, and narrow") {
    val media = Multimodal.syntheticMedia(spark, dir)
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.forall(f => f.width >= 160 && f.height >= 120 && f.aspect > 0))
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
