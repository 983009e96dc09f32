package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.types.BinaryType
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: binary columns stay binary end-to-end, the
  * partition-local transforms are deterministic, and frame sampling /
  * resize respect their bounds. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("media table carries a genuine binary payload column") {
    val media = Multimodal.mediaTable(spark, TestSession.Sf)
    assert(media.schema("bytes").dataType == BinaryType)
    assert(media.count() > 0)
  }

  test("feature extraction is deterministic and partition-independent") {
    val media = Multimodal.mediaTable(spark, TestSession.Sf)
    val once = Multimodal.extractFeatures(media).collect().toSet
    val again = Multimodal.extractFeatures(media.repartition(7)).collect().toSet
    assert(once == again)
    assert(once.nonEmpty)
    // histogram counts per media must sum to payload length
    val byMedia = once.groupBy(_.media_id)
      .map { case (id, fs) => id -> fs.map(_.cnt).sum }
    val lengths = media.selectExpr("media_id", "length(bytes) AS len")
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    byMedia.foreach { case (id, total) => assert(total == lengths(id)) }
  }

  test("frame sampling emits bounded in-order offsets") {
    val media = Multimodal.mediaTable(spark, TestSession.Sf)
    val frames = Multimodal.sampleFrames(media, everyK = 32).collect()
    assert(frames.nonEmpty)
    frames.groupBy(_.media_id).foreach { case (_, fs) =>
      val sorted = fs.sortBy(_.frame_idx)
      assert(sorted.map(_.offset).toSeq ==
        sorted.indices.map(_ * 32L).toSeq)
    }
  }

  test("fake resize bounds payload size") {
    val b = Array.tabulate(100)(_.toByte)
    assert(Multimodal.FakeCodec.resize(b, 6, 8).length == 48)
    assert(Multimodal.FakeCodec.resize(b, 20, 20).length == 100)
  }
}
