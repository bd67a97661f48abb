package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

class MultimodalSpec extends AnyFunSuite {
  implicit lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rows = Seq(
    MediaRow(1L, "image/png", "fake-png-bytes".getBytes),
    MediaRow(2L, "audio/wav", "fake-wav".getBytes),
    MediaRow(3L, "video/mp4", "fake-video-content".getBytes),
    MediaRow(4L, "image/png", Array.emptyByteArray))

  test("feature extraction is partition-parallel, batched, deterministic") {
    val ds = spark.createDataset(rows).repartition(3)
    val a = Multimodal.extractFeatures(ds, batchSize = 2).collect()
      .sortBy(_.media_id)
    val b = Multimodal.extractFeatures(ds, batchSize = 64).collect()
      .sortBy(_.media_id)
    assert(a.map(_.embedding.toSeq).toSeq === b.map(_.embedding.toSeq).toSeq,
      "batch size must not change results")
    assert(a.forall(_.embedding.length === 16))
    assert(a.find(_.media_id == 4L).get.width === 0, "empty content → zero dims")
    assert(a.find(_.media_id == 3L).get.n_frames > 1, "video gets frames")
  }

  test("frame sampling explodes only video rows beyond frame 0") {
    val ds = spark.createDataset(rows)
    val feats = Multimodal.extractFeatures(ds)
    val frames = Multimodal.sampleFrames(feats, stride = 30)
    val byId = frames.groupBy("media_id").count()
      .as[(Long, Long)].collect().toMap
    assert(byId(1L) === 1L && byId(2L) === 1L)
    assert(byId(3L) >= 1L)
  }

  test("documents wrap into a media table with mixed mime types") {
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val media = Multimodal.mediaFromDocuments(docs)
    val mimes = media.toDF().groupBy("mime").count()
      .as[(String, Long)].collect().toMap
    assert(mimes.keySet === Set("image/png", "audio/wav", "video/mp4"))
    assert(mimes.values.sum === docs.count())
  }
}
