package graft.pipeline

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("media table has binary payloads and typed metadata") {
    val m = Multimodal.mediaTable(spark, sf())
    val r = m.head()
    assert(r.payload.nonEmpty)
    assert(Set("image", "audio", "video").contains(r.kind))
    assert(r.width > 0 && r.height > 0)
  }

  test("feature extraction is deterministic and batch-shaped") {
    val m = Multimodal.mediaTable(spark, sf())
    val f1 = Multimodal.extractFeatures(m).collect().map(f => f.media_id -> f).toMap
    val f2 = Multimodal.extractFeatures(m).collect().map(f => f.media_id -> f).toMap
    assert(f1.keySet == f2.keySet)
    f1.foreach { case (id, f) =>
      assert(f.fake_embedding.length == 8)
      assert(f.n_bytes > 0)
      assert(f.byte_mean >= 0 && f.byte_mean <= 255)
      assert(f == f2(id))
    }
  }

  test("every document yields exactly one media row and one feature row") {
    val docs = graft.Tables(spark, sf()).documents.count()
    val m = Multimodal.mediaTable(spark, sf())
    assert(m.count() == docs)
    assert(Multimodal.extractFeatures(m).count() == docs)
  }
}
