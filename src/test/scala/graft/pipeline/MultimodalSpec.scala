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

  test("png payloads are real PNGs and the codec round trip is lossless") {
    val rows = Multimodal.pngMediaTable(spark, sf()).limit(3).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // PNG magic bytes prove a real encoder ran, not a byte-stat stub
      assert((r.payload(0) & 0xff) == 0x89 && r.payload(1) == 'P' && r.payload(2) == 'N' && r.payload(3) == 'G')
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      assert(img.getWidth == r.width && img.getHeight == r.height)
      // decoded pixel equals the generating formula at a few probe points
      for ((x, y) <- Seq((0, 0), (r.width - 1, r.height - 1), (r.width / 2, r.height / 3))) {
        val expect = ((r.media_id * 7 + x * 3 + y * 5) % 256).toInt
        assert((img.getRGB(x, y) & 0xff) == expect, s"pixel ($x,$y) of media ${r.media_id}")
      }
    }
  }

  test("decoded stats match hand-computed values for one image") {
    val one = Multimodal.pngMediaTable(spark, sf()).limit(1)
    val s = Multimodal.decodeImageFeatures(one).head()
    val vals = for (y <- 0 until s.height; x <- 0 until s.width)
      yield ((s.media_id * 7 + x * 3 + y * 5) % 256).toDouble
    assert(s.n_pixels == s.width.toLong * s.height)
    assert(math.abs(s.mean_luma - vals.sum / vals.size) < 1e-12)
    val rvals = for (oy <- 0 until 6; ox <- 0 until 8)
      yield ((s.media_id * 7 + (ox * s.width / 8) * 3 + (oy * s.height / 6) * 5) % 256).toDouble
    assert(math.abs(s.resized_mean - rvals.sum / rvals.size) < 1e-12)
  }
}
