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

  test("real resize round trip matches an independent fixed-point bilinear") {
    val one = Multimodal.pngMediaTable(spark, sf()).limit(2)
    val resized = Multimodal.realResize(one, targetW = 16).collect()
    assert(resized.nonEmpty)
    resized.foreach { r =>
      // output is itself a real PNG, not a raw buffer
      assert((r.payload(0) & 0xff) == 0x89 && r.payload(1) == 'P')
    }
    val stats = Multimodal.resizedStats(Multimodal.realResize(one, targetW = 16))
      .collect().map(s => s.media_id -> s).toMap
    one.collect().foreach { src =>
      val (w, h) = (src.width, src.height)
      val ow = 16
      val oh = math.max(2, h * ow / w)
      def pix(x: Long, y: Long): Long = (src.media_id * 7 + x * 3 + y * 5) % 256
      var sum = 0L; var chk = 0L
      for (oy <- 0 until oh; ox <- 0 until ow) {
        val fx = ox.toLong * (w - 1) * 65536L / (ow - 1)
        val fy = oy.toLong * (h - 1) * 65536L / (oh - 1)
        val (x0, dx) = (fx / 65536, fx % 65536)
        val (y0, dy) = (fy / 65536, fy % 65536)
        val (x1, y1) = (math.min(x0 + 1, w - 1L), math.min(y0 + 1, h - 1L))
        val top = pix(x0, y0) * (65536 - dx) + pix(x1, y0) * dx
        val bot = pix(x0, y1) * (65536 - dx) + pix(x1, y1) * dx
        val g = (top * (65536 - dy) + bot * dy) / 4294967296L
        sum += g
        chk += g * (oy.toLong * ow + ox + 1)
      }
      val s = stats(src.media_id)
      assert(s.out_w == ow && s.out_h == oh, s"dims of media ${src.media_id}")
      assert(s.resized_sum == sum, s"sum of media ${src.media_id}")
      assert(s.checksum == chk, s"checksum of media ${src.media_id}")
    }
  }

  test("wav payloads are real RIFF/WAVE files and the codec decodes the formula") {
    val rows = Multimodal.wavMediaTable(spark, sf()).limit(3).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // RIFF....WAVE magic proves a real container writer ran
      assert(new String(r.payload, 0, 4, "US-ASCII") == "RIFF")
      assert(new String(r.payload, 8, 4, "US-ASCII") == "WAVE")
      val fmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(r.payload))
      assert(fmt.getFormat.getSampleRate == 8000f)
      assert(fmt.getFormat.getSampleSizeInBits == 8)
    }
    val stats = Multimodal.decodeAudioStats(
      Multimodal.wavMediaTable(spark, sf()).limit(3))
      .collect().map(s => s.media_id -> s).toMap
    rows.foreach { r =>
      val s = stats(r.media_id)
      assert(s.n_samples == r.n_samples)
      val expSum = (0 until r.n_samples).map(i => (r.media_id * 11 + i * 13) % 256).sum
      assert(s.sample_sum == expSum, s"sample sum of media ${r.media_id}")
    }
  }

  test("video payload demuxes at true PNG boundaries and every frame decodes") {
    val one = Multimodal.videoMediaTable(spark, sf()).limit(2).collect()
    assert(one.nonEmpty)
    one.foreach { v =>
      val frames = Multimodal.splitPngFrames(v.payload)
      assert(frames.size == v.n_frames, s"frame count of media ${v.media_id}")
      // reassembling the split frames must reproduce the payload byte-exactly
      assert(java.util.Arrays.equals(frames.flatMap(_.toSeq).toArray, v.payload))
      frames.zipWithIndex.foreach { case (bytes, f) =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        assert(img.getWidth == 8 && img.getHeight == 6)
        val expect = ((v.media_id * 7 + f * 17) % 256).toInt // pixel (0,0)
        assert((img.getRGB(0, 0) & 0xff) == expect, s"frame $f of media ${v.media_id}")
      }
    }
  }

  test("mm08: aHash matches a formula recompute; buckets and flags are consistent") {
    val r = graft.Catalog.byName("mm08_perceptual_hash_dedup").build(spark, sf()).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getBoolean(4)))
    assert(r.nonEmpty)
    // independent recompute straight from the pixel FORMULA (never decoding):
    // a match proves the engine's decode->sample->threshold->pack pipeline
    val dims = graft.Tables(spark, sf()).documents
      .filter(org.apache.spark.sql.functions.expr("doc_id % 3 = 0"))
      .selectExpr("doc_id", "n_chars % 64 + 16 AS w", "n_chars % 48 + 15 AS h")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    r.foreach { case (id, hi, lo, _, _) =>
      val (w, h) = dims(id)
      val s = Array.tabulate(64) { k =>
        val x = ((k % 8) * w) / 8; val y = ((k / 8) * h) / 8
        (id * 7 + x * 3 + y * 5) % 256
      }
      val sum = s.sum
      var ehi = 0L; var elo = 0L
      for (k <- 0 until 64 if 64L * s(k) > sum)
        if (k < 32) elo |= 1L << k else ehi |= 1L << (k - 32)
      assert(hi == ehi && lo == elo, s"media $id hash mismatch")
    }
    // bucket bookkeeping: size equals the actual same-hash group size
    val groups = r.groupBy(x => (x._2, x._3))
    r.foreach { case (id, hi, lo, bs, nd) =>
      assert(bs == groups((hi, lo)).length.toLong, s"media $id bucket size")
      assert(nd == (bs > 1), s"media $id flag")
    }
  }

  test("pp04: chain gates discriminate, dedup keeps bucket minima, roster matches export") {
    import org.apache.spark.sql.functions._
    val roster = Multimodal.multimodalChain(spark, sf())
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(roster.nonEmpty && roster.forall(_._4.length == 32))
    val keptByKind = roster.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val imgTotal = Multimodal.pngMediaTable(spark, sf()).count()
    val audTotal = Multimodal.wavMediaTable(spark, sf()).count()
    // the gate bands must discriminate at this sf: kept non-empty AND below
    // the per-kind total (pp04's constants are pinned by this assertion)
    assert(keptByKind("img") > 0 && keptByKind("img") < imgTotal,
      s"image gate degenerate: ${keptByKind("img")} of $imgTotal")
    assert(keptByKind("aud") > 0 && keptByKind("aud") < audTotal,
      s"audio gate degenerate: ${keptByKind("aud")} of $audTotal")
    // dedup stage contract: every exported media_id is the minimum of its
    // signature bucket per the independently-computed mm08 hashes
    val out = s"target/export_pp04_${math.abs(sf().hashCode)}"
    val back = spark.read
      .schema("media_id BIGINT, sig_hi BIGINT, sig_lo BIGINT, kind STRING, shard BIGINT")
      .json(out)
    val imgKept = back.filter(col("kind") === "img")
      .select("media_id", "sig_hi", "sig_lo")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mm08 = graft.Catalog.byName("mm08_perceptual_hash_dedup").build(spark, sf())
      .select("media_id", "hash_hi", "hash_lo")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val bucketMin = mm08.groupBy(r => (r._2, r._3)).view.mapValues(_.map(_._1).min).toMap
    imgKept.foreach { case (id, hi, lo) =>
      assert(bucketMin((hi, lo)) == id, s"exported image $id is not its bucket's first-seen")
    }
  }
}
