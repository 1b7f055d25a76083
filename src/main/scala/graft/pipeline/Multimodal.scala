package graft.pipeline

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: image/audio/video
  * payloads are opaque `binary` columns with typed metadata; decode /
  * feature-extract runs batched per partition.
  *
  * The actual media decode is a STUB — the container has no image/audio
  * libraries — replaced by a deterministic fake (byte histogram + moments).
  * Everything Spark-side is real and tested: the schema, the binary payload
  * column, the partitioning (repartition by `kind` so one media type's decode
  * cost doesn't skew every partition), and the batched per-partition execution
  * shape (the Scala analog of `mapInPandas`: one iterator per partition, rows
  * streamed through without materializing the partition).
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, sample_rate: Int, n_frames: Int)

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      byte_mean: Double, byte_entropy_proxy: Double,
      fake_embedding: Seq[Float])

  /** Synthesize a media table from `documents` — payload = UTF-8 bytes of the
    * text (a deterministic stand-in for image/audio bytes), kind round-robin,
    * metadata derived from doc stats.
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables(spark, dir).documents
      .select(
        col("doc_id").as("media_id"),
        element_at(typedLit(Seq("image", "audio", "video")), (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("payload"),
        (col("n_chars") % 640 + 1).cast("int").as("width"),
        (col("n_chars") % 480 + 1).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (col("n_chars") % 30 + 1).cast("int").as("n_frames"))
      .as[MediaRow]
  }

  /** STUB decode: a real implementation would decode the payload with an
    * image/audio codec here; this deterministic fake extracts byte statistics
    * and an 8-dim pseudo-embedding so the pipeline shape is exercised
    * end-to-end. Runs per partition, streaming — the `mapInPandas` analog.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media
      .repartition(col("kind")) // co-locate each media type's decode batch
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.payload
          val n = bytes.length.toLong
          val mean = if (n == 0) 0.0 else bytes.map(b => (b & 0xff).toDouble).sum / n
          // entropy proxy: mean absolute successive byte delta
          val delta =
            if (n < 2) 0.0
            else bytes.sliding(2).map(p => math.abs((p(1) & 0xff) - (p(0) & 0xff)).toDouble).sum / (n - 1)
          val emb = Array.tabulate(8) { i =>
            var acc = 0L
            var j = i
            while (j < bytes.length) { acc = (acc * 31 + (bytes(j) & 0xff)) % 1000003L; j += 8 }
            acc.toFloat / 1000003f
          }
          MediaFeatures(r.media_id, r.kind, n, mean, delta, emb.toSeq)
        }
      }
  }

  final case class PngRow(media_id: Long, width: Int, height: Int, payload: Array[Byte])

  final case class DecodedStats(
      media_id: Long, width: Int, height: Int, n_pixels: Long,
      mean_luma: Double, resized_mean: Double)

  /** REAL media table for the image path: payload is an actual PNG encoded
    * with the JDK's ImageIO codec. Pixels are deterministic — gray value
    * `(media_id*7 + x*3 + y*5) mod 256` at (x,y) — so a SQL oracle can
    * recompute any pixel statistic from the formula alone, while the Spark
    * side must round-trip the bytes through a real encoder+decoder to get
    * them. Dimensions are kept small (≤79×62) so encode cost stays linear in
    * row count, not in document length.
    */
  def pngMediaTable(spark: SparkSession, dir: String): Dataset[PngRow] = {
    import spark.implicits._
    Tables(spark, dir).documents
      .filter(col("doc_id") % 3 === 0) // the "image" kind, as in mediaTable
      .select(
        col("doc_id").as("media_id"),
        (col("n_chars") % 64 + 16).cast("int").as("width"),
        (col("n_chars") % 48 + 15).cast("int").as("height"))
      .as[(Long, Int, Int)]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
        rows.map { case (id, w, h) =>
          val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = ((id * 7 + x * 3 + y * 5) % 256).toInt
              img.setRGB(x, y, (v << 16) | (v << 8) | v)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          PngRow(id, w, h, bos.toByteArray)
        }
      }
  }

  /** REAL decode: ImageIO parses the PNG payload back into pixels (no stub —
    * PNG is lossless, so the decoded raster is bit-identical to what the
    * encoder was handed, which is what makes a value oracle possible).
    * Emits the decoded mean gray level and the mean of a deterministic 8×6
    * nearest-neighbor resample taken FROM THE DECODED RASTER — i.e. the
    * resample arithmetic runs on real codec output, not on metadata.
    */
  def decodeImageFeatures(media: Dataset[PngRow]): Dataset[DecodedStats] = {
    import media.sparkSession.implicits._
    val (outW, outH) = (8, 6)
    media
      .repartition(col("media_id")) // spread decode work evenly by key
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          val (w, h) = (img.getWidth, img.getHeight)
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { sum += img.getRGB(x, y) & 0xff; x += 1 } // gray ⇒ blue channel
            y += 1
          }
          var rSum = 0L
          var oy = 0
          while (oy < outH) {
            var ox = 0
            while (ox < outW) {
              rSum += img.getRGB(ox * w / outW, oy * h / outH) & 0xff
              ox += 1
            }
            oy += 1
          }
          val n = w.toLong * h
          DecodedStats(r.media_id, w, h, n, sum.toDouble / n, rSum.toDouble / (outW * outH))
        }
      }
  }

  final case class ResizedRow(
      media_id: Long, width: Int, height: Int,
      out_w: Int, out_h: Int, payload: Array[Byte])

  /** STUB resize: a real implementation would decode + bilinear-resample
    * here; the stub honors the *plan* exactly — output buffer is
    * out_w × out_h × 3 deterministic bytes — so the Spark-side contract
    * (schema, per-partition batching, buffer sizing) is executed for real
    * and the oracle can audit the executed output's byte counts against
    * the integer resize arithmetic.
    */
  def resizeStub(media: Dataset[MediaRow], targetW: Int): Dataset[ResizedRow] = {
    import media.sparkSession.implicits._
    media
      .repartition(col("kind"))
      .mapPartitions { rows =>
        rows.map { r =>
          val outW = targetW
          val outH = math.max(1, r.height * targetW / r.width) // floor, aspect-preserving
          val buf = new Array[Byte](outW * outH * 3)
          var i = 0
          while (i < buf.length) { buf(i) = ((r.media_id * 31 + i) % 251).toByte; i += 1 }
          ResizedRow(r.media_id, r.width, r.height, outW, outH, buf)
        }
      }
  }

  val defs: Seq[QueryDef] = Seq(

    // ----- mm03: image-resize plumbing — the oracle recomputes the resize
    // arithmetic from the source metadata and must match the byte counts of
    // the stub's EXECUTED output buffers (kind == "image" ⇔ doc_id % 3 = 0).
    QueryDef.sql(
      "mm03_resize_plan",
      """SELECT doc_id AS media_id,
        |  CAST(n_chars % 640 + 1 AS BIGINT) AS width,
        |  CAST(n_chars % 480 + 1 AS BIGINT) AS height,
        |  CAST(224 AS BIGINT) AS out_w,
        |  CAST(greatest(1, ((n_chars % 480 + 1) * 224) // (n_chars % 640 + 1)) AS BIGINT) AS out_h,
        |  CAST(224 * greatest(1, ((n_chars % 480 + 1) * 224) // (n_chars % 640 + 1)) * 3 AS BIGINT) AS out_bytes
        |FROM documents WHERE doc_id % 3 = 0
        |ORDER BY media_id""".stripMargin,
    ) { (spark, dir) =>
      resizeStub(mediaTable(spark, dir).filter(col("kind") === "image"), targetW = 224)
        .toDF()
        .select(col("media_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("out_w").cast("long").as("out_w"),
          col("out_h").cast("long").as("out_h"),
          octet_length(col("payload")).cast("long").as("out_bytes"))
        .orderBy("media_id")
    },

    // ----- mm01: full multimodal pipeline — synthesize binary media, batched
    // feature extraction, per-kind rollup. The payload is the UTF-8 bytes of
    // `text` (all-ASCII in the testdata, byte i == ascii(char i)), so the
    // oracle recomputes the stub decode's byte statistics from the text:
    // per-doc sums are integer-valued (exact in double, order-free); the
    // per-kind averages go through exact DECIMAL(38,12) sums so partial-
    // aggregation order can't leak into the last ulp.
    QueryDef.sql(
      "mm01_media_features",
      """WITH bytes AS (
        |  SELECT doc_id, t.i, CAST(ascii(text[t.i:t.i]) AS BIGINT) AS v
        |  FROM documents, UNNEST(generate_series(1, length(text))) AS t(i)),
        |stats AS (
        |  SELECT doc_id, COUNT(*) AS n, CAST(SUM(v) AS DOUBLE) AS sv FROM bytes GROUP BY 1),
        |deltas AS (
        |  SELECT a.doc_id, CAST(SUM(ABS(b.v - a.v)) AS DOUBLE) AS sd
        |  FROM bytes a JOIN bytes b ON b.doc_id = a.doc_id AND b.i = a.i + 1 GROUP BY 1),
        |feat AS (
        |  SELECT s.doc_id,
        |    CASE s.doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |    s.n AS n_bytes,
        |    s.sv / s.n AS byte_mean,
        |    COALESCE(d.sd / (s.n - 1), 0) AS entropy
        |  FROM stats s LEFT JOIN deltas d ON d.doc_id = s.doc_id)
        |SELECT kind, COUNT(*) AS n_media, CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
        |  CAST(CAST(CAST(SUM(CAST(byte_mean AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS DECIMAL(18,6)) AS DOUBLE) AS avg_byte_mean,
        |  CAST(CAST(CAST(SUM(CAST(entropy AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS DECIMAL(18,6)) AS DOUBLE) AS avg_entropy_proxy
        |FROM feat GROUP BY 1 ORDER BY kind""".stripMargin,
    ) { (spark, dir) =>
      val feats = extractFeatures(mediaTable(spark, dir))
      feats.toDF()
        .groupBy("kind")
        .agg(
          count(lit(1)).as("n_media"),
          sum("n_bytes").as("total_bytes"),
          // exact decimal sum (order-free), then a 6-decimal rounding that
          // absorbs the engines' 1-ulp decimal→double cast divergence
          (sum(col("byte_mean").cast("decimal(38,12)")).cast("double") / count(lit(1)))
            .cast("decimal(18,6)").cast("double").as("avg_byte_mean"),
          (sum(col("byte_entropy_proxy").cast("decimal(38,12)")).cast("double") / count(lit(1)))
            .cast("decimal(18,6)").cast("double").as("avg_entropy_proxy"))
        .orderBy("kind")
    },

    // ----- mm04: REAL image decode — payload is an actual ImageIO-encoded
    // PNG; the query decodes it with the real codec and reports pixel stats
    // plus an 8×6 nearest-neighbor resample computed from the decoded raster.
    // The oracle replays the deterministic pixel formula
    // (media_id*7 + x*3 + y*5) mod 256 in pure SQL — it can only match if the
    // encode→decode round trip through the codec is lossless and correct.
    QueryDef.sql(
      "mm04_real_image_decode",
      """WITH imgs AS (
        |  SELECT doc_id AS media_id,
        |    CAST(n_chars % 64 + 16 AS BIGINT) AS w,
        |    CAST(n_chars % 48 + 15 AS BIGINT) AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        |px AS (
        |  SELECT i.media_id, i.w, i.h,
        |    SUM((i.media_id * 7 + x.x * 3 + y.y * 5) % 256) AS luma_sum
        |  FROM imgs i,
        |    UNNEST(generate_series(0, i.w - 1)) AS x(x),
        |    UNNEST(generate_series(0, i.h - 1)) AS y(y)
        |  GROUP BY 1, 2, 3),
        |rs AS (
        |  SELECT i.media_id,
        |    SUM((i.media_id * 7 + ((ox.ox * i.w) // 8) * 3 + ((oy.oy * i.h) // 6) * 5) % 256) AS r_sum
        |  FROM imgs i,
        |    UNNEST(generate_series(0, 7)) AS ox(ox),
        |    UNNEST(generate_series(0, 5)) AS oy(oy)
        |  GROUP BY 1)
        |SELECT p.media_id, p.w AS width, p.h AS height,
        |  p.w * p.h AS n_pixels,
        |  CAST(p.luma_sum AS DOUBLE) / (p.w * p.h) AS mean_luma,
        |  CAST(r.r_sum AS DOUBLE) / 48 AS resized_mean
        |FROM px p JOIN rs r ON r.media_id = p.media_id
        |ORDER BY p.media_id""".stripMargin,
    ) { (spark, dir) =>
      decodeImageFeatures(pngMediaTable(spark, dir))
        .toDF()
        .select(col("media_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_pixels"),
          col("mean_luma"),
          col("resized_mean"))
        .orderBy("media_id")
    },

    // ----- mm02: frame sampling — explode video metadata into per-frame rows
    // (the schema/partitioning shape of a frame-extraction stage; frame decode
    // itself would slot into extractFeatures' stub). Pure integer arithmetic
    // over the documents-derived metadata ⇒ DuckDB mirrors the explode with
    // generate_series (kind == "video" ⇔ doc_id % 3 = 2; n_frames = n_chars % 30 + 1).
    QueryDef.sql(
      "mm02_frame_sample",
      """SELECT doc_id AS media_id,
        |  COUNT(*) AS sampled_frames,
        |  CAST(MAX(f.frame_no) AS BIGINT) AS last_frame
        |FROM documents, UNNEST(generate_series(0, n_chars % 30)) AS f(frame_no)
        |WHERE doc_id % 3 = 2 AND f.frame_no % 5 = 0
        |GROUP BY 1 ORDER BY media_id""".stripMargin,
    ) { (spark, dir) =>
      val media = mediaTable(spark, dir).toDF()
      media.filter(col("kind") === "video")
        .select(col("media_id"), col("n_frames"),
          explode(sequence(lit(0), col("n_frames") - 1)).as("frame_no"))
        // sample every 5th frame, deterministic
        .filter(col("frame_no") % 5 === 0)
        .groupBy("media_id")
        .agg(count(lit(1)).as("sampled_frames"),
          max("frame_no").cast("long").as("last_frame"))
        .orderBy("media_id")
    },
  )
}
