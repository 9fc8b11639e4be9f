package graft.multimodal

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class MultimodalSpec extends SparkSpec {

  private lazy val media =
    Multimodal.mediaFromDocuments(
      Tables.documents(spark, "/root/testdata/sf0.001"))

  test("media table schema: binary payload + typed metadata struct") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    assert(media.count() == 500)
  }

  test("resize scales oversize images down, passes everything else through") {
    val resized = Multimodal.resize(media, 320, 240).collect()
      .map(r => r.media_id -> r).toMap
    val before = media.select(col("media_id"), col("kind"),
      length(col("payload")), col("meta.width"), col("meta.height")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(resized.size == before.length)
    var shrunk = 0
    before.foreach { case (id, kind, plen, w, h) =>
      val r = resized(id)
      if (kind != "image" || (w <= 320 && h <= 240)) {
        assert(r.meta.width == w && r.meta.height == h &&
          r.payload.length == plen, s"media $id must pass through")
      } else {
        shrunk += 1
        assert(r.meta.width <= 320 && r.meta.height <= 240,
          s"media $id not within bounds: ${r.meta}")
        assert(r.payload.length < plen, s"media $id payload must shrink")
        // aspect ratio preserved within integer-floor tolerance
        val scale = math.min(320.0 / w, 240.0 / h)
        assert(r.meta.width == math.max(1, math.floor(w * scale).toInt))
        assert(r.meta.height == math.max(1, math.floor(h * scale).toInt))
      }
    }
    assert(shrunk > 0, "fixture should include oversize images")
  }

  test("feature extraction is batched, deterministic, and normalized") {
    val feats = Multimodal.extractFeatures(media)
    val rows = feats.collect()
    assert(rows.length == 500)
    assert(rows.forall(_.feature_dim == 16))
    // L1 normalization: histogram sums to 1 for non-empty payloads
    assert(rows.forall(r => math.abs(r.features.sum - 1.0f) < 1e-3))
    // deterministic: same input → same checksum on re-run
    val again = Multimodal.extractFeatures(media).collect()
    assert(rows.sortBy(_.media_id).map(_.checksum)
      .sameElements(again.sortBy(_.media_id).map(_.checksum)))
  }

  test("frame sampling explodes offsets within duration") {
    val frames = Multimodal.sampleFrames(media, everyMs = 500L)
    val one = frames.where(col("media_id") === 2).collect()
    val dur = media.where(col("media_id") === 2)
      .select(col("meta.duration_ms")).collect()(0).getLong(0)
    assert(one.length == (dur / 500 + 1).toInt)
    assert(one.map(_.getAs[Long]("offset_ms")).max <= dur)
  }

  test("formatSize renders decimal and binary units") {
    import graft.reports.Reports
    assert(Reports.formatSize(512) == "512 B")
    assert(Reports.formatSize(1500) == "1.5 KB")
    assert(Reports.formatSize(1536, binary = true) == "1.5 KiB")
    assert(Reports.formatSize(2L * 1000 * 1000 * 1000) == "2.0 GB")
  }

  test("perceptual hash: distributed signature equals a driver replay") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).limit(50)
      .as[(Long, String)].collect()
    val got = docs.toSeq.toDF("media_id", "text")
      .select(col("media_id"), Multimodal.perceptualCells(col("text")).as("g"))
      .select(col("media_id"), Multimodal.dhashFromCells(col("g")).as("sig"))
      .as[(Long, Long)].collect().toMap
    def replay(text: String): Long = {
      // CODE POINTS, not chars: Spark length/substr/ascii count code
      // points, so a charAt replay would split surrogate pairs on any
      // non-BMP character (the BPE code-point rule)
      val n = text.codePointCount(0, text.length)
      val g = (0 to 63).map { i =>
        val pos = math.floor(i.toDouble * (n - 1) / 63.0).toInt
        if (n == 0) 0
        else text.codePointAt(text.offsetByCodePoints(0, pos))
      }
      (0 to 62).foldLeft(0L) { (acc, i) =>
        acc + (if (g(i) > g(i + 1)) 1L << i else 0L)
      }
    }
    docs.foreach { case (id, t) =>
      assert(got(id) == replay(t), s"media $id")
    }
  }

  test("perceptual near-dup: one changed byte stays within Hamming 2") {
    import spark.implicits._
    val long = ("alpha beta gamma delta " * 8).trim // > 64 chars
    val twin = long.dropRight(1) + "z"
    val far = "totally different content that resamples elsewhere " * 4
    val df = Seq((1L, long), (2L, twin), (3L, far.trim))
      .toDF("media_id", "text")
    val pairs = Multimodal.perceptualNearDups(df, "text", "media_id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(pairs.head._3 <= 2, s"hamming ${pairs.head._3}")
  }

  test("banding finds every pair within the threshold, each emitted once") {
    import spark.implicits._
    // identical payloads: hamming 0, all four chunks agree — the
    // first-agreeing-chunk rule must emit the pair exactly once
    val df = Seq((1L, "same payload body here"), (2L, "same payload body here"))
      .toDF("media_id", "text")
    val pairs = Multimodal.perceptualNearDups(df, "text", "media_id", 3)
      .collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(2) == 0L)
  }

  private def grayImage(w: Int, h: Int)(f: (Int, Int) => Int) = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = f(x, y) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def encoded(img: java.awt.image.BufferedImage, fmt: String) = {
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, baos), s"no $fmt writer")
    baos.toByteArray
  }

  test("JDK decoder: 8x8 luma dHash pairs re-encodes and watermarks, not distinct images") {
    import spark.implicits._
    // horizontal ramp with mild texture: adjacent 8x8 cells differ by
    // ~32 luma, so every dHash comparison has a wide margin
    val base = grayImage(64, 64)((x, y) => x * 4 + (y % 3))
    // lossy RE-ENCODE: decode the PNG, write as JPEG — pixels change,
    // the thumbnail barely moves
    val reenc = encoded(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(encoded(base, "png"))), "jpg")
    // one-BLOCK corner watermark: touches cell (0,0) only, which
    // participates in exactly one dHash comparison -> hamming <= 1
    val marked = grayImage(64, 64)((x, y) =>
      if (x < 8 && y < 8) 255 else x * 4 + (y % 3))
    // distinct image: vertical ramp — within-row cells tie, so its
    // dHash is nearly empty while the base's is dense
    val distinct = grayImage(64, 64)((x, y) => y * 4)
    val media = Seq(
      (1L, encoded(base, "png")), (2L, reenc),
      (3L, encoded(marked, "png")), (4L, encoded(distinct, "png")),
      (5L, "not an image at all".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    // non-image payloads drop from the signature frame, not poison it
    val sigs = Multimodal.decodedSignatures(media, "payload", "media_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs.keySet == Set(1L, 2L, 3L, 4L))
    assert(sigs.values.forall(_ >= 0L), "sign bit must stay clear")
    val pairs = Multimodal.perceptualNearDupsDecoded(
        media, "payload", "media_id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // the near-dup cluster {base, reencode, watermark} pairs fully;
    // the distinct image and the undecodable payload pair with nothing
    assert(pairs.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"pairs: $pairs, sigs: $sigs")
    assert(pairs((1L, 3L)) <= 1L, "single-cell watermark moves <= 1 bit")
    // decoded signatures replay driver-side through the same kernel
    val replay = Multimodal.luma8x8(encoded(base, "png"))
      .map(Multimodal.dhashOfLuma).get
    assert(sigs(1L) == replay)
  }

  test("renderGray8x8 roundtrips exactly through the JDK codec") {
    // the PNG is lossless and gray luma = the pixel value, so decode
    // returns precisely the clamped integers — the invariant the
    // q_media_neardup_decoded oracle replays from the raw vectors
    val vec = Array.tabulate(64)(i => (i - 32) / 16.0) // spans clamps
    val png = Multimodal.renderGray8x8(vec)
    assert(png.length > 8 &&
      (png.take(4).map(_ & 0xff).toSeq == Seq(0x89, 'P'.toInt, 'N'.toInt,
        'G'.toInt)), "must be a real PNG")
    val cells = Multimodal.luma8x8(png).get
    val want = vec.map(x =>
      math.min(255, math.max(0, math.floor(x * 128.0).toInt + 128)))
    assert(cells.sameElements(want),
      s"${cells.toSeq} vs ${want.toSeq}")
    assert(want.min == 0 && want.max == 255, "fixture must exercise clamps")
  }

  test("metadata-only query prunes the payload column from the scan") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-media").toString
    media.write.mode("overwrite").parquet(tmp)
    val stats = Multimodal.metadataStats(spark.read.parquet(tmp))
    val plan = stats.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("payload"),
      s"payload column must be pruned from scan:\n$plan")
    assert(stats.collect().map(_.getAs[Long]("n_media")).sum == 500)
  }
}
