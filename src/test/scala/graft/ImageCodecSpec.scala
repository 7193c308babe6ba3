package graft

import graft.dedup.Dedup
import graft.multimodal.{ImageCodec, Multimodal}
import org.apache.spark.sql.functions._

/** The REAL image codec (javax.imageio) and its wiring into the multimodal
  * pipeline: header decode, resample, perceptual dHash, and the pigeonhole
  * near-dup over dHash values (q89/q90/q91's machinery).
  */
class ImageCodecSpec extends SparkSpec {

  test("decodeMeta reads gray PNG header: dims, single band, format") {
    val png = ImageCodec.renderGrayPng(seed = 7L, w = 23, h = 11)
    assert(ImageCodec.decodeMeta(png) === Some((23, 11, 1, "png")))
  }

  test("decodeMeta returns None for bytes no reader claims") {
    assert(ImageCodec.decodeMeta("just some text".getBytes("UTF-8")) === None)
    assert(ImageCodec.decodeMeta(Array.emptyByteArray) === None)
    assert(ImageCodec.decodeMeta(null) === None)
  }

  test("decodeMeta reports 3 bands for an RGB PNG (not a hardcoded fallback)") {
    val img = new java.awt.image.BufferedImage(5, 4, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    img.setRGB(1, 1, 0x336699)
    val png = ImageCodec.encodePng(img)
    assert(ImageCodec.decodeMeta(png) === Some((5, 4, 3, "png")))
  }

  test("resize: bilinear resample hits target dims and gray stays gray") {
    val png = ImageCodec.renderGrayPng(seed = 3L, w = 40, h = 30)
    val out = ImageCodec.resize(png, 16, 12).get
    assert(ImageCodec.decodeMeta(out) === Some((16, 12, 1, "png")))
  }

  test("resize of undecodable bytes is None") {
    assert(ImageCodec.resize("nope".getBytes("UTF-8"), 8, 8) === None)
  }

  test("JPEG encode flattens alpha onto WHITE, not uninitialized black") {
    val img = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    // fully transparent everywhere: flattened JPEG must come back light
    val jpg = ImageCodec.encode(img, "jpeg")
    val back = ImageCodec.decode(jpg).get
    val rgb = back.getRGB(2, 2)
    val luma = (77 * ((rgb >> 16) & 0xFF) + 150 * ((rgb >> 8) & 0xFF) + 29 * (rgb & 0xFF)) >> 8
    assert(luma > 200, s"transparent pixel flattened to luma $luma — black background leak")
  }

  test("dHash64 is invariant to saturation-free brightness shift, and exact hashes are not") {
    val png = ImageCodec.renderGrayPng(seed = 11L, w = 32, h = 24) // samples in [30, 200]
    val bright = ImageCodec.brighten(png, 40).get                  // 200+40=240 < 255: no clamp
    assert(ImageCodec.dHash64(png) === ImageCodec.dHash64(bright))
    assert(!java.util.Arrays.equals(png, bright))
  }

  test("dHash64 invariance precondition: clamping CAN flip bits (documented)") {
    // near-saturated fixture: lo=240, +40 clamps most samples to 255 and
    // flattens gradients — this is exactly the advice's counterexample, so
    // assert the DOCUMENTED behavior (hashes may differ; here they do)
    val png = ImageCodec.renderGrayPng(seed = 11L, w = 32, h = 24, lo = 240, hi = 255)
    val bright = ImageCodec.brighten(png, 40).get
    assert(ImageCodec.dHash64(png) !== ImageCodec.dHash64(bright))
  }

  test("q90's floor: the 40 base images are pairwise > 4 hamming bits apart") {
    val hashes = (0 until 40).map { s =>
      ImageCodec.dHash64(ImageCodec.renderGrayPng(s.toLong, 32, 24)).get
    }
    val minHam = (for {
      i <- 0 until 40; j <- (i + 1) until 40
    } yield java.lang.Long.bitCount(hashes(i) ^ hashes(j))).min
    assert(minHam > 4, s"cross-base dHash floor $minHam — q90's maxHamming=4 would cross-match")
  }

  test("decodeImageMeta uses the real codec for image payloads, stub for the rest") {
    import spark.implicits._
    val df = Seq((1L, ImageCodec.renderGrayPng(5L, 19, 9)), (2L, "not an image".getBytes("UTF-8")))
      .toDF("id", "img_bytes")
    val metas = Multimodal.decodeImageMeta(df, "img_bytes")
      .select($"id", $"meta.width", $"meta.height", $"meta.channels", $"meta.format")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))))
      .toMap
    assert(metas(1L) === ((19, 9, 1, "png")))
    val stubLen = "not an image".getBytes("UTF-8").length
    assert(metas(2L) === ((stubLen % 1019 + 1, (stubLen * 31) % 761 + 1, 3, "fake")))
  }

  test("resizeTo resamples decodable payloads and nulls undecodable ones") {
    import spark.implicits._
    val df = Seq((1L, ImageCodec.renderGrayPng(5L, 40, 30)), (2L, "garbage".getBytes("UTF-8")))
      .toDF("id", "img_bytes")
    val out = Multimodal.resizeTo(df, "img_bytes", "resized", 10, 8)
      .select($"id", $"resized").collect()
      .map(r => r.getLong(0) -> Option(r.getAs[Array[Byte]](1))).toMap
    assert(ImageCodec.decodeMeta(out(1L).get) === Some((10, 8, 1, "png")))
    assert(out(2L).isEmpty)
  }

  test("imageDHash + nearDupPairsHash64: brightened twins pair up, strangers don't") {
    import spark.implicits._
    val rows = (0L until 20L).map { id =>
      val base = ImageCodec.renderGrayPng(id % 5, 32, 24)
      val bytes = if (id % 2 == 1) ImageCodec.brighten(base, 25).get else base
      (id, bytes)
    }
    val hashed = Multimodal.imageDHash(rows.toDF("id", "img_bytes"), "img_bytes")
    val pairs = Dedup.nearDupPairsHash64(hashed, "id", "dhash", maxHamming = 4)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val expected = (for {
      a <- 0L until 20L; b <- (a + 1) until 20L; if a % 5 == b % 5
    } yield (a, b)).toSet
    assert(pairs === expected)
  }

  test("animated GIF round trip: frame count and dimensions survive encode/decode") {
    val frames = (0 until 5).map(i => ImageCodec.decode(ImageCodec.renderGrayPng(i.toLong, 20, 10)).get)
    val gif = ImageCodec.encodeAnimatedGif(frames)
    val back = ImageCodec.decodeGifFrames(gif).get
    assert(back.length === 5)
    assert(back.forall(f => f.getWidth == 20 && f.getHeight == 10))
    // non-GIF payloads are None, even decodable single-frame PNGs
    assert(ImageCodec.decodeGifFrames(ImageCodec.renderGrayPng(1L, 8, 8)) === None)
    assert(ImageCodec.decodeGifFrames("text".getBytes("UTF-8")) === None)
  }

  test("sampleGifFrames: short clips keep all frames, long clips 4 evenly spaced; non-GIF null") {
    import spark.implicits._
    val shortGif = ImageCodec.encodeAnimatedGif(
      (0 until 3).map(i => ImageCodec.decode(ImageCodec.renderGrayPng(i.toLong, 20, 10)).get))
    val longGif = ImageCodec.encodeAnimatedGif(
      (0 until 8).map(i => ImageCodec.decode(ImageCodec.renderGrayPng(i.toLong, 20, 10)).get))
    val df = Seq((1L, shortGif), (2L, longGif), (3L, "nope".getBytes("UTF-8")))
      .toDF("id", "gif_bytes")
    val out = Multimodal.sampleGifFrames(df, "gif_bytes", "frames", frames = 4)
      .select($"id", $"frames").collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[Array[Byte]](1))).toMap
    assert(out(1L).get.length === 3)
    assert(out(2L).get.length === 4)
    assert(out(3L).isEmpty)
    // every sampled frame re-encodes as a decodable 20x10 PNG
    out(2L).get.foreach { png =>
      val m = ImageCodec.decodeMeta(png).get
      assert((m._1, m._2, m._4) === ((20, 10, "png")))
    }
  }

  test("dedupHash64Transitive keeps one min-id survivor per twin group, nulls survive") {
    import spark.implicits._
    val rows = (0L until 12L).map { id =>
      val base = ImageCodec.renderGrayPng(id % 3, 32, 24)
      (id, if (id % 2 == 1) ImageCodec.brighten(base, 25).get else base)
    } :+ (99L, "undecodable".getBytes("UTF-8"))
    val hashed = Multimodal.imageDHash(rows.toDF("id", "img_bytes"), "img_bytes")
    val survivors = Dedup.dedupHash64Transitive(hashed, "id", "dhash", maxHamming = 4)
      .select($"id").as[Long].collect().toSet
    assert(survivors === Set(0L, 1L, 2L, 99L)) // group minima + the null-hash row
  }

  test("dedupHash64Transitive supports string ids (native-type collapse, no long cast)") {
    import spark.implicits._
    // two exact-equal hash groups + one isolated + one null hash; ids are strings
    val rows = Seq(
      ("doc-b", java.lang.Long.valueOf(5L)), ("doc-a", java.lang.Long.valueOf(5L)),
      ("doc-c", java.lang.Long.valueOf(5L)),
      ("doc-x", java.lang.Long.valueOf(1024L)), ("doc-y", java.lang.Long.valueOf(1024L)),
      ("doc-z", java.lang.Long.valueOf(9999L)),
      ("doc-n", null.asInstanceOf[java.lang.Long]),
    ).toDF("id", "h")
    val survivors = Dedup.dedupHash64Transitive(rows, "id", "h", maxHamming = 2)
      .select($"id").as[String].collect().toSet
    // min string id per group survives; the null-hash row always survives
    assert(survivors === Set("doc-a", "doc-x", "doc-z", "doc-n"))
  }

  test("synthGrayImages renders per-row deterministic payloads (q89's fixture contract)") {
    import spark.implicits._
    val df = Seq(3L, 20L).toDF("doc_id")
    val out = Multimodal.synthGrayImages(df,
        seed = col("doc_id"), width = col("doc_id") % 17 + 8, height = col("doc_id") % 13 + 8)
      .select($"doc_id", $"img_bytes").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(java.util.Arrays.equals(out(3L), ImageCodec.renderGrayPng(3L, 11, 11)))
    assert(java.util.Arrays.equals(out(20L), ImageCodec.renderGrayPng(20L, 11, 15)))
  }
}
