package graft.multimodal

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.imageio.stream.MemoryCacheImageInputStream

/** REAL image codec on the JDK's `javax.imageio` (java.desktop module —
  * PNG/JPEG/GIF/BMP/TIFF/WBMP readers and writers ship with the JVM, no
  * external codec libraries needed). [[Multimodal.decodeImageMeta]],
  * [[Multimodal.resizeTo]], [[Multimodal.imageDHash]] and
  * [[Multimodal.sampleGifFrames]] run on it; the round-3 deterministic
  * decode stub ([[Multimodal.stubDecode]]) survives only as the fallback
  * for payloads no installed reader claims. Reference scope note: astro-sdk
  * has no image file type — media columns are beyond-reference
  * builder's-brief scope.
  *
  * Scale notes:
  *  - [[decodeMeta]] reads ONLY the header: `ImageReader.getWidth/getHeight`
  *    and the raw image type are available without materializing pixels, so
  *    a metadata pass over 100 TB of JPEG payloads does no pixel decode.
  *  - Everything here is a pure function of the payload bytes — safe inside
  *    batched `mapPartitions` with no shared state; ImageIO's plugin
  *    registry is JVM-global and thread-safe for lookup.
  *  - `ImageIO.setUseCache(false)`: decode through heap streams, never the
  *    default temp-FILE cache (an executor decoding thousands of images must
  *    not fsync scratch files per image).
  */
object ImageCodec {

  // executors have no display; headless must be set before any AWT class
  // initializes. Harmless if already set by the session owner.
  if (System.getProperty("java.awt.headless") == null)
    System.setProperty("java.awt.headless", "true")
  ImageIO.setUseCache(false)

  /** Decoded header metadata: (width, height, bands, format). `format` is
    * the reader's canonical name lowercased ("png", "jpeg", "gif", "bmp",
    * "tiff", "wbmp"). Returns None for bytes no installed reader claims.
    * Pixels are NOT decoded — header-only, O(header) per payload.
    *
    * Band count comes from `getRawImageType` (the file's true layout) when
    * the reader exposes it, else the first declared image type; when neither
    * is available the count is -1 (unknown), never a plausible guess.
    */
  def decodeMeta(bytes: Array[Byte]): Option[(Int, Int, Int, String)] = {
    if (bytes == null || bytes.isEmpty) return None
    val iis = new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val r = readers.next()
      try {
        r.setInput(iis, true, true)
        val w = r.getWidth(0)
        val h = r.getHeight(0)
        // band count, still header-only: raw type first (what's in the
        // file), declared types second, -1 sentinel if the plugin offers
        // neither — a wrong-but-plausible 3 would silently misreport
        // grayscale/CMYK payloads.
        val bands =
          (try Option(r.getRawImageType(0)) catch { case _: Exception => None })
            .orElse(try { val it = r.getImageTypes(0); if (it.hasNext) Some(it.next()) else None }
                    catch { case _: Exception => None })
            .map(_.getNumBands)
            .getOrElse(-1)
        Some((w, h, bands, r.getFormatName.toLowerCase))
      } finally r.dispose()
    } catch { case _: Exception => None }
    finally iis.close()
  }

  /** Full pixel decode. None if undecodable.
    *
    * Fast path (round 16, guide §1.2 per-task work): plain 8-bit grayscale
    * non-interlaced PNGs — the overwhelmingly common payload in this
    * pipeline's fixtures and any gray-thumbnail corpus — decode through
    * [[FastGrayPng]] (one Inflater + unfilter pass, ~10x cheaper than the
    * ImageIO reader machinery). Pixels are identical by the PNG spec
    * (lossless, deterministic); everything else falls back to ImageIO.
    */
  def decode(bytes: Array[Byte]): Option[BufferedImage] = {
    if (bytes == null || bytes.isEmpty) return None
    FastGrayPng.decode(bytes) match {
      case some @ Some(_) => some
      case None =>
        try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
        catch { case _: Exception => None }
    }
  }

  /** Encode with any installed writer ("png", "jpeg", "bmp", "gif").
    * Gray PNGs take the [[FastGrayPng]] fast path (see [[encodePng]]).
    */
  def encode(img: BufferedImage, format: String): Array[Byte] = {
    if (format.equalsIgnoreCase("png") && img.getType == BufferedImage.TYPE_BYTE_GRAY)
      return FastGrayPng.encode(img)
    val bos = new ByteArrayOutputStream()
    // JPEG writers reject images with alpha; flatten to RGB first
    val src =
      if (format.equalsIgnoreCase("jpeg") || format.equalsIgnoreCase("jpg")) {
        if (img.getColorModel.hasAlpha) {
          val rgb = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_3BYTE_BGR)
          val g   = rgb.createGraphics()
          // flatten alpha onto white, not the raster's uninitialized black —
          // semi-transparent pixels must lighten, matching every mainstream
          // alpha-flatten convention
          g.setColor(java.awt.Color.WHITE)
          g.fillRect(0, 0, img.getWidth, img.getHeight)
          g.drawImage(img, 0, 0, null); g.dispose(); rgb
        } else img
      } else img
    require(ImageIO.write(src, format, bos), s"no ImageIO writer for format '$format'")
    bos.toByteArray
  }

  /** PNG encode. Single-band byte-gray images take the [[FastGrayPng]]
    * writer (round 16 — same IDAT filter-0 + deflate stream for a fraction
    * of the ImageIO writer's cost); everything else goes through ImageIO.
    * Either way the output is a spec-valid grayscale/truecolor PNG whose
    * DECODED pixels are the image's samples — nothing downstream (dHash,
    * meta decode, resize, the DuckDB oracles) depends on the compressed
    * byte stream itself.
    */
  def encodePng(img: BufferedImage): Array[Byte] =
    if (img.getType == BufferedImage.TYPE_BYTE_GRAY) FastGrayPng.encode(img)
    else encode(img, "png")

  /** Real resample: decode → bilinear scale to (w, h) → re-encode. The
    * output image type follows the source's COLOR band structure (gray and
    * gray+alpha sources stay single-band gray; alpha itself is dropped, as
    * with any opaque output type). Returns None if the payload is
    * undecodable.
    */
  def resize(bytes: Array[Byte], w: Int, h: Int, format: String = "png"): Option[Array[Byte]] =
    decode(bytes).map { src =>
      val outType =
        if (src.getColorModel.getNumColorComponents == 1) BufferedImage.TYPE_BYTE_GRAY
        else BufferedImage.TYPE_3BYTE_BGR
      val dst = new BufferedImage(w, h, outType)
      val g   = dst.createGraphics()
      g.setRenderingHint(RenderingHints.KEY_INTERPOLATION, RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(src, 0, 0, w, h, null)
      g.dispose()
      encode(dst, format)
    }

  /** Decode every frame of a (possibly animated) GIF — the JDK GIF reader
    * exposes frames as image indices, making GIF the one multi-frame
    * container the JVM decodes natively. Frames are returned as the reader
    * renders them (the fixtures here write full frames; partial-disposal
    * compositing is out of scope). None for non-GIF payloads.
    */
  def decodeGifFrames(bytes: Array[Byte]): Option[Vector[BufferedImage]] = {
    if (bytes == null || bytes.isEmpty) return None
    val iis = new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val r = readers.next()
      try {
        if (!r.getFormatName.equalsIgnoreCase("gif")) return None
        r.setInput(iis)
        val n = r.getNumImages(true)
        Some((0 until n).map(r.read(_)).toVector)
      } finally r.dispose()
    } catch { case _: Exception => None }
    finally iis.close()
  }

  /** Encode frames as an animated GIF (`writeToSequence`). Grayscale frames
    * quantize losslessly (the GIF palette holds 256 grays).
    */
  def encodeAnimatedGif(frames: Seq[BufferedImage]): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { f =>
        writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Deterministic grayscale box-filter downsample to exactly (w, h),
    * implemented by hand (not Graphics2D) so the result is bit-stable
    * across JVMs — the substrate for [[dHash64]]. Grayscale conversion is
    * the integer ITU-R 601 luma ((77 R + 150 G + 29 B) >> 8); single-band
    * images use the raw sample. Each output cell is the floor-average of
    * its source box.
    */
  private[multimodal] def grayBox(img: BufferedImage, w: Int, h: Int): Array[Int] = {
    val sw = img.getWidth
    val sh = img.getHeight
    val singleBand = img.getColorModel.getNumComponents == 1
    val raster = img.getRaster
    val out = new Array[Int](w * h)
    var cy = 0
    while (cy < h) {
      val y0 = cy * sh / h
      val y1 = math.max(y0 + 1, (cy + 1) * sh / h)
      var cx = 0
      while (cx < w) {
        val x0 = cx * sw / w
        val x1 = math.max(x0 + 1, (cx + 1) * sw / w)
        var sum = 0L
        var n   = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val g =
              if (singleBand) raster.getSample(x, y, 0)
              else {
                val rgb = img.getRGB(x, y)
                (77 * ((rgb >> 16) & 0xFF) + 150 * ((rgb >> 8) & 0xFF) + 29 * (rgb & 0xFF)) >> 8
              }
            sum += g
            n += 1
            x += 1
          }
          y += 1
        }
        out(cy * w + cx) = (sum / n).toInt
        cx += 1
      }
      cy += 1
    }
    out
  }

  /** 64-bit difference hash (dHash): downsample to 9×8 grayscale, emit one
    * bit per horizontally-adjacent pixel pair (left < right). Standard
    * perceptual near-dup primitive for image corpora (Krawetz 2013, public
    * algorithm): invariant to uniform brightness shift (strict-< order
    * preserved), stable under resize (box averages change little), and two
    * unrelated images agree on ~32/64 bits. Returns None for undecodable
    * payloads.
    */
  def dHash64(bytes: Array[Byte]): Option[Long] = decode(bytes).map(dHash64Image)

  /** dHash of an already-decoded image — for callers that hold pixels
    * (e.g. sampled GIF frames): hashing the frame directly equals hashing
    * any lossless re-encode of it, without paying the encode/decode round
    * trip (round 16, guide §1.2 — don't compute what you throw away).
    */
  def dHash64Image(img: BufferedImage): Long = {
    val g = grayBox(img, 9, 8)
    var hash = 0L
    var bit  = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y * 9 + x) < g(y * 9 + x + 1)) hash |= (1L << bit)
        bit += 1
        x += 1
      }
      y += 1
    }
    hash
  }

  /** Add `delta` to every sample of every band, clamped to [0, 255], and
    * re-encode (losslessly, PNG). A real photometric perturbation used by
    * the perceptual-dedup tests: dHash is exactly invariant to it PROVIDED
    * no sample clamps — i.e. every source sample stays within
    * [-delta, 255 - delta]; clamping flattens local gradients and can flip
    * comparison bits. [[renderGrayPng]]'s default [30, 200] range keeps
    * deltas in [-30, 55] saturation-free.
    */
  def brighten(bytes: Array[Byte], delta: Int): Option[Array[Byte]] =
    decode(bytes).map { img =>
      val out =
        if (img.getColorModel.getNumComponents == 1) {
          val o = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_BYTE_GRAY)
          val sr = img.getRaster; val or = o.getRaster
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              or.setSample(x, y, 0, math.min(255, math.max(0, sr.getSample(x, y, 0) + delta)))
              x += 1
            }
            y += 1
          }
          o
        } else {
          val o = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_3BYTE_BGR)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              def c(v: Int) = math.min(255, math.max(0, v + delta))
              o.setRGB(x, y, (c((rgb >> 16) & 0xFF) << 16) | (c((rgb >> 8) & 0xFF) << 8) | c(rgb & 0xFF))
              x += 1
            }
            y += 1
          }
          o
        }
      encodePng(out)
    }

  /** Deterministic single-band test image: gray(x, y) = splitmix64(seed, x,
    * y) mapped into [lo, hi]. Pure fixture generator (the queries build
    * their image payloads from row data with it so the DuckDB oracle can
    * predict the decoded dimensions); NOT part of the codec surface.
    */
  def renderGrayPng(seed: Long, w: Int, h: Int, lo: Int = 30, hi: Int = 200): Array[Byte] =
    encodePng(renderGrayImage(seed, w, h, lo, hi))

  /** [[renderGrayPng]]'s raster, pre-encode — for fixture generators that
    * immediately need PIXELS again (GIF frame synthesis), which previously
    * paid a PNG encode + decode round trip per frame just to get a
    * BufferedImage back (round 16, guide §1.2). Optional `delta` applies
    * [[brighten]]'s clamped shift at render time: brighten(decode(encode(
    * render))) ≡ render-with-delta sample for sample, so the fused form
    * encodes byte-identical payloads in one pass instead of three.
    */
  def renderGrayImage(seed: Long, w: Int, h: Int, lo: Int = 30, hi: Int = 200,
      delta: Int = 0): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val r   = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var z = seed + x * 0x9E3779B97F4A7C15L + y * 0xC2B2AE3D27D4EB4FL + 0x165667B19E3779F9L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z = z ^ (z >>> 31)
        val v = lo + (((z >>> 11) % (hi - lo + 1)).toInt + (hi - lo + 1)) % (hi - lo + 1)
        r.setSample(x, y, 0, if (delta == 0) v else math.min(255, math.max(0, v + delta)))
        x += 1
      }
      y += 1
    }
    img
  }
}
