package graft.analytics

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: images/audio/video travel as opaque `binary`
  * columns next to typed metadata, and per-item decode/feature work runs
  * partition-at-a-time so decoder state (a codec context, a model handle)
  * is initialized once per partition, not per row — the Scala analog of
  * a Pandas-UDF-over-`mapInPandas` pipeline stage.
  *
  * Decoders: WAV (RIFF/PCM16) and BMP (uncompressed 24-bit) are parsed
  * by pure-JVM byte math; JPEG/PNG/GIF decode and encode for REAL via
  * the JDK's `javax.imageio`; the G.711/AIFF audio family (a-law and
  * µ-law WAV, AIFF/AIFF-C, AU, non-PCM16 WAV variants) for REAL via
  * `javax.sound.sampled` (both ship with every JRE — no external codec
  * library); IMA ADPCM WAV (format 0x11, a real 4-bit compressed audio
  * codec the JDK lacks) and FLAC (lossless — encoder + full decoder,
  * [[Flac]]) by from-spec pure-JVM implementations; and
  * video via real RIFF/AVI container demux with uncompressed-DIB and
  * Motion-JPEG frame codings. The remaining stub boundary is the
  * perceptual transform codecs (MP3-class audio, H.264-class
  * inter-frame video): `stubDecode` produces deterministic fake
  * features with the same shape, so that plumbing is exercised
  * end-to-end and a real codec changes only one function body.
  */
object Multimodal {
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),     // image | audio | video
    StructField("payload", BinaryType),  // opaque encoded bytes
    StructField("meta", StructType(Seq(  // typed metadata, no decode needed
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("duration_ms", LongType))))))

  final case class MediaFeatures(media_id: Long, kind: String,
                                 n_bytes: Long, codec: String,
                                 feature: Array[Float])

  /** STUB decode for compressed codecs: deterministic fake — 8 "features"
    * folded from the payload bytes (same output shape as real decodes).
    */
  private def stubDecode(payload: Array[Byte]): Array[Float] = {
    val f = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      f(i % 8) += (payload(i) & 0xFF) / 255.0f
      i += 1
    }
    f
  }

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  /** Real WAV decode (RIFF container, PCM16): walks the chunk list, reads
    * fmt + data, returns [rate/48k, seconds, RMS, zero-cross rate, peak,
    * 0, 0, 0]. Pure JVM byte math — no codec library.
    */
  private[analytics] def decodeWav(b: Array[Byte]): Option[Array[Float]] = {
    if (b.length < 44 || !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'))
      return None
    var off = 12
    var rate = 0; var bits = 0; var channels = 1
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= b.length) {
      val id = new String(b, off, 4, "US-ASCII")
      val sz = leInt(b, off + 4)
      // A corrupt/negative size would advance <= 0 bytes (infinite loop) or
      // read past the buffer — reject the container instead.
      if (sz < 0 || off + 8 + sz.toLong > b.length) return None
      if (id == "fmt ") {
        if (sz < 16) return None // truncated fmt chunk
        if (leShort(b, off + 8) != 1) return None // PCM only
        channels = leShort(b, off + 10)
        rate = leInt(b, off + 12)
        bits = leShort(b, off + 22)
      } else if (id == "data") { dataOff = off + 8; dataLen = sz }
      off += 8 + sz + (sz & 1)
    }
    if (rate <= 0 || bits != 16 || dataOff < 0) return None
    val n = math.min(dataLen, b.length - dataOff) / 2
    var sumSq = 0.0; var crossings = 0; var peak = 0.0
    var prev = 0; var i = 0
    while (i < n) {
      val s = (leShort(b, dataOff + 2 * i) << 16) >> 16 // sign-extend
      sumSq += s.toDouble * s
      if ((s > 0 && prev < 0) || (s < 0 && prev > 0)) crossings += 1
      if (math.abs(s) > peak) peak = math.abs(s)
      prev = s; i += 1
    }
    val samples = math.max(n / math.max(channels, 1), 1)
    Some(Array(
      rate / 48000.0f, samples.toFloat / rate,
      (math.sqrt(sumSq / math.max(n, 1)) / 32768.0).toFloat,
      crossings.toFloat / math.max(n, 1), (peak / 32768.0).toFloat,
      0f, 0f, 0f))
  }

  /** Real BMP decode (uncompressed 24-bit, bottom-up): returns
    * [w/4096, h/4096, meanR, meanG, meanB, 0, 0, 0].
    */
  private[graft] def decodeBmp(b: Array[Byte]): Option[Array[Float]] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val pixOff = leInt(b, 10)
    val w = leInt(b, 18); val h = leInt(b, 22)
    val bpp = leShort(b, 28)
    if (bpp != 24 || leInt(b, 30) != 0 || w <= 0 || h == 0) return None
    if (pixOff < 54) return None // pixel data can't overlap the headers
    val rows = math.abs(h)
    val rowBytes = (w * 3 + 3) & ~3
    if (pixOff + rowBytes.toLong * rows > b.length) return None
    var (sr, sg, sb) = (0.0, 0.0, 0.0)
    var y = 0
    while (y < rows) {
      var x = 0
      val base = pixOff + y * rowBytes
      while (x < w) {
        sb += b(base + 3 * x) & 0xFF
        sg += b(base + 3 * x + 1) & 0xFF
        sr += b(base + 3 * x + 2) & 0xFF
        x += 1
      }
      y += 1
    }
    val np = w.toDouble * rows * 255.0
    Some(Array(w / 4096.0f, rows / 4096.0f,
      (sr / np).toFloat, (sg / np).toFloat, (sb / np).toFloat, 0f, 0f, 0f))
  }

  /** Codec tag for payloads the JDK's ImageIO can decode, by magic
    * bytes — also the guard that keeps non-image payloads (MP3/H.264
    * fakes, arbitrary bytes) off the ImageIO attempt entirely.
    */
  private[graft] def imageIoTag(b: Array[Byte]): Option[String] =
    if (b.length >= 3 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8 &&
      (b(2) & 0xFF) == 0xFF) Some("jpeg")
    else if (b.length >= 8 && (b(0) & 0xFF) == 0x89 && b(1) == 'P' &&
      b(2) == 'N' && b(3) == 'G') Some("png")
    else if (b.length >= 4 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8') Some("gif")
    else None

  /** Real compressed-image decode via `javax.imageio` (pure JDK — JPEG,
    * PNG, GIF readers ship with the JRE; no external codec library).
    * Returns pixels in [[decodeBmpPixels]]' convention: unpadded BGR,
    * bottom-up row order. None for anything ImageIO can't read.
    */
  private[graft] def decodeImageIoPixels(
      b: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    if (imageIoTag(b).isEmpty) None
    else scala.util.Try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        if (w <= 0 || h <= 0 || w.toLong * h > (1L << 28)) None
        else {
          // one bulk ARGB fetch (getRGB row-at-a-time handles every
          // color model), then flip to the bottom-up BGR convention
          val argb = img.getRGB(0, 0, w, h, null, 0, w)
          val out = new Array[Byte](w * h * 3)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = argb(y * w + x)
              val d = ((h - 1 - y) * w + x) * 3
              out(d) = (v & 0xFF).toByte
              out(d + 1) = ((v >> 8) & 0xFF).toByte
              out(d + 2) = ((v >> 16) & 0xFF).toByte
              x += 1
            }
            y += 1
          }
          Some((w, h, out))
        }
      }
    }.toOption.flatten

  /** Unified raw-pixel decode: the pure-JVM BMP fast path first, then
    * ImageIO for compressed formats. (Width, rows, BGR bottom-up.)
    */
  private[graft] def decodeImagePixels(
      b: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    decodeBmpPixels(b).orElse(decodeImageIoPixels(b))

  /** Encode BGR bottom-up pixels via ImageIO — `fmt` is an ImageIO
    * format name ("png", "jpg", "gif", "bmp"). PNG round-trips pixels
    * losslessly; JPEG is lossy by nature.
    */
  private[graft] def encodeImageIo(fmt: String, w: Int, rows: Int,
                                   pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == w * rows * 3, "pixel buffer shape mismatch")
    val img = new java.awt.image.BufferedImage(w, rows,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < rows) {
      var x = 0
      while (x < w) {
        val s = (y * w + x) * 3
        img.setRGB(x, rows - 1 - y,
          ((pixels(s + 2) & 0xFF) << 16) | ((pixels(s + 1) & 0xFF) << 8) |
            (pixels(s) & 0xFF))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    if (!javax.imageio.ImageIO.write(img, fmt, bos))
      throw new IllegalArgumentException(s"no ImageIO writer for $fmt")
    bos.toByteArray
  }

  /** JPEG encode at an explicit quality (BGR bottom-up pixels in, JFIF
    * bytes out) — the default-quality `encodeImageIo("jpg", ...)` path
    * plus an ImageWriteParam. The JDK encoder is deterministic for a
    * fixed (pixels, quality).
    */
  private[graft] def encodeJpeg(w: Int, rows: Int, pixels: Array[Byte],
                                quality: Float = 0.92f): Array[Byte] = {
    require(pixels.length == w * rows * 3, "pixel buffer shape mismatch")
    val img = new java.awt.image.BufferedImage(w, rows,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < rows) {
      var x = 0
      while (x < w) {
        val s = (y * w + x) * 3
        img.setRGB(x, rows - 1 - y,
          ((pixels(s + 2) & 0xFF) << 16) | ((pixels(s + 1) & 0xFF) << 8) |
            (pixels(s) & 0xFF))
        x += 1
      }
      y += 1
    }
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  private def meanFeature(w: Int, rows: Int,
                          px: Array[Byte]): Array[Float] = {
    var (sr, sg, sb) = (0.0, 0.0, 0.0)
    var i = 0
    while (i < px.length) {
      sb += px(i) & 0xFF; sg += px(i + 1) & 0xFF; sr += px(i + 2) & 0xFF
      i += 3
    }
    val np = w.toDouble * rows * 255.0
    Array(w / 4096.0f, rows / 4096.0f,
      (sr / np).toFloat, (sg / np).toFloat, (sb / np).toFloat, 0f, 0f, 0f)
  }

  /** Decode dispatch by magic bytes: real WAV/BMP parsing, real
    * JPEG/PNG/GIF via the JDK's ImageIO, stub fallback for the remaining
    * codec formats (MP3/H.264). Returns (codec tag, features). Corrupt
    * payloads that slip past the parsers' bound checks degrade to the
    * stub rather than killing the job — one bad media row must not fail
    * the pipeline.
    */
  private def decode(bytes: Array[Byte]): (String, Array[Float]) =
    scala.util.Try {
      decodeWav(bytes).map("wav" -> _)
        .orElse(decodeAdpcmFeatures(bytes))
        .orElse(decodeFlacFeatures(bytes))
        .orElse(decodeAudioJdk(bytes))
        .orElse(decodeBmp(bytes).map("bmp" -> _))
        .orElse(decodeImageIoPixels(bytes).map { case (w, rows, px) =>
          imageIoTag(bytes).getOrElse("imageio") -> meanFeature(w, rows, px)
        })
    }.toOption.flatten.getOrElse("stub" -> stubDecode(bytes))

  /** Partition-at-a-time feature extraction. The `mapPartitions` boundary
    * is where per-partition decoder initialization belongs (expensive
    * setup amortized across the partition — same motivation as batching
    * in `mapInPandas`).
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.select("media_id", "kind", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // real impl of codec formats: val decoder = Codec.open(...) once
        // per partition; WAV/BMP need no shared state
        rows.map { case (id, kind, payload) =>
          val bytes = if (payload == null) Array.empty[Byte] else payload
          val (codec, feat) = decode(bytes)
          MediaFeatures(id, kind, bytes.length.toLong, codec, feat)
        }
      }
  }

  /** Raw BGR pixels of an uncompressed 24-bit BMP: (width, rows, pixels)
    * with pixels unpadded, kept in the container's bottom-up row order.
    */
  private[graft] def decodeBmpPixels(
      b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val pixOff = leInt(b, 10)
    val w = leInt(b, 18); val h = leInt(b, 22)
    if (leShort(b, 28) != 24 || leInt(b, 30) != 0 || w <= 0 || h == 0) return None
    if (pixOff < 54) return None
    val rows = math.abs(h)
    val rowBytes = (w * 3 + 3) & ~3
    if (pixOff + rowBytes.toLong * rows > b.length) return None
    val out = new Array[Byte](w * rows * 3)
    var y = 0
    while (y < rows) {
      System.arraycopy(b, pixOff + y * rowBytes, out, y * w * 3, w * 3)
      y += 1
    }
    Some((w, rows, out))
  }

  /** Encode BGR pixels (unpadded, bottom-up) as an uncompressed 24-bit
    * BMP — a valid container any external viewer/decoder reads back.
    */
  private[graft] def encodeBmp(w: Int, rows: Int,
                                   pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == w * rows * 3, "pixel buffer shape mismatch")
    val rowBytes = (w * 3 + 3) & ~3
    val size = 54 + rowBytes * rows
    val b = new Array[Byte](size)
    def putInt(off: Int, v: Int): Unit = {
      b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
      b(off + 2) = (v >> 16).toByte; b(off + 3) = (v >> 24).toByte
    }
    def putShort(off: Int, v: Int): Unit = {
      b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
    }
    b(0) = 'B'; b(1) = 'M'
    putInt(2, size); putInt(10, 54)      // file size, pixel offset
    putInt(14, 40)                        // BITMAPINFOHEADER
    putInt(18, w); putInt(22, rows)       // bottom-up (positive height)
    putShort(26, 1); putShort(28, 24)     // planes, bpp
    putInt(30, 0)                         // BI_RGB (uncompressed)
    putInt(34, rowBytes * rows)
    var y = 0
    while (y < rows) {
      System.arraycopy(pixels, y * w * 3, b, 54 + y * rowBytes, w * 3)
      y += 1
    }
    b
  }

  /** Real nearest-neighbor BMP resize: decode → resample → re-encode.
    * None for payloads that are not uncompressed 24-bit BMPs.
    */
  private[graft] def resizeBmp(b: Array[Byte], newW: Int,
                                   newH: Int): Option[Array[Byte]] =
    decodeBmpPixels(b).map { case (w, rows, px) =>
      val out = new Array[Byte](newW * newH * 3)
      var y = 0
      while (y < newH) {
        val sy = (y.toLong * rows / newH).toInt
        var x = 0
        while (x < newW) {
          val sx = (x.toLong * w / newW).toInt
          val s = (sy * w + sx) * 3
          val d = (y * newW + x) * 3
          out(d) = px(s); out(d + 1) = px(s + 1); out(d + 2) = px(s + 2)
          x += 1
        }
        y += 1
      }
      encodeBmp(newW, newH, out)
    }

  // ------------------------------------------------- image augmentation
  // Training-pipeline augmentations as exact pixel transforms over the
  // (width, rows, bottom-up BGR) convention. All are involutions or
  // 4-cycles, so the specs pin algebraic identities (flip∘flip = id,
  // rot90⁴ = id) bit-exactly rather than eyeballing output.

  /** Horizontal (mirror) or vertical flip of any decodable image;
    * output is an uncompressed BMP. None for non-images.
    */
  private[graft] def flipImage(b: Array[Byte],
                               horizontal: Boolean): Option[Array[Byte]] =
    decodeImagePixels(b).map { case (w, rows, px) =>
      val out = new Array[Byte](px.length)
      var y = 0
      while (y < rows) {
        var x = 0
        while (x < w) {
          val sx = if (horizontal) w - 1 - x else x
          val sy = if (horizontal) y else rows - 1 - y
          val s = (sy * w + sx) * 3
          val d = (y * w + x) * 3
          out(d) = px(s); out(d + 1) = px(s + 1); out(d + 2) = px(s + 2)
          x += 1
        }
        y += 1
      }
      encodeBmp(w, rows, out)
    }

  /** 90° clockwise rotation (output dims swap). */
  private[graft] def rotate90Image(b: Array[Byte]): Option[Array[Byte]] =
    decodeImagePixels(b).map { case (w, rows, px) =>
      val out = new Array[Byte](px.length)
      // bottom-up storage: display-space (X,Y) maps to row (rows-1-Y).
      // Clockwise in DISPLAY space: dst(X,Y) = src(Y, H-1-X), dst is
      // rows×w (swapped dims).
      val ow = rows; val oh = w
      var dy = 0 // display Y of dst
      while (dy < oh) {
        var dx = 0
        while (dx < ow) {
          val sxDisp = dy
          val syDisp = rows - 1 - dx
          val s = ((rows - 1 - syDisp) * w + sxDisp) * 3
          val d = ((oh - 1 - dy) * ow + dx) * 3
          out(d) = px(s); out(d + 1) = px(s + 1); out(d + 2) = px(s + 2)
          dx += 1
        }
        dy += 1
      }
      encodeBmp(ow, oh, out)
    }

  /** Exact crop in DISPLAY coordinates (top-left origin). None when the
    * rectangle falls outside the image or the payload is not an image.
    */
  private[graft] def cropImage(b: Array[Byte], x0: Int, y0: Int,
                               cw: Int, ch: Int): Option[Array[Byte]] =
    decodeImagePixels(b).flatMap { case (w, rows, px) =>
      if (x0 < 0 || y0 < 0 || cw <= 0 || ch <= 0 || x0 + cw > w ||
        y0 + ch > rows) None
      else {
        val out = new Array[Byte](cw * ch * 3)
        var y = 0 // display row of the crop
        while (y < ch) {
          val srcRow = rows - 1 - (y0 + y) // bottom-up index
          val dstRow = ch - 1 - y
          System.arraycopy(px, (srcRow * w + x0) * 3,
            out, dstRow * cw * 3, cw * 3)
          y += 1
        }
        Some(encodeBmp(cw, ch, out))
      }
    }

  /** Distributed augmentation: explode each decodable image row into the
    * requested variants (`"hflip"`, `"vflip"`, `"rot90"`, `"rot180"`,
    * `"rot270"`; unknown names throw at plan-build). One output row per
    * (image, variant); undecodable payloads produce no rows. Exploded
    * variants are plain BMPs, so every downstream image op composes.
    */
  def augmentImages(media: DataFrame, variants: Seq[String]): DataFrame = {
    val known = Set("hflip", "vflip", "rot90", "rot180", "rot270")
    val bad = variants.filterNot(known)
    require(bad.isEmpty, s"augmentImages: unknown variants $bad")
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        if (p == null) Iterator.empty
        else variants.iterator.flatMap { v =>
          val out = v match {
            case "hflip" => flipImage(p, horizontal = true)
            case "vflip" => flipImage(p, horizontal = false)
            case "rot90" => rotate90Image(p)
            case "rot180" => rotate90Image(p).flatMap(rotate90Image)
            case _ => rotate90Image(p).flatMap(rotate90Image)
              .flatMap(rotate90Image)
          }
          out.map(bytes => (id, v, bytes))
        }
      })
      .toDF("media_id", "variant", "payload")
  }

  // --------------------------------------------------- audio transforms

  /** Windowed-sinc resampling (8-tap Hann-windowed sinc per output
    * sample — the standard public bandlimited-interpolation kernel).
    * Exact identity when the rates match.
    */
  private[graft] def resamplePcm(pcm: Array[Short], from: Int,
                                 to: Int): Array[Short] = {
    require(from > 0 && to > 0, "resample: rates must be positive")
    if (from == to || pcm.isEmpty) return pcm.clone()
    val n = ((pcm.length.toLong * to) / from).toInt
    val out = new Array[Short](n)
    val ratio = from.toDouble / to
    // when downsampling, widen the kernel and lower the cutoff to the
    // TARGET Nyquist (anti-aliasing)
    val cutoff = math.min(1.0, 1.0 / ratio)
    val taps = 8
    var i = 0
    while (i < n) {
      val center = i * ratio
      val k0 = math.max(0, math.ceil(center - taps).toInt)
      val k1 = math.min(pcm.length - 1, math.floor(center + taps).toInt)
      var acc = 0.0
      var wsum = 0.0
      var k = k0
      while (k <= k1) {
        val x = (k - center) * cutoff
        val sinc = if (math.abs(x) < 1e-12) 1.0
          else math.sin(math.Pi * x) / (math.Pi * x)
        val wnd = 0.5 + 0.5 * math.cos(math.Pi * (k - center) / taps)
        val wgt = sinc * wnd * cutoff
        acc += pcm(k) * wgt
        wsum += wgt
        k += 1
      }
      // kernel-sum normalization keeps exact DC gain 1 at any phase
      val v = if (wsum == 0) 0.0 else acc / wsum
      out(i) = math.max(-32768.0, math.min(32767.0, math.rint(v))).toShort
      i += 1
    }
    out
  }

  /** Peak normalization: scale so the maximum magnitude equals
    * `targetPeak` of full scale (no-op on silence).
    */
  private[graft] def normalizePcm(pcm: Array[Short],
                                  targetPeak: Double = 0.9): Array[Short] = {
    var peak = 0
    pcm.foreach(s => if (math.abs(s.toInt) > peak) peak = math.abs(s.toInt))
    if (peak == 0) return pcm.clone()
    val gain = targetPeak * 32767.0 / peak
    pcm.map(s => math.max(-32768.0,
      math.min(32767.0, math.rint(s * gain))).toShort)
  }

  /** Distributed audio conditioning: decode any supported audio
    * container, resample to `targetRate`, peak-normalize, re-encode as
    * PCM16 WAV — the rate/level unification pass a training pipeline
    * runs before fingerprinting or feature extraction. Non-audio rows
    * pass through unchanged.
    */
  def conditionAudio(media: DataFrame, targetRate: Int,
                     targetPeak: Double = 0.9): DataFrame = {
    require(targetRate > 0, "conditionAudio: bad target rate")
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, kind, p) =>
        val out =
          if (p == null) p
          else decodeAudioPcm(p) match {
            case Some((rate, pcm)) =>
              encodeWav(targetRate,
                normalizePcm(resamplePcm(pcm, rate, targetRate), targetPeak))
            case None => p
          }
        (id, kind, out)
      })
      .toDF("media_id", "kind", "payload")
  }

  /** Format-preserving resize: BMPs go through the pure-JVM fast path;
    * JPEG/PNG/GIF decode via ImageIO, resample, and re-encode in their
    * own format (GIF re-encodes as PNG — ImageIO's GIF writer would
    * palette-quantize). None for payloads that are not decodable images.
    */
  private[graft] def resizeImage(b: Array[Byte], newW: Int,
                                 newH: Int): Option[Array[Byte]] =
    resizeBmp(b, newW, newH).orElse {
      scala.util.Try {
        decodeImageIoPixels(b).map { case (w, rows, px) =>
          val out = new Array[Byte](newW * newH * 3)
          var y = 0
          while (y < newH) {
            val sy = (y.toLong * rows / newH).toInt
            var x = 0
            while (x < newW) {
              val sx = (x.toLong * w / newW).toInt
              val s = (sy * w + sx) * 3
              val d = (y * newW + x) * 3
              out(d) = px(s); out(d + 1) = px(s + 1); out(d + 2) = px(s + 2)
              x += 1
            }
            y += 1
          }
          val fmt = imageIoTag(b) match {
            case Some("jpeg") => "jpg"
            case _            => "png"
          }
          encodeImageIo(fmt, newW, newH, out)
        }
      }.toOption.flatten
    }

  /** Partition-at-a-time image resize: BMP/JPEG/PNG/GIF payloads are
    * resampled for real (and `meta.width`/`meta.height` updated); other
    * formats pass through unchanged (the remaining stub boundary is
    * video codecs). The binary column never reaches the driver.
    */
  def resizeImages(media: DataFrame, newW: Int, newH: Int): DataFrame = {
    import media.sparkSession.implicits._
    val resized = media
      .select(col("media_id"), col("kind"), col("payload"),
        col("meta.width").as("w"), col("meta.height").as("h"),
        col("meta.sample_rate").as("sr"), col("meta.duration_ms").as("dur"))
      .as[(Long, String, Array[Byte], Option[Int], Option[Int],
        Option[Int], Option[Long])]
      .mapPartitions { rows =>
        rows.map { case (id, kind, payload, w0, h0, sr, dur) =>
          val bytes = if (payload == null) Array.empty[Byte] else payload
          resizeImage(bytes, newW, newH) match {
            case Some(out) => (id, kind, out, Some(newW), Some(newH), sr, dur)
            case None      => (id, kind, payload, w0, h0, sr, dur)
          }
        }
      }
      .toDF("media_id", "kind", "payload", "w", "h", "sr", "dur")
    resized.select(col("media_id"), col("kind"), col("payload"),
      struct(col("w").as("width"), col("h").as("height"),
        col("sr").as("sample_rate"), col("dur").as("duration_ms")).as("meta"))
  }

  /** Encode PCM16 mono samples as a RIFF/WAVE container (the inverse of
    * [[decodeWav]] — a valid file any audio tool reads back).
    */
  private[graft] def encodeWav(rate: Int, samples: Array[Short]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + samples.length * 2)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1)          // PCM, mono
    bb.putInt(rate); bb.putInt(rate * 2)    // byte rate
    bb.putShort(2); bb.putShort(16)         // block align, bits
    bb.put("data".getBytes("US-ASCII")); bb.putInt(samples.length * 2)
    samples.foreach(bb.putShort(_))
    bb.array()
  }

  // ------------------------------------------------------- G.711 audio

  /** G.711 a-law compress (ITU-T G.711, the classic public-domain
    * segment-search form). 16-bit PCM in, 8-bit code out.
    */
  private[graft] def alawEncode(pcm0: Short): Byte = {
    var pcm = pcm0.toInt >> 3 // 16 -> 13 bit
    val mask = if (pcm >= 0) 0xD5 else { pcm = -pcm - 1; 0x55 }
    val segEnd = Array(0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF)
    var seg = 0
    while (seg < 8 && pcm > segEnd(seg)) seg += 1
    if (seg >= 8) (0x7F ^ mask).toByte
    else {
      val aval = (seg << 4) |
        (if (seg < 2) (pcm >> 1) & 0xF else (pcm >> seg) & 0xF)
      (aval ^ mask).toByte
    }
  }

  /** G.711 a-law expand: the canonical 16-bit reconstruction levels. */
  private[graft] def alawDecode(code: Byte): Short = {
    val a = (code ^ 0x55) & 0xFF
    var t = (a & 0xF) << 4
    val seg = (a & 0x70) >> 4
    seg match {
      case 0 => t += 8
      case 1 => t += 0x108
      case _ => t += 0x108; t <<= seg - 1
    }
    (if ((a & 0x80) != 0) t else -t).toShort
  }

  private final val UlawBias = 0x84

  /** G.711 µ-law compress (BIAS 0x84 segment form). */
  private[graft] def mulawEncode(pcm0: Short): Byte = {
    var pcm = pcm0.toInt
    val mask = if (pcm < 0) { pcm = UlawBias - pcm; 0x7F }
               else { pcm += UlawBias; 0xFF }
    if (pcm > 0x7FFF) pcm = 0x7FFF
    val segEnd = Array(0xFF, 0x1FF, 0x3FF, 0x7FF,
      0xFFF, 0x1FFF, 0x3FFF, 0x7FFF)
    var seg = 0
    while (seg < 8 && pcm > segEnd(seg)) seg += 1
    if (seg >= 8) (0x7F ^ mask).toByte
    else (((seg << 4) | ((pcm >> (seg + 3)) & 0xF)) ^ mask).toByte
  }

  /** G.711 µ-law expand. */
  private[graft] def mulawDecode(code: Byte): Short = {
    val u = (~code) & 0xFF
    var t = ((u & 0xF) << 3) + UlawBias
    t <<= (u & 0x70) >> 4
    (if ((u & 0x80) != 0) UlawBias - t else t - UlawBias).toShort
  }

  /** Encode PCM16 mono samples as a G.711-companded RIFF/WAVE container
    * (format code 6 = a-law, 7 = µ-law; 8 bits per sample).
    */
  private[graft] def encodeG711Wav(rate: Int, samples: Array[Short],
                                   alaw: Boolean): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + samples.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + samples.length)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(if (alaw) 6 else 7); bb.putShort(1) // codec, mono
    bb.putInt(rate); bb.putInt(rate)                // byte rate (1 B/sample)
    bb.putShort(1); bb.putShort(8)                  // block align, bits
    bb.put("data".getBytes("US-ASCII")); bb.putInt(samples.length)
    samples.foreach(s => bb.put(if (alaw) alawEncode(s) else mulawEncode(s)))
    bb.array()
  }

  /** Encode PCM16 mono samples as an AIFF container (FORM/COMM/SSND,
    * big-endian samples, 80-bit extended-float sample rate).
    */
  private[graft] def encodeAiff(rate: Int, samples: Array[Short]): Array[Byte] = {
    require(rate > 0, "aiff rate must be positive")
    val ssndSz = 8 + samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(12 + 26 + 8 + ssndSz)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put("FORM".getBytes("US-ASCII")); bb.putInt(4 + 26 + 8 + ssndSz)
    bb.put("AIFF".getBytes("US-ASCII"))
    bb.put("COMM".getBytes("US-ASCII")); bb.putInt(18)
    bb.putShort(1)                      // channels
    bb.putInt(samples.length)           // sample frames
    bb.putShort(16)                     // bits
    // 80-bit IEEE extended: exponent 16383+msb, mantissa rate<<(63-msb)
    val msb = 63 - java.lang.Long.numberOfLeadingZeros(rate.toLong)
    bb.putShort((16383 + msb).toShort)
    bb.putLong(rate.toLong << (63 - msb))
    bb.put("SSND".getBytes("US-ASCII")); bb.putInt(ssndSz)
    bb.putInt(0); bb.putInt(0)          // offset, block size
    samples.foreach(bb.putShort(_))
    bb.array()
  }

  // ----------------------------------------------------- IMA ADPCM audio
  // WAVE format tag 0x11 (IMA/DVI ADPCM, 4 bits/sample): a real compressed
  // audio codec the JDK does NOT ship a decoder for, implemented from the
  // public IMA spec. Block = 4-byte header (initial predictor int16, step
  // index, reserved) + nibble stream, low nibble first; the header
  // predictor IS the block's first output sample.

  private final val ImaStep: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private final val ImaIndexAdj: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** One IMA quantize step: returns (nibble, new predictor, new index). */
  @inline private def imaEncodeStep(sample: Int, predictor: Int,
                                    index: Int): (Int, Int, Int) = {
    val step = ImaStep(index)
    var delta = sample - predictor
    var nib = if (delta < 0) { delta = -delta; 8 } else 0
    var diff = step >> 3
    if (delta >= step) { nib |= 4; delta -= step; diff += step }
    if (delta >= (step >> 1)) { nib |= 2; delta -= step >> 1; diff += step >> 1 }
    if (delta >= (step >> 2)) { nib |= 1; diff += step >> 2 }
    val p0 = if ((nib & 8) != 0) predictor - diff else predictor + diff
    val p = math.max(-32768, math.min(32767, p0))
    val ix = math.max(0, math.min(88, index + ImaIndexAdj(nib & 7)))
    (nib, p, ix)
  }

  /** One IMA reconstruction step: returns (sample, new predictor, new
    * index) — the exact mirror of [[imaEncodeStep]]'s in-loop update, so
    * encoder and decoder predictors never drift.
    */
  @inline private def imaDecodeStep(nib: Int, predictor: Int,
                                    index: Int): (Int, Int) = {
    val step = ImaStep(index)
    var diff = step >> 3
    if ((nib & 4) != 0) diff += step
    if ((nib & 2) != 0) diff += step >> 1
    if ((nib & 1) != 0) diff += step >> 2
    val p0 = if ((nib & 8) != 0) predictor - diff else predictor + diff
    val p = math.max(-32768, math.min(32767, p0))
    (p, math.max(0, math.min(88, index + ImaIndexAdj(nib & 7))))
  }

  /** Encode PCM16 mono as an IMA ADPCM RIFF/WAVE (format 0x11, 4-bit
    * nibbles, `fact` chunk carrying the exact sample count). Block align
    * 256 → 505 samples/block; the step index persists across blocks (the
    * per-block header re-seeds the predictor, so this is pure quality).
    */
  private[graft] def encodeAdpcmWav(rate: Int,
                                    samples: Array[Short]): Array[Byte] = {
    require(rate > 0, "adpcm rate must be positive")
    val blockAlign = 256
    val spb = (blockAlign - 4) * 2 + 1 // 505 samples per block
    val nBlocks = if (samples.isEmpty) 0 else (samples.length + spb - 1) / spb
    val dataSz = nBlocks * blockAlign
    val bb = java.nio.ByteBuffer.allocate(12 + 8 + 20 + 8 + 4 + 8 + dataSz)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(4 + 28 + 12 + 8 + dataSz)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(20)
    bb.putShort(0x11); bb.putShort(1)            // IMA ADPCM, mono
    bb.putInt(rate); bb.putInt(rate * blockAlign / spb) // approx byte rate
    bb.putShort(blockAlign.toShort); bb.putShort(4)     // block, bits
    bb.putShort(2); bb.putShort(spb.toShort)     // cbSize, samples/block
    bb.put("fact".getBytes("US-ASCII")); bb.putInt(4)
    bb.putInt(samples.length)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataSz)
    var index = 0
    var blk = 0
    while (blk < nBlocks) {
      val base = blk * spb
      var predictor = samples(base).toInt
      bb.putShort(predictor.toShort); bb.put(index.toByte); bb.put(0.toByte)
      var i = 1
      while (i < spb) {
        // past the end: encode "hold the predictor" nibbles (delta 0)
        def nibAt(k: Int): Int = {
          val s = if (base + k < samples.length) samples(base + k).toInt
                  else predictor
          val (nb, p, ix) = imaEncodeStep(s, predictor, index)
          predictor = p; index = ix; nb
        }
        val lo = nibAt(i)
        val hi = if (i + 1 < spb) nibAt(i + 1) else 0
        bb.put((lo | (hi << 4)).toByte)
        i += 2
      }
      blk += 1
    }
    bb.array()
  }

  /** Real IMA ADPCM WAV decode: (rate, PCM16 samples), honoring the
    * `fact` sample count. None for anything that is not a well-formed
    * mono format-0x11 WAVE. Bound-checked like [[decodeWav]].
    */
  private[graft] def decodeAdpcmWav(
      b: Array[Byte]): Option[(Int, Array[Short])] = {
    if (b.length < 12 || !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
      b(11) == 'E')) return None
    var off = 12
    var rate = 0; var blockAlign = 0; var fmtOk = false
    var factSamples = -1
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= b.length) {
      val id = new String(b, off, 4, "US-ASCII")
      val sz = leInt(b, off + 4)
      if (sz < 0 || off + 8 + sz.toLong > b.length) return None
      if (id == "fmt ") {
        if (sz < 16) return None
        fmtOk = leShort(b, off + 8) == 0x11 && leShort(b, off + 10) == 1
        rate = leInt(b, off + 12)
        blockAlign = leShort(b, off + 20)
      } else if (id == "fact" && sz >= 4) factSamples = leInt(b, off + 8)
      else if (id == "data") { dataOff = off + 8; dataLen = sz }
      off += 8 + sz + (sz & 1)
    }
    if (!fmtOk || rate <= 0 || blockAlign < 5 || dataOff < 0) return None
    val spb = (blockAlign - 4) * 2 + 1
    val nBlocks = dataLen / blockAlign
    val total0 = nBlocks * spb
    val total = if (factSamples >= 0) math.min(factSamples, total0) else total0
    val out = new Array[Short](total)
    var w = 0
    var blk = 0
    while (blk < nBlocks && w < total) {
      val base = dataOff + blk * blockAlign
      var predictor = (leShort(b, base) << 16) >> 16 // sign-extend
      var index = math.max(0, math.min(88, b(base + 2) & 0xFF))
      out(w) = predictor.toShort; w += 1
      var j = 4
      while (j < blockAlign && w < total) {
        val byte = b(base + j) & 0xFF
        var k = 0
        while (k < 2 && w < total) {
          val nib = if (k == 0) byte & 0xF else byte >> 4
          val (p, ix) = imaDecodeStep(nib, predictor, index)
          predictor = p; index = ix
          out(w) = p.toShort; w += 1
          k += 1
        }
        j += 1
      }
      blk += 1
    }
    Some((rate, out))
  }

  /** Real FLAC decode (see [[Flac]]): (rate, PCM16). Gated on the
    * `fLaC` marker; malformed streams degrade to None.
    */
  private[graft] def decodeFlac(b: Array[Byte]): Option[(Int, Array[Short])] =
    if (b.length < 4 || b(0) != 'f' || b(1) != 'L' || b(2) != 'a' ||
      b(3) != 'C') None
    else scala.util.Try(Flac.decode(b)).toOption.flatten

  /** Encode PCM16 mono as FLAC (lossless — see [[Flac.encode]]). */
  private[graft] def encodeFlac(rate: Int, pcm: Array[Short]): Array[Byte] =
    Flac.encode(rate, pcm)

  /** Feature adapter for [[decode]]'s dispatch: same vector shape as
    * [[decodeWav]], tags "adpcm" / "flac".
    */
  private[analytics] def decodeFlacFeatures(
      b: Array[Byte]): Option[(String, Array[Float])] =
    decodeFlac(b).map { case (rate, pcm) =>
      "flac" -> pcmFeatures(rate, pcm)
    }

  private def pcmFeatures(rate: Int, pcm: Array[Short]): Array[Float] = {
    var sumSq = 0.0; var crossings = 0; var peak = 0.0
    var prev = 0; var i = 0
    while (i < pcm.length) {
      val s = pcm(i).toInt
      sumSq += s.toDouble * s
      if ((s > 0 && prev < 0) || (s < 0 && prev > 0)) crossings += 1
      if (math.abs(s) > peak) peak = math.abs(s)
      prev = s; i += 1
    }
    val n = math.max(pcm.length, 1)
    Array(rate / 48000.0f, pcm.length.toFloat / rate,
      (math.sqrt(sumSq / n) / 32768.0).toFloat,
      crossings.toFloat / n, (peak / 32768.0).toFloat, 0f, 0f, 0f)
  }

  private[analytics] def decodeAdpcmFeatures(
      b: Array[Byte]): Option[(String, Array[Float])] =
    decodeAdpcmWav(b).map { case (rate, pcm) =>
      "adpcm" -> pcmFeatures(rate, pcm)
    }

  /** Real decode of the JDK-supported audio family via
    * `javax.sound.sampled` (pure JDK — no external codec library): µ-law
    * and a-law WAV, AIFF/AIFF-C, AU/SND, and any PCM variant the fast
    * [[decodeWav]] path declines (24-bit, float, big-endian). Gated by
    * container magic so non-audio bytes never reach the JDK parser.
    * Converts to PCM16 and computes the same feature vector as
    * [[decodeWav]]: [rate/48k, seconds, RMS, zero-cross, peak, 0, 0, 0].
    * Returns (codec tag, features).
    */
  private[analytics] def decodeAudioJdk(
      b: Array[Byte]): Option[(String, Array[Float])] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    def m(off: Int, s: String): Boolean =
      b.length >= off + s.length && s.indices.forall(i => b(off + i) == s(i))
    val isRiff = m(0, "RIFF") && m(8, "WAVE")
    val isForm = m(0, "FORM") && (m(8, "AIFF") || m(8, "AIFC"))
    val isAu = m(0, ".snd")
    if (!isRiff && !isForm && !isAu) return None
    try {
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(b))
      try {
        val src = in.getFormat
        val rate = src.getSampleRate
        val channels = math.max(src.getChannels, 1)
        val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          rate, 16, channels, channels * 2, rate, false)
        val pcm = AudioSystem.getAudioInputStream(target, in)
        val bytes = pcm.readAllBytes()
        val n = bytes.length / 2
        var sumSq = 0.0; var crossings = 0; var peak = 0.0
        var prev = 0; var i = 0
        while (i < n) {
          val s = ((bytes(2 * i) & 0xFF) |
            (bytes(2 * i + 1) << 8)).toShort.toInt
          sumSq += s.toDouble * s
          if ((s > 0 && prev < 0) || (s < 0 && prev > 0)) crossings += 1
          if (math.abs(s) > peak) peak = math.abs(s)
          prev = s; i += 1
        }
        val samples = math.max(n / channels, 1)
        val enc = src.getEncoding.toString.toLowerCase
        val tag =
          if (enc.contains("alaw")) "alaw"
          else if (enc.contains("ulaw")) "ulaw"
          else if (isForm) "aiff"
          else if (isAu) "au"
          else "wav"
        Some(tag -> Array(
          rate / 48000.0f, samples.toFloat / rate,
          (math.sqrt(sumSq / math.max(n, 1)) / 32768.0).toFloat,
          crossings.toFloat / math.max(n, 1), (peak / 32768.0).toFloat,
          0f, 0f, 0f))
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** PCM16 mono samples of any supported audio container: (rate, pcm).
    * PCM16 WAV by direct byte math, IMA ADPCM by [[decodeAdpcmWav]],
    * everything else in the JDK family (G.711 WAV, AIFF, AU, odd PCM
    * widths) via `javax.sound.sampled` with channel averaging. The
    * PCM-yielding sibling of the feature-yielding decode paths.
    */
  private[graft] def decodeAudioPcm(
      b: Array[Byte]): Option[(Int, Array[Short])] = {
    def pcm16Wav: Option[(Int, Array[Short])] = {
      if (b.length < 44 || !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
        b(11) == 'E')) return None
      var off = 12
      var rate = 0; var bits = 0; var channels = 1
      var dataOff = -1; var dataLen = 0
      while (off + 8 <= b.length) {
        val id = new String(b, off, 4, "US-ASCII")
        val sz = leInt(b, off + 4)
        if (sz < 0 || off + 8 + sz.toLong > b.length) return None
        if (id == "fmt ") {
          if (sz < 16 || leShort(b, off + 8) != 1) return None
          channels = leShort(b, off + 10)
          rate = leInt(b, off + 12); bits = leShort(b, off + 22)
        } else if (id == "data") { dataOff = off + 8; dataLen = sz }
        off += 8 + sz + (sz & 1)
      }
      if (rate <= 0 || bits != 16 || channels < 1 || dataOff < 0) return None
      val n = math.min(dataLen, b.length - dataOff) / 2 / channels
      val out = new Array[Short](n)
      var i = 0
      while (i < n) {
        var acc = 0
        var c = 0
        while (c < channels) {
          acc += (leShort(b, dataOff + 2 * (i * channels + c)) << 16) >> 16
          c += 1
        }
        out(i) = (acc / channels).toShort
        i += 1
      }
      Some((rate, out))
    }
    def jdk: Option[(Int, Array[Short])] = {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      def m(off: Int, s: String): Boolean =
        b.length >= off + s.length && s.indices.forall(i => b(off + i) == s(i))
      if (!((m(0, "RIFF") && m(8, "WAVE")) ||
        (m(0, "FORM") && (m(8, "AIFF") || m(8, "AIFC"))) || m(0, ".snd")))
        return None
      try {
        val in = AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(b))
        try {
          val src = in.getFormat
          val rate = src.getSampleRate
          val channels = math.max(src.getChannels, 1)
          val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
            rate, 16, channels, channels * 2, rate, false)
          val pcmIn = AudioSystem.getAudioInputStream(target, in)
          val bytes = pcmIn.readAllBytes()
          val n = bytes.length / 2 / channels
          val out = new Array[Short](n)
          var i = 0
          while (i < n) {
            var acc = 0
            var c = 0
            while (c < channels) {
              val k = 2 * (i * channels + c)
              acc += ((bytes(k) & 0xFF) | (bytes(k + 1) << 8)).toShort.toInt
              c += 1
            }
            out(i) = (acc / channels).toShort
            i += 1
          }
          Some((rate.toInt, out))
        } finally in.close()
      } catch { case _: Exception => None }
    }
    pcm16Wav.orElse(decodeAdpcmWav(b)).orElse(decodeFlac(b)).orElse(jdk)
  }

  // ------------------------------------------------ audio fingerprinting
  // 64-bit spectral-signature hash for audio near-dup (the audio analog
  // of pHash's thresholded low-frequency block; band-energy signatures
  // in the spirit of Haitsma–Kalker 2002, but whole-clip: the classic
  // per-frame time-delta bits are DEGENERATE on stationary content —
  // constant band energies make every delta a near-zero coin flip).

  /** 64-bit fingerprint of any decodable audio payload: Hann-windowed
    * whole-signal Goertzel power at 64 log-spaced frequencies
    * (300 Hz – 0.45·rate), bit m set iff band m's energy is within
    * 20 dB of the loudest band (E ≥ E_max/100). EXACTLY gain-invariant
    * — both sides of the comparison scale with the square of any volume
    * change — and robust to requantization / additive noise more than
    * 20 dB below the dominant bands (Hann sidelobes sit at −31 dB, so
    * leakage never sets a bit); clips with different dominant spectra
    * set different bits. None for non-audio or too-short (< 256-sample)
    * payloads.
    */
  private[graft] def audioFingerprint(b: Array[Byte]): Option[Long] =
    decodeAudioPcm(b).filter(_._2.length >= 256).map { case (rate, pcm) =>
      val bands = 64
      val n = pcm.length
      val fMin = 300.0
      val fMax = math.max(fMin * 1.5, 0.45 * rate)
      val energy = new Array[Double](bands)
      // Hann window keeps spectral leakage from smearing quiet bands;
      // windowed ONCE up front — the per-band recurrences reuse it, so
      // the window cos() runs n times, not bands×n (it dominated the
      // whole fingerprint at 64×n calls). Bit-identical to windowing
      // inside the band loop: same product, same evaluation order.
      val wpcm = new Array[Double](n)
      var i0 = 0
      while (i0 < n) {
        wpcm(i0) = pcm(i0) *
          (0.5 - 0.5 * math.cos(2.0 * math.Pi * i0 / (n - 1)))
        i0 += 1
      }
      var m = 0
      while (m < bands) {
        val f = fMin * math.pow(fMax / fMin, m / (bands - 1.0))
        val c = 2.0 * math.cos(2.0 * math.Pi * f / rate)
        var s1 = 0.0; var s2 = 0.0
        var i = 0
        while (i < n) {
          val s0 = wpcm(i) + c * s1 - s2
          s2 = s1; s1 = s0; i += 1
        }
        energy(m) = s1 * s1 + s2 * s2 - c * s1 * s2
        m += 1
      }
      var eMax = 0.0
      m = 0
      while (m < bands) { if (energy(m) > eMax) eMax = energy(m); m += 1 }
      var h = 0L
      m = 0
      while (m < bands) {
        if (energy(m) > eMax * 0.01) h |= (1L << m)
        m += 1
      }
      h
    }

  /** `(media_id, afp)` 64-bit audio fingerprints, partition-at-a-time;
    * undecodable/too-short rows drop out (same shape as [[imagePhashes]]).
    */
  def audioFingerprints(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        if (p == null) None else audioFingerprint(p).map(h => (id, h))
      })
      .toDF("media_id", "afp")
  }

  /** Audio near-duplicate pairs: fingerprint each row, then the banded
    * Hamming pigeonhole join + exact verify ([[Dedup.hammingBandPairs]]).
    * Same scale shape as [[phashPairs]]: the shuffle carries (id, hash)
    * postings, never audio bytes.
    */
  def audioDupPairs(media: DataFrame, maxHamming: Int = 8): DataFrame =
    Dedup.hammingBandPairs(
      audioFingerprints(media)
        .select(col("media_id").as("id"), col("afp").as("h")),
      bits = 64, maxHamming = maxHamming)

  /** 64-bit perceptual hash (classic pHash) of any decodable image
    * (BMP pure-JVM, JPEG/PNG/GIF via ImageIO): grayscale 32×32
    * nearest-neighbor downsample → separable 2-D DCT-II → the
    * low-frequency 8×8 block thresholded on its mean (excluding DC).
    * Visually-near images differ in few bits; the Hamming distance is
    * the near-dup metric. None for non-image payloads.
    */
  private[graft] def phashImage(b: Array[Byte]): Option[Long] =
    decodeImagePixels(b).map { case (w, rows, px) =>
      val N = 32
      val g = new Array[Double](N * N)
      var y = 0
      while (y < N) {
        val sy = (y.toLong * rows / N).toInt
        var x = 0
        while (x < N) {
          val sx = (x.toLong * w / N).toInt
          val s = (sy * w + sx) * 3 // BGR
          g(y * N + x) = 0.114 * (px(s) & 0xFF) + 0.587 * (px(s + 1) & 0xFF) +
            0.299 * (px(s + 2) & 0xFF)
          x += 1
        }
        y += 1
      }
      // DCT-II, separable: rows then columns; only the first 8 output
      // frequencies of each pass are ever used, so compute just those
      val K = 8
      val cosT = Array.tabulate(K, N)((k, n) =>
        math.cos(((2 * n + 1) * k * math.Pi) / (2.0 * N)))
      def alpha(k: Int): Double =
        if (k == 0) math.sqrt(1.0 / N) else math.sqrt(2.0 / N)
      val tmp = new Array[Double](K * N) // tmp(v)(x): DCT over y
      var v = 0
      while (v < K) {
        var x = 0
        while (x < N) {
          var acc = 0.0
          var yy = 0
          while (yy < N) { acc += g(yy * N + x) * cosT(v)(yy); yy += 1 }
          tmp(v * N + x) = alpha(v) * acc
          x += 1
        }
        v += 1
      }
      val dct = new Array[Double](K * K)
      v = 0
      while (v < K) {
        var u = 0
        while (u < K) {
          var acc = 0.0
          var xx = 0
          while (xx < N) { acc += tmp(v * N + xx) * cosT(u)(xx); xx += 1 }
          dct(v * K + u) = alpha(u) * acc
          u += 1
        }
        v += 1
      }
      var mean = 0.0
      var i = 1
      while (i < K * K) { mean += dct(i); i += 1 }
      mean /= (K * K - 1)
      var bitsOut = 0L
      i = 0
      while (i < K * K) {
        if (dct(i) > mean) bitsOut |= (1L << i)
        i += 1
      }
      bitsOut
    }

  /** `(media_id, phash)` for decodable BMP rows, partition-at-a-time (the
    * decoder-init boundary, like [[extractFeatures]]); undecodable rows
    * drop out rather than polluting the near-dup space with stub hashes.
    */
  def imagePhashes(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        if (p == null) None else phashImage(p).map(h => (id, h))
      })
      .toDF("media_id", "phash")
  }

  /** Image near-duplicate pairs: pHash each image, then the same banded
    * Hamming pigeonhole join + exact verify as text simhash
    * ([[Dedup.hammingBandPairs]], 64-bit variant). Output equals brute
    * force over the hashes by construction — bands only generate
    * candidates; at scale the shuffle carries (id, hash) postings, never
    * image bytes.
    */
  def phashPairs(media: DataFrame, maxHamming: Int = 6): DataFrame =
    Dedup.hammingBandPairs(
      imagePhashes(media)
        .select(col("media_id").as("id"), col("phash").as("h")),
      bits = 64, maxHamming = maxHamming)

  /** Metadata-only operations stay pure column expressions — filtering by
    * resolution/duration must prune without touching payload bytes
    * (column pruning keeps the binary column out of the scan entirely).
    */
  def filterByResolution(media: DataFrame, minW: Int, minH: Int): DataFrame =
    media.where(col("meta.width") >= minW && col("meta.height") >= minH)

  /** Deterministic frame sampling for video rows: pick every k-th frame
    * index below the (metadata) frame count — planning which frames to
    * decode is metadata math; only the chosen frames would hit the codec.
    */
  def sampleFrameIndexes(media: DataFrame, everyMs: Long): DataFrame =
    media.where(col("kind") === "video")
      .select(col("media_id"),
        sequence(lit(0L), greatest(col("meta.duration_ms") - 1, lit(0L)),
          lit(everyMs)).as("frame_ts_ms"))

  // ------------------------------------------------------------- video
  // Trivial uncompressed video container ("GVID"): magic, fps, frame
  // count, then length-prefixed whole BMP frames. Exists so the video
  // path — binary column → per-row container parse → frame explode →
  // per-frame decode — is real, distributed, and testable end-to-end;
  // an H.264 demuxer plugs into decodeGvid's slot (the same documented
  // stub boundary as JPEG/MP3).

  private[graft] def encodeGvid(fps: Int,
                                frames: Seq[Array[Byte]]): Array[Byte] = {
    val size = 12 + frames.map(4 + _.length).sum
    val bb = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("GVID".getBytes("US-ASCII")); bb.putInt(fps); bb.putInt(frames.length)
    frames.foreach { f => bb.putInt(f.length); bb.put(f) }
    bb.array()
  }

  /** (fps, frames) of a GVID container; None (→ stub boundary) for
    * anything else. Bound-checked like the WAV/BMP parsers: a corrupt
    * length never reads past the buffer or loops.
    */
  private[graft] def decodeGvid(
      b: Array[Byte]): Option[(Int, Seq[Array[Byte]])] = {
    if (b.length < 12 || b(0) != 'G' || b(1) != 'V' || b(2) != 'I' ||
      b(3) != 'D') return None
    val fps = leInt(b, 4); val n = leInt(b, 8)
    if (fps <= 0 || n < 0) return None
    val frames = Seq.newBuilder[Array[Byte]]
    var off = 12
    var i = 0
    while (i < n) {
      if (off + 4 > b.length) return None
      val len = leInt(b, off)
      if (len < 0 || off + 4 + len.toLong > b.length) return None
      frames += java.util.Arrays.copyOfRange(b, off + 4, off + 4 + len)
      off += 4 + len
      i += 1
    }
    Some((fps, frames.result()))
  }

  // ----------------------------------------------------------- AVI video
  // Real RIFF/AVI container (public spec: the Microsoft AVI RIFF file
  // reference): 'hdrl' (avih + strl/strh/strf) + 'movi' frame chunks +
  // 'idx1'. Two real frame codings: '00db' uncompressed 24-bit DIB
  // (lossless round-trip) and '00dc' Motion-JPEG (each frame is a full
  // JFIF JPEG, decoded via the JDK's ImageIO). This makes video decode
  // real for real formats; the remaining video stub is H.264-class
  // inter-frame codecs.

  /** Encode BMP frames (all same dimensions) as an AVI file — MJPEG
    * ('MJPG' fourcc, per-frame JFIF via [[encodeJpeg]]) or uncompressed
    * DIB ('DIB ', lossless). A valid file external players read back.
    */
  private[graft] def encodeAvi(fps: Int, frames: Seq[Array[Byte]],
                               mjpeg: Boolean,
                               quality: Float = 0.92f): Array[Byte] = {
    require(fps > 0, "avi fps must be positive")
    require(frames.nonEmpty, "avi needs at least one frame")
    val decoded = frames.map(f => decodeBmpPixels(f).getOrElse(
      throw new IllegalArgumentException("encodeAvi frames must be 24-bit BMPs")))
    val (w, h, _) = decoded.head
    require(decoded.forall(d => d._1 == w && d._2 == h),
      "encodeAvi frames must share dimensions")
    val rowBytes = (w * 3 + 3) & ~3
    val frameData: Seq[Array[Byte]] =
      if (mjpeg) decoded.map { case (_, _, px) => encodeJpeg(w, h, px, quality) }
      else decoded.map { case (_, _, px) =>
        val d = new Array[Byte](rowBytes * h)
        var y = 0
        while (y < h) {
          System.arraycopy(px, y * w * 3, d, y * rowBytes, w * 3)
          y += 1
        }
        d
      }
    val ckId = if (mjpeg) "00dc" else "00db"
    val maxFrame = frameData.map(_.length).max
    val moviData = frameData.map(f => 8 + f.length + (f.length & 1)).sum
    val idxSz = 16 * frameData.length
    val hdrlSz = 4 + 8 + 56 + (8 + 4 + 8 + 56 + 8 + 40) // 'hdrl' avih LIST(strl strh strf)
    val total = 12 + (8 + hdrlSz) + (8 + 4 + moviData) + (8 + idxSz)
    val bb = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); bb.putInt(total - 8); fourcc("AVI ")
    fourcc("LIST"); bb.putInt(hdrlSz); fourcc("hdrl")
    fourcc("avih"); bb.putInt(56)
    bb.putInt(1000000 / fps); bb.putInt(0); bb.putInt(0)
    bb.putInt(0x10)                       // AVIF_HASINDEX
    bb.putInt(frameData.length); bb.putInt(0); bb.putInt(1)
    bb.putInt(maxFrame); bb.putInt(w); bb.putInt(h)
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    fourcc("LIST"); bb.putInt(4 + 8 + 56 + 8 + 40); fourcc("strl")
    fourcc("strh"); bb.putInt(56)
    fourcc("vids"); fourcc(if (mjpeg) "MJPG" else "DIB ")
    bb.putInt(0); bb.putInt(0)            // flags, priority+language
    bb.putInt(0)                          // initial frames
    bb.putInt(1); bb.putInt(fps)          // scale, rate → fps
    bb.putInt(0); bb.putInt(frameData.length)
    bb.putInt(maxFrame); bb.putInt(-1); bb.putInt(0) // bufSize, quality, sampleSize
    bb.putShort(0); bb.putShort(0); bb.putShort(w.toShort); bb.putShort(h.toShort)
    fourcc("strf"); bb.putInt(40)
    bb.putInt(40); bb.putInt(w); bb.putInt(h)
    bb.putShort(1); bb.putShort(24)
    if (mjpeg) fourcc("MJPG") else bb.putInt(0)  // biCompression
    bb.putInt(if (mjpeg) maxFrame else rowBytes * h)
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    fourcc("LIST"); bb.putInt(4 + moviData); fourcc("movi")
    val offsets = new Array[Int](frameData.length)
    var rel = 4 // idx1 offsets are relative to the 'movi' fourcc
    frameData.zipWithIndex.foreach { case (f, i) =>
      offsets(i) = rel
      fourcc(ckId); bb.putInt(f.length); bb.put(f)
      if ((f.length & 1) == 1) bb.put(0.toByte)
      rel += 8 + f.length + (f.length & 1)
    }
    fourcc("idx1"); bb.putInt(idxSz)
    frameData.zipWithIndex.foreach { case (f, i) =>
      fourcc(ckId); bb.putInt(0x10) // AVIIF_KEYFRAME
      bb.putInt(offsets(i)); bb.putInt(f.length)
    }
    bb.array()
  }

  /** (fps, frames-as-BMPs) of an AVI container: walks the RIFF tree,
    * reads avih/strh/strf, and normalizes every video frame chunk to an
    * uncompressed BMP payload — '..db' DIB frames losslessly (24-bit
    * BI_RGB only), '..dc' MJPEG frames via ImageIO. Frames whose JPEG
    * bytes ImageIO cannot read (e.g. table-less MJPEG) are skipped, not
    * fatal. None for anything that is not RIFF/AVI; bound-checked
    * throughout like [[decodeGvid]].
    */
  private[graft] def decodeAviFrames(
      b: Array[Byte]): Option[(Int, Seq[Array[Byte]])] = {
    def m(off: Int, s: String): Boolean =
      b.length >= off + s.length && s.indices.forall(i => b(off + i) == s(i))
    if (b.length < 12 || !m(0, "RIFF") || !m(8, "AVI ")) return None
    var microsPerFrame = 0
    var scale = 0; var rate = 0
    var sw = 0; var sh = 0; var sbpp = 0; var scomp = 0
    var inVids = false
    val frames = Seq.newBuilder[Array[Byte]]
    var bad = false
    def scan(from: Int, end: Int): Unit = {
      var off = from
      while (!bad && off + 8 <= end) {
        val id = new String(b, off, 4, "US-ASCII")
        val sz = leInt(b, off + 4)
        if (sz < 0 || off + 8 + sz.toLong > end) { bad = true; return }
        if (id == "LIST" && sz >= 4) scan(off + 12, off + 8 + sz)
        else if (id == "avih" && sz >= 4) microsPerFrame = leInt(b, off + 8)
        else if (id == "strh" && sz >= 32) {
          inVids = m(off + 8, "vids")
          if (inVids) { scale = leInt(b, off + 28); rate = leInt(b, off + 32) }
        } else if (id == "strf" && sz >= 40 && inVids) {
          sw = leInt(b, off + 12); sh = leInt(b, off + 16)
          sbpp = leShort(b, off + 22); scomp = leInt(b, off + 24)
        } else if (id.length == 4 && id(2) == 'd' &&
          (id(3) == 'b' || id(3) == 'c') && id(0).isDigit && id(1).isDigit) {
          val data = java.util.Arrays.copyOfRange(b, off + 8, off + 8 + sz)
          if (id(3) == 'b') {
            // uncompressed DIB rows (bottom-up, 4-byte padded): re-wrap
            // as a BMP when the declared shape matches the data
            val rowBytes = (sw * 3 + 3) & ~3
            if (sw > 0 && sh > 0 && sbpp == 24 && scomp == 0 &&
              data.length >= rowBytes * sh) {
              val px = new Array[Byte](sw * sh * 3)
              var y = 0
              while (y < sh) {
                System.arraycopy(data, y * rowBytes, px, y * sw * 3, sw * 3)
                y += 1
              }
              frames += encodeBmp(sw, sh, px)
            }
          } else if (imageIoTag(data).contains("jpeg")) {
            decodeImageIoPixels(data).foreach { case (fw, fh, px) =>
              frames += encodeBmp(fw, fh, px)
            }
          }
        }
        off += 8 + sz + (sz & 1)
      }
    }
    scan(12, b.length)
    if (bad) return None
    val fps =
      if (scale > 0 && rate > 0 && rate / scale > 0) rate / scale
      else if (microsPerFrame > 0) math.max(1, 1000000 / microsPerFrame)
      else 1
    Some((fps, frames.result()))
  }

  /** Container-dispatch frame demux: GVID or AVI. The per-frame payloads
    * are always plain BMPs, whatever the container coding was.
    */
  private[graft] def decodeVideoFrames(
      b: Array[Byte]): Option[(Int, Seq[Array[Byte]])] =
    decodeGvid(b).orElse(decodeAviFrames(b))

  /** Distributed frame sampling: explode each video row into every
    * `everyK`-th frame as its own (media_id, frame_idx, frame) row —
    * partition-at-a-time (demuxer-init boundary), frames stay executor-
    * side. Non-GVID payloads (the codec stub boundary) produce no rows.
    * Downstream image ops compose directly: the exploded frames are
    * plain BMP payloads, so [[imagePhashes]]/[[resizeImages]]-style
    * passes run on frames exactly as they do on still images.
    */
  def sampleFrames(media: DataFrame, everyK: Int = 1): DataFrame = {
    require(everyK >= 1, "sampleFrames: everyK must be >= 1")
    import media.sparkSession.implicits._
    media.where(col("kind") === "video")
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        if (p == null) Iterator.empty
        else decodeVideoFrames(p).iterator.flatMap { case (_, frames) =>
          frames.iterator.zipWithIndex.collect {
            case (f, i) if i % everyK == 0 => (id, i.toLong, f)
          }
        }
      })
      .toDF("media_id", "frame_idx", "frame")
  }

  /** 64-bit video fingerprint: bitwise MAJORITY vote across the per-frame
    * perceptual hashes ([[phashImage]]) of every `everyK`-th frame — the
    * clip-level analog of [[audioFingerprint]]. Identical clips hash
    * identically; a re-encoded copy (e.g. MJPEG at JPEG error) flips few
    * bits per frame and the majority absorbs them; different content
    * diverges like pHash does. None for undecodable payloads or clips
    * with no decodable sampled frame.
    */
  private[graft] def videoFingerprint(b: Array[Byte],
                                      everyK: Int = 1): Option[Long] =
    decodeVideoFrames(b).flatMap { case (_, frames) =>
      val votes = new Array[Int](64)
      var n = 0
      frames.iterator.zipWithIndex.foreach { case (f, i) =>
        if (i % everyK == 0) phashImage(f).foreach { h =>
          n += 1
          var bit = 0
          while (bit < 64) {
            if (((h >>> bit) & 1L) != 0) votes(bit) += 1 else votes(bit) -= 1
            bit += 1
          }
        }
      }
      if (n == 0) None
      else {
        var h = 0L
        var bit = 0
        while (bit < 64) {
          if (votes(bit) > 0) h |= (1L << bit)
          bit += 1
        }
        Some(h)
      }
    }

  /** `(media_id, vfp)` clip fingerprints, partition-at-a-time; payloads
    * that demux to no decodable frame drop out.
    */
  def videoFingerprints(media: DataFrame, everyK: Int = 1): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        if (p == null) None else videoFingerprint(p, everyK).map(h => (id, h))
      })
      .toDF("media_id", "vfp")
  }

  /** Video near-duplicate pairs: clip fingerprints + the banded Hamming
    * pigeonhole join ([[Dedup.hammingBandPairs]]) — same scale shape as
    * [[phashPairs]]/[[audioDupPairs]]: postings shuffle, never video
    * bytes.
    */
  def videoDupPairs(media: DataFrame, maxHamming: Int = 8,
                    everyK: Int = 1): DataFrame =
    Dedup.hammingBandPairs(
      videoFingerprints(media, everyK)
        .select(col("media_id").as("id"), col("vfp").as("h")),
      bits = 64, maxHamming = maxHamming)

  /** Per-sampled-frame features (frame dimensions + channel means via the
    * real BMP decoder): the whole-video analog of [[extractFeatures]].
    * Output is one row per sampled decodable frame.
    */
  def videoFrameFeatures(media: DataFrame, everyK: Int = 1): DataFrame = {
    import media.sparkSession.implicits._
    sampleFrames(media, everyK)
      .as[(Long, Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, idx, f) =>
        decodeBmp(f).map(feat => (id, idx, feat))
      })
      .toDF("media_id", "frame_idx", "feature")
  }
}
