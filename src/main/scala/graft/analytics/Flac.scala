package graft.analytics

/** Pure-JVM FLAC codec (lossless audio), implemented from the public
  * FLAC format specification (RFC 9639 / xiph.org): `fLaC` marker,
  * STREAMINFO metadata block, frames with CRC-8-protected headers and
  * CRC-16-protected payloads, per-channel subframes (CONSTANT /
  * VERBATIM / FIXED order 0–4 / LPC with in-stream quantized
  * coefficients), and partitioned Rice-coded residuals. Unlike
  * MPEG-audio codecs, every constant here is derivable from the spec —
  * no tabulated filterbank windows — so the implementation can be
  * honest and complete. Mono, 16-bit, any sample rate; the encoder
  * picks the best FIXED predictor per block, which real decoders read
  * back bit-exactly (FLAC is lossless: decode(encode(x)) == x is the
  * contract, not an error bound).
  *
  * Reference semantics source for the multimodal surface:
  * cayley has no media decoding; this extends the training-data
  * pipeline tier (SURVEY §north-star), not the reference surface.
  */
private[analytics] object Flac {

  // ------------------------------------------------------------ bit IO

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nBits = 0
    def write(v: Long, bits: Int): Unit = {
      var b = bits
      while (b > 0) {
        val take = math.min(b, 56 - nBits)
        acc = (acc << take) | ((v >>> (b - take)) & ((1L << take) - 1))
        nBits += take; b -= take
        while (nBits >= 8) {
          buf.write(((acc >>> (nBits - 8)) & 0xFF).toInt)
          nBits -= 8
        }
      }
    }
    def writeUnary(q: Int): Unit = { // q zeros then a one
      var left = q
      while (left >= 32) { write(0L, 32); left -= 32 }
      write(1L, left + 1)
    }
    def alignByte(): Unit = if (nBits > 0) write(0L, 8 - nBits)
    def toBytes: Array[Byte] = { alignByte(); buf.toByteArray }
  }

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var bit = 0
    def read(bits: Int): Long = {
      var out = 0L
      var left = bits
      while (left > 0) {
        if (pos >= b.length)
          throw new IllegalArgumentException("flac: truncated stream")
        val avail = 8 - bit
        val take = math.min(left, avail)
        val cur = (b(pos) >> (avail - take)) & ((1 << take) - 1)
        out = (out << take) | (cur & 0xFF)
        bit += take; left -= take
        if (bit == 8) { bit = 0; pos += 1 }
      }
      out
    }
    def readUnary(): Int = {
      var q = 0
      while (read(1) == 0) {
        q += 1
        if (q > (1 << 24))
          throw new IllegalArgumentException("flac: runaway unary")
      }
      q
    }
    def alignByte(): Unit = if (bit != 0) { bit = 0; pos += 1 }
  }

  // ------------------------------------------------------------- CRCs

  /** CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — the frame-header CRC. */
  private def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xFF
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF
              else (crc << 1) & 0xFF
        k += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 — the frame CRC. */
  private def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xFF) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF
              else (crc << 1) & 0xFFFF
        k += 1
      }
      i += 1
    }
    crc
  }

  // --------------------------------------------------------- encoding

  private final val BlockSize = 4096

  /** Encode mono PCM16 as a FLAC stream: STREAMINFO + one frame per
    * 4096-sample block, each channel subframe using the best of the
    * five FIXED predictors (order minimizing the residual magnitude
    * sum) with one-partition Rice residuals. Lossless by construction.
    */
  def encode(rate: Int, pcm: Array[Short]): Array[Byte] = {
    require(rate > 0 && rate < (1 << 20), "flac: bad sample rate")
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO (last-metadata flag set, type 0, length 34)
    val si = new BitWriter
    si.write(BlockSize, 16); si.write(BlockSize, 16) // min/max block size
    si.write(0, 24); si.write(0, 24)                 // min/max frame size (unknown)
    si.write(rate, 20)
    si.write(0, 3)                                   // channels-1 (mono)
    si.write(15, 5)                                  // bits-per-sample-1
    si.write(pcm.length.toLong, 36)
    (0 until 16).foreach(_ => si.write(0, 8))        // md5 unset
    val siB = si.toBytes
    out.write(0x80); out.write(0); out.write(0); out.write(siB.length)
    out.write(siB)
    var frameIdx = 0
    var off = 0
    while (off < pcm.length) {
      val n = math.min(BlockSize, pcm.length - off)
      out.write(encodeFrame(frameIdx, pcm, off, n))
      off += n
      frameIdx += 1
    }
    out.toByteArray
  }

  /** UTF-8-style coded frame number (the spec's extended UCS coding). */
  private def writeCodedNumber(w: BitWriter, v0: Long): Unit = {
    if (v0 < 0x80) { w.write(v0, 8); return }
    // continuation-byte count by the standard UTF-8-style thresholds
    val thresholds = Array(0x80L, 0x800L, 0x10000L, 0x200000L,
      0x4000000L, 0x80000000L)
    var bytes = 1
    while (bytes < 6 && v0 >= thresholds(bytes)) bytes += 1
    // lead byte: (bytes+1) ones, a zero, then the high payload bits
    val leadPayloadBits = 6 - bytes
    val lead = ((0xFF << (7 - bytes)) & 0xFF) |
      ((v0 >>> (6 * bytes)) & ((1 << leadPayloadBits) - 1)).toInt
    w.write(lead.toLong, 8)
    var k = bytes - 1
    while (k >= 0) {
      w.write(0x80L | ((v0 >>> (6 * k)) & 0x3F), 8)
      k -= 1
    }
  }

  private def readCodedNumber(r: BitReader): Long = {
    val lead = r.read(8).toInt
    if ((lead & 0x80) == 0) return lead.toLong
    var bytes = 0
    var mask = 0x40
    while ((lead & mask) != 0) { bytes += 1; mask >>= 1 }
    if (bytes < 1 || bytes > 6)
      throw new IllegalArgumentException("flac: bad coded number")
    var v = (lead & (mask - 1)).toLong
    var k = 0
    while (k < bytes) {
      val c = r.read(8).toInt
      if ((c & 0xC0) != 0x80)
        throw new IllegalArgumentException("flac: bad continuation byte")
      v = (v << 6) | (c & 0x3F)
      k += 1
    }
    v
  }

  private def encodeFrame(idx: Int, pcm: Array[Short],
                          off: Int, n: Int): Array[Byte] = {
    // header is byte-aligned by construction (32 fixed bits + whole
    // bytes of coded frame number + 16 blocksize bits), so its CRC-8
    // can be computed over a serialized copy
    val headBytes = {
      val t = new BitWriter
      t.write(0x3FFE, 14)         // sync
      t.write(0, 1)               // mandatory zero
      t.write(0, 1)               // fixed-blocksize strategy
      t.write(7, 4)               // block size: 16 bits at header end
      t.write(0, 4)               // sample rate: from STREAMINFO
      t.write(0, 4)               // channels: mono
      t.write(4, 3)               // sample size: 16-bit
      t.write(0, 1)               // reserved
      writeCodedNumber(t, idx.toLong)
      t.write((n - 1).toLong, 16) // block size - 1
      t.toBytes
    }
    val w = new BitWriter
    headBytes.foreach(hb => w.write((hb & 0xFF).toLong, 8))
    w.write(crc8(headBytes, 0, headBytes.length).toLong, 8)
    // ---- subframe (mono): best fixed predictor
    val x = new Array[Int](n)
    var i = 0
    while (i < n) { x(i) = pcm(off + i).toInt; i += 1 }
    val order = bestFixedOrder(x)
    w.write(0, 1)                   // zero padding bit
    w.write((8 + order).toLong, 6)  // FIXED subframe of this order
    w.write(0, 1)                   // no wasted bits
    i = 0
    while (i < order) { w.write(x(i).toLong & 0xFFFF, 16); i += 1 }
    writeRice(w, fixedResidual(x, order))
    w.alignByte()
    val frame = w.toBytes
    val withCrc = java.util.Arrays.copyOf(frame, frame.length + 2)
    val c16 = crc16(frame, 0, frame.length)
    withCrc(frame.length) = (c16 >> 8).toByte
    withCrc(frame.length + 1) = c16.toByte
    withCrc
  }

  /** Residual of FIXED predictor `order` over x (length n - order). */
  private def fixedResidual(x: Array[Int], order: Int): Array[Int] = {
    val n = x.length
    val r = new Array[Int](n - order)
    var i = order
    while (i < n) {
      r(i - order) = order match {
        case 0 => x(i)
        case 1 => x(i) - x(i - 1)
        case 2 => x(i) - 2 * x(i - 1) + x(i - 2)
        case 3 => x(i) - 3 * x(i - 1) + 3 * x(i - 2) - x(i - 3)
        case _ => x(i) - 4 * x(i - 1) + 6 * x(i - 2) - 4 * x(i - 3) +
          x(i - 4)
      }
      i += 1
    }
    r
  }

  private def bestFixedOrder(x: Array[Int]): Int = {
    if (x.length < 5) return 0
    var best = 0
    var bestSum = Long.MaxValue
    var o = 0
    while (o <= 4) {
      val r = fixedResidual(x, o)
      var s = 0L
      var i = 0
      while (i < r.length) { s += math.abs(r(i).toLong); i += 1 }
      if (s < bestSum) { bestSum = s; best = o }
      o += 1
    }
    best
  }

  /** One-partition Rice coding: partition order 0, parameter chosen
    * from the mean residual magnitude.
    */
  private def writeRice(w: BitWriter, resid: Array[Int]): Unit = {
    w.write(0, 2)      // residual coding method: RICE (4-bit params)
    w.write(0, 4)      // partition order 0 → one partition
    var sum = 0L
    resid.foreach(v => sum += math.abs(v.toLong))
    val mean = if (resid.isEmpty) 0L else sum / math.max(resid.length, 1)
    var p = 0
    while (p < 14 && (1L << (p + 1)) < mean + 1) p += 1
    w.write(p.toLong, 4)
    resid.foreach { v =>
      val z = (v << 1) ^ (v >> 31) // zigzag
      val u = z.toLong & 0xFFFFFFFFL
      val q = (u >>> p).toInt
      if (q > (1 << 20)) throw new IllegalStateException("rice blowup")
      w.writeUnary(q)
      if (p > 0) w.write(u & ((1L << p) - 1), p)
    }
  }

  // --------------------------------------------------------- decoding

  /** Decode a FLAC stream to (rate, mono PCM16). Handles CONSTANT /
    * VERBATIM / FIXED / LPC subframes, any fixed block size, partition
    * orders 0..15, and verifies both CRCs. Multi-channel streams are
    * downmixed by averaging (independent channels only — stereo
    * decorrelation modes are rejected). None for non-FLAC payloads;
    * malformed FLAC throws inside and returns None through the Try in
    * callers that need tolerance.
    */
  def decode(b: Array[Byte]): Option[(Int, Array[Short])] = {
    if (b.length < 42 || b(0) != 'f' || b(1) != 'L' || b(2) != 'a' ||
      b(3) != 'C') return None
    var pos = 4
    var rate = 0; var channels = 1; var bps = 16
    var totalSamples = 0L
    var last = false
    // metadata blocks
    while (!last) {
      if (pos + 4 > b.length)
        throw new IllegalArgumentException("flac: truncated metadata")
      val hdr = ((b(pos) & 0xFF) << 24) | ((b(pos + 1) & 0xFF) << 16) |
        ((b(pos + 2) & 0xFF) << 8) | (b(pos + 3) & 0xFF)
      last = (hdr & 0x80000000) != 0
      val btype = (hdr >>> 24) & 0x7F
      val len = hdr & 0xFFFFFF
      pos += 4
      if (btype == 0) { // STREAMINFO
        val r = new BitReader(b, pos)
        r.read(16); r.read(16); r.read(24); r.read(24)
        rate = r.read(20).toInt
        channels = r.read(3).toInt + 1
        bps = r.read(5).toInt + 1
        totalSamples = r.read(36)
      }
      pos += len
    }
    if (rate <= 0 || bps != 16)
      throw new IllegalArgumentException(s"flac: unsupported bps $bps")
    val out = new java.io.ByteArrayOutputStream() // 2 bytes per sample
    var produced = 0L
    while (pos + 2 <= b.length &&
      (totalSamples == 0 || produced < totalSamples)) {
      val frameStart = pos
      val r = new BitReader(b, pos)
      val sync = r.read(14)
      if (sync != 0x3FFE)
        throw new IllegalArgumentException("flac: lost frame sync")
      r.read(1) // reserved
      r.read(1) // blocking strategy
      val bsCode = r.read(4).toInt
      val srCode = r.read(4).toInt
      val chCode = r.read(4).toInt
      val ssCode = r.read(3).toInt
      r.read(1)
      readCodedNumber(r)
      val blockSize = bsCode match {
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => r.read(8).toInt + 1
        case 7 => r.read(16).toInt + 1
        case c if c >= 8 => 256 << (c - 8)
        case _ => throw new IllegalArgumentException("flac: bad blocksize")
      }
      srCode match {
        case 12 => r.read(8)
        case 13 | 14 => r.read(16)
        case _ => ()
      }
      val sampleSize = ssCode match {
        case 0 => bps
        case 1 => 8
        case 2 => 12
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case 7 => 32
        case _ => throw new IllegalArgumentException("flac: bad sample size")
      }
      if (sampleSize != 16)
        throw new IllegalArgumentException("flac: only 16-bit supported")
      val nCh = if (chCode < 8) chCode + 1
        else throw new IllegalArgumentException(
          "flac: stereo decorrelation unsupported")
      if (nCh != channels)
        throw new IllegalArgumentException("flac: channel count mismatch")
      // the header is byte-aligned here; verify its CRC-8
      val crcPos = r.pos
      val c8 = r.read(8).toInt
      if (crc8(b, frameStart, crcPos) != c8)
        throw new IllegalArgumentException("flac: header CRC mismatch")
      // subframes
      val chans = Array.ofDim[Int](nCh, blockSize)
      var ch = 0
      while (ch < nCh) {
        decodeSubframe(r, chans(ch), sampleSize)
        ch += 1
      }
      r.alignByte()
      val frameEndNoCrc = r.pos
      val c16 = ((b(frameEndNoCrc) & 0xFF) << 8) | (b(frameEndNoCrc + 1) & 0xFF)
      if (crc16(b, frameStart, frameEndNoCrc) != c16)
        throw new IllegalArgumentException("flac: frame CRC mismatch")
      pos = frameEndNoCrc + 2
      val take =
        if (totalSamples == 0) blockSize
        else math.min(blockSize.toLong, totalSamples - produced).toInt
      var i = 0
      while (i < take) {
        var acc = 0
        ch = 0
        while (ch < nCh) { acc += chans(ch)(i); ch += 1 }
        val v = acc / nCh
        out.write((v >> 8) & 0xFF); out.write(v & 0xFF)
        i += 1
      }
      produced += take
    }
    val bytes = out.toByteArray
    val pcm = new Array[Short](bytes.length / 2)
    var i = 0
    while (i < pcm.length) {
      pcm(i) = (((bytes(2 * i) & 0xFF) << 8) | (bytes(2 * i + 1) & 0xFF))
        .toShort
      i += 1
    }
    Some((rate, pcm))
  }

  private def decodeSubframe(r: BitReader, out: Array[Int],
                             bps: Int): Unit = {
    val n = out.length
    if (r.read(1) != 0)
      throw new IllegalArgumentException("flac: bad subframe padding")
    val t = r.read(6).toInt
    val wasted = if (r.read(1) == 1) r.readUnary() + 1 else 0
    val eff = bps - wasted
    def signed(bits: Int): Int = {
      val v = r.read(bits)
      ((v << (64 - bits)) >> (64 - bits)).toInt
    }
    t match {
      case 0 => // CONSTANT
        val v = signed(eff)
        java.util.Arrays.fill(out, v << wasted)
      case 1 => // VERBATIM
        var i = 0
        while (i < n) { out(i) = signed(eff) << wasted; i += 1 }
      case o if o >= 8 && o <= 12 => // FIXED, order o-8
        val order = o - 8
        var i = 0
        while (i < order) { out(i) = signed(eff); i += 1 }
        val resid = readRice(r, order, n)
        i = order
        while (i < n) {
          val p = order match {
            case 0 => 0
            case 1 => out(i - 1)
            case 2 => 2 * out(i - 1) - out(i - 2)
            case 3 => 3 * out(i - 1) - 3 * out(i - 2) + out(i - 3)
            case _ => 4 * out(i - 1) - 6 * out(i - 2) + 4 * out(i - 3) -
              out(i - 4)
          }
          out(i) = resid(i - order) + p
          i += 1
        }
        if (wasted > 0) { i = 0; while (i < n) { out(i) <<= wasted; i += 1 } }
      case o if o >= 32 => // LPC, order o-31
        val order = o - 31
        var i = 0
        while (i < order) { out(i) = signed(eff); i += 1 }
        val precision = r.read(4).toInt + 1
        if (precision == 16)
          throw new IllegalArgumentException("flac: invalid lpc precision")
        val shift = {
          val v = r.read(5)
          ((v << 59) >> 59).toInt // signed 5-bit (spec: always >= 0)
        }
        val coefs = new Array[Int](order)
        i = 0
        while (i < order) {
          coefs(i) = { val v = r.read(precision)
            ((v << (64 - precision)) >> (64 - precision)).toInt }
          i += 1
        }
        val resid = readRice(r, order, n)
        i = order
        while (i < n) {
          var acc = 0L
          var k = 0
          while (k < order) { acc += coefs(k).toLong * out(i - 1 - k); k += 1 }
          out(i) = resid(i - order) + (acc >> shift).toInt
          i += 1
        }
        if (wasted > 0) { i = 0; while (i < n) { out(i) <<= wasted; i += 1 } }
      case _ =>
        throw new IllegalArgumentException(s"flac: bad subframe type $t")
    }
  }

  private def readRice(r: BitReader, predOrder: Int,
                       blockSize: Int): Array[Int] = {
    val method = r.read(2).toInt
    if (method > 1)
      throw new IllegalArgumentException("flac: bad residual method")
    val pBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 0xF else 0x1F
    val partOrder = r.read(4).toInt
    val parts = 1 << partOrder
    if (blockSize % parts != 0)
      throw new IllegalArgumentException("flac: bad partition order")
    val out = new Array[Int](blockSize - predOrder)
    var w = 0
    var part = 0
    while (part < parts) {
      val count = (blockSize >> partOrder) -
        (if (part == 0) predOrder else 0)
      val p = r.read(pBits).toInt
      if (p == escape) {
        val raw = r.read(5).toInt
        var i = 0
        while (i < count) {
          out(w) = { val v = r.read(raw)
            if (raw == 0) 0 else ((v << (64 - raw)) >> (64 - raw)).toInt }
          w += 1; i += 1
        }
      } else {
        var i = 0
        while (i < count) {
          val q = r.readUnary()
          val u = (q.toLong << p) | (if (p > 0) r.read(p) else 0L)
          out(w) = ((u >>> 1) ^ -(u & 1L)).toInt // un-zigzag
          w += 1; i += 1
        }
      }
      part += 1
    }
    out
  }
}
