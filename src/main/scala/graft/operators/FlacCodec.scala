package graft.operators

/** Minimal clean-room FLAC (RFC 9639) support for the audio path — the
  * audio twin of [[Mp4Codec]]'s story: real corpora ship their audio
  * losslessly compressed, not as raw WAV, and an energy-fingerprint
  * dedup keyed on decoded samples must be BLIND to storage or every
  * FLAC re-encode of a WAV clip survives as "unique". FLAC is lossless,
  * so a decode of a re-encoded clip reproduces the PCM samples
  * BIT-EXACTLY and every integer fingerprint downstream (window Σs²,
  * FFT band energies) is identical by construction.
  *
  * Decoder scope, stated honestly: 16-bit streams (the overwhelming
  * real-world case and the only one whose samples are s16 without a
  * lossy narrowing), all four subframe types (constant, verbatim,
  * fixed orders 0–4, LPC orders 1–32), Rice and Rice2 residuals with
  * escape partitions, wasted bits, independent and all three
  * stereo-decorrelated channel layouts (left/side, right/side,
  * mid/side), fixed and variable blocking. Other bit depths and
  * reserved codes degrade to None — counted, never mis-decoded. Both
  * CRCs (header CRC-8, frame CRC-16) are VERIFIED: a corrupted frame
  * degrades the payload rather than shipping wrong samples into a
  * fingerprint.
  *
  * The encoder is the fixture half: verbatim-subframe frames (raw
  * samples behind real frame headers and CRCs) — enough to make every
  * decoder path from the container side real while the spec
  * hand-builds the predicted/decorrelated shapes the encoder never
  * emits. Degrade-never-kill like every parser in this repo: all
  * reads are bounds-checked; malformed streams return None. */
object FlacCodec {

  private final class Eof extends RuntimeException(null, null, false, false)

  private final class Reader(b: Array[Byte], val end: Int) {
    var pos = 0
    private var cur = 0
    private var nbits = 0
    def bytePos: Int = pos - (nbits + 7) / 8 // position of first unread bit's byte
    def aligned: Boolean = nbits % 8 == 0
    def u(n: Int): Int = uLong(n).toInt
    def uLong(n: Int): Long = {
      var v = 0L
      var left = n
      while (left > 0) {
        if (nbits == 0) {
          if (pos >= end) throw new Eof
          cur = b(pos) & 0xff; pos += 1; nbits = 8
        }
        val take = math.min(left, nbits)
        v = (v << take) | ((cur >> (nbits - take)) & ((1 << take) - 1))
        nbits -= take
        left -= take
      }
      v
    }
    def s(n: Int): Int = { // sign-extended
      val v = u(n)
      (v << (32 - n)) >> (32 - n)
    }
    def unary(): Int = { // count of 0 bits before the terminating 1
      var q = 0
      while (u(1) == 0) { q += 1; if (q > (end - bytePos + 8) * 8) throw new Eof }
      q
    }
    def align(): Unit = { nbits -= nbits % 8; if (nbits == 0) () }
  }

  private[graft] def crc8(b: Array[Byte], from: Int, to: Int): Int = {
    var c = 0
    var i = from
    while (i < to) {
      c ^= b(i) & 0xff
      var k = 0
      while (k < 8) { c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff; k += 1 }
      i += 1
    }
    c
  }
  private[graft] def crc16(b: Array[Byte], from: Int, to: Int): Int = {
    var c = 0
    var i = from
    while (i < to) {
      c ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) { c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff else (c << 1) & 0xffff; k += 1 }
      i += 1
    }
    c
  }

  def isFlac(b: Array[Byte]): Boolean =
    b.length >= 8 && b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C'

  /** STREAMINFO only — (sampleRate, channels, bitsPerSample,
    * totalSamples) for the geometry cards, no frame decode. */
  def info(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (!isFlac(b)) return None
    try {
      // first metadata block must be STREAMINFO (type 0), 34 bytes
      if (b.length < 4 + 4 + 34) return None
      if ((b(4) & 0x7f) != 0) return None
      val len = ((b(5) & 0xff) << 16) | ((b(6) & 0xff) << 8) | (b(7) & 0xff)
      if (len < 34) return None
      val o = 8 + 10 // skip min/max blocksize (4) + min/max framesize (6)
      val v = ((b(o) & 0xffL) << 56) | ((b(o + 1) & 0xffL) << 48) |
        ((b(o + 2) & 0xffL) << 40) | ((b(o + 3) & 0xffL) << 32) |
        ((b(o + 4) & 0xffL) << 24) | ((b(o + 5) & 0xffL) << 16) |
        ((b(o + 6) & 0xffL) << 8) | (b(o + 7) & 0xffL)
      val rate = (v >>> 44).toInt
      val ch = ((v >>> 41) & 0x7).toInt + 1
      val bps = ((v >>> 36) & 0x1f).toInt + 1
      val total = v & 0xfffffffffL
      if (rate < 1) None else Some((rate, ch, bps, total))
    } catch { case _: Eof | _: ArrayIndexOutOfBoundsException => None }
  }

  private val FixedCoefs: Array[Array[Int]] = Array(
    Array(), Array(1), Array(2, -1), Array(3, -3, 1), Array(4, -6, 4, -1))

  /** Decode a 16-bit FLAC stream to interleaved s16 samples:
    * (sampleRate, channels, samples) — [[Multimodal]]'s PCM seam for
    * compressed audio storage. None on any malformed, unsupported, or
    * CRC-failing input. */
  def decodeS16(b: Array[Byte]): Option[(Int, Int, Array[Short])] = {
    val (rate, channels, bps, total) = info(b).getOrElse(return None)
    if (bps != 16 || channels < 1 || channels > 8) return None
    try {
      // skip metadata blocks
      var p = 4
      var last = false
      while (!last) {
        if (p + 4 > b.length) return None
        last = (b(p) & 0x80) != 0
        val len = ((b(p + 1) & 0xff) << 16) | ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
        p += 4 + len
        if (p > b.length) return None
      }
      val out = Array.newBuilder[Short]
      var nOut = 0L
      while (p < b.length) {
        val r = new Reader(b, b.length)
        r.pos = p
        val frameStart = p
        // header
        if (r.u(14) != 0x3ffe) return None // sync
        if (r.u(1) != 0) return None // reserved
        r.u(1) // blocking strategy (fixed/variable — number below differs only in meaning)
        val bsCode = r.u(4)
        val srCode = r.u(4)
        val chCode = r.u(4)
        val bpsCode = r.u(3)
        if (r.u(1) != 0) return None // reserved
        // UTF-8-style coded frame/sample number (up to 7 bytes total:
        // leading-ones count L = total bytes, so L-1 continuations)
        val first = r.u(8)
        var ones = 0
        var f = first
        while ((f & 0x80) != 0) { ones += 1; f <<= 1 }
        if (ones == 1 || ones > 7) return None
        var k = 1
        while (k < ones) { if ((r.u(8) & 0xc0) != 0x80) return None; k += 1 }
        val blockSize = bsCode match {
          case 0 => return None
          case 1 => 192
          case n if n >= 2 && n <= 5 => 576 << (n - 2)
          case 6 => r.u(8) + 1
          case 7 => r.u(16) + 1
          case n => 256 << (n - 8)
        }
        srCode match { // extra sample-rate bytes ride the header
          case 12 => r.u(8)
          case 13 | 14 => r.u(16)
          case 15 => return None
          case _ => ()
        }
        val frameBps = bpsCode match {
          case 0 => bps
          case 1 => 8
          case 2 => 12
          case 4 => 16
          case 5 => 20
          case 6 => 24
          case 7 => 32
          case _ => return None
        }
        if (frameBps != 16) return None
        val headerEnd = r.bytePos
        if (crc8(b, frameStart, headerEnd) != r.u(8)) return None
        // channel layout
        val (nCh, sideCh) = chCode match {
          case n if n <= 7 => (n + 1, -1)
          case 8 => (2, 1)  // left/side: side is channel 1
          case 9 => (2, 0)  // right/side: side is channel 0
          case 10 => (2, 1) // mid/side: side is channel 1
          case _ => return None
        }
        if (nCh != channels) return None
        // subframes
        val chans = Array.ofDim[Array[Int]](nCh)
        var c = 0
        while (c < nCh) {
          val chBps = frameBps + (if (c == sideCh) 1 else 0)
          chans(c) = decodeSubframe(r, blockSize, chBps).getOrElse(return None)
          c += 1
        }
        r.align()
        val frameEnd = r.bytePos
        if (crc16(b, frameStart, frameEnd) != r.u(16)) return None
        p = r.bytePos
        // stereo reconstruction
        val pcm: Array[Array[Int]] = chCode match {
          case 8 => // left/side → right = left - side
            Array(chans(0), Array.tabulate(blockSize)(i => chans(0)(i) - chans(1)(i)))
          case 9 => // right/side → left = right + side
            Array(Array.tabulate(blockSize)(i => chans(1)(i) + chans(0)(i)), chans(1))
          case 10 => // mid/side: l+r parity rides side's LSB
            val l = new Array[Int](blockSize); val rr = new Array[Int](blockSize)
            var i = 0
            while (i < blockSize) {
              val side = chans(1)(i)
              val m2 = (chans(0)(i) << 1) | (side & 1)
              l(i) = (m2 + side) >> 1; rr(i) = (m2 - side) >> 1
              i += 1
            }
            Array(l, rr)
          case _ => chans
        }
        // Output budget, checked BEFORE the emit loop and independent
        // of STREAMINFO total_samples (0 = "unknown" is spec-legal and
        // attacker-controlled): constant subframes emit up to 65536
        // samples from ~35 input bytes, a ~30000× amplification into
        // the builder, so an nOut bound keyed only on `total` is no
        // bound at all. 2^26 interleaved s16s (128 MiB, ~12 min of
        // stereo 44.1 kHz) is far beyond any clip this engine
        // fingerprints and still caps the task; breach degrades to
        // None per the module contract. A declared total is also
        // enforced as it accrues, not just at EOF.
        if ((nOut + blockSize) * nCh > (1L << 26) ||
          (total > 0 && nOut + blockSize > total)) return None
        var i = 0
        while (i < blockSize) {
          var cc = 0
          while (cc < nCh) {
            val v = pcm(cc)(i)
            out += (if (v > 32767) 32767 else if (v < -32768) -32768 else v).toShort
            cc += 1
          }
          i += 1
        }
        nOut += blockSize
      }
      if (nOut == 0 || (total > 0 && nOut != total)) None
      else Some((rate, channels, out.result()))
    } catch { case _: Eof | _: ArrayIndexOutOfBoundsException => None }
  }

  /** One subframe to raw channel samples, or None on reserved codes /
    * malformed residuals. */
  private def decodeSubframe(r: Reader, blockSize: Int, bps: Int): Option[Array[Int]] = {
    if (r.u(1) != 0) return None // pad bit
    val ty = r.u(6)
    val wasted = if (r.u(1) == 1) r.unary() + 1 else 0
    val eff = bps - wasted
    if (eff < 1 || eff > 32) return None
    val x = new Array[Int](blockSize)
    ty match {
      case 0 => // constant
        val v = r.s(eff); java.util.Arrays.fill(x, v)
      case 1 => // verbatim
        var i = 0
        while (i < blockSize) { x(i) = r.s(eff); i += 1 }
      case t if t >= 8 && t <= 12 => // fixed, order t-8
        val order = t - 8
        if (order > blockSize) return None
        var i = 0
        while (i < order) { x(i) = r.s(eff); i += 1 }
        if (!readResidual(r, blockSize, order, x)) return None
        val cf = FixedCoefs(order)
        i = order
        while (i < blockSize) {
          var acc = x(i).toLong
          var j = 0
          while (j < order) { acc += cf(j).toLong * x(i - 1 - j); j += 1 }
          x(i) = acc.toInt
          i += 1
        }
      case t if t >= 32 => // LPC, order t-31
        val order = t - 31
        if (order > blockSize) return None
        var i = 0
        while (i < order) { x(i) = r.s(eff); i += 1 }
        val prec = r.u(4) + 1
        if (prec > 15) return None
        val shift = r.s(5)
        if (shift < 0) return None
        val coefs = new Array[Int](order)
        i = 0
        while (i < order) { coefs(i) = r.s(prec); i += 1 }
        if (!readResidual(r, blockSize, order, x)) return None
        i = order
        while (i < blockSize) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coefs(j).toLong * x(i - 1 - j); j += 1 }
          x(i) = (x(i) + (acc >> shift)).toInt
          i += 1
        }
      case _ => return None
    }
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { x(i) <<= wasted; i += 1 }
    }
    Some(x)
  }

  /** Partitioned-Rice residual into x(order until blockSize); true on
    * success. Handles Rice (4-bit params) and Rice2 (5-bit), escape
    * partitions (raw n-bit residuals), and the partition-count rules
    * (blocksize divisible by 2^po, first partition shortened by the
    * predictor order). */
  private def readResidual(r: Reader, blockSize: Int, order: Int, x: Array[Int]): Boolean = {
    val method = r.u(2)
    if (method > 1) return false
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val po = r.u(4)
    if ((blockSize & ((1 << po) - 1)) != 0) return false
    val perPart = blockSize >> po
    if (perPart <= 0 || perPart < order) return false // first partition is shortened by order
    var i = order
    var part = 0
    val nPart = 1 << po
    while (part < nPart) {
      val count = if (part == 0) perPart - order else perPart
      if (count < 0) return false
      val param = r.u(pBits)
      if (param == escape) {
        val raw = r.u(5)
        var k = 0
        while (k < count) { x(i) = if (raw == 0) 0 else r.s(raw); i += 1; k += 1 }
      } else {
        var k = 0
        while (k < count) {
          val q = r.unary()
          val v = (q.toLong << param) | r.u(param)
          x(i) = ((v >>> 1) ^ -(v & 1L)).toInt
          i += 1; k += 1
        }
      }
      part += 1
    }
    i == blockSize
  }

  // ---- fixture encoder ------------------------------------------------

  private[graft] final class Writer {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    def put(v: Long, n: Int): Unit = {
      var left = n
      while (left > 0) {
        val take = math.min(8 - nbits, left)
        cur = (cur << take) | ((v >>> (left - take)) & ((1L << take) - 1)).toInt
        nbits += take
        left -= take
        if (nbits == 8) { buf.write(cur); cur = 0; nbits = 0 }
      }
    }
    def align(): Unit = if (nbits > 0) { buf.write(cur << (8 - nbits)); cur = 0; nbits = 0 }
    def bytes: Array[Byte] = { align(); buf.toByteArray }
  }

  private[graft] def utf8Coded(w: Writer, v: Long): Unit = {
    // standard UTF-8 multi-byte shape over the frame number
    if (v < 0x80) w.put(v, 8)
    else {
      var n = 1
      while (v >= (1L << (n * 6 + (6 - n))) && n < 6) n += 1 // bits capacity: 6-n header payload + 6 per cont
      w.put((0xff << (7 - n)) & 0xff | (v >>> (6 * n)).toInt, 8)
      var k = n - 1
      while (k >= 0) { w.put(0x80 | ((v >>> (6 * k)) & 0x3f).toInt, 8); k -= 1 }
    }
  }

  /** Verbatim-subframe FLAC: real stream structure (STREAMINFO, frame
    * headers, both CRCs, per-channel subframes) around raw samples —
    * the fixture half of the codec, byte-decodable by [[decodeS16]]
    * and by any conforming decoder. `samples` are interleaved s16. */
  def encodeVerbatim(sampleRate: Int, channels: Int, samples: Array[Short],
      blockSize: Int = 4096): Array[Byte] = {
    require(channels >= 1 && channels <= 8, s"channels must be 1..8, got $channels")
    require(sampleRate >= 1 && sampleRate < (1 << 20), s"bad sample rate $sampleRate")
    require(samples.length % channels == 0, "samples must be whole frames")
    require(blockSize >= 16 && blockSize <= 65535, s"bad blockSize $blockSize")
    val totalFrames = samples.length / channels
    val head = new Writer
    head.put(0x664c6143L, 32) // fLaC
    head.put(0x80, 8); head.put(34, 24) // last-block STREAMINFO
    val lastBs = if (totalFrames % blockSize == 0) blockSize else totalFrames % blockSize
    head.put(math.min(blockSize, lastBs), 16); head.put(blockSize, 16)
    head.put(0, 24); head.put(0, 24) // frame sizes unknown
    head.put(sampleRate, 20); head.put(channels - 1, 3); head.put(16 - 1, 5)
    head.put(totalFrames, 36)
    (0 until 16).foreach(_ => head.put(0, 8)) // md5 unset (allowed)
    val out = new java.io.ByteArrayOutputStream()
    out.write(head.bytes)
    var frameIdx = 0L
    var off = 0
    while (off < totalFrames) {
      val bs = math.min(blockSize, totalFrames - off)
      val w = new Writer
      w.put(0x3ffe, 14); w.put(0, 1); w.put(0, 1) // sync, reserved, fixed blocking
      w.put(7, 4) // blocksize: 16-bit follows
      w.put(0, 4) // sample rate: streaminfo
      w.put(channels - 1, 4) // independent channels
      w.put(4, 3); w.put(0, 1) // bps 16, reserved
      utf8Coded(w, frameIdx)
      w.put(bs - 1, 16)
      val headerBytes = w.bytes
      val fw = new Writer
      headerBytes.foreach(x => fw.put(x & 0xffL, 8))
      fw.put(crc8(headerBytes, 0, headerBytes.length), 8)
      var c = 0
      while (c < channels) {
        fw.put(0, 1); fw.put(1, 6); fw.put(0, 1) // pad, verbatim, no wasted bits
        var i = 0
        while (i < bs) { fw.put(samples((off + i) * channels + c) & 0xffffL, 16); i += 1 }
        c += 1
      }
      val frameBytes = fw.bytes // align() pads the last byte with zeros
      val withCrc = new Writer
      frameBytes.foreach(x => withCrc.put(x & 0xffL, 8))
      withCrc.put(crc16(frameBytes, 0, frameBytes.length), 16)
      out.write(withCrc.bytes)
      off += bs
      frameIdx += 1
    }
    out.toByteArray
  }
}
