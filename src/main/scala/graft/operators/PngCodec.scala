package graft.operators

/** Pure-JVM PNG codec — no image libraries in this container, but PNG's
  * pixel path needs none: IDAT is one zlib stream (`java.util.zip`) and
  * the five scanline filters are byte arithmetic. This makes m4's
  * perceptual hash REAL end-to-end for PNG payloads: decode → grayscale
  * → area-resize → gradient-sign dHash. (JPEG and GIF have their own
  * clean-room codecs — [[JpegCodec]]/[[GifCodec]] — so the md5-lattice
  * stub survives only as the counted degrade path for payloads no
  * codec claims.)
  *
  * Scope (r16: EVERY legal PNG pixel format, spec §11.2.2): color
  * types 0 (gray, depths 1/2/4/8/16), 2 (RGB, 8/16), 3 (palette,
  * 1/2/4/8 with PLTE lookup), 4 (gray+alpha, 8/16), 6 (RGBA, 8/16),
  * in BOTH interlace modes (none and Adam7). Sub-byte depths unpack
  * MSB-first within each scanline byte; 16-bit samples are big-endian
  * and reduce to 8-bit luminance by the exact `v·255 / 65535`
  * proportion (so a 16-bit sample `v8·257` maps back to exactly `v8`
  * — lossless cross-depth storage is BY CONSTRUCTION testable).
  * Illegal depth/color-type combos and decode failures return None
  * and never throw (a corrupt payload in a 100 TB corpus must
  * degrade, not kill the task).
  *
  * Scale shape: decode runs inside the caller's mapPartitions batch
  * (one pass over payload bytes, no shuffle); output is w·h ints that
  * immediately reduce to a 72-cell grid — pixels never leave the task.
  */
object PngCodec {

  private val Sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def beU32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  // Adam7 pass geometry (PNG spec §8.2 — the fixed 8×8 interleave
  // lattice): per-pass start offsets and steps over the full raster.
  private val A7X0 = Array(0, 4, 0, 2, 0, 1, 0)
  private val A7Y0 = Array(0, 0, 4, 0, 2, 0, 1)
  private val A7DX = Array(8, 8, 4, 4, 2, 2, 1)
  private val A7DY = Array(8, 8, 8, 4, 4, 2, 2)

  /** Decode to a grayscale raster: (width, height, luminance 0..255 per
    * pixel, row-major). Luminance is the integer ITU-R 601 luma
    * (299·R + 587·G + 114·B) / 1000; alpha is ignored (perceptual
    * hashing compares content, not transparency). Palette images go
    * through the PLTE lookup before the luma; Adam7 streams decode
    * pass by pass (each sub-image unfilters against its OWN previous
    * scanline) and scatter into the full raster. */
  def decodeGray(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    try {
      if (b.length < 45 || !b.startsWith(Sig)) return None
      // IHDR must be the first chunk
      if (beU32(b, 8) != 13L || b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R')
        return None
      val w = beU32(b, 16).toInt
      val h = beU32(b, 20).toInt
      val bitDepth = b(24) & 0xff
      val colorType = b(25) & 0xff
      val interlace = b(28) & 0xff
      if (w <= 0 || h <= 0 || interlace > 1) return None
      // legal depth × color-type combos, spec §11.2.2 — anything else
      // is corrupt and degrades
      val legalDepth = colorType match {
        case 0 => bitDepth == 1 || bitDepth == 2 || bitDepth == 4 ||
          bitDepth == 8 || bitDepth == 16
        case 3 => bitDepth == 1 || bitDepth == 2 || bitDepth == 4 || bitDepth == 8
        case 2 | 4 | 6 => bitDepth == 8 || bitDepth == 16
        case _ => false
      }
      if (!legalDepth) return None
      val ch = colorType match {
        case 0 | 3 => 1 // palette = one index per pixel
        case 2 => 3; case 4 => 2; case _ => 4
      }
      // filter "left" reach in whole bytes (spec §9.2: sub-byte
      // depths round up to 1 — the previous BYTE, not pixel)
      val bpp = math.max(1, ch * bitDepth / 8)
      val maxV = (1 << bitDepth) - 1 // full-scale sample value
      // guard the decompressed size before allocating (a crafted header
      // must not OOM the task): 64 MPix is far past any fixture
      if (w.toLong * h.toLong > 64L * 1024 * 1024) return None

      // concatenate IDAT chunk payloads (one zlib stream split across
      // chunks); capture PLTE for the palette path
      val idat = new java.io.ByteArrayOutputStream()
      var plte: Array[Byte] = null
      var i = 33 // past IHDR (8 sig + 4 len + 4 type + 13 data + 4 crc)
      var sawEnd = false
      while (!sawEnd && i + 8 <= b.length) {
        val len = beU32(b, i)
        if (len > Int.MaxValue - 12 || i + 12L + len > b.length.toLong) return None
        val t = new String(b, i + 4, 4, "US-ASCII")
        if (t == "IDAT") idat.write(b, i + 8, len.toInt)
        else if (t == "PLTE") {
          // exactly one PLTE of 1..256 RGB triples, before any IDAT
          // (spec §11.2.3) — a violation is corrupt, degrade
          if (plte != null || len == 0 || len % 3 != 0 || len > 768 ||
            idat.size() > 0) return None
          plte = java.util.Arrays.copyOfRange(b, i + 8, i + 8 + len.toInt)
        } else if (t == "IEND") sawEnd = true
        i += 12 + len.toInt
      }
      if (colorType == 3 && plte == null) return None
      val comp = idat.toByteArray
      if (comp.isEmpty) return None

      // pass layout: one identity pass when non-interlaced, the seven
      // Adam7 sub-images otherwise (passes empty at this geometry drop
      // out — they contribute NO scanlines, not even a filter byte)
      val passes: Array[(Int, Int, Int, Int, Int, Int)] =
        if (interlace == 0) Array((0, 0, 1, 1, w, h))
        else (0 until 7).iterator.map { p =>
          val pw = if (w > A7X0(p)) (w - A7X0(p) + A7DX(p) - 1) / A7DX(p) else 0
          val ph = if (h > A7Y0(p)) (h - A7Y0(p) + A7DY(p) - 1) / A7DY(p) else 0
          (A7X0(p), A7Y0(p), A7DX(p), A7DY(p), pw, ph)
        }.filter(t => t._5 > 0 && t._6 > 0).toArray
      val rawLen = passes.map(t =>
        (1L + (t._5.toLong * ch * bitDepth + 7) / 8) * t._6).sum
      if (rawLen > Int.MaxValue) return None
      val raw = new Array[Byte](rawLen.toInt)
      // try/finally so end() releases the native zlib buffer on EVERY
      // exit (early None, DataFormatException) — this decode runs per
      // payload inside mapPartitions, so leaking until finalization
      // accumulates native memory on a corrupt-heavy corpus
      val inf = new java.util.zip.Inflater()
      var off = 0
      try {
        inf.setInput(comp)
        while (off < raw.length && !inf.finished()) {
          val n = inf.inflate(raw, off, raw.length - off)
          // any zero-progress return bails: truncated stream
          // (needsInput), preset-dictionary FDICT stream
          // (needsDictionary — inflate would return 0 forever), or a
          // stalled stream. Spinning here would hang the executor task.
          if (n == 0) return None
          off += n
        }
      } finally inf.end()
      if (off != raw.length) return None

      val gray = new Array[Int](w * h)
      var base = 0
      var pi = 0
      while (pi < passes.length) {
        val (x0, y0, dx, dy, pw, ph) = passes(pi)
        val sbw = (pw * ch * bitDepth + 7) / 8 // scanline bytes, sans filter
        val stride = 1 + sbw
        // unfilter the pass in place, scanline by scanline (left/up/
        // avg/Paeth use RECONSTRUCTED bytes of the SAME pass, so order
        // matters and passes never see each other)
        var y = 0
        while (y < ph) {
          val row = base + y * stride
          val filter = raw(row) & 0xff
          if (filter > 4) return None
          var x = 1
          while (x <= sbw) {
            val cur = raw(row + x) & 0xff
            val left = if (x > bpp) raw(row + x - bpp) & 0xff else 0
            val up = if (y > 0) raw(row - stride + x) & 0xff else 0
            val ul = if (y > 0 && x > bpp) raw(row - stride + x - bpp) & 0xff else 0
            val rec = filter match {
              case 0 => cur
              case 1 => cur + left
              case 2 => cur + up
              case 3 => cur + (left + up) / 2
              case 4 => // Paeth predictor
                val p = left + up - ul
                val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
                val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
                cur + pred
            }
            raw(row + x) = (rec & 0xff).toByte
            x += 1
          }
          y += 1
        }
        // luma per pixel, scattered to the pass's lattice positions.
        // Channel samples read at the stream's own depth (MSB-first
        // within a byte for sub-byte depths, big-endian pairs for 16)
        // and reduce to 8-bit by the exact v·255/maxV proportion —
        // identity at depth 8, so the common path is the special case.
        y = 0
        while (y < ph) {
          val row = base + y * stride + 1
          // channel c of pixel x within this scanline
          def sample(x: Int, c: Int): Int = {
            val bit = (x * ch + c) * bitDepth
            val o = row + (bit >> 3)
            if (bitDepth == 16) ((raw(o) & 0xff) << 8) | (raw(o + 1) & 0xff)
            else if (bitDepth == 8) raw(o) & 0xff
            else ((raw(o) & 0xff) >> (8 - bitDepth - (bit & 7))) & maxV
          }
          var x = 0
          while (x < pw) {
            val lum = colorType match {
              case 0 | 4 => sample(x, 0) * 255 / maxV
              case 3 =>
                val e = sample(x, 0) * 3 // palette INDEX — never scaled
                // an index past the palette is corrupt (spec §11.2.3):
                // degrade rather than guess a color
                if (e + 2 >= plte.length) return None
                (299 * (plte(e) & 0xff) + 587 * (plte(e + 1) & 0xff) +
                  114 * (plte(e + 2) & 0xff)) / 1000
              case _ =>
                (299 * (sample(x, 0) * 255 / maxV) +
                  587 * (sample(x, 1) * 255 / maxV) +
                  114 * (sample(x, 2) * 255 / maxV)) / 1000
            }
            gray((y0 + y * dy) * w + (x0 + x * dx)) = lum
            x += 1
          }
          y += 1
        }
        base += stride * ph
        pi += 1
      }
      Some((w, h, gray))
    } catch {
      case _: java.util.zip.DataFormatException => None
    }
  }

  /** Encode a grayscale raster as a real PNG (color type 0, 8-bit,
    * non-interlaced) — the fixture generator for the real-pixel path.
    * `filterForRow` chooses each scanline's filter (0–4), so a fixture
    * can exercise every unfilter branch in one image; filtering is
    * computed against reconstructed bytes exactly as the spec demands,
    * so any conforming decoder round-trips it. */
  def encodeGray(w: Int, h: Int, gray: Array[Int], filterForRow: Int => Int): Array[Byte] = {
    require(gray.length == w * h, s"raster must be w*h=${w * h}, got ${gray.length}")
    val stride = 1 + w
    val raw = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val f = filterForRow(y)
      require(f >= 0 && f <= 4, s"filter must be 0..4, got $f")
      raw(y * stride) = f.toByte
      var x = 0
      while (x < w) {
        val cur = gray(y * w + x) & 0xff
        val left = if (x > 0) gray(y * w + x - 1) & 0xff else 0
        val up = if (y > 0) gray((y - 1) * w + x) & 0xff else 0
        val ul = if (y > 0 && x > 0) gray((y - 1) * w + x - 1) & 0xff else 0
        val enc = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
            cur - pred
        }
        raw(y * stride + 1 + x) = (enc & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val idat = deflate(raw)
    Sig ++ chunk("IHDR", ihdr(w, h, colorType = 0, interlace = 0)) ++
      chunk("IDAT", idat) ++ chunk("IEND", Array.empty[Byte])
  }

  /** Encode a 16-BIT grayscale raster (color type 0, depth 16,
    * non-interlaced) — the cross-depth fixture generator. Samples are
    * 0..65535 big-endian; filters run at the byte level with the
    * spec's bpp=2 left reach, cycling through `filterForRow` so every
    * unfilter branch runs against two-byte neighbors. A raster of
    * `v8 · 257` values decodes back to exactly `v8` per pixel (the
    * decoder's v·255/65535 reduction), which is what makes 8-vs-16-bit
    * storage of the same image losslessly comparable by construction. */
  def encodeGray16(w: Int, h: Int, g16: Array[Int], filterForRow: Int => Int): Array[Byte] = {
    require(g16.length == w * h, s"raster must be w*h=${w * h}, got ${g16.length}")
    val sbw = 2 * w
    val stride = 1 + sbw
    val raw = new Array[Byte](stride * h)
    // reconstructed scanline bytes (the filters predict from these)
    val rec = new Array[Int](h * sbw)
    var y = 0
    while (y < h) {
      var i = 0
      while (i < w) {
        val v = g16(y * w + i) & 0xffff
        rec(y * sbw + 2 * i) = v >> 8
        rec(y * sbw + 2 * i + 1) = v & 0xff
        i += 1
      }
      val f = filterForRow(y)
      require(f >= 0 && f <= 4, s"filter must be 0..4, got $f")
      raw(y * stride) = f.toByte
      var x = 0
      while (x < sbw) {
        val cur = rec(y * sbw + x)
        val left = if (x >= 2) rec(y * sbw + x - 2) else 0
        val up = if (y > 0) rec((y - 1) * sbw + x) else 0
        val ul = if (y > 0 && x >= 2) rec((y - 1) * sbw + x - 2) else 0
        val enc = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
            cur - pred
        }
        raw(y * stride + 1 + x) = (enc & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Sig ++ chunk("IHDR", ihdrDepth(w, h, 16, colorType = 0, interlace = 0)) ++
      chunk("IDAT", deflate(raw)) ++ chunk("IEND", Array.empty[Byte])
  }

  /** Encode a SUB-BYTE grayscale raster (color type 0, depth 1/2/4,
    * non-interlaced). Sample values must already live on the depth's
    * grid (0..2^d−1); they pack MSB-first with zero-padded row tails
    * exactly as §7.2 lays scanlines out, then filter at the byte level
    * (bpp=1). The decoder's v·255/(2^d−1) reduction maps full-scale to
    * 255 exactly. */
  def encodeGraySub(w: Int, h: Int, depth: Int, px: Array[Int],
      filterForRow: Int => Int): Array[Byte] = {
    require(depth == 1 || depth == 2 || depth == 4, s"sub-byte depth 1/2/4, got $depth")
    require(px.length == w * h, s"raster must be w*h=${w * h}, got ${px.length}")
    val packed = packBits(w, h, depth, px)
    val sbw = (w * depth + 7) / 8
    val raw = filterRows1(sbw, h, packed, filterForRow, 0)
    Sig ++ chunk("IHDR", ihdrDepth(w, h, depth, colorType = 0, interlace = 0)) ++
      chunk("IDAT", deflate(raw)) ++ chunk("IEND", Array.empty[Byte])
  }

  /** Encode a SUB-BYTE paletted raster (color type 3, depth 1/2/4):
    * indices pack MSB-first, the PLTE holds 2^d gray entries under a
    * non-identity permutation (entry `(v·(2^d−3)+1) mod 2^d` holds
    * level v — the multiplier is odd for every d, so it's a bijection)
    * scaled to full 8-bit range, proving the lookup genuinely runs at
    * sub-byte depths too. `px` values are gray LEVELS 0..2^d−1. */
  def encodePalettedSub(w: Int, h: Int, depth: Int, px: Array[Int],
      filterForRow: Int => Int): Array[Byte] = {
    require(depth == 1 || depth == 2 || depth == 4, s"sub-byte depth 1/2/4, got $depth")
    require(px.length == w * h, s"raster must be w*h=${w * h}, got ${px.length}")
    val n = 1 << depth
    val mul = n - 3 // odd for d=1 (-1≡1 mod 2), 2, 4 → bijective
    val plte = new Array[Byte](3 * n)
    var v = 0
    while (v < n) {
      val j = ((v * mul + 1) % n + n) % n
      val g8 = v * 255 / (n - 1)
      plte(3 * j) = g8.toByte; plte(3 * j + 1) = g8.toByte; plte(3 * j + 2) = g8.toByte
      v += 1
    }
    val idx = px.map(p => (((p & (n - 1)) * mul + 1) % n + n) % n)
    val packed = packBits(w, h, depth, idx)
    val sbw = (w * depth + 7) / 8
    val raw = filterRows1(sbw, h, packed, filterForRow, 0)
    Sig ++ chunk("IHDR", ihdrDepth(w, h, depth, colorType = 3, interlace = 0)) ++
      chunk("PLTE", plte) ++ chunk("IDAT", deflate(raw)) ++
      chunk("IEND", Array.empty[Byte])
  }

  /** Pack per-pixel sub-byte samples into scanline bytes, MSB-first,
    * rows padded to whole bytes (§7.2) — returns one Int per BYTE so
    * [[filterRows1]] can treat the packed rows as a 1-channel image of
    * width ceil(w·d/8). */
  private def packBits(w: Int, h: Int, depth: Int, px: Array[Int]): Array[Int] = {
    val sbw = (w * depth + 7) / 8
    val out = new Array[Int](sbw * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val bit = x * depth
        out(y * sbw + (bit >> 3)) |=
          (px(y * w + x) & ((1 << depth) - 1)) << (8 - depth - (bit & 7))
        x += 1
      }
      y += 1
    }
    out
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val buf = new Array[Byte](raw.length + 64)
    val out = new java.io.ByteArrayOutputStream()
    while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
    defl.end()
    out.toByteArray
  }

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + data.length)
    bb.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
    val crc = new java.util.zip.CRC32()
    crc.update(bb.array(), 4, 4 + data.length)
    bb.putInt(crc.getValue.toInt)
    bb.array()
  }

  private def ihdr(w: Int, h: Int, colorType: Int, interlace: Int): Array[Byte] =
    ihdrDepth(w, h, 8, colorType, interlace)

  private def ihdrDepth(w: Int, h: Int, depth: Int, colorType: Int,
      interlace: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(depth.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(interlace.toByte).array()

  /** Filter one single-channel (sub-)image into the raw scanline
    * stream: per row, the filter byte from `filterForRow(rowIndex)`
    * then the filtered bytes, computed against reconstructed
    * neighbors exactly as [[encodeGray]] does — shared by the palette
    * and Adam7 fixture encoders (their streams are also one byte per
    * pixel: index bytes and gray bytes filter identically, the PNG
    * filters being semantics-blind byte predictors). `rowBase` keeps
    * the filter cycle position global across Adam7 passes so one
    * image still exercises every branch. */
  private def filterRows1(w: Int, h: Int, px: Array[Int],
      filterForRow: Int => Int, rowBase: Int): Array[Byte] = {
    val stride = 1 + w
    val raw = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val f = filterForRow(rowBase + y)
      require(f >= 0 && f <= 4, s"filter must be 0..4, got $f")
      raw(y * stride) = f.toByte
      var x = 0
      while (x < w) {
        val cur = px(y * w + x) & 0xff
        val left = if (x > 0) px(y * w + x - 1) & 0xff else 0
        val up = if (y > 0) px((y - 1) * w + x) & 0xff else 0
        val ul = if (y > 0 && x > 0) px((y - 1) * w + x - 1) & 0xff else 0
        val enc = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
            cur - pred
        }
        raw(y * stride + 1 + x) = (enc & 0xff).toByte
        x += 1
      }
      y += 1
    }
    raw
  }

  /** Encode a grayscale raster as a PALETTED PNG (color type 3, 8-bit,
    * non-interlaced) — the palette-path fixture generator. The palette
    * is a NON-identity permutation of the 256 gray levels (entry
    * `(v·131+7) mod 256` holds gray v, 131 being odd so the map is a
    * bijection), so a decoder that read index bytes as luminance
    * instead of running the PLTE lookup would reconstruct a scrambled
    * raster and fail any closed-form oracle — decode(encode(g)) == g
    * proves the lookup genuinely runs. */
  def encodePaletted(w: Int, h: Int, gray: Array[Int],
      filterForRow: Int => Int): Array[Byte] = {
    require(gray.length == w * h, s"raster must be w*h=${w * h}, got ${gray.length}")
    val plte = new Array[Byte](768)
    var v = 0
    while (v < 256) {
      val j = (v * 131 + 7) & 0xff
      plte(3 * j) = v.toByte; plte(3 * j + 1) = v.toByte; plte(3 * j + 2) = v.toByte
      v += 1
    }
    val idx = gray.map(g => (((g & 0xff) * 131 + 7) & 0xff))
    val idat = deflate(filterRows1(w, h, idx, filterForRow, 0))
    Sig ++ chunk("IHDR", ihdr(w, h, colorType = 3, interlace = 0)) ++
      chunk("PLTE", plte) ++ chunk("IDAT", idat) ++ chunk("IEND", Array.empty[Byte])
  }

  /** Encode a grayscale raster as an ADAM7-INTERLACED PNG (color type
    * 0, 8-bit) — the interlace-path fixture generator. The seven pass
    * sub-images are extracted on the spec lattice and filtered
    * independently (each against its own previous scanline), with the
    * filter cycle position carried ACROSS passes so every unfilter
    * branch runs somewhere in the image. Byte-inverse of the decoder's
    * interlaced path: decode(encode(g)) == g for any raster. */
  def encodeAdam7(w: Int, h: Int, gray: Array[Int],
      filterForRow: Int => Int): Array[Byte] = {
    require(gray.length == w * h, s"raster must be w*h=${w * h}, got ${gray.length}")
    val out = new java.io.ByteArrayOutputStream()
    var rowBase = 0
    var p = 0
    while (p < 7) {
      val pw = if (w > A7X0(p)) (w - A7X0(p) + A7DX(p) - 1) / A7DX(p) else 0
      val ph = if (h > A7Y0(p)) (h - A7Y0(p) + A7DY(p) - 1) / A7DY(p) else 0
      if (pw > 0 && ph > 0) {
        val sub = new Array[Int](pw * ph)
        var y = 0
        while (y < ph) {
          var x = 0
          while (x < pw) {
            sub(y * pw + x) = gray((A7Y0(p) + y * A7DY(p)) * w + A7X0(p) + x * A7DX(p))
            x += 1
          }
          y += 1
        }
        out.write(filterRows1(pw, ph, sub, filterForRow, rowBase),
          0, (1 + pw) * ph)
        rowBase += ph
      }
      p += 1
    }
    val idat = deflate(out.toByteArray)
    Sig ++ chunk("IHDR", ihdr(w, h, colorType = 0, interlace = 1)) ++
      chunk("IDAT", idat) ++ chunk("IEND", Array.empty[Byte])
  }

  /** REAL perceptual dHash over a decoded raster: area-average the
    * luminance into the canonical 9-column × 8-row grid (the resize
    * step), then bit (r·8+c) = mean(r,c) < mean(r,c+1) — row-wise
    * gradient sign. Means are exact fixed-point (sum·1000 DIV area), so
    * the hash is integer-deterministic on any platform, and adding a
    * constant k to every pixel shifts every mean by exactly k·1000
    * (adding k·n commutes with DIV n) — the brightness-shift invariance
    * that makes dHash a perceptual hash. Needs w ≥ 9, h ≥ 8 (one pixel
    * per cell); callers fall back below that. */
  def dHashPixels(w: Int, h: Int, gray: Array[Int]): Long = {
    require(w >= 9 && h >= 8, s"grid needs w >= 9 and h >= 8, got ${w}x$h")
    val mean = new Array[Long](72)
    var r = 0
    while (r < 8) {
      val y0 = r * h / 8; val y1 = (r + 1) * h / 8
      var c = 0
      while (c < 9) {
        val x0 = c * w / 9; val x1 = (c + 1) * w / 9
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += gray(y * w + x); x += 1 }
          y += 1
        }
        val n = (y1 - y0).toLong * (x1 - x0)
        mean(r * 9 + c) = s * 1000 / n
        c += 1
      }
      r += 1
    }
    var hash = 0L
    r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (mean(r * 9 + c) < mean(r * 9 + c + 1)) hash |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    hash
  }
}
