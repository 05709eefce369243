package graft.operators

/** Pure-JVM GIF codec (GIF89a, the public 1990 spec) — the third
  * natively decoded image container after PNG/JPEG. Web corpora still
  * carry GIFs in volume (icons, charts, memes, ancient pages), they are
  * palette-based — at most 256 colors — and LOSSLESS for any raster
  * that fits a palette, which is exactly the grayscale-raster shape the
  * m4 fixtures use: a GIF re-store of an m4b image decodes to the SAME
  * raster, so the closed-form pair oracle carries over verbatim (the
  * m4f/m4g move, applied to a third container).
  *
  * Decode path (the inverse of the fixture encoder below, plus shapes
  * the encoder never emits): header + logical screen descriptor,
  * global and LOCAL color tables, extension blocks skipped by their
  * sub-block framing, the first image descriptor's LZW-compressed
  * index stream (variable-width codes 3..12 bits, LSB-first bit
  * packing across 255-byte sub-blocks, CLEAR/EOI handling, the
  * code==next "KwKwK" case), optional 4-pass interlace, and palette →
  * ITU-R 601 luma (identical to PngCodec's, so cross-container hashes
  * agree exactly on gray palettes). Truncated streams, bad codes,
  * oversized rasters, and missing palettes all return None — degrade,
  * never kill (the 100 TB contract).
  *
  * Scale shape: decode runs inside the caller's mapPartitions batch,
  * one pass over payload bytes, no shuffle — pixels reduce to a 72-cell
  * grid before anything leaves the task. */
object GifCodec {

  private val MaxPixels = 1 << 26 // 64 Mpx degrade cap (a crafted LSD, not a real GIF)

  def isGif(b: Array[Byte]): Boolean =
    b.length >= 13 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  private def leU16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  // 4-pass interlace lattice (GIF89a appendix E): row starts and steps.
  private val IlY0 = Array(0, 4, 2, 1)
  private val IlDY = Array(8, 8, 4, 2)

  /** Storage-class label for coverage cards (the pngClass move):
    * `gif8` / `gif8_interlaced`, with `_local` appended when the first
    * image carries its own color table; `not_gif` for non-GIF bytes,
    * `gif_headerless` when no image descriptor is found. */
  private[graft] def gifClass(b: Array[Byte]): String = {
    if (!isGif(b)) return "not_gif"
    firstImage(b) match {
      case Some((_, _, _, _, interlaced, _, hasLocal, _, _)) =>
        "gif8" + (if (interlaced) "_interlaced" else "") +
          (if (hasLocal) "_local" else "")
      case None => "gif_headerless"
    }
  }

  /** Walk to the first image descriptor: (left, top, w, h, interlaced,
    * activePalette, hasLocalPalette, minCodeSize, dataStart). The
    * palette is the ACTIVE one (local when present, else global). */
  private def firstImage(b: Array[Byte]):
      Option[(Int, Int, Int, Int, Boolean, Array[Int], Boolean, Int, Int)] = {
    if (!isGif(b)) return None
    val packed = b(10) & 0xff
    var i = 13
    var global: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      if (i + 3 * n > b.length) return None
      global = readPalette(b, i, n)
      i += 3 * n
    }
    var guard = 0
    while (i < b.length && guard < 4096) {
      guard += 1
      (b(i) & 0xff) match {
        case 0x21 => // extension: label byte then sub-blocks to a 0 terminator
          i += 2
          var sz = if (i < b.length) b(i) & 0xff else -1
          while (sz > 0) {
            i += 1 + sz
            sz = if (i < b.length) b(i) & 0xff else -1
          }
          if (sz < 0) return None
          i += 1
        case 0x2c => // image descriptor
          if (i + 10 > b.length) return None
          val left = leU16(b, i + 1); val top = leU16(b, i + 3)
          val w = leU16(b, i + 5); val h = leU16(b, i + 7)
          val p = b(i + 9) & 0xff
          var j = i + 10
          var local: Array[Int] = null
          if ((p & 0x80) != 0) {
            val n = 2 << (p & 7)
            if (j + 3 * n > b.length) return None
            local = readPalette(b, j, n)
            j += 3 * n
          }
          if (j >= b.length) return None
          val minCode = b(j) & 0xff
          val pal = if (local != null) local else global
          if (pal == null) return None // no active palette: undecodable
          return Some((left, top, w, h, (p & 0x40) != 0, pal,
            local != null, minCode, j + 1))
        case 0x3b => return None // trailer before any image
        case _ => return None // unknown block type: corrupt
      }
    }
    None
  }

  /** Palette as pre-computed ITU-R 601 luma values (gray palettes map
    * each entry to exactly its gray level — PngCodec's luma). */
  private def readPalette(b: Array[Byte], at: Int, n: Int): Array[Int] =
    Array.tabulate(n) { k =>
      val r = b(at + 3 * k) & 0xff
      val g = b(at + 3 * k + 1) & 0xff
      val bl = b(at + 3 * k + 2) & 0xff
      (299 * r + 587 * g + 114 * bl) / 1000
    }

  /** Decode to a grayscale raster: (width, height, luma per pixel,
    * row-major) — [[PngCodec.decodeGray]]'s contract for GIF. First
    * image only (animation frames beyond the first are out of the
    * dedup fixture's scope — the first frame IS the thumbnail any
    * perceptual pipeline hashes). None on anything malformed. */
  def decodeGray(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    try {
      val (_, _, w, h, interlaced, pal, _, minCode, dataAt) =
        firstImage(b).getOrElse(return None)
      if (w < 1 || h < 1 || w.toLong * h > MaxPixels) return None
      if (minCode < 2 || minCode > 8) return None
      // gather the image's data sub-blocks into one LZW byte stream
      val data = new java.io.ByteArrayOutputStream(4096)
      var i = dataAt
      var sz = if (i < b.length) b(i) & 0xff else -1
      while (sz > 0) {
        if (i + 1 + sz > b.length) return None
        data.write(b, i + 1, sz)
        i += 1 + sz
        sz = if (i < b.length) b(i) & 0xff else -1
      }
      if (sz < 0) return None
      val indices = lzwDecode(data.toByteArray, minCode, w * h)
        .getOrElse(return None)
      // palette lookup (+ optional de-interlace) into the raster
      val px = new Array[Int](w * h)
      if (interlaced) {
        var src = 0
        var pass = 0
        while (pass < 4) {
          var y = IlY0(pass)
          while (y < h) {
            var x = 0
            while (x < w) {
              val ix = indices(src); src += 1
              if (ix >= pal.length) return None
              px(y * w + x) = pal(ix)
              x += 1
            }
            y += IlDY(pass)
          }
          pass += 1
        }
      } else {
        var k = 0
        while (k < w * h) {
          val ix = indices(k)
          if (ix >= pal.length) return None
          px(k) = pal(ix)
          k += 1
        }
      }
      Some((w, h, px))
    } catch {
      case _: IndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  /** GIF-LZW decode of `data` to exactly `n` indices: variable-width
    * codes starting at minCode+1 bits, LSB-first; CLEAR resets the
    * table, EOI (or `n` produced) ends. None on a code past the table
    * (corrupt), starvation, or a stream that ends mid-code. */
  private def lzwDecode(data: Array[Byte], minCode: Int, n: Int): Option[Array[Int]] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    val stack = new Array[Int](4097)
    val out = new Array[Int](n)
    var produced = 0
    var next = eoi + 1
    var width = minCode + 1
    var prev = -1
    var bitBuf = 0L
    var nBits = 0
    var pos = 0
    def firstOf(code: Int): Int = {
      var c = code
      while (c >= clear) c = prefix(c)
      c
    }
    while (produced < n) {
      while (nBits < width) {
        if (pos >= data.length) return None // starved mid-code
        bitBuf |= (data(pos) & 0xffL) << nBits
        pos += 1
        nBits += 8
      }
      val code = (bitBuf & ((1L << width) - 1)).toInt
      bitBuf >>>= width
      nBits -= width
      if (code == clear) {
        next = eoi + 1; width = minCode + 1; prev = -1
      } else if (code == eoi) {
        return if (produced == n) Some(out) else None // short stream
      } else if (prev < 0) {
        if (code >= clear) return None // first code must be a literal
        out(produced) = code; produced += 1
        prev = code
      } else {
        if (code > next || (code == next && next >= 4096)) return None
        // expand `code` (or prev+first(prev) for the KwKwK case)
        var sp = 0
        var c = if (code == next) { stack(sp) = firstOf(prev); sp += 1; prev }
          else code
        while (c >= clear) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
        stack(sp) = c; sp += 1
        val first = c
        while (sp > 0) {
          sp -= 1
          if (produced >= n) return None // more indices than pixels: corrupt
          out(produced) = stack(sp); produced += 1
        }
        if (next < 4096) {
          prefix(next) = prev; suffix(next) = first
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    Some(out)
  }

  // ---- fixture encoder ------------------------------------------------

  /** Encode a grayscale raster as a real GIF89a: global identity gray
    * palette (or, with `localPalette`, NO global table and a local one
    * whose entries are a non-identity permutation of the gray levels —
    * the PLTE-permutation move, so an indices-as-pixels shortcut
    * garbles), real variable-width LZW with table resets, optional
    * 4-pass interlace. Lossless for 8-bit gray rasters by
    * construction; byte-inverse of [[decodeGray]]. */
  def encodeGray(w: Int, h: Int, gray: Array[Int],
      interlaced: Boolean = false, localPalette: Boolean = false): Array[Byte] = {
    require(w >= 1 && h >= 1 && w <= 0xffff && h <= 0xffff,
      s"dims must fit a GIF u16, got ${w}x$h")
    require(gray.length == w * h, s"raster length ${gray.length} != $w*$h")
    val out = new java.io.ByteArrayOutputStream(w * h / 2 + 64)
    out.write("GIF89a".getBytes("US-ASCII"))
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    u16(w); u16(h)
    // LSD packed: GCT flag | color resolution 7 | sort 0 | size 7 (256)
    out.write(if (localPalette) 0x70 else 0xf7)
    out.write(0); out.write(0) // background index, aspect
    // permutation for the local-palette variant: pal(k) = (73k+11)%256,
    // inverse index(g) = 249(g-11) % 256 (73·249 ≡ 1 mod 256)
    val perm = (k: Int) => (73 * k + 11) & 0xff
    val inv = (g: Int) => (249 * (g - 11)) & 0xff
    if (!localPalette) {
      var k = 0
      while (k < 256) { out.write(k); out.write(k); out.write(k); k += 1 }
    }
    // image descriptor
    out.write(0x2c)
    u16(0); u16(0); u16(w); u16(h)
    out.write((if (localPalette) 0x87 else 0x00) | (if (interlaced) 0x40 else 0x00))
    if (localPalette) {
      var k = 0
      while (k < 256) { val v = perm(k); out.write(v); out.write(v); out.write(v); k += 1 }
    }
    // index stream in storage order (interlace reorders rows)
    val idx = new Array[Int](w * h)
    if (interlaced) {
      var dst = 0
      var pass = 0
      while (pass < 4) {
        var y = IlY0(pass)
        while (y < h) {
          var x = 0
          while (x < w) {
            val g = gray(y * w + x) & 0xff
            idx(dst) = if (localPalette) inv(g) else g
            dst += 1; x += 1
          }
          y += IlDY(pass)
        }
        pass += 1
      }
    } else {
      var k = 0
      while (k < w * h) {
        val g = gray(k) & 0xff
        idx(k) = if (localPalette) inv(g) else g
        k += 1
      }
    }
    out.write(8) // LZW minimum code size
    out.write(subBlocks(lzwEncode(idx, 8)))
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Real GIF-LZW encode (string table, variable width, CLEAR on table
    * full) — the exact counterpart of [[lzwDecode]]'s width schedule. */
  private def lzwEncode(idx: Array[Int], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val bytes = new java.io.ByteArrayOutputStream(idx.length / 2 + 64)
    var bitBuf = 0L
    var nBits = 0
    var width = minCode + 1
    def put(code: Int): Unit = {
      bitBuf |= code.toLong << nBits
      nBits += width
      while (nBits >= 8) {
        bytes.write((bitBuf & 0xff).toInt)
        bitBuf >>>= 8
        nBits -= 8
      }
    }
    // dict: (cur << 8 | next-index) → code; cleared on reset
    var dict = new java.util.HashMap[Integer, Integer](8192)
    var next = eoi + 1
    put(clear)
    var cur = idx(0)
    var i = 1
    while (i < idx.length) {
      val c = idx(i)
      val key = Integer.valueOf((cur << 8) | c)
      val hit = dict.get(key)
      if (hit != null) {
        cur = hit.intValue()
      } else {
        put(cur)
        if (next < 4096) {
          dict.put(key, Integer.valueOf(next))
          next += 1
          // the decoder adds its twin entry one CODE later (it cannot
          // form an entry from the first code after a clear), so the
          // encoder's width bump fires one entry after the decoder's
          // `next == 1<<width` point — the classic one-behind sync
          if (next == (1 << width) + 1 && width < 12) width += 1
        } else {
          put(clear)
          dict = new java.util.HashMap[Integer, Integer](8192)
          next = eoi + 1
          width = minCode + 1
        }
        cur = c
      }
      i += 1
    }
    put(cur)
    put(eoi)
    if (nBits > 0) bytes.write((bitBuf & 0xff).toInt)
    bytes.toByteArray
  }

  /** Frame `data` as GIF data sub-blocks (≤255-byte runs, 0 terminator). */
  private def subBlocks(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + data.length / 255 + 2)
    var i = 0
    while (i < data.length) {
      val n = math.min(255, data.length - i)
      out.write(n)
      out.write(data, i, n)
      i += n
    }
    out.write(0)
    out.toByteArray
  }
}
