package graft.operators

/** Pure-JVM baseline JPEG codec — the last modality that genuinely
  * needed a codec, built from the public ITU T.81 primitives: marker
  * walk, canonical Huffman entropy decode, dequantization, 8×8 inverse
  * DCT. This retires the final synthetic data path in the multimodal
  * family: m4's perceptual hash now runs on REAL pixels for JPEG
  * payloads too (decode → luma → area-resize → gradient-sign dHash).
  *
  * Scope: baseline and extended sequential DCT (SOF0/SOF1), 8-bit,
  * 1 or 3 components, any sampling factors, restart markers. The luma
  * output IS the Y channel — chroma blocks are entropy-decoded (the
  * bitstream demands it) but never dequantized or IDCT'd, because the
  * perceptual hash compares luminance only; that skips two thirds of
  * the IDCT work on 4:4:4 images. Progressive (SOF2), arithmetic
  * coding, 12-bit, and hierarchical return None and the caller falls
  * back to its stub path; decode failures never throw or spin (every
  * loop bails on zero progress — a corrupt payload in a 100 TB corpus
  * must degrade, not kill or hang the task).
  *
  * Scale shape: decode runs inside the caller's mapPartitions batch
  * (one pass over payload bytes, no shuffle); pixels reduce to a
  * 72-cell grid inside the task and never leave it.
  */
object JpegCodec {

  private val Zigzag = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** cos((2x+1)·u·π/16) · C(u)/2 for the separable (I)DCT — doubles are
    * IEEE-deterministic for +,-,*,/ so decode is platform-stable. */
  private val Cos: Array[Double] = {
    val t = new Array[Double](64)
    var u = 0
    while (u < 8) {
      val cu = if (u == 0) math.sqrt(0.5) else 1.0
      var x = 0
      while (x < 8) {
        t(u * 8 + x) = 0.5 * cu * math.cos((2 * x + 1) * u * math.Pi / 16)
        x += 1
      }
      u += 1
    }
    t
  }

  // ---- canonical Huffman (T.81 Annex C construction) ----
  private final class Huff(counts: Array[Int], vals: Array[Int]) {
    private val minCode = new Array[Int](17)
    private val maxCode = Array.fill(17)(-1)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        if (counts(l - 1) > 0) {
          valPtr(l) = k; minCode(l) = code
          code += counts(l - 1); k += counts(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1; l += 1
      }
    }
    /** Next symbol, or Int.MinValue on a malformed/exhausted stream. */
    def decode(r: BitReader): Int = {
      var code = 0; var l = 1
      while (l <= 16) {
        val bit = r.nextBit()
        if (bit < 0) return Int.MinValue
        code = (code << 1) | bit
        if (maxCode(l) >= 0 && code <= maxCode(l))
          return vals(valPtr(l) + code - minCode(l))
        l += 1
      }
      Int.MinValue
    }
  }

  /** MSB-first bit reader over entropy-coded bytes with 0xFF00
    * unstuffing; any bare marker (including RST — consumed explicitly
    * by the MCU loop, never mid-block) halts bit delivery. */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    def nextBit(): Int = {
      if (cnt == 0) {
        if (pos >= b.length) return -1
        val v = b(pos) & 0xff
        if (v == 0xff) {
          if (pos + 1 >= b.length) return -1
          if ((b(pos + 1) & 0xff) != 0x00) return -1 // a marker, not data
          pos += 2
        } else pos += 1
        buf = v; cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) {
        val bit = nextBit(); if (bit < 0) return Int.MinValue
        v = (v << 1) | bit; i += 1
      }
      v
    }
    def align(): Unit = cnt = 0
  }

  /** T.81 F.2.2.1 sign extension: an n-bit magnitude field encodes
    * [−2ⁿ+1, −2ⁿ⁻¹] ∪ [2ⁿ⁻¹, 2ⁿ−1]. */
  private def extend(v: Int, n: Int): Int =
    if (n == 0) 0 else if (v < (1 << (n - 1))) v - (1 << n) + 1 else v

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int)

  /** Decode to a grayscale raster: (width, height, luma 0..255,
    * row-major). The Y channel is the luma (chroma never touches the
    * output). None for anything outside the documented scope. */
  def decodeGray(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    val qt = Array.ofDim[Int](4, 64) // natural order
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var comps: Array[Comp] = null
    var scanDc: Array[Int] = null
    var scanAc: Array[Int] = null
    var scanOrder: Array[Int] = null // SOF comp indices in SOS listing order
    var w = 0; var h = 0
    var restartInterval = 0
    var scanStart = -1

    var i = 2
    while (scanStart < 0) {
      // marker walk: skip 0xFF fill bytes, read marker + length
      while (i < b.length && (b(i) & 0xff) == 0xff && i + 1 < b.length &&
        (b(i + 1) & 0xff) == 0xff) i += 1
      if (i + 3 >= b.length || (b(i) & 0xff) != 0xff) return None
      val marker = b(i + 1) & 0xff
      if (marker == 0xd9) return None // EOI before any scan
      val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
      if (len < 2 || i + 2 + len > b.length) return None
      val seg = i + 4
      val segEnd = i + 2 + len
      marker match {
        case 0xdb => // DQT: one or more tables
          var p = seg
          while (p < segEnd) {
            val pq = (b(p) >> 4) & 0xf; val tq = b(p) & 0xf
            if (pq != 0 || tq > 3 || p + 65 > segEnd) return None // 8-bit only
            var k = 0
            while (k < 64) { qt(tq)(Zigzag(k)) = b(p + 1 + k) & 0xff; k += 1 }
            p += 65
          }
        case 0xc0 | 0xc1 => // SOF0/SOF1: baseline / extended sequential
          if (seg + 6 > segEnd || (b(seg) & 0xff) != 8) return None
          h = ((b(seg + 1) & 0xff) << 8) | (b(seg + 2) & 0xff)
          w = ((b(seg + 3) & 0xff) << 8) | (b(seg + 4) & 0xff)
          val nc = b(seg + 5) & 0xff
          if (w <= 0 || h <= 0 || (nc != 1 && nc != 3)) return None
          if (w.toLong * h.toLong > 64L * 1024 * 1024) return None
          if (seg + 6 + 3 * nc > segEnd) return None
          comps = Array.tabulate(nc) { c =>
            val o = seg + 6 + 3 * c
            val comp = Comp(b(o) & 0xff, (b(o + 1) >> 4) & 0xf, b(o + 1) & 0xf, b(o + 2) & 0xf)
            if (comp.h < 1 || comp.h > 4 || comp.v < 1 || comp.v > 4 || comp.tq > 3)
              return None
            comp
          }
        case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
          return None // progressive / lossless / arithmetic / hierarchical
        case 0xc4 => // DHT: one or more tables
          var p = seg
          while (p < segEnd) {
            if (p + 17 > segEnd) return None
            val tc = (b(p) >> 4) & 0xf; val th = b(p) & 0xf
            if (tc > 1 || th > 3) return None
            val counts = Array.tabulate(16)(l => b(p + 1 + l) & 0xff)
            val total = counts.sum
            if (total > 256 || p + 17 + total > segEnd) return None
            val vals = Array.tabulate(total)(k => b(p + 17 + k) & 0xff)
            val tab = new Huff(counts, vals)
            if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
            p += 17 + total
          }
        case 0xdd => // DRI
          if (seg + 2 > segEnd) return None
          restartInterval = ((b(seg) & 0xff) << 8) | (b(seg + 1) & 0xff)
        case 0xda => // SOS
          if (comps == null || seg + 1 > segEnd) return None
          val ns = b(seg) & 0xff
          if (ns != comps.length || seg + 1 + 2 * ns + 3 > segEnd) return None
          scanDc = new Array[Int](comps.length)
          scanAc = new Array[Int](comps.length)
          // T.81 interleaves MCU data in SCAN-HEADER order, which may
          // differ from SOF order — record it and walk it in the MCU
          // loop (decoding in SOF order would silently scramble the
          // block layout of a conforming reordered stream)
          scanOrder = new Array[Int](ns)
          var c = 0
          while (c < ns) {
            val cid = b(seg + 1 + 2 * c) & 0xff
            val ix = comps.indexWhere(_.id == cid)
            if (ix < 0) return None
            var dup = 0
            while (dup < c) { if (scanOrder(dup) == ix) return None; dup += 1 }
            scanOrder(c) = ix
            scanDc(ix) = (b(seg + 2 + 2 * c) >> 4) & 0xf
            scanAc(ix) = b(seg + 2 + 2 * c) & 0xf
            c += 1
          }
          scanStart = segEnd
        case _ => // APPn / COM / others: skip by length
      }
      if (scanStart < 0) {
        if (segEnd <= i) return None // zero progress would spin forever
        i = segEnd
      }
    }

    // ---- scan decode ----
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    val y0 = comps(0) // luma: the single component, or Y of YCbCr
    val planeW = mcusX * y0.h * 8 // padded Y plane
    val planeH = mcusY * y0.v * 8
    val plane = new Array[Int](planeW * planeH)
    val preds = new Array[Int](comps.length)
    val zz = new Array[Int](64)
    val r = new BitReader(b, scanStart)
    var rstExpect = 0
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        r.align()
        // T.81 permits any number of 0xFF fill bytes before a marker
        // (B.1.1.2) — skip them like the header walk does, or padded
        // streams from conforming encoders would degrade to None
        var p = r.pos
        while (p + 1 < b.length && (b(p) & 0xff) == 0xff &&
          (b(p + 1) & 0xff) == 0xff) p += 1
        if (p + 1 >= b.length || (b(p) & 0xff) != 0xff ||
          (b(p + 1) & 0xff) != 0xd0 + rstExpect) return None
        r.pos = p + 2
        rstExpect = (rstExpect + 1) % 8
        java.util.Arrays.fill(preds, 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      var so = 0
      while (so < scanOrder.length) {
        val ci = scanOrder(so)
        val comp = comps(ci)
        var by = 0
        while (by < comp.v) {
          var bx = 0
          while (bx < comp.h) {
            // DC
            val t = dcTabs(scanDc(ci)) match {
              case null => return None
              case tab => tab.decode(r)
            }
            if (t == Int.MinValue || t > 15) return None
            val diffBits = r.receive(t)
            if (diffBits == Int.MinValue) return None
            preds(ci) += extend(diffBits, t)
            val isLuma = ci == 0
            if (isLuma) { java.util.Arrays.fill(zz, 0); zz(0) = preds(ci) * qt(comp.tq)(0) }
            // AC
            val ac = acTabs(scanAc(ci)); if (ac == null) return None
            var k = 1
            var done = false
            while (!done && k < 64) {
              val rs = ac.decode(r)
              if (rs == Int.MinValue) return None
              val run = (rs >> 4) & 0xf; val size = rs & 0xf
              if (size == 0) {
                if (run == 15) k += 16 else done = true // ZRL / EOB
              } else {
                k += run
                if (k > 63) return None
                val bits = r.receive(size)
                if (bits == Int.MinValue) return None
                // qt is natural-ordered; k walks zigzag order, so the
                // coefficient at zigzag k dequantizes by qt[Zigzag(k)]
                // (indexing by k is only right for uniform tables)
                if (isLuma) zz(Zigzag(k)) = extend(bits, size) * qt(comp.tq)(Zigzag(k))
                k += 1
              }
            }
            if (isLuma) {
              // separable IDCT: rows then columns
              val tmp = new Array[Double](64)
              var yy = 0
              while (yy < 8) {
                var x = 0
                while (x < 8) {
                  var s = 0.0; var u = 0
                  while (u < 8) { s += Cos(u * 8 + x) * zz(yy * 8 + u); u += 1 }
                  tmp(yy * 8 + x) = s
                  x += 1
                }
                yy += 1
              }
              val px0 = (mx * comp.h + bx) * 8
              val py0 = (my * comp.v + by) * 8
              var x = 0
              while (x < 8) {
                var yv = 0
                while (yv < 8) {
                  var s = 0.0; var v = 0
                  while (v < 8) { s += Cos(v * 8 + yv) * tmp(v * 8 + x); v += 1 }
                  val p = math.round(s + 128.0).toInt
                  plane((py0 + yv) * planeW + px0 + x) =
                    if (p < 0) 0 else if (p > 255) 255 else p
                  yv += 1
                }
                x += 1
              }
            }
            bx += 1
          }
          by += 1
        }
        so += 1
      }
      mcu += 1
    }

    // crop the padded plane to image dims, nearest-neighbor if the luma
    // is subsampled relative to hmax/vmax (legal but vanishingly rare)
    val gray = new Array[Int](w * h)
    var yv = 0
    while (yv < h) {
      val sy = yv * y0.v / vmax
      var x = 0
      while (x < w) {
        gray(yv * w + x) = plane(sy * planeW + x * y0.h / hmax)
        x += 1
      }
      yv += 1
    }
    Some((w, h, gray))
  }

  // ---- grayscale baseline encoder (the fixture generator) ----

  /** Encoder Huffman spec: every symbol at one code length (12 DC
    * categories at 4 bits, all 162 (run,size) AC symbols at 8 bits) —
    * a valid canonical table (count < 2^len keeps the all-ones code
    * free) that any conforming decoder reads, chosen over the Annex K
    * defaults for construction-from-first-principles clarity. */
  private val DcCounts = { val c = new Array[Int](16); c(3) = 12; c }
  private val DcVals = Array.tabulate(12)(identity)
  private val AcVals: Array[Int] = {
    val out = Array.newBuilder[Int]
    out += 0x00 // EOB
    var run = 0
    while (run < 16) {
      var size = 1
      while (size <= 10) { out += (run << 4) | size; size += 1 }
      run += 1
    }
    out += 0xf0 // ZRL
    out.result()
  }
  private val AcCounts = { val c = new Array[Int](16); c(7) = AcVals.length; c }

  private def codesFor(counts: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0; var k = 0; var l = 1
    val m = Map.newBuilder[Int, (Int, Int)]
    while (l <= 16) {
      var c = 0
      while (c < counts(l - 1)) { m += vals(k) -> (code, l); code += 1; k += 1; c += 1 }
      code <<= 1; l += 1
    }
    m.result()
  }
  private lazy val DcCodes = codesFor(DcCounts, DcVals)
  private lazy val AcCodes = codesFor(AcCounts, AcVals)

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def put(code: Int, len: Int): Unit = {
      var l = len - 1
      while (l >= 0) {
        buf = (buf << 1) | ((code >> l) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf)
          if (buf == 0xff) out.write(0x00) // byte stuffing
          buf = 0; cnt = 0
        }
        l -= 1
      }
    }
    def flush(): Unit = if (cnt > 0) { put(0x7f, 8 - cnt) } // pad with 1s
  }

  private def category(v: Int): Int =
    if (v == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Fill `block` with level-shifted samples from `plane` (w×h) at
    * block position (bxi, byi), edge-padded by clamping. */
  private def fillBlock(plane: Array[Int], w: Int, h: Int, bxi: Int,
      byi: Int, block: Array[Double]): Unit = {
    var y = 0
    while (y < 8) {
      val sy = math.min(byi * 8 + y, h - 1)
      var x = 0
      while (x < 8) {
        val sx = math.min(bxi * 8 + x, w - 1)
        block(y * 8 + x) = plane(sy * w + sx) - 128.0
        x += 1
      }
      y += 1
    }
  }

  /** Separable FDCT + quantize into zigzag-ordered coefficients. */
  private def fdctQuant(block: Array[Double], quant: Array[Int],
      coef: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var yy = 0
      while (yy < 8) {
        var s = 0.0; var x = 0
        while (x < 8) { s += Cos(u * 8 + x) * block(yy * 8 + x); x += 1 }
        tmp(yy * 8 + u) = s
        yy += 1
      }
      u += 1
    }
    var k = 0
    while (k < 64) {
      val nu = Zigzag(k) % 8; val nv = Zigzag(k) / 8
      var s = 0.0; var yy = 0
      while (yy < 8) { s += Cos(nv * 8 + yy) * tmp(yy * 8 + nu); yy += 1 }
      coef(k) = math.round(s / quant(Zigzag(k))).toInt
      k += 1
    }
  }

  /** Huffman-encode one zigzag coefficient block against `pred`;
    * returns the block's DC (the next predictor). */
  private def writeBlock(bw: BitWriter, coef: Array[Int], pred: Int): Int = {
    val diff = coef(0) - pred
    val dcCat = category(diff)
    val (dcCode, dcLen) = DcCodes(dcCat)
    bw.put(dcCode, dcLen)
    if (dcCat > 0) bw.put(if (diff < 0) diff + (1 << dcCat) - 1 else diff, dcCat)
    var lastNz = 63
    while (lastNz > 0 && coef(lastNz) == 0) lastNz -= 1
    var k = 1
    while (k <= lastNz) {
      var run = 0
      while (coef(k) == 0) { run += 1; k += 1 }
      while (run >= 16) {
        val (zc, zl) = AcCodes(0xf0); bw.put(zc, zl); run -= 16
      }
      val v = coef(k)
      val cat = category(v)
      val (c2, l2) = AcCodes((run << 4) | cat)
      bw.put(c2, l2)
      bw.put(if (v < 0) v + (1 << cat) - 1 else v, cat)
      k += 1
    }
    if (lastNz < 63) { val (ec, el) = AcCodes(0x00); bw.put(ec, el) }
    coef(0)
  }

  /** One encoder component: its sample plane (pw×ph) and sampling
    * factors. The luma plane is full-resolution; a subsampled chroma
    * plane carries ceil(w·h/hmax) × ceil(h·v/vmax) samples. */
  private final case class EncComp(plane: Array[Int], pw: Int, ph: Int,
      hs: Int, vs: Int)

  /** Shared header + MCU-loop encoder over arbitrary per-component
    * sampling (1 = grayscale, 3 = YCbCr; an MCU holds hs×vs blocks per
    * component, interleaved in component order per T.81).
    * `restartInterval` > 0 emits DRI and an RSTn every that many MCUs
    * (byte-aligned, predictors reset) — the fixture knob that makes
    * the decoder's restart path testable. `scanOrder` (a permutation
    * of component indices; empty = SOF order) lists — and interleaves
    * — the scan in a different order than SOF, the T.81-legal layout
    * that makes the decoder's SOS-order walk testable. */
  private def encodePlanes(w: Int, h: Int, comps: Seq[EncComp],
      quant: Array[Int], restartInterval: Int,
      scanOrder: Seq[Int] = Nil): Array[Byte] = {
    require(comps.nonEmpty && comps.size <= 3 && comps.size != 2,
      s"1 (gray) or 3 (YCbCr) components, got ${comps.size}")
    comps.foreach(c => require(c.plane.length == c.pw * c.ph,
      s"plane must be ${c.pw}x${c.ph}=${c.pw * c.ph}, got ${c.plane.length}"))
    require(quant.length == 64 && quant.forall(q => q >= 1 && q <= 255),
      "quant table must be 64 values in 1..255")
    require(restartInterval >= 0 && restartInterval <= 65535,
      s"restart interval must fit u16, got $restartInterval")
    val order = if (scanOrder.isEmpty) comps.indices else scanOrder
    require(order.sorted == comps.indices,
      s"scanOrder must be a permutation of 0..${comps.size - 1}, got $scanOrder")
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    val nc = comps.size
    marker(0xd8) // SOI
    marker(0xdb); u16(2 + 65); out.write(0x00) // DQT table 0, 8-bit
    var k = 0
    while (k < 64) { out.write(quant(Zigzag(k))); k += 1 }
    marker(0xc0); u16(8 + 3 * nc) // SOF0
    out.write(8); u16(h); u16(w); out.write(nc)
    var ci = 0
    while (ci < nc) { // ids 1..nc, sampling factors, qtable 0
      out.write(ci + 1); out.write((comps(ci).hs << 4) | comps(ci).vs)
      out.write(0); ci += 1
    }
    def dht(tc: Int, counts: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length); out.write(tc << 4)
      counts.foreach(out.write); vals.foreach(out.write)
    }
    dht(0, DcCounts, DcVals)
    dht(1, AcCounts, AcVals)
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }
    marker(0xda); u16(6 + 2 * nc) // SOS: components in scan order
    out.write(nc)
    order.foreach { ci => // every component: DC slot 0, AC slot 0
      out.write(ci + 1); out.write(0x00)
    }
    out.write(0); out.write(63); out.write(0) // Ss, Se, Ah/Al

    val bw = new BitWriter(out)
    val hmax = comps.map(_.hs).max
    val vmax = comps.map(_.vs).max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    val block = new Array[Double](64)
    val coef = new Array[Int](64)
    val preds = new Array[Int](nc)
    var rst = 0
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.flush() // byte-align the entropy data before the marker
        marker(0xd0 + rst)
        rst = (rst + 1) % 8
        java.util.Arrays.fill(preds, 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      order.foreach { ci =>
        val c = comps(ci)
        var by = 0
        while (by < c.vs) {
          var bx = 0
          while (bx < c.hs) {
            fillBlock(c.plane, c.pw, c.ph, mx * c.hs + bx, my * c.vs + by, block)
            fdctQuant(block, quant, coef)
            preds(ci) = writeBlock(bw, coef, preds(ci))
            bx += 1
          }
          by += 1
        }
      }
      mcu += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Encode a grayscale raster as baseline JPEG (SOF0, one component,
    * 1×1 sampling). `quant` is the 64-entry quantization table in
    * natural order (all-1s ≈ near-lossless: round-trip error is DCT
    * coefficient rounding only, so a fixture's cell means survive
    * within ±1 — the margin [[graft.operators.Multimodal.syntheticJpegImages]]
    * builds on). Edge blocks pad by clamping. */
  def encodeGray(w: Int, h: Int, gray: Array[Int],
      quant: Array[Int] = Array.fill(64)(1),
      restartInterval: Int = 0): Array[Byte] =
    encodePlanes(w, h, Seq(EncComp(gray, w, h, 1, 1)), quant, restartInterval)

  /** Encode a YCbCr 4:4:4 color baseline JPEG (three components, 1×1
    * sampling, shared tables) — the fixture generator that makes the
    * decoder's THREE-component path testable: a conforming decoder
    * must entropy-decode every chroma block to stay in sync even
    * though [[decodeGray]] only IDCTs luma. */
  def encodeYcc444(w: Int, h: Int, y: Array[Int], cb: Array[Int],
      cr: Array[Int], quant: Array[Int] = Array.fill(64)(1),
      restartInterval: Int = 0, scanOrder: Seq[Int] = Nil): Array[Byte] =
    encodePlanes(w, h, Seq(EncComp(y, w, h, 1, 1), EncComp(cb, w, h, 1, 1),
      EncComp(cr, w, h, 1, 1)), quant, restartInterval, scanOrder)

  /** Encode a YCbCr 4:2:2 color baseline JPEG — luma at 2×1 sampling,
    * chroma at half HORIZONTAL resolution only (the broadcast/video
    * capture layout). Exercises ASYMMETRIC sampling factors (h ≠ v):
    * an MCU is two side-by-side Y blocks + one Cb + one Cr, which
    * pins the decoder's (mx·h + bx) horizontal block placement
    * independently of the vertical path 4:2:0 tests. */
  def encodeYcc422(w: Int, h: Int, y: Array[Int], cb: Array[Int],
      cr: Array[Int], quant: Array[Int] = Array.fill(64)(1),
      restartInterval: Int = 0): Array[Byte] = {
    val cw = (w + 1) / 2
    encodePlanes(w, h, Seq(EncComp(y, w, h, 2, 1), EncComp(cb, cw, h, 1, 1),
      EncComp(cr, cw, h, 1, 1)), quant, restartInterval)
  }

  /** Encode a YCbCr 4:2:0 color baseline JPEG — luma at 2×2 sampling,
    * chroma planes at half resolution (ceil(w/2) × ceil(h/2)), the
    * layout virtually every camera and web JPEG ships. An MCU is four
    * Y blocks + one Cb + one Cr, which makes this the fixture that
    * exercises the decoder's multi-block-per-MCU luma placement and
    * interleaved chroma skip at realistic geometry. */
  def encodeYcc420(w: Int, h: Int, y: Array[Int], cb: Array[Int],
      cr: Array[Int], quant: Array[Int] = Array.fill(64)(1),
      restartInterval: Int = 0): Array[Byte] = {
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    encodePlanes(w, h, Seq(EncComp(y, w, h, 2, 2), EncComp(cb, cw, ch, 1, 1),
      EncComp(cr, cw, ch, 1, 1)), quant, restartInterval)
  }
}
