package graft.operators

/** Pure-JVM baseline JPEG codec — the last modality that genuinely
  * needed a codec, built from the public ITU T.81 primitives: marker
  * walk, canonical Huffman entropy decode, dequantization, 8×8 inverse
  * DCT. This retires the final synthetic data path in the multimodal
  * family: m4's perceptual hash now runs on REAL pixels for JPEG
  * payloads too (decode → luma → area-resize → gradient-sign dHash).
  *
  * Scope: baseline and extended sequential DCT (SOF0/SOF1) plus
  * progressive DCT (SOF2 — real web corpora are ~10–20% progressive),
  * 8-bit, 1 or 3 components, any sampling factors, restart markers.
  * The luma output IS the Y channel — in sequential frames chroma
  * blocks are entropy-decoded (the bitstream demands it) but never
  * dequantized or IDCT'd, and in progressive frames chroma-only scans
  * are stepped over entirely (their entropy data is self-delimiting —
  * the next true marker bounds it), because the perceptual hash
  * compares luminance only; that skips two thirds of the IDCT work on
  * 4:4:4 images. Arithmetic coding, 12-bit, and hierarchical return
  * None and the caller falls back to its stub path; decode failures
  * never throw or spin (every loop bails on zero progress — a corrupt
  * payload in a 100 TB corpus must degrade, not kill or hang the
  * task).
  *
  * Scale shape: decode runs inside the caller's mapPartitions batch
  * (one pass over payload bytes, no shuffle); pixels reduce to a
  * 72-cell grid inside the task and never leave it.
  */
object JpegCodec {

  /** Progressive decode's coefficient buffer holds 4 bytes/sample until
    * EOI, so progressive frames are capped harder (16 MP) than the 64 MP
    * sequential pixel cap — a conforming larger progressive payload
    * DEGRADES (None). Public so the m7b-family coverage cards can bucket
    * "degraded for size" separately from "corrupt". */
  val ProgressivePixelCap: Long = 16L * 1024 * 1024

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

  /** Separable 8×8 IDCT of natural-order dequantized coefficients into
    * the luma plane at (px0, py0) — shared by the sequential MCU loop
    * and the progressive end-of-frame pass. */
  private def idctBlock(zz: Array[Int], plane: Array[Int], planeW: Int,
      px0: Int, py0: Int): Unit = {
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

  /** Crop the padded luma plane to image dims, nearest-neighbor if the
    * luma is subsampled relative to hmax/vmax (legal but rare). */
  private def cropLuma(plane: Array[Int], planeW: Int, w: Int, h: Int,
      ch: Int, cv: Int, hmax: Int, vmax: Int): Array[Int] = {
    val gray = new Array[Int](w * h)
    var yv = 0
    while (yv < h) {
      val sy = yv * cv / vmax
      var x = 0
      while (x < w) {
        gray(yv * w + x) = plane(sy * planeW + x * ch / hmax)
        x += 1
      }
      yv += 1
    }
    gray
  }

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
    var hmax = 1; var vmax = 1
    var mcusX = 0; var mcusY = 0
    var restartInterval = 0
    var scanStart = -1
    // progressive (SOF2) state: a frame is many scans, each delivering
    // a spectral band and/or a precision slice of every block, so the
    // LUMA coefficients must be buffered until EOI (chroma scans are
    // skipped structurally — see progScan). Buffer is zigzag-ordered
    // per block on the MCU-padded luma grid bwB×bhB.
    var progressive = false
    var coefY: Array[Int] = null
    var bwB = 0; var bhB = 0
    var sawLumaScan = false

    /** Start of the next true marker at/after `from`: steps over
      * entropy bytes, 0xFF00 stuffing, 0xFF fill bytes, and RSTn.
      * -1 when the stream ends first. */
    def nextMarker(from: Int): Int = {
      var p = from
      while (p < b.length) {
        if ((b(p) & 0xff) != 0xff) p += 1
        else {
          if (p + 1 >= b.length) return -1
          val m = b(p + 1) & 0xff
          if (m == 0x00) p += 2
          else if (m == 0xff) p += 1
          else if (m >= 0xd0 && m <= 0xd7) p += 2
          else return p
        }
      }
      -1
    }

    /** Luma's own (non-MCU-padded) block grid width/height — the walk
      * order of non-interleaved progressive scans (T.81 A.2.2). */
    def lumaBlocksW: Int = ((w * comps(0).h + hmax - 1) / hmax + 7) / 8
    def lumaBlocksH: Int = ((h * comps(0).v + vmax - 1) / vmax + 7) / 8

    /** One progressive scan (T.81 G.2): DC first/refine (interleaved or
      * single-component), AC first/refine (always single-component).
      * Returns the next marker position, or -1 to degrade. */
    def progScan(sIdx: Array[Int], sDc: Array[Int], sAc: Array[Int],
        ss: Int, se: Int, ah: Int, al: Int, dataStart: Int): Int = {
      // scans that never touch luma carry no information this decoder
      // outputs — step over their entropy bytes without decoding (the
      // separability progressive scans have and sequential ones lack)
      if (!sIdx.contains(0)) return nextMarker(dataStart)
      sawLumaScan = true
      val r = new BitReader(b, dataStart)
      var eobrun = 0
      var rstExpect = 0
      var sinceRestart = 0
      val preds = new Array[Int](comps.length)
      val p1 = 1 << al
      val m1 = -p1

      def restartDue(): Boolean = {
        if (restartInterval > 0 && sinceRestart == restartInterval) {
          r.align()
          var p = r.pos
          while (p + 1 < b.length && (b(p) & 0xff) == 0xff &&
            (b(p + 1) & 0xff) == 0xff) p += 1
          if (p + 1 >= b.length || (b(p) & 0xff) != 0xff ||
            (b(p + 1) & 0xff) != 0xd0 + rstExpect) return false
          r.pos = p + 2
          rstExpect = (rstExpect + 1) % 8
          java.util.Arrays.fill(preds, 0)
          eobrun = 0
          sinceRestart = 0
        }
        true
      }

      /** DC for one block: first scan accumulates diffs at reduced
        * precision (coef = pred·2^Al); refine ORs in bit Al. `off` < 0
        * discards (chroma inside an interleaved DC scan — the bits
        * must be consumed to stay in sync). */
      def dcOne(so: Int, ci: Int, off: Int): Boolean = {
        if (ah == 0) {
          val tab = dcTabs(sDc(so)); if (tab == null) return false
          val t = tab.decode(r)
          if (t == Int.MinValue || t > 15) return false
          val bits = r.receive(t); if (bits == Int.MinValue) return false
          preds(ci) += extend(bits, t)
          if (off >= 0) coefY(off) = preds(ci) * p1
        } else {
          val bit = r.nextBit(); if (bit < 0) return false
          if (bit == 1 && off >= 0) coefY(off) |= p1
        }
        true
      }

      /** AC first scan for one luma block (T.81 G.1.2.2): run/size with
        * ZRL and EOBn end-of-band runs, values at 2^Al precision. */
      def acFirst(acTab: Huff, off: Int): Boolean = {
        if (eobrun > 0) { eobrun -= 1; return true }
        var k = ss
        while (k <= se) {
          val rs = acTab.decode(r)
          if (rs == Int.MinValue) return false
          val run = (rs >> 4) & 0xf; val s = rs & 0xf
          if (s == 0) {
            if (run == 15) k += 16 // ZRL
            else {
              eobrun = (1 << run) - 1
              if (run > 0) {
                val extra = r.receive(run); if (extra == Int.MinValue) return false
                eobrun += extra
              }
              return true
            }
          } else {
            k += run
            if (k > se) return false
            val bits = r.receive(s); if (bits == Int.MinValue) return false
            coefY(off + k) = extend(bits, s) * p1
            k += 1
          }
        }
        true
      }

      /** AC refinement scan for one luma block (T.81 G.1.2.3):
        * correction bits for already-nonzero coefficients interleaved
        * with newly-significant ±2^Al insertions; EOB runs still carry
        * correction bits for every nonzero coefficient they cover. */
      def acRefine(acTab: Huff, off: Int): Boolean = {
        def correct(k: Int): Boolean = {
          val bit = r.nextBit(); if (bit < 0) return false
          if (bit == 1) {
            val cur = coefY(off + k)
            if ((cur & p1) == 0)
              coefY(off + k) = if (cur >= 0) cur + p1 else cur + m1
          }
          true
        }
        var k = ss
        if (eobrun == 0) {
          var done = false
          while (!done && k <= se) {
            val rs = acTab.decode(r)
            if (rs == Int.MinValue) return false
            var run = (rs >> 4) & 0xf
            val s = rs & 0xf
            var newVal = 0
            if (s == 0) {
              if (run < 15) {
                eobrun = 1 << run
                if (run > 0) {
                  val extra = r.receive(run); if (extra == Int.MinValue) return false
                  eobrun += extra
                }
                done = true
              } // run == 15: ZRL — skip 16 zero-history positions below
            } else {
              if (s != 1) return false // refinement inserts only ±1·2^Al
              val bit = r.nextBit(); if (bit < 0) return false
              newVal = if (bit == 1) p1 else m1
            }
            if (!done) {
              var placed = false
              while (!placed && k <= se) {
                if (coefY(off + k) != 0) {
                  if (!correct(k)) return false
                  k += 1
                } else if (run == 0) placed = true
                else { run -= 1; k += 1 }
              }
              if (newVal != 0) {
                if (!placed) return false // ran off the band: corrupt
                coefY(off + k) = newVal
                k += 1
              } else if (placed) k += 1 // ZRL's 16th zero position
            }
          }
        }
        if (eobrun > 0) {
          while (k <= se) {
            if (coefY(off + k) != 0) { if (!correct(k)) return false }
            k += 1
          }
          eobrun -= 1
        }
        true
      }

      if (ss == 0) {
        if (sIdx.length > 1) {
          // interleaved DC scan: MCU walk, every listed component
          var mcu = 0
          val n = mcusX * mcusY
          while (mcu < n) {
            if (!restartDue()) return -1
            val mx = mcu % mcusX; val my = mcu / mcusX
            var so = 0
            while (so < sIdx.length) {
              val ci = sIdx(so)
              val comp = comps(ci)
              var by = 0
              while (by < comp.v) {
                var bx = 0
                while (bx < comp.h) {
                  val off =
                    if (ci == 0) ((my * comp.v + by) * bwB + (mx * comp.h + bx)) * 64
                    else -1
                  if (!dcOne(so, ci, off)) return -1
                  bx += 1
                }
                by += 1
              }
              so += 1
            }
            sinceRestart += 1
            mcu += 1
          }
        } else {
          // single-component DC scan over luma's own block grid
          val cw = lumaBlocksW; val chb = lumaBlocksH
          var blk = 0
          val n = cw * chb
          while (blk < n) {
            if (!restartDue()) return -1
            val off = ((blk / cw) * bwB + (blk % cw)) * 64
            if (!dcOne(0, 0, off)) return -1
            sinceRestart += 1
            blk += 1
          }
        }
      } else {
        // AC scan: single-component (validated), luma (others skipped)
        val acTab = acTabs(sAc(0)); if (acTab == null) return -1
        val cw = lumaBlocksW; val chb = lumaBlocksH
        var blk = 0
        val n = cw * chb
        while (blk < n) {
          if (!restartDue()) return -1
          val off = ((blk / cw) * bwB + (blk % cw)) * 64
          if (ah == 0) { if (!acFirst(acTab, off)) return -1 }
          else { if (!acRefine(acTab, off)) return -1 }
          sinceRestart += 1
          blk += 1
        }
      }
      nextMarker(r.pos)
    }

    /** EOI in a progressive frame: every luma block dequantizes and
      * IDCTs once, from the accumulated coefficients. */
    def progressiveOutput(): (Int, Int, Array[Int]) = {
      val comp = comps(0)
      val planeW = bwB * 8
      val plane = new Array[Int](planeW * bhB * 8)
      val zz = new Array[Int](64)
      val q = qt(comp.tq)
      var br = 0
      while (br < bhB) {
        var bc = 0
        while (bc < bwB) {
          val off = (br * bwB + bc) * 64
          var k = 0
          while (k < 64) { zz(Zigzag(k)) = coefY(off + k) * q(Zigzag(k)); k += 1 }
          idctBlock(zz, plane, planeW, bc * 8, br * 8)
          bc += 1
        }
        br += 1
      }
      (w, h, cropLuma(plane, planeW, w, h, comp.h, comp.v, hmax, vmax))
    }

    var i = 2
    while (scanStart < 0) {
      // marker walk: skip 0xFF fill bytes, read marker + length
      while (i < b.length && (b(i) & 0xff) == 0xff && i + 1 < b.length &&
        (b(i + 1) & 0xff) == 0xff) i += 1
      if (i + 1 >= b.length || (b(i) & 0xff) != 0xff) return None
      val marker = b(i + 1) & 0xff
      if (marker == 0xd9) { // EOI: the progressive frame's finish line
        if (progressive && sawLumaScan) return Some(progressiveOutput())
        return None // sequential: EOI before any scan
      }
      if (i + 3 >= b.length) return None
      val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
      if (len < 2 || i + 2 + len > b.length) return None
      val seg = i + 4
      val segEnd = i + 2 + len
      var next = segEnd
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
        case 0xc0 | 0xc1 | 0xc2 => // baseline / extended sequential / progressive
          if (comps != null) return None // one frame header per stream
          progressive = marker == 0xc2
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
          hmax = comps.map(_.h).max
          vmax = comps.map(_.v).max
          mcusX = (w + 8 * hmax - 1) / (8 * hmax)
          mcusY = (h + 8 * vmax - 1) / (8 * vmax)
          if (progressive) {
            // the coefficient buffer is the price of progressive:
            // 4 bytes/sample until EOI. Cap it harder than the 64 MP
            // pixel cap so one payload can't balloon a task (larger
            // progressive payloads degrade to the caller's stub path)
            if (w.toLong * h.toLong > ProgressivePixelCap) return None
            bwB = mcusX * comps(0).h
            bhB = mcusY * comps(0).v
            coefY = new Array[Int](bwB * bhB * 64)
          }
        case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
          return None // lossless / arithmetic / differential-hierarchical
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
          if (ns < 1 || seg + 1 + 2 * ns + 3 > segEnd) return None
          val sIdx = new Array[Int](ns)
          val sDc = new Array[Int](ns)
          val sAc = new Array[Int](ns)
          // T.81 interleaves MCU data in SCAN-HEADER order, which may
          // differ from SOF order — record it and walk it in the MCU
          // loop (decoding in SOF order would silently scramble the
          // block layout of a conforming reordered stream)
          var c = 0
          while (c < ns) {
            val cid = b(seg + 1 + 2 * c) & 0xff
            val ix = comps.indexWhere(_.id == cid)
            if (ix < 0) return None
            var dup = 0
            while (dup < c) { if (sIdx(dup) == ix) return None; dup += 1 }
            sIdx(c) = ix
            sDc(c) = (b(seg + 2 + 2 * c) >> 4) & 0xf
            sAc(c) = b(seg + 2 + 2 * c) & 0xf
            // table slots are 0..3 (T.81 B.2.3); a corrupt nibble must
            // degrade, not index past the 4-slot table arrays
            if (sDc(c) > 3 || sAc(c) > 3) return None
            c += 1
          }
          if (!progressive) {
            if (ns != comps.length) return None
            scanOrder = sIdx
            scanDc = new Array[Int](comps.length)
            scanAc = new Array[Int](comps.length)
            var c2 = 0
            while (c2 < ns) {
              scanDc(sIdx(c2)) = sDc(c2); scanAc(sIdx(c2)) = sAc(c2); c2 += 1
            }
            scanStart = segEnd // exit to the sequential MCU loop below
          } else {
            val ss = b(seg + 1 + 2 * ns) & 0xff
            val se = b(seg + 2 + 2 * ns) & 0xff
            val aa = b(seg + 3 + 2 * ns) & 0xff
            val ah = (aa >> 4) & 0xf; val al = aa & 0xf
            // T.81 progressive scan-header legality; note a BASELINE
            // scan header under an SOF2 marker (Ss=0, Se=63) fails the
            // DC-scan rule — a re-marked stream degrades, it does not
            // entropy-decode baseline data as progressive garbage
            if (se > 63 || al > 13 || (ah != 0 && ah != al + 1)) return None
            if (ss == 0) { if (se != 0) return None }
            else { if (se < ss || ns != 1) return None }
            val p = progScan(sIdx, sDc, sAc, ss, se, ah, al, segEnd)
            if (p < 0) return None
            next = p
          }
        case _ => // APPn / COM / others: skip by length
      }
      if (scanStart < 0) {
        if (next <= i) return None // zero progress would spin forever
        i = next
      }
    }

    // ---- sequential scan decode ----
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
            if (isLuma)
              idctBlock(zz, plane, planeW,
                (mx * comp.h + bx) * 8, (my * comp.v + by) * 8)
            bx += 1
          }
          by += 1
        }
        so += 1
      }
      mcu += 1
    }

    Some((w, h, cropLuma(plane, planeW, w, h, y0.h, y0.v, hmax, vmax)))
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

  // ---- grayscale progressive encoder (the SOF2 fixture generator) ----

  /** Progressive AC table: the baseline (run,size) symbols plus the 14
    * EOBn symbols (r = 1..14, size 0) progressive end-of-band runs
    * need, all at one 8-bit code length (176 < 255 keeps the canonical
    * construction valid). */
  private val ProgAcVals: Array[Int] = AcVals ++ Array.tabulate(14)(r => (r + 1) << 4)
  private val ProgAcCounts = { val c = new Array[Int](16); c(7) = ProgAcVals.length; c }
  private lazy val ProgAcCodes = codesFor(ProgAcCounts, ProgAcVals)

  /** libjpeg's default-shaped scan script (Ss, Se, Ah, Al): a first DC
    * pass at reduced precision, two spectral-selection AC passes, then
    * successive-approximation refinements down to full precision —
    * exercising every decoder path (DC first/refine, AC first/refine,
    * ZRL, EOB runs) while reconstructing the coefficients EXACTLY, so
    * progressive and baseline round trips must pixel-match. */
  val DefaultProgScans: Seq[(Int, Int, Int, Int)] = Seq(
    (0, 0, 0, 1), (1, 5, 0, 2), (6, 63, 0, 2),
    (1, 63, 2, 1), (0, 0, 1, 0), (1, 63, 1, 0))

  /** Encode a grayscale raster as progressive JPEG (SOF2, one
    * component, Huffman, spectral selection + successive
    * approximation). The default script restores full coefficient
    * precision, so [[decodeGray]] of the result is bit-identical to
    * the baseline encode of the same raster — the round-trip oracle
    * the progressive decoder is tested against. `restartInterval` > 0
    * emits DRI and an RSTn every that many blocks in every scan
    * (non-interleaved, so the interval counts blocks per T.81). */
  def encodeGrayProgressive(w: Int, h: Int, gray: Array[Int],
      quant: Array[Int] = Array.fill(64)(1),
      scans: Seq[(Int, Int, Int, Int)] = DefaultProgScans,
      restartInterval: Int = 0): Array[Byte] = {
    require(gray.length == w * h,
      s"raster must be ${w}x$h=${w * h}, got ${gray.length}")
    encodeProgressivePlanes(w, h, Seq(EncComp(gray, w, h, 1, 1)), quant,
      scans.map(s => Seq(0) -> s), restartInterval)
  }

  /** Encode a YCbCr color progressive JPEG (SOF2, three components) —
    * the fixture generator for the decoder paths a GRAYSCALE
    * progressive stream can never reach: chroma-only AC scans placed
    * MID-FRAME that the decoder must step over via their
    * self-delimiting entropy segments, and interleaved progressive DC
    * scans whose MCU walk spans hs×vs luma blocks per MCU when
    * `lumaSampling` is (2,2) (the 4:2:0 layout web JPEGs ship).
    * Chroma planes must be ceil(w/hs) × ceil(h/vs). The script
    * restores luma to full precision, so [[decodeGray]] of the result
    * pixel-matches the baseline encode of the same Y plane. */
  def encodeYccProgressive(w: Int, h: Int, y: Array[Int], cb: Array[Int],
      cr: Array[Int], lumaSampling: (Int, Int) = (1, 1),
      quant: Array[Int] = Array.fill(64)(1),
      restartInterval: Int = 0): Array[Byte] = {
    val (hs, vs) = lumaSampling
    require(hs >= 1 && hs <= 2 && vs >= 1 && vs <= 2,
      s"luma sampling must be 1..2, got ${lumaSampling}")
    val cw = (w + hs - 1) / hs; val ch = (h + vs - 1) / vs
    encodeProgressivePlanes(w, h,
      Seq(EncComp(y, w, h, hs, vs), EncComp(cb, cw, ch, 1, 1),
        EncComp(cr, cw, ch, 1, 1)),
      quant,
      Seq( // luma precision chain: DC 1→0, AC 2→1→0; chroma mid-frame
        Seq(0, 1, 2) -> ((0, 0, 0, 1)),
        Seq(0) -> ((1, 5, 0, 2)),
        Seq(1) -> ((1, 63, 0, 0)), // Cb: one full-precision AC scan
        Seq(0) -> ((6, 63, 0, 2)),
        Seq(0, 1, 2) -> ((0, 0, 1, 0)),
        Seq(2) -> ((1, 63, 0, 0)), // Cr: between two luma refinements
        Seq(0) -> ((1, 63, 2, 1)),
        Seq(0) -> ((1, 63, 1, 0))),
      restartInterval)
  }

  /** Shared progressive (SOF2) encoder over arbitrary per-component
    * sampling: each `script` entry is (component indices, (Ss, Se,
    * Ah, Al)) — DC scans (Ss=0) may interleave several components in
    * MCU order, AC scans are single-component over that component's
    * own block grid (T.81 A.2.2). Restart intervals count MCUs in
    * interleaved scans and blocks otherwise. Coefficients live on the
    * MCU-padded per-component grids so DC and AC walks agree with the
    * decoder's buffer layout. */
  private def encodeProgressivePlanes(w: Int, h: Int, comps: Seq[EncComp],
      quant: Array[Int],
      script: Seq[(Seq[Int], (Int, Int, Int, Int))],
      restartInterval: Int): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dims ${w}x$h")
    require(comps.nonEmpty && comps.size <= 3 && comps.size != 2,
      s"1 (gray) or 3 (YCbCr) components, got ${comps.size}")
    comps.foreach(c => require(c.plane.length == c.pw * c.ph,
      s"plane must be ${c.pw}x${c.ph}=${c.pw * c.ph}, got ${c.plane.length}"))
    require(quant.length == 64 && quant.forall(q => q >= 1 && q <= 255),
      "quant table must be 64 values in 1..255")
    require(restartInterval >= 0 && restartInterval <= 65535,
      s"restart interval must fit u16, got $restartInterval")
    require(script.nonEmpty, "at least one scan")
    script.foreach { case (sc, (ss, se, ah, al)) =>
      require(sc.nonEmpty && sc.distinct == sc && sc.forall(comps.indices.contains),
        s"scan components must be distinct indices of 0..${comps.size - 1}, got $sc")
      require(ss >= 0 && se <= 63 && al >= 0 && al <= 13 &&
        (if (ss == 0) se == 0 else se >= ss && sc.size == 1) &&
        (ah == 0 || ah == al + 1),
        s"illegal progressive scan header ($ss,$se,$ah,$al) over $sc")
    }
    val hmax = comps.map(_.hs).max
    val vmax = comps.map(_.vs).max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    // per-component coefficients on the MCU-padded grid, computed once
    val cwP = comps.map(c => mcusX * c.hs)
    val chP = comps.map(c => mcusY * c.vs)
    val blocks: IndexedSeq[Array[Array[Int]]] = comps.indices.map { ci =>
      val c = comps(ci)
      val block = new Array[Double](64)
      Array.tabulate(cwP(ci) * chP(ci)) { bi =>
        val coef = new Array[Int](64)
        fillBlock(c.plane, c.pw, c.ph, bi % cwP(ci), bi / cwP(ci), block)
        fdctQuant(block, quant, coef)
        coef
      }
    }
    // a component's own (non-MCU-padded) block grid — the walk order
    // of non-interleaved scans (T.81 A.2.2); mirrors the decoder's
    // lumaBlocksW/H
    def ownW(ci: Int) = ((w * comps(ci).hs + hmax - 1) / hmax + 7) / 8
    def ownH(ci: Int) = ((h * comps(ci).vs + vmax - 1) / vmax + 7) / 8

    val nc = comps.size
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8) // SOI
    marker(0xdb); u16(2 + 65); out.write(0x00)
    var k = 0
    while (k < 64) { out.write(quant(Zigzag(k))); k += 1 }
    marker(0xc2); u16(8 + 3 * nc) // SOF2
    out.write(8); u16(h); u16(w); out.write(nc)
    comps.indices.foreach { ci =>
      out.write(ci + 1); out.write((comps(ci).hs << 4) | comps(ci).vs)
      out.write(0)
    }
    def dht(tc: Int, counts: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length); out.write(tc << 4)
      counts.foreach(out.write); vals.foreach(out.write)
    }
    dht(0, DcCounts, DcVals)
    dht(1, ProgAcCounts, ProgAcVals)
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }

    script.foreach { case (scomps, (ss, se, ah, al)) =>
      marker(0xda); u16(6 + 2 * scomps.size)
      out.write(scomps.size)
      scomps.foreach { ci => out.write(ci + 1); out.write(0x00) }
      out.write(ss); out.write(se); out.write((ah << 4) | al)
      val bw = new BitWriter(out)
      var rst = 0
      val preds = new Array[Int](nc)
      // lazily-flushed end-of-band run shared across blocks; in
      // refinement scans the covered blocks' correction bits ride
      // after the EOBn symbol in block order (the order the decoder's
      // eobrun branch consumes them)
      var eobCnt = 0
      val pendingBits = scala.collection.mutable.ArrayBuffer.empty[Int]
      def flushEob(): Unit = while (eobCnt > 0) {
        var r = 31 - Integer.numberOfLeadingZeros(eobCnt)
        if (r > 14) r = 14
        val covered = math.min(eobCnt, (1 << (r + 1)) - 1)
        val (c0, l0) = ProgAcCodes(r << 4)
        bw.put(c0, l0)
        if (r > 0) bw.put(covered - (1 << r), r)
        pendingBits.foreach(bit => bw.put(bit, 1))
        pendingBits.clear()
        eobCnt -= covered
      }
      var sinceRestart = 0
      def restart(): Unit = {
        flushEob()
        bw.flush()
        marker(0xd0 + rst)
        rst = (rst + 1) % 8
        java.util.Arrays.fill(preds, 0)
        sinceRestart = 0
      }

      def dcOne(ci: Int, coef: Array[Int]): Unit = {
        if (ah == 0) { // DC first at 2^Al precision (arithmetic shift)
          val v = coef(0) >> al
          val diff = v - preds(ci); preds(ci) = v
          val cat = category(diff)
          val (dc, dl) = DcCodes(cat)
          bw.put(dc, dl)
          if (cat > 0) bw.put(if (diff < 0) diff + (1 << cat) - 1 else diff, cat)
        } else { // DC refine: bit Al of the two's-complement value
          bw.put((coef(0) >> al) & 1, 1)
        }
      }

      def acFirstBlock(coef: Array[Int]): Unit = {
        var anyNz = false
        var kk = ss
        while (kk <= se && !anyNz) {
          if ((math.abs(coef(kk)) >> al) != 0) anyNz = true else kk += 1
        }
        if (!anyNz) eobCnt += 1
        else {
          flushEob()
          var run = 0
          kk = ss
          while (kk <= se) {
            val mag = math.abs(coef(kk)) >> al
            if (mag == 0) run += 1
            else {
              while (run >= 16) {
                val (zc, zl) = ProgAcCodes(0xf0); bw.put(zc, zl); run -= 16
              }
              val tv = if (coef(kk) < 0) -mag else mag
              val cat = category(tv)
              val (ac, alen) = ProgAcCodes((run << 4) | cat)
              bw.put(ac, alen)
              bw.put(if (tv < 0) tv + (1 << cat) - 1 else tv, cat)
              run = 0
            }
            kk += 1
          }
          if (run > 0) eobCnt += 1 // trailing zeros: band joins an EOB run
        }
      }

      // AC refine: insert ±2^Al, correct already-significant. Symbol/
      // bit order must mirror the decoder's traversal (T.81 G.1.2.3):
      // a ZRL is emitted on ARRIVAL at any nonzero coefficient once
      // >15 zero-HISTORY positions accumulate — unless the rest of the
      // band folds into the EOB run (no newly-significant coefficient
      // remains) — and each emitted symbol carries exactly the
      // correction bits buffered since the previous one, because that
      // is the span the decoder traverses (reading a bit at every
      // nonzero-history position) before it stops at the symbol's
      // target zero.
      def acRefineBlock(coef: Array[Int]): Unit = {
        val mags = new Array[Int](64)
        var lastNew = ss - 1 // last newly-significant index: the EOB fold bound
        var kk = ss
        while (kk <= se) {
          mags(kk) = math.abs(coef(kk)) >> al
          if (mags(kk) == 1) lastNew = kk
          kk += 1
        }
        val corrBits = scala.collection.mutable.ArrayBuffer.empty[Int]
        var run = 0
        kk = ss
        while (kk <= se) {
          val mag = mags(kk)
          if (mag == 0) run += 1
          else {
            while (run > 15 && kk <= lastNew) {
              flushEob()
              val (zc, zl) = ProgAcCodes(0xf0); bw.put(zc, zl); run -= 16
              corrBits.foreach(bit => bw.put(bit, 1)); corrBits.clear()
            }
            if (mag > 1) corrBits += (mag & 1)
            else { // newly significant at this precision: sign only
              flushEob()
              val (ac, alen) = ProgAcCodes((run << 4) | 1)
              bw.put(ac, alen)
              bw.put(if (coef(kk) > 0) 1 else 0, 1)
              corrBits.foreach(bit => bw.put(bit, 1)); corrBits.clear()
              run = 0
            }
          }
          kk += 1
        }
        if (run > 0 || corrBits.nonEmpty) {
          eobCnt += 1
          pendingBits ++= corrBits
        }
        if (eobCnt == 32767) flushEob() // single-symbol flushes keep bit order exact
      }

      if (ss == 0 && scomps.size > 1) {
        // interleaved DC scan: MCU walk, hs×vs blocks per component
        var mcu = 0
        val n = mcusX * mcusY
        while (mcu < n) {
          if (restartInterval > 0 && sinceRestart == restartInterval) restart()
          val mx = mcu % mcusX; val my = mcu / mcusX
          scomps.foreach { ci =>
            val c = comps(ci)
            var by = 0
            while (by < c.vs) {
              var bx = 0
              while (bx < c.hs) {
                dcOne(ci, blocks(ci)((my * c.vs + by) * cwP(ci) + (mx * c.hs + bx)))
                bx += 1
              }
              by += 1
            }
          }
          sinceRestart += 1
          mcu += 1
        }
      } else {
        // single-component scan over the component's own block grid
        val ci = scomps.head
        val ow = ownW(ci)
        val n = ow * ownH(ci)
        var blk = 0
        while (blk < n) {
          if (restartInterval > 0 && sinceRestart == restartInterval) restart()
          val coef = blocks(ci)((blk / ow) * cwP(ci) + (blk % ow))
          if (ss == 0) dcOne(ci, coef)
          else if (ah == 0) acFirstBlock(coef)
          else acRefineBlock(coef)
          sinceRestart += 1
          blk += 1
        }
      }
      flushEob()
      bw.flush()
    }
    marker(0xd9) // EOI
    out.toByteArray
  }

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
