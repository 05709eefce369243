package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.JpegCodec

/** Kernel tests for the pure-JVM baseline JPEG codec — the PngCodecSpec
  * pins for the huffman/dequant/IDCT arithmetic. JPEG is lossy, so the
  * round-trip contracts are error BOUNDS (near-lossless at quant=1),
  * not exact equality — plus the cell-mean stability bound the m4c
  * fixture design builds on. */
class JpegCodecSpec extends AnyFunSuite {

  private def noise(w: Int, h: Int, seed: Long): Array[Int] = {
    val rnd = new java.util.Random(seed)
    Array.fill(w * h)(rnd.nextInt(256))
  }

  test("round trip at quant=1 is near-lossless: every pixel within ±2") {
    for ((w, h) <- Seq((8, 8), (23, 17), (64, 40), (9, 8))) {
      val px = noise(w, h, 42L + w)
      val decoded = JpegCodec.decodeGray(JpegCodec.encodeGray(w, h, px))
      assert(decoded.isDefined, s"${w}x$h must decode")
      val (dw, dh, gray) = decoded.get
      assert((dw, dh) == (w, h))
      var maxErr = 0
      var i = 0
      while (i < px.length) {
        maxErr = math.max(maxErr, math.abs(gray(i) - px(i))); i += 1
      }
      assert(maxErr <= 2, s"${w}x$h: max pixel error $maxErr > 2")
    }
  }

  test("coarse quantization still decodes (lossy but bounded by table scale)") {
    val (w, h) = (32, 24)
    val px = noise(w, h, 7L)
    val q = Array.fill(64)(16)
    val (dw, dh, gray) = JpegCodec.decodeGray(JpegCodec.encodeGray(w, h, px, q)).get
    assert((dw, dh) == (w, h))
    // DC quantized at 16: block means survive within the quant step
    val err = px.zip(gray).map { case (a, b) => math.abs(a - b) }
    assert(err.sum.toDouble / err.length < 16.0, "mean error must stay under the quant step")
  }

  test("NON-uniform quantization round-trips: dequant must read the table at the zigzag position") {
    // a uniform table cannot tell qt[k] from qt[Zigzag(k)]; this
    // frequency-dependent one (real-world tables all are) can — a
    // mismatched index multiplies coefficients by the wrong step and
    // scrambles the raster far past any honest quantization loss
    val (w, h) = (32, 24)
    val px = noise(w, h, 21L)
    val q = Array.tabulate(64)(i => 1 + (i % 8) + (i / 8)) // 1..15, position-dependent
    val (dw, dh, gray) = JpegCodec.decodeGray(JpegCodec.encodeGray(w, h, px, q)).get
    assert((dw, dh) == (w, h))
    val err = px.zip(gray).map { case (a, b) => math.abs(a - b) }
    assert(err.max <= 40 && err.sum.toDouble / err.length < 10.0,
      s"non-uniform table: max ${err.max}, mean ${err.sum.toDouble / err.length} — " +
        "a zigzag/natural index mismatch blows far past these bounds")
  }

  test("plateau cell means survive the round trip within ±1 (the m4c fixture margin)") {
    // paint the fixture shape directly: 9x8 constant cells, gap-3 values
    val ws = 5; val hs = 4; val w = 9 * ws; val h = 8 * hs
    val rnd = new java.util.Random(99L)
    val perm = Array.tabulate(72)(identity)
    var i = perm.length - 1
    while (i > 0) {
      val j = rnd.nextInt(i + 1)
      val t = perm(i); perm(i) = perm(j); perm(j) = t
      i -= 1
    }
    val cell = perm.map(p => 12 + 3 * p)
    val px = Array.tabulate(w * h)(k => cell(((k / w) / hs) * 9 + (k % w) / ws))
    val (_, _, gray) = JpegCodec.decodeGray(JpegCodec.encodeGray(w, h, px)).get
    for (r <- 0 until 8; c <- 0 until 9) {
      var s = 0L
      for (y <- r * hs until (r + 1) * hs; x <- c * ws until (c + 1) * ws)
        s += gray(y * w + x)
      val mean = s.toDouble / (ws * hs)
      assert(math.abs(mean - cell(r * 9 + c)) < 1.0,
        s"cell ($r,$c): decoded mean $mean vs painted ${cell(r * 9 + c)}")
    }
  }

  test("restart markers and wide images exercise multi-block DC prediction") {
    // 129 px wide = 17 blocks/row: DC diffs chain across many blocks
    val (w, h) = (129, 16)
    val px = Array.tabulate(w * h)(i => (i * 7 + i / w * 13) % 256)
    val (dw, dh, gray) = JpegCodec.decodeGray(JpegCodec.encodeGray(w, h, px)).get
    assert((dw, dh) == (w, h))
    assert(px.zip(gray).map { case (a, b) => math.abs(a - b) }.max <= 2)
    // real DRI stream: RSTn every 5 MCUs (34 blocks → 6 restarts, the
    // n-mod-8 cycle and predictor resets both exercised)
    val withDri = JpegCodec.encodeGray(w, h, px, restartInterval = 5)
    assert(withDri.sliding(2).exists(s =>
      (s(0) & 0xff) == 0xff && (s(1) & 0xff) == 0xd2), "DRI stream must carry RSTn markers")
    val (rw, rh, rgray) = JpegCodec.decodeGray(withDri).get
    assert((rw, rh) == (w, h))
    assert(px.zip(rgray).map { case (a, b) => math.abs(a - b) }.max <= 2,
      "restart-interval stream must round-trip like the plain one")
    // a WRONG restart ordinal must degrade, not desync silently
    val bad = withDri.clone()
    val at = bad.indices.find(i => (bad(i) & 0xff) == 0xff &&
      (bad(i + 1) & 0xff) == 0xd0).get
    bad(at + 1) = 0xd5.toByte // out-of-sequence RST
    assert(JpegCodec.decodeGray(bad).isEmpty)
  }

  test("three-component 4:4:4 decode: luma is the Y plane; chroma blocks are consumed but never steer the output") {
    val (w, h) = (40, 24)
    val y = noise(w, h, 11L)
    val cb = noise(w, h, 22L)
    val cr = noise(w, h, 33L)
    val (dw, dh, gray) = JpegCodec.decodeGray(
      JpegCodec.encodeYcc444(w, h, y, cb, cr)).get
    assert((dw, dh) == (w, h))
    assert(y.zip(gray).map { case (a, b) => math.abs(a - b) }.max <= 2,
      "decoded luma must track the Y plane")
    // different chroma, same luma ⇒ identical output (chroma blocks
    // only advance the entropy stream — if the skip logic desynced,
    // the luma blocks after the first MCU would diverge wildly)
    val (_, _, gray2) = JpegCodec.decodeGray(
      JpegCodec.encodeYcc444(w, h, y, noise(w, h, 44L), noise(w, h, 55L))).get
    assert(gray.sameElements(gray2),
      "chroma content must not leak into the luma output")
    // color + restart markers together (3 preds reset per RST)
    val (_, _, gray3) = JpegCodec.decodeGray(
      JpegCodec.encodeYcc444(w, h, y, cb, cr, restartInterval = 3)).get
    assert(y.zip(gray3).map { case (a, b) => math.abs(a - b) }.max <= 2)
  }

  test("4:2:0 subsampled decode: four-Y-block MCUs place luma correctly at non-multiple-of-16 geometry") {
    // 40x24: mcusX = 3 (last MCU half outside the image), mcusY = 2 —
    // exercises MCU padding crop plus the (mx*2+bx, my*2+by) luma
    // placement that only multi-block sampling reaches
    val (w, h) = (40, 24)
    val y = noise(w, h, 66L)
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    val (dw, dh, gray) = JpegCodec.decodeGray(
      JpegCodec.encodeYcc420(w, h, y, noise(cw, ch, 77L), noise(cw, ch, 88L))).get
    assert((dw, dh) == (w, h))
    assert(y.zip(gray).map { case (a, b) => math.abs(a - b) }.max <= 2,
      "4:2:0 luma must track the Y plane (misplacement would scramble blocks)")
    // odd dimensions: chroma ceil-division and edge clamp together
    val (w2, h2) = (17, 9)
    val y2 = noise(w2, h2, 99L)
    val (d2w, d2h, g2) = JpegCodec.decodeGray(JpegCodec.encodeYcc420(
      w2, h2, y2, noise(9, 5, 111L), noise(9, 5, 222L))).get
    assert((d2w, d2h) == (w2, h2))
    assert(y2.zip(g2).map { case (a, b) => math.abs(a - b) }.max <= 2)
    // 4:2:0 with restarts: 6 MCUs at interval 2 → markers mid-scan
    val (_, _, g3) = JpegCodec.decodeGray(JpegCodec.encodeYcc420(
      w, h, y, noise(cw, ch, 77L), noise(cw, ch, 88L), restartInterval = 2)).get
    assert(y.zip(g3).map { case (a, b) => math.abs(a - b) }.max <= 2)
  }

  test("4:2:2 asymmetric sampling: two-wide Y MCUs place luma correctly (h != v path)") {
    // 20x24: mcusX = 2 at 16-px MCU width (last column half outside),
    // mcusY = 3 at 8-px MCU height — horizontal multi-block placement
    // without any vertical subsampling in play
    val (w, h) = (20, 24)
    val y = noise(w, h, 321L)
    val cw = (w + 1) / 2
    val (dw, dh, gray) = JpegCodec.decodeGray(
      JpegCodec.encodeYcc422(w, h, y, noise(cw, h, 432L), noise(cw, h, 543L))).get
    assert((dw, dh) == (w, h))
    assert(y.zip(gray).map { case (a, b) => math.abs(a - b) }.max <= 2,
      "4:2:2 luma must track the Y plane (h-placement bugs scramble alternate blocks)")
    // with restarts (3 blocks+chroma per MCU, predictors reset mid-row)
    val (_, _, g2) = JpegCodec.decodeGray(JpegCodec.encodeYcc422(
      w, h, y, noise(cw, h, 432L), noise(cw, h, 543L), restartInterval = 2)).get
    assert(y.zip(g2).map { case (a, b) => math.abs(a - b) }.max <= 2)
  }

  test("SOS component order differing from SOF order decodes correctly (T.81 interleaves in scan order)") {
    val (w, h) = (40, 24)
    val y = noise(w, h, 123L)
    val cb = noise(w, h, 234L)
    val cr = noise(w, h, 345L)
    val normal = JpegCodec.encodeYcc444(w, h, y, cb, cr)
    val reordered = JpegCodec.encodeYcc444(w, h, y, cb, cr,
      scanOrder = Seq(2, 0, 1)) // Cr, Y, Cb in the scan header AND entropy data
    assert(!normal.sameElements(reordered), "the reordered stream must differ on the wire")
    val (dw, dh, gray) = JpegCodec.decodeGray(reordered).get
    assert((dw, dh) == (w, h))
    assert(y.zip(gray).map { case (a, b) => math.abs(a - b) }.max <= 2,
      "a SOF-order walk would entropy-decode chroma blocks as luma and scramble the raster")
    // reordered + restart markers: predictors reset across all three
    // components while the MCU loop runs in scan order
    val (_, _, g2) = JpegCodec.decodeGray(JpegCodec.encodeYcc444(
      w, h, y, cb, cr, restartInterval = 2, scanOrder = Seq(1, 2, 0))).get
    assert(y.zip(g2).map { case (a, b) => math.abs(a - b) }.max <= 2)
  }

  test("0xFF fill bytes before a restart marker are skipped (T.81 B.1.1.2 padding)") {
    val (w, h) = (129, 16)
    val px = Array.tabulate(w * h)(i => (i * 7 + i / w * 13) % 256)
    val withDri = JpegCodec.encodeGray(w, h, px, restartInterval = 5)
    // pad every RSTn with a fill byte: FF Dn -> FF FF Dn. Entropy data
    // can't contain a bare FF Dn (stuffing writes FF 00), so a byte
    // scan finds exactly the markers.
    val out = Array.newBuilder[Byte]
    var i = 0
    while (i < withDri.length) {
      val m = i + 1 < withDri.length && (withDri(i) & 0xff) == 0xff &&
        (withDri(i + 1) & 0xff) >= 0xd0 && (withDri(i + 1) & 0xff) <= 0xd7
      if (m) out += 0xff.toByte
      out += withDri(i)
      i += 1
    }
    val padded = out.result()
    assert(padded.length > withDri.length, "fixture must actually insert fill bytes")
    val (dw, dh, gray) = JpegCodec.decodeGray(padded).get
    assert((dw, dh) == (w, h))
    assert(px.zip(gray).map { case (a, b) => math.abs(a - b) }.max <= 2,
      "a padded conforming stream must decode, not degrade to None")
  }

  test("decode degrades to None on non-JPEG, truncated, re-marked, and header-only payloads") {
    assert(JpegCodec.decodeGray("definitely not a jpeg".getBytes).isEmpty)
    val ok = JpegCodec.encodeGray(16, 16, noise(16, 16, 3L))
    assert(JpegCodec.decodeGray(ok.take(30)).isEmpty, "truncated before SOS")
    assert(JpegCodec.decodeGray(ok.dropRight(ok.length / 2)).isEmpty ||
      JpegCodec.decodeGray(ok.dropRight(ok.length / 2)).isDefined == false,
      "truncated entropy data must not decode")
    // flip SOF0 -> SOF2 without touching the scan: the baseline SOS
    // header (Ss=0, Se=63, one pass) is illegal under a progressive
    // frame, so the m7b re-marked fixture still takes the counted
    // degrade path rather than entropy-decoding garbage
    val prog = ok.clone()
    val sofAt = prog.indices.find(i => (prog(i) & 0xff) == 0xff &&
      (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(JpegCodec.decodeGray(prog).isEmpty)
    // the m2 header-only fixture (SOI + SOF0 + EOI, no scan) falls back
    assert(JpegCodec.decodeGray(Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xd9.toByte)).isEmpty)
  }

  test("progressive: default successive-approximation script round-trips pixel-identical to baseline") {
    val rnd = new java.util.Random(101L)
    for ((w, h) <- Seq((16, 16), (24, 17), (9, 8), (37, 29))) {
      val gray = Array.fill(w * h)(rnd.nextInt(256))
      val base = JpegCodec.decodeGray(JpegCodec.encodeGray(w, h, gray)).get
      val prog = JpegCodec.decodeGray(JpegCodec.encodeGrayProgressive(w, h, gray))
      assert(prog.isDefined, s"progressive ${w}x$h must decode")
      // the script restores every coefficient bit, so the IDCT inputs
      // are identical and the rasters must match EXACTLY
      assert(prog.get._3.sameElements(base._3), s"${w}x$h pixel mismatch")
    }
  }

  test("progressive: spectral-selection-only script, EOB runs over smooth rasters, restart markers") {
    val rnd = new java.util.Random(77L)
    val w = 64; val h = 64
    // constant raster → every AC band empty → one EOBn spans all 64
    // blocks (the multi-block end-of-band run path)
    val flat = Array.fill(w * h)(130)
    val spectral = Seq((0, 0, 0, 0), (1, 9, 0, 0), (10, 63, 0, 0))
    val bf = JpegCodec.decodeGray(JpegCodec.encodeGray(w, h, flat)).get
    val pf = JpegCodec.decodeGray(JpegCodec.encodeGrayProgressive(w, h, flat, scans = spectral))
    assert(pf.isDefined && pf.get._3.sameElements(bf._3))
    val gray = Array.fill(w * h)(rnd.nextInt(256))
    val b2 = JpegCodec.decodeGray(JpegCodec.encodeGray(w, h, gray)).get
    val p2 = JpegCodec.decodeGray(JpegCodec.encodeGrayProgressive(w, h, gray, scans = spectral))
    assert(p2.isDefined && p2.get._3.sameElements(b2._3), "spectral-only script must round-trip")
    val p3 = JpegCodec.decodeGray(JpegCodec.encodeGrayProgressive(w, h, gray, restartInterval = 5))
    assert(p3.isDefined && p3.get._3.sameElements(b2._3), "restart-marker progressive must round-trip")
  }

  test("progressive: plateau rasters (long zero-history runs + correction bits) round-trip under every script shape") {
    // the m4c fixture shape — large flat cells → AC bands full of
    // zero-history runs interleaved with already-significant
    // coefficients. This is the raster family that catches a refine
    // encoder whose ZRL emission point or correction-bit flush order
    // deviates from the decoder's T.81 traversal (noise rasters,
    // having few long runs, never exercise it).
    for (g <- Seq(0L, 1L, 5L, 9L)) {
      val ws = (4 + (g * 37) % 12).toInt; val hs = (4 + (g * 53) % 12).toInt
      val w = 9 * ws; val h = 8 * hs
      val rnd = new java.util.Random(g * 2654435761L + 29)
      val perm = Array.tabulate(72)(identity)
      var i = perm.length - 1
      while (i > 0) {
        val j = rnd.nextInt(i + 1)
        val t = perm(i); perm(i) = perm(j); perm(j) = t; i -= 1
      }
      val cell = perm.map(p => 12 + 3 * p)
      val gray = Array.tabulate(w * h)(p => cell(((p / w) / hs) * 9 + (p % w) / ws))
      val px = JpegCodec.decodeGray(JpegCodec.encodeGray(w, h, gray)).get._3
      for ((tag, scans) <- Seq(
        "spectral" -> Seq((0, 0, 0, 0), (1, 63, 0, 0)),
        "dcSA" -> Seq((0, 0, 0, 1), (0, 0, 1, 0), (1, 63, 0, 0)),
        "acSA" -> Seq((0, 0, 0, 0), (1, 63, 0, 1), (1, 63, 1, 0)),
        "default" -> JpegCodec.DefaultProgScans)) {
        val p = JpegCodec.decodeGray(JpegCodec.encodeGrayProgressive(w, h, gray, scans = scans))
        assert(p.isDefined && p.get._3.sameElements(px), s"g=$g ${w}x$h $tag")
      }
      // the fixture path: a re-encode of DECODED pixels must decode too
      assert(JpegCodec.decodeGray(JpegCodec.encodeGrayProgressive(w, h, px)).isDefined)
    }
  }

  test("progressive color: chroma-only scans step over mid-frame; interleaved DC walks 4:2:0 MCUs") {
    val rnd = new java.util.Random(202L)
    // 4:4:4 — chroma AC scans placed BETWEEN luma scans: the decoder
    // must step over their entropy data via the next-marker walk or
    // every later luma scan desyncs
    for ((w, h) <- Seq((16, 16), (37, 29))) {
      val y = Array.fill(w * h)(rnd.nextInt(256))
      val cb = Array.fill(w * h)(rnd.nextInt(256))
      val cr = Array.fill(w * h)(rnd.nextInt(256))
      val base = JpegCodec.decodeGray(JpegCodec.encodeGray(w, h, y)).get
      val prog = JpegCodec.decodeGray(JpegCodec.encodeYccProgressive(w, h, y, cb, cr))
      assert(prog.isDefined, s"4:4:4 progressive ${w}x$h must decode")
      assert(prog.get._3.sameElements(base._3),
        s"${w}x$h: chroma scans must not desync the luma assembly")
    }
    // 4:2:0 — the interleaved progressive DC scan walks 4 luma blocks
    // per MCU; a wrong (mx·h+bx) placement scrambles block DC levels
    for ((w, h) <- Seq((32, 32), (40, 24), (17, 19))) {
      val y = Array.fill(w * h)(rnd.nextInt(256))
      val cw = (w + 1) / 2; val ch = (h + 1) / 2
      val cb = Array.fill(cw * ch)(rnd.nextInt(256))
      val cr = Array.fill(cw * ch)(rnd.nextInt(256))
      val base = JpegCodec.decodeGray(JpegCodec.encodeGray(w, h, y)).get
      val prog = JpegCodec.decodeGray(
        JpegCodec.encodeYccProgressive(w, h, y, cb, cr, lumaSampling = (2, 2)))
      assert(prog.isDefined, s"4:2:0 progressive ${w}x$h must decode")
      assert(prog.get._3.sameElements(base._3), s"4:2:0 ${w}x$h luma mismatch")
    }
    // restart markers through interleaved DC + chroma + refine scans
    val y = Array.fill(24 * 24)(rnd.nextInt(256))
    val cb = Array.fill(12 * 12)(rnd.nextInt(256))
    val cr = Array.fill(12 * 12)(rnd.nextInt(256))
    val base = JpegCodec.decodeGray(JpegCodec.encodeGray(24, 24, y)).get
    val prog = JpegCodec.decodeGray(JpegCodec.encodeYccProgressive(
      24, 24, y, cb, cr, lumaSampling = (2, 2), restartInterval = 2))
    assert(prog.isDefined && prog.get._3.sameElements(base._3),
      "restart markers must reset predictors in every progressive scan type")
  }

  test("progressive: malformed and truncated streams degrade to None, never throw or hang") {
    val gray = noise(16, 16, 9L)
    val prog = JpegCodec.encodeGrayProgressive(16, 16, gray)
    assert(JpegCodec.decodeGray(prog).isDefined)
    // truncations at every prefix must degrade cleanly
    var n = 2
    while (n < prog.length) {
      JpegCodec.decodeGray(prog.take(n)) // any Option; no exception
      n += 5
    }
    // single-byte corruptions must neither throw nor hang
    val rnd = new java.util.Random(5L)
    val t0 = System.nanoTime()
    for (_ <- 0 until 300) {
      val c = prog.clone()
      c(2 + rnd.nextInt(c.length - 2)) = rnd.nextInt(256).toByte
      JpegCodec.decodeGray(c)
    }
    assert((System.nanoTime() - t0) < 30e9, "corrupted progressive streams must decode or bail promptly")
    // an illegal scan header (Ah != Al+1) degrades
    assert(JpegCodec.decodeGray(
      JpegCodec.encodeGrayProgressive(16, 16, gray,
        scans = Seq((0, 0, 0, 0), (1, 63, 0, 0))) // legal: full precision in one go
    ).isDefined)
    // color progressive: same truncation/corruption discipline — the
    // mid-frame chroma-scan step-over and interleaved DC walk must
    // bail cleanly too, never throw or spin
    val cb = noise(8, 8, 10L); val cr = noise(8, 8, 11L)
    val cprog = JpegCodec.encodeYccProgressive(16, 16, gray, cb, cr,
      lumaSampling = (2, 2))
    assert(JpegCodec.decodeGray(cprog).isDefined)
    n = 2
    while (n < cprog.length) {
      JpegCodec.decodeGray(cprog.take(n))
      n += 5
    }
    val t1 = System.nanoTime()
    for (_ <- 0 until 300) {
      val c = cprog.clone()
      c(2 + rnd.nextInt(c.length - 2)) = rnd.nextInt(256).toByte
      JpegCodec.decodeGray(c)
    }
    assert((System.nanoTime() - t1) < 30e9, "corrupted color-progressive streams must bail promptly")
  }

  test("a corrupt entropy stream terminates (degrade, never hang)") {
    val ok = JpegCodec.encodeGray(24, 24, noise(24, 24, 5L))
    // zero out the tail of the entropy data: huffman decode walks into
    // padding and must bail via the 16-bit length cap, not spin
    val bad = ok.clone()
    var i = ok.length - 10
    while (i < ok.length - 2) { bad(i) = 0x15; i += 1 }
    val t0 = System.nanoTime()
    JpegCodec.decodeGray(bad) // result irrelevant; must return promptly
    assert((System.nanoTime() - t0) < 5e9, "corrupt stream must not hang")
  }
}
