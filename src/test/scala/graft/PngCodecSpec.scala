package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PngCodec

/** Kernel tests for the pure-JVM PNG codec and the real pixel dHash —
  * the ExprParity-style pins for the unfilter/resize arithmetic. */
class PngCodecSpec extends AnyFunSuite {

  private def noise(w: Int, h: Int, seed: Long): Array[Int] = {
    val rnd = new java.util.Random(seed)
    Array.fill(w * h)(rnd.nextInt(256))
  }

  test("round trip: every scanline filter type reconstructs the exact raster") {
    val (w, h) = (23, 17)
    val px = noise(w, h, 42L)
    for (f <- 0 to 4) {
      val decoded = PngCodec.decodeGray(PngCodec.encodeGray(w, h, px, _ => f))
      assert(decoded.isDefined, s"filter $f must decode")
      val (dw, dh, gray) = decoded.get
      assert((dw, dh) == (w, h))
      assert(gray.sameElements(px), s"filter $f round trip must be exact")
    }
    // mixed filters (the fixture's y % 5 cycle) — all branches in one image
    val (dw, dh, gray) = PngCodec.decodeGray(
      PngCodec.encodeGray(w, h, px, y => y % 5)).get
    assert((dw, dh) == (w, h) && gray.sameElements(px))
  }

  test("decode degrades to None on non-PNG, truncated, and unsupported payloads") {
    assert(PngCodec.decodeGray("not a png at all, just text bytes".getBytes).isEmpty)
    val ok = PngCodec.encodeGray(9, 8, noise(9, 8, 1L), _ => 0)
    assert(PngCodec.decodeGray(ok.take(40)).isEmpty, "truncated IDAT must not decode")
    assert(PngCodec.decodeGray(ok.take(33)).isEmpty, "header-only (m4 fixture shape) must fall back")
  }

  test("RGB and RGBA payloads decode via the luma path") {
    // hand-build a 2x2 color-type-2 PNG: scanlines [filter 0, RGB RGB]
    def chunk(t: String, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length).put(t.getBytes).put(data)
      val crc = new java.util.zip.CRC32(); crc.update(bb.array(), 4, 4 + data.length)
      bb.putInt(crc.getValue.toInt).array()
    }
    def deflate(raw: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater(); d.setInput(raw); d.finish()
      val buf = new Array[Byte](256); val o = new java.io.ByteArrayOutputStream()
      while (!d.finished()) o.write(buf, 0, d.deflate(buf))
      d.end(); o.toByteArray
    }
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    def ihdr(colorType: Int) = java.nio.ByteBuffer.allocate(13)
      .putInt(2).putInt(2).put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    // pixels: (255,0,0) (0,255,0) / (0,0,255) (255,255,255)
    val rgbRaw = Array[Int](0, 255,0,0, 0,255,0, 0, 0,0,255, 255,255,255).map(_.toByte)
    val rgb = sig ++ chunk("IHDR", ihdr(2)) ++ chunk("IDAT", deflate(rgbRaw)) ++
      chunk("IEND", Array.empty[Byte])
    val Some((2, 2, luma)) = PngCodec.decodeGray(rgb)
    // ITU-R 601 integer luma: r*299+g*587+b*114 over 1000
    assert(luma.toSeq == Seq(299 * 255 / 1000, 587 * 255 / 1000, 114 * 255 / 1000, 255))
    // RGBA: same pixels with alpha, alpha must be ignored
    val rgbaRaw = Array[Int](0, 255,0,0,9, 0,255,0,9, 0, 0,0,255,9, 255,255,255,9).map(_.toByte)
    val rgba = sig ++ chunk("IHDR", ihdr(6)) ++ chunk("IDAT", deflate(rgbaRaw)) ++
      chunk("IEND", Array.empty[Byte])
    val Some((2, 2, luma2)) = PngCodec.decodeGray(rgba)
    assert(luma2.toSeq == luma.toSeq)
  }

  test("dHashPixels: brightness-shift invariant, one-pixel edit flips at most 2 bits") {
    val (w, h) = (40, 30)
    val px = noise(w, h, 7L)
    val base = PngCodec.dHashPixels(w, h, px)
    // +25 to every pixel (clipping avoided: regenerate in 0..200 range)
    val px2 = px.map(v => v % 200)
    val b2 = PngCodec.dHashPixels(w, h, px2)
    assert(PngCodec.dHashPixels(w, h, px2.map(_ + 25)) == b2,
      "adding constant brightness must not change the hash")
    // one-pixel edit moves one resize cell -> at most 2 gradient bits
    val edited = px.clone(); edited(w + 1) = (edited(w + 1) + 128) % 256
    val he = PngCodec.dHashPixels(w, h, edited)
    assert(java.lang.Long.bitCount(base ^ he) <= 2,
      s"one-pixel edit flipped ${java.lang.Long.bitCount(base ^ he)} bits")
  }

  test("property: round trip is exact for random rasters, dims, and per-row filters") {
    for (seed <- 1 to 25) {
      val rnd = new java.util.Random(seed * 7919L)
      val w = 9 + rnd.nextInt(40)
      val h = 8 + rnd.nextInt(32)
      val px = Array.fill(w * h)(rnd.nextInt(256))
      val filters = Array.fill(h)(rnd.nextInt(5))
      val Some((dw, dh, dec)) = PngCodec.decodeGray(
        PngCodec.encodeGray(w, h, px, y => filters(y)))
      assert((dw, dh) == (w, h) && dec.sameElements(px),
        s"seed $seed (${w}x$h) round trip broke")
    }
  }

  test("property: brightness-shift invariance holds exactly for any raster and shift") {
    for (seed <- 1 to 25) {
      val rnd = new java.util.Random(seed * 104729L)
      val w = 9 + rnd.nextInt(30)
      val h = 8 + rnd.nextInt(24)
      val px = Array.fill(w * h)(rnd.nextInt(200)) // headroom for the shift
      val k = rnd.nextInt(56)
      assert(PngCodec.dHashPixels(w, h, px) ==
        PngCodec.dHashPixels(w, h, px.map(_ + k)),
        s"seed $seed: +$k brightness changed the hash")
    }
  }

  test("property: decode never throws on arbitrary garbage bytes") {
    for (seed <- 1 to 50) {
      val rnd = new java.util.Random(seed * 31L)
      val b = Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      PngCodec.decodeGray(b) // must return (None or Some), never throw
      // adversarial: valid signature + random tail
      val sigged = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++ b
      PngCodec.decodeGray(sigged)
    }
  }

  test("palette round trip: PLTE lookup reconstructs the exact raster") {
    val (w, h) = (23, 17)
    val px = noise(w, h, 99L)
    for (f <- 0 to 4) {
      val Some((dw, dh, dec)) = PngCodec.decodeGray(
        PngCodec.encodePaletted(w, h, px, _ => f))
      assert((dw, dh) == (w, h) && dec.sameElements(px),
        s"palette filter $f round trip must be exact")
    }
    val enc = PngCodec.encodePaletted(w, h, px, y => y % 5)
    val Some((_, _, dec)) = PngCodec.decodeGray(enc)
    assert(dec.sameElements(px))
    // the palette is a NON-identity permutation: a decoder that read
    // index bytes as luminance would get a scrambled raster, so the
    // exactness above proves the PLTE lookup genuinely runs
    assert((0 * 131 + 7) % 256 != 0)
  }

  test("Adam7 round trip: every pass geometry reconstructs exactly") {
    // spans empty passes (w or h < 8), single-pixel, exact-8 lattice,
    // odd dims, and fixture-scale rasters
    for ((w, h) <- Seq((1, 1), (2, 2), (3, 2), (5, 3), (7, 5), (8, 8),
        (9, 8), (16, 16), (23, 17), (40, 30), (216, 69))) {
      val px = noise(w, h, w * 1000L + h)
      val Some((dw, dh, dec)) = PngCodec.decodeGray(
        PngCodec.encodeAdam7(w, h, px, y => y % 5))
      assert((dw, dh) == (w, h) && dec.sameElements(px),
        s"Adam7 ${w}x$h round trip broke")
    }
  }

  test("palette/Adam7 degrades: missing PLTE, short palette, 16-bit all return None") {
    def chunk(t: String, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length).put(t.getBytes).put(data)
      val crc = new java.util.zip.CRC32(); crc.update(bb.array(), 4, 4 + data.length)
      bb.putInt(crc.getValue.toInt).array()
    }
    def deflate(raw: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater(); d.setInput(raw); d.finish()
      val buf = new Array[Byte](256); val o = new java.io.ByteArrayOutputStream()
      while (!d.finished()) o.write(buf, 0, d.deflate(buf))
      d.end(); o.toByteArray
    }
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    def ihdr3 = java.nio.ByteBuffer.allocate(13)
      .putInt(2).putInt(2).put(8.toByte).put(3.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val idat = deflate(Array[Int](0, 0, 1, 0, 1, 0).map(_.toByte))
    // color type 3 with no PLTE chunk at all
    val noPlte = sig ++ chunk("IHDR", ihdr3) ++ chunk("IDAT", idat) ++
      chunk("IEND", Array.empty[Byte])
    assert(PngCodec.decodeGray(noPlte).isEmpty, "missing PLTE must degrade")
    // 2-entry PLTE but an index byte of 5 — past the palette, corrupt
    val shortPlte = sig ++ chunk("IHDR", ihdr3) ++
      chunk("PLTE", Array[Byte](0, 0, 0, 40, 40, 40)) ++
      chunk("IDAT", deflate(Array[Int](0, 0, 5, 0, 1, 0).map(_.toByte))) ++
      chunk("IEND", Array.empty[Byte])
    assert(PngCodec.decodeGray(shortPlte).isEmpty, "out-of-range index must degrade")
    // in-range indexes over the same 2-entry palette decode fine
    val okPlte = sig ++ chunk("IHDR", ihdr3) ++
      chunk("PLTE", Array[Byte](0, 0, 0, 40, 40, 40)) ++
      chunk("IDAT", deflate(Array[Int](0, 0, 1, 0, 1, 0).map(_.toByte))) ++
      chunk("IEND", Array.empty[Byte])
    assert(PngCodec.decodeGray(okPlte).map(_._3.toSeq).contains(Seq(0, 40, 40, 0)))
    // 16-bit PALETTE is illegal (spec §11.2.2 — palette caps at 8):
    // the depth gate must reject the combo even now that legal 16-bit
    // streams decode for real
    val deep = PngCodec.encodePaletted(9, 8, noise(9, 8, 3L), _ => 0)
    deep(24) = 16
    assert(PngCodec.decodeGray(deep).isEmpty, "16-bit palette is illegal, must degrade")
  }

  test("16-bit gray round trip: v*257 upscale decodes back to the exact 8-bit raster") {
    val (w, h) = (23, 17)
    val px = noise(w, h, 1234L)
    for (f <- 0 to 4) {
      val Some((dw, dh, dec)) = PngCodec.decodeGray(
        PngCodec.encodeGray16(w, h, px.map(_ * 257), _ => f))
      assert((dw, dh) == (w, h) && dec.sameElements(px),
        s"16-bit filter $f must reconstruct the 8-bit raster exactly")
    }
    // arbitrary 16-bit samples reduce by the exact v*255/65535 proportion
    val rnd = new java.util.Random(5L)
    val deep = Array.fill(w * h)(rnd.nextInt(65536))
    val Some((_, _, dec)) = PngCodec.decodeGray(
      PngCodec.encodeGray16(w, h, deep, y => y % 5))
    assert(dec.sameElements(deep.map(v => v * 255 / 65535)),
      "16-bit reduction must be the exact integer proportion")
  }

  test("sub-byte gray round trips: depths 1/2/4 unpack MSB-first with row padding") {
    for (depth <- Seq(1, 2, 4); (w, h) <- Seq((9, 8), (23, 17), (16, 16))) {
      val maxV = (1 << depth) - 1
      val rnd = new java.util.Random(depth * 1000L + w)
      val px = Array.fill(w * h)(rnd.nextInt(maxV + 1))
      val Some((dw, dh, dec)) = PngCodec.decodeGray(
        PngCodec.encodeGraySub(w, h, depth, px, y => y % 5))
      assert((dw, dh) == (w, h), s"depth $depth ${w}x$h dims")
      assert(dec.sameElements(px.map(v => v * 255 / maxV)),
        s"depth $depth ${w}x$h must scale samples to the exact 8-bit grid")
    }
  }

  test("sub-byte palette round trip: 4-bit indices run the PLTE lookup") {
    val (w, h) = (23, 17)
    val rnd = new java.util.Random(77L)
    val levels = Array.fill(w * h)(rnd.nextInt(16))
    val Some((dw, dh, dec)) = PngCodec.decodeGray(
      PngCodec.encodePalettedSub(w, h, 4, levels, y => y % 5))
    assert((dw, dh) == (w, h))
    assert(dec.sameElements(levels.map(v => v * 255 / 15)),
      "4-bit palette must map levels through the permuted PLTE exactly")
    // non-identity permutation: misreading indices as gray scrambles
    assert((0 * 13 + 1) % 16 != 0)
  }

  test("cross-depth equivalence: 8-bit and 16-bit storage hash identically (m4g)") {
    for (seed <- 1 to 10) {
      val rnd = new java.util.Random(seed * 9973L)
      val w = 9 + rnd.nextInt(60); val h = 8 + rnd.nextInt(40)
      val px = Array.fill(w * h)(rnd.nextInt(256))
      def hashVia(enc: Array[Byte]): Long = {
        val Some((dw, dh, dec)) = PngCodec.decodeGray(enc)
        assert((dw, dh) == (w, h))
        PngCodec.dHashPixels(dw, dh, dec)
      }
      assert(hashVia(PngCodec.encodeGray(w, h, px, y => y % 5)) ==
        hashVia(PngCodec.encodeGray16(w, h, px.map(_ * 257), y => y % 5)),
        s"seed $seed: bit depth changed the perceptual hash")
    }
  }

  test("16-bit ADAM7 stream decodes: interlaced passes at bpp=2 reconstruct exactly") {
    // hand-assembled (the fixture encoder is 8-bit-only): a 5x3
    // depth-16 gray image, Adam7 — passes 1 (1x1), 2 (1x1), 4 (1x2),
    // 6 (2x3 lattice cols 1,3), 7 (5x1 row 1) are non-empty at this
    // geometry; all filters 0, samples v*257 so the reduction is exact
    def chunk(t: String, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length).put(t.getBytes).put(data)
      val crc = new java.util.zip.CRC32(); crc.update(bb.array(), 4, 4 + data.length)
      bb.putInt(crc.getValue.toInt).array()
    }
    def deflate(raw: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater(); d.setInput(raw); d.finish()
      val buf = new Array[Byte](512); val o = new java.io.ByteArrayOutputStream()
      while (!d.finished()) o.write(buf, 0, d.deflate(buf))
      d.end(); o.toByteArray
    }
    val (w, h) = (5, 3)
    val px = Array.tabulate(w * h)(i => (i * 17) % 256) // target 8-bit raster
    def be16(v: Int) = Seq((v >> 8).toByte, (v & 0xff).toByte)
    // non-empty Adam7 passes at 5x3, in spec order (pass 3 — y0=4 —
    // is empty): p1 (0,0); p2 (4,0); p4 (2,0); p5 row 2 cols 0,2,4;
    // p6 cols 1,3 x rows 0,2 (two scanlines); p7 row 1 full
    val raw = new java.io.ByteArrayOutputStream()
    def scanline(coords: Seq[(Int, Int)]): Unit = {
      raw.write(0) // filter None
      coords.foreach { case (x, y) => be16(px(y * w + x) * 257).foreach(raw.write(_)) }
    }
    scanline(Seq((0, 0)))
    scanline(Seq((4, 0)))
    scanline(Seq((2, 0)))
    scanline(Seq((0, 2), (2, 2), (4, 2)))
    scanline(Seq((1, 0), (3, 0)))
    scanline(Seq((1, 2), (3, 2)))
    scanline((0 until 5).map(x => (x, 1)))
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(16.toByte).put(0.toByte)
      .put(0.toByte).put(0.toByte).put(1.toByte).array() // interlace 1
    val png = sig ++ chunk("IHDR", ihdr) ++
      chunk("IDAT", deflate(raw.toByteArray)) ++ chunk("IEND", Array.empty[Byte])
    val Some((dw, dh, dec)) = PngCodec.decodeGray(png)
    assert((dw, dh) == (w, h))
    assert(dec.sameElements(px),
      s"16-bit Adam7 must reconstruct exactly: ${dec.toSeq} vs ${px.toSeq}")
  }

  test("16-bit RGB decodes via the scaled luma path") {
    def chunk(t: String, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length).put(t.getBytes).put(data)
      val crc = new java.util.zip.CRC32(); crc.update(bb.array(), 4, 4 + data.length)
      bb.putInt(crc.getValue.toInt).array()
    }
    def deflate(raw: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater(); d.setInput(raw); d.finish()
      val buf = new Array[Byte](256); val o = new java.io.ByteArrayOutputStream()
      while (!d.finished()) o.write(buf, 0, d.deflate(buf))
      d.end(); o.toByteArray
    }
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(2).putInt(1).put(16.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    // 1 scanline, 2 pixels: (65535,0,0) and (257*100, 257*50, 257*25)
    def be(v: Int) = Seq((v >> 8).toByte, (v & 0xff).toByte)
    val raw = (Seq(0.toByte) ++ be(65535) ++ be(0) ++ be(0) ++
      be(257 * 100) ++ be(257 * 50) ++ be(257 * 25)).toArray
    val png = sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", deflate(raw)) ++
      chunk("IEND", Array.empty[Byte])
    val Some((2, 1, luma)) = PngCodec.decodeGray(png)
    assert(luma.toSeq == Seq(299 * 255 / 1000,
      (299 * 100 + 587 * 50 + 114 * 25) / 1000),
      "16-bit channels must reduce to 8-bit before the ITU-R 601 luma")
  }

  test("mixed-storage equivalence: gray, palette, and Adam7 hash identically (m4f)") {
    for (seed <- 1 to 10) {
      val rnd = new java.util.Random(seed * 6151L)
      val w = 9 + rnd.nextInt(60); val h = 8 + rnd.nextInt(40)
      val px = Array.fill(w * h)(rnd.nextInt(256))
      def hashVia(enc: Array[Byte]): Long = {
        val Some((dw, dh, dec)) = PngCodec.decodeGray(enc)
        assert((dw, dh) == (w, h))
        PngCodec.dHashPixels(dw, dh, dec)
      }
      val hGray = hashVia(PngCodec.encodeGray(w, h, px, y => y % 5))
      val hPal = hashVia(PngCodec.encodePaletted(w, h, px, y => y % 5))
      val hA7 = hashVia(PngCodec.encodeAdam7(w, h, px, y => y % 5))
      assert(hGray == hPal && hGray == hA7,
        s"seed $seed: storage form changed the perceptual hash")
    }
  }

  test("fixture pipeline: real-pixel images pair within groups only") {
    // mirrors the m4b oracle's closed form on a tiny in-memory corpus
    val sparkless = Seq(0L, 1L, 251L, 252L, 502L)
    // encode + decode + hash without Spark: group 0 = {0, 251, 502}, group 1 = {1, 252}
    def hashOf(id: Long): Long = {
      val g = (id % 251).toInt
      val w = 16 + (g * 37) % 200; val h = 16 + (g * 53) % 150
      val rnd = new java.util.Random(g * 2654435761L)
      val gray = Array.fill(w * h)(rnd.nextInt(256))
      if (id % 2 == 1) gray(w + 1) = (gray(w + 1) + 128) % 256
      val Some((dw, dh, dec)) = PngCodec.decodeGray(
        PngCodec.encodeGray(w, h, gray, y => y % 5))
      PngCodec.dHashPixels(dw, dh, dec)
    }
    val hs = sparkless.map(id => id -> hashOf(id)).toMap
    assert(java.lang.Long.bitCount(hs(0L) ^ hs(502L)) == 0, "even twins decode identical")
    assert(java.lang.Long.bitCount(hs(0L) ^ hs(251L)) <= 2, "edited twin within gate")
    assert(java.lang.Long.bitCount(hs(1L) ^ hs(252L)) <= 2, "edited twin within gate")
    assert(java.lang.Long.bitCount(hs(0L) ^ hs(1L)) > 3, "cross-group far apart")
  }
}
