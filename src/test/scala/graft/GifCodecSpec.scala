package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{GifCodec, PngCodec}

/** The GIF codec against its own encoder AND against shapes the
  * encoder never emits (small palettes, low min-code sizes, extension
  * blocks) — plus the cross-container agreement that makes m4h's
  * closed-form oracle valid: GIF re-store of a gray raster decodes to
  * the SAME pixels the PNG path reads. */
class GifCodecSpec extends AnyFunSuite {

  private def raster(seed: Long, w: Int, h: Int): Array[Int] = {
    val rnd = new java.util.Random(seed)
    Array.fill(w * h)(rnd.nextInt(256))
  }

  test("round trip: plain, interlaced, and local-palette GIFs decode to the exact raster") {
    for ((w, h) <- Seq((16, 16), (37, 23), (1, 1), (200, 3), (5, 121))) {
      val px = raster(w * 1000L + h, w, h)
      for ((il, lp) <- Seq((false, false), (true, false), (false, true), (true, true))) {
        val gif = GifCodec.encodeGray(w, h, px, interlaced = il, localPalette = lp)
        val out = GifCodec.decodeGray(gif)
        assert(out.isDefined, s"${w}x$h il=$il lp=$lp must decode")
        val (dw, dh, dp) = out.get
        assert(dw == w && dh == h)
        assert(java.util.Arrays.equals(dp, px), s"${w}x$h il=$il lp=$lp pixels differ")
      }
    }
  }

  test("LZW table reset: rasters big enough to fill the 4096-entry table round-trip") {
    // noise fills the dictionary fast; 300x200 = 60k px guarantees resets
    val px = raster(42L, 300, 200)
    val gif = GifCodec.encodeGray(300, 200, px)
    assert(GifCodec.decodeGray(gif).exists(t => java.util.Arrays.equals(t._3, px)))
    // a constant raster maximizes run-length chains (the KwKwK case)
    val flat = Array.fill(97 * 61)(137)
    assert(GifCodec.decodeGray(GifCodec.encodeGray(97, 61, flat))
      .exists(t => java.util.Arrays.equals(t._3, flat)))
    // two-value stripes drive long repeated strings through KwKwK
    val stripes = Array.tabulate(128 * 64)(i => if ((i / 128) % 2 == 0) 0 else 255)
    assert(GifCodec.decodeGray(GifCodec.encodeGray(128, 64, stripes))
      .exists(t => java.util.Arrays.equals(t._3, stripes)))
  }

  test("cross-container agreement: GIF and PNG of the same raster decode identically") {
    val px = raster(7L, 64, 48)
    val viaPng = PngCodec.decodeGray(PngCodec.encodeGray(64, 48, px, _ % 5)).get._3
    val viaGif = GifCodec.decodeGray(GifCodec.encodeGray(64, 48, px, interlaced = true)).get._3
    assert(java.util.Arrays.equals(viaPng, viaGif),
      "cross-container hashes require identical rasters")
  }

  test("extension blocks (GCE, comment, application) are skipped by framing") {
    val px = raster(9L, 20, 10)
    val gif = GifCodec.encodeGray(20, 10, px)
    // splice a graphic-control extension + a comment extension between
    // the palette and the image descriptor (offset: 13 header + 768 GCT)
    val gce = Array[Byte](0x21, 0xf9.toByte, 4, 0, 0, 0, 0, 0)
    val comment = Array[Byte](0x21, 0xfe.toByte, 5, 'g', 'r', 'a', 'f', 't', 0)
    val at = 13 + 768
    val spliced = gif.take(at) ++ gce ++ comment ++ gif.drop(at)
    assert(GifCodec.decodeGray(spliced).exists(t => java.util.Arrays.equals(t._3, px)),
      "extensions must be skipped by their sub-block framing")
  }

  test("hand-built small-palette GIF decodes (shapes the encoder never emits)") {
    // 4x2, 2-bit palette {0, 85, 170, 255}, min code size 2
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(Array[Byte](4, 0, 2, 0)) // 4x2 LE
    out.write(0xf1); out.write(0); out.write(0) // GCT, size bits 1 → 4 entries
    for (v <- Seq(0, 85, 170, 255)) { out.write(v); out.write(v); out.write(v) }
    out.write(0x2c)
    out.write(Array[Byte](0, 0, 0, 0, 4, 0, 2, 0, 0))
    out.write(2) // min code size 2
    // indices 0,1,2,3,3,2,1,0 LZW-coded by hand: width starts at 3
    // codes: CLEAR(4) 0 1 2 3 3 2 1 0 EOI(5) — all literals (table
    // entries 6..13 get added but never used)
    val codes = Seq(4, 0, 1, 2, 3, 3, 2, 1, 0, 5)
    val widths = Seq(3, 3, 3, 3, 4, 4, 4, 4, 4, 4) // next hits 8 after adding entry 8
    var bitBuf = 0L; var nBits = 0
    val lzw = new java.io.ByteArrayOutputStream()
    codes.zip(widths).foreach { case (c, w) =>
      bitBuf |= c.toLong << nBits; nBits += w
      while (nBits >= 8) { lzw.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; nBits -= 8 }
    }
    if (nBits > 0) lzw.write((bitBuf & 0xff).toInt)
    val data = lzw.toByteArray
    out.write(data.length); out.write(data); out.write(0)
    out.write(0x3b)
    val dec = GifCodec.decodeGray(out.toByteArray)
    assert(dec.isDefined, "small-palette GIF must decode")
    assert(dec.get._3.toSeq == Seq(0, 85, 170, 255, 255, 170, 85, 0))
  }

  test("degrades never throw: truncation, garbage, missing palette, bad codes") {
    val gif = GifCodec.encodeGray(30, 20, raster(3L, 30, 20))
    for (cut <- Seq(3, 6, 13, 400, gif.length / 2, gif.length - 2))
      assert(GifCodec.decodeGray(gif.take(cut)).isEmpty, s"cut=$cut must degrade")
    // no global AND no local palette: undecodable
    val noPal = new java.io.ByteArrayOutputStream()
    noPal.write("GIF89a".getBytes("US-ASCII"))
    noPal.write(Array[Byte](2, 0, 2, 0, 0x00, 0, 0)) // no GCT
    noPal.write(0x2c); noPal.write(Array[Byte](0, 0, 0, 0, 2, 0, 2, 0, 0))
    noPal.write(2); noPal.write(1); noPal.write(0x11); noPal.write(0); noPal.write(0x3b)
    assert(GifCodec.decodeGray(noPal.toByteArray).isEmpty)
    val rnd = new java.util.Random(11L)
    for (_ <- 1 to 100) {
      val junk = "GIF89a".getBytes("US-ASCII") ++
        Array.fill(rnd.nextInt(300))(rnd.nextInt(256).toByte)
      GifCodec.decodeGray(junk) // must return, never throw
    }
  }

  test("gifClass labels storage forms; non-GIF bytes stay out") {
    val px = raster(5L, 10, 10)
    def cls(il: Boolean, lp: Boolean) = GifCodec.gifClass(
      GifCodec.encodeGray(10, 10, px, interlaced = il, localPalette = lp))
    assert(cls(il = false, lp = false) == "gif8")
    assert(cls(il = true, lp = false) == "gif8_interlaced")
    assert(cls(il = false, lp = true) == "gif8_local")
    assert(GifCodec.gifClass("not a gif".getBytes("UTF-8")) == "not_gif")
  }
}
