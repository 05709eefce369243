package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{FlacCodec, Multimodal}

/** The FLAC decoder against its own verbatim muxer AND against
  * hand-built frames covering every subframe/residual/stereo shape the
  * muxer never emits — constant, fixed predictors, LPC, rice and
  * escape residuals, wasted bits, mid/side decorrelation. A decoder
  * tested only against its twin encoder proves round-trip, not format
  * coverage (the ExifParseSpec discipline). */
class FlacCodecSpec extends AnyFunSuite {

  private def noise(n: Int, seed: Long): Array[Short] = {
    val rnd = new java.util.Random(seed)
    Array.fill(n)((rnd.nextInt(2048) - 1024).toShort)
  }

  test("round-trip: verbatim encode then decode returns the exact samples") {
    for (ch <- 1 to 2; n <- Seq(4160, 5000)) {
      val pcm = noise(n * ch, 7L + ch)
      val flac = FlacCodec.encodeVerbatim(44100, ch, pcm)
      val out = FlacCodec.decodeS16(flac)
      assert(out.isDefined, s"ch=$ch n=$n must decode")
      val (rate, oc, samples) = out.get
      assert(rate == 44100 && oc == ch)
      assert(java.util.Arrays.equals(samples, pcm), s"ch=$ch n=$n samples differ")
    }
  }

  test("info reads STREAMINFO without decoding frames") {
    val flac = FlacCodec.encodeVerbatim(8000, 2, noise(8320, 3L))
    assert(FlacCodec.info(flac).contains((8000, 2, 16, 4160L)))
    assert(Multimodal.parseDims(flac).contains(("audio/flac", 8000, 2)))
  }

  // ---- a hand-rolled frame builder for the shapes the muxer never emits

  /** One-frame FLAC stream with caller-written subframe bits. */
  private def handStream(rate: Int, channels: Int, chCode: Int, blockSize: Int,
      total: Long)(subframes: FlacCodec.Writer => Unit): Array[Byte] = {
    val head = new FlacCodec.Writer
    head.put(0x664c6143L, 32)
    head.put(0x80, 8); head.put(34, 24)
    head.put(blockSize, 16); head.put(blockSize, 16)
    head.put(0, 24); head.put(0, 24)
    head.put(rate, 20); head.put(channels - 1, 3); head.put(15, 5)
    head.put(total, 36)
    (0 until 16).foreach(_ => head.put(0, 8))
    val hw = new FlacCodec.Writer
    hw.put(0x3ffe, 14); hw.put(0, 1); hw.put(0, 1)
    hw.put(7, 4); hw.put(0, 4) // 16-bit blocksize follows; rate from streaminfo
    hw.put(chCode, 4); hw.put(4, 3); hw.put(0, 1) // bps 16
    hw.put(0, 8) // frame number 0
    hw.put(blockSize - 1, 16)
    val hb = hw.bytes
    val fw = new FlacCodec.Writer
    hb.foreach(x => fw.put(x & 0xffL, 8))
    fw.put(FlacCodec.crc8(hb, 0, hb.length), 8)
    subframes(fw)
    val fb = fw.bytes
    val out = new FlacCodec.Writer
    fb.foreach(x => out.put(x & 0xffL, 8))
    out.put(FlacCodec.crc16(fb, 0, fb.length), 16)
    head.bytes ++ out.bytes
  }

  private def zz(v: Int): Long = ((v.toLong << 1) ^ (v.toLong >> 63)) & 0xffffffffL
  private def rice(w: FlacCodec.Writer, param: Int, v: Int): Unit = {
    val u = zz(v)
    val q = (u >>> param).toInt
    (0 until q).foreach(_ => w.put(0, 1))
    w.put(1, 1)
    w.put(u & ((1L << param) - 1), param)
  }
  /** method 0, partition order 0, one rice param for the whole block. */
  private def riceResidual(w: FlacCodec.Writer, param: Int, res: Seq[Int]): Unit = {
    w.put(0, 2); w.put(0, 4); w.put(param, 4)
    res.foreach(v => rice(w, param, v))
  }

  test("constant subframe fills the block") {
    val bs = 64
    val s = handStream(8000, 1, 0, bs, bs) { w =>
      w.put(0, 1); w.put(0, 6); w.put(0, 1) // constant, no wasted
      w.put(-513 & 0xffff, 16)
    }
    val out = FlacCodec.decodeS16(s)
    assert(out.isDefined && out.get._3.forall(_ == -513))
  }

  test("fixed order-2 predictor reconstructs through rice residuals") {
    // x0=100, x1=103, then x[i] = r[i] + 2x[i-1] - x[i-2]
    val res = Seq(2, -5, 1)
    val expect = Array[Short](100, 103, 108, 108, 109)
    val s = handStream(8000, 1, 0, 5, 5) { w =>
      w.put(0, 1); w.put(10, 6); w.put(0, 1) // fixed order 2
      w.put(100, 16); w.put(103, 16)
      riceResidual(w, 3, res)
    }
    val out = FlacCodec.decodeS16(s)
    assert(out.isDefined, "fixed-2 frame must decode")
    assert(out.get._3.sameElements(expect), out.get._3.mkString(","))
  }

  test("LPC subframe with known coefficients and shift") {
    // order 1, coef 3, shift 1: x[i] = r[i] + (3*x[i-1] >> 1)
    val s = handStream(8000, 1, 0, 4, 4) { w =>
      w.put(0, 1); w.put(32, 6); w.put(0, 1) // LPC order 1 (type 100000)
      w.put(10, 16) // warmup
      w.put(3, 4) // precision-1 = 3 -> 4-bit coefs
      w.put(1, 5) // shift 1
      w.put(3, 4) // coef = 3
      riceResidual(w, 2, Seq(1, -4, 2))
    }
    // x1 = 1 + (30>>1) = 16; x2 = -4 + (48>>1) = 20; x3 = 2 + (60>>1) = 32
    val out = FlacCodec.decodeS16(s)
    assert(out.isDefined, "LPC frame must decode")
    assert(out.get._3.sameElements(Array[Short](10, 16, 20, 32)), out.get._3.mkString(","))
  }

  test("escape partitions carry raw residuals; wasted bits shift back") {
    val s = handStream(8000, 1, 0, 4, 4) { w =>
      // verbatim with 2 wasted bits: samples stored at 14 bits, <<2 on output
      w.put(0, 1); w.put(1, 6); w.put(1, 1) // wasted flag
      w.put(0, 1); w.put(1, 1) // unary 1 -> wasted = 2
      Seq(5, -6, 7, -8).foreach(v => w.put(v.toLong & 0x3fff, 14))
    }
    val out = FlacCodec.decodeS16(s)
    assert(out.isDefined && out.get._3.sameElements(Array[Short](20, -24, 28, -32)))
    val esc = handStream(8000, 1, 0, 4, 4) { w =>
      w.put(0, 1); w.put(8, 6); w.put(0, 1) // fixed order 0: all residual
      w.put(0, 2); w.put(0, 4); w.put(15, 4) // rice escape
      w.put(9, 5) // 9-bit raw residuals
      Seq(100, -100, 7, -7).foreach(v => w.put(v.toLong & 0x1ff, 9))
    }
    val out2 = FlacCodec.decodeS16(esc)
    assert(out2.isDefined && out2.get._3.sameElements(Array[Short](100, -100, 7, -7)))
  }

  test("mid/side stereo reconstructs left/right exactly") {
    val left = Array[Short](100, -50, 3, 0)
    val right = Array[Short](90, -60, -3, 1)
    val mid = Array.tabulate(4)(i => (left(i) + right(i)) >> 1)
    val side = Array.tabulate(4)(i => left(i) - right(i))
    val s = handStream(8000, 2, 10, 4, 4) { w =>
      w.put(0, 1); w.put(1, 6); w.put(0, 1) // mid: verbatim 16-bit
      mid.foreach(v => w.put(v.toLong & 0xffff, 16))
      w.put(0, 1); w.put(1, 6); w.put(0, 1) // side: verbatim 17-bit
      side.foreach(v => w.put(v.toLong & 0x1ffff, 17))
    }
    val out = FlacCodec.decodeS16(s)
    assert(out.isDefined, "mid/side frame must decode")
    val got = out.get._3
    assert((0 until 4).forall(i => got(2 * i) == left(i) && got(2 * i + 1) == right(i)),
      got.mkString(","))
  }

  test("corrupted frames degrade: CRC flips return None, never wrong samples") {
    val pcm = noise(4160, 11L)
    val good = FlacCodec.encodeVerbatim(8000, 1, pcm)
    // flip one payload byte (inside the first frame body): CRC16 must catch it
    val c = good.clone()
    c(c.length / 2) = (c(c.length / 2) ^ 0x40).toByte
    assert(FlacCodec.decodeS16(c).isEmpty, "a flipped body byte must fail the frame CRC")
    // truncation + corruption battery: never throw
    var n = 1
    while (n < good.length) {
      FlacCodec.decodeS16(good.take(n)); FlacCodec.info(good.take(n))
      n += 7
    }
    val rnd = new java.util.Random(5L)
    for (i <- 0 until 300) {
      val m = good.clone()
      var k = 0
      while (k <= i % 3) { m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte; k += 1 }
      FlacCodec.decodeS16(m); FlacCodec.info(m)
    }
  }

  test("storage-blind fingerprints: FLAC and WAV storage of the same clip hash identically") {
    for (id <- Seq(0L, 1L, 7L)) {
      val (rate, ch, pcm) = Multimodal.noiseClipSamples(id, id % 97)
      val wav = Multimodal.wavBytesPcm(rate, ch, pcm)
      val flac = FlacCodec.encodeVerbatim(rate, ch, pcm)
      val ew = Multimodal.pcmEnergiesAny(wav, 65)
      val ef = Multimodal.pcmEnergiesAny(flac, 65)
      assert(ew.isDefined && ef.isDefined)
      assert(ew.get.sameElements(ef.get), s"id=$id energies differ across storage")
      val mw = Multimodal.pcmMonoAny(wav).get
      val mf = Multimodal.pcmMonoAny(flac).get
      assert(mw.sameElements(mf), s"id=$id mono differs across storage")
    }
  }
}
