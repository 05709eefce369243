package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{G711, ImaAdpcm, Multimodal}

/** Kernel pins for the legacy WAV codecs (m5d): G.711 companding
  * idempotency (exhaustive — the property the fixture's exactness
  * argument rests on), IMA-ADPCM block locality, WAV container round
  * trips through the real [[Multimodal.wavLegacyDecodeS16]] reader,
  * and the m5d closed form replayed Sparkless (the PngCodecSpec
  * fixture-pipeline discipline). */
class LegacyAudioSpec extends AnyFunSuite {

  test("G.711 idempotency: dec∘enc is a projection (value-level) for every 16-bit input, both laws") {
    // VALUE-level, not code-level: µ-law has two zero codes (0x7F "-0",
    // 0xFF "+0") that decode to the same 0, so enc(dec(enc(-3))) is the
    // OTHER zero code — but the decoded value is identical, which is
    // the property the m5d fixture's exactness rests on (the PCM twin
    // stores dec(enc(raw)); the coded member decodes to the same).
    var s = -32768
    while (s <= 32767) {
      val mu = G711.mulawDecode(G711.mulawEncode(s))
      assert(G711.mulawDecode(G711.mulawEncode(mu)) == mu, s"mu-law not a projection at $s")
      val al = G711.alawDecode(G711.alawEncode(s))
      assert(G711.alawDecode(G711.alawEncode(al)) == al, s"A-law not a projection at $s")
      s += 1
    }
  }

  test("G.711 accuracy: decode error bounded by half the top-segment step") {
    var s = -32768
    while (s <= 32767) {
      val em = math.abs(G711.mulawDecode(G711.mulawEncode(s)) - s)
      assert(em <= 1024, s"mu-law error $em at $s")
      val ea = math.abs(G711.alawDecode(G711.alawEncode(s)) - s)
      assert(ea <= 1024, s"A-law error $ea at $s")
      s += 1
    }
  }

  test("IMA-ADPCM block locality: editing one block's samples changes only that block's decode") {
    val winFrames = 129
    val rnd = new java.util.Random(4242L)
    val a = Array.fill(10 * winFrames)((rnd.nextInt(2048) - 1024).toShort)
    val b = a.clone()
    var i = winFrames
    while (i < 2 * winFrames) { b(i) = (b(i) / 2).toShort; i += 1 }
    val da = ImaAdpcm.decodeBlocksMono(ImaAdpcm.encodeBlocksMono(a, winFrames), 0, 10, winFrames)
    val db = ImaAdpcm.decodeBlocksMono(ImaAdpcm.encodeBlocksMono(b, winFrames), 0, 10, winFrames)
    assert(da.length == 10 * winFrames && db.length == da.length)
    var j = 0
    var differsInBlock1 = false
    while (j < da.length) {
      if (j >= winFrames && j < 2 * winFrames) {
        if (da(j) != db(j)) differsInBlock1 = true
      } else assert(da(j) == db(j),
        s"sample $j outside the edited block differs — decode state leaked across blocks")
      j += 1
    }
    assert(differsInBlock1, "the edited block must actually decode differently")
  }

  test("IMA-ADPCM tracks noise: bounded error, no divergence") {
    // White ±1024 noise is ADPCM's worst case (every sample is a full-
    // range jump, so the step stays high and per-sample error rides
    // it); the pin is boundedness — errors comparable to the step, no
    // runaway — NOT hi-fi. m5d's exactness never relies on tracking
    // accuracy: both storage forms carry the same deterministic
    // projection.
    val rnd = new java.util.Random(7L)
    val a = Array.fill(5 * 129)((rnd.nextInt(2048) - 1024).toShort)
    val d = ImaAdpcm.decodeBlocksMono(ImaAdpcm.encodeBlocksMono(a, 129), 0, 5, 129)
    var i = 0
    var worst = 0
    var sumAbs = 0L
    while (i < a.length) {
      val e = math.abs(d(i) - a(i))
      worst = math.max(worst, e); sumAbs += e
      i += 1
    }
    assert(worst < 4096, s"ADPCM error diverged: worst $worst on ±1024 noise")
    assert(sumAbs / a.length < 700, s"ADPCM mean error ${sumAbs / a.length} too high")
  }

  test("WAV container round trips through the real reader, all three legacy formats") {
    val rnd = new java.util.Random(11L)
    val raw = Array.fill(65 * 129)((rnd.nextInt(2048) - 1024).toShort)
    // µ-law
    val muCodes = raw.map(s => G711.mulawEncode(s.toInt).toByte)
    val mu = Multimodal.wavLegacyDecodeS16(Multimodal.wavBytesG711(8000, muCodes, mulaw = true))
    assert(mu.isDefined && mu.get._1 == 8000 && mu.get._2 == 1)
    assert(java.util.Arrays.equals(mu.get._3, muCodes.map(c => G711.mulawDecode(c & 0xff).toShort)))
    // A-law
    val alCodes = raw.map(s => G711.alawEncode(s.toInt).toByte)
    val al = Multimodal.wavLegacyDecodeS16(Multimodal.wavBytesG711(8000, alCodes, mulaw = false))
    assert(al.isDefined)
    assert(java.util.Arrays.equals(al.get._3, alCodes.map(c => G711.alawDecode(c & 0xff).toShort)))
    // IMA ADPCM
    val blocks = ImaAdpcm.encodeBlocksMono(raw, 129)
    val ima = Multimodal.wavLegacyDecodeS16(Multimodal.wavBytesImaAdpcm(8000, blocks, 129))
    assert(ima.isDefined && ima.get._2 == 1)
    assert(java.util.Arrays.equals(ima.get._3,
      ImaAdpcm.decodeBlocksMono(blocks, 0, 65, 129)))
  }

  test("WAVE_FORMAT_EXTENSIBLE resolves the wrapped tag; corrupt GUIDs degrade") {
    val rnd = new java.util.Random(19L)
    val raw = Array.fill(65 * 64 * 2)((rnd.nextInt(2048) - 1024).toShort)
    // extensible PCM decodes identically to the classic header
    val classic = Multimodal.wavPcmEnergies(Multimodal.wavBytesPcm(8000, 2, raw), 65)
    val ext = Multimodal.wavPcmEnergies(
      Multimodal.wavBytesPcmExtensible(8000, 2, raw), 65)
    assert(classic.isDefined && ext.isDefined)
    assert(classic.get.sameElements(ext.get),
      "extensible header must be energy-identical to classic PCM")
    // an extensible header can wrap a LEGACY tag: rewrite a µ-law file's
    // fmt chunk to the extensible layout and the legacy reader must
    // still decode it
    val codes = raw.take(400).map(s => G711.mulawEncode(s.toInt).toByte)
    val muExt = {
      val out = java.nio.ByteBuffer.allocate(68 + codes.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes).putInt(60 + codes.length).put("WAVE".getBytes)
        .put("fmt ".getBytes).putInt(40)
        .putShort(0xFFFE.toShort).putShort(1).putInt(8000)
        .putInt(8000).putShort(1).putShort(8)
        .putShort(22).putShort(8).putInt(4)
        .putShort(7) // GUID wraps the µ-law tag
        .put(Array[Int](0, 0, 0, 0, 0x10, 0, 0x80, 0, 0, 0xAA,
          0, 0x38, 0x9B, 0x71).map(_.toByte))
        .put("data".getBytes).putInt(codes.length).put(codes)
      out.array()
    }
    val dec = Multimodal.wavLegacyDecodeS16(muExt)
    assert(dec.isDefined && java.util.Arrays.equals(dec.get._3,
      codes.map(c => G711.mulawDecode(c & 0xff).toShort)),
      "extensible-wrapped mu-law must decode through the GUID resolution")
    // an extensible header can wrap IMA-ADPCM too: the Samples union
    // at +26 is wSamplesPerBlock there (same offset as the classic
    // extension), so block geometry must resolve and decode
    val imaRaw = raw.take(65 * 129)
    val blocks = ImaAdpcm.encodeBlocksMono(imaRaw, 129)
    val imaExt = {
      val ba = ImaAdpcm.blockAlign(129)
      val out = java.nio.ByteBuffer.allocate(68 + blocks.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes).putInt(60 + blocks.length).put("WAVE".getBytes)
        .put("fmt ".getBytes).putInt(40)
        .putShort(0xFFFE.toShort).putShort(1).putInt(8000)
        .putInt(8000 * ba / 129).putShort(ba.toShort).putShort(4)
        .putShort(22).putShort(129) // cbSize; Samples union = wSamplesPerBlock
        .putInt(4)
        .putShort(0x11) // GUID wraps the IMA-ADPCM tag
        .put(Array[Int](0, 0, 0, 0, 0x10, 0, 0x80, 0, 0, 0xAA,
          0, 0x38, 0x9B, 0x71).map(_.toByte))
        .put("data".getBytes).putInt(blocks.length).put(blocks)
      out.array()
    }
    val imaDec = Multimodal.wavLegacyDecodeS16(imaExt)
    assert(imaDec.isDefined && java.util.Arrays.equals(imaDec.get._3,
      ImaAdpcm.decodeBlocksMono(blocks, 0, 65, 129)),
      "extensible-wrapped IMA-ADPCM must decode (Samples union = wSamplesPerBlock)")
    // corrupting the GUID base must degrade, never misread
    val bad = Multimodal.wavBytesPcmExtensible(8000, 2, raw)
    bad(20 + 26 + 5) = 0x55 // a byte inside the GUID tail
    assert(Multimodal.wavPcmEnergies(bad, 65).isEmpty,
      "a non-KSDATAFORMAT GUID must degrade")
  }

  test("legacy reader degrades: PCM fmt, truncation, bad block geometry, stereo ADPCM") {
    val rnd = new java.util.Random(13L)
    val raw = Array.fill(400)((rnd.nextInt(2048) - 1024).toShort)
    // fmt 1 payloads belong to the fast PCM path, not this reader
    assert(Multimodal.wavLegacyDecodeS16(Multimodal.wavBytesPcm(8000, 1, raw)).isEmpty)
    val mu = Multimodal.wavBytesG711(8000, raw.map(s => G711.mulawEncode(s.toInt).toByte), mulaw = true)
    assert(Multimodal.wavLegacyDecodeS16(mu.take(40)).isEmpty, "truncated header must degrade")
    // IMA with a blockAlign that disagrees with samplesPerBlock: corrupt
    val blocks = ImaAdpcm.encodeBlocksMono(raw ++ raw, 129)
    val ima = Multimodal.wavBytesImaAdpcm(8000, blocks, 129)
    val bad = ima.clone()
    bad(32) = 99 // blockAlign low byte (fmt chunk offset 20 within fmt at 12+8)
    assert(Multimodal.wavLegacyDecodeS16(bad).isEmpty, "inconsistent block geometry must degrade")
    // garbage never throws
    for (seed <- 1 to 30) {
      val r2 = new java.util.Random(seed * 17L)
      val junk = Array.fill(r2.nextInt(120))(r2.nextInt(256).toByte)
      Multimodal.wavLegacyDecodeS16("RIFF".getBytes ++ junk)
    }
  }

  test("m5d closed form, Sparkless: mixed PCM/coded twins collide within groups only") {
    // replays the fixture arithmetic for a handful of ids spanning all
    // three codec classes (g%3) and both storages (id%3)
    def fingerprint(id: Long): Long = {
      val g = id % 97
      val winFrames = 129
      val rnd = new java.util.Random(g * 2654435761L + 23)
      val raw = Array.fill(65 * winFrames)((rnd.nextInt(2048) - 1024).toShort)
      if (id % 2 == 1) {
        var i = winFrames
        while (i < 2 * winFrames) { raw(i) = (raw(i) / 2).toShort; i += 1 }
      }
      val coded = id % 3 == 1
      val payload = g % 3 match {
        case 0 =>
          val codes = raw.map(s => G711.mulawEncode(s.toInt).toByte)
          if (coded) Multimodal.wavBytesG711(8000, codes, mulaw = true)
          else Multimodal.wavBytesPcm(8000, 1, codes.map(c => G711.mulawDecode(c & 0xff).toShort))
        case 1 =>
          val codes = raw.map(s => G711.alawEncode(s.toInt).toByte)
          if (coded) Multimodal.wavBytesG711(8000, codes, mulaw = false)
          else Multimodal.wavBytesPcm(8000, 1, codes.map(c => G711.alawDecode(c & 0xff).toShort))
        case _ =>
          val blocks = ImaAdpcm.encodeBlocksMono(raw, winFrames)
          if (coded) Multimodal.wavBytesImaAdpcm(8000, blocks, winFrames)
          else Multimodal.wavBytesPcm(8000, 1, ImaAdpcm.decodeBlocksMono(blocks, 0, 65, winFrames))
      }
      val e = Multimodal.pcmEnergiesAny(payload, 65)
      assert(e.isDefined, s"id=$id (g=$g, coded=$coded) must decode through the seam")
      var hash = 0L
      var i = 0
      while (i < 64) { if (e.get(i) < e.get(i + 1)) hash |= 1L << i; i += 1 }
      hash
    }
    // groups 0 (µ-law), 1 (A-law), 2 (IMA); members id, id+97 (coded/
    // PCM mix by id%3), id+194
    for (g <- 0 to 2) {
      val ids = Seq(g.toLong, g + 97L, g + 194L, g + 291L)
      val hs = ids.map(id => id -> fingerprint(id)).toMap
      for (a <- ids; b <- ids if a < b) {
        val d = java.lang.Long.bitCount(hs(a) ^ hs(b))
        assert(d <= 2, s"in-group pair ($a,$b) of class $g at Hamming $d")
      }
    }
    val cross = java.lang.Long.bitCount(fingerprint(0L) ^ fingerprint(1L))
    assert(cross > 3, s"cross-group pair unexpectedly close ($cross bits)")
  }
}
