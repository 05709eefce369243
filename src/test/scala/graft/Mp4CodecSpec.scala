package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{JpegCodec, Mp4Codec, Multimodal}

/** The ISO BMFF walker against its own muxer AND against addressing
  * shapes the muxer never emits (multi-chunk stsc runs, fixed-size
  * stsz, co64, moov-first layout) — the same discipline as
  * ExifParseSpec: a parser tested only against its twin encoder proves
  * round-trip, not format coverage. */
class Mp4CodecSpec extends AnyFunSuite {

  private def frame(seed: Long): Array[Byte] = {
    val rnd = new java.util.Random(seed)
    JpegCodec.encodeGray(16, 16, Array.fill(256)(rnd.nextInt(256)))
  }

  test("round-trip: encode then parse returns the exact frame bytes in order") {
    val frames = (0 until 5).map(i => frame(100L + i))
    val mp4 = Mp4Codec.encodeMjpeg(16, 16, frames)
    val out = Mp4Codec.mjpegFrames(mp4)
    assert(out.isDefined)
    assert(out.get.length == 5)
    for (i <- 0 until 5)
      assert(java.util.Arrays.equals(out.get(i), frames(i)), s"frame $i differs")
  }

  test("dims come from the VisualSampleEntry") {
    val mp4 = Mp4Codec.encodeMjpeg(36, 32, Seq(frame(1L)))
    assert(Mp4Codec.dims(mp4).contains((36, 32)))
    assert(Multimodal.parseDims(mp4).contains(("video/mp4", 36, 32)))
  }

  test("fragmented round-trip: moof/trun walk returns the exact frames in order") {
    for (fpf <- Seq(1, 2, 3, 7)) {
      val frames = (0 until 5).map(i => frame(200L + i))
      val fmp4 = Mp4Codec.encodeMjpegFragmented(16, 16, frames, fpf)
      val out = Mp4Codec.mjpegFramesFragmented(fmp4)
      assert(out.isDefined, s"framesPerFrag=$fpf must parse")
      assert(out.get.length == 5, s"framesPerFrag=$fpf count")
      for (i <- 0 until 5)
        assert(java.util.Arrays.equals(out.get(i), frames(i)),
          s"framesPerFrag=$fpf frame $i differs")
      // dispatch is unambiguous: the stbl walker sees an empty stsz
      // and degrades; the fragment walker ignores plain files
      assert(Mp4Codec.mjpegFrames(fmp4).isEmpty,
        "plain walker must degrade on fMP4 (empty stsz)")
    }
    val plain = Mp4Codec.encodeMjpeg(16, 16, Seq(frame(1L)))
    assert(Mp4Codec.mjpegFramesFragmented(plain).isEmpty,
      "fragment walker must degrade on a plain file (no moof)")
    // the storage-blind seam reads all three container shapes
    assert(Multimodal.containerFrames(
      Mp4Codec.encodeMjpegFragmented(16, 16, Seq(frame(2L)))).exists(_.length == 1))
  }

  test("fragmented multi-track: audio traf leads, video frames still come from the video traf") {
    val frames = (0 until 5).map(i => frame(400L + i))
    val fmp4 = Mp4Codec.encodeMjpegFragmented(16, 16, frames, 2, withAudioTraf = true)
    val out = Mp4Codec.mjpegFramesFragmented(fmp4)
    assert(out.isDefined, "muxed multi-track fMP4 must parse")
    assert(out.get.length == 5)
    for (i <- 0 until 5)
      assert(java.util.Arrays.equals(out.get(i), frames(i)),
        s"frame $i must be the VIDEO sample, not the leading audio traf's bytes")
    // dims still resolve with an audio trak listed first in moov
    assert(Mp4Codec.dims(fmp4).contains((16, 16)))
  }

  test("fragmented degrades to None when no traf names the video track") {
    // patch every tfhd's track_id away from the video track: a file
    // whose fragments are audio-only for this walker must degrade,
    // never return another track's bytes
    val fmp4 = Mp4Codec.encodeMjpegFragmented(16, 16, Seq(frame(7L), frame(8L)), 2)
    val bad = fmp4.clone()
    var i = 0
    while (i + 8 <= bad.length) {
      val size = java.nio.ByteBuffer.wrap(bad, i, 4).getInt
      if (new String(bad, i + 4, 4, "US-ASCII") == "moof") {
        // fixture moof: mfhd(16) + traf hdr(8) + tfhd hdr(8) +
        // version/flags(4) → track_id
        val tid = i + 8 + 16 + 8 + 8 + 4
        java.nio.ByteBuffer.wrap(bad, tid, 4).putInt(2)
      }
      i += size
    }
    assert(Mp4Codec.mjpegFramesFragmented(bad).isEmpty,
      "a moof with no video traf must degrade to None")
  }

  test("fragmented degrades: truncation, oversized trun counts, garbage never throw") {
    val frames = (0 until 4).map(i => frame(300L + i))
    val fmp4 = Mp4Codec.encodeMjpegFragmented(16, 16, frames, 2)
    for (cut <- Seq(20, 200, fmp4.length / 2, fmp4.length - 3))
      Mp4Codec.mjpegFramesFragmented(fmp4.take(cut)) // must return, never throw
    // a trun sample count far past the file must degrade before allocating
    val bad = fmp4.clone()
    val moofAt = {
      var i = 0; var at = -1
      while (at < 0 && i + 8 <= bad.length) {
        if (new String(bad, i + 4, 4, "US-ASCII") == "moof") at = i
        else i += java.nio.ByteBuffer.wrap(bad, i, 4).getInt
      }
      at
    }
    assert(moofAt > 0)
    // trun sits at a fixed offset inside the fixture moof: mfhd(16) +
    // traf header(8) + tfhd(16) + tfdt(16); count at payload + 4
    val trunCount = moofAt + 8 + 16 + 8 + 16 + 16 + 8 + 4
    java.nio.ByteBuffer.wrap(bad, trunCount, 4).putInt(0x7fffffff)
    assert(Mp4Codec.mjpegFramesFragmented(bad).isEmpty,
      "a crafted trun count must degrade, not allocate")
    val rnd = new java.util.Random(5L)
    for (_ <- 1 to 30) {
      val junk = Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      Mp4Codec.mjpegFramesFragmented(fmp4.take(16) ++ junk)
    }
  }

  // ---- hand-built layouts the muxer never emits ----------------------

  private def be(vs: Long*): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 * vs.length)
    vs.foreach(v => bb.putInt(v.toInt)); bb.array()
  }
  private def be16(vs: Int*): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(2 * vs.length)
    vs.foreach(v => bb.putShort(v.toShort)); bb.array()
  }
  private def box(fc: String, parts: Array[Byte]*): Array[Byte] = {
    val len = 8 + parts.map(_.length).sum
    val bb = java.nio.ByteBuffer.allocate(len)
    bb.putInt(len).put(fc.getBytes("US-ASCII")); parts.foreach(bb.put)
    bb.array()
  }
  private def visualEntry(fc: String, w: Int, h: Int): Array[Byte] =
    box(fc, new Array[Byte](6), be16(1), be16(0, 0), be(0, 0, 0),
      be16(w, h), be(0x480000, 0x480000, 0), be16(1),
      new Array[Byte](32), be16(24, -1))

  /** moov-FIRST file (the faststart layout) with explicit sample
    * tables: two chunks, first chunk 2 samples, second 1, fixed-size
    * stsz, and a co64 offset table. */
  private def faststartMp4(frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.length == 3 && frames.forall(_.length == frames.head.length))
    val sz = frames.head.length
    val ftyp = box("ftyp", "isom".getBytes, be(0x200), "isom".getBytes)
    val stsd = box("stsd", be(0, 1), visualEntry("jpeg", 16, 16))
    val stts = box("stts", be(0, 1, 3, 1))
    // chunk 1 holds samples 1-2, chunk 2 holds sample 3
    val stsc = box("stsc", be(0, 2, 1, 2, 1, 2, 1, 1))
    val stsz = box("stsz", be(0, sz.toLong, 3))
    val hdlr = box("hdlr", be(0, 0), "vide".getBytes, be(0, 0, 0),
      Array[Byte](0))
    val mdhd = box("mdhd", be(0, 0, 0, 25, 3), be16(0x55c4, 0))
    // moov size is deterministic given the table above, so co64 can be
    // computed: mdat payload starts after ftyp + moov + mdat header
    def moovWith(off1: Long, off2: Long): Array[Byte] = {
      val co64 = {
        val bb = java.nio.ByteBuffer.allocate(8 + 4 + 4 + 16)
        bb.putInt(32).put("co64".getBytes).putInt(0).putInt(2)
          .putLong(off1).putLong(off2)
        bb.array()
      }
      val stbl = box("stbl", stsd, stts, stsc, stsz, co64)
      val minf = box("minf", box("vmhd", be(1, 0, 0)),
        box("dinf", box("dref", be(0, 1), box("url ", be(1)))), stbl)
      box("moov", box("trak", box("mdia", mdhd, hdlr, minf)))
    }
    val moovLen = moovWith(0, 0).length
    val base = ftyp.length + moovLen + 8L
    ftyp ++ moovWith(base, base + 2L * sz) ++
      box("mdat", frames.toArray.flatten)
  }

  test("faststart layout: moov before mdat, multi-chunk stsc, fixed stsz, co64") {
    val frames = (0 until 3).map(_ => frame(7L)) // fixed-size stsz needs equal sizes
    val out = Mp4Codec.mjpegFrames(faststartMp4(frames))
    assert(out.isDefined && out.get.length == 3)
    for (i <- 0 until 3)
      assert(java.util.Arrays.equals(out.get(i), frames(i)), s"frame $i differs")
  }

  test("multi-track file: audio trak first, video found anyway; avc1 degrades") {
    val frames = Seq(frame(9L))
    val good = Mp4Codec.encodeMjpeg(16, 16, frames)
    // splice a 'soun' trak ahead of the video one inside moov
    val (moovAt, moovLen) = {
      var i = 0; var found = (-1, -1)
      while (i + 8 <= good.length && found._1 < 0) {
        val sz = ((good(i) & 0xffL) << 24) | ((good(i + 1) & 0xffL) << 16) |
          ((good(i + 2) & 0xffL) << 8) | (good(i + 3) & 0xffL)
        if (new String(good, i + 4, 4, "US-ASCII") == "moov") found = (i, sz.toInt)
        i += sz.toInt
      }
      found
    }
    assert(moovAt > 0)
    val sounTrak = box("trak", box("mdia",
      box("mdhd", be(0, 0, 0, 8000, 0), be16(0x55c4, 0)),
      box("hdlr", be(0, 0), "soun".getBytes, be(0, 0, 0), Array[Byte](0))))
    val patched = {
      val bb = java.nio.ByteBuffer.allocate(good.length + sounTrak.length)
      bb.put(good, 0, moovAt) // everything before moov
        .putInt(moovLen + sounTrak.length).put(good, moovAt + 4, 4)
        .put(sounTrak) // foreign track first
        .put(good, moovAt + 8, moovLen - 8)
      bb.array()
    }
    val out = Mp4Codec.mjpegFrames(patched)
    assert(out.isDefined && out.get.length == 1 &&
      java.util.Arrays.equals(out.get.head, frames.head),
      "the first vide-handler trak must be used, not the first trak")
    // an avc1 sample entry must degrade frame extraction but still size
    val avc1 = patched.clone()
    val at = indexOfFourcc(avc1, "jpeg")
    assert(at > 0)
    avc1(at) = 'a'; avc1(at + 1) = 'v'; avc1(at + 2) = 'c'; avc1(at + 3) = '1'
    assert(Mp4Codec.mjpegFrames(avc1).isEmpty, "avc1 must not extract frames")
    assert(Mp4Codec.dims(avc1).contains((16, 16)), "avc1 must still size for the cards")
  }

  private def indexOfFourcc(b: Array[Byte], fc: String): Int = {
    val t = fc.getBytes("US-ASCII")
    (0 until b.length - 4).find(i =>
      b(i) == t(0) && b(i + 1) == t(1) && b(i + 2) == t(2) && b(i + 3) == t(3))
      .getOrElse(-1)
  }

  test("mp4v sample entry: ESDS OTI 0x6C (JPEG) extracts, real MPEG-4 visual degrades") {
    // ffmpeg's MJPEG-in-.mp4 shape: fourcc mp4v, codec declared by the
    // ESDS DecoderConfigDescriptor's objectTypeIndication
    def esds(oti: Int): Array[Byte] = box("esds", be(0),
      Array[Byte](0x03, 18, 0, 0, 0, 0x04, 13, oti.toByte,
        0x11, 0x01, 0, 0, 0, 0, 0, 0, 0, 0, 0))
    def mp4vFile(oti: Int): Array[Byte] = {
      val f = frame(12L)
      val good = Mp4Codec.encodeMjpeg(16, 16, Seq(f))
      // rebuild the stsd with an mp4v entry carrying the esds
      val entry = box("mp4v", new Array[Byte](6), be16(1), be16(0, 0),
        be(0, 0, 0), be16(16, 16), be(0x480000, 0x480000, 0), be16(1),
        new Array[Byte](32), be16(24, -1), esds(oti))
      val oldStsd = {
        val at = indexOfFourcc(good, "stsd")
        java.util.Arrays.copyOfRange(good, at - 4,
          at - 4 + java.nio.ByteBuffer.wrap(good, at - 4, 4).getInt)
      }
      val newStsd = box("stsd", be(0, 1), entry)
      // splice, then fix every enclosing box size (moov/trak/mdia/minf/stbl)
      val at = indexOfFourcc(good, "stsd") - 4
      val delta = newStsd.length - oldStsd.length
      val out = java.util.Arrays.copyOfRange(good, 0, at) ++ newStsd ++
        java.util.Arrays.copyOfRange(good, at + oldStsd.length, good.length)
      for (fc <- Seq("moov", "trak", "mdia", "minf", "stbl")) {
        val p = indexOfFourcc(out, fc) - 4
        java.nio.ByteBuffer.wrap(out, p, 4)
          .putInt(java.nio.ByteBuffer.wrap(out, p, 4).getInt + delta)
      }
      out
    }
    val jpegInMp4v = Mp4Codec.mjpegFrames(mp4vFile(0x6c))
    assert(jpegInMp4v.isDefined && jpegInMp4v.get.length == 1 &&
      java.util.Arrays.equals(jpegInMp4v.get.head, frame(12L)),
      "mp4v + OTI 0x6C is MJPEG and must extract")
    assert(Mp4Codec.mjpegFrames(mp4vFile(0x20)).isEmpty,
      "mp4v + OTI 0x20 is real MPEG-4 visual and must degrade")
    assert(Mp4Codec.dims(mp4vFile(0x20)).contains((16, 16)),
      "undecodable codecs still size for the cards")
    // the descriptor walk is fresh parse surface: truncations and
    // seeded corruptions must return, never throw (the CodecFuzzSpec
    // battery fuzzes the 'jpeg'-entry shape; this covers the esds one)
    val base = mp4vFile(0x6c)
    var n = 1
    while (n < base.length) {
      Mp4Codec.mjpegFrames(base.take(n)); Mp4Codec.dims(base.take(n))
      n += 3
    }
    val rnd = new java.util.Random(6L)
    for (i <- 0 until 400) {
      val c = base.clone()
      var m = 0
      while (m <= i % 3) { c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte; m += 1 }
      Mp4Codec.mjpegFrames(c); Mp4Codec.dims(c)
    }
  }

  test("degrade battery: malformed addressing returns None, never throws") {
    val good = Mp4Codec.encodeMjpeg(16, 16, Seq(frame(3L), frame(4L)))
    def mut(f: Array[Byte] => Unit): Array[Byte] = {
      val c = good.clone(); f(c); c
    }
    // stco pointing past EOF
    val stcoAt = indexOfFourcc(good, "stco")
    val past = mut { c =>
      val bb = java.nio.ByteBuffer.wrap(c, stcoAt + 12, 4)
      bb.putInt(c.length + 100)
    }
    assert(Mp4Codec.mjpegFrames(past).isEmpty)
    // stsz count larger than the table
    val stszAt = indexOfFourcc(good, "stsz")
    val overCount = mut { c =>
      java.nio.ByteBuffer.wrap(c, stszAt + 12, 4).putInt(1000000)
    }
    assert(Mp4Codec.mjpegFrames(overCount).isEmpty)
    // non-advancing box size inside moov
    val trakAt = indexOfFourcc(good, "trak")
    val zeroSize = mut { c =>
      java.nio.ByteBuffer.wrap(c, trakAt - 4, 4).putInt(7) // < 8: corrupt
    }
    assert(Mp4Codec.mjpegFrames(zeroSize).isEmpty)
    // largesize that overflows
    val huge = mut { c =>
      java.nio.ByteBuffer.wrap(c, trakAt - 4, 4).putInt(1)
    }
    Mp4Codec.mjpegFrames(huge) // must return (either way), not throw
    // not MP4 at all
    assert(Mp4Codec.mjpegFrames("RIFFxxxxAVI ".getBytes).isEmpty)
    assert(Mp4Codec.dims(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("container-transparent sampling: AVI and MP4 storage of the same clip hash identically") {
    val frames = (0 until 4).map(i => frame(40L + i))
    val avi = Multimodal.aviMjpegBytes(16, 16, frames)
    val mp4 = Mp4Codec.encodeMjpeg(16, 16, frames)
    val ha = Multimodal.sampledFrameHashes(avi, 16)
    val hm = Multimodal.sampledFrameHashes(mp4, 16)
    assert(ha.nonEmpty && ha == hm,
      "the two containers must be invisible to the frame-hash path")
  }
}
