package graft.operators

/** Minimal ISO Base Media File Format (MP4) container support for the
  * Motion-JPEG video path — the MP4 twin of [[Multimodal.aviMjpegBytes]]
  * / `aviMjpegFrames`. Real video corpora overwhelmingly ship ISO BMFF
  * (`.mp4`/`.mov`), not AVI: phone captures, web scrapes, and archive
  * dumps all mux into boxes, so a video dedup that only walks RIFF
  * leaves the dominant container on the floor. This is a clean-room
  * box walker over the PUBLIC ISO/IEC 14496-12 structures (box =
  * 32-bit big-endian size + fourcc, `moov/trak/mdia/minf/stbl` sample
  * tables, `stsd/stsz/stsc/stco` addressing), the exact inverse of the
  * fixture muxer below — nothing here decodes video: frames come out
  * as the stored JPEG sample bytes and ride the repo's own
  * [[JpegCodec]], the same composition AVI uses.
  *
  * Scope, stated honestly: MOTION-JPEG TRACKS ONLY, in both
  * real-world spellings — fourcc `jpeg` (the QuickTime shape) and
  * fourcc `mp4v` whose ESDS DecoderConfigDescriptor declares
  * objectTypeIndication 0x6C / JPEG (the ffmpeg `.mp4` shape). Each
  * sample is then one self-contained baseline/progressive JPEG.
  * Inter-coded codecs (`avc1`/`hvc1`/`vp09`, mp4v with a real MPEG-4
  * OTI) need a motion decoder this repo does not claim to have; such
  * tracks parse as containers (dims come out for the m7-family cards)
  * but frame extraction degrades to None and the payload is COUNTED
  * as non-decodable, never mis-decoded.
  *
  * Degrade-never-kill like every parser in this repo: truncated boxes,
  * 64-bit `largesize` overflow, `stco` offsets past EOF, sample-table
  * inconsistencies, and crafted deep nesting all return None (the box
  * walk is depth-capped for the same stack-blow reason as the AVI
  * LIST walk). All u32 sizes are held in Long before any arithmetic. */
object Mp4Codec {

  private def beU16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def beU32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def beU64(b: Array[Byte], o: Int): Long = {
    val v = (beU32(b, o) << 32) | beU32(b, o + 4)
    if (v < 0) -1L else v // a >2^63 size is corrupt on any real file
  }
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** Cheap sniff for the m9-style routing: ISO BMFF files open with a
    * box whose fourcc (bytes 4..7) is `ftyp`. */
  def isMp4(b: Array[Byte]): Boolean =
    b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

  /** One box in `[from, to)`: (fourcc, payloadStart, payloadEnd,
    * nextBoxStart), or None when the header is truncated/corrupt.
    * Handles the three BMFF size encodings: normal u32, `size == 1`
    * (64-bit largesize follows the fourcc), `size == 0` (box runs to
    * the end of the enclosing space). */
  private def boxAt(b: Array[Byte], from: Int, to: Int):
      Option[(String, Int, Long, Long)] = {
    if (from + 8 > to) return None
    val size32 = beU32(b, from)
    val fc = fourcc(b, from + 4)
    val (payload, end) =
      if (size32 == 1L) {
        if (from + 16 > to) return None
        val ls = beU64(b, from + 8)
        if (ls < 16) return None
        (from + 16, from.toLong + ls)
      } else if (size32 == 0L) (from + 8, to.toLong)
      else {
        if (size32 < 8) return None
        (from + 8, from.toLong + size32)
      }
    if (end > to || payload > end) None else Some((fc, payload, end, end))
  }

  /** First child box named `fc` inside `[from, to)`:
    * (payloadStart, payloadEnd). Iterative — only [[findPath]] below
    * recurses, and it is depth-capped by the fixed path length. */
  private def findBox(b: Array[Byte], from: Int, to: Int,
      fc: String): Option[(Int, Int)] = {
    var i = from
    var guard = 0
    while (i + 8 <= to && guard < 4096) { // a real moov has dozens of children
      boxAt(b, i, to) match {
        case Some((f, p, e, n)) =>
          if (f == fc) return Some((p, e.toInt))
          if (n <= i) return None // non-advancing size: corrupt
          i = n.toInt
        case None => return None
      }
      guard += 1
    }
    None
  }

  /** Descend a fixed fourcc path (e.g. moov → trak → mdia). The path
    * length bounds recursion — no crafted payload can deepen it. */
  private def findPath(b: Array[Byte], from: Int, to: Int,
      path: List[String]): Option[(Int, Int)] = path match {
    case Nil => Some((from, to))
    case fc :: rest =>
      findBox(b, from, to, fc).flatMap { case (p, e) =>
        findPath(b, p, e, rest)
      }
  }

  /** The first `vide`-handler track's sample-table box, or None. Walks
    * every trak (files interleave audio/video/metadata tracks in any
    * order) and takes the FIRST video one — the same single-stream
    * discipline as the AVI walker's stream-00 rule, so a multi-track
    * file cannot interleave foreign samples into the frame_idx
    * sequence. */
  private def videoStbl(b: Array[Byte]): Option[(Int, Int)] =
    videoTrak(b).flatMap { case (p, e) =>
      findPath(b, p, e, List("mdia", "minf", "stbl"))
    }

  /** The first `vide`-handler trak's payload bounds, or None. */
  private def videoTrak(b: Array[Byte]): Option[(Int, Int)] = {
    val (moovFrom, moovTo) = findBox(b, 0, b.length, "moov").getOrElse(return None)
    var i = moovFrom
    var guard = 0
    while (i + 8 <= moovTo && guard < 4096) {
      boxAt(b, i, moovTo) match {
        case Some((f, p, e, n)) =>
          if (f == "trak") {
            val isVide = findBox(b, p, e.toInt, "mdia").flatMap { case (mp, me) =>
              findBox(b, mp, me, "hdlr").map { case (hp, he) =>
                he - hp >= 12 && fourcc(b, hp + 8) == "vide"
              }
            }.getOrElse(false)
            if (isVide) return Some((p, e.toInt))
          }
          if (n <= i) return None
          i = n.toInt
        case None => return None
      }
      guard += 1
    }
    None
  }

  /** The video trak's `tkhd` track_ID — the key a fragmented file's
    * `tfhd` boxes name their traf with. Track ID sits after the
    * version/flags word and two timestamps: payload +12 for tkhd v0,
    * +20 for v1 (64-bit timestamps). None on a missing/truncated
    * tkhd — fragmented extraction then degrades rather than guessing
    * which traf is video. */
  private def videoTrackId(b: Array[Byte]): Option[Long] =
    videoTrak(b).flatMap { case (p, e) =>
      findBox(b, p, e, "tkhd").flatMap { case (hp, he) =>
        if (hp >= he) None
        else {
          val off = if ((b(hp) & 0xff) == 1) 20 else 12
          if (hp + off + 4 > he) None else Some(beU32(b, hp + off))
        }
      }
    }

  /** Frame dimensions of the first video track, for the m7-family
    * geometry cards: the `stsd` VisualSampleEntry's width/height
    * (u16s at entry offsets 32/34 — after the 6+2 data-reference
    * preamble and the 16 pre_defined/reserved bytes). Dims parse for
    * ANY video sample entry (a corpus card must size `avc1` tracks it
    * cannot decode); only frame EXTRACTION is jpeg-gated. */
  def dims(b: Array[Byte]): Option[(Int, Int)] = {
    if (!isMp4(b)) return None
    val (sp, se) = videoStbl(b).getOrElse(return None)
    val (dp, de) = findBox(b, sp, se, "stsd").getOrElse(return None)
    // stsd: version/flags (4) + entry_count (4), then entries
    if (dp + 8 > de || beU32(b, dp + 4) < 1) return None
    boxAt(b, dp + 8, de).flatMap { case (_, ep, ee, _) =>
      // VisualSampleEntry payload: 6 reserved + 2 data_ref_idx +
      // 2 + 2 + 12 pre_defined/reserved, then width/height
      if (ep + 28 > ee) None
      else {
        val w = beU16(b, ep + 24); val h = beU16(b, ep + 26)
        if (w < 1 || h < 1) None else Some((w, h))
      }
    }
  }

  /** The objectTypeIndication byte of an `esds` box's
    * DecoderConfigDescriptor, or None when the descriptor stream is
    * malformed. MPEG-4 descriptors (ISO 14496-1 §8.3.3): tag byte,
    * then a size in 1–4 continuation-bit bytes, then the payload —
    * the ES_Descriptor (tag 0x03) carries ES_ID + a flags byte whose
    * top three bits gate optional fields, then the
    * DecoderConfigDescriptor (tag 0x04) whose first payload byte is
    * the OTI. Bounds-checked at every step like the box walk. */
  private def esdsObjectType(b: Array[Byte], from: Int, to: Int): Option[Int] = {
    var i = from + 4 // skip the full-box version/flags
    def u8(): Int = { val v = b(i) & 0xff; i += 1; v }
    def varSize(): Long = {
      var n = 0; var v = 0L
      while (n < 4 && i < to) {
        val c = u8(); v = (v << 7) | (c & 0x7f); n += 1
        if ((c & 0x80) == 0) return v
      }
      -1L
    }
    if (i >= to || u8() != 0x03) return None
    if (varSize() < 0 || i + 3 > to) return None
    i += 2 // ES_ID
    val flags = u8()
    if ((flags & 0x80) != 0) i += 2 // dependsOn_ES_ID
    if ((flags & 0x40) != 0) { // URL: length-prefixed string
      if (i >= to) return None
      val len = u8(); i += len
    }
    if ((flags & 0x20) != 0) i += 2 // OCR_ES_ID
    if (i >= to || u8() != 0x04) return None
    if (varSize() < 0 || i >= to) return None
    Some(u8())
  }

  /** The stored JPEG sample bytes of the first video track, in sample
    * order — [[Multimodal.aviMjpegFrames]]'s contract for ISO BMFF.
    * None unless the track's sample entry is `jpeg` (scope note above)
    * and the whole `stsz`/`stsc`/`stco` addressing resolves inside the
    * file. */
  def mjpegFrames(b: Array[Byte]): Option[Vector[Array[Byte]]] = {
    if (!isMp4(b)) return None
    val (sp, se) = videoStbl(b).getOrElse(return None)
    // codec gate: first stsd entry must be 'jpeg'
    val (dp, de) = findBox(b, sp, se, "stsd").getOrElse(return None)
    if (dp + 8 > de || beU32(b, dp + 4) < 1) return None
    val jpegEntry = boxAt(b, dp + 8, de).exists {
      case ("jpeg", _, _, _) => true // QuickTime-style Motion-JPEG
      case ("mp4v", ep, ee, _) =>
        // ffmpeg muxes MJPEG into .mp4 as an MPEG-4 visual entry whose
        // ESDS declares the codec: walk the entry's child boxes (they
        // start after the 78-byte VisualSampleEntry fields) to `esds`
        // and accept objectTypeIndication 0x6C (ISO 14496-1 "Visual
        // 10918-1", i.e. JPEG). Anything else is a real MPEG-4 stream
        // this repo does not claim to decode.
        findBox(b, ep + 78, ee.toInt, "esds").exists { case (p, e) =>
          esdsObjectType(b, p, e).contains(0x6c)
        }
      case _ => false
    }
    if (!jpegEntry) return None
    // stsz: fixed size or per-sample table
    val (zp, ze) = findBox(b, sp, se, "stsz").getOrElse(return None)
    if (zp + 12 > ze) return None
    val fixedSize = beU32(b, zp + 4)
    val nSamples = beU32(b, zp + 8)
    // Every sample is ≥1 byte of mdat, so a sample count beyond the
    // file length is corrupt — and rejecting it BEFORE the table
    // allocation keeps a crafted stsz (count near 2^32) from reserving
    // gigabytes on the degrade path. Applies to the fixed-size shape
    // too, which carries no per-sample table to implicitly bound it.
    if (nSamples < 1 || nSamples > b.length) return None
    val n = nSamples.toInt
    val sizes = new Array[Long](n)
    if (fixedSize != 0L) java.util.Arrays.fill(sizes, fixedSize)
    else {
      if (zp + 12 + 4L * n > ze) return None
      var i = 0
      while (i < n) { sizes(i) = beU32(b, zp + 12 + 4 * i); i += 1 }
    }
    // chunk offsets: stco (u32) or co64 (u64)
    val offsets: Array[Long] = findBox(b, sp, se, "stco") match {
      case Some((cp, ce)) =>
        if (cp + 8 > ce) return None
        val nc = beU32(b, cp + 4)
        if (nc < 1 || cp + 8 + 4L * nc > ce) return None
        Array.tabulate(nc.toInt)(i => beU32(b, cp + 8 + 4 * i))
      case None => findBox(b, sp, se, "co64") match {
        case Some((cp, ce)) =>
          if (cp + 8 > ce) return None
          val nc = beU32(b, cp + 4)
          if (nc < 1 || cp + 8 + 8L * nc > ce) return None
          val a = Array.tabulate(nc.toInt)(i => beU64(b, cp + 8 + 8 * i))
          if (a.exists(_ < 0)) return None
          a
        case None => return None
      }
    }
    // stsc: (first_chunk, samples_per_chunk, _) runs
    val (cp, ce) = findBox(b, sp, se, "stsc").getOrElse(return None)
    if (cp + 8 > ce) return None
    val nRuns = beU32(b, cp + 4)
    if (nRuns < 1 || cp + 8 + 12L * nRuns > ce) return None
    val runs = Array.tabulate(nRuns.toInt) { i =>
      (beU32(b, cp + 8 + 12 * i), beU32(b, cp + 12 + 12 * i))
    }
    if (runs.head._1 != 1L ||
      runs.exists { case (fcN, spcN) => fcN < 1 || spcN < 1 } ||
      runs.sliding(2).exists { case Array(a, c) => c._1 <= a._1; case _ => false })
      return None
    // walk chunks in order, laying samples consecutively from each
    // chunk offset, until all stsz samples are placed
    val frames = Vector.newBuilder[Array[Byte]]
    var sample = 0
    var run = 0
    var chunk = 1L
    var copied = 0L // overlapping stco chunks may not amplify past the file
    while (sample < n && chunk <= offsets.length) {
      while (run + 1 < runs.length && runs(run + 1)._1 <= chunk) run += 1
      var off = offsets(chunk.toInt - 1)
      var inChunk = 0L
      while (sample < n && inChunk < runs(run)._2) {
        val sz = sizes(sample)
        if (sz < 1 || off < 0 || off + sz > b.length) return None
        copied += sz
        // Legit sample tables address disjoint mdat ranges, so total
        // sample bytes never exceed the file; a table that does is
        // crafted aliasing (chunks pointing at the same bytes) whose
        // extraction would be O(n × file) memory — degrade, not OOM.
        if (copied > b.length) return None
        frames += java.util.Arrays.copyOfRange(b, off.toInt, (off + sz).toInt)
        off += sz
        inChunk += 1
        sample += 1
      }
      chunk += 1
    }
    if (sample < n) return None // stco ran out before stsz did
    Some(frames.result())
  }

  /** Whether the first video track's `stsd` declares a JPEG codec
    * (QuickTime `jpeg` entry, or ffmpeg's `mp4v` with an ESDS
    * objectTypeIndication of 0x6C) — the codec gate shared by the
    * plain and fragmented readers. */
  private def hasJpegEntry(b: Array[Byte], sp: Int, se: Int): Boolean = {
    val (dp, de) = findBox(b, sp, se, "stsd").getOrElse(return false)
    if (dp + 8 > de || beU32(b, dp + 4) < 1) return false
    boxAt(b, dp + 8, de).exists {
      case ("jpeg", _, _, _) => true
      case ("mp4v", ep, ee, _) =>
        findBox(b, ep + 78, ee.toInt, "esds").exists { case (p, e) =>
          esdsObjectType(b, p, e).contains(0x6c)
        }
      case _ => false
    }
  }

  /** The first video track's declared codec class for coverage cards:
    * Some("jpeg") for QuickTime `jpeg` or ffmpeg's JPEG-in-`mp4v`
    * (ESDS OTI 0x6C), Some(fourcc) for anything else the stsd names
    * (e.g. "avc1" — the inter-coded formats this repo scopes out),
    * None when no entry resolves. */
  def stsdCodecClass(b: Array[Byte]): Option[String] = {
    if (!isMp4(b)) return None
    val (sp, se) = videoStbl(b).getOrElse(return None)
    val (dp, de) = findBox(b, sp, se, "stsd").getOrElse(return None)
    if (dp + 8 > de || beU32(b, dp + 4) < 1) return None
    boxAt(b, dp + 8, de).map {
      case ("jpeg", _, _, _) => "jpeg"
      case ("mp4v", ep, ee, _) =>
        if (findBox(b, ep + 78, ee.toInt, "esds").exists { case (p, e) =>
          esdsObjectType(b, p, e).contains(0x6c)
        }) "jpeg" else "mp4v"
      case (fc, _, _, _) => fc
    }
  }

  /** Whether any top-level `moof` box exists — the fragmented-layout
    * marker (coverage cards split plain vs segment storage on it). */
  def hasTopLevelMoof(b: Array[Byte]): Boolean = {
    var i = 0
    var guard = 0
    while (i + 8 <= b.length && guard < 65536) {
      guard += 1
      val size = beU32(b, i)
      if (size < 8 || i + size > b.length) return false
      if (fourcc(b, i + 4) == "moof") return true
      i += size.toInt
    }
    false
  }

  /** The traf in `[from, to)` (a moof payload) whose `tfhd` names
    * `trackId` — tfhd layout: version/flags u32, then track_ID u32.
    * None when no traf matches (an audio-only fragment, or a crafted
    * moof with no usable tfhd) — the caller degrades. */
  private def findVideoTraf(b: Array[Byte], from: Int, to: Int,
      trackId: Long): Option[(Int, Int)] = {
    var i = from
    var guard = 0
    while (i + 8 <= to && guard < 4096) {
      boxAt(b, i, to) match {
        case Some((f, p, e, n)) =>
          if (f == "traf") {
            val matches = findBox(b, p, e.toInt, "tfhd").exists { case (hp, he) =>
              hp + 8 <= he && beU32(b, hp + 4) == trackId
            }
            if (matches) return Some((p, e.toInt))
          }
          if (n <= i) return None
          i = n.toInt
        case None => return None
      }
      guard += 1
    }
    None
  }

  /** The stored JPEG sample bytes of a FRAGMENTED MP4 (fMP4 — the
    * DASH/CMAF/HLS segment shape streaming services actually publish:
    * an `stbl`-empty `moov` up front, then `moof`+`mdat` fragments
    * each carrying its own `tfhd`/`trun` sample table). Fragments walk
    * in file order; per fragment the traf whose `tfhd` track_id names
    * the VIDEO track (tkhd's track_ID — a muxed file interleaves
    * audio/video trafs in one moof) has its trun(s) resolve sample
    * sizes (per-sample, or the tfhd default) and the data offset
    * relative to the moof start (the default-base-is-moof convention;
    * an explicit base-data-offset is honored when inside the file).
    * None — degrade, never throw — for a non-JPEG codec, a moof with
    * no video traf, a trun without a data offset, unresolved sizes, or
    * any addressing that escapes the file; the same copied-bytes
    * amplification guard as [[mjpegFrames]] caps crafted aliasing. */
  def mjpegFramesFragmented(b: Array[Byte]): Option[Vector[Array[Byte]]] = {
    if (!isMp4(b)) return None
    val (sp, se) = videoStbl(b).getOrElse(return None)
    if (!hasJpegEntry(b, sp, se)) return None
    // the tfhd match key: a muxed fMP4 interleaves audio/video trafs in
    // one moof, and taking "the first traf" would return the wrong
    // track's sample bytes as frames — only the traf whose tfhd names
    // the VIDEO track's tkhd id carries this walk's samples
    val videoId = videoTrackId(b).getOrElse(return None)
    val frames = Vector.newBuilder[Array[Byte]]
    var sawFragment = false
    var copied = 0L
    // top-level walk tracking each box's START offset (the trun base)
    var i = 0
    var guard = 0
    while (i + 8 <= b.length && guard < 65536) {
      guard += 1
      val size = beU32(b, i)
      if (size < 8 || i + size > b.length) return None
      if (fourcc(b, i + 4) == "moof") {
        sawFragment = true
        val moofStart = i
        // every traf in this moof, in order; exactly the video one runs
        val (tp, te) = findVideoTraf(b, i + 8, (i + size).toInt, videoId)
          .getOrElse(return None)
        val (hp, he) = findBox(b, tp, te, "tfhd").getOrElse(return None)
        if (hp + 8 > he) return None
        val hFlags = beU32(b, hp) & 0xffffff
        var o = hp + 8
        var base = moofStart.toLong // default-base-is-moof / v1 default
        if ((hFlags & 0x01) != 0) {
          if (o + 8 > he) return None
          base = beU64(b, o); o += 8
        }
        if ((hFlags & 0x02) != 0) o += 4 // sample_description_index
        if ((hFlags & 0x08) != 0) o += 4 // default_sample_duration
        var defaultSize = -1L
        if ((hFlags & 0x10) != 0) {
          if (o + 4 > he) return None
          defaultSize = beU32(b, o); o += 4
        }
        if (base < 0 || base > b.length) return None
        // every trun in this traf, in order
        var tIdx = tp
        var sawTrun = false
        while (tIdx + 8 <= te) {
          boxAt(b, tIdx, te) match {
            case Some(("trun", rp, re, next)) =>
              sawTrun = true
              if (rp + 8 > re) return None
              val rFlags = beU32(b, rp) & 0xffffff
              val nSamples = beU32(b, rp + 4)
              if (nSamples < 1 || nSamples > b.length) return None
              var ro = rp + 8
              if ((rFlags & 0x01) == 0) return None // data offset required
              if (ro + 4 > re) return None
              val dataOff = beU32(b, ro).toInt // i32 (negative = mdat-first layouts)
              ro += 4
              if ((rFlags & 0x04) != 0) ro += 4 // first_sample_flags
              val perSize = (rFlags & 0x200) != 0
              if (!perSize && defaultSize < 1) return None
              // every per-sample field row must fit INSIDE the trun —
              // bounded up front so no read in the loop can escape the
              // box (the degrade-never-throw contract)
              val fieldBytes = (if ((rFlags & 0x100) != 0) 4 else 0) +
                (if (perSize) 4 else 0) +
                (if ((rFlags & 0x400) != 0) 4 else 0) +
                (if ((rFlags & 0x800) != 0) 4 else 0)
              if (ro + nSamples * fieldBytes.toLong > re) return None
              var off = base + dataOff
              var s = 0L
              while (s < nSamples) {
                var sz = defaultSize
                if ((rFlags & 0x100) != 0) ro += 4 // duration
                if (perSize) { sz = beU32(b, ro); ro += 4 }
                if ((rFlags & 0x400) != 0) ro += 4 // sample flags
                if ((rFlags & 0x800) != 0) ro += 4 // cts offset
                if (sz < 1 || off < 0 || off + sz > b.length) return None
                copied += sz
                if (copied > b.length) return None // crafted aliasing
                frames += java.util.Arrays.copyOfRange(b, off.toInt, (off + sz).toInt)
                off += sz
                s += 1
              }
              tIdx = next.toInt
            case Some((_, _, _, next)) => tIdx = next.toInt
            case None => tIdx = te
          }
        }
        if (!sawTrun) return None
      }
      i += size.toInt
    }
    // the box-count guard exists to bound a crafted walk; exhausting it
    // with bytes still unread means the frame list is INCOMPLETE —
    // degrade rather than return silently truncated media
    if (i + 8 <= b.length && guard >= 65536) return None
    if (!sawFragment) None else Some(frames.result())
  }

  // ---- fixture muxer ------------------------------------------------

  private def box(fc: String, parts: Array[Byte]*): Array[Byte] = {
    val len = 8 + parts.map(_.length).sum
    val bb = java.nio.ByteBuffer.allocate(len) // BE is ByteBuffer's default
    bb.putInt(len).put(fc.getBytes("US-ASCII"))
    parts.foreach(bb.put)
    bb.array()
  }
  private def beInts(vs: Long*): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 * vs.length)
    vs.foreach(v => bb.putInt(v.toInt))
    bb.array()
  }
  private def beShorts(vs: Int*): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(2 * vs.length)
    vs.foreach(v => bb.putShort(v.toShort))
    bb.array()
  }

  /** Minimal MJPEG-in-MP4: `ftyp` + `mdat` (the JPEG sample bytes,
    * back to back) + trailing `moov` (the capture-device layout —
    * readers must find the sample tables BEHIND the media, which is
    * exactly what the walker above does). One track, one chunk, `jpeg`
    * VisualSampleEntry, 25 fps timescale. The fixture encoder for the
    * real MP4 video path, byte-inverse of [[mjpegFrames]]. */
  def encodeMjpeg(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty, "encodeMjpeg needs at least one frame")
    require(w >= 1 && w <= 0xffff && h >= 1 && h <= 0xffff,
      s"dims must fit a VisualSampleEntry u16, got ${w}x$h")
    val ftyp = box("ftyp", "isom".getBytes, beInts(0x200),
      "isom".getBytes, "mp41".getBytes)
    val mdat = box("mdat", frames.toArray.flatten)
    val n = frames.length
    val firstSample = ftyp.length + 8L // mdat payload starts after its header
    val unityMatrix = beInts(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    val mvhd = box("mvhd", beInts(0, 0, 0, 1000, n * 40L, 0x10000),
      Array[Byte](0x01, 0x00, 0, 0), beInts(0, 0), unityMatrix,
      beInts(0, 0, 0, 0, 0, 0), beInts(2))
    val tkhd = box("tkhd", beInts(3, 0, 0, 1, 0, n * 40L, 0, 0),
      beInts(0, 0), unityMatrix, beInts(w.toLong << 16, h.toLong << 16))
    val mdhd = box("mdhd", beInts(0, 0, 0, 25, n.toLong),
      Array[Byte](0x55, 0xc4.toByte, 0, 0))
    val hdlr = box("hdlr", beInts(0, 0), "vide".getBytes,
      beInts(0, 0, 0), "GraftMJPEG".getBytes :+ 0.toByte)
    // VisualSampleEntry: 6 reserved + data_ref_idx, 2+2+12
    // pre_defined/reserved, width/height, 72 dpi resolutions,
    // reserved, frame_count 1, 32-byte compressorname, depth 24,
    // pre_defined -1 (ISO 14496-12 §12.1.3)
    val entry = box("jpeg", new Array[Byte](6), beShorts(1),
      beShorts(0, 0), beInts(0, 0, 0), beShorts(w, h),
      beInts(0x480000, 0x480000, 0), beShorts(1),
      new Array[Byte](32), beShorts(24, -1))
    val stsd = box("stsd", beInts(0, 1), entry)
    val stts = box("stts", beInts(0, 1, n.toLong, 1))
    val stsc = box("stsc", beInts(0, 1, 1, n.toLong, 1))
    val stsz = box("stsz", beInts((0L +: 0L +: n.toLong +:
      frames.map(_.length.toLong)): _*))
    val stco = box("stco", beInts(0, 1, firstSample))
    val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
    val vmhd = box("vmhd", beInts(1, 0, 0))
    val dinf = box("dinf", box("dref", beInts(0, 1), box("url ", beInts(1))))
    val minf = box("minf", vmhd, dinf, stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", tkhd, mdia)
    val moov = box("moov", mvhd, trak)
    ftyp ++ mdat ++ moov
  }

  /** FRAGMENTED MJPEG-in-MP4 — the DASH/CMAF segment shape: `ftyp` +
    * an `stbl`-EMPTY `moov` (sample tables all zero-entry; `mvex/trex`
    * declares the track's fragment defaults, the marker players use to
    * expect moofs) + one `moof`+`mdat` pair per `framesPerFrag`
    * frames, each moof's `tfhd`(default-base-is-moof)/`trun`(data
    * offset + per-sample sizes) addressing its own mdat payload.
    * Byte-inverse of [[mjpegFramesFragmented]]; [[mjpegFrames]]
    * returns None on it (empty stsz), which is exactly how the
    * storage-blind seam dispatches. `withAudioTraf` muxes a decoy
    * PCM audio track whose traf LEADS every moof and renumbers the
    * video track to 3 — the multi-track shape that pins the reader's
    * tfhd-vs-tkhd track matching. */
  def encodeMjpegFragmented(w: Int, h: Int, frames: Seq[Array[Byte]],
      framesPerFrag: Int = 2, withAudioTraf: Boolean = false): Array[Byte] = {
    require(frames.nonEmpty, "encodeMjpegFragmented needs at least one frame")
    require(framesPerFrag >= 1, s"framesPerFrag must be >= 1, got $framesPerFrag")
    require(w >= 1 && w <= 0xffff && h >= 1 && h <= 0xffff,
      s"dims must fit a VisualSampleEntry u16, got ${w}x$h")
    // the muxed-multi-track shape (withAudioTraf): an AUDIO traf leads
    // every moof and the video track id is deliberately NOT 1, so a
    // reader that takes "the first traf" or assumes track 1 returns
    // audio bytes as frames — the r16-advice regression this muxer
    // mode exists to pin
    val videoId = if (withAudioTraf) 3L else 1L
    val audioId = 2L
    val ftyp = box("ftyp", "iso5".getBytes, beInts(0x200),
      "iso5".getBytes, "iso6".getBytes)
    val n = frames.length
    val unityMatrix = beInts(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    val mvhd = box("mvhd", beInts(0, 0, 0, 1000, 0, 0x10000),
      Array[Byte](0x01, 0x00, 0, 0), beInts(0, 0), unityMatrix,
      beInts(0, 0, 0, 0, 0, 0), beInts(videoId + 1))
    val tkhd = box("tkhd", beInts(3, 0, 0, videoId, 0, 0, 0, 0),
      beInts(0, 0), unityMatrix, beInts(w.toLong << 16, h.toLong << 16))
    val mdhd = box("mdhd", beInts(0, 0, 0, 25, 0),
      Array[Byte](0x55, 0xc4.toByte, 0, 0))
    val hdlr = box("hdlr", beInts(0, 0), "vide".getBytes,
      beInts(0, 0, 0), "GraftFMP4".getBytes :+ 0.toByte)
    val entry = box("jpeg", new Array[Byte](6), beShorts(1),
      beShorts(0, 0), beInts(0, 0, 0), beShorts(w, h),
      beInts(0x480000, 0x480000, 0), beShorts(1),
      new Array[Byte](32), beShorts(24, -1))
    val stsd = box("stsd", beInts(0, 1), entry)
    // zero-entry sample tables: all media lives in fragments
    def emptyTables(sd: Array[Byte]) = box("stbl", sd, box("stts", beInts(0, 0)),
      box("stsc", beInts(0, 0)), box("stsz", beInts(0, 0, 0)),
      box("stco", beInts(0, 0)))
    val vmhd = box("vmhd", beInts(1, 0, 0))
    val dinf = box("dinf", box("dref", beInts(0, 1), box("url ", beInts(1))))
    val minf = box("minf", vmhd, dinf, emptyTables(stsd))
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", tkhd, mdia)
    val audioTrak = if (!withAudioTraf) Array.emptyByteArray else {
      val atkhd = box("tkhd", beInts(3, 0, 0, audioId, 0, 0, 0, 0),
        beInts(0, 0x01000000), unityMatrix, beInts(0, 0))
      val amdhd = box("mdhd", beInts(0, 0, 0, 8000, 0),
        Array[Byte](0x55, 0xc4.toByte, 0, 0))
      val ahdlr = box("hdlr", beInts(0, 0), "soun".getBytes,
        beInts(0, 0, 0), "GraftPCM".getBytes :+ 0.toByte)
      // AudioSampleEntry: 6 reserved + data_ref_idx, 8 reserved,
      // channels/bits, pre_defined/reserved, samplerate 8000<<16
      val aentry = box("sowt", new Array[Byte](6), beShorts(1),
        beInts(0, 0), beShorts(1, 16), beShorts(0, 0), beInts(8000L << 16))
      val astsd = box("stsd", beInts(0, 1), aentry)
      val aminf = box("minf", box("smhd", beInts(0, 0)), dinf, emptyTables(astsd))
      box("trak", atkhd, box("mdia", amdhd, ahdlr, aminf))
    }
    // trex: one per track — sample-description 1, default duration/size/flags
    val mvex =
      if (withAudioTraf)
        box("mvex", box("trex", beInts(0, videoId, 1, 1, 0, 0)),
          box("trex", beInts(0, audioId, 1, 1, 0, 0)))
      else box("mvex", box("trex", beInts(0, videoId, 1, 1, 0, 0)))
    val moov =
      if (withAudioTraf) box("moov", mvhd, audioTrak, trak, mvex)
      else box("moov", mvhd, trak, mvex)
    val frags = frames.grouped(framesPerFrag).zipWithIndex.map { case (fs, fi) =>
      // deterministic per-fragment audio payload, mdat-first
      val audio: Array[Byte] =
        if (withAudioTraf) Array.tabulate(37)(i => ((fi * 31 + i) & 0xff).toByte)
        else Array.emptyByteArray
      val trunFixed = 8 + 4 // version/flags + count, then data_offset
      val trunLen = 8 + trunFixed + 4 * fs.length
      val tfdt = box("tfdt", beInts(0, fi.toLong * framesPerFrag))
      // audio traf (leading): tfhd(16) + tfdt(16) + trun(1 sample, 24)
      val audioTrafLen = if (withAudioTraf) 8 + 16 + 16 + 24 else 0
      // moof = 8 + mfhd(16) + [audio traf] + traf(8 + tfhd(16) + tfdt(16) + trun)
      val moofLen = 8 + 16 + audioTrafLen + 8 + 16 + 16 + trunLen
      val audioTraf = if (!withAudioTraf) Array.emptyByteArray else {
        val atfhd = box("tfhd", beInts(0x020000, audioId))
        val atrun = box("trun", beInts(0x000201, 1, moofLen + 8L, audio.length.toLong))
        box("traf", atfhd, tfdt, atrun)
      }
      val dataOffset = moofLen + 8L + audio.length // first VIDEO byte of the mdat payload
      val tfhd = box("tfhd", beInts(0x020000, videoId)) // default-base-is-moof
      val trun = box("trun", beInts((0x000201L +: fs.length.toLong +:
        dataOffset +: fs.map(_.length.toLong)): _*))
      val traf = box("traf", tfhd, tfdt, trun)
      val moof =
        if (withAudioTraf) box("moof", box("mfhd", beInts(0, fi + 1L)), audioTraf, traf)
        else box("moof", box("mfhd", beInts(0, fi + 1L)), traf)
      assert(moof.length == moofLen, s"moof layout drifted: ${moof.length} vs $moofLen")
      moof ++ box("mdat", audio ++ fs.toArray.flatten)
    }.toSeq
    (ftyp +: moov +: frags).reduce(_ ++ _)
  }
}
