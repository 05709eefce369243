package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed in partition-sized batches.
  *
  * The decode paths are REAL, clean-room, pure-JVM codecs built in this
  * repo — no image/audio libraries ship in the container, and none are
  * needed: PNG (every legal depth × color type, Adam7 —
  * [[PngCodec]]), baseline + progressive JPEG ([[JpegCodec]]), GIF
  * (LZW, palettes, interlace — [[GifCodec]]), WAV PCM incl.
  * WAVE_FORMAT_EXTENSIBLE, FLAC, µ-law/A-law, IMA-ADPCM
  * ([[FlacCodec]]/[[G711]]/[[ImaAdpcm]]), AVI-MJPEG and plain +
  * fragmented MP4 ([[Mp4Codec]]). `decodeStub` survives only as the
  * clearly-marked DEGRADE path for payloads no codec claims
  * (inter-coded video, truncated streams): such bytes hash through a
  * deterministic lattice and are COUNTED in the m7-family coverage
  * cards rather than silently mis-decoded.
  *
  * Everything Spark-side is the shape that holds at 100 TB: schema
  * (binary + struct metadata), batched `mapPartitions` execution (one
  * iterator per partition, amortizing codec init — the Scala analog of
  * `mapInPandas`), partitioning control, and the feature-column
  * contract downstream ops consume.
  *
  * Scale: payloads never pass through a shuffle — decode/fingerprint is
  * map-only (ScaleSpec pins it); `repartition(n)` bounds batch memory
  * (payload bytes per task), the knob the 300-item audience batches of
  * the reference tuned by hand (`mailchimp/src/members.rs:130-134`).
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String)
  final case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Long,
      width: Int, height: Int, feature: Array[Float])

  /** Wrap a text corpus as opaque binary media (the ingestion shape: at
    * scale this column comes from raw image/audio bytes in parquet). */
  def asMedia(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"),
        col("text").cast("binary").as("payload"),
        when(col("doc_id") % 3 === 0, "image/png")
          .when(col("doc_id") % 3 === 1, "audio/wav")
          .otherwise("video/mp4").as("mime"))
      .as[MediaRow]
  }

  /** STUB decode — the DEGRADE path for payloads none of the repo's
    * real codecs claim (inter-coded video, unknown containers,
    * arbitrary bytes): derives deterministic pseudo-features so the
    * plumbing (batching, schema, downstream consumption) keeps working
    * on any payload, while the m7-family coverage cards COUNT what
    * rode this path vs a real decode. Runs inside the same
    * mapPartitions batches as the real codecs (init amortized per
    * partition, never a per-row UDF). */
  private def decodeStub(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val n = payload.length
    val w = 16 + (n % 64)
    val h = 16 + ((n / 64) % 64)
    val feat = new Array[Float](8)
    var i = 0
    while (i < n) { feat(i % 8) += (payload(i) & 0xff) / 255.0f; i += 1 }
    (w, h, feat)
  }

  // ---- real container-header parsing (pure byte reads, no codec deps) ----

  private def beU32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def beU16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def leU32(b: Array[Byte], o: Int): Long =
    ((b(o + 3) & 0xffL) << 24) | ((b(o + 2) & 0xffL) << 16) |
      ((b(o + 1) & 0xffL) << 8) | (b(o) & 0xffL)
  private def leU16(b: Array[Byte], o: Int): Int =
    ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)

  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** PNG: 8-byte signature, then the IHDR chunk (must be first): length,
    * "IHDR", width u32 BE, height u32 BE. */
  private def parsePng(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length < 24 || !b.startsWith(PngSig)) None
    else if (b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R') None
    else Some((beU32(b, 16).toInt, beU32(b, 20).toInt))

  /** JPEG: SOI then marker segments; dimensions live in the first SOFn
    * (C0–CF except the non-frame C4/C8/CC): [marker, len u16, precision,
    * height u16 BE, width u16 BE]. Segment lengths include their own two
    * bytes — malformed lengths abort rather than scan off the end.
    * Standalone markers (TEM 0x01, RSTn 0xD0–0xD7) carry no length, and
    * 0xFF fill bytes before a marker are skipped, per the spec. */
  private def parseJpeg(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var i = 2
    while (i + 1 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      var j = i + 1 // skip 0xFF fill bytes: any number may pad a marker
      while (j < b.length && (b(j) & 0xff) == 0xff) j += 1
      if (j >= b.length) return None
      val marker = b(j) & 0xff
      if (marker == 0xd9 || marker == 0xda) return None // EOI / scan start: no SOF seen
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
        i = j + 1 // standalone marker: no length field
      } else {
        if (j + 3 >= b.length) return None
        val len = beU16(b, j + 1)
        if (len < 2 || j + 1 + len > b.length) return None
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (len < 7) return None
          return Some((beU16(b, j + 6), beU16(b, j + 4))) // (width, height)
        }
        i = j + 1 + len
      }
    }
    None
  }

  /** WAV: "RIFF" size "WAVE", then chunks of [id(4), size u32 LE, data];
    * the "fmt " chunk carries audioFormat u16, channels u16, sampleRate
    * u32 LE. Returns (sampleRate, channels) as the audio "dimensions".
    * Chunk sizes stay u32-in-Long so a crafted size (e.g. 0xFFFFFFF8)
    * can't wrap negative and stall or underflow the walk. */
  private def parseWav(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 12 || !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F')) return None
    if (!(b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var i = 12
    while (i + 8 <= b.length) {
      val size = leU32(b, i + 4) // u32 as Long: never negative
      if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' ') {
        if (size < 8 || i + 8 + 8 > b.length) return None
        return Some((leU32(b, i + 12).toInt, leU16(b, i + 10))) // (sampleRate, channels)
      }
      val next = i.toLong + 8L + size + (size & 1L) // chunks are word-aligned
      if (next <= i || next > b.length.toLong) return None // overflow / truncated chunk
      i = next.toInt
    }
    None
  }

  /** AVI: RIFF with form type 'AVI '; frame dimensions live in the
    * avih header (LIST hdrl → avih: dwWidth/dwHeight at offsets 32/36
    * of the chunk body). Same guarded walk as [[parseWav]]. */
  private def parseAvi(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 12 || !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F')) return None
    if (!(b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' ')) return None
    var i = 12
    while (i + 8 <= b.length) {
      val size = leU32(b, i + 4)
      val isList = b(i) == 'L' && b(i + 1) == 'I' && b(i + 2) == 'S' && b(i + 3) == 'T'
      if (isList && size >= 4 && i + 12 <= b.length &&
        b(i + 8) == 'h' && b(i + 9) == 'd' && b(i + 10) == 'r' && b(i + 11) == 'l') {
        // first child must be avih; dims at body offsets 32/36
        val c = i + 12
        if (c + 8 > b.length || !(b(c) == 'a' && b(c + 1) == 'v' &&
          b(c + 2) == 'i' && b(c + 3) == 'h')) return None
        if (leU32(b, c + 4) < 40 || c + 8 + 40 > b.length) return None
        // dims are u32 on the wire; a crafted header can carry values
        // ≥ 2³¹ whose .toInt goes negative and would flow into
        // mediaDimsCard's orientation/extrema/total_px aggregates —
        // reject anything outside (0, 64 MP], mirroring JpegCodec's cap
        val aw = leU32(b, c + 8 + 32)
        val ah = leU32(b, c + 8 + 36)
        if (aw <= 0 || ah <= 0 || aw * ah > 64L * 1024 * 1024) return None
        return Some((aw.toInt, ah.toInt))
      }
      val next = i.toLong + 8L + size + (size & 1L)
      if (next <= i || next > b.length.toLong) return None
      i = next.toInt
    }
    None
  }

  /** Sniff the container by magic bytes (trusting bytes over any declared
    * mime) and read the real dimensions from the header. */
  def parseDims(payload: Array[Byte]): Option[(String, Int, Int)] =
    parsePng(payload).map { case (w, h) => ("image/png", w, h) }
      .orElse(parseJpeg(payload).map { case (w, h) => ("image/jpeg", w, h) })
      .orElse(parseWav(payload).map { case (r, c) => ("audio/wav", r, c) })
      .orElse(parseAvi(payload).map { case (w, h) => ("video/avi", w, h) })
      .orElse(Mp4Codec.dims(payload).map { case (w, h) => ("video/mp4", w, h) })
      .orElse(FlacCodec.info(payload).map { case (r, c, _, _) => ("audio/flac", r, c) })

  /** Batched feature extraction over partitions: REAL header dimensions
    * for recognized containers (PNG IHDR / JPEG SOFn / WAV fmt — pure
    * byte reads above), stub features otherwise. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init happens here (codec/model handles)
      rows.map { r =>
        val (sw, sh, feat) = decodeStub(r.payload)
        parseDims(r.payload) match {
          case Some((mime, w, h)) =>
            MediaFeatures(r.doc_id, mime, r.payload.length.toLong, w, h, feat)
          case None =>
            MediaFeatures(r.doc_id, r.mime, r.payload.length.toLong, sw, sh, feat)
        }
      }
    }
  }

  // ---- fixture synthesis: real minimal containers from doc columns ----

  private def pngBytes(w: Int, h: Int, crc: Int = 0): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(33)
    out.put(PngSig).putInt(13).put("IHDR".getBytes)
      .putInt(w).putInt(h)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      .putInt(crc) // CRC not validated by the header parser; m4's fixture
                   // uses its last byte as the "one-pixel edit" carrier
    out.array()
  }

  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(2 + 2 + 17 + 2)
    out.put(0xff.toByte).put(0xd8.toByte)            // SOI
      .put(0xff.toByte).put(0xc0.toByte).putShort(17) // SOF0, len
      .put(8.toByte).putShort(h.toShort).putShort(w.toShort)
      .put(3.toByte)                                  // 3 components
      .put(Array[Byte](1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
      .put(0xff.toByte).put(0xd9.toByte)              // EOI
    out.array()
  }

  private def wavBytes(sampleRate: Int, channels: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val byteRate = sampleRate * channels * 2
    out.put("RIFF".getBytes).putInt(36).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(byteRate).putShort((channels * 2).toShort).putShort(16)
      .put("data".getBytes).putInt(0)
    out.array()
  }

  /** Media fixture with REAL container bytes, dimensions derived
    * deterministically from doc columns (so an engine-independent oracle
    * can predict them): the m2 round trip is synthesize → encode header
    * bytes → re-parse with the byte readers above. */
  def syntheticMedia(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("n_chars").cast("long"))
      .as[(Long, Long)]
      .map { case (id, nChars) =>
        val payload = (id % 3) match {
          case 0 => pngBytes((1 + id % 640).toInt, (1 + nChars % 480).toInt)
          case 1 => wavBytes((8000 + (id % 5) * 8820).toInt, (1 + id % 2).toInt)
          case _ => jpegBytes((1 + id % 1024).toInt, (1 + nChars % 768).toInt)
        }
        val mime = (id % 3) match {
          case 0 => "image/png"
          case 1 => "audio/wav"
          case _ => "image/jpeg"
        }
        MediaRow(id, payload, mime)
      }
  }

  /** All-PNG media fixture for the perceptual-dedup entry (m4): ~each
    * residue group `doc_id % 251` shares one (w, h) image; within a
    * group, odd doc_ids carry a 1-byte payload difference (the CRC
    * field's last byte) that the stub pixel grid renders as a one-cell
    * edit — the "same picture, tiny edit" shape perceptual hashing
    * exists to catch. Dims/edit derive from doc_id arithmetic so the
    * oracle predicts them without parsing bytes. */
  /** Spread the fixture id frame across the session's parallelism
    * before the payload mux (r18 opt, guide §2.5 "input skew"): the
    * ids scan out of ONE small parquet split, so the synthetic encode
    * — and the decode+hash pass FUSED into the same stage — ran on a
    * single core while the rest of the box idled (measured: m4c's
    * encode 3.0 s + decode 1.4 s wall on one core at sf0.1). A hash
    * repartition on doc_id is deterministic, costs one tiny id-only
    * shuffle, and scales with the session (defaultParallelism), not a
    * constant tuned to this box; at a real corpus the payload source
    * arrives in many splits and the repartition of ids stays noise. */
  private def spreadIds(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").cast("long"))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col("doc_id"))

  // NO spreadIds here (r19, closing the r18 keep/revert pass): m4's
  // phash map is the cheapest of the codec consumers, and the added
  // id-shuffle cost more than the parallel map saved — the same
  // measured pattern that reverted lm2/pr1/url4/d13's spreads
  // (6-rep A/B: no-spread median 0.735 s / lo 0.684 vs spread
  // 0.792 / lo 0.717, and the r18 driver saw 0.81->1.16 s).
  def syntheticImages(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].map { id =>
      val g = (id % 251).toInt
      MediaRow(id, pngBytes(16 + (g * 37) % 200, 16 + (g * 53) % 150,
        (id % 2).toInt), "image/png")
    }
  }

  /** dHash bit packing over the stub pixel grid. The grid is the
    * clearly-marked deterministic fake standing in for decode + resize +
    * grayscale (this container has no image codecs): cell luminance is
    * the repo's portable 60-bit md5 hash of `w:h:i` (i = r·9 + c, an
    * 8-row × 9-col grid), plus a single-cell perturbation at (0, 1)
    * scaled by `tweak` (the last payload byte — a real one-pixel edit
    * flips exactly the ≤2 bits whose comparisons touch the edited
    * cell). md5 cells matter: any grid LINEAR in (w, h) reduces every
    * bit to a threshold on the ratio w/h, collapsing the hash space to
    * a ~65-step staircase that floods the band join with cross-group
    * near-collisions (observed: 42 distinct hashes over 500 images).
    * Hashed cells are iid per (dims, cell), so distinct images land ~32
    * bits apart — the uniform spread real pixel content gives dHash —
    * and only true duplicates/edits survive the Hamming gate. The dHash
    * itself is the REAL algorithm: bit (r·8+c) set iff a(r,c) <
    * a(r,c+1) — row-wise gradient sign, the brightness-shift-invariant
    * 64-bit fingerprint. */
  private[graft] def dHash64(w: Long, h: Long, tweak: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    // One digest per grid cell (72), parsed straight from the digest
    // bytes: the first 15 hex chars of an MD5 are its first 8 bytes
    // read big-endian >>> 4 — bit-identical to the oracle's
    // ('0x' || substr(md5(s), 1, 15))::BIGINT, without per-byte string
    // formatting (the original formatted 128 digests per hash and
    // dominated the m4/m6 scan cost).
    val grid = new Array[Long](72)
    var i = 0
    while (i < 72) {
      md.reset()
      val d = md.digest(s"$w:$h:$i".getBytes("UTF-8"))
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      grid(i) = v >>> 4
      i += 1
    }
    grid(1) += tweak.toLong * 2305843009213693952L
    var hash = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (grid(r * 9 + c) < grid(r * 9 + c + 1)) hash |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    hash
  }

  /** m4 step 1 — perceptual hash per image. For PNG, JPEG, and GIF
    * payloads the path is REAL end-to-end: [[PngCodec.decodeGray]] /
    * [[JpegCodec.decodeGray]] / [[GifCodec.decodeGray]] feed
    * [[PngCodec.dHashPixels]] (area resize + gradient sign), so
    * cross-container twins hash identically. Payloads no codec claims
    * (header-only fixtures, truncated streams) fall back to the
    * header-dims md5-lattice stub — same banded machinery downstream
    * either way, and the m7d card counts which path each class rode.
    * All inside the one batched mapPartitions pass that scans each
    * payload once (decode init amortized per partition, the multimodal
    * execution contract). Non-image payloads drop. Output:
    * (doc_id, phash) — 8 bytes per image ever leaves the scan. */
  def imageDHash(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        PngCodec.decodeGray(r.payload)
          .orElse(JpegCodec.decodeGray(r.payload))
          .orElse(GifCodec.decodeGray(r.payload)) match {
          case Some((w, h, gray)) if w >= 9 && h >= 8 =>
            Some((r.doc_id, PngCodec.dHashPixels(w, h, gray)))
          case _ => parseDims(r.payload) match {
            case Some((mime, w, h)) if mime.startsWith("image/") =>
              val tweak = r.payload(r.payload.length - 1) & 0xff
              Some((r.doc_id, dHash64(w, h, tweak)))
            case _ => None
          }
        }
      }
    }.toDF("doc_id", "phash")
  }

  /** All-PNG fixture with REAL pixel data for the end-to-end pixel path
    * (m4b): each residue group `doc_id % 251` is one image of
    * group-seeded noise (java.util.Random — the JLS-specified LCG, so
    * pixels are platform-deterministic), encoded through
    * [[PngCodec.encodeGray]] with scanline filters cycling 0–4 (every
    * unfilter branch runs on every image). Odd doc_ids flip one pixel
    * by +128 — a real one-pixel edit, which moves one resize cell's
    * mean and therefore at most 2 dHash bits: in-group pairs stay
    * within any Hamming gate ≥ 2 while iid noise puts cross-group
    * hashes ~32 bits apart. The PAIR SET is thus predictable from
    * doc_id arithmetic alone, which is what lets a SQL oracle gate a
    * genuine pixel pipeline. */
  def syntheticPixelImages(docs: DataFrame,
      group: Long => Long = _ % 251): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    spreadIds(docs).as[Long].map { id =>
      val g = group(id)
      val w = (16 + (g * 37) % 200).toInt
      val h = (16 + (g * 53) % 150).toInt
      val rnd = new java.util.Random(g * 2654435761L)
      val gray = Array.fill(w * h)(rnd.nextInt(256))
      if (id % 2 == 1) gray(w + 1) = (gray(w + 1) + 128) % 256
      MediaRow(id, PngCodec.encodeGray(w, h, gray, y => y % 5), "image/png")
    }
  }

  /** Decode a fixture-generated PNG payload, failing LOUDLY on the
    * impossible — the PNG twin of [[decodeFixtureGray]]'s contract:
    * a fixture generator may assume its own encoder's output decodes
    * (tests pin it), but a bare `.get` would surface an encoder
    * regression as an anonymous NoSuchElementException. */
  private def decodeFixturePng(r: MediaRow): (Int, Int, Array[Int]) =
    PngCodec.decodeGray(r.payload).getOrElse(throw new IllegalStateException(
      s"fixture invariant violated: synthetic PNG for doc_id=" +
        s"${r.doc_id} failed to decode — the fixture encoder regressed"))

  /** [[syntheticPixelImages]] re-stored across the three PNG storage
    * forms — the m4f fixture (the r14 verdict's ask): every
    * doc_id % 5 == 0 payload re-encodes as a REAL Adam7-interlaced
    * stream, every remaining % 3 == 0 as a REAL paletted (color type
    * 3) stream whose PLTE is a non-identity permutation of the gray
    * levels, the rest stay baseline grayscale. PNG is lossless in all
    * three forms, so every member of a residue group still decodes to
    * the SAME raster (± the odd-id one-pixel edit) and the m4b
    * closed-form pair oracle carries over verbatim — but a pair whose
    * members mix storages now only collides if the PLTE lookup and
    * the 7-pass de-interlace genuinely reconstruct the raster the
    * baseline path reads. Palette PNGs (charts, icons, screenshots)
    * and interlaced PNGs are the slice of real web corpora that
    * r14-and-earlier hashed through the md5 stub; this entry retires
    * that fallback on the common formats. */
  def syntheticPngStorageMix(docs: DataFrame,
      group: Long => Long = _ % 251): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    syntheticPixelImages(docs, group).map { r =>
      if (r.doc_id % 5 == 0) {
        val (w, h, px) = decodeFixturePng(r)
        r.copy(payload = PngCodec.encodeAdam7(w, h, px, y => y % 5))
      } else if (r.doc_id % 3 == 0) {
        val (w, h, px) = decodeFixturePng(r)
        r.copy(payload = PngCodec.encodePaletted(w, h, px, y => y % 5))
      } else r
    }
  }

  /** [[syntheticPixelImages]] re-stored across BIT DEPTHS — the m4g
    * fixture (the m5d storage-blindness move for images): every
    * doc_id % 2 == 0 payload re-encodes as a REAL 16-bit grayscale
    * stream holding the exact v·257 upscale of its raster (big-endian
    * sample pairs, bpp=2 byte filters), every remaining % 3 == 0 as a
    * paletted stream, % 5 == 0 of the rest as Adam7. The 16-bit
    * upscale is exactly invertible (v·257·255/65535 = v), so every
    * member of a residue group still decodes to the SAME raster and
    * the m4b closed-form pair oracle carries over verbatim — but a
    * pair whose members mix 8-bit and 16-bit storage only collides if
    * the two-byte unfilter reach and the 16→8 reduction genuinely
    * reconstruct the raster the baseline path reads. 16-bit PNGs
    * (medical scans, scientific plots, RAW exports) were the last
    * depth family r15 stub-hashed; this entry retires that fallback
    * entirely. */
  def syntheticPngDepthMix(docs: DataFrame,
      group: Long => Long = _ % 251): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    syntheticPixelImages(docs, group).map { r =>
      if (r.doc_id % 2 == 0) {
        val (w, h, px) = decodeFixturePng(r)
        r.copy(payload = PngCodec.encodeGray16(w, h, px.map(_ * 257), y => y % 5))
      } else if (r.doc_id % 3 == 0) {
        val (w, h, px) = decodeFixturePng(r)
        r.copy(payload = PngCodec.encodePaletted(w, h, px, y => y % 5))
      } else if (r.doc_id % 5 == 0) {
        val (w, h, px) = decodeFixturePng(r)
        r.copy(payload = PngCodec.encodeAdam7(w, h, px, y => y % 5))
      } else r
    }
  }

  /** [[syntheticPixelImages]] re-stored across CONTAINERS — the m4h
    * fixture (r17, the m4f/m4g move applied to GIF): every
    * doc_id % 4 == 0 payload re-encodes as a REAL interlaced GIF
    * (4-pass row lattice, global identity-gray palette), every
    * % 4 == 2 as a REAL non-interlaced GIF with a LOCAL color table
    * whose entries are a non-identity permutation of the gray levels
    * (an indices-as-pixels shortcut garbles), odd doc_ids stay PNG.
    * GIF is lossless for 8-bit gray rasters, so every member of a
    * residue group still decodes to the SAME raster and the m4b
    * closed-form pair oracle carries over verbatim — but a pair whose
    * members mix PNG and GIF storage only collides if the real LZW
    * decode, the palette lookup, and the de-interlace reconstruct the
    * raster the PNG path reads. GIFs (icons, charts, memes — the web's
    * oldest still-everywhere format) were the last common image
    * container on the md5-stub path; this retires it. */
  def syntheticGifStorageMix(docs: DataFrame,
      group: Long => Long = _ % 251): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    syntheticPixelImages(docs, group).map { r =>
      if (r.doc_id % 4 == 0) {
        val (w, h, px) = decodeFixturePng(r)
        r.copy(payload = GifCodec.encodeGray(w, h, px, interlaced = true),
          mime = "image/gif")
      } else if (r.doc_id % 4 == 2) {
        val (w, h, px) = decodeFixturePng(r)
        r.copy(payload = GifCodec.encodeGray(w, h, px, localPalette = true),
          mime = "image/gif")
      } else r
    }
  }

  /** m7d fixture — [[syntheticPixelImages]] stretched across the IMAGE
    * coverage axes the way [[syntheticJpegSofMix]] stretches SOF
    * families, covering every depth family the codec decodes:
    * doc_id % 8 == 1 re-encodes paletted (8-bit PLTE permutation),
    * % 8 == 2 as REAL 4-bit grayscale (the raster quantized to its
    * 16-level grid — sub-byte unpack must run), % 8 == 3 as Adam7,
    * % 8 == 4 as REAL 4-bit PALETTED (sub-byte index unpack + PLTE
    * lookup compose), % 8 == 5 as REAL 16-bit grayscale (the exact
    * v·257 upscale, big-endian pairs + bpp=2 filters), % 8 == 6
    * TRUNCATES the stream mid-IDAT — the counted degrade path (header
    * classifies, decode must fail cleanly, never kill), and — r17 —
    * % 8 == 7 re-stores as a REAL GIF (LZW + palette), putting the
    * third natively decoded container on the same card. The rest stay
    * baseline 8-bit grayscale and must all actually decode. */
  def syntheticPngCoverageMix(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    syntheticPixelImages(docs).map { r =>
      r.doc_id % 8 match {
        case 7 => // r17: the GIF container joins the image coverage card
          val (w, h, px) = decodeFixturePng(r)
          r.copy(payload = GifCodec.encodeGray(w, h, px), mime = "image/gif")
        case 1 =>
          val (w, h, px) = decodeFixturePng(r)
          r.copy(payload = PngCodec.encodePaletted(w, h, px, y => y % 5))
        case 2 =>
          val (w, h, px) = decodeFixturePng(r)
          r.copy(payload = PngCodec.encodeGraySub(w, h, 4, px.map(_ >> 4), y => y % 5))
        case 3 =>
          val (w, h, px) = decodeFixturePng(r)
          r.copy(payload = PngCodec.encodeAdam7(w, h, px, y => y % 5))
        case 4 =>
          val (w, h, px) = decodeFixturePng(r)
          r.copy(payload = PngCodec.encodePalettedSub(w, h, 4, px.map(_ >> 4), y => y % 5))
        case 5 =>
          val (w, h, px) = decodeFixturePng(r)
          r.copy(payload = PngCodec.encodeGray16(w, h, px.map(_ * 257), y => y % 5))
        case 6 =>
          // stream cut mid-IDAT: the IHDR still classifies (gray8) but
          // inflate starves — decoded=false is the card's degrade row
          r.copy(payload = java.util.Arrays.copyOf(r.payload, r.payload.length - 20))
        case _ => r
      }
    }
  }

  /** Storage-class classifier for PNG payloads — the coverage axis of
    * the m7d receipt, [[jpegSofClass]]'s move for the container the
    * image pipeline decodes natively. Reads the IHDR fields the
    * decoder itself gates on (bit depth, color type, interlace) and
    * buckets `<base><depth>` (`gray16`, `palette4`, `rgba8`, …) with
    * `_adam7` appended for interlaced streams — as of r16 every legal
    * depth × color-type combo is a REAL decode path, so the class
    * names carry the depth rather than flagging it. Illegal combos
    * (spec §11.2.2) bucket `illegal`, unknown color types `reserved`,
    * non-PNG bytes `not_png`. */
  private[graft] def pngClass(b: Array[Byte]): String = {
    if (b.length < 29 || (b(0) & 0xff) != 0x89 || b(1) != 'P' || b(2) != 'N' ||
      b(3) != 'G' || b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R')
      return "not_png"
    val depth = b(24) & 0xff
    val ct = b(25) & 0xff
    val il = b(28) & 0xff
    val base = ct match {
      case 0 => "gray"; case 2 => "rgb"; case 3 => "palette"
      case 4 => "gray_alpha"; case 6 => "rgba"
      case _ => return "reserved"
    }
    val legal = ct match {
      case 0 => Set(1, 2, 4, 8, 16)
      case 3 => Set(1, 2, 4, 8)
      case _ => Set(8, 16)
    }
    if (!legal(depth)) return "illegal"
    if (il == 1) s"$base${depth}_adam7" else s"$base$depth"
  }

  /** m7d — image storage-coverage card (PNG + GIF, the natively
    * decoded raster containers): the m7b-style counted degrade bucket
    * for the real-pixel pipeline. One row per (png_class, decoded)
    * with payload counts, where the class comes from [[pngClass]]'s
    * header read (or [[GifCodec.gifClass]] for GIF bytes) and decoded
    * is whether a lossless decode actually produced pixels — the
    * number a corpus owner reads before trusting m4b/m4f/m4g/m4h
    * coverage: which storage classes rode the real path and which
    * were hashed through the md5 stub. Map-only classify+decode
    * (payload bytes never shuffle) + one card-sized aggregate. */
  def pngFormatCard(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val cls =
          if (GifCodec.isGif(r.payload)) GifCodec.gifClass(r.payload)
          else pngClass(r.payload)
        val dec = PngCodec.decodeGray(r.payload)
          .orElse(GifCodec.decodeGray(r.payload)).isDefined
        (cls, dec)
      }
    }.toDF("png_class", "decoded")
      .groupBy("png_class", "decoded")
      .agg(count(lit(1)).cast("long").as("n"))
  }

  /** All-JPEG fixture with REAL pixel data for the end-to-end JPEG
    * path (m4c): each residue group `doc_id % 239` paints one image
    * whose 9×8 dHash cells are CONSTANT plateaus at 12 + 3·perm(cell)
    * (perm a group-seeded Fisher–Yates permutation of 0..71, so
    * adjacent cell means differ by ≥ 3), encoded through
    * [[JpegCodec.encodeGray]] with an all-1s quantization table. JPEG
    * is lossy, which is exactly why the plateau design matters: the
    * near-lossless round trip perturbs each cell mean by well under 1,
    * so the ≥3 gaps keep every gradient bit stable, while odd doc_ids
    * invert cell (0,1) to 255−v — a real one-cell luminance edit that
    * moves at most the 2 dHash bits comparing it. Cross-group
    * permutations put hashes ~32 bits apart, so — as with m4b/m5 — the
    * PAIR SET is closed-form from doc_id arithmetic and a SQL oracle
    * can gate a genuine huffman→dequant→IDCT pipeline. Dimensions are
    * exact cell multiples (w = 9·ws, h = 8·hs) so the area-resize
    * reads back the painted plateaus.
    *
    * `group` keys which docs share an image (default: the catalog's
    * residue fixture). The ScalingProbe passes a DIV-family instead so
    * family COUNT scales with the corpus while family SIZE stays
    * constant — the dedup-honest replication a residue key can't give
    * (its family sizes grow with the corpus and the pair count grows
    * quadratically, measuring the fixture instead of the engine). */
  def syntheticJpegImages(docs: DataFrame,
      group: Long => Long = _ % 239): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    spreadIds(docs).as[Long].map { id =>
      val g = group(id)
      val ws = (4 + (g * 37) % 12).toInt
      val hs = (4 + (g * 53) % 12).toInt
      val w = 9 * ws; val h = 8 * hs
      val rnd = new java.util.Random(g * 2654435761L + 29)
      val perm = Array.tabulate(72)(identity)
      var i = perm.length - 1
      while (i > 0) { // Fisher–Yates, group-seeded
        val j = rnd.nextInt(i + 1)
        val t = perm(i); perm(i) = perm(j); perm(j) = t
        i -= 1
      }
      val cell = perm.map(p => 12 + 3 * p)
      if (id % 2 == 1) cell(1) = 255 - cell(1) // invert cell (0,1)
      val gray = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          gray(y * w + x) = cell((y / hs) * 9 + x / ws)
          x += 1
        }
        y += 1
      }
      MediaRow(id, JpegCodec.encodeGray(w, h, gray), "image/jpeg")
    }
  }

  /** EXIF orientation (tag 0x0112) from a JPEG's APP1 Exif segment —
    * the metadata that makes plain perceptual hashing miss real dups:
    * a photo stored rotated with the flag set displays identically to
    * its upright twin but permutes every dHash cell. Walks the marker
    * segments from SOI to the first APP1 whose payload starts
    * "Exif\0\0", then the TIFF IFD0 entries under either byte order
    * (II little / MM big). Returns 1..8; missing, malformed, or
    * truncated metadata degrades to 1 (upright) — orientation is a
    * HINT, never a reason to drop or kill a payload. */
  private[graft] def exifOrientation(b: Array[Byte]): Int = {
    val raw = exifOrientationRaw(b)
    if (raw >= 1) raw else 1
  }

  /** [[exifOrientation]]'s underlying walk with the degrade REASON kept
    * (the m7c coverage axis): 1..8 = a well-formed APP1 orientation;
    * 0 = no usable orientation present (no APP1-Exif segment, or a
    * well-formed IFD0 without the tag); -1 = an APP1-Exif segment IS
    * present but its TIFF structure or tag encoding is malformed — the
    * counted degrade a corpus owner wants separated from true
    * uprights. */
  private[graft] def exifOrientationRaw(b: Array[Byte]): Int = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return 0
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return 0
      val m = b(i + 1) & 0xff
      if (m == 0xff) i += 1 // fill byte
      else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) i += 2
      else if (m == 0xd9 || m == 0xda) return 0 // EOI / scan: no APP1
      else {
        val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
        if (len < 2 || i + 2 + len > b.length) return 0
        if (m == 0xe1 && len >= 2 + 6 + 8 + 2 + 12 + 4 &&
          b(i + 4) == 'E' && b(i + 5) == 'x' && b(i + 6) == 'i' &&
          b(i + 7) == 'f' && b(i + 8) == 0 && b(i + 9) == 0) {
          val t = i + 10 // TIFF header
          val end = i + 2 + len
          val le = b(t) == 'I' && b(t + 1) == 'I'
          if (!le && !(b(t) == 'M' && b(t + 1) == 'M')) return -1
          def u16(p: Int): Int =
            if (le) (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
            else ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
          def u32(p: Int): Long =
            if (le) (u16(p) & 0xffffL) | ((u16(p + 2) & 0xffffL) << 16)
            else ((u16(p) & 0xffffL) << 16) | (u16(p + 2) & 0xffffL)
          if (u16(t + 2) != 42) return -1
          val ifd = u32(t + 4)
          if (ifd < 8 || ifd > end - t - 2L) return -1
          val ip = t + ifd.toInt
          val n = u16(ip)
          var e = 0
          while (e < n) {
            val ep = ip + 2 + 12 * e
            if (ep + 12 > end) return -1
            if (u16(ep) == 0x0112) {
              // SHORT (type 3), count 1: value lives inline
              if (u16(ep + 2) != 3 || u32(ep + 4) != 1L) return -1
              val v = u16(ep + 8)
              return if (v >= 1 && v <= 8) v else -1
            }
            e += 1
          }
          return 0 // IFD0 well-formed, no orientation tag
        }
        i += 2 + len
      }
    }
    0
  }

  /** Store an upright raster in EXIF orientation `o`'s stored form —
    * the fixture half of the pair; [[orientNormalize]] is the exact
    * inverse (property-pinned for all 8). Orientations 5–8 swap the
    * stored dims. */
  private[graft] def orientStore(uw: Int, uh: Int, u: Array[Int],
      o: Int): (Int, Int, Array[Int]) = {
    val swap = o >= 5
    val sw = if (swap) uh else uw
    val sh = if (swap) uw else uh
    val s = new Array[Int](sw * sh)
    var y = 0
    while (y < uh) {
      var x = 0
      while (x < uw) {
        val (sx, sy) = storedPos(sw, sh, x, y, o)
        s(sy * sw + sx) = u(y * uw + x)
        x += 1
      }
      y += 1
    }
    (sw, sh, s)
  }

  /** Normalize a stored raster to upright per its EXIF orientation —
    * the viewer transform (TIFF 6.0 orientation semantics: 2 mirror-H,
    * 3 rot-180, 4 mirror-V, 5 transpose, 6 rot-90-CW-to-display,
    * 7 transverse, 8 rot-270-CW-to-display). Unknown o degrades to
    * identity. */
  private[graft] def orientNormalize(sw: Int, sh: Int, s: Array[Int],
      o: Int): (Int, Int, Array[Int]) = {
    if (o <= 1 || o > 8) return (sw, sh, s)
    val swap = o >= 5
    val uw = if (swap) sh else sw
    val uh = if (swap) sw else sh
    val u = new Array[Int](uw * uh)
    var y = 0
    while (y < uh) {
      var x = 0
      while (x < uw) {
        val (sx, sy) = storedPos(sw, sh, x, y, o)
        u(y * uw + x) = s(sy * sw + sx)
        x += 1
      }
      y += 1
    }
    (uw, uh, u)
  }

  /** Stored-raster position of upright pixel (x, y) under EXIF
    * orientation o, given stored dims (sw, sh). */
  private def storedPos(sw: Int, sh: Int, x: Int, y: Int, o: Int): (Int, Int) =
    o match {
      case 2 => (sw - 1 - x, y)
      case 3 => (sw - 1 - x, sh - 1 - y)
      case 4 => (x, sh - 1 - y)
      case 5 => (y, x)
      case 6 => (y, sh - 1 - x)
      case 7 => (sw - 1 - y, sh - 1 - x)
      case 8 => (sw - 1 - y, x)
      case _ => (x, y)
    }

  /** Splice a minimal APP1 Exif segment (TIFF header + one-entry IFD0
    * carrying orientation `o`) right after SOI — the fixture encoder
    * for the EXIF-aware dedup path, in either byte order. */
  private[graft] def withExifOrientation(jpeg: Array[Byte], o: Int,
      bigEndian: Boolean = false): Array[Byte] = {
    require(o >= 1 && o <= 8, s"orientation must be 1..8, got $o")
    val seg = new Array[Byte](2 + 2 + 6 + 26) // FF E1 len Exif00 TIFF
    def p16(at: Int, v: Int, be: Boolean): Unit = {
      if (be) { seg(at) = (v >> 8).toByte; seg(at + 1) = v.toByte }
      else { seg(at) = v.toByte; seg(at + 1) = (v >> 8).toByte }
    }
    seg(0) = 0xff.toByte; seg(1) = 0xe1.toByte
    p16(2, seg.length - 2, be = true) // segment length is always BE
    "Exif".getBytes.copyToArray(seg, 4) // then two NUL pad bytes
    val t = 10
    val mark = if (bigEndian) 'M' else 'I'
    seg(t) = mark.toByte; seg(t + 1) = mark.toByte
    p16(t + 2, 42, bigEndian)
    // IFD0 offset 8 as a full u32 in the chosen order
    if (bigEndian) p16(t + 6, 8, be = true) else p16(t + 4, 8, be = false)
    p16(t + 8, 1, bigEndian) // one entry
    p16(t + 10, 0x0112, bigEndian); p16(t + 12, 3, bigEndian) // tag, SHORT
    if (bigEndian) p16(t + 16, 1, bigEndian) else p16(t + 14, 1, bigEndian) // count 1 (u32)
    p16(t + 18, o, bigEndian) // value in the first 2 of 4 bytes
    // trailing next-IFD offset (4 bytes) stays 0
    val out = new Array[Byte](jpeg.length + seg.length)
    out(0) = jpeg(0); out(1) = jpeg(1)
    seg.copyToArray(out, 2)
    System.arraycopy(jpeg, 2, out, 2 + seg.length, jpeg.length - 2)
    out
  }

  /** m4d — EXIF-orientation-normalized perceptual hash: decode JPEG
    * luma, read the APP1 orientation, [[orientNormalize]] to upright,
    * THEN dHash. Plain [[imageDHash]] misses the commonest real-world
    * near-dup — the same photo stored rotated with the flag set
    * (phones do this on every portrait shot) — because rotation
    * permutes every hash cell. Same map-only scale shape as m4/m4c:
    * decode + normalize ride mapPartitions, payloads never shuffle. */
  def imageDHashOriented(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        JpegCodec.decodeGray(r.payload) match {
          case Some((w, h, px)) =>
            val (uw, uh, u) = orientNormalize(w, h, px, exifOrientation(r.payload))
            if (uw >= 9 && uh >= 8) Some((r.doc_id, PngCodec.dHashPixels(uw, uh, u)))
            else None
          case None => None
        }
      }
    }.toDF("doc_id", "phash")
  }

  /** m4d fixture — every member of residue group `doc_id % 241` is the
    * SAME upright plateau raster (the m4c cell construction) stored
    * under its own EXIF orientation `1 + (doc_id DIV 241) % 8` via
    * [[orientStore]] + [[withExifOrientation]] (byte order alternating
    * II/MM by member parity), with odd doc_ids inverting cell (0,1)
    * BEFORE storing (≤2 dHash bits — inside the gate). Only
    * orientation NORMALIZATION makes in-group pairs collide: a rotated
    * member's un-normalized hash permutes every cell (~32 bits away),
    * so the closed-form oracle (same group = pair) passes iff the
    * APP1 parse, the 8-way inverse transforms, and the decode all
    * compose correctly on real bytes. */
  def syntheticJpegExifImages(docs: DataFrame,
      group: Long => Long = _ % 241,
      member: Long => Long = _ / 241): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    spreadIds(docs).as[Long].map { id =>
      val g = group(id)
      val ws = (4 + (g * 37) % 12).toInt
      val hs = (4 + (g * 53) % 12).toInt
      val w = 9 * ws; val h = 8 * hs
      val rnd = new java.util.Random(g * 2654435761L + 41)
      val perm = Array.tabulate(72)(identity)
      var i = perm.length - 1
      while (i > 0) { // Fisher–Yates, group-seeded
        val j = rnd.nextInt(i + 1)
        val t = perm(i); perm(i) = perm(j); perm(j) = t
        i -= 1
      }
      val cell = perm.map(p => 12 + 3 * p)
      if (id % 2 == 1) cell(1) = 255 - cell(1) // invert cell (0,1)
      val gray = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          gray(y * w + x) = cell((y / hs) * 9 + x / ws)
          x += 1
        }
        y += 1
      }
      val mi = member(id)
      val o = (1 + mi % 8).toInt
      val (sw, sh, stored) = orientStore(w, h, gray, o)
      MediaRow(id, withExifOrientation(
        JpegCodec.encodeGray(sw, sh, stored), o, bigEndian = mi % 2 == 0),
        "image/jpeg")
    }
  }

  /** m4e fixture — [[syntheticJpegExifImages]] with every doc_id % 3
    * == 1 payload re-encoded as a REAL progressive (SOF2) stream with
    * its APP1 Exif segment RE-SPLICED (same orientation, same byte
    * order): the composition real phone photos increasingly ship —
    * progressive AND EXIF-rotated — and the one the m4d fixture
    * (baseline-only) couldn't exercise. The re-encode starts from the
    * STORED raster decode, so progressive decode + APP1 parse +
    * inverse orientation must all compose for the m4d closed form
    * (same residue group = pair) to survive the mix. */
  def syntheticJpegExifProgressiveMix(docs: DataFrame,
      group: Long => Long = _ % 241,
      member: Long => Long = _ / 241): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    syntheticJpegExifImages(docs, group, member).map { r =>
      if (r.doc_id % 3 != 1) r
      else {
        val (sw, sh, stored) = decodeFixtureGray(r)
        val mi = member(r.doc_id)
        val o = (1 + mi % 8).toInt
        r.copy(payload = withExifOrientation(
          JpegCodec.encodeGrayProgressive(sw, sh, stored), o,
          bigEndian = mi % 2 == 0))
      }
    }
  }

  /** m7c fixture — [[syntheticJpegExifImages]] stretched across the
    * orientation-coverage axes: doc_id % 5 == 3 members have their
    * APP1 segment STRIPPED (a clean no-metadata payload → 'missing'),
    * % 5 == 4 members keep the segment but with the TIFF magic
    * zeroed (metadata present but unparseable → 'malformed', the
    * counted degrade), % 5 == 2 members re-encode as REAL progressive
    * with the APP1 re-spliced (the phone-photo composition — must
    * still classify 'ok' AND decode), and the rest stay baseline+EXIF
    * ('ok'). The fixture's own splice layout makes strip/corrupt
    * byte-exact: [[withExifOrientation]] always emits a 36-byte APP1
    * at offset 2 (FF E1 + len + "Exif\0\0" + 26-byte TIFF), so the
    * segment occupies bytes [2, 38) and its TIFF magic bytes sit at
    * absolute offsets 14–15. */
  def syntheticJpegExifCoverageMix(docs: DataFrame,
      group: Long => Long = _ % 241,
      member: Long => Long = _ / 241): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    syntheticJpegExifImages(docs, group, member).map { r =>
      r.doc_id % 5 match {
        case 3 => // strip the spliced APP1: bytes [2, 38) out
          val p = r.payload
          val out = new Array[Byte](p.length - 36)
          out(0) = p(0); out(1) = p(1)
          System.arraycopy(p, 38, out, 2, p.length - 38)
          r.copy(payload = out)
        case 4 => // zero the TIFF byte-order-independent magic (42)
          val p = r.payload.clone()
          p(14) = 0; p(15) = 0
          r.copy(payload = p)
        case 2 =>
          val (sw, sh, stored) = decodeFixtureGray(r)
          val mi = member(r.doc_id)
          val o = (1 + mi % 8).toInt
          r.copy(payload = withExifOrientation(
            JpegCodec.encodeGrayProgressive(sw, sh, stored), o,
            bigEndian = mi % 2 == 0))
        case _ => r
      }
    }
  }

  /** m7c — EXIF orientation-coverage receipt (the m9-style card for
    * the m4d path): one row per (exif_class, orientation, decoded)
    * with payload counts, where exif_class separates true uprights
    * from silent degrades — 'ok' (well-formed APP1 orientation 1..8),
    * 'missing' (no usable orientation), 'malformed' (APP1 present,
    * TIFF unparseable — [[exifOrientationRaw]] < 0, the class
    * [[imageDHashOriented]] silently normalizes as upright) — and
    * decoded is a REAL [[JpegCodec.decodeGray]] attempt. The number a
    * corpus owner reads before trusting m4d's oriented dedup coverage:
    * how much of the corpus carried a usable flag, and how much was
    * hashed upright because its metadata was broken. Map-only
    * classify+decode (payloads never shuffle) + one card-sized agg. */
  def jpegOrientationCard(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val raw = exifOrientationRaw(r.payload)
        val cls = if (raw >= 1) "ok" else if (raw == 0) "missing" else "malformed"
        val o = (if (raw >= 1) raw else 1).toLong
        (cls, o, JpegCodec.decodeGray(r.payload).isDefined)
      }
    }.toDF("exif_class", "orientation", "decoded")
      .groupBy("exif_class", "orientation", "decoded")
      .agg(count(lit(1)).cast("long").as("n"))
  }

  /** [[syntheticJpegImages]] with every doc_id % 3 == 1 payload
    * re-encoded as a REAL progressive (SOF2) stream — the m4c fixture
    * upgrade that makes the dedup oracle gate the progressive decoder
    * end-to-end. The successive-approximation script delivers every
    * coefficient bit, so the progressive re-encode decodes to pixels
    * IDENTICAL to the baseline payload's decode and the dHash — hence
    * the residue-group pair set the SQL oracle predicts — is unchanged;
    * a pair whose members mix SOF0 and SOF2 payloads only matches if
    * BOTH decode paths produce the same luma raster. */
  def syntheticJpegProgressiveMix(docs: DataFrame,
      group: Long => Long = _ % 239): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    syntheticJpegImages(docs, group).map { r =>
      if (r.doc_id % 3 != 1) r
      else {
        val (w, h, px) = decodeFixtureGray(r)
        r.copy(payload = JpegCodec.encodeGrayProgressive(w, h, px))
      }
    }
  }

  /** Decode a fixture-generated baseline payload, failing LOUDLY on the
    * impossible: fixture generators may assume their own encoder's
    * output decodes (tests pin it), but a bare `.get` would surface a
    * future encoder regression as a NoSuchElementException killing the
    * task — the exact failure mode the degrade-never-kill contract
    * exists to avoid, and far harder to diagnose than a named error. */
  private def decodeFixtureGray(r: MediaRow): (Int, Int, Array[Int]) =
    JpegCodec.decodeGray(r.payload).getOrElse(throw new IllegalStateException(
      s"fixture invariant violated: synthetic baseline JPEG for doc_id=" +
        s"${r.doc_id} failed to decode — the fixture encoder regressed"))

  /** First-SOF classifier for JPEG payloads — the coverage axis of the
    * m7b receipt. Walks the marker stream from SOI the same way
    * [[JpegCodec.decodeGray]]'s header loop does (0xFF fill bytes
    * skipped, length-delimited segments stepped over) and buckets the
    * FIRST SOFn marker: baseline/extended (the codec's decodable
    * scope), progressive, arithmetic, lossless, differential — or
    * 'none' when EOI/SOS/corruption arrives before any frame header.
    * Real web corpora are ~10–20% progressive, so a release manifest
    * must count WHY payloads degraded per SOF family, not just that
    * some did. */
  private[graft] def jpegSofClass(b: Array[Byte]): String = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return "none"
    var i = 2
    while (i + 1 < b.length) {
      if ((b(i) & 0xff) != 0xff) return "none"
      var j = i // T.81 B.1.1.2: any number of 0xFF fill bytes precede a marker
      while (j + 1 < b.length && (b(j + 1) & 0xff) == 0xff) j += 1
      if (j + 1 >= b.length) return "none"
      val marker = b(j + 1) & 0xff
      if (marker == 0xd9 || marker == 0xda) return "none" // EOI / scan before SOF
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) i = j + 2
      else {
        if (j + 3 >= b.length) return "none"
        val len = ((b(j + 2) & 0xff) << 8) | (b(j + 3) & 0xff)
        if (len < 2 || j + 2 + len > b.length) return "none"
        marker match {
          case 0xc0 => return "sof0_baseline"
          case 0xc1 => return "sof1_extended"
          case 0xc2 =>
            // a conforming progressive frame past the coefficient-buffer
            // cap degrades for SIZE, not corruption — a distinct bucket,
            // so the card's "why payloads degraded" story stays honest
            // (dims sit at fixed offsets in the SOF segment: P, H16, W16)
            if (len >= 2 + 5) {
              val fh = ((b(j + 5) & 0xff) << 8) | (b(j + 6) & 0xff)
              val fw = ((b(j + 7) & 0xff) << 8) | (b(j + 8) & 0xff)
              if (fw.toLong * fh.toLong > JpegCodec.ProgressivePixelCap)
                return "sof2_progressive_oversize"
            }
            return "sof2_progressive"
          case 0xc9 | 0xca | 0xcd | 0xce => return "sof_arithmetic"
          case 0xc3 | 0xc7 | 0xcb | 0xcf => return "sof_lossless"
          case 0xc5 | 0xc6 => return "sof_differential"
          case _ => i = j + 2 + len
        }
      }
    }
    "none"
  }

  /** m7b — per-SOF decode-coverage card: the m9-style counted degrade
    * bucket for the JPEG real-pixel pipeline. One row per
    * (sof_class, decoded) with payload counts, where sof_class comes
    * from [[jpegSofClass]]'s REAL marker walk and decoded is whether
    * [[JpegCodec.decodeGray]] actually produced pixels. dp13's
    * manifest says THAT payloads degraded; this card says WHY (which
    * SOF family) and HOW MANY — the number a corpus owner reads
    * before trusting m4c's real-pixel dedup coverage on a web corpus.
    * Map-only classify+decode (payload bytes never shuffle) + one
    * card-sized aggregate. */
  def jpegSofCard(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        (jpegSofClass(r.payload), JpegCodec.decodeGray(r.payload).isDefined)
      }
    }.toDF("sof_class", "decoded")
      .groupBy("sof_class", "decoded")
      .agg(count(lit(1)).cast("long").as("n"))
  }

  /** m7b fixture — [[syntheticJpegImages]] with a deterministic SOF
    * mix covering BOTH directions of progressive coverage:
    * doc_id % 7 == 1 re-encodes the payload as a REAL progressive
    * (SOF2) stream — decode the baseline raster, re-emit it through
    * [[JpegCodec.encodeGrayProgressive]]'s successive-approximation
    * script, or for the % 14 == 1 half through
    * [[JpegCodec.encodeYccProgressive]] as COLOR 4:2:0 progressive
    * (interleaved DC MCUs + mid-frame chroma scans stepped over) —
    * which the codec must genuinely decode (scan-by-scan
    * coefficient assembly, not a header trick); % 7 == 3 re-marks the
    * SOF0 header byte as SOF2 while leaving the baseline entropy
    * stream in place, a corrupt stream whose sequential scan header
    * (Ss=0, Se=63) is illegal in a progressive frame and must take
    * the counted degrade path (None, never a kill or a garbage
    * decode); % 7 == 5 re-marks as SOF9 (arithmetic sequential), a
    * family the codec never decodes. The card therefore shows
    * 'sof2_progressive' in BOTH decoded buckets — true for conforming
    * streams, false for corrupt ones — which is exactly the coverage
    * split a corpus owner needs before trusting m4c's real-pixel
    * dedup on a web corpus. Untouched baseline payloads must all
    * actually decode. */
  def syntheticJpegSofMix(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    syntheticJpegImages(docs).map { r =>
      val mk = r.doc_id % 7 match {
        case 3 => 0xc2
        case 5 => 0xc9
        case _ => 0
      }
      if (r.doc_id % 7 == 1) {
        val (w, h, px) = decodeFixtureGray(r)
        // alternate grayscale and COLOR 4:2:0 progressive re-encodes:
        // the color half forces the decoder through interleaved
        // progressive DC MCUs and mid-frame chroma-scan step-over,
        // with doc-seeded flat chroma planes (luma output unaffected)
        if (r.doc_id % 14 == 1) {
          val cw = (w + 1) / 2; val ch = (h + 1) / 2
          val cb = Array.fill(cw * ch)((r.doc_id % 256).toInt)
          val cr = Array.fill(cw * ch)(((r.doc_id * 31) % 256).toInt)
          r.copy(payload = JpegCodec.encodeYccProgressive(
            w, h, px, cb, cr, lumaSampling = (2, 2)))
        } else r.copy(payload = JpegCodec.encodeGrayProgressive(w, h, px))
      } else if (mk == 0) r
      else {
        val p = r.payload.clone()
        var i = 2 // after SOI; every header segment here is FF marker len
        var done = false
        while (!done && i + 3 < p.length) {
          if ((p(i) & 0xff) != 0xff) done = true
          else if ((p(i + 1) & 0xff) == 0xc0) { p(i + 1) = mk.toByte; done = true }
          else i += 2 + (((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff))
        }
        r.copy(payload = p)
      }
    }
  }

  /** Full WAV container (16-bit PCM, little-endian, interleaved
    * channels) — the fixture encoder for the real audio path, the
    * [[graft.operators.PngCodec.encodeGray]] move for sound. */
  private[graft] def wavBytesPcm(sampleRate: Int, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val byteRate = sampleRate * channels * 2
    out.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(byteRate).putShort((channels * 2).toShort).putShort(16)
      .put("data".getBytes).putInt(dataLen)
    var i = 0
    while (i < samples.length) { out.putShort(samples(i)); i += 1 }
    out.array()
  }

  /** [[wavBytesPcm]] under a WAVE_FORMAT_EXTENSIBLE header (fmt
    * 0xFFFE, 40-byte fmt chunk: cbSize 22, wValidBits 16, channel
    * mask, KSDATAFORMAT_SUBTYPE_PCM GUID) — the header modern
    * multichannel and pro-audio WAVs actually ship; same samples, so
    * decode must be header-blind. */
  private[graft] def wavBytesPcmExtensible(sampleRate: Int, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(68 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val byteRate = sampleRate * channels * 2
    out.put("RIFF".getBytes).putInt(60 + dataLen).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(40)
      .putShort(0xFFFE.toShort).putShort(channels.toShort).putInt(sampleRate)
      .putInt(byteRate).putShort((channels * 2).toShort).putShort(16)
      .putShort(22) // cbSize
      .putShort(16) // wValidBitsPerSample
      .putInt(if (channels == 2) 3 else 4) // dwChannelMask (FL|FR / FC)
      .putShort(1) // GUID bytes 0-1: the wrapped classic tag (PCM)
      .put(KsGuidTail) // GUID bytes 2-15: the KSDATAFORMAT base
    out.put("data".getBytes).putInt(dataLen)
    var i = 0
    while (i < samples.length) { out.putShort(samples(i)); i += 1 }
    out.array()
  }

  /** All-WAV media fixture with REAL PCM for the audio-dedup entry
    * (m5): each residue group `doc_id % 97` is one clip of group-seeded
    * noise (java.util.Random — the JLS-specified LCG, so samples are
    * platform-deterministic), 65 windows × 64 frames, (sample_rate,
    * channels) from group arithmetic. Odd doc_ids halve window 1's
    * samples — a real one-window loudness edit that moves exactly one
    * frame energy and therefore at most the 2 gradient bits comparing
    * it: in-group pairs stay within any Hamming gate ≥ 2 while
    * cross-group iid noise puts fingerprints ~32 bits apart. As with
    * the PNG twin ([[syntheticPixelImages]]), the PAIR SET is
    * predictable from doc_id arithmetic alone, which is what lets a SQL
    * oracle gate a genuine decode → energy → fingerprint pipeline.
    * `group` keys clip families (see [[syntheticJpegImages]] — the
    * ScalingProbe's dedup-honest DIV-family hook). */
  def syntheticAudio(docs: DataFrame,
      group: Long => Long = _ % 97): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    spreadIds(docs).as[Long].map { id =>
      val (rate, ch, pcm) = noiseClipSamples(id, group(id))
      MediaRow(id, wavBytesPcm(rate, ch, pcm), "audio/wav")
    }
  }

  /** The group-seeded noise-clip generator [[syntheticAudio]] has
    * always encoded, factored out so storage fixtures share the exact
    * SAMPLES: (sample rate, channels, interleaved s16; odd ids halve
    * window 1 — the one-window loudness edit whose closed form the
    * m5-family oracles state). */
  private[graft] def noiseClipSamples(id: Long, g: Long): (Int, Int, Array[Short]) = {
    val ch = (1 + g % 2).toInt
    val winFrames = 64
    val rnd = new java.util.Random(g * 2654435761L + 17)
    val pcm = Array.fill(65 * winFrames * ch)((rnd.nextInt(2048) - 1024).toShort)
    if (id % 2 == 1) {
      var i = winFrames * ch // window 1's frames, all channels
      while (i < 2 * winFrames * ch) { pcm(i) = (pcm(i) / 2).toShort; i += 1 }
    }
    ((8000 + (g * 441) % 40000).toInt, ch, pcm)
  }

  /** Storage-class classifier for audio payloads — the coverage axis
    * of the m7e receipt, [[pngClass]]'s move for the audio family.
    * Reads the container magic and the fmt tag the decoders themselves
    * gate on (extensible headers resolve through the GUID, `_ext`
    * suffixed): `pcm16` / `pcm16_ext` / `mulaw` / `alaw` / `ima_adpcm`
    * / `flac`, `wav_other` for unhandled tags, `not_audio` otherwise. */
  private[graft] def audioClass(b: Array[Byte]): String = {
    if (b.length >= 4 && b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C')
      return "flac"
    if (b.length < 12 || !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') ||
      !(b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return "not_audio"
    var i = 12
    while (i + 8 <= b.length) {
      val size = leU32(b, i + 4)
      if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' ') {
        if (size < 16 || i + 8 + 16 > b.length) return "not_audio"
        val ext = leU16(b, i + 8) == 0xFFFE
        val suffix = if (ext) "_ext" else ""
        return wavEffectiveFmt(b, i, size) match {
          case 1 if leU16(b, i + 22) == 16 => s"pcm16$suffix"
          case 7 => s"mulaw$suffix"
          case 6 => s"alaw$suffix"
          case 0x11 => s"ima_adpcm$suffix"
          case _ => "wav_other"
        }
      }
      val next = i.toLong + 8L + size + (size & 1L)
      if (next <= i || next > b.length.toLong) return "not_audio"
      i = next.toInt
    }
    "not_audio"
  }

  /** m7e fixture — [[syntheticAudio]] stretched across the audio
    * coverage axes the way [[syntheticPngCoverageMix]] stretches PNG:
    * doc_id % 7 == 1 re-stores under an EXTENSIBLE PCM header, % 7 ==
    * 2 FLAC-compressed, % 7 == 3 as µ-law (real companded codes), % 7
    * == 4 as A-law, % 7 == 5 as mono IMA-ADPCM blocks, % 7 == 6
    * TRUNCATES the stream mid-data (classifies, must fail decode
    * cleanly — the counted degrade row); the rest stay classic 16-bit
    * PCM and must all decode. */
  def syntheticAudioCoverageMix(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    spreadIds(docs).as[Long].map { id =>
      val g = id % 97
      val (rate, ch, pcm) = noiseClipSamples(id, g)
      def mono: Array[Short] =
        Array.tabulate(pcm.length / ch)(f => pcm(f * ch)) // channel 0
      val payload = id % 7 match {
        case 1 => wavBytesPcmExtensible(rate, ch, pcm)
        case 2 => FlacCodec.encodeVerbatim(rate, ch, pcm)
        case 3 => wavBytesG711(8000, mono.map(s => G711.mulawEncode(s.toInt).toByte), mulaw = true)
        case 4 => wavBytesG711(8000, mono.map(s => G711.alawEncode(s.toInt).toByte), mulaw = false)
        case 5 => wavBytesImaAdpcm(8000, ImaAdpcm.encodeBlocksMono(mono, 129), 129)
        case 6 =>
          val full = wavBytesPcm(rate, ch, pcm)
          java.util.Arrays.copyOf(full, 44 + 40) // data cut far short of one window
        case _ => wavBytesPcm(rate, ch, pcm)
      }
      MediaRow(id, payload, "audio/wav")
    }
  }

  /** m7e — audio storage-coverage card: per (audio_class, decoded)
    * counts, where audio_class comes from [[audioClass]]'s header read
    * and decoded is whether [[pcmEnergiesAny]] actually produced
    * window energies — the number a corpus owner reads before trusting
    * m5/m5c/m5d/m5e coverage: which storage classes rode the real
    * decode path and how many degraded. Map-only classify+decode
    * (payloads never shuffle) + one card-sized aggregate. */
  def audioFormatCard(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map(r => (audioClass(r.payload), pcmEnergiesAny(r.payload, 65).isDefined))
    }.toDF("audio_class", "decoded")
      .groupBy("audio_class", "decoded")
      .agg(count(lit(1)).cast("long").as("n"))
  }

  /** m5c fixture — the m5 clip corpus under MIXED real-world storage:
    * every third doc_id stores its clip FLAC-compressed
    * ([[FlacCodec.encodeVerbatim]] — real stream structure, verified
    * CRCs) instead of raw WAV, with the SAMPLES identical by
    * construction ([[noiseClipSamples]]). FLAC is lossless, so the
    * decoded s16 stream is bit-equal and every integer fingerprint
    * downstream is EQUAL across storage — m5's closed-form pair oracle
    * carries over verbatim, and a mixed WAV↔FLAC pair only collides
    * if the whole FLAC decode (frame headers, CRCs, subframes, rice
    * residuals) composes with the shared energy fingerprint. */
  /** [[syntheticAudio]] with every third clip under a
    * WAVE_FORMAT_EXTENSIBLE header — the m5e fixture: same samples,
    * same energies, so the m5 closed-form pair oracle carries over
    * verbatim; a pair whose members mix header layouts only collides
    * if the GUID resolution genuinely reads the wrapped PCM tag. */
  def syntheticExtensibleAudio(docs: DataFrame,
      group: Long => Long = _ % 97): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    spreadIds(docs).as[Long].map { id =>
      val (rate, ch, pcm) = noiseClipSamples(id, group(id))
      if (id % 3 == 1)
        MediaRow(id, wavBytesPcmExtensible(rate, ch, pcm), "audio/wav")
      else MediaRow(id, wavBytesPcm(rate, ch, pcm), "audio/wav")
    }
  }

  def syntheticMixedStorageAudio(docs: DataFrame,
      group: Long => Long = _ % 97): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    spreadIds(docs).as[Long].map { id =>
      val (rate, ch, pcm) = noiseClipSamples(id, group(id))
      if (id % 3 == 1)
        MediaRow(id, FlacCodec.encodeVerbatim(rate, ch, pcm), "audio/flac")
      else MediaRow(id, wavBytesPcm(rate, ch, pcm), "audio/wav")
    }
  }

  /** WAV container for G.711 code bytes (fmt 7 = µ-law, 6 = A-law,
    * 8 bits/sample, mono) — the legacy-telephony fixture encoder. */
  private[graft] def wavBytesG711(rate: Int, codes: Array[Byte],
      mulaw: Boolean): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(46 + codes.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // non-PCM fmt chunks carry cbSize (0 here): size 18
    out.put("RIFF".getBytes).putInt(38 + codes.length).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(18)
      .putShort(if (mulaw) 7 else 6).putShort(1).putInt(rate)
      .putInt(rate).putShort(1).putShort(8).putShort(0)
      .put("data".getBytes).putInt(codes.length)
      .put(codes)
    out.array()
  }

  /** WAV container for mono IMA-ADPCM blocks (fmt 0x11, 4 bits/sample,
    * fmt extension carrying wSamplesPerBlock) — the legacy-archive
    * fixture encoder, byte-inverse of [[wavLegacyDecodeS16]]'s 0x11
    * arm. */
  private[graft] def wavBytesImaAdpcm(rate: Int, blocks: Array[Byte],
      samplesPerBlock: Int): Array[Byte] = {
    val ba = ImaAdpcm.blockAlign(samplesPerBlock)
    val out = java.nio.ByteBuffer.allocate(48 + blocks.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes).putInt(40 + blocks.length).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(20)
      .putShort(0x11).putShort(1).putInt(rate)
      .putInt((rate.toLong * ba / samplesPerBlock).toInt).putShort(ba.toShort)
      .putShort(4).putShort(2).putShort(samplesPerBlock.toShort)
      .put("data".getBytes).putInt(blocks.length)
      .put(blocks)
    out.array()
  }

  /** m5d fixture — the m5 clip corpus under LEGACY lossy storage
    * (µ-law / A-law / IMA-ADPCM WAV, the telephony and old-rip formats
    * the r14 verdict named): mono clips of group-seeded noise, 65
    * energy windows × 129 frames, group `doc_id % 97`, odd ids halving
    * window 1 — the m5 closed form verbatim. Each group compresses
    * through ONE legacy codec (group % 3: µ-law / A-law / IMA), and
    * the exactness that lets a SQL oracle gate a LOSSY pipeline is by
    * construction, not tolerance:
    *
    *   - members with doc_id % 3 == 1 store the CODED stream; all
    *     others store, as raw PCM, the exact decoded projection of
    *     that stream — so cross-storage twins decode to IDENTICAL s16
    *     samples and every integer fingerprint downstream is EQUAL.
    *   - G.711 is memoryless and idempotent (enc∘dec∘enc = enc, pinned
    *     exhaustively in G711Spec), so the projection is per-sample
    *     and the odd-id edit stays confined to window 1's samples.
    *   - IMA-ADPCM is stateful, so the fixture aligns one CODEC BLOCK
    *     per energy window (samplesPerBlock = winFrames = 129, block
    *     headers self-reset) — block-local decode state means the
    *     window-1 edit changes window 1's projection ONLY, keeping the
    *     in-group Hamming at ≤ 2 bits exactly like m5.
    *
    * A mixed PCM↔coded pair therefore only collides if the real
    * legacy decoder (table companding or nibble reconstruction + block
    * framing) composes with the shared energy fingerprint — which is
    * the m5c proof obligation extended to the lossy half of the WAV
    * world. */
  def syntheticLegacyAudio(docs: DataFrame,
      group: Long => Long = _ % 97,
      allPcm: Boolean = false): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val winFrames = 129
    spreadIds(docs).as[Long].map { id =>
      val g = group(id)
      val rate = 8000
      val rnd = new java.util.Random(g * 2654435761L + 23)
      val raw = Array.fill(65 * winFrames)((rnd.nextInt(2048) - 1024).toShort)
      if (id % 2 == 1) {
        var i = winFrames // window 1, mono
        while (i < 2 * winFrames) { raw(i) = (raw(i) / 2).toShort; i += 1 }
      }
      // allPcm stores EVERY member as PCM of its projection — the
      // storage-blindness control twin for the m8b admission pin
      val coded = !allPcm && id % 3 == 1
      val payload = g % 3 match {
        case 0 =>
          val codes = raw.map(s => G711.mulawEncode(s.toInt).toByte)
          if (coded) wavBytesG711(rate, codes, mulaw = true)
          else wavBytesPcm(rate, 1, codes.map(c => G711.mulawDecode(c & 0xff).toShort))
        case 1 =>
          val codes = raw.map(s => G711.alawEncode(s.toInt).toByte)
          if (coded) wavBytesG711(rate, codes, mulaw = false)
          else wavBytesPcm(rate, 1, codes.map(c => G711.alawDecode(c & 0xff).toShort))
        case _ =>
          val blocks = ImaAdpcm.encodeBlocksMono(raw, winFrames)
          if (coded) wavBytesImaAdpcm(rate, blocks, winFrames)
          else wavBytesPcm(rate, 1,
            ImaAdpcm.decodeBlocksMono(blocks, 0, 65, winFrames))
      }
      MediaRow(id, payload, "audio/wav")
    }
  }

  /** Decode a 16-bit PCM WAV payload to `nWin` frame energies — REAL
    * byte arithmetic, no codec needed (WAV is RIFF + raw samples):
    * RIFF walk to `fmt ` (must be PCM format 1, 16-bit) and `data`,
    * then energy_i = Σ s² over window i's frames across all channels
    * (windows split the clip evenly; a trailing remainder shorter than
    * one window is ignored, as any fixed-grid fingerprint does).
    * Returns None — degrade, never throw — for non-PCM/ non-16-bit
    * streams, truncated data, or clips shorter than `nWin` frames. */
  /** The KSDATAFORMAT GUID tail (bytes 2–15): every registered WAVE
    * subtype is the classic u16 format tag followed by this fixed
    * base, so WAVE_FORMAT_EXTENSIBLE resolves to its wrapped tag by
    * reading GUID bytes 0–1 once the tail verifies. */
  private val KsGuidTail = Array[Int](0, 0, 0, 0, 0x10, 0, 0x80, 0, 0, 0xAA,
    0, 0x38, 0x9B, 0x71).map(_.toByte)

  /** Resolve a fmt chunk's EFFECTIVE format tag: the tag itself, or —
    * for WAVE_FORMAT_EXTENSIBLE (0xFFFE, the header modern multichannel
    * and pro-audio WAVs actually ship) — the SubFormat GUID's wrapped
    * classic tag, provided the chunk carries the full 22-byte extension
    * and the GUID sits on the KSDATAFORMAT base. −1 = malformed
    * extensible header (degrade). `i` is the chunk's RIFF offset
    * (header included). */
  private def wavEffectiveFmt(b: Array[Byte], i: Int, size: Long): Int = {
    val tag = leU16(b, i + 8)
    if (tag != 0xFFFE) return tag
    // 16 base + cbSize u16 + wValidBits u16 + dwChannelMask u32 + GUID
    if (size < 40 || i + 8 + 40 > b.length) return -1
    if (leU16(b, i + 24) < 22) return -1 // cbSize must cover the extension
    val guid = i + 8 + 24
    var j = 0
    while (j < KsGuidTail.length) {
      if (b(guid + 2 + j) != KsGuidTail(j)) return -1
      j += 1
    }
    leU16(b, guid)
  }

  /** RIFF walk to the PCM payload: (channels, data offset, frame
    * count) for a 16-bit PCM WAV — classic fmt 1 or an extensible
    * header whose SubFormat wraps PCM — None otherwise; the shared
    * parse under [[wavPcmEnergies]] and [[wavPcmMono]]. */
  private def wavPcmLayout(b: Array[Byte]): Option[(Int, Int, Long)] = {
    if (b.length < 12 || !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F')) return None
    if (!(b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var fmtOk = false
    var channels = 0
    var dataOff = -1
    var dataLen = 0L
    var i = 12
    while (i + 8 <= b.length && !(fmtOk && dataOff >= 0)) {
      val size = leU32(b, i + 4) // u32 as Long: never negative
      if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' ') {
        if (size < 16 || i + 8 + 16 > b.length) return None
        if (wavEffectiveFmt(b, i, size) != 1 || leU16(b, i + 22) != 16)
          return None // PCM (direct or extensible-wrapped), 16-bit
        channels = leU16(b, i + 10)
        if (channels < 1) return None
        fmtOk = true
      } else if (b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' && b(i + 3) == 'a') {
        dataOff = i + 8
        dataLen = math.min(size, (b.length - dataOff).toLong)
      }
      val next = i.toLong + 8L + size + (size & 1L) // chunks are word-aligned
      if (next <= i || next > b.length.toLong) {
        if (fmtOk && dataOff >= 0) i = b.length else return None
      } else i = next.toInt
    }
    if (!fmtOk || dataOff < 0) return None
    Some((channels, dataOff, dataLen / (2L * channels)))
  }

  /** Channel-averaged mono samples of a 16-bit PCM WAV (doubles, one
    * per frame) — the spectral path's input. */
  private[graft] def wavPcmMono(b: Array[Byte]): Option[Array[Double]] =
    wavPcmLayout(b).map { case (channels, dataOff, framesL) =>
      val frames = framesL.toInt
      val mono = new Array[Double](frames)
      var f = 0
      while (f < frames) {
        var acc = 0.0
        var c = 0
        while (c < channels) {
          val s = dataOff + (f * channels + c) * 2
          acc += ((b(s + 1) << 8) | (b(s) & 0xff)).toDouble // s16 LE
          c += 1
        }
        mono(f) = acc / channels
        f += 1
      }
      mono
    }

  private[graft] def wavPcmEnergies(b: Array[Byte], nWin: Int): Option[Array[Long]] = {
    val (channels, dataOff, frames) = wavPcmLayout(b) match {
      case Some(l) => l
      case None => return None
    }
    if (frames < nWin) return None
    val winFrames = (frames / nWin).toInt
    val e = new Array[Long](nWin)
    var w = 0
    while (w < nWin) {
      var acc = 0L
      var s = dataOff + w * winFrames * channels * 2
      val end = s + winFrames * channels * 2
      while (s < end) {
        val v = ((b(s + 1) << 8) | (b(s) & 0xff)).toLong // s16 LE
        acc += v * v
        s += 2
      }
      e(w) = acc
      w += 1
    }
    Some(e)
  }

  /** RIFF walk + decode for the LEGACY WAV codecs (r15): µ-law (fmt 7),
    * A-law (fmt 6), IMA ADPCM (fmt 0x11, mono) — the one-byte- and
    * four-bit-per-sample formats telephony dumps and old rips arrive
    * in, which previously took the header-stub degrade path. Returns
    * (rate, channels, interleaved s16) like [[FlacCodec.decodeS16]];
    * None — degrade, never throw — for any other format tag, malformed
    * block geometry, or truncation. Decoded output is bounded by
    * construction (≤ 2 samples per payload byte), so no crafted header
    * can amplify. */
  private[graft] def wavLegacyDecodeS16(b: Array[Byte]): Option[(Int, Int, Array[Short])] = {
    if (b.length < 12 || !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F')) return None
    if (!(b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var fmt = -1; var channels = 0; var rate = 0; var blockAlign = 0
    var bits = 0; var spb = 0
    var dataOff = -1; var dataLen = 0L
    var i = 12
    while (i + 8 <= b.length && !(fmt >= 0 && dataOff >= 0)) {
      val size = leU32(b, i + 4)
      if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' ') {
        if (size < 16 || i + 8 + 16 > b.length) return None
        fmt = wavEffectiveFmt(b, i, size) // extensible headers resolve to the wrapped tag
        channels = leU16(b, i + 10)
        rate = leU32(b, i + 12).toInt
        blockAlign = leU16(b, i + 20)
        bits = leU16(b, i + 22)
        // wSamplesPerBlock: the classic IMA extension's field at +26,
        // which in WAVE_FORMAT_EXTENSIBLE is the SAME offset — the
        // Samples union (wValidBitsPerSample / wSamplesPerBlock) sits
        // right after cbSize, ahead of the channel mask and GUID — so
        // one read covers both layouts (the union member only matters
        // on the 0x11 branch below)
        if (size >= 20 && i + 8 + 20 <= b.length) spb = leU16(b, i + 26)
      } else if (b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' && b(i + 3) == 'a') {
        dataOff = i + 8
        dataLen = math.min(size, (b.length - dataOff).toLong)
      }
      val next = i.toLong + 8L + size + (size & 1L)
      if (next <= i || next > b.length.toLong) {
        if (fmt >= 0 && dataOff >= 0) i = b.length else return None
      } else i = next.toInt
    }
    if (dataOff < 0 || channels < 1 || rate < 1) return None
    fmt match {
      case 6 | 7 => // G.711: one code byte per sample, any channel count
        if (bits != 8 || dataLen < 1) return None
        val n = dataLen.toInt
        val out = new Array[Short](n)
        var j = 0
        if (fmt == 7) while (j < n) { out(j) = G711.mulawDecode(b(dataOff + j) & 0xff).toShort; j += 1 }
        else while (j < n) { out(j) = G711.alawDecode(b(dataOff + j) & 0xff).toShort; j += 1 }
        Some((rate, channels, out))
      case 0x11 => // IMA ADPCM, mono scope (telephony's shape)
        if (bits != 4 || channels != 1 || blockAlign < 5) return None
        val samplesPerBlock =
          if (spb >= 3 && spb % 2 == 1) spb else (blockAlign - 4) * 2 + 1
        if (ImaAdpcm.blockAlign(samplesPerBlock) != blockAlign) return None
        val nBlocks = (dataLen / blockAlign).toInt
        if (nBlocks < 1) return None
        Some((rate, 1, ImaAdpcm.decodeBlocksMono(b, dataOff, nBlocks, samplesPerBlock)))
      case _ => None
    }
  }

  /** Storage-blind PCM seam for the audio family — the audio analog of
    * [[containerFrames]]: window energies whether the clip arrived as
    * raw RIFF WAV, FLAC-compressed ([[FlacCodec.decodeS16]]), or in a
    * legacy WAV codec ([[wavLegacyDecodeS16]] — µ-law/A-law/IMA
    * ADPCM). FLAC is lossless, so the decoded s16 samples are
    * bit-identical to the WAV twin's; the legacy codecs are lossy but
    * DETERMINISTIC projections, and the m5d fixture stores each coded
    * clip's exact decoded projection as its PCM twin — either way the
    * integer Σs² energies (hence every fingerprint downstream) are
    * EQUAL across storage, not merely close, which is what lets the
    * m5c/m5d closed forms carry over. The sniffs are disjoint (PCM
    * fmt 1 vs fLaC magic vs fmt 6/7/0x11). */
  private[graft] def pcmEnergiesAny(b: Array[Byte], nWin: Int): Option[Array[Long]] =
    wavPcmEnergies(b, nWin).orElse(FlacCodec.decodeS16(b).flatMap {
      case (_, ch, samples) => samplesEnergies(samples, ch, nWin)
    }).orElse(wavLegacyDecodeS16(b).flatMap {
      case (_, ch, samples) => samplesEnergies(samples, ch, nWin)
    })

  /** The same per-window Σs² as [[wavPcmEnergies]], over decoded
    * interleaved samples (identical window math: nWin equal windows of
    * ⌊frames/nWin⌋ frames, trailing remainder ignored). */
  private[graft] def samplesEnergies(samples: Array[Short], channels: Int,
      nWin: Int): Option[Array[Long]] = {
    if (channels < 1) return None
    val frames = samples.length / channels
    if (frames < nWin) return None
    val winFrames = frames / nWin
    val e = new Array[Long](nWin)
    var w = 0
    while (w < nWin) {
      var acc = 0L
      var s = w * winFrames * channels
      val end = s + winFrames * channels
      while (s < end) { val v = samples(s).toLong; acc += v * v; s += 1 }
      e(w) = acc
      w += 1
    }
    Some(e)
  }

  /** [[wavPcmMono]]'s storage-blind twin for the spectral path. */
  private[graft] def pcmMonoAny(b: Array[Byte]): Option[Array[Double]] =
    wavPcmMono(b)
      .orElse(FlacCodec.decodeS16(b).map(t => monoAverage(t._2, t._3)))
      .orElse(wavLegacyDecodeS16(b).map(t => monoAverage(t._2, t._3)))

  private def monoAverage(ch: Int, samples: Array[Short]): Array[Double] = {
    val frames = samples.length / ch
    val mono = new Array[Double](frames)
    var f = 0
    while (f < frames) {
      var acc = 0.0
      var c = 0
      while (c < ch) { acc += samples(f * ch + c); c += 1 }
      mono(f) = acc / ch
      f += 1
    }
    mono
  }

  /** Gradient-sign packing shared by the real and stub energy paths —
    * the 1-D analog of [[dHash64]] and the shape chromaprint-style
    * fingerprints take: bit i = [e(i) < e(i+1)], loudness-shift
    * invariant exactly like dHash is brightness-shift invariant. */
  private def packGradientSign(e: Array[Long]): Long = {
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (e(i) < e(i + 1)) hash |= 1L << i
      i += 1
    }
    hash
  }

  /** Stub energy fingerprint for WAVs without a decodable PCM payload
    * (header-only fixtures, compressed formats): 65 md5 "energies"
    * keyed by the REAL header-parsed (sample_rate, channels), the
    * trailing payload byte perturbing window 1. Kept only as the
    * degrade path — the m5 pipeline runs [[wavPcmEnergies]]. */
  private[graft] def audioFp64(sr: Int, ch: Int, tweak: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    // One digest per energy window (65), parsed straight from digest
    // bytes (first 15 hex chars = first 8 bytes big-endian >>> 4) —
    // same parity-preserving rewrite as [[dHash64]]'s grid.
    val e = new Array[Long](65)
    var i = 0
    while (i < 65) {
      md.reset()
      val d = md.digest(s"$sr:$ch:$i".getBytes("UTF-8"))
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      e(i) = v >>> 4
      i += 1
    }
    e(1) += tweak.toLong * 2305843009213693952L
    packGradientSign(e)
  }

  /** m5 step 1 — fingerprint per audio row: REAL PCM decode through
    * the storage-blind seam ([[pcmEnergiesAny]] — RIFF byte-read or
    * FLAC decode, per-window Σs²) → gradient-sign packing, in one
    * batched mapPartitions pass. Audio whose payload carries no
    * decodable PCM (header-only fixtures, unsupported bit depths,
    * CRC-failing FLAC frames) degrades to the md5 energy stub keyed by
    * the header params — the same never-kill contract as the image
    * path. Non-audio rows drop. */
  def audioFingerprint(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        pcmEnergiesAny(r.payload, 65) match {
          case Some(e) => Some((r.doc_id, packGradientSign(e)))
          case None => parseDims(r.payload) match {
            case Some((mime, sr, ch)) if mime == "audio/wav" || mime == "audio/flac" =>
              val tweak = r.payload(r.payload.length - 1) & 0xff
              Some((r.doc_id, audioFp64(sr, ch, tweak)))
            case _ => None
          }
        }
      }
    }.toDF("doc_id", "afp")
  }

  /** m5 step 2 — near-duplicate audio pairs at Hamming ≤ maxDist via
    * the d3/m4 4×16-bit banded equi-join: an audio fingerprint is just
    * another 64-bit signature. */
  def audioDupPairs(fps: DataFrame, maxDist: Int = 3): DataFrame =
    NearDup.simhashPairs(
      fps.select(col("doc_id"), col("afp").as("simhash")), maxDist)

  /** Iterative radix-2 FFT in place (re/im must be a power-of-2
    * length) — plain Cooley–Tukey over doubles, deterministic on any
    * JVM. Fixture-scale tool for the spectral fingerprint; a 100 TB
    * run swaps in a vectorized kernel behind the same seam. */
  private[graft] def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length && (n & (n - 1)) == 0, s"radix-2 needs 2^k, got $n")
    // bit-reversal permutation
    var i = 1; var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var blk = 0
      while (blk < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val a = blk + k; val b = blk + k + len / 2
          val xr = re(b) * cr - im(b) * ci
          val xi = re(b) * ci + im(b) * cr
          re(b) = re(a) - xr; im(b) = im(a) - xi
          re(a) += xr; im(a) += xi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        blk += len
      }
      len <<= 1
    }
  }

  /** m5b — SPECTRAL audio fingerprint over real PCM (the chromaprint
    * shape proper, where m5's time-energy path is its 1-band
    * degenerate case): 16 rectangular windows of 256 samples, FFT per
    * window, energy in 4 log-spaced bands (bins [1,4), [4,16),
    * [16,64), [64,128)), bit (t·4 + b) = E(b,t) < E(b,t+1) — gradient
    * sign over TIME per band, 60 bits. Loudness-shift invariant like
    * m5 AND tone-content sensitive (a same-energy pitch change moves
    * band energies m5's Σs² cannot see). Time-major bit order puts a
    * one-window edit's ≤4 flipped bits (the t = 0 comparisons) inside
    * ONE 16-bit simhash band, so the banded join still guarantees the
    * fixture's in-group pairs at Hamming ≤ 4. Needs ≥ 4096 PCM frames
    * — i.e. `mono.length >= 16·256` channel-averaged samples, one per
    * frame, which is exactly what the guard below checks; shorter or
    * undecodable payloads return no row (m5 is the fallback
    * fingerprint, not a stub here). */
  private[graft] def audioSpectralFp(mono: Array[Double]): Option[Long] = {
    val winLen = 256; val nWin = 16
    if (mono.length < winLen * nWin) return None
    val bands = Array((1, 4), (4, 16), (16, 64), (64, 128))
    val e = Array.ofDim[Double](bands.length, nWin)
    val re = new Array[Double](winLen); val im = new Array[Double](winLen)
    var t = 0
    while (t < nWin) {
      var k = 0
      while (k < winLen) { re(k) = mono(t * winLen + k); im(k) = 0.0; k += 1 }
      fft(re, im)
      var b = 0
      while (b < bands.length) {
        val (lo, hi) = bands(b)
        var s = 0.0
        k = lo
        while (k < hi) { s += re(k) * re(k) + im(k) * im(k); k += 1 }
        e(b)(t) = s
        b += 1
      }
      t += 1
    }
    var hash = 0L
    t = 0
    while (t < nWin - 1) {
      var b = 0
      while (b < bands.length) {
        if (e(b)(t) < e(b)(t + 1)) hash |= 1L << (t * 4 + b)
        b += 1
      }
      t += 1
    }
    Some(hash)
  }

  /** m5b step 1 — spectral fingerprint per audio row, one batched
    * decode+FFT pass; rows without ≥4096 decodable PCM frames drop. */
  def audioSpectralFingerprint(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        pcmMonoAny(r.payload).flatMap(audioSpectralFp)
          .map(fp => (r.doc_id, fp))
      }
    }.toDF("doc_id", "afp")
  }

  /** m4 step 2 — near-duplicate image pairs at Hamming ≤ maxDist: the
    * EXACT same 4×16-bit banded equi-join as text SimHash (d3) — the
    * pigeonhole guarantees dist ≤ 3 pairs share a band, so no all-pairs
    * comparison ever forms. Reuses [[NearDup.simhashPairs]] verbatim:
    * one perceptual hash is just another 64-bit fingerprint. */
  def imageDupPairs(hashes: DataFrame, maxDist: Int = 3): DataFrame =
    NearDup.simhashPairs(
      hashes.select(col("doc_id"), col("phash").as("simhash")), maxDist)

  /** Deterministic frame-sample analog: pick every k-th byte window as a
    * "frame" offset list — stands in for video frame sampling. */
  def frameOffsets(media: Dataset[MediaRow], k: Int): DataFrame =
    media.toDF().select(col("doc_id"),
      filter(sequence(lit(0), length(col("payload")) - 1),
        i => i % k === 0).as("frame_offsets"))

  /** Frame-sample plumbing: k evenly-spaced frame indices per media row
    * (audio frames = sample positions, image "frames" = row tiles),
    * offsets computed from the REAL decoded header dims. The analog of
    * video frame sampling for training-data extraction: deterministic
    * (offset_i = floor(i·frames/k)), map-only, and at scale the frame
    * reads happen inside the same mapPartitions pass as decode so each
    * payload is scanned once. */
  def frameSampleMeta(features: Dataset[MediaFeatures], k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    features.toDF()
      .withColumn("n_frames",
        when(col("mime") === "audio/wav", col("width")).otherwise(col("height")))
      .select(col("doc_id"), col("mime"), col("n_frames").cast("long").as("n_frames"),
        explode(sequence(lit(0), lit(k - 1))).as("i"))
      .select(col("doc_id"), col("mime"), col("n_frames"),
        col("i").cast("long").as("frame_idx"),
        floor(col("i") * col("n_frames") / lit(k)).cast("long").as("frame_offset"))
  }

  /** m6 step 1 — per-frame perceptual hashes for "videos": k
    * evenly-spaced frame indices per video (frameSampleMeta's
    * offset_i = ⌊i·n_frames/k⌋ contract), each frame fingerprinted with
    * the SAME real dHash packing as m4's images (the decode is the
    * documented stub — frame pixel grids derive from the video's
    * decoded dims + frame offset; a real decoder drops into the same
    * per-frame slot). Synthetic fixture: dims/frame-count key off
    * doc_id DIV 10 — CONSTANT-size families of 10 re-encodes of one
    * "video" (the family id rides inside the hash input, so families
    * never collide and the corpus's dup-pair count grows LINEARLY with
    * it — the dedup-honest fixture discipline the ScalingProbe
    * documents; a residue-keyed family would grow quadratically) — and
    * a doc-parity tweak re-renders the LAST sampled frame only: the
    * partial-overlap case (3 of 4 frames match) a trailer/re-cut
    * actually produces. Map-only; 8 bytes per (video, frame) leave the
    * scan. */
  def videoFrameHashes(docs: DataFrame, k: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spreadIds(docs).as[Long].flatMap { id =>
      val fam = id / 10
      // Dims stay Long end-to-end: an Int wh would wrap/alias for
      // fam >= ~2.15M (doc_id >= ~21.5M) and diverge from the oracle's
      // BIGINT w — the hash input must match at ANY doc_id.
      val wh = 16 + fam % 184 + fam * 1000
      val hgt = 16 + fam % 134
      val nf = (24 + (fam % 5) * 8).toInt
      val tw = (id % 2).toInt
      (0 until k).map { i =>
        val off = i * nf / k
        val hv = hgt + off * 1000L + (if (tw == 1 && i == k - 1) 7777L else 0L)
        (id, i.toLong, dHash64(wh, hv, 0))
      }
    }.toDF("doc_id", "frame_idx", "fhash")
  }

  /** Minimal MJPEG-in-AVI container (RIFF 'AVI ': hdrl with avih +
    * one 'vids'/'MJPG' stream, then a movi LIST of '00dc' frames) —
    * the fixture encoder for the real video path. AVI is RIFF and
    * MJPEG frames are baseline JPEGs, so the repo's existing byte
    * walkers and [[JpegCodec]] decode it with no new codec. */
  private[graft] def aviMjpegBytes(w: Int, h: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = data.length & 1 // chunks are word-aligned
      val bb = java.nio.ByteBuffer.allocate(8 + data.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")).putInt(data.length).put(data)
      bb.array()
    }
    def list(listType: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", listType.getBytes("US-ASCII") ++ body)
    val avih = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40000).putInt(0).putInt(0).putInt(0)        // usec/frame, rate, pad, flags
      .putInt(frames.length).putInt(0).putInt(1).putInt(0) // total, initial, streams, buf
      .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
      .array()
    val strh = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("vids".getBytes).put("MJPG".getBytes)
      .putInt(0).putInt(0).putInt(0)                      // flags, prio, initial
      .putInt(1).putInt(25).putInt(0).putInt(frames.length) // scale, rate, start, length
      .putInt(0).putInt(-1).putInt(0)                     // buf, quality, sampleSize
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
      .array()
    val strf = java.nio.ByteBuffer.allocate(40).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .put("MJPG".getBytes).putInt(w * h * 3).putInt(0).putInt(0).putInt(0).putInt(0)
      .array()
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = "AVI ".getBytes ++ hdrl ++ movi
    val bb = java.nio.ByteBuffer.allocate(8 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(body.length).put(body)
    bb.array()
  }

  /** Extract MJPEG frame payloads from an AVI container: RIFF walk to
    * the movi LIST, collect '00dc'/'00db' chunk bodies ('rec ' sublists
    * descended). Degrade-never-throw like every parser here: None for
    * non-AVI, truncated, or frameless payloads; the same overflow
    * guards as [[parseWav]] (u32 sizes held in Long). */
  private[graft] def aviMjpegFrames(b: Array[Byte]): Option[Vector[Array[Byte]]] = {
    if (b.length < 12 || !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F')) return None
    if (!(b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' ')) return None
    val frames = Vector.newBuilder[Array[Byte]]
    // depth-capped: real AVIs nest ≤ 3 (RIFF → movi → rec ); a crafted
    // payload nesting LISTs thousands deep would otherwise blow the
    // task's stack — an Error no flatMap catches, i.e. a kill, which
    // the degrade contract forbids
    def walk(from: Int, to: Int, inMovi: Boolean, depth: Int): Boolean = {
      if (depth > 8) return false
      var i = from
      while (i + 8 <= to) {
        val size = leU32(b, i + 4)
        val dataEnd = i.toLong + 8L + size
        if (dataEnd > to.toLong) return false
        val isList = b(i) == 'L' && b(i + 1) == 'I' && b(i + 2) == 'S' && b(i + 3) == 'T'
        if (isList && size >= 4) {
          val lt = new String(b, i + 8, 4, "US-ASCII")
          if (!walk(i + 12, dataEnd.toInt,
            inMovi || lt == "movi", depth + 1)) return false
        } else if (inMovi && b(i) == '0' && b(i + 1) == '0' &&
          b(i + 2) == 'd' && (b(i + 3) == 'c' || b(i + 3) == 'b')) {
          // stream 00 only: a multi-stream AVI ('01dc' second video,
          // '01wb' audio) would otherwise interleave foreign frames
          // into the frame_idx sequence and misalign videoDupPairs'
          // aligned-frame vote
          frames += java.util.Arrays.copyOfRange(b, i + 8, dataEnd.toInt)
        }
        val next = dataEnd + (size & 1L) // word-aligned
        if (next <= i) return false
        i = next.toInt
      }
      true
    }
    if (!walk(12, b.length, inMovi = false, depth = 0)) return None
    val out = frames.result()
    if (out.isEmpty) None else Some(out)
  }

  /** Container-transparent frame extraction: the stored JPEG frame
    * bytes whether the clip arrived as RIFF AVI or ISO BMFF MP4 — the
    * single seam through which [[videoFrameHashesReal]] and
    * [[videoAdmit]] see BOTH real-world containers, so batch dedup and
    * the streaming admission gate stay container-blind by
    * construction. The two sniffs are disjoint (RIFF magic at offset 0
    * vs `ftyp` fourcc at offset 4), so order is immaterial; each
    * parser degrades to None on foreign bytes. */
  private[graft] def containerFrames(b: Array[Byte]): Option[Vector[Array[Byte]]] =
    aviMjpegFrames(b).orElse(Mp4Codec.mjpegFrames(b))
      .orElse(Mp4Codec.mjpegFramesFragmented(b))

  /** All-AVI fixture with REAL MJPEG frames for the end-to-end video
    * path (m6b): each residue group `doc_id % 151` is one 4-frame
    * clip of m4c-style plateau-cell rasters (36×32, the 9×8 dHash
    * cells constant at gap-3 gray levels, permutation seeded per
    * (group, frame)). Odd doc_ids re-render frame 0 from a DIFFERENT
    * permutation — the re-cut/retitled-first-frame shape — so an
    * even/odd pair aligns exactly 3 of 4 frames while same-parity
    * pairs align all 4, and cross-group clips align none: the
    * n_matched_frames column itself has a closed form a SQL oracle
    * states. `group` keys clip families (see [[syntheticJpegImages]] —
    * the ScalingProbe's dedup-honest DIV-family hook). */
  def syntheticMjpegVideos(docs: DataFrame,
      group: Long => Long = _ % 151, nFrames: Int = 4): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    spreadIds(docs).as[Long].map { id =>
      val (w, h, frames) = plateauClipFrames(id, group(id), nFrames)
      MediaRow(id, aviMjpegBytes(w, h, frames), "video/avi")
    }
  }

  /** The plateau-cell clip generator [[syntheticMjpegVideos]] has
    * always encoded, factored out so container fixtures share the
    * exact frame BYTES: (36×32, JPEG-encoded per frame; odd ids
    * re-render frame 0 from a different permutation — the
    * re-cut-first-frame dup shape whose closed form the m6-family
    * oracles state). */
  private[graft] def plateauClipFrames(id: Long, g: Long,
      nFrames: Int): (Int, Int, IndexedSeq[Array[Byte]]) = {
    val ws = 4; val hs = 4; val w = 9 * ws; val h = 8 * hs
    val frames = (0 until nFrames).map { fi =>
      val seed = (g * nFrames + fi) * 2654435761L +
        (if (id % 2 == 1 && fi == 0) 977L else 41L)
      val rnd = new java.util.Random(seed)
      val perm = Array.tabulate(72)(identity)
      var i = perm.length - 1
      while (i > 0) {
        val j = rnd.nextInt(i + 1)
        val t = perm(i); perm(i) = perm(j); perm(j) = t
        i -= 1
      }
      val gray = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          gray(y * w + x) = 12 + 3 * perm((y / hs) * 9 + x / ws)
          x += 1
        }
        y += 1
      }
      JpegCodec.encodeGray(w, h, gray)
    }
    (w, h, frames)
  }

  /** m6d fixture — the m6b clip corpus under MIXED real-world storage:
    * every third doc_id muxes its clip into ISO BMFF
    * ([[Mp4Codec.encodeMjpeg]] — ftyp/mdat/trailing-moov, the
    * capture-device layout) instead of RIFF AVI, with the frame BYTES
    * identical by construction ([[plateauClipFrames]]). The m4e move
    * applied to video: a mixed-storage dup pair only collides if BOTH
    * container walks compose with the shared JPEG decode + dHash +
    * aligned-frame vote, so m6b's closed-form oracle carries over
    * unchanged — pair structure is doc_id arithmetic, storage is
    * incidental, exactly what a dedup must guarantee on a corpus
    * whose videos arrive in whatever container the crawler found. */
  def syntheticMixedContainerVideos(docs: DataFrame,
      group: Long => Long = _ % 151, nFrames: Int = 4): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    spreadIds(docs).as[Long].map { id =>
      val (w, h, frames) = plateauClipFrames(id, group(id), nFrames)
      if (id % 3 == 1)
        MediaRow(id, Mp4Codec.encodeMjpeg(w, h, frames), "video/mp4")
      else MediaRow(id, aviMjpegBytes(w, h, frames), "video/avi")
    }
  }

  /** [[syntheticMixedContainerVideos]] widened to the THIRD container
    * real distribution ships (m6e): every doc_id % 3 == 2 clip stores
    * as a FRAGMENTED MP4 (DASH/CMAF segments — stbl-empty moov, one
    * moof+mdat per two frames), % 3 == 1 as plain MP4, the rest AVI.
    * Same frames in all three, so m6b's closed form carries over
    * verbatim; a mixed pair only collides if the moof/trun fragment
    * walk reconstructs the exact sample bytes the stbl walk reads. */
  def syntheticFragmentedVideos(docs: DataFrame,
      group: Long => Long = _ % 151, nFrames: Int = 4): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    spreadIds(docs).as[Long].map { id =>
      val (w, h, frames) = plateauClipFrames(id, group(id), nFrames)
      if (id % 3 == 2)
        MediaRow(id, Mp4Codec.encodeMjpegFragmented(w, h, frames), "video/mp4")
      else if (id % 3 == 1)
        MediaRow(id, Mp4Codec.encodeMjpeg(w, h, frames), "video/mp4")
      else MediaRow(id, aviMjpegBytes(w, h, frames), "video/avi")
    }
  }

  /** Storage-class classifier for video payloads — the coverage axis
    * of the m7f receipt: `avi_mjpeg` for RIFF-AVI, `mp4_jpeg` /
    * `mp4_jpeg_frag` for plain/fragmented JPEG-coded ISO BMFF,
    * `mp4_<fourcc>` for codecs the pipeline scopes out (avc1/hvc1 —
    * the honest degrade classes), `mp4_other` when no entry resolves,
    * `not_video` otherwise. */
  private[graft] def videoClass(b: Array[Byte]): String = {
    if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' ') return "avi_mjpeg"
    if (!Mp4Codec.isMp4(b)) return "not_video"
    Mp4Codec.stsdCodecClass(b) match {
      case Some("jpeg") =>
        if (Mp4Codec.hasTopLevelMoof(b)) "mp4_jpeg_frag" else "mp4_jpeg"
      case Some(fc) => s"mp4_$fc"
      case None => "mp4_other"
    }
  }

  /** m7f fixture — [[syntheticMjpegVideos]] stretched across the video
    * coverage axes: doc_id % 7 == 1 re-stores plain MP4, % 7 == 2
    * FRAGMENTED MP4, % 7 == 3 rewrites the sample entry to `avc1` —
    * the inter-coded codec the repo scopes out, which must take the
    * counted degrade path (classifies, never decodes, never kills) —
    * % 7 == 4 TRUNCATES a fragmented clip inside its last mdat (the
    * layout classifies off the intact first fragment, decode must fail
    * cleanly); the rest stay AVI and must all decode. */
  def syntheticVideoCoverageMix(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    spreadIds(docs).as[Long].map { id =>
      val (w, h, frames) = plateauClipFrames(id, id % 151, 4)
      val payload = id % 7 match {
        case 1 => Mp4Codec.encodeMjpeg(w, h, frames)
        case 2 => Mp4Codec.encodeMjpegFragmented(w, h, frames)
        case 3 =>
          // patch the stsd entry fourcc to avc1. The moov trails the
          // media in this layout, so the LAST "stsd" is the real box
          // (a frame payload byte-coinciding with the string would sit
          // earlier) and the next "jpeg" is its VisualSampleEntry.
          val b = Mp4Codec.encodeMjpeg(w, h, frames)
          var s = -1
          var probe = indexOfAscii(b, "stsd")
          while (probe >= 0) { s = probe; probe = indexOfAscii(b, "stsd", probe + 1) }
          val j = if (s < 0) -1 else indexOfAscii(b, "jpeg", s)
          if (j >= 0) { b(j) = 'a'; b(j + 1) = 'v'; b(j + 2) = 'c'; b(j + 3) = '1' }
          b
        case 4 =>
          val full = Mp4Codec.encodeMjpegFragmented(w, h, frames)
          java.util.Arrays.copyOf(full, full.length - frames.last.length / 2)
        case _ => aviMjpegBytes(w, h, frames)
      }
      MediaRow(id, payload, "video/mp4")
    }
  }

  private def indexOfAscii(b: Array[Byte], s: String, from: Int = 0): Int = {
    val n = s.getBytes("US-ASCII")
    var i = math.max(from, 0)
    while (i <= b.length - n.length) {
      var j = 0
      while (j < n.length && b(i + j) == n(j)) j += 1
      if (j == n.length) return i
      i += 1
    }
    -1
  }

  /** m7f — video storage-coverage card: per (video_class, decoded)
    * counts, where video_class comes from [[videoClass]]'s header read
    * and decoded is whether [[containerFrames]] actually extracted
    * frames — the receipt naming which container/codec classes rode
    * the real frame path and which (inter-coded avc1, truncated
    * segments) took the counted degrade. Map-only classify+decode +
    * one card-sized aggregate. */
  def videoFormatCard(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map(r => (videoClass(r.payload),
        containerFrames(r.payload).exists(_.nonEmpty)))
    }.toDF("video_class", "decoded")
      .groupBy("video_class", "decoded")
      .agg(count(lit(1)).cast("long").as("n"))
  }

  /** m6b step 1 — REAL per-frame perceptual hashes: parse the AVI,
    * decode each MJPEG frame ([[JpegCodec]]), dHash its pixels — the
    * decode slot [[videoFrameHashes]]'s scaladoc promised, filled. One
    * batched mapPartitions pass; payloads that aren't decodable AVI
    * drop (8 bytes per (video, frame) leave the scan).
    *
    * Frame sampling: at most `k` frames per video. A clip with ≤ k
    * frames emits every frame at its natural index (the fixture
    * regime); a longer clip emits the k evenly-spaced frames at
    * offsets ⌊i·n/k⌋ ([[frameSampleMeta]]'s contract) under SAMPLE
    * index i — so frame_idx is always < k ≤ [[videoDupPairs]]'s
    * default stride and a real-world clip (25 frames/second) can
    * never trip that operator's in-plan aliasing guard: an oversized
    * payload degrades to a bounded sample, it does not kill the job.
    * Sampling also bounds the decode CPU per row — k JPEG decodes per
    * video regardless of clip length, the budget cap a 100 TB video
    * corpus needs anyway. */
  def videoFrameHashesReal(media: Dataset[MediaRow], k: Int = 16): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        sampledFrameHashes(r.payload, k).iterator.map {
          case (i, fh) => (r.doc_id, i.toLong, fh)
        }
      }
    }.toDF("doc_id", "frame_idx", "fhash")
  }

  /** Row-local slice of [[videoFrameHashesReal]]: container walk →
    * ≤k evenly-spaced sampled frames (⌊i·n/k⌋, the frameSampleMeta
    * contract) → real JPEG decode → dHash, as (sample idx, hash)
    * pairs with undecodable picks dropped. Shared with [[videoAdmit]]
    * so the admission gate and the batch dedup see IDENTICAL frames. */
  private[graft] def sampledFrameHashes(payload: Array[Byte], k: Int): Seq[(Int, Long)] =
    containerFrames(payload).toSeq.flatMap { frames =>
      val n = frames.length
      val picks: IndexedSeq[(Int, Int)] = // (sample idx, frame offset)
        if (n <= k) (0 until n).map(i => (i, i))
        else (0 until k).map(i => (i, (i.toLong * n / k).toInt))
      picks.flatMap { case (i, off) =>
        JpegCodec.decodeGray(frames(off)) match {
          case Some((w, h, gray)) if w >= 9 && h >= 8 =>
            Some((i, PngCodec.dHashPixels(w, h, gray)))
          case _ => None
        }
      }
    }

  /** m6 step 2 — video near-dup pairs: two videos are near-dups when at
    * least `minFrames` ALIGNED frames (same sample index) land within
    * `maxDist` Hamming bits. Frames ride m4/d3's banded-Hamming
    * machinery via pseudo-ids (doc_id·16 + frame_idx, so the band join
    * also aligns frames for free), then one (pair) aggregate counts
    * matched frames. Same shape as every banded dedup: equi-join on
    * (band, key16), candidates-only Hamming, no pair matrix. */
  def videoDupPairs(frames: DataFrame, maxDist: Int = 3,
      minFrames: Int = 3, stride: Long = 16L): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    // The stride IS the encoding: frame_idx >= stride would alias into
    // a neighboring doc_id's pseudo-id space and silently produce wrong
    // pairs, so the guard fails LOUDLY in-plan (codegen'd conditional,
    // no extra action) — callers sampling k > 16 frames pass a wider
    // stride.
    val guarded = when(col("frame_idx") >= 0 && col("frame_idx") < stride,
        col("frame_idx"))
      .otherwise(raise_error(concat(
        lit("videoDupPairs: frame_idx "), col("frame_idx").cast("string"),
        lit(s" outside [0, $stride) — pass a stride > max frame_idx"))))
    NearDup.simhashPairs(
        frames.select((col("doc_id") * stride + guarded).as("doc_id"),
          col("fhash").as("simhash")), maxDist)
      .filter(expr(s"id_a % $stride = id_b % $stride"))
      .select(expr(s"id_a DIV $stride").as("id_a"),
        expr(s"id_b DIV $stride").as("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).cast("long").as("n_matched_frames"))
      .filter(col("n_matched_frames") >= minFrames)
  }

  /** m7 — media geometry distribution card: per (mime, orientation)
    * counts, dimension extrema, and total pixel volume from REAL header
    * parses ([[parseDims]] byte readers) — the corpus-profiling card a
    * resize/training job reads before picking batch shapes and bucket
    * boundaries (a corpus that is 90% portrait wants a different crop
    * policy than one that is 90% landscape; total_px is the decode
    * budget). Payloads whose container no parser recognizes are counted
    * under mime 'unknown' with zero dims — unparseable media is a
    * number the card must surface, not silently drop. Map-only parse
    * (payload bytes never shuffle) + one card-sized aggregate. */
  def mediaDimsCard(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        parseDims(r.payload) match {
          case Some((mime, w, h)) => (mime, w.toLong, h.toLong)
          case None => ("unknown", 0L, 0L)
        }
      }
    }.toDF("mime", "w", "h")
      .groupBy(col("mime"),
        when(col("w") > col("h"), "landscape")
          .when(col("w") < col("h"), "portrait")
          .otherwise("square").as("orientation"))
      .agg(count(lit(1)).cast("long").as("n"),
        min("w").as("min_w"), max("w").as("max_w"),
        min("h").as("min_h"), max("h").as("max_h"),
        sum(col("w") * col("h")).cast("long").as("total_px"))
  }

  /** m8 — broadcastable corpus IMAGE fingerprint: a bloom over the
    * corpus phashes' 4×16-bit band keys (the same banding as the
    * [[imageDupPairs]] join, key = band·2¹⁶ + bits). KBs per million
    * images — the artifact a batch job publishes so ingest can gate
    * incoming images against a 100 TB visual corpus without joining
    * anything. */
  def imageFingerprint(hashes: DataFrame,
      fpp: Double = 0.001): org.apache.spark.util.sketch.BloomFilter =
    graft.plans.BloomJoin.buildFilter(
      hashes.select(explode(array((0 until 4).map(b =>
        expr(s"CAST($b AS BIGINT) * 65536 + " +
          s"(shiftrightunsigned(phash, ${16 * b}) & 65535)")): _*)).as("k")),
      col("k"), fpp)

  /** m8 — visual-dup admission gate (d8's admit pattern transplanted to
    * images): admit only images sharing NO phash band with the corpus
    * fingerprint. Pure per-row map — decode + dHash ([[imageDHash]]'s
    * real-PNG-else-lattice path) + 4 bloom probes — so the identical
    * plan runs batch or streaming (stateless, rerun-stable; stream ≡
    * batch pinned in ScaleSpec). Conservative by construction: an exact
    * or ≤2-bit-edit duplicate ALWAYS shares ≥2 bands (no false
    * negatives from the bloom), so no true visual dup is ever admitted;
    * band-candidate rejection skips the Hamming verify (row-local
    * decision), over-rejecting ~fpp plus genuine band collisions —
    * the same trade the text admission gate documents. Intra-batch
    * dups pass (stateless); they belong to the scheduled m4 compaction.
    * Output: admitted (doc_id, phash). */
  def imageAdmit(media: Dataset[MediaRow],
      fp: org.apache.spark.util.sketch.BloomFilter): DataFrame = {
    import graft.plans.BloomJoin
    val hit = (0 until 4).map(b =>
        BloomJoin.mightContain(expr(s"CAST($b AS BIGINT) * 65536 + " +
          s"(shiftrightunsigned(phash, ${16 * b}) & 65535)"), fp))
      .reduce(_ || _)
    imageDHash(media).withColumn("__hit", hit)
      .filter(!col("__hit")).drop("__hit")
  }

  /** m8b — broadcastable corpus AUDIO fingerprint: a bloom over the
    * corpus audio fingerprints' 4×16-bit band keys (the same banding
    * as the [[audioDupPairs]] join, key = band·2¹⁶ + bits). KBs per
    * million clips — the published-artifact pattern of
    * [[imageFingerprint]], for sound. */
  def audioCorpusFingerprint(fps: DataFrame,
      fpp: Double = 0.001): org.apache.spark.util.sketch.BloomFilter =
    imageFingerprint(fps.select(col("afp").as("phash")), fpp)

  /** m8b — audio-dup admission gate (the visual gate transplanted to
    * sound): admit only clips sharing NO fingerprint band with the
    * corpus bloom. Pure per-row map — REAL PCM decode → energy
    * fingerprint ([[audioFingerprint]]'s real-else-header-stub path) +
    * 4 bloom probes — so the identical plan runs batch or streaming
    * (stateless, rerun-stable; stream ≡ batch pinned in ScaleSpec).
    * Conservative by construction: an exact or ≤2-bit-edit duplicate
    * always shares ≥2 of the 4 bands, so no true audio dup of the
    * corpus is ever admitted; band-collision rejection over-rejects
    * ~fpp plus genuine collisions — the same trade the image and text
    * gates document. Intra-batch dups pass (stateless); they belong to
    * the scheduled m5 compaction. Output: admitted (doc_id, afp). */
  def audioAdmit(media: Dataset[MediaRow],
      fp: org.apache.spark.util.sketch.BloomFilter): DataFrame = {
    import graft.plans.BloomJoin
    val hit = (0 until 4).map(b =>
        BloomJoin.mightContain(expr(s"CAST($b AS BIGINT) * 65536 + " +
          s"(shiftrightunsigned(afp, ${16 * b}) & 65535)"), fp))
      .reduce(_ || _)
    audioFingerprint(media).withColumn("__hit", hit)
      .filter(!col("__hit")).drop("__hit")
  }

  /** m8c — broadcastable corpus VIDEO-FRAME fingerprint: a bloom over
    * the corpus clips' real sampled-frame dHashes'
    * ([[videoFrameHashesReal]]) band keys — frame-level because video
    * dups are detected frame-wise: a re-cut sharing ANY frame with the
    * corpus must be caught, so the artifact indexes frames, not
    * clips. */
  def videoCorpusFingerprint(frames: DataFrame,
      fpp: Double = 0.001): org.apache.spark.util.sketch.BloomFilter =
    imageFingerprint(frames.select(col("fhash").as("phash")), fpp)

  /** m8c — video admission gate: a clip is admitted only if NONE of
    * its ≤16 sampled decoded frames shares a dHash band with the
    * corpus frame bloom. Row-local decision: container walk + frame
    * decode + dHash ([[sampledFrameHashes]], the exact frames m6b's
    * batch dedup sees) + 4 band probes per frame, all inside one
    * mapPartitions pass — no shuffle, no state — so the identical plan
    * runs batch or streaming (stream ≡ batch pinned in ScaleSpec).
    * Conservative two ways: an aligned ≤2-bit-edited frame always
    * shares ≥2 bands with its corpus twin, so a clip sharing any frame
    * with the corpus is never admitted; and clips yielding NO decodable
    * frames are rejected — don't admit unverifiable media, the safe
    * ingest default (the counted-degrade story stays with m7b/m9).
    * Output: admitted (doc_id, n_frames sampled-and-decoded).
    *
    * `k` is the frame-sample cap and MUST match the one the corpus
    * fingerprint was built with ([[videoFrameHashesReal]]'s k): the
    * gate's guarantee is that it probes the IDENTICAL frames batch
    * dedup hashed, and a mismatched k samples different offsets. */
  def videoAdmit(media: Dataset[MediaRow],
      fp: org.apache.spark.util.sketch.BloomFilter, k: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val hs = sampledFrameHashes(r.payload, k).map(_._2)
        val hit = hs.exists(h => (0 until 4).exists(b =>
          fp.mightContainLong(b.toLong * 65536L + ((h >>> (16 * b)) & 0xffffL))))
        if (hs.isEmpty || hit) None else Some((r.doc_id, hs.length.toLong))
      }
    }.toDF("doc_id", "n_frames")
  }

  /** m9 — payload integrity card: declared mime vs byte-sniffed
    * container, counted per (declared, sniffed) cell — the trust-bytes
    * audit run at media ingest. A mislabeled payload routed by its
    * label hits the wrong decoder (a task-killer at best, a parser
    * exploit at worst); this repo's parsers already trust bytes over
    * labels, and the card QUANTIFIES how often the two disagree so the
    * labeling upstream can be fixed rather than silently tolerated.
    * Unrecognized containers sniff as 'unknown'. Map-only sniff
    * (payloads never shuffle) + a card-sized aggregate. */
  def mimeIntegrityCard(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        (r.mime, parseDims(r.payload).map(_._1).getOrElse("unknown"))
      }
    }.toDF("declared_mime", "sniffed_mime")
      .groupBy("declared_mime", "sniffed_mime")
      .agg(count(lit(1)).cast("long").as("n"))
      .withColumn("mimes_match", col("declared_mime") === col("sniffed_mime"))
  }

  /** Resize plumbing: aspect-preserving fit into a maxDim bounding box —
    * the metadata contract a real resize kernel satisfies (never
    * upscales; floor semantics; at scale the pixel work runs inside the
    * same mapPartitions pass as decode so payloads are scanned once). */
  def resizeMeta(features: Dataset[MediaFeatures], maxDim: Int): DataFrame =
    features.toDF()
      .withColumn("scale",
        least(lit(1.0), lit(maxDim.toDouble) / greatest(col("width"), col("height"))))
      .select(col("doc_id"), col("mime"), col("width"), col("height"),
        floor(col("width") * col("scale")).cast("int").as("out_w"),
        floor(col("height") * col("scale")).cast("int").as("out_h"))
}
