package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{JpegCodec, Multimodal, PngCodec}

/** Cross-codec fuzz battery for the degrade-never-kill contract: every
  * decoder in the media family must return (not throw, not spin) on
  * arbitrary single-byte corruptions and every truncation prefix of
  * every encoder variant the repo can produce. The per-codec specs
  * fuzz their own happy-path stream; this battery is the breadth pass
  * — variant × mutation coverage is what caught the SOS table-slot
  * overflow the narrower fuzzes missed (a 4-bit nibble indexing a
  * 4-slot array).
  *
  * 100 TB framing: a web corpus WILL contain every one of these
  * corruptions; one uncaught IndexOutOfBounds in a mapPartitions batch
  * kills the task, the stage, and with maxFailures the whole job.
  */
class CodecFuzzSpec extends AnyFunSuite {

  private def raster(w: Int, h: Int, seed: Long): Array[Int] = {
    val rnd = new java.util.Random(seed)
    Array.fill(w * h)(rnd.nextInt(256))
  }

  /** Every encoder shape in the repo, one smallish payload each. */
  private def variants(): Seq[(String, Array[Byte])] = {
    val y = raster(24, 24, 1L); val y17 = raster(17, 19, 2L)
    val c12 = raster(12, 12, 3L); val c9 = raster(9, 10, 4L)
    val cfull = raster(24, 24, 5L); val c17 = raster(17, 19, 6L)
    val cw422 = raster(12, 24, 7L)
    val nonUniform = Array.tabulate(64)(i => 1 + (i * 7) % 23)
    Seq(
      "jpeg_gray" -> JpegCodec.encodeGray(24, 24, y),
      "jpeg_gray_quant" -> JpegCodec.encodeGray(24, 24, y, nonUniform),
      "jpeg_gray_rst" -> JpegCodec.encodeGray(24, 24, y, restartInterval = 2),
      "jpeg_444" -> JpegCodec.encodeYcc444(24, 24, y, cfull, cfull),
      "jpeg_444_scanorder" -> JpegCodec.encodeYcc444(24, 24, y, cfull, cfull,
        scanOrder = Seq(2, 0, 1)),
      "jpeg_422" -> JpegCodec.encodeYcc422(24, 24, y, cw422, cw422),
      "jpeg_420" -> JpegCodec.encodeYcc420(24, 24, y, c12, c12),
      "jpeg_420_odd" -> JpegCodec.encodeYcc420(17, 19, y17, c9, c9),
      "jpeg_prog_gray" -> JpegCodec.encodeGrayProgressive(24, 24, y),
      "jpeg_prog_gray_rst" -> JpegCodec.encodeGrayProgressive(24, 24, y,
        restartInterval = 3),
      "jpeg_prog_spectral" -> JpegCodec.encodeGrayProgressive(24, 24, y,
        scans = Seq((0, 0, 0, 0), (1, 9, 0, 0), (10, 63, 0, 0))),
      "jpeg_prog_color" -> JpegCodec.encodeYccProgressive(24, 24, y, cfull, cfull),
      "jpeg_prog_420" -> JpegCodec.encodeYccProgressive(24, 24, y, c12, c12,
        lumaSampling = (2, 2)),
      "jpeg_prog_420_rst" -> JpegCodec.encodeYccProgressive(24, 24, y, c12, c12,
        lumaSampling = (2, 2), restartInterval = 2),
      "jpeg_exif_ii" -> Multimodal.withExifOrientation(
        JpegCodec.encodeGray(24, 24, y), 6, bigEndian = false),
      "jpeg_exif_mm" -> Multimodal.withExifOrientation(
        JpegCodec.encodeGray(24, 24, y), 8, bigEndian = true),
      "png" -> PngCodec.encodeGray(24, 24, y, r => r % 5),
      "png_palette" -> PngCodec.encodePaletted(24, 24, y, r => r % 5),
      "png_adam7" -> PngCodec.encodeAdam7(24, 24, y, r => r % 5),
      "png_adam7_small" -> PngCodec.encodeAdam7(5, 3, raster(5, 3, 8L), r => r % 5),
      "wav" -> Multimodal.wavBytesPcm(8000, 2,
        Array.tabulate(520)(i => ((i * 977) % 8191).toShort)),
      "wav_mulaw" -> Multimodal.wavBytesG711(8000,
        Array.tabulate(520)(i => graft.operators.G711
          .mulawEncode((i * 977) % 8191).toByte), mulaw = true),
      "wav_alaw" -> Multimodal.wavBytesG711(8000,
        Array.tabulate(520)(i => graft.operators.G711
          .alawEncode((i * 977) % 8191).toByte), mulaw = false),
      "wav_ima" -> Multimodal.wavBytesImaAdpcm(8000,
        graft.operators.ImaAdpcm.encodeBlocksMono(
          Array.tabulate(645)(i => ((i * 977) % 8191).toShort), 129), 129),
      "avi_mjpeg" -> Multimodal.aviMjpegBytes(16, 16,
        (0 until 3).map(i => JpegCodec.encodeGray(16, 16, raster(16, 16, 10L + i)))),
      "mp4_mjpeg" -> graft.operators.Mp4Codec.encodeMjpeg(16, 16,
        (0 until 3).map(i => JpegCodec.encodeGray(16, 16, raster(16, 16, 20L + i)))),
      "flac" -> graft.operators.FlacCodec.encodeVerbatim(8000, 2,
        Array.tabulate(1040)(i => ((i * 977) % 8191).toShort), blockSize = 256),
      "mp4_mjpeg_frag" -> graft.operators.Mp4Codec.encodeMjpegFragmented(16, 16,
        (0 until 3).map(i => JpegCodec.encodeGray(16, 16, raster(16, 16, 30L + i))), 2),
      "mp4_mjpeg_frag_audio" -> graft.operators.Mp4Codec.encodeMjpegFragmented(16, 16,
        (0 until 3).map(i => JpegCodec.encodeGray(16, 16, raster(16, 16, 40L + i))), 2,
        withAudioTraf = true),
      "gif" -> graft.operators.GifCodec.encodeGray(24, 24, raster(24, 24, 50L)),
      "gif_interlaced" -> graft.operators.GifCodec.encodeGray(24, 24,
        raster(24, 24, 51L), interlaced = true),
      "gif_local_palette" -> graft.operators.GifCodec.encodeGray(24, 24,
        raster(24, 24, 52L), localPalette = true))
  }

  /** Every decoder that accepts raw payload bytes. */
  private def decodeAll(b: Array[Byte]): Unit = {
    JpegCodec.decodeGray(b)
    PngCodec.decodeGray(b)
    Multimodal.parseDims(b)
    Multimodal.wavPcmMono(b)
    Multimodal.wavPcmEnergies(b, 65)
    Multimodal.wavLegacyDecodeS16(b)
    Multimodal.pcmEnergiesAny(b, 65)
    Multimodal.pcmMonoAny(b)
    Multimodal.pngClass(b)
    Multimodal.aviMjpegFrames(b)
    graft.operators.Mp4Codec.mjpegFrames(b)
    graft.operators.Mp4Codec.dims(b)
    graft.operators.FlacCodec.decodeS16(b)
    graft.operators.FlacCodec.info(b)
    Multimodal.jpegSofClass(b)
    Multimodal.exifOrientation(b)
    graft.operators.Mp4Codec.mjpegFramesFragmented(b)
    graft.operators.GifCodec.decodeGray(b)
    graft.operators.GifCodec.gifClass(b)
  }

  test("every decoder returns on every truncation prefix of every encoder variant") {
    for ((name, payload) <- variants()) {
      var n = 1
      while (n < payload.length) {
        try decodeAll(payload.take(n))
        catch {
          case e: Throwable =>
            fail(s"$name truncated to $n bytes threw ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
        n += 3
      }
    }
  }

  test("every decoder returns promptly on seeded single- and multi-byte corruptions") {
    val rnd = new java.util.Random(8L)
    val t0 = System.nanoTime()
    for ((name, payload) <- variants(); i <- 0 until 400) {
      val c = payload.clone()
      // 1-3 mutations per round: single flips catch local guards,
      // pairs catch guard-then-index sequences (the SOS-slot shape)
      var m = 0
      val nm = 1 + i % 3
      while (m < nm) {
        c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
        m += 1
      }
      try decodeAll(c)
      catch {
        case e: Throwable =>
          fail(s"$name corruption round $i threw ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    assert((System.nanoTime() - t0) < 120e9,
      "the battery must run in bounded time (no corruption may spin a decoder)")
  }
}
