package graft.operators

/** Clean-room ITU-T G.711 companding — the µ-law and A-law codecs
  * legacy WAV archives (telephony dumps, voicemail corpora, old rips)
  * store one byte per sample in. Both are memoryless 8-bit log
  * quantizers over the public segment tables, so the decoders are pure
  * integer table arithmetic, deterministic on any platform.
  *
  * The property the m5d fixture leans on — and the specs pin
  * exhaustively over all 65536 inputs — is IDEMPOTENCY:
  * `encode(decode(encode(s))) == encode(s)`, i.e. `decode ∘ encode` is
  * a projection onto the codec's output lattice. A clip whose samples
  * are drawn from that lattice survives a coded round trip EXACTLY,
  * which is what lets a closed-form SQL oracle gate a lossy-codec
  * pipeline without any tolerance band.
  *
  * Conventions: 16-bit two's-complement samples in and out (the
  * classic G.711 reference shape — µ-law mantissa shift `seg + 3` with
  * bias 0x84 and clip 32635; A-law on the 13-bit magnitude `>> 3` with
  * the 0x55 toggle). Code bytes are the wire values. */
object G711 {

  private val Bias = 0x84 // µ-law bias
  private val Clip = 32635
  private val SegUEnd = Array(0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF)
  private val SegAEnd = Array(0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF)

  private def seg(v: Int, ends: Array[Int]): Int = {
    var i = 0
    while (i < ends.length && v > ends(i)) i += 1
    i
  }

  /** 16-bit sample → µ-law code byte (0..255). */
  def mulawEncode(pcm16: Int): Int = {
    var v = pcm16
    val mask = if (v < 0) { v = -v; 0x7f } else 0xff
    if (v > Clip) v = Clip
    v += Bias
    val s = seg(v, SegUEnd)
    if (s >= 8) 0x7f ^ mask
    else (((s << 4) | ((v >> (s + 3)) & 0xf)) ^ mask) & 0xff
  }

  /** µ-law code byte → 16-bit sample (a point of the decode lattice). */
  def mulawDecode(code: Int): Int = {
    val u = ~code & 0xff
    var t = ((u & 0xf) << 3) + Bias
    t <<= (u & 0x70) >> 4
    if ((u & 0x80) != 0) Bias - t else t - Bias
  }

  /** 16-bit sample → A-law code byte (0..255). */
  def alawEncode(pcm16: Int): Int = {
    var v = pcm16 >> 3 // 13-bit magnitude domain
    val mask = if (v >= 0) 0xd5 else { v = -v - 1; 0x55 }
    val s = seg(v, SegAEnd)
    if (s >= 8) (0x7f ^ mask) & 0xff
    else {
      var a = s << 4
      a |= (if (s < 2) v >> 1 else v >> s) & 0xf
      (a ^ mask) & 0xff
    }
  }

  /** A-law code byte → 16-bit sample (a point of the decode lattice). */
  def alawDecode(code: Int): Int = {
    val a = (code ^ 0x55) & 0xff
    var t = (a & 0xf) << 4
    ((a & 0x70) >> 4) match {
      case 0 => t += 8
      case 1 => t += 0x108
      case s => t += 0x108; t <<= s - 1
    }
    if ((a & 0x80) != 0) t else -t
  }
}
