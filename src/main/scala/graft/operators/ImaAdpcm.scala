package graft.operators

/** Clean-room IMA/DVI ADPCM (the public IMA Digital Audio Pack
  * algorithm, WAV format tag 0x11) — the 4-bit adaptive-delta codec
  * legacy WAV archives compress speech with. The nibble arithmetic is
  * the published step/index table recurrence; the WAV framing is the
  * standard block layout (per-block 4-byte header carrying the first
  * sample verbatim plus the step index, then two nibbles per byte, low
  * nibble first), which is what makes decode state BLOCK-LOCAL: every
  * block decodes independently of its neighbors — the property the
  * m5d fixture aligns with its energy windows so a one-window edit
  * stays a one-window (≤2 fingerprint bits) difference.
  *
  * Decoding is exactly deterministic integer arithmetic; encoding is
  * the standard greedy quantizer whose state is updated through the
  * decoder's own reconstruction, so `decodeBlocks(encodeBlocks(s))`
  * is a deterministic (lossy) projection — the fixture stores THAT
  * projection as the PCM twin of every coded clip, making cross-storage
  * fingerprints equal by construction rather than by tolerance.
  *
  * Scope: mono (telephony's shape; the m5 stereo coverage rides PCM
  * and FLAC). Degrade-never-kill: the WAV-side caller validates block
  * geometry before calling in. */
object ImaAdpcm {

  private val IndexAdjust = Array(-1, -1, -1, -1, 2, 4, 6, 8)
  private val StepTable = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
    598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
    1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
    5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635,
    13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Mutable codec state: predictor (s16) + step index (0..88). */
  final class State(var pred: Int, var index: Int)

  private def clampIndex(i: Int): Int = if (i < 0) 0 else if (i > 88) 88 else i
  private def clampS16(v: Int): Int =
    if (v > 32767) 32767 else if (v < -32768) -32768 else v

  /** Reconstruct one 4-bit code against the state; returns the new
    * predictor (the decoded sample). */
  def decodeNibble(code: Int, st: State): Int = {
    val step = StepTable(st.index)
    var diff = step >> 3
    if ((code & 4) != 0) diff += step
    if ((code & 2) != 0) diff += step >> 1
    if ((code & 1) != 0) diff += step >> 2
    st.pred = clampS16(if ((code & 8) != 0) st.pred - diff else st.pred + diff)
    st.index = clampIndex(st.index + IndexAdjust(code & 7))
    st.pred
  }

  /** Quantize one sample against the state (standard greedy bit
    * ladder), updating the state through [[decodeNibble]]'s own
    * reconstruction so encoder and decoder states track exactly. */
  def encodeNibble(sample: Int, st: State): Int = {
    val step = StepTable(st.index)
    var diff = sample - st.pred
    var code = 0
    if (diff < 0) { code = 8; diff = -diff }
    var s = step
    if (diff >= s) { code |= 4; diff -= s }
    s >>= 1
    if (diff >= s) { code |= 2; diff -= s }
    s >>= 1
    if (diff >= s) code |= 1
    decodeNibble(code, st)
    code
  }

  /** Samples a block of `samplesPerBlock` frames occupies on the wire:
    * 4-byte header + 2 samples/byte for the rest. */
  def blockAlign(samplesPerBlock: Int): Int = 4 + (samplesPerBlock - 1 + 1) / 2

  /** Encode mono samples into standard WAV IMA blocks of
    * `samplesPerBlock` frames each (the last block zero-padded in the
    * nibble stream if the input is short). Each block is SELF-RESET:
    * header predictor = the block's first sample, header index = 0 —
    * block content is a function of the block's samples alone. */
  def encodeBlocksMono(samples: Array[Short], samplesPerBlock: Int): Array[Byte] = {
    require(samplesPerBlock >= 2 && samplesPerBlock % 2 == 1,
      s"samplesPerBlock must be odd >= 3 (header sample + nibble pairs), got $samplesPerBlock")
    val nBlocks = (samples.length + samplesPerBlock - 1) / samplesPerBlock
    val ba = blockAlign(samplesPerBlock)
    val out = new Array[Byte](nBlocks * ba)
    var blk = 0
    while (blk < nBlocks) {
      val s0 = blk * samplesPerBlock
      val first = samples(s0).toInt
      val off = blk * ba
      out(off) = (first & 0xff).toByte
      out(off + 1) = ((first >> 8) & 0xff).toByte
      out(off + 2) = 0 // step index (self-reset)
      out(off + 3) = 0 // reserved
      val st = new State(first, 0)
      var i = 1
      while (i < samplesPerBlock) {
        val sm = if (s0 + i < samples.length) samples(s0 + i).toInt else 0
        val lo = encodeNibble(sm, st)
        val hi = if (i + 1 < samplesPerBlock) {
          val sm2 = if (s0 + i + 1 < samples.length) samples(s0 + i + 1).toInt else 0
          encodeNibble(sm2, st)
        } else 0
        out(off + 4 + (i - 1) / 2) = ((hi << 4) | lo).toByte
        i += 2
      }
      blk += 1
    }
    out
  }

  /** Decode mono WAV IMA blocks back to samples — the exact inverse
    * framing of [[encodeBlocksMono]], and the decode path the real WAV
    * reader uses. `data` must be whole blocks of `blockAlign` bytes;
    * the caller validates geometry. */
  def decodeBlocksMono(data: Array[Byte], from: Int, nBlocks: Int,
      samplesPerBlock: Int): Array[Short] = {
    val ba = blockAlign(samplesPerBlock)
    val out = new Array[Short](nBlocks * samplesPerBlock)
    var blk = 0
    while (blk < nBlocks) {
      val off = from + blk * ba
      val first = ((data(off + 1) << 8) | (data(off) & 0xff)).toShort
      val idx = data(off + 2) & 0xff
      val st = new State(first, clampIndex(idx))
      val o0 = blk * samplesPerBlock
      out(o0) = first
      var i = 1
      while (i < samplesPerBlock) {
        val b = data(off + 4 + (i - 1) / 2) & 0xff
        out(o0 + i) = decodeNibble(b & 0xf, st).toShort
        if (i + 1 < samplesPerBlock)
          out(o0 + i + 1) = decodeNibble(b >> 4, st).toShort
        i += 2
      }
      blk += 1
    }
    out
  }
}
