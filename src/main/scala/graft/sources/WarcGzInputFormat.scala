package graft.sources

import org.apache.hadoop.fs.{FSDataInputStream, Path}
import org.apache.hadoop.io.{BytesWritable, LongWritable}
import org.apache.hadoop.mapreduce.{InputSplit, JobContext, RecordReader, TaskAttemptContext}
import org.apache.hadoop.mapreduce.lib.input.{FileInputFormat, FileSplit}

/** Splittable Hadoop input format for per-record-gzip `.warc.gz` files
  * (the CommonCrawl convention: every WARC record is its OWN gzip
  * member, members concatenated — RFC 1952 multi-member, ISO 28500's
  * record-at-time compression recommendation). Hadoop's stock gzip
  * codec treats a whole file as one unsplittable stream; this format
  * instead gives each task a byte range and RESYNCHRONIZES at the next
  * gzip member boundary, so one multi-GB crawl file parallelizes
  * across tasks like the uncompressed path.
  *
  * Record = one decompressed member (key = the member's compressed
  * start offset). Ownership rule: a member whose first header byte
  * lies in [split.start, split.end) belongs to this split and may
  * FINISH past `end` (positioned reads past the range are fine) — the
  * same convention Hadoop's line reader uses for straddling lines, so
  * every member is read exactly once across splits.
  *
  * Resync: scan for the 3-byte member magic `1f 8b 08`, parse the full
  * RFC 1952 header (FEXTRA/FNAME/FCOMMENT/FHCRC), inflate raw, and
  * accept ONLY when the CRC32 and ISIZE trailer both verify — a false
  * magic inside compressed payload bytes fails one of these and the
  * scan resumes one byte later. (The caller additionally checks the
  * decompressed content starts with "WARC/1.0\r\n"; a verified member
  * of some OTHER gzip content is skipped whole.) Memory per task is
  * one compressed member + a 1 MiB scan window — records stream, the
  * file never buffers whole. Decompressed members are capped at 256
  * MiB (a WARC record is page-sized; past the cap is a zip bomb, and
  * the member degrades to a skip, never an OOM). */
class WarcGzInputFormat extends FileInputFormat[LongWritable, BytesWritable] {
  override def isSplitable(context: JobContext, filename: Path): Boolean = true
  override def createRecordReader(split: InputSplit,
      context: TaskAttemptContext): RecordReader[LongWritable, BytesWritable] =
    new WarcGzRecordReader
}

private[sources] class WarcGzRecordReader
    extends RecordReader[LongWritable, BytesWritable] {

  private val MaxMember = 1 << 28 // 256 MiB decompressed cap per member
  // RFC 1952 header allowance: FEXTRA is u16-bounded, FNAME/FCOMMENT are
  // path-sized strings in any real member — a header whose zero-
  // terminated strings run past this is crafted, and unbounded scanning
  // would grow the window (and the doubling buffer) without limit
  private val MaxHeader = 1 << 16

  private var in: FSDataInputStream = _
  private var start = 0L
  private var end = 0L
  private var fileLen = 0L
  private var scanPos = 0L

  private val key = new LongWritable()
  private var value: BytesWritable = _

  // sliding window over the file: buf(0) is absolute offset bufOff
  private var buf = new Array[Byte](1 << 16)
  private var bufOff = 0L
  private var bufLen = 0

  override def initialize(split: InputSplit, context: TaskAttemptContext): Unit = {
    val fsplit = split.asInstanceOf[FileSplit]
    val path = fsplit.getPath
    val fs = path.getFileSystem(context.getConfiguration)
    in = fs.open(path)
    fileLen = fs.getFileStatus(path).getLen
    start = fsplit.getStart
    end = start + fsplit.getLength
    scanPos = start
    bufOff = start
    bufLen = 0
  }

  /** Fill the window through `absEnd` (clamped to EOF); returns the
    * absolute end of valid bytes. Positioned reads — no seek state. */
  private def fillTo(absEnd: Long): Long = {
    val tgt = math.min(absEnd, fileLen)
    if (bufOff + bufLen >= tgt) return bufOff + bufLen
    val need = (tgt - bufOff).toInt
    if (need > buf.length) {
      // Long doubling: the Int shift overflowed to an infinite loop
      // once a (crafted) member demanded a >2^30 window; the input cap
      // in tryMember bounds real growth, this keeps the math total
      var n = buf.length.toLong
      while (n < need) n *= 2
      // clamp: under the header + fed caps `need` stays well below
      // 2^30, but a clamped copy keeps n.toInt from ever going
      // negative (NegativeArraySizeException would KILL the task —
      // tryMember's degrade catch covers index errors, not VM errors)
      buf = java.util.Arrays.copyOf(buf, math.min(n, (Int.MaxValue - 8).toLong).toInt)
    }
    val readLen = (tgt - (bufOff + bufLen)).toInt
    in.readFully(bufOff + bufLen, buf, bufLen, readLen)
    bufLen += readLen
    bufOff + bufLen
  }

  private def b(abs: Long): Byte = buf((abs - bufOff).toInt)

  /** Drop window bytes below scanPos once they exceed the 1 MiB scan
    * allowance — everything before the next candidate is never re-read. */
  private def compact(): Unit =
    if (scanPos - bufOff > (1 << 20)) {
      val drop = (scanPos - bufOff).toInt
      System.arraycopy(buf, drop, buf, 0, bufLen - drop)
      bufOff += drop
      bufLen -= drop
    }

  /** Next gzip magic at an absolute offset in [from, end), or -1. */
  private def findMagic(from: Long): Long = {
    var p = from
    while (p < end) {
      val have = fillTo(math.min(p + (1 << 16), end + 2))
      if (have < p + 3) return -1 // EOF before a full magic can start
      val scanTo = math.min(have - 2, end)
      while (p < scanTo) {
        if (b(p) == 0x1f && b(p + 1) == 0x8b.toByte && b(p + 2) == 0x08) return p
        p += 1
      }
      if (have >= end + 2 || have >= fileLen) return -1
    }
    -1
  }

  /** Attempt a full member decode at absolute offset `p`: RFC 1952
    * header parse, raw inflate, CRC32 + ISIZE trailer verification.
    * Some((decompressed, compressedMemberLength)) only when everything
    * checks out. */
  private def tryMember(p: Long): Option[(Array[Byte], Long)] = {
    try {
      var q = p + 10
      if (fillTo(q) < q) return None
      val flg = b(p + 3) & 0xff
      if ((flg & 0xe0) != 0) return None // reserved FLG bits must be 0
      if ((flg & 0x04) != 0) { // FEXTRA
        if (fillTo(q + 2) < q + 2) return None
        val xlen = (b(q) & 0xff) | ((b(q + 1) & 0xff) << 8)
        q += 2 + xlen
        if (fillTo(q) < q) return None
      }
      def skipZstr(): Boolean = {
        var going = true
        while (going) {
          // bound the header scan: a crafted FNAME/FCOMMENT with no
          // terminator would otherwise push q to EOF, buffering the
          // rest of the file before the member could fail
          if (q - p > MaxHeader) return false
          if (fillTo(q + 1) < q + 1) return false
          val v = b(q); q += 1
          if (v == 0) going = false
        }
        true
      }
      if ((flg & 0x08) != 0 && !skipZstr()) return None // FNAME
      if ((flg & 0x10) != 0 && !skipZstr()) return None // FCOMMENT
      if ((flg & 0x02) != 0) { q += 2; if (fillTo(q) < q) return None } // FHCRC
      val inf = new java.util.zip.Inflater(true)
      try {
        val out = new java.io.ByteArrayOutputStream(4096)
        val tmp = new Array[Byte](8192)
        var fed = 0L
        while (!inf.finished()) {
          if (inf.needsInput()) {
            // input-side twin of the zip-bomb cap: a member may not
            // CONSUME more than MaxMember compressed bytes either — a
            // crafted stream of empty non-final blocks would otherwise
            // grow the window without ever producing output
            if (fed > MaxMember) return None
            val absFrom = q + fed
            val have = fillTo(absFrom + 8192)
            val n = (have - absFrom).toInt
            if (n <= 0) return None // EOF mid-member
            inf.setInput(buf, (absFrom - bufOff).toInt, n)
            fed += n
          }
          val n = inf.inflate(tmp)
          if (n > 0) {
            if (out.size + n > MaxMember) return None // zip-bomb cap
            out.write(tmp, 0, n)
          } else if (!inf.finished() && inf.needsDictionary()) return None
        }
        val dataEnd = q + (fed - inf.getRemaining)
        if (fillTo(dataEnd + 8) < dataEnd + 8) return None // truncated trailer
        val data = out.toByteArray
        val crc = new java.util.zip.CRC32()
        crc.update(data)
        def le32(at: Long): Long =
          (0 until 4).map(i => (b(at + i) & 0xffL) << (8 * i)).sum
        if (le32(dataEnd) != crc.getValue) return None
        if (le32(dataEnd + 4) != (data.length.toLong & 0xffffffffL)) return None
        Some((data, dataEnd + 8 - p))
      } finally inf.end()
    } catch {
      case _: java.util.zip.DataFormatException => None
      case _: java.io.IOException => None
      case _: IndexOutOfBoundsException => None
      // belt-and-braces for the buffer clamp above: if a crafted
      // header still drives an allocation-size error, degrade the
      // member rather than kill the task
      case _: NegativeArraySizeException => None
    }
  }

  override def nextKeyValue(): Boolean = {
    while (scanPos < end) {
      compact()
      val p = findMagic(scanPos)
      if (p < 0) { scanPos = end; return false }
      tryMember(p) match {
        case Some((data, len))
            if data.length > WarcSource.DelimBytes.length && {
              var i = 0; var eq = true
              while (eq && i < WarcSource.DelimBytes.length) {
                eq = data(i) == WarcSource.DelimBytes(i); i += 1
              }
              eq
            } =>
          key.set(p)
          value = new BytesWritable(data)
          scanPos = p + len
          return true
        case Some((_, len)) =>
          scanPos = p + len // verified member of non-WARC content: skip whole
        case None =>
          scanPos = p + 1 // false magic: resume scan one byte later
      }
    }
    false
  }

  override def getCurrentKey: LongWritable = key
  override def getCurrentValue: BytesWritable = value
  override def getProgress: Float =
    if (end == start) 1.0f
    else math.min(1.0f, (scanPos - start).toFloat / (end - start))
  override def close(): Unit = if (in != null) in.close()
}
