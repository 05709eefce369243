package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Training-shard container formats — the two byte layouts training
  * loaders actually stream: POSIX ustar tar archives in the WebDataset
  * convention (each sample's files adjacent under a shared key stem, so
  * a loader reads samples sequentially with zero seeks) and TFRecord
  * (length-prefixed records, each length and payload guarded by a
  * masked CRC-32C). Both are clean-room against the public formats:
  * ustar per POSIX.1-1988 (the `ustar\0` magic header family), TFRecord
  * per the published framing (8-byte LE length, masked CRC32C of the
  * length bytes, payload, masked CRC32C of the payload; mask =
  * rotl(crc,15) + 0xa282ead8). CRC-32C itself is `java.util.zip.CRC32C`
  * (JDK-native since Java 9).
  *
  * Write side: shard = pmod(key, nShards) — content-stable like
  * [[Sharding]]'s md5-mod, so a sample's shard never depends on corpus
  * size — rows repartition to one task per shard and stream to the
  * shard file in key order (deterministic bytes; re-running a shard
  * reproduces it bit-exactly, which is what makes a resumable 100 TB
  * export auditable by hash). Nothing corpus-sized ever sits in memory:
  * the writer holds one 512-byte header buffer / one record frame at a
  * time.
  *
  * Read side: the shard FILE is the parallel unit — the WebDataset
  * convention sizes shards (~1 GB) exactly so that file-level
  * parallelism saturates a cluster without needing tar/TFRecord to be
  * byte-splittable (neither is: tar headers chain, TFRecord frames
  * chain). `binaryFiles` hands each task a PortableDataStream and the
  * parser STREAMS it — headers and payloads are consumed through a
  * DataInputStream, never a whole-file byte array, so a shard larger
  * than executor memory still reads. Every integrity field the format
  * carries is re-verified on read (tar header checksum; both TFRecord
  * CRCs) and reported as a column, never silently trusted — the
  * [[Sharding.verify]] discipline applied to the container layer.
  */
object TrainShards {

  // ---------------------------------------------------------------- tar

  private val Blank = new Array[Byte](512)

  /** One POSIX ustar header block. Octal fields are zero-padded and
    * NUL-terminated; the checksum is the unsigned byte sum of the
    * header with the checksum field taken as eight spaces (the spec's
    * exact rule), stored as six octal digits, NUL, space. */
  private[graft] def tarHeader(name: String, size: Long): Array[Byte] = {
    require(name.getBytes(UTF_8).length <= 100, s"tar name too long: $name")
    val h = new Array[Byte](512)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes(UTF_8); System.arraycopy(b, 0, h, off, b.length)
    }
    def oct(off: Int, width: Int, v: Long): Unit =
      put(off, ("%0" + (width - 1) + "o").format(v) + "\u0000")
    put(0, name)
    oct(100, 8, 420) // mode 0644
    oct(108, 8, 0)   // uid
    oct(116, 8, 0)   // gid
    oct(124, 12, size)
    oct(136, 12, 0)  // mtime 0: deterministic bytes, same stance as gzip MTIME=0
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum as spaces for the sum
    h(156) = '0'     // typeflag: regular file
    put(257, "ustar\u0000" + "00")
    put(265, "graft"); put(297, "graft")
    oct(329, 8, 0); oct(337, 8, 0) // devmajor/devminor
    var sum = 0L
    var i = 0
    while (i < 512) { sum += h(i) & 0xff; i += 1 }
    put(148, "%06o".format(sum) + "\u0000 ")
    h
  }

  /** Shared shard-file writer: `df`'s first column must be the long
    * sample key; `members` turns each row into its (name, bytes) tar
    * members, emitted adjacent in order. One streaming task per shard. */
  private def writeTarShards(df: DataFrame, dir: String, nShards: Int)(
      members: Row => Seq[(String, Array[Byte])]): Unit = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val d = new java.io.File(dir)
    d.mkdirs()
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".tar")).foreach(_.delete())
    val key = col(df.columns.head)
    df.repartition(nShards, pmod(key, lit(nShards)))
      .sortWithinPartitions(pmod(key, lit(nShards)), key)
      .foreachPartition { rows: Iterator[Row] =>
        var cur = -1
        var out: java.io.BufferedOutputStream = null
        def close(): Unit = if (out != null) {
          out.write(Blank); out.write(Blank) // end-of-archive
          out.close(); out = null
        }
        def entry(name: String, data: Array[Byte]): Unit = {
          out.write(tarHeader(name, data.length.toLong))
          out.write(data)
          val pad = (512 - data.length % 512) % 512
          if (pad > 0) out.write(Blank, 0, pad)
        }
        try {
          rows.foreach { r =>
            val id = r.getLong(0)
            val f = (((id % nShards) + nShards) % nShards).toInt
            if (f != cur) {
              close()
              out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(
                new java.io.File(dir, f"shard-$f%05d.tar")))
              cur = f
            }
            members(r).foreach { case (n, b) => entry(n, b) }
          }
        } finally close()
      }
  }

  /** Write `(doc_id, lang, text)` rows as WebDataset-style tar shards
    * `dir/shard-NNNNN.tar`: per sample, `<9-digit id>.json` (the typed
    * metadata sidecar) then `<9-digit id>.txt` (the payload), adjacent
    * under the shared key stem. Archive ends with the spec's two zero
    * blocks. */
  def writeTar(docs: DataFrame, dir: String, nShards: Int): Unit =
    writeTarShards(
      docs.select(col("doc_id").cast("long"), col("lang"), col("text")),
      dir, nShards) { r =>
      val id = r.getLong(0)
      val stem = f"$id%09d"
      Seq(
        stem + ".json" ->
          s"""{"doc_id":$id,"lang":"${r.getString(1)}"}""".getBytes(UTF_8),
        stem + ".txt" -> r.getString(2).getBytes(UTF_8))
    }

  /** The multimodal variant: `(doc_id, payload binary, meta json
    * string)` rows become `<stem>.json` + `<stem>.<ext>` members — the
    * image/audio WebDataset shape, with the payload bytes written
    * verbatim (the container must be byte-transparent; out6b gates
    * that by md5 through the round trip). */
  def writeTarMedia(rows: DataFrame, dir: String, nShards: Int, ext: String): Unit =
    writeTarShards(
      rows.select(col("doc_id").cast("long"), col("payload"), col("meta")),
      dir, nShards) { r =>
      val stem = f"${r.getLong(0)}%09d"
      Seq(
        stem + ".json" -> r.getString(2).getBytes(UTF_8),
        stem + "." + ext -> r.getAs[Array[Byte]](1))
    }

  /** Stream-read tar shards; one task per shard file. Emits one row per
    * member: (shard, name, size, checksum_ok, payload_md5). The header
    * checksum is recomputed per the spec rule and compared to the
    * stored octal — a flipped header byte reports checksum_ok=false
    * with the member still consumed (counted degrade, never a crash or
    * a silent trust). Walk ends at the first all-zero block. */
  def readTar(spark: SparkSession, glob: String): DataFrame = {
    val rows = spark.sparkContext.binaryFiles(glob).flatMap { case (path, pds) =>
      val shard = "shard-(\\d+)\\.tar".r.findFirstMatchIn(path)
        .map(_.group(1).toLong).getOrElse(-1L)
      val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(pds.open()))
      val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Boolean, String)]
      try {
        val hdr = new Array[Byte](512)
        var done = false
        while (!done) {
          var got = 0
          var eof = false
          while (got < 512 && !eof) {
            val n = in.read(hdr, got, 512 - got)
            if (n < 0) eof = true else got += n
          }
          if (eof || hdr.forall(_ == 0)) done = true
          else {
            def str(off: Int, len: Int): String = {
              var end = off
              while (end < off + len && hdr(end) != 0) end += 1
              new String(hdr, off, end - off, UTF_8)
            }
            def octVal(off: Int, len: Int): Long = {
              val s = str(off, len).trim
              if (s.isEmpty) 0L else java.lang.Long.parseLong(s, 8)
            }
            val name = str(0, 100)
            val size = octVal(124, 12)
            val stored = octVal(148, 8)
            var sum = 0L
            var i = 0
            while (i < 512) {
              sum += (if (i >= 148 && i < 156) ' '.toInt else hdr(i) & 0xff)
              i += 1
            }
            val data = new Array[Byte](size.toInt)
            in.readFully(data)
            val pad = ((512 - size % 512) % 512).toInt
            if (pad > 0) in.skipBytes(pad)
            val md = java.security.MessageDigest.getInstance("MD5")
            val hex = md.digest(data).map("%02x".format(_)).mkString
            acc += ((shard, name, size, sum == stored, hex))
          }
        }
      } finally in.close()
      acc
    }
    spark.createDataFrame(rows.map(t => Row(t._1, t._2, t._3, t._4, t._5)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("shard", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("size", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("checksum_ok", org.apache.spark.sql.types.BooleanType),
        org.apache.spark.sql.types.StructField("payload_md5", org.apache.spark.sql.types.StringType))))
  }

  // ----------------------------------------------------------- tfrecord

  /** TFRecord's published CRC mask: rotl32(crc, 15) + 0xa282ead8, on
    * uint32 arithmetic. */
  private[graft] def maskCrc(crc: Long): Long = {
    val c = crc & 0xffffffffL
    ((((c >>> 17) | (c << 15)) & 0xffffffffL) + 0xa282ead8L) & 0xffffffffL
  }

  private[graft] def crc32c(data: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32C()
    c.update(data)
    c.getValue
  }

  private def le64(v: Long): Array[Byte] =
    (0 until 8).map(i => ((v >>> (8 * i)) & 0xff).toByte).toArray
  private def le32(v: Long): Array[Byte] =
    (0 until 4).map(i => ((v >>> (8 * i)) & 0xff).toByte).toArray

  /** One framed record: len (8 LE) + masked_crc32c(len bytes) (4 LE) +
    * data + masked_crc32c(data) (4 LE). */
  private[graft] def tfrecordFrame(data: Array[Byte]): Array[Byte] = {
    val len = le64(data.length.toLong)
    len ++ le32(maskCrc(crc32c(len))) ++ data ++ le32(maskCrc(crc32c(data)))
  }

  /** Write `(doc_id, text)` rows as TFRecord shards
    * `dir/part-NNNNN.tfrecord`, records in doc_id order within each
    * shard (deterministic frame offsets — the round-trip oracle states
    * every record's byte offset closed-form from the payload lengths). */
  def writeTfrecord(docs: DataFrame, dir: String, nShards: Int): Unit = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val d = new java.io.File(dir)
    d.mkdirs()
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".tfrecord")).foreach(_.delete())
    docs.select(col("doc_id").cast("long"), col("text"))
      .repartition(nShards, pmod(col("doc_id"), lit(nShards)))
      .sortWithinPartitions(pmod(col("doc_id"), lit(nShards)), col("doc_id"))
      .foreachPartition { rows: Iterator[Row] =>
        var cur = -1
        var out: java.io.BufferedOutputStream = null
        def close(): Unit = if (out != null) { out.close(); out = null }
        try {
          rows.foreach { r =>
            val id = r.getLong(0)
            val f = (((id % nShards) + nShards) % nShards).toInt
            if (f != cur) {
              close()
              out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(
                new java.io.File(dir, f"part-$f%05d.tfrecord")))
              cur = f
            }
            out.write(tfrecordFrame(r.getString(1).getBytes(UTF_8)))
          }
        } finally close()
      }
  }

  /** Token-id variant: `(doc_id, ids array<long>)` rows frame as
    * int32 LE payloads — the fixed-width id stream a trainer mmaps.
    * Ids must fit int32 (vocabularies do by orders of magnitude);
    * out-of-range throws at write rather than truncating silently. */
  def writeTfrecordInts(docs: DataFrame, dir: String, nShards: Int): Unit = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val d = new java.io.File(dir)
    d.mkdirs()
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".tfrecord")).foreach(_.delete())
    docs.select(col("doc_id").cast("long"), col("ids"))
      .repartition(nShards, pmod(col("doc_id"), lit(nShards)))
      .sortWithinPartitions(pmod(col("doc_id"), lit(nShards)), col("doc_id"))
      .foreachPartition { rows: Iterator[Row] =>
        var cur = -1
        var out: java.io.BufferedOutputStream = null
        def close(): Unit = if (out != null) { out.close(); out = null }
        try {
          rows.foreach { r =>
            val id = r.getLong(0)
            val f = (((id % nShards) + nShards) % nShards).toInt
            if (f != cur) {
              close()
              out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(
                new java.io.File(dir, f"part-$f%05d.tfrecord")))
              cur = f
            }
            val ids = r.getSeq[Long](1)
            val data = new Array[Byte](ids.length * 4)
            var i = 0
            ids.foreach { v =>
              require(v >= Int.MinValue && v <= Int.MaxValue, s"id $v exceeds int32")
              data(i) = (v & 0xff).toByte
              data(i + 1) = ((v >>> 8) & 0xff).toByte
              data(i + 2) = ((v >>> 16) & 0xff).toByte
              data(i + 3) = ((v >>> 24) & 0xff).toByte
              i += 4
            }
            out.write(tfrecordFrame(data))
          }
        } finally close()
      }
  }

  /** Read token-id TFRecord shards and PARSE the int32 payload back:
    * emits (shard, rec_index, offset, length, len_crc_ok, data_crc_ok,
    * n_ids, ids_sum, ids_dot) where ids_dot = Σ position·id (1-based)
    * — an order-sensitive checksum of the id SEQUENCE, so the oracle
    * can convict a right-multiset-wrong-order serialization, not just
    * missing ids. A length not divisible by 4 reports n_ids = -1
    * (framing intact, payload shape wrong — a counted degrade). */
  def readTfrecordInts(spark: SparkSession, glob: String): DataFrame = {
    val rows = spark.sparkContext.binaryFiles(glob).flatMap { case (path, pds) =>
      val shard = "part-(\\d+)\\.tfrecord".r.findFirstMatchIn(path)
        .map(_.group(1).toLong).getOrElse(-1L)
      val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(pds.open()))
      val acc = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long, Boolean, Boolean, Long, Long, Long)]
      try {
        var offset = 0L
        var idx = 0L
        var done = false
        while (!done) {
          val lenBuf = new Array[Byte](8)
          var got = 0
          var eof = false
          while (got < 8 && !eof) {
            val n = in.read(lenBuf, got, 8 - got)
            if (n < 0) eof = true else got += n
          }
          if (eof) done = true
          else {
            val len = (0 until 8).map(i => (lenBuf(i) & 0xffL) << (8 * i)).sum
            val lenCrcBuf = new Array[Byte](4)
            in.readFully(lenCrcBuf)
            val lenCrc = (0 until 4).map(i => (lenCrcBuf(i) & 0xffL) << (8 * i)).sum
            val lenOk = maskCrc(crc32c(lenBuf)) == lenCrc
            if (len < 0 || len > Int.MaxValue - 16) done = true
            else {
              val data = new Array[Byte](len.toInt)
              in.readFully(data)
              val dataCrcBuf = new Array[Byte](4)
              in.readFully(dataCrcBuf)
              val dataCrc = (0 until 4).map(i => (dataCrcBuf(i) & 0xffL) << (8 * i)).sum
              val dataOk = maskCrc(crc32c(data)) == dataCrc
              var nIds = -1L
              var sum = 0L
              var dot = 0L
              if (len % 4 == 0) {
                nIds = len / 4
                var p = 0
                while (p < data.length) {
                  val v = (data(p) & 0xffL) | ((data(p + 1) & 0xffL) << 8) |
                    ((data(p + 2) & 0xffL) << 16) | ((data(p + 3) & 0xffL) << 24)
                  val sv = v.toInt.toLong // sign-extend back from int32
                  sum += sv
                  dot += (p / 4 + 1) * sv
                  p += 4
                }
              }
              acc += ((shard, idx, offset, len, lenOk, dataOk, nIds, sum, dot))
              offset += 16 + len
              idx += 1
            }
          }
        }
      } finally in.close()
      acc
    }
    spark.createDataFrame(
      rows.map(t => Row(t._1, t._2, t._3, t._4, t._5, t._6, t._7, t._8, t._9)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("shard", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("rec_index", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("offset", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("len_crc_ok", org.apache.spark.sql.types.BooleanType),
        org.apache.spark.sql.types.StructField("data_crc_ok", org.apache.spark.sql.types.BooleanType),
        org.apache.spark.sql.types.StructField("n_ids", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ids_sum", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ids_dot", org.apache.spark.sql.types.LongType))))
  }

  /** Stream-read TFRecord shards; one task per shard file. Emits one
    * row per record: (shard, rec_index, offset, length, len_crc_ok,
    * data_crc_ok, payload_md5). Both CRCs re-verify on read; a
    * corrupted frame reports its flag false and the walk continues at
    * the length the frame claimed (the recoverable-corruption stance:
    * one bad record never voids a shard). A length field damaged badly
    * enough to be unparseable (negative / past EOF) ends the walk —
    * framing is lost, and the rows already emitted still carry their
    * verdicts. */
  def readTfrecord(spark: SparkSession, glob: String): DataFrame = {
    val rows = spark.sparkContext.binaryFiles(glob).flatMap { case (path, pds) =>
      val shard = "part-(\\d+)\\.tfrecord".r.findFirstMatchIn(path)
        .map(_.group(1).toLong).getOrElse(-1L)
      val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(pds.open()))
      val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Boolean, Boolean, String)]
      try {
        var offset = 0L
        var idx = 0L
        var done = false
        while (!done) {
          val lenBuf = new Array[Byte](8)
          var got = 0
          var eof = false
          while (got < 8 && !eof) {
            val n = in.read(lenBuf, got, 8 - got)
            if (n < 0) eof = true else got += n
          }
          if (eof && got == 0) done = true
          else if (eof) done = true // truncated mid-header: framing lost
          else {
            val len = (0 until 8).map(i => (lenBuf(i) & 0xffL) << (8 * i)).sum
            val lenCrcBuf = new Array[Byte](4)
            in.readFully(lenCrcBuf)
            val lenCrc = (0 until 4).map(i => (lenCrcBuf(i) & 0xffL) << (8 * i)).sum
            val lenOk = maskCrc(crc32c(lenBuf)) == lenCrc
            if (len < 0 || len > Int.MaxValue - 16) done = true
            else {
              val data = new Array[Byte](len.toInt)
              in.readFully(data)
              val dataCrcBuf = new Array[Byte](4)
              in.readFully(dataCrcBuf)
              val dataCrc = (0 until 4).map(i => (dataCrcBuf(i) & 0xffL) << (8 * i)).sum
              val dataOk = maskCrc(crc32c(data)) == dataCrc
              val md = java.security.MessageDigest.getInstance("MD5")
              val hex = md.digest(data).map("%02x".format(_)).mkString
              acc += ((shard, idx, offset, len, lenOk, dataOk, hex))
              offset += 16 + len
              idx += 1
            }
          }
        }
      } finally in.close()
      acc
    }
    spark.createDataFrame(
      rows.map(t => Row(t._1, t._2, t._3, t._4, t._5, t._6, t._7)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("shard", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("rec_index", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("offset", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("len_crc_ok", org.apache.spark.sql.types.BooleanType),
        org.apache.spark.sql.types.StructField("data_crc_ok", org.apache.spark.sql.types.BooleanType),
        org.apache.spark.sql.types.StructField("payload_md5", org.apache.spark.sql.types.StringType))))
  }
}
