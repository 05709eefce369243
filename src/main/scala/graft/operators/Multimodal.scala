package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed in partition-sized batches.
  *
  * The real decode libraries (JPEG/PNG/audio codecs) are NOT in this
  * container, so `decodeStub` is a clearly-marked deterministic fake —
  * but everything Spark-side is real and tested: the schema
  * (binary + struct metadata), the batched `mapPartitions` execution
  * shape (the Scala analog of `mapInPandas` — one iterator per
  * partition, amortizing model/codec init), partitioning control, and
  * the feature-column contract downstream ops consume.
  *
  * Scale: payloads never pass through a shuffle — metadata extraction is
  * map-only; `repartition(n)` bounds batch memory (payload bytes per
  * task), the knob the 300-item audience batches of the reference tuned
  * by hand (`mailchimp/src/members.rs:130-134`).
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

  /** STUB decode: a real implementation would decode the payload with an
    * image/audio codec here (one codec init per partition, amortized over
    * the iterator — the reason this is mapPartitions, not a per-row UDF).
    * The fake derives deterministic pseudo-features from the bytes so the
    * plumbing (batching, schema, downstream consumption) is testable. */
  private def decodeStub(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val n = payload.length
    val w = 16 + (n % 64)
    val h = 16 + ((n / 64) % 64)
    val feat = new Array[Float](8)
    var i = 0
    while (i < n) { feat(i % 8) += (payload(i) & 0xff) / 255.0f; i += 1 }
    (w, h, feat)
  }

  /** Batched feature extraction over partitions. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init happens here (codec/model handles)
      rows.map { r =>
        val (w, h, feat) = decodeStub(r.payload)
        MediaFeatures(r.doc_id, r.mime, r.payload.length.toLong, w, h, feat)
      }
    }
  }

  /** Deterministic frame-sample analog: pick every k-th byte window as a
    * "frame" offset list — stands in for video frame sampling. */
  def frameOffsets(media: Dataset[MediaRow], k: Int): DataFrame =
    media.toDF().select(col("doc_id"),
      filter(sequence(lit(0), length(col("payload")) - 1),
        i => i % k === 0).as("frame_offsets"))

  /** Resize plumbing: aspect-preserving fit into a maxDim bounding box —
    * the metadata contract a real resize kernel satisfies (never
    * upscales; floor semantics; at scale the pixel work runs inside the
    * same mapPartitions pass as decode so payloads are scanned once). */
  def resizeMeta(features: Dataset[MediaFeatures], maxDim: Int): DataFrame =
    features.toDF()
      .withColumn("scale",
        least(lit(1.0), lit(maxDim.toDouble) / greatest(col("width"), col("height"))))
      .select(col("doc_id"), col("width"), col("height"),
        floor(col("width") * col("scale")).cast("int").as("out_w"),
        floor(col("height") * col("scale")).cast("int").as("out_h"))
}
