package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.operators.{Sampling, TextOps}

/** Streaming document curation: the stateless stages of the corpus
  * pipeline (quality gate, language gate, deterministic sample) applied
  * to a document STREAM — the shape a continuously-ingesting corpus
  * (crawl drops landing as files) runs instead of a batch rebuild.
  *
  * Because every decision is per-row and keyed on content (md5-bucket
  * sampling, no RNG), the streaming output is EXACTLY the batch output
  * over the same files — no watermark, no state, rerun-stable. Stateful
  * stages (near-dup clustering) stay batch jobs over the curated
  * stream's sink, which is how production pipelines split it too:
  * cheap gates inline at ingest, quadratic-risk dedup in scheduled
  * compactions. */
object DocStream {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Quality + language gate + permille sample — a pure projection +
    * filter (quality metrics append as columns, no self-join), so the
    * same plan runs batch or streaming unchanged. */
  def curate(docs: DataFrame, langs: Seq[String], minWords: Long,
      minQuality: Double, permille: Int): DataFrame = {
    val (_, nWords, _, _, score) = TextOps.qualityCols(col("text"))
    val gated = docs
      .withColumn("n_words", nWords).withColumn("quality_score", score)
      .filter(col("lang").isin(langs: _*) &&
        col("quality_score") >= minQuality && col("n_words") >= minWords)
    Sampling.bernoulli(gated, col("doc_id"), permille)
      .select(col("doc_id"), col("lang"), col("n_words"), col("quality_score"))
  }

  /** Drive the gate over a parquet directory as a stream (AvailableNow)
    * into a memory sink. */
  def runCurateAvailableNow(spark: SparkSession, docsDir: String,
      outName: String, langs: Seq[String] = Seq("en", "de", "fr"),
      minWords: Long = 20, minQuality: Double = 0.6,
      permille: Int = 800): StreamingQuery = {
    val src = spark.readStream.schema(schema).parquet(docsDir)
    val q = curate(src, langs, minWords, minQuality, permille).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(outName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
