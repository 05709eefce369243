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

  /** Broadcastable corpus fingerprint for streaming admission: a bloom
    * filter over content hashes (exact dups) and one over MinHash band
    * signatures (near-dup candidates), both keyed by the portable 60-bit
    * md5 hash. A few MB regardless of corpus size — the artifact a batch
    * job publishes so ingest can gate against a 100 TB corpus without
    * touching it. */
  final case class CorpusFingerprint(
      contentHashes: org.apache.spark.util.sketch.BloomFilter,
      bandSigs: org.apache.spark.util.sketch.BloomFilter)

  private def contentKey(text: org.apache.spark.sql.Column) =
    graft.functions.F.portableHash60(md5(text), 0)

  /** The 4 per-doc band-signature keys as columns (no explode — the
    * stream side needs them row-local). Must derive identically to
    * [[fingerprint]]'s build side: band index ':' comma-joined sigs. */
  private def bandKeys(sigs: org.apache.spark.sql.Column): Seq[org.apache.spark.sql.Column] =
    (0 until 4).map { b =>
      graft.functions.F.portableHash60(
        concat_ws(":", lit(b), concat_ws(",",
          (0 until 4).map(r => element_at(sigs, b * 4 + r + 1)): _*)), 1)
    }

  /** Build the fingerprint from the existing corpus — a batch job with
    * two bloom collects (same cost class as two broadcast builds). */
  def fingerprint(corpus: DataFrame, fpp: Double = 0.001): CorpusFingerprint = {
    import graft.operators.NearDup
    import graft.plans.BloomJoin
    val hashes = corpus.select(contentKey(col("text")).as("k"))
    val sigs = NearDup.minhashSigs(corpus, col("doc_id"), col("text"))
    val banded = sigs.select(explode(array(bandKeys(col("sigs")): _*)).as("k"))
    CorpusFingerprint(
      BloomJoin.buildFilter(hashes, col("k"), fpp),
      BloomJoin.buildFilter(banded, col("k"), fpp))
  }

  /** Streaming corpus-admission gate — the stream twin of batch d8
    * ([[graft.operators.NearDup.incremental]]): admit only documents
    * that are neither exact dups of the corpus (content-hash bloom) nor
    * near-dup CANDIDATES (any MinHash band signature present in the
    * corpus bloom). A pure per-row map over two broadcast blooms — no
    * state, no watermark, rerun-stable, so the same plan runs batch or
    * streaming unchanged.
    *
    * Semantics vs batch d8, by construction of the approximation:
    *  - no true exact dup is ever admitted (blooms have no false
    *    negatives);
    *  - band candidates are rejected WITHOUT the exact-Jaccard verify
    *    (row-local decision), so admission is conservative: admitted ⊆
    *    d8's admitted, with ~fpp extra over-rejection;
    *  - intra-stream dups pass (stateless) — they belong to the
    *    scheduled compaction (batch d8), the same split as the curation
    *    gate's docs. */
  def admit(docs: DataFrame, fp: CorpusFingerprint): DataFrame = {
    import graft.plans.BloomJoin
    val sigs = graft.plans.TextHashExprs.minhashSigs(lower(col("text")), 16, 3)
    val bandHit = bandKeys(col("__sigs"))
      .map(k => BloomJoin.mightContain(k, fp.bandSigs))
      .reduce(_ || _)
    docs
      .withColumn("__exact", BloomJoin.mightContain(contentKey(col("text")), fp.contentHashes))
      .withColumn("__sigs", sigs)
      .withColumn("__near", col("__sigs").isNotNull && bandHit)
      .filter(!col("__exact") && !col("__near"))
      .drop("__exact", "__sigs", "__near")
  }

  /** The lm1 coverage gate as a ROW-LOCAL streaming stage stacked on
    * [[admit]]: the top-V reference bigram set rides as an IN-set
    * literal (Catalyst compiles a >10-element isin to a hashed InSet,
    * so the per-bigram probe is O(1) with no join), hits are counted by
    * a per-row array filter, and the keep decision is the identical
    * BIGINT-count rule — so the admitted set is EXACTLY
    * `admit ∩ LmFilter.coverageGate(kept)` over the same rows, with no
    * state and no watermark. The batch path keeps the broadcast join
    * ([[graft.operators.LmFilter.coverageGate]]); this in-row variant
    * is the streaming-shaped twin of the same model, published alongside
    * the corpus fingerprint (V strings — a few KB). */
  def admitWithCoverage(docs: DataFrame, fp: CorpusFingerprint,
      refBigrams: Seq[String]): DataFrame = {
    val tk = graft.functions.F.tokens(lower(col("text")))
    val bgs = when(size(tk) >= 2, expr(
      "transform(sequence(1, size(__tk) - 1), i -> concat(__tk[i-1], ' ', __tk[i]))"))
      .otherwise(array().cast("array<string>"))
    val gated = admit(docs, fp)
      .withColumn("__tk", tk)
      .withColumn("__hits", size(filter(bgs, b => b.isin(refBigrams: _*))).cast("long"))
      .withColumn("__tot", greatest(size(col("__tk")) - 1, lit(0)).cast("long"))
      .filter(col("__hits") * 2 >= col("__tot"))
    gated.drop("__tk", "__hits", "__tot")
  }

  /** Drive the admission gate over a parquet directory as a stream
    * (AvailableNow) into a memory sink. */
  def runAdmitAvailableNow(spark: SparkSession, docsDir: String,
      fp: CorpusFingerprint, outName: String): StreamingQuery = {
    val src = spark.readStream.schema(schema).parquet(docsDir)
    val q = admit(src, fp).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(outName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Drive the admission + coverage gate over a parquet directory as a
    * stream (AvailableNow) into a memory sink. */
  def runAdmitCoverageAvailableNow(spark: SparkSession, docsDir: String,
      fp: CorpusFingerprint, refBigrams: Seq[String],
      outName: String): StreamingQuery = {
    val src = spark.readStream.schema(schema).parquet(docsDir)
    val q = admitWithCoverage(src, fp, refBigrams).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(outName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Streaming epoch-mixture fan-out: [[graft.operators.Sampling.epochs]]
    * applied in-flight — each arriving doc is replicated into its
    * per-stratum epoch copies as it lands, so ingest emits the training
    * mixture directly instead of staging a raw corpus and re-exploding
    * it in batch. The recipe is stateless row-local arithmetic
    * (integer DIV/MOD + one md5-bucket compare + generate), so stream
    * output ≡ batch [[graft.operators.Sampling.epochs]] row-for-row at
    * any trigger cadence, and a replayed micro-batch emits identical
    * copies (idempotent under at-least-once sources keyed on
    * (doc_id, epoch)). */
  def runEpochsAvailableNow(spark: SparkSession, docsDir: String,
      rates: Map[String, Long], outName: String): StreamingQuery = {
    val src = spark.readStream.schema(schema).parquet(docsDir)
    val q = Sampling.epochs(src.select(col("doc_id"), col("lang"), col("source")),
        col("doc_id"), col("lang"), rates).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(outName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Broadcastable benchmark fingerprint for streaming decontamination:
    * a bloom over the benchmark's stride-1 `n`-token window hashes
    * (c7's hash carrier). Eval suites are MBs, so the bloom is KBs —
    * the artifact a batch job publishes so ingest can gate against
    * every benchmark without joining anything. */
  def benchFingerprint(bench: DataFrame, n: Int,
      fpp: Double = 0.001): org.apache.spark.util.sketch.BloomFilter =
    graft.plans.BloomJoin.buildFilter(
      graft.operators.NearDup.windowHashes(bench, col("doc_id"), col("text"), n),
      col("h"), fpp)

  /** Streaming contamination gate — the stream twin of the c7 scan's
    * KEEP/DROP decision: a document is dropped when ANY of its stride-1
    * n-token window hashes might be in the benchmark bloom. Pure
    * per-row map (window hashes computed row-local, probed against the
    * broadcast bloom) — no state, no watermark, rerun-stable, so the
    * identical plan runs batch or streaming and stream ≡ batch holds
    * exactly (pinned in ScaleSpec). Semantics vs batch c7/c8, by
    * construction: no truly contaminated doc is ever admitted (blooms
    * have no false negatives); ~fpp of clean docs over-drop — the
    * conservative direction for decontamination. Surgical span masking
    * (c8) stays a batch job over the admitted sink, the same
    * inline-gate vs scheduled-compaction split as [[admit]]. */
  def contamGate(docs: DataFrame, fp: org.apache.spark.util.sketch.BloomFilter,
      n: Int): DataFrame = {
    import graft.plans.BloomJoin
    // the same native window-hash kernel as the batch scan
    // (TextHashExprs.WindowHashSigs — raw trim-split tokens, no
    // lowercasing: verbatim means verbatim). A doc with < n tokens
    // hashes to null = no windows = cannot be contaminated → kept.
    val wins = graft.plans.TextHashExprs.windowHashes(col("text"), n)
    docs
      .withColumn("__hit",
        coalesce(exists(wins, w => BloomJoin.mightContain(w, fp)), lit(false)))
      .filter(!col("__hit"))
      .drop("__hit")
  }

  /** Drive the contamination gate over a parquet directory as a stream
    * (AvailableNow) into a memory sink. */
  def runContamGateAvailableNow(spark: SparkSession, docsDir: String,
      fp: org.apache.spark.util.sketch.BloomFilter, n: Int,
      outName: String): StreamingQuery = {
    val src = spark.readStream.schema(schema).parquet(docsDir)
    val q = contamGate(src, fp, n).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(outName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Drive the visual-dup admission gate
    * ([[graft.operators.Multimodal.imageAdmit]]) over a parquet
    * directory of media rows (doc_id, payload, mime) as a stream
    * (AvailableNow) into a memory sink. */
  def runImageAdmitAvailableNow(spark: SparkSession, mediaDir: String,
      fp: org.apache.spark.util.sketch.BloomFilter,
      outName: String): StreamingQuery = {
    import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType}
    val mediaSchema = StructType(Seq(StructField("doc_id", LongType),
      StructField("payload", BinaryType), StructField("mime", StringType)))
    val src = spark.readStream.schema(mediaSchema).parquet(mediaDir)
    import spark.implicits._
    val q = graft.operators.Multimodal.imageAdmit(
        src.as[graft.operators.Multimodal.MediaRow], fp).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(outName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Drive the audio-dup admission gate
    * ([[graft.operators.Multimodal.audioAdmit]]) over a parquet
    * directory of media rows as a stream (AvailableNow) into a memory
    * sink — the [[runImageAdmitAvailableNow]] shape for sound. */
  def runAudioAdmitAvailableNow(spark: SparkSession, mediaDir: String,
      fp: org.apache.spark.util.sketch.BloomFilter,
      outName: String): StreamingQuery = {
    import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType}
    val mediaSchema = StructType(Seq(StructField("doc_id", LongType),
      StructField("payload", BinaryType), StructField("mime", StringType)))
    val src = spark.readStream.schema(mediaSchema).parquet(mediaDir)
    import spark.implicits._
    val q = graft.operators.Multimodal.audioAdmit(
        src.as[graft.operators.Multimodal.MediaRow], fp).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(outName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Drive the video admission gate
    * ([[graft.operators.Multimodal.videoAdmit]]) over a parquet
    * directory of media rows as a stream (AvailableNow) into a memory
    * sink — per-clip container walk, frame decode, and frame-bloom
    * probes all row-local, so the streaming plan is the batch plan. */
  def runVideoAdmitAvailableNow(spark: SparkSession, mediaDir: String,
      fp: org.apache.spark.util.sketch.BloomFilter,
      outName: String): StreamingQuery = {
    import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType}
    val mediaSchema = StructType(Seq(StructField("doc_id", LongType),
      StructField("payload", BinaryType), StructField("mime", StringType)))
    val src = spark.readStream.schema(mediaSchema).parquet(mediaDir)
    import spark.implicits._
    val q = graft.operators.Multimodal.videoAdmit(
        src.as[graft.operators.Multimodal.MediaRow], fp).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(outName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Streaming twin of idx2 — incremental indexing (the Lucene ingest
    * model): each micro-batch builds a [[graft.operators.Retrieval
    * .postingsIndex]] segment over ONLY its own documents (O(batch)
    * tokenize + aggregate — the corpus is never re-read) and APPENDS it
    * under a `segment_id` column to the segment table at `segDir` — the
    * out3 append contract: new files only, prior segments untouched.
    * The global index view at any point is
    * [[graft.operators.Retrieval.mergeSegmentTable]] over the
    * accumulated table, which the batch side already proves ≡ a full
    * rebuild (segment-union + df re-sum; pinned in ScaleSpec).
    *
    * Contract (same as mergeSegments): micro-batches must cover
    * disjoint doc-id ranges aligned to `blockWidth` — the natural shape
    * of append-only ingest where the scheduler allocates id ranges.
    * The merge's validator catches violations. Aggregation happens
    * per-batch inside foreachBatch, so no watermark/state machinery is
    * involved and a replayed batch rewrites the same segment rows
    * (idempotent under AvailableNow's exactly-once file tracking). */
  def runIndexSegmentsAvailableNow(spark: SparkSession, docsDir: String,
      segDir: String, blockWidth: Int = 256): StreamingQuery = {
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(docsDir)
    val q = src.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.Retrieval
          .postingsIndex(batch, col("doc_id"), col("text"), blockWidth)
          .withColumn("segment_id", lit(batchId))
          .write.mode("append").parquet(segDir)
        ()
      }
      .start()
    q.awaitTermination()
    q
  }

  /** Drive the gate over a parquet directory as a stream (AvailableNow)
    * into a memory sink. */
  /** Streaming Count-Min sketch — the op whose DISTRIBUTED design is
    * literally "mergeable state": each arriving doc's tokens fan out
    * to their d cells and a stateful aggregate keeps the ≤ d·w cell
    * counters (complete mode: the sink always holds the full, current
    * sketch). Because cell-wise sum IS the batch construction
    * (DataOpsSpec pins merge ≡ whole), the streamed sketch equals the
    * batch sketch exactly at any trigger cadence — pinned in
    * ScaleSpec. State is bounded by d·w regardless of corpus size. */
  def runCmsAvailableNow(spark: SparkSession, docsDir: String,
      outName: String, d: Int = 4, w: Int = 256): StreamingQuery = {
    import graft.operators.CountMin
    val src = spark.readStream.schema(schema).parquet(docsDir)
    val toks = src.select(explode(split(trim(col("text")), "\\s+")).as("term"))
    // the SAME construction as the batch sketch — one definition, so
    // the stream ≡ batch pin can never drift from a forked copy
    val cells = CountMin.sketch(toks, col("term"), d, w)
    val q = cells.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(outName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

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
