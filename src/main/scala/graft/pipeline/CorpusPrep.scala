package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.CacheScope
import graft.operators.{Packing, Sampling, Sharding, TextOps}

/** End-to-end corpus preparation — dp3's composition as the PRODUCTION
  * pipeline shape: two-phase checkpointed curation (dp2) → PII scrub
  * (tx11) → context chunking (tx10) → token-budget packing (tx9) →
  * deterministic shard export + manifest (out1) → integrity verify
  * (out2), driven as one `Cli corpus-prep` verb. Every stage is the
  * catalog operator itself; this object only composes them and carries
  * the chunk-key convention, so the oracle-gated dp3 entry and the CLI
  * path cannot drift (dp3 calls [[packedChunks]]/[[packStats]] too).
  *
  * At 100 TB the shape matters: curation checkpoints its expensive
  * artifacts (survivors, near-dup pairs) through write-then-swap tables
  * and restarts from them; scrub/chunk are pure maps; packing's one
  * global structure is a ≤256-row bucket-offset window; the export is
  * layout-independent md5-mod sharding whose manifest the verifier (and
  * the DuckDB oracle) re-derives from the written bytes alone.
  */
object CorpusPrep {

  /** 2^20 chunks of headroom per doc (≈117M tokens at step 112) keeps
    * chunk_key unique — Packing.pack's total-order precondition; a small
    * multiplier would collide on book-length docs at scale. */
  val ChunkKeyStride = 1048576L

  /** scrub → chunk → pack over a curated `(doc_id, text)` corpus: one row
    * per chunk, `(chunk_key, doc_id, chunk_id, n_tokens, chunk_text,
    * pack_id)`. The pack assignment joins back to the chunks on the
    * unique chunk key — an equi-join on the packing's own total order. */
  def packedChunks(docs: DataFrame, chunkTokens: Int = 128, overlap: Int = 16,
      budget: Long = 2048): DataFrame = {
    val clean = TextOps.scrubPii(docs, col("doc_id"), col("text"))
    // Persist the chunk frame: it feeds THREE consumers — Packing.pack's
    // bounds aggregate, the pack running-sum side, and the chunk side of
    // the assignment join. Unpersisted, the regex scrub + tokenize map
    // (the pipeline's hottest CPU) re-evaluates once per consumer
    // (measured: ~3 full passes per dp3/dp5 run). Same inter-stage
    // checkpoint stance as dp1Curated's survivor cache; CacheScope
    // releases it at query end.
    val chunks = CacheScope.persist(
      TextOps.chunk(clean, col("doc_id"), col("clean_text"), chunkTokens, overlap)
        .withColumn("chunk_key", col("doc_id") * lit(ChunkKeyStride) + col("chunk_id")))
    val packed = Packing.pack(chunks, col("chunk_key"), col("n_tokens"), budget)
      .select(col("doc_id").as("chunk_key"), col("pack_id"))
    chunks.join(packed, Seq("chunk_key"))
      .select("chunk_key", "doc_id", "chunk_id", "n_tokens", "chunk_text", "pack_id")
  }

  /** Per-pack receipt in dp3's shape: `(pack_id, n_chunks, n_tokens)`. */
  def packStats(chunks: DataFrame): DataFrame =
    chunks.groupBy("pack_id")
      .agg(count(lit(1)).as("n_chunks"), sum("n_tokens").as("n_tokens"))

  /** The full production path: dp2 curation against `checkpointDir` →
    * [[packedChunks]] → shard export under `outDir` → [[Sharding.verify]].
    * Fails loudly if any exported shard's recomputed count/hash disagrees
    * with its manifest line. Returns the pack stats — the run's receipt
    * (what a scheduler logs and what PipelineSpec pins to the direct
    * operator composition). */
  def run(spark: SparkSession, sfDir: String, checkpointDir: String,
      outDir: String, numShards: Int = 8): DataFrame = {
    val curatedIds = Curation.run(spark, sfDir, checkpointDir).select("doc_id")
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .join(curatedIds, Seq("doc_id"), "left_semi")
    val chunks = CacheScope.persist(packedChunks(docs))
    Sharding.write(chunks, col("chunk_key"), col("chunk_text"), numShards, outDir)
    val status = Sharding.verify(spark, outDir, col("chunk_key"), col("chunk_text"))
    val bad = status.filter(col("status") =!= "ok").count()
    require(bad == 0,
      s"corpus-prep export verify failed: $bad shard(s) not ok under $outDir")
    packStats(chunks)
  }

  /** A unit id (doc copy) per epoch: doc_id × stride + epoch. Fixed at
    * 4 — shared by [[runPretrain]] and the dp5 catalog entry so the CLI
    * path and the oracle-gated entry cannot drift — which bounds the
    * supported rates below 4.0 epochs/doc. */
  val EpochStride = 4L

  /** The pretrain-prep production path (dp5's composition as a job):
    * two-phase checkpointed curation → epoch mixture → scrub → chunk →
    * pack (each epoch copy packs as its own unit) → shard export +
    * integrity verify → the curriculum receipt: every pack exactly
    * ranked by token total ([[graft.operators.Ranking.globalRank]]).
    * What to train on, how often, in what order — with the curated
    * artifacts checkpointed for crash recovery and the shards verified
    * before the receipt is returned.
    *
    * Lineage is localCheckpoint-truncated at the two reuse points
    * (units, pack stats): the downstream bounds/join actions would
    * otherwise re-analyze the curation chain's whole logical tree on
    * the driver at every action (measured ~5 s per action at sf0.1). */
  def runPretrain(spark: SparkSession, sfDir: String, checkpointDir: String,
      outDir: String, numShards: Int = 8,
      rates: Map[String, Long] = Map("en" -> 1300L, "de" -> 2500L, "fr" -> 700L)): DataFrame = {
    require(rates.values.forall(r => r >= 0 && r < EpochStride * 1000),
      s"epoch rates must stay below ${EpochStride}.0 epochs/doc (EpochStride)")
    val curatedIds = Curation.run(spark, sfDir, checkpointDir).select("doc_id")
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .join(curatedIds, Seq("doc_id"), "left_semi")
    val mixed = Sampling.epochs(docs.select(col("doc_id"), col("lang"), col("text")),
      col("doc_id"), col("lang"), rates)
    val units = mixed
      .select((col("doc_id") * EpochStride + col("epoch")).as("doc_id"), col("text"))
      .localCheckpoint()
    val chunks = CacheScope.persist(packedChunks(units))
    Sharding.write(chunks, col("chunk_key"), col("chunk_text"), numShards, outDir)
    val status = Sharding.verify(spark, outDir, col("chunk_key"), col("chunk_text"))
    val bad = status.filter(col("status") =!= "ok").count()
    require(bad == 0,
      s"pretrain-prep export verify failed: $bad shard(s) not ok under $outDir")
    val stats = packStats(chunks).localCheckpoint()
    graft.operators.Ranking.globalRank(stats, col("pack_id"), col("n_tokens"))
      .select(col("id").as("pack_id"), col("score").as("n_tokens"),
        col("rank"), col("pct_permille"))
  }
}
