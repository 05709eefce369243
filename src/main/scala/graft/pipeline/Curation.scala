package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.CacheScope
import graft.operators.{NearDup, Sampling, TextOps}
import graft.sources.{ParquetStore, TableStore}

/** The curation flagship (dp1) as a TWO-PHASE runner — the at-scale
  * split the fused plan's own docs name (NearDup.dedupClusters scaladoc):
  * materialize the expensive artifacts (exact-dedup survivors, verified
  * near-dup pairs) to storage first, then run clustering + gating as its
  * own job over those tables.
  *
  * Why the split wins at 100 TB (and measurably at sf0.1):
  *  - The fused plan's cost is dominated by DRIVER-SIDE planning: every
  *    CC round re-analyzes a plan that embeds the whole LSH candidate
  *    pipeline (profiled at sf0.1: ~60% of dp1's wall time is gaps
  *    between jobs, not executor work). Phase 2's plans are three nodes
  *    deep — a parquet scan, a join, an aggregate.
  *  - Label propagation runs on the EDGE SUBGRAPH read back from the
  *    pairs table (dedupClustersSparse): rounds touch |dup nodes|
  *    (~5% of a deduped corpus), not |corpus|; singletons rejoin with
  *    one broadcast left join at the end.
  *  - A failed phase 2 restarts from the committed tables instead of
  *    recomputing signatures over the corpus; the pairs table is also
  *    the artifact a real pipeline audits (why was X dropped?).
  *
  * Output is bit-identical to the fused dp1 entry (asserted in
  * PipelineSpec; the dp2 catalog entry shares dp1's oracle SQL).
  */
object Curation {
  val SurvivorsTable = "curation_survivors"
  val PairsTable = "curation_pairs"

  /** Phase 1 — candidate generation: write exact-dedup survivors and
    * verified near-dup pairs through the store's atomic write-then-swap.
    * The expensive artifacts land once; nothing downstream recomputes
    * them. */
  def phase1(spark: SparkSession, docs: DataFrame, store: TableStore): Unit = {
    val exactSurv = CacheScope.persist(docs.join(
      NearDup.exact(docs, col("doc_id"), col("text")).select("doc_id"),
      Seq("doc_id"), "left_semi"))
    store.writeSwap(spark, SurvivorsTable, exactSurv)
    store.writeSwap(spark, PairsTable,
      NearDup.minhashLsh(exactSurv, col("doc_id"), col("text"), 0.5))
    CacheScope.releaseAll() // phase boundary: nothing lazy survives it
  }

  /** Phase 2 — cluster + gate + sample, reading only the committed
    * tables: subgraph label propagation picks each cluster's min-id
    * representative, the quality/language gate filters survivors, and
    * the deterministic 800‰ sample emits the curated corpus. */
  def phase2(spark: SparkSession, store: TableStore): DataFrame = {
    val surv = store.table(spark, SurvivorsTable)
    val pairs = store.table(spark, PairsTable)
    val reps = NearDup.dedupClustersSparse(surv, col("doc_id"), pairs)
      .filter(col("doc_id") === col("cluster_id")).select("doc_id")
    val surviving = surv.join(reps, Seq("doc_id"), "left_semi")
    val q = TextOps.quality(surviving, col("doc_id"), col("text"))
      .select(col("doc_id"), col("n_words"), col("quality_score"))
    surviving.join(q, Seq("doc_id"))
      .filter(col("lang").isin("en", "de", "fr") &&
        col("quality_score") >= 0.6 && col("n_words") >= 20)
      .transform(f => Sampling.bernoulli(f, col("doc_id"), 800))
      .select(col("doc_id"), col("lang"), col("n_words"), col("quality_score"))
  }

  /** Both phases against a parquet checkpoint dir (the `Cli curate
    * --checkpoint-dir` path; tests inject other stores via
    * phase1/phase2 directly). */
  def run(spark: SparkSession, sfDir: String, checkpointDir: String): DataFrame = {
    val store = ParquetStore(checkpointDir)
    phase1(spark, graft.sources.Tables.documents(spark, sfDir), store)
    phase2(spark, store)
  }
}
