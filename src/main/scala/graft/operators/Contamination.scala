package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: the train/eval overlap scan every LLM data
  * pipeline runs before training — flag corpus documents whose word
  * n-grams cover a large fraction of any benchmark document, so eval
  * answers don't leak into the training set.
  *
  * Scale shape (same family as the blocked-Jaccard counter, NearDup
  * d4): overlap counting explodes shingles and equi-joins on the
  * shingle string — one shuffled row per SHARED shingle, never a
  * corpus×bench pair matrix. The benchmark side is an eval set, tiny by
  * construction, so its exploded shingles broadcast and the corpus side
  * never shuffles at all: the whole scan is a map-side join + one
  * aggregate on (corpus_id, bench_id), which only materializes pairs
  * that share at least one shingle. Directionality matters: the score
  * is the fraction of the BENCHMARK doc covered (a 100-word eval item
  * fully contained in a 10k-word train doc is 100% contaminated, not
  * 1%).
  */
object Contamination {

  /** (corpus_id, bench_id, hits, overlap) for every cross-set pair with
    * overlap ≥ tau, where overlap = |shingles(corpus) ∩ shingles(bench)|
    * / |shingles(bench)|.
    *
    * `maxCorpusFreq` is the skew bound (the d7 stop-shingle move): a
    * shingle present in more than that many CORPUS docs is boilerplate
    * ("all rights reserved …") — it pairs every one of those docs with
    * every bench doc containing it, which is where the join blows up at
    * corpus scale. Capped shingles are dropped from the corpus side
    * only; the bench denominator is untouched, so the score stays "how
    * much of the eval item appears", just ignoring ubiquitous n-grams.
    * The default (None) keeps the exact semantics for the oracle. */
  def flagged(corpus: DataFrame, bench: DataFrame,
      id: Column, text: Column, tau: Double, n: Int = 3,
      maxCorpusFreq: Option[Long] = None): DataFrame = {
    val cs0 = NearDup.shingles(corpus, id, text, n)
      .select(col("doc_id").as("corpus_id"), col("sh"))
    val cs = maxCorpusFreq.fold(cs0) { cap =>
      val keep = cs0.groupBy(col("sh"))
        .agg(count(lit(1)).as("df")).filter(col("df") <= cap).select("sh")
      cs0.join(keep, Seq("sh"), "left_semi")
    }
    val bs = NearDup.shingles(bench, id, text, n)
      .select(col("doc_id").as("bench_id"), col("sh"))
    val bcnt = bs.groupBy(col("bench_id")).agg(count(lit(1)).as("n"))
    val hits = cs.join(broadcast(bs), Seq("sh"))
      .groupBy(col("corpus_id"), col("bench_id"))
      .agg(count(lit(1)).as("hits"))
    hits.join(broadcast(bcnt), Seq("bench_id"))
      .withColumn("overlap", col("hits") / col("n"))
      .filter(col("overlap") >= tau)
      .select(col("corpus_id"), col("bench_id"), col("hits"), col("overlap"))
  }

  /** Decontaminate (c3): the corpus with every document flagged by
    * [[flagged]] REMOVED — the action step after the scan, producing
    * the training set that may actually be trained on. One left-anti
    * join against the flagged ids; all the scan's scale properties
    * (broadcast bench side, shared-shingle counting, df cap) carry
    * over unchanged. */
  def decontaminate(corpus: DataFrame, bench: DataFrame,
      id: Column, text: Column, tau: Double, n: Int = 3,
      maxCorpusFreq: Option[Long] = None): DataFrame =
    corpus.join(
      flagged(corpus, bench, id, text, tau, n, maxCorpusFreq)
        .select(col("corpus_id").as("__flagged_id")).distinct(),
      id === col("__flagged_id"), "left_anti")

  /** Split-leakage audit (c4): verified near-duplicate pairs whose
    * endpoints land in DIFFERENT [[Sampling.split]] partitions — the
    * overlap a held-out set inherits through near-dups that exact-id
    * splitting cannot see (a test doc whose near-twin trains is a leaked
    * eval item even though the ids differ). Output: (id_a, id_b,
    * split_a, split_b, jaccard), empty when the split is clean.
    *
    * The pair generator is [[NearDup.minhashLsh]] (banded equi-join,
    * never O(N²)); the split labels are a pure map; the audit adds two
    * equi-joins on doc id. Run it after smp4 and BEFORE training — the
    * fix is deduping first (d2/d9) or moving whole near-dup clusters
    * (d6) into one side. */
  def splitLeakage(docs: DataFrame, id: Column, text: Column,
      threshold: Double, valPermille: Int = 10, testPermille: Int = 10): DataFrame = {
    val pairs = NearDup.minhashLsh(docs, id, text, threshold)
    val sp = Sampling.split(docs.select(id.as("doc_id")), col("doc_id"),
      valPermille, testPermille)
    pairs
      .join(sp.select(col("doc_id").as("id_a"), col("split").as("split_a")), Seq("id_a"))
      .join(sp.select(col("doc_id").as("id_b"), col("split").as("split_b")), Seq("id_b"))
      .filter(col("split_a") =!= col("split_b"))
      .select(col("id_a"), col("id_b"), col("split_a"), col("split_b"), col("jaccard"))
  }
}
