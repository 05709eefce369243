package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.F

/** LM-coverage quality filter (lm1) — the n-gram-LM cousin of the lr1
  * classifier gate: score every document by how much of it the language
  * of a high-quality reference slice "covers", and gate on that score.
  * This is the deterministic core of perplexity-style filtering (CCNet/
  * KenLM pipelines): instead of a float log-probability — whose sums
  * reassociate under partitioning and diverge from any serial oracle —
  * coverage is a pair of BIGINT counts (reference-bigram hits, total
  * bigrams), so the gate is exact integer arithmetic, bit-identical on
  * any partitioning and on the DuckDB oracle.
  *
  * Scale design: the reference model is the top-V bigram table — V rows
  * of model state (the k-means-centroid contract), built with one
  * corpus-slice aggregation + a TakeOrdered top-V, then BROADCAST into
  * the scoring join. Scoring is explode → broadcast hash semi-join →
  * one (doc_id, count) shuffle: no corpus self-join, nothing driver-
  * side scales with the corpus.
  */
object LmFilter {

  /** Per-document token bigrams over lowercased whitespace tokens:
    * (doc_id, bg). Pure map + explode. */
  def bigrams(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc_id"), F.tokens(lower(text)).as("tk"))
      .where(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(tk) - 1), i -> concat(tk[i-1], ' ', tk[i]))"))
        .as("bg"))

  /** The reference bigram model: the `topV` most frequent bigrams of the
    * high-quality slice (quality score ≥ `minScore`), count-desc then
    * lexicographic tie-break. V rows — broadcastable model state. */
  def refBigrams(df: DataFrame, id: Column, text: Column,
      topV: Int, minScore: Double = 0.8): DataFrame = {
    val hq = df.where(TextOps.qualityCols(text)._5 >= minScore)
    bigrams(hq, id, text)
      .groupBy("bg").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("bg").asc)
      .limit(topV)
      .select("bg")
  }

  /** Score + gate: (doc_id, n_bigrams, n_hits, kept) where kept means
    * at least half the document's bigram instances appear in the
    * reference model. Documents with fewer than two tokens have zero
    * bigrams and pass vacuously (length gating is tx2's job). */
  def coverageGate(df: DataFrame, id: Column, text: Column,
      ref: DataFrame): DataFrame = {
    val hits = bigrams(df, id, text)
      .join(broadcast(ref), Seq("bg"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    df.select(id.as("doc_id"),
        greatest(size(F.tokens(lower(text))) - 1, lit(0)).cast("long").as("n_bigrams"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_bigrams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("kept", col("n_hits") * 2 >= col("n_bigrams"))
  }
}
