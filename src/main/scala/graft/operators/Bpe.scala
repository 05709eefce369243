package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.CacheScope
import graft.functions.F

/** In-engine BPE tokenizer training — the corpus job that produces the
  * tokenizer a pretraining pipeline feeds its packed examples through
  * (the Sennrich et al. 2016 word-frequency formulation, re-expressed
  * as DataFrame ops).
  *
  * Scale design: the corpus is touched EXACTLY ONCE — the word-frequency
  * aggregation (one explode + one hash shuffle, persisted). Every merge
  * iteration after that runs on the VOCABULARY table (distinct words —
  * orders of magnitude smaller than the corpus, still fully distributed:
  * pair counting is one hash shuffle over the vocab, the argmax is a
  * 1-row take). Driver model state is the learned merge list — one
  * (left, right, count) row per merge, the BPE twin of k-means' k×dim
  * centroids (Clustering.scala's model-state contract). Nothing else
  * ever collects.
  *
  * Determinism contract (oracle parity): words are lowercased whitespace
  * tokens (the shingle convention); the merge winner is max count with
  * lexicographic (left, right) tie-break; merge application is the
  * doubled-space literal-replace trick — `' l  r '` over a
  * double-spaced symbol string — so consecutive occurrences each carry
  * their own boundary spaces and left-to-right non-overlapping replace
  * behaves identically in Spark and DuckDB with no lookaround regex
  * (RE2 has none).
  */
object Bpe {

  /** Word-frequency vocabulary: (word, freq) over lowercased whitespace
    * tokens. The ONLY corpus-wide pass in BPE training. */
  def wordCounts(df: DataFrame, text: Column): DataFrame =
    df.select(explode(F.tokens(lower(text))).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** A word as a spaced symbol string: "low" → "l o w". */
  private def spacedChars(word: Column): Column =
    trim(regexp_replace(word, "(.)", "$1 "))

  /** Adjacent-symbol pair counts over the vocab, weighted by word
    * frequency: (l, r, cnt). One hash shuffle over the vocab table. */
  private[operators] def pairCounts(vocab: DataFrame): DataFrame =
    vocab.select(col("freq"), split(col("sym"), " ").as("a"))
      .where(size(col("a")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, size(a) - 1), i -> named_struct('l', a[i-1], 'r', a[i]))"))
        .as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("cnt"))

  /** Apply one learned merge to the symbol column: double the spaces so
    * every occurrence owns its boundary spaces, literal-replace
    * `' l  r '` → `' lr '`, squeeze and trim. Pure map. */
  private def applyMerge(sym: Column, l: String, r: String): Column =
    trim(regexp_replace(
      call_function("replace",
        concat(lit(" "), call_function("replace", sym, lit(" "), lit("  ")), lit(" ")),
        lit(" " + l + "  " + r + " "),
        lit(" " + l + r + " ")),
      " {2,}", " "))

  /** One learned merge: iteration number, the joined pair, its count at
    * the time it won. */
  final case class Merge(it: Long, l: String, r: String, cnt: Long)

  /** Learn `n` merges. Returns the merge list (driver model state) and
    * the final vocab (word, freq, sym) with all merges applied.
    *
    * Requires a corpus rich enough to supply `n` distinct adjacent
    * pairs — training stops early (returns fewer merges) on a
    * degenerate vocab rather than failing.
    *
    * A real tokenizer takes tens of thousands of merges, and each one
    * stacks a projection on the vocab plan — unbounded lineage would
    * make Catalyst analysis quadratic and eventually OOM the planner.
    * Every `checkpointEvery` merges the vocab localCheckpoints (eager),
    * truncating lineage to the materialized rows, so plan depth is
    * bounded by the checkpoint interval regardless of merge count. */
  def learn(vocab0: DataFrame, n: Int,
      checkpointEvery: Int = 32): (Seq[Merge], DataFrame) = {
    require(checkpointEvery > 0, s"checkpointEvery must be positive, got $checkpointEvery")
    var vocab = CacheScope.persist(
      vocab0.select(col("word"), col("freq"), spacedChars(col("word")).as("sym")))
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var it = 1
    var exhausted = false
    while (it <= n && !exhausted) {
      val best = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(it.toLong, l, r, c)
        vocab = vocab.withColumn("sym", applyMerge(col("sym"), l, r))
        if (it % checkpointEvery == 0) vocab = vocab.localCheckpoint(true)
        it += 1
      }
    }
    (merges.toSeq, vocab)
  }

  /** Per-document sequence lengths under the trained tokenizer (bpe3):
    * join each document's words to the final vocab's symbol counts and
    * sum — the REAL token counts a packing/batching stage (tx9/tx13)
    * needs once a tokenizer exists, replacing the whitespace proxy.
    * One corpus tokenize pass + one equi-join against the vocab (AQE
    * broadcasts it when small) + one per-doc aggregate. */
  def encodedLengths(df: DataFrame, id: Column, text: Column,
      finalVocab: DataFrame): DataFrame =
    df.select(id.as("doc_id"), explode(F.tokens(lower(text))).as("word"))
      .where(length(col("word")) > 0)
      .join(finalVocab.select(col("word"),
        size(split(col("sym"), " ")).cast("long").as("n_syms")), Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_syms")).as("n_bpe_tokens"))

  /** The trained tokenizer's vocabulary with corpus frequencies:
    * (token, freq) — every surviving symbol weighted by the word
    * frequencies it appears in. Runs on the vocab table only. */
  def tokenVocab(finalVocab: DataFrame): DataFrame =
    finalVocab.select(explode(split(col("sym"), " ")).as("token"), col("freq"))
      .groupBy("token").agg(sum(col("freq")).as("freq"))

  /** bpe4 — tokenizer round-trip integrity card: detokenizing every
    * vocab word's learned symbol sequence (concatenate the symbols =
    * strip the single separator spaces) must reproduce the word
    * byte-exactly — the invariant every BPE merge preserves by
    * construction, so ANY violation convicts the merge machinery (a
    * symbol-boundary bug in [[applyMerge]]'s double-space trick, or a
    * corrupt vocab ingest) before an encoded corpus ships to a trainer.
    * Grouped by first character so the card has inspectable rows;
    * all-integer columns (count, ok-count, total symbols, freq-weighted
    * symbol count) keep it engine-exact. Runs on the vocab table only —
    * never the corpus. */
  def roundTripCard(finalVocab: DataFrame): DataFrame =
    finalVocab.groupBy(substring(col("word"), 1, 1).as("prefix"))
      .agg(count(lit(1)).cast("long").as("n_words"),
        sum(when(regexp_replace(col("sym"), " ", "") === col("word"), 1L)
          .otherwise(0L)).cast("long").as("n_roundtrip_ok"),
        sum(size(split(col("sym"), " "))).cast("long").as("n_symbols"),
        sum(size(split(col("sym"), " ")).cast("long") * col("freq"))
          .cast("long").as("n_corpus_tokens"))
}
