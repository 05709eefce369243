package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Token-budget sequence packing (tx9) — the pre-training batch-prep step
  * that groups documents into fixed token-budget packs. Docs are taken in
  * deterministic id order; a doc's pack is `floor(exclusive-prefix-sum of
  * tokens / budget)`, i.e. running-sum bucketing: every pack holds
  * consecutive docs totalling ~budget tokens (the last doc of a pack may
  * straddle the boundary — the standard approximate packing used before
  * example concatenation, where the tokenizer splits at the exact budget).
  *
  * The naive formulation is a single global window (`ORDER BY id` with no
  * partition) — one task sees every row, a non-starter at corpus scale.
  * This implementation is the classic two-level distributed prefix sum:
  *
  *   1. order-preserving coarse buckets over the id range (pure map);
  *   2. per-bucket token totals — ONE small shuffle, ≤ `buckets` rows out;
  *   3. exclusive prefix over the ≤ `buckets` bucket totals (tiny frame —
  *      the only unpartitioned window, capped at `buckets` rows);
  *   4. broadcast the bucket offsets back, then a per-bucket windowed
  *      running sum (partitioned by bucket — parallel again).
  *
  * Same shape DuckDB's oracle expresses as one running-sum CTE; identical
  * results because bucketing preserves the global id order.
  */
object Packing {

  /** Assign each doc a pack id under `budget` tokens per pack.
    * Output: `(doc_id, n_tokens, pack_id)`, all BIGINT.
    *
    * `id` must be unique (it is the total order); `tokens` is evaluated
    * against `df`'s columns. The min/max id lookup is a 2-value driver
    * aggregate — the price of order-preserving bucketing without a
    * sampled range partitioner (whose boundaries would be layout-
    * dependent, breaking run-to-run determinism). */
  def pack(df: DataFrame, id: Column, tokens: Column, budget: Long, buckets: Int = 256): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val base = df.select(id.cast("long").as("doc_id"), tokens.cast("long").as("n_tokens"))

    val bounds = base.agg(min("doc_id"), max("doc_id")).head()
    if (bounds.isNullAt(0)) return base.withColumn("pack_id", lit(null).cast("long"))
    val (minId, maxId) = (bounds.getLong(0), bounds.getLong(1))
    // Integer DIV throughout: double division would lose exactness past
    // 2^53, which real 100 TB token totals exceed.
    val width = math.max(1L, (maxId - minId) / buckets + 1)
    val bucketed = base.withColumn("bkt", expr(s"(doc_id - $minId) DIV $width"))

    val perBucket = bucketed.groupBy("bkt").agg(sum("n_tokens").as("bkt_tokens"))
    // Exclusive prefix over ≤ `buckets` rows: the one unpartitioned
    // window, bounded by construction.
    val wBkt = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perBucket.select(col("bkt"),
      coalesce(sum("bkt_tokens").over(wBkt), lit(0L)).as("bkt_offset"))

    val wIn = Window.partitionBy("bkt").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .join(broadcast(offsets), "bkt")
      .withColumn("prev", col("bkt_offset") + coalesce(sum("n_tokens").over(wIn), lit(0L)))
      .withColumn("pack_id", expr(s"prev DIV $budget"))
      .select(col("doc_id"), col("n_tokens"), col("pack_id"))
  }
}
