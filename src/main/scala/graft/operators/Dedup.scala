package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dedup / canonical-row-pick operators (SURVEY §2.4 A1/A3/A5/A6).
  *
  * All variants are windowed `row_number` picks with *documented,
  * deterministic* tie-breaks — the reference's HashMap-based versions are
  * iteration-order-dependent (SURVEY §7.4.1); we fix the order and note it.
  *
  * Scale: `row_number` over (partitionBy keys) is a single hash shuffle on
  * the dedup key — the minimum possible data movement for exact dedup.
  * Skewed keys are bounded here because each group only needs its top-1
  * row; AQE handles stragglers. No driver-side state.
  */
object Dedup {

  /** Keep exactly one row per key, choosing the row that sorts first by
    * `order`. Generalizes the reference's MIN(paragraph_id)-then-self-join
    * history dedup (`ddb/src/members.rs:240-258`, `:171-188`) and its
    * argmax "latest membership" pick (`:421-430`, with min-id tie-break
    * per the history queries' convention). */
  def keepOneByKey(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame =
    df.withColumn("__rn", row_number().over(
        Window.partitionBy(keys: _*).orderBy(order: _*)))
      .filter(col("__rn") === 1)
      .drop("__rn")

  /** First-wins unique-by over an explicitly ordered union of sources
    * (`sync-app/src/sync.rs:497-514` `unique_by(uid)` — itertools keeps
    * the first occurrence; source order is made explicit via `srcRank`). */
  def uniqueBy(df: DataFrame, key: Seq[Column], srcRank: Column, tieBreak: Seq[Column]): DataFrame =
    keepOneByKey(df, key, srcRank +: tieBreak)

  /** Priority merge (A6, `ddb/src/members.rs:41-55`): within each `key`
    * group, rows whose `priority` is lowest win (regular=0 beats
    * affiliate=1); deterministic tie-break on `tieBreak`. */
  def priorityMerge(df: DataFrame, key: Seq[Column], priority: Column, tieBreak: Seq[Column]): DataFrame =
    keepOneByKey(df, key, priority +: tieBreak)
}
