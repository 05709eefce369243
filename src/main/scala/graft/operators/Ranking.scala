package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Exact distributed global ranking (rank1) — every row's exact
  * position under a total order `(score, id)`, plus its integer
  * permille percentile. The curriculum-ordering primitive: rank packs
  * or documents by a difficulty score (length, lm1 coverage, lr2
  * classifier margin) and train easy-to-hard — and the same shape
  * backs exact percentile gates ("drop the bottom 5% by quality").
  *
  * The naive plan is `row_number() OVER (ORDER BY score, id)` — one
  * unpartitioned window that funnels the corpus through a single task.
  * This is the [[Packing]] two-level prefix sum re-used for COUNTS
  * instead of token sums:
  *
  *   1. order-preserving coarse buckets over the SCORE range (pure
  *      map; bucket is monotone in score, so bucket-major order is
  *      global order);
  *   2. per-bucket row counts — one tiny shuffle, ≤ `buckets` rows;
  *   3. exclusive prefix (= each bucket's starting rank) and the grand
  *      total over the ≤ `buckets` rows — the only global window;
  *   4. per-bucket `row_number() OVER (ORDER BY score, id)` + bucket
  *      offset, broadcast-joined back — parallel again.
  *
  * Ranks are dense, 1-based, and bit-identical to the single-window
  * formulation. Degenerate case, documented like Packing's id-range
  * stance: a (near-)constant score column lands every row in one
  * bucket and the within-bucket window re-serializes — curriculum
  * scores (lengths, coverage counts) have spread; if yours doesn't,
  * pre-mix the score (e.g. `score * K + pmod(id, K)`) or rank on a
  * different key.
  */
object Ranking {

  /** Rank every row by `(score, id)` ascending. Output:
    * `(id, score, rank, pct_permille)` — all BIGINT; `rank` in
    * [1, N], `pct_permille = (rank-1)*1000 DIV N` in [0, 1000).
    * `id` must be unique (it is the tie-break that makes the order
    * total); `score` must cast losslessly to BIGINT — fixed-point
    * floats per the oracle-parity rules, never raw doubles. Score
    * ranges wider than Long (min < -2^62 with max > 2^62) take an
    * overflow-safe bucket formulation: identical ranks, bucket frame
    * grows by at most 2 rows past `buckets`. */
  def globalRank(df: DataFrame, id: Column, score: Column, buckets: Int = 256): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val base = df.select(id.cast("long").as("id"), score.cast("long").as("score"))

    val bounds = base.agg(min("score"), max("score")).head()
    if (bounds.isNullAt(0))
      return base.withColumn("rank", lit(null).cast("long"))
        .withColumn("pct_permille", lit(null).cast("long"))
    val (minS, maxS) = (bounds.getLong(0), bounds.getLong(1))
    // Integer DIV: the bucket function must be exactly order-preserving;
    // double arithmetic would mis-bucket near 2^53. The span is computed
    // in BigInt — `maxS - minS` overflows Long when the score range
    // crosses ±2^62 (plausible for fixed-point scores), which would
    // silently break the order-preserving bucket property. When the span
    // fits, the plan is the historical one; when it doesn't, bucket by
    // plain `score DIV width` (truncating division is monotone
    // non-decreasing for width > 0, so bucket-major order is still
    // global order) — no subtraction anywhere, at the cost of at most
    // two extra buckets around zero.
    val span = BigInt(maxS) - BigInt(minS)
    val width = ((span / buckets + 1) max BigInt(1)).toLong // span < 2^64 ⇒ fits
    val bucketed =
      if (span.isValidLong)
        base.withColumn("bkt", expr(s"(score - $minS) DIV $width"))
      else
        base.withColumn("bkt", expr(s"score DIV $width"))

    val perBucket = bucketed.groupBy("bkt").count()
    // The one global frame: ≤ `buckets` rows. Starting rank of each
    // bucket = exclusive prefix count; grand total rides the same frame
    // so the percentile needs no second corpus pass.
    val wPrev = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = perBucket.select(col("bkt"),
      coalesce(sum("count").over(wPrev), lit(0L)).as("bkt_offset"),
      sum("count").over(wAll).as("total"))

    val wIn = Window.partitionBy("bkt").orderBy("score", "id")
    bucketed.join(broadcast(offsets), Seq("bkt"))
      .withColumn("rank", col("bkt_offset") + row_number().over(wIn).cast("long"))
      .withColumn("pct_permille", expr("((rank - 1) * 1000) DIV total"))
      .select("id", "score", "rank", "pct_permille")
  }

  /** [[globalRank]] keeping EVERY input column — for frames whose
    * natural key is not a long (apportionBudget's host strings): rank
    * under the total order `(score, ties…)` ascending, appended as a
    * `rank` column, with no join-back anywhere (the r16 advice's
    * hash-collision fix: a 60-bit tie-break hash stays ORDERING state
    * and can no longer duplicate rows through an id equi-join). Same
    * two-level prefix-count shape: score-range buckets, a ≤ `buckets`-
    * row offsets frame, and a per-bucket window ordered by
    * `(score, ties…)`. `score` must cast losslessly to BIGINT; the
    * ties chain must make the order total (the last tie unique) for
    * the rank to be deterministic. Input columns named `rank` or the
    * internal `__gr_*` names are rejected loudly. A row whose score
    * casts to NULL is KEPT with `rank = NULL` (r18 — the advice fix:
    * such rows previously vanished through the bucket equi-join when
    * other rows were non-null, inconsistent with the all-NULL path,
    * which keeps every row); non-null ranks count only non-null
    * rows. */
  def rankRows(df: DataFrame, score: Column, ties: Seq[Column],
      buckets: Int = 256): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val clash = df.columns.toSet
      .intersect(Set("rank", "__gr_score", "__gr_bkt", "__gr_off"))
    require(clash.isEmpty,
      s"input must not carry the rank columns ${clash.mkString(", ")}")
    val base = df.withColumn("__gr_score", score.cast("long"))
    val bounds = base.agg(min("__gr_score"), max("__gr_score")).head()
    if (bounds.isNullAt(0))
      return base.drop("__gr_score").withColumn("rank", lit(null).cast("long"))
    val (minS, maxS) = (bounds.getLong(0), bounds.getLong(1))
    val span = BigInt(maxS) - BigInt(minS)
    val width = ((span / buckets + 1) max BigInt(1)).toLong
    val bucketed =
      if (span.isValidLong)
        base.withColumn("__gr_bkt", expr(s"(__gr_score - $minS) DIV $width"))
      else
        base.withColumn("__gr_bkt", expr(s"__gr_score DIV $width"))
    // offsets count only non-null scores; the LEFT join routes
    // NULL-score rows (NULL bucket — never equi-matched) around the
    // offsets frame, and the final `when` gives them rank = NULL
    val offsets = bucketed.filter(col("__gr_score").isNotNull)
      .groupBy("__gr_bkt").count()
      .select(col("__gr_bkt"),
        coalesce(sum("count").over(Window.orderBy("__gr_bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("__gr_off"))
    val wIn = Window.partitionBy("__gr_bkt")
      .orderBy(col("__gr_score") +: ties: _*)
    bucketed.join(broadcast(offsets), Seq("__gr_bkt"), "left")
      .withColumn("rank", when(col("__gr_score").isNull, lit(null).cast("long"))
        .otherwise(col("__gr_off") + row_number().over(wIn).cast("long")))
      .drop("__gr_bkt", "__gr_off", "__gr_score")
  }

  /** Exact rank + percentile WITHIN each stratum (qc13) — the same
    * two-level prefix-count machinery as [[globalRank]], run per group:
    * score-range buckets are computed per stratum (a broadcast-joined
    * one-row-per-group bounds frame), per-(group, bucket) counts make a
    * groups×buckets card, and the only window over corpus rows is
    * partitioned by (group, bucket) — so a 5-language corpus does NOT
    * serialize into 5 giant window partitions, which is exactly what
    * `row_number() OVER (PARTITION BY lang ORDER BY score)` would do at
    * 100 TB. Ranks are 1-based under the total order (score, id) within
    * the group; `pct_permille = (rank-1)·1000 DIV group_total`.
    *
    * Contract: `id` unique within its group, `score` a lossless BIGINT
    * (fixed-point per the oracle-parity rules) with per-group span
    * < 2^62 (the bucket width subtraction is plain Long arithmetic
    * here; fixed-point quality/length scores sit far below).
    *
    * Output: `(grp, id, score, rank, pct_permille)`. */
  def groupRank(df: DataFrame, grp: Column, id: Column, score: Column,
      buckets: Int = 256): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val base = df.select(grp.cast("string").as("grp"),
      id.cast("long").as("id"), score.cast("long").as("score"))
    // per-group bucket width lives in the one-row-per-group bounds
    // frame (never a corpus window): width = span DIV buckets + 1 is
    // order-preserving for the fixed-point spans in the contract
    val bounds = base.groupBy("grp")
      .agg(min("score").as("mn"),
        expr(s"(max(score) - min(score)) DIV $buckets + 1").as("w"))
    val bucketed = base.join(broadcast(bounds), Seq("grp"))
      .withColumn("bkt", expr("(score - mn) DIV w"))
      .drop("mn", "w")
    val perBucket = bucketed.groupBy("grp", "bkt").count()
    val wPrev = Window.partitionBy("grp").orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy("grp").orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = perBucket.select(col("grp"), col("bkt"),
      coalesce(sum("count").over(wPrev), lit(0L)).as("bkt_offset"),
      sum("count").over(wAll).as("total"))
    val wIn = Window.partitionBy("grp", "bkt").orderBy("score", "id")
    bucketed.join(broadcast(offsets), Seq("grp", "bkt"))
      .withColumn("rank", col("bkt_offset") + row_number().over(wIn).cast("long"))
      .withColumn("pct_permille", expr("((rank - 1) * 1000) DIV total"))
      .select("grp", "id", "score", "rank", "pct_permille")
  }
}
