package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling (qc3): the per-column data-quality card a pipeline
  * emits before and after every corpus job — null counts, exact
  * distinct cardinality, and min/max (as strings, so one schema covers
  * every column type and the cross-engine comparator is the same
  * string ordering the oracle convention already relies on).
  *
  * One scan: all per-column aggregates compute in a single pass (the
  * distinct counts expand internally, but the source is read once), and
  * the result is COLUMNS rows — driver-safe at any corpus size. Exact
  * distinct rather than HLL because the profile is the artifact two
  * engines must agree on; a12 holds the sketch-free exact-distinct
  * contract elsewhere.
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    require(cols.forall(df.columns.contains),
      s"unknown columns: ${cols.filterNot(df.columns.contains).mkString(", ")}")
    val aggs = cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__nd_$c"),
        // min/max in the column's NATIVE order, cast afterwards —
        // casting first would rank numerics lexicographically
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    // Materialize the single-row aggregate ONCE and rebuild the card
    // from its values: the previous shape unioned |cols| selects that
    // each referenced the aggregate subplan, so "one scan" held only if
    // Spark's exchange reuse deduped the identical subplans — when it
    // didn't (plan drift, AQE changes), it silently became |cols| full
    // corpus scans. Collecting the 1×(4·|cols|) row makes the
    // single-scan property structural, not optimizer-dependent; the
    // result frame is pure local literals.
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    def optLong(i: Int) = if (row.isNullAt(i)) None else Some(row.getLong(i))
    val card = cols.zipWithIndex.map { case (c, i) =>
      (c, optLong(4 * i), optLong(4 * i + 1),
        Option(row.getString(4 * i + 2)), Option(row.getString(4 * i + 3)))
    }
    import df.sparkSession.implicits._
    card.toDF("col_name", "n_nulls", "n_distinct", "min_v", "max_v")
  }

  /** Profile drift (qc5): [[profile]] of two snapshots joined per
    * column — null counts, distinct cardinalities, and min/max side by
    * side, old vs new. The column-level companion to the row-level
    * [[snapshotDiff]]: a refresh that silently nulls a field, collapses
    * a categorical, or shifts a range shows up here as one row even
    * when row counts look plausible. Two single-pass profiles + a join
    * of COLUMNS-sized frames — nothing scales with the corpus. */
  def profileDrift(oldDf: DataFrame, newDf: DataFrame, cols: Seq[String]): DataFrame = {
    def suffixed(df: DataFrame, tag: String) = profile(df, cols).select(
      col("col_name"), col("n_nulls").as(s"n_nulls_$tag"),
      col("n_distinct").as(s"n_distinct_$tag"),
      col("min_v").as(s"min_$tag"), col("max_v").as(s"max_$tag"))
    suffixed(oldDf, "old").join(suffixed(newDf, "new"), Seq("col_name"))
  }

  /** Corpus snapshot diff (qc4): per-key status between two corpus
    * versions — `added` (new only), `removed` (old only), `changed`
    * (both, content hash differs), `unchanged`. The version-over-version
    * audit card of an evolving corpus: what a refresh actually did,
    * before anyone trains on it.
    *
    * Content is reduced to its md5 AT THE SCAN, so the full-outer join
    * shuffles `(key, 32-char hash, carry)` — never the document bytes;
    * at corpus scale the exchange is keys + fingerprints only. `carry`
    * columns (e.g. source, lang) ride along coalesced new-over-old so
    * rollups can group the diff without a join back. Null content
    * hashes to null and compares null-safely: two null-text versions of
    * a doc are `unchanged`, null↔non-null is `changed`. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, key: String,
      content: String, carry: Seq[String] = Nil): DataFrame = {
    require((key +: content +: carry).forall(oldDf.columns.contains), "old side missing columns")
    require((key +: content +: carry).forall(newDf.columns.contains), "new side missing columns")
    require(!carry.contains("status"), "'status' is the diff's own output column")
    def side(df: DataFrame, tag: String) =
      df.select(col(key).as("k") +: md5(col(content)).as(s"h_$tag") +:
        lit(true).as(s"in_$tag") +: carry.map(c => col(c).as(s"${c}_$tag")): _*)
    val j = side(oldDf, "old").join(side(newDf, "new"), Seq("k"), "full_outer")
    val status = when(col("in_old").isNull, lit("added"))
      .when(col("in_new").isNull, lit("removed"))
      .when(!(col("h_old") <=> col("h_new")), lit("changed"))
      .otherwise(lit("unchanged"))
    j.select(col("k").as(key) +: status.as("status") +:
      carry.map(c => coalesce(col(s"${c}_new"), col(s"${c}_old")).as(c)): _*)
  }

  /** Functional-dependency discovery (qc17): for every ordered column
    * pair (a, b), does a → b hold — i.e. `count(distinct a) ==
    * count(distinct (a, b))` — plus each column's key candidacy
    * (`n_a == n_rows` when paired). The schema-archaeology card run
    * before trusting an undocumented table: discovered keys drive
    * dedup/upsert key choice, discovered FDs reveal denormalized
    * columns safe to drop from a projection. Columns must be non-null
    * (engines disagree on null-tuple distinct semantics — Spark's
    * count_distinct(a, b) drops null tuples where DuckDB counts them);
    * the contract is require()d inside the same single-scan aggregate
    * (count(c) == count(*) per column — zero extra passes).
    *
    * Shape: ONE scan — all 2·P distinct-counts compute in a single
    * aggregate (Spark expands multi-distinct via Expand, factor ~2·P;
    * the documented alternative at extreme width is per-pair passes or
    * sketches), the result is a 1×wide row collected like [[profile]],
    * and the card is P rows of driver literals. */
  def fdDiscovery(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    require(cols.forall(df.columns.contains),
      s"unknown columns: ${cols.filterNot(df.columns.contains).mkString(", ")}")
    val pairs = for (a <- cols; b <- cols if a != b) yield (a, b)
    val aggs = count(lit(1)).as("n_rows") +:
      (cols.map(c => count_distinct(col(c)).as(s"__d_$c")) ++
        pairs.map { case (a, b) =>
          count_distinct(col(a), col(b)).as(s"__p_${a}_$b")
        } ++ cols.map(c => count(col(c)).as(s"__nn_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val nRows = row.getLong(0)
    val nnBase = 1 + cols.size + pairs.size
    cols.zipWithIndex.foreach { case (c, i) =>
      require(row.getLong(nnBase + i) == nRows,
        s"fdDiscovery: column $c contains nulls — null-tuple distinct " +
          "semantics differ across engines; exclude or fill nulls first")
    }
    val dCol = cols.zipWithIndex.map { case (c, i) => c -> row.getLong(1 + i) }.toMap
    val card = pairs.zipWithIndex.map { case ((a, b), i) =>
      val nAb = row.getLong(1 + cols.size + i)
      (a, b, dCol(a), nAb, nRows, dCol(a) == nAb)
    }
    import df.sparkSession.implicits._
    card.toDF("col_a", "col_b", "n_a", "n_ab", "n_rows", "fd_holds")
  }

  /** Histogram drift (qc18): fixed-width bucket shares of a numeric
    * column in two snapshots, side by side with the per-bucket absolute
    * permille difference — the DISTRIBUTION-shape companion to [[profileDrift]]
    * (which only sees min/max/distinct move; a refresh that doubles the
    * short-doc mass while preserving the range is invisible there and a
    * loud row here). Σ|Δ| over the card is the integer L1 drift — the
    * deterministic stand-in for PSI, whose log term floats. Two
    * map-side-combined aggs onto bucket keys + a buckets-sized outer
    * join; nothing scales with the snapshots. */
  def histogramDrift(oldDf: DataFrame, newDf: DataFrame, value: Column,
      width: Long): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    def side(df: DataFrame, tag: String) = {
      val b = df.select(value.cast("long").as("v"))
        .select(expr(s"v DIV $width").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as(s"n_$tag"))
      val t = b.agg(sum(s"n_$tag").as(s"t_$tag"))
      b.crossJoin(broadcast(t))
    }
    side(oldDf, "old").join(side(newDf, "new"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(expr("n_old * 1000 DIV t_old"), lit(0L)).as("share_old_permille"),
        coalesce(expr("n_new * 1000 DIV t_new"), lit(0L)).as("share_new_permille"))
      .withColumn("abs_diff_permille",
        abs(col("share_old_permille") - col("share_new_permille")))
  }

  /** qc19 — exact correlation sufficient-statistics card: for each
    * ordered column pair, the integer moment sums (n, Σx, Σy, Σx²,
    * Σy², Σxy) from which Pearson r (or covariance, or a regression
    * slope) is derivable downstream to any precision. Publishing the
    * SUMS instead of the ratio is the determinism move used across the
    * repo (cents-as-BIGINT, fixed-point scores): the sums are exact
    * integers any engine reproduces bit-for-bit, while r itself floats.
    * Columns are cast to BIGINT first — callers pre-scale fractional
    * inputs to fixed-point. Overflow stance: Σxy fits BIGINT while
    * n·max|x|·max|y| < 2⁶³ (e.g. 10¹² rows of 10⁵-unit values); past
    * that, pre-scale down — the card fails loudly in testing rather
    * than silently wrapping because DuckDB's HUGEINT sum would diverge
    * from a wrapped Spark sum.
    *
    * Shape: ONE map-side-combined scan computes every pair's six sums;
    * the card is pairs-sized driver literals (the [[fdDiscovery]]
    * collect contract). */
  def corrCard(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "need at least one column pair")
    val cols = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    require(cols.forall(df.columns.contains),
      s"unknown columns: ${cols.filterNot(df.columns.contains).mkString(", ")}")
    val base = df.select(cols.map(c => col(c).cast("long").as(c)): _*)
    // per-column non-null counts ride the same single scan: n is
    // count(*) while sum() skips nulls, so a nullable column would
    // silently pair a too-large n with null-skipping moment sums and
    // poison every downstream r. Same explicit contract as
    // [[fdDiscovery]]: fail loudly, don't publish inconsistent stats.
    val aggs = (count(lit(1)).as("n") +:
      cols.map(c => count(col(c)).as(s"__nn_$c"))) ++
      pairs.zipWithIndex.flatMap { case ((x, y), i) =>
        Seq(sum(col(x)).as(s"__sx_$i"), sum(col(y)).as(s"__sy_$i"),
          sum(col(x) * col(x)).as(s"__sxx_$i"),
          sum(col(y) * col(y)).as(s"__syy_$i"),
          sum(col(x) * col(y)).as(s"__sxy_$i"))
      }
    val row = base.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getLong(0)
    cols.zipWithIndex.foreach { case (c, j) =>
      require(row.getLong(1 + j) == n,
        s"corrCard requires non-null inputs: column '$c' has " +
          s"${n - row.getLong(1 + j)} null cells of $n rows — " +
          "coalesce or filter upstream so the moment sums and n agree")
    }
    val statsOff = 1 + cols.length
    val card = pairs.zipWithIndex.map { case ((x, y), i) =>
      val o = statsOff + i * 5
      (x, y, n, row.getLong(o), row.getLong(o + 1), row.getLong(o + 2),
        row.getLong(o + 3), row.getLong(o + 4))
    }
    import df.sparkSession.implicits._
    card.toDF("col_x", "col_y", "n", "sx", "sy", "sxx", "syy", "sxy")
  }

  /** Audience-overlap matrix (e15): for every unordered pair of `tag`
    * values (event types, feature flags, source labels), the count of
    * entities carrying BOTH plus an integer-permille Jaccard — the
    * "which segments share users" card behind cross-sell, cohort-merge,
    * and event-taxonomy decisions (two types with Jaccard ≈ 1000 are
    * one behavior wearing two names).
    *
    * Shape at 100 TB: one distinct shuffle to (tag, entity), then a
    * SELF equi-join on entity whose fan-out is bounded by the per-entity
    * distinct-tag count (≤ T, the taxonomy size — never a row-count
    * blow-up), and an aggregate onto ≤ T² keys. The per-tag totals are
    * a T-row frame broadcast onto the result. Includes the diagonal
    * (tag_a = tag_b, Jaccard 1000) so per-tag audience sizes read off
    * the same card. */
  def audienceOverlap(df: DataFrame, entity: Column, tag: Column): DataFrame = {
    val u = df.select(tag.as("t"), entity.as("e")).distinct()
    val counts = u.groupBy("t").agg(count(lit(1)).as("n"))
    val a = u.select(col("t").as("ta"), col("e"))
    val b = u.select(col("t").as("tb"), col("e"))
    a.join(b, Seq("e")).filter(col("ta") <= col("tb"))
      .groupBy("ta", "tb").agg(count(lit(1)).as("shared"))
      .join(broadcast(counts.select(col("t").as("ta"), col("n").as("n_a"))), Seq("ta"))
      .join(broadcast(counts.select(col("t").as("tb"), col("n").as("n_b"))), Seq("tb"))
      .select(col("ta").as("tag_a"), col("tb").as("tag_b"),
        col("shared").as("shared_entities"), col("n_a"), col("n_b"),
        expr("shared * 1000 DIV (n_a + n_b - shared)").as("jaccard_permille"))
  }

  /** k-ANONYMITY release gate (qc20) — the aggregate-publication
    * hygiene every data release runs: per-group aggregates go out ONLY
    * for quasi-identifier groups of at least `k` members; smaller
    * groups would re-identify individuals, so they collapse into ONE
    * residual row (key columns NULL) that preserves their total counts
    * and sums — the release still reconciles to the corpus, but no
    * published row describes fewer than k people. The residual also
    * carries how many groups were suppressed (the transparency number
    * reviewers ask for); it is omitted entirely when nothing was
    * suppressed. `suppressed_groups` is 0 on released rows.
    *
    * Shape at 100 TB: one map-combined aggregate to the QI key space,
    * then a filter split and a card-sized re-aggregate of the small
    * tail — nothing touches raw rows twice. */
  def kAnonymityRelease(df: DataFrame, keys: Seq[Column], metric: Column,
      k: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val g = df.groupBy(keys: _*)
      .agg(count(lit(1)).cast("long").as("n_rows"),
        sum(metric).cast("long").as("metric_sum"))
    val keyNames = g.columns.dropRight(2)
    val released = g.filter(col("n_rows") >= k)
      .withColumn("suppressed_groups", lit(0L))
    val residual = g.filter(col("n_rows") < k)
      .agg(sum(col("n_rows")).cast("long").as("n_rows"),
        sum(col("metric_sum")).cast("long").as("metric_sum"),
        count(lit(1)).cast("long").as("suppressed_groups"))
      .filter(col("suppressed_groups") > 0)
    val nulledResidual = keyNames.foldLeft(residual) { (acc, kn) =>
      acc.withColumn(kn, lit(null).cast(g.schema(kn).dataType))
    }.select(g.columns.map(col) :+ col("suppressed_groups"): _*)
    released.unionByName(nulledResidual)
  }

  /** qc21 — key-SKEW card: per candidate key column, row count,
    * distinct-value count, the heaviest value's share (permille), and
    * Gini impurity in permille (1000 − Σcᵢ²·1000 DIV n² — the
    * concentration measure that stays EXACT integer arithmetic where
    * entropy's log floats). This is the card read BEFORE choosing a
    * partition/join/bucket key at scale: a key with top_permille near
    * 1000 or gini near 0 hash-partitions one executor to death (the
    * j12 salting trigger); high gini + high distinct is a good key.
    *
    * Shape: per column one map-combined count aggregate to the value
    * space, then a card-sized re-aggregate; columns union into one
    * frame. Nothing touches raw rows twice, no windows. */
  def keySkewCard(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    require(cols.forall(df.columns.contains),
      s"unknown columns: ${cols.filterNot(df.columns.contains).mkString(", ")}")
    cols.map { c =>
      df.groupBy(col(c).cast("string").as("v"))
        .agg(count(lit(1)).as("c"))
        .agg(sum(col("c")).as("n_rows"),
          count(lit(1)).as("n_distinct"),
          max(col("c")).as("top_count"),
          sum(col("c") * col("c")).as("ss"))
        .select(lit(c).as("key_col"),
          col("n_rows").cast("long").as("n_rows"),
          col("n_distinct").cast("long").as("n_distinct"),
          expr("top_count * 1000 DIV n_rows").as("top_permille"),
          expr("1000 - ss * 1000 DIV (n_rows * n_rows)").as("gini_permille"))
    }.reduce(_.unionByName(_))
  }
}
