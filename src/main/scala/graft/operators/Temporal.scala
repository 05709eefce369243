package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively (SURVEY §2.6 family;
  * the brief's canonical custom-operator examples).
  *
  * The as-of join matches each left row to the LATEST right row with
  * `rightTime <= leftTime` on the same key. The naive formulation is a
  * range join (O(n·m) BroadcastNestedLoopJoin, or join+argmax with a
  * pair blow-up); the shape that survives 100 TB is the UNION-WINDOW
  * forward fill: tag both sides, union them, and run ONE window over
  * (key, time) carrying the last version value forward — a single hash
  * shuffle on the key, zero pair materialization, and AQE handles skew
  * like any window. DuckDB's native ASOF JOIN is the oracle twin.
  */
object Temporal {

  /** As-of join: for every `left` row, attach `valueCol` of the latest
    * `right` row with rightTime <= leftTime, matching on `key`. Rows with
    * no preceding version get NULL (ASOF LEFT JOIN semantics); pass the
    * result through `.filter(col(...).isNotNull)` for inner semantics.
    * Ties (rightTime == leftTime) match, like DuckDB's `ts >= valid_from`.
    * `right` must be unique per (key, rightTime) — pre-dedupe otherwise
    * (Dedup.keepOneByKey), or the forward fill is ambiguous. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, valueCol: String,
      asOfValueName: String = "asof_value"): DataFrame = {
    val leftCols = left.columns
    val l = left.select(
      col(key).as("__k") +: col(leftTime).as("__t") +: lit(0).as("__isr") +:
        lit(null).cast(right.schema(valueCol).dataType).as("__v") +:
        leftCols.map(c => left(c).as(s"__l_$c")): _*)
    val r = right.select(
      col(key).as("__k") +: col(rightTime).as("__t") +: lit(1).as("__isr") +:
        col(valueCol).as("__v") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")): _*)
    // versions sort BEFORE events at equal time (__isr desc) so an
    // equal-timestamp version is visible to the event's forward fill
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__isr").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__filled", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__isr") === 0)
      .select(leftCols.map(c => col(s"__l_$c").as(c)) :+
        col("__filled").as(asOfValueName): _*)
  }

  /** t10 — as-of join WITH TOLERANCE (pandas merge_asof's `tolerance`):
    * the latest version at-or-before each event counts only if it is at
    * most `tolSeconds` old — staler state is as good as none (the
    * staleness contract of feature stores and sensor fusion). Same
    * union + single-window forward fill as [[asofJoin]] — one hash
    * shuffle on the key, no pair materialization — with the matched
    * version's TIME filled alongside its value so the staleness test is
    * a per-row µs subtraction. `valueCol` must be non-null on version
    * rows (the fills travel as two parallel columns). */
  def asofJoinTolerance(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, valueCol: String,
      tolSeconds: Long, asOfValueName: String = "asof_value"): DataFrame = {
    require(tolSeconds > 0, s"tolSeconds must be positive, got $tolSeconds")
    val leftCols = left.columns
    val l = left.select(
      col(key).as("__k") +: col(leftTime).as("__t") +: lit(0).as("__isr") +:
        lit(null).cast(right.schema(valueCol).dataType).as("__v") +:
        lit(null).cast(right.schema(rightTime).dataType).as("__vt") +:
        leftCols.map(c => left(c).as(s"__l_$c")): _*)
    val r = right.select(
      col(key).as("__k") +: col(rightTime).as("__t") +: lit(1).as("__isr") +:
        col(valueCol).as("__v") +: col(rightTime).as("__vt") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")): _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__isr").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__vf", last(col("__v"), ignoreNulls = true).over(w))
      .withColumn("__vtf", last(col("__vt"), ignoreNulls = true).over(w))
      .filter(col("__isr") === 0)
      .select(leftCols.map(c => col(s"__l_$c").as(c)) :+
        when(unix_micros(col("__t")) - unix_micros(col("__vtf")) <=
          tolSeconds * 1000000L, col("__vf")).as(asOfValueName): _*)
  }

  /** Range (interval-containment) join: left rows matched to intervals
    * [startCol, endCol] containing leftTime, on an equality key. The
    * equi-key keeps this a hash join — the interval predicate is a
    * post-join filter on co-grouped rows, never a cross product. For
    * keyless interval joins, bucket time into granules and equi-join on
    * (granule) — not needed while every reference range join is keyed. */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, startCol: String, endCol: String): DataFrame =
    left.join(right, Seq(key))
      .filter(col(leftTime) >= col(startCol) && col(leftTime) <= col(endCol))

  /** Validity-interval merge (t8, gaps-and-islands): collapse each
    * key's overlapping-or-touching `[start, end]` intervals into
    * maximal disjoint spans with a merge-count receipt — timeline
    * compaction for validity ranges, coverage windows, lease/session
    * spans. `start == previous end` merges (closed intervals touch);
    * a gap of 1 unit splits.
    *
    * Classic two-window island detection, every frame PARTITIONED BY
    * the key (one hash shuffle, zero global windows): the running max
    * of `end` over preceding rows finds island starts (`start` beyond
    * everything seen = new island), a running sum of those flags
    * numbers the islands, and one grouped agg emits each island's
    * span. Equal `(start, end)` duplicates are order-interchangeable
    * under the running max, so the result is deterministic at any
    * partitioning. Times must be integer (epoch micros per the
    * oracle-parity rules), `end >= start` expected. */
  def mergeIntervals(df: DataFrame, key: Column, start: Column, end: Column): DataFrame = {
    val base = df.select(key.as("key"),
      start.cast("long").as("s"), end.cast("long").as("e"))
    val ord = Window.partitionBy("key").orderBy("s", "e")
    val prevMax = max("e").over(ord.rowsBetween(Window.unboundedPreceding, -1))
    val flag = when(col("s") > coalesce(prevMax, lit(Long.MinValue)), 1L).otherwise(0L)
    base.withColumn("island",
        sum(flag).over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("key", "island")
      .agg(min("s").as("start"), max("e").as("end"), count(lit(1)).as("n_merged"))
      .select("key", "start", "end", "n_merged")
  }

  /** t14 — interval integrity audit: per key, how many intervals
    * OVERLAP a predecessor and how much uncovered GAP time the
    * timeline holds — the data-quality gate run before trusting any
    * validity-interval table (an SCD2 build, a session table, the
    * as-of dimension every fs operator joins): overlapping versions
    * make "the value current at t" ambiguous (two rows match — the
    * silent poison in a point-in-time join), gaps make it undefined.
    * Detection is exact including NON-adjacent overlaps: under the
    * (s, e) sort, interval i overlaps iff s_i < running-max(e) of its
    * predecessors — [[mergeIntervals]]' island flag read for its
    * other meaning. Gap total = span − merged coverage, both from the
    * same pass. Output: (key, n_intervals, n_overlapping, gap_total)
    * in the interval's own integer time unit.
    *
    * Shape: one per-key window (the mergeIntervals shuffle) + a keyed
    * agg; nothing scales past the interval table itself. */
  def intervalAudit(df: DataFrame, key: Column, start: Column,
      end: Column): DataFrame = {
    val base = df.select(key.as("key"),
      start.cast("long").as("s"), end.cast("long").as("e"))
    val ord = Window.partitionBy("key").orderBy("s", "e")
    val prevMax = max("e").over(ord.rowsBetween(Window.unboundedPreceding, -1))
    base
      .withColumn("pm", prevMax)
      .withColumn("ov", when(col("s") < coalesce(col("pm"), lit(Long.MinValue)),
        1L).otherwise(0L))
      .withColumn("gap", greatest(col("s") -
        coalesce(col("pm"), col("s")), lit(0L)))
      .groupBy("key")
      .agg(count(lit(1)).cast("long").as("n_intervals"),
        sum("ov").cast("long").as("n_overlapping"),
        sum("gap").cast("long").as("gap_total"))
  }

  /** Keyless bucketed range join (t12): probes matched to intervals
    * CONTAINING them when there is no equi-key to co-group on — the
    * case [[rangeJoin]] can't take (its key join is what bounds the
    * pair space). The classic fix: quantize time into buckets at least
    * as long as the longest interval, explode each interval into the
    * ≤2 buckets it can touch, equi-join probes on their single bucket,
    * then post-filter exact containment. Correctness is exhaustive —
    * an interval of length ≤ bucket can only intersect the bucket of
    * its start or its end, and a probe inside it shares one of those
    * two buckets.
    *
    * The bucket width is validated against the ACTUAL max interval
    * length (one tiny agg) — a silent violation would silently drop
    * matches. Scale shape: pure maps + ONE equi-join shuffled on the
    * time bucket (interval side ≤ doubles); a naive no-key range join
    * is a broadcast-nested-loop over the whole probe×interval space.
    * Hot buckets (many intervals in one window) are the j12 salting
    * case if they ever dominate. */
  def rangeJoinBucketed(probes: DataFrame, probeTs: String,
      intervals: DataFrame, start: String, end: String,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    val iv = intervals
      .withColumn("__s", unix_micros(col(start)))
      .withColumn("__e", unix_micros(col(end)))
    val maxLen = iv.agg(max(col("__e") - col("__s"))).head()
    if (!maxLen.isNullAt(0))
      require(maxLen.getLong(0) <= bucketUs,
        s"rangeJoinBucketed: longest interval (${maxLen.getLong(0)} us) exceeds " +
        s"bucketUs=$bucketUs — matches would be silently dropped; widen the bucket")
    val expanded = iv.withColumn("__bkt",
        explode(sequence(expr(s"__s DIV $bucketUs"), expr(s"__e DIV $bucketUs"))))
    probes
      .withColumn("__bkt", expr(s"unix_micros($probeTs) DIV $bucketUs"))
      .join(expanded, Seq("__bkt"))
      .filter(unix_micros(col(probeTs)).between(col("__s"), col("__e")))
      .drop("__bkt", "__s", "__e")
  }

  /** SCD2 dimension build (t11): a change log of (key, ts, state) rows
    * becomes slowly-changing-dimension type-2 validity intervals —
    * consecutive same-state rows collapse (only CHANGES open a new
    * version), each version runs [valid_from, next change's ts), and
    * the open version (valid_to NULL) is flagged current. The inverse
    * of the as-of family: t1/t6/t10 READ such a table; this builds it
    * from the raw log. Change detection is null-safe (a state equal to
    * its predecessor under `<=>` is dropped).
    *
    * Input rows must be unique per (key, ts) — pre-dedup with
    * [[graft.operators.Dedup.keepOneByKey]] — so the window order is
    * total and the build deterministic. Scale shape: two windows over
    * the same key partitioning = ONE hash shuffle on key; no joins. */
  def scd2(changes: DataFrame, key: String, ts: String, state: String): DataFrame = {
    val byKey = Window.partitionBy(key).orderBy(col(ts))
    changes
      .withColumn("prev_state", lag(col(state), 1).over(byKey))
      .where(!(col(state) <=> col("prev_state")))
      .withColumn("valid_to", lead(col(ts), 1).over(byKey))
      .select(col(key), col(ts).as("valid_from"), col("valid_to"),
        col(state).as("state"), col("valid_to").isNull.as("is_current"))
  }
}
