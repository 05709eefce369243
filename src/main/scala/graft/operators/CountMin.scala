package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.F

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a DataFrame —
  * the heavy-hitter / frequency sketch that fits where exact counting
  * doesn't: `d` hash rows × `w` counter columns, a FIXED d·w-cell
  * table regardless of corpus size, built in one scan with map-side
  * combine and mergeable across partitions/batches by plain cell-wise
  * SUM (the property that makes it a streaming/distributed sketch).
  * The point estimate for a key is the MIN over its d cells, which is
  * always ≥ the true count (hash collisions only ever ADD) and within
  * ε·N with probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
  *
  * Hashing is the repo's portable md5-derived 60-bit hash seeded by
  * the row index, so a SQL oracle replays cells and estimates
  * bit-for-bit — the estimator itself is cross-engine-gated, not just
  * the exact side (the hll1 discipline).
  *
  * Shape at 100 TB: the token scan emits d cell keys per occurrence
  * (a constant fan-out) into ONE aggregate over ≤ d·w keys — the only
  * shuffle is onto a fixed-size key space, and the resulting frame is
  * broadcastable state a streaming gate or a next batch can merge
  * into by summing. */
object CountMin {

  /** Cell column for `term` in hash row `row`: portable md5 hash
    * seeded by the row, reduced mod `w`. */
  def cell(term: Column, row: Int, w: Int): Column =
    pmod(F.portableHash60(term, row), lit(w.toLong))

  /** Build the sketch over one occurrence-per-row `term`s: one scan,
    * d cells per occurrence, aggregated to (rr, cc, n) — at most d·w
    * rows. */
  def sketch(tokens: DataFrame, term: Column, d: Int, w: Int): DataFrame = {
    require(d >= 1 && w >= 1, s"need d >= 1 and w >= 1, got d=$d w=$w")
    tokens
      .select(posexplode(array((0 until d).map(i => cell(term, i, w)): _*))
        .as(Seq("rr", "cc")))
      .groupBy(col("rr").cast("long").as("rr"), col("cc"))
      .agg(count(lit(1)).cast("long").as("n"))
  }

  /** Point estimates for the `term` column of `queries` against a
    * built sketch: min over the d cells; `queries` keeps its other
    * columns. Missing cells (possible only for terms the sketch never
    * saw) read as 0.
    *
    * Contract: `queries` must not carry columns named `rr`/`cc`/`n`
    * (the probe/join names) — enforced loudly below. `queries` rows
    * should be DISTINCT: the probe fan-out is undone by grouping on
    * all query columns, so duplicate rows COLLAPSE TO ONE silently
    * (no distributed check can flag it without an extra pass) — a
    * caller that needs per-row output carries its own unique tag
    * column, which rides the groupBy and keeps cardinality. */
  def estimate(sk: DataFrame, queries: DataFrame, term: Column,
      d: Int, w: Int): DataFrame = {
    val reserved = queries.columns.toSet.intersect(Set("rr", "cc", "n"))
    require(reserved.isEmpty,
      s"queries must not carry the probe columns ${reserved.mkString(", ")}")
    val probes = queries
      .withColumn("__cells", array((0 until d).map(i =>
        struct(lit(i.toLong).as("rr"), cell(term, i, w).as("cc"))): _*))
      .select(queries.columns.map(col) :+
        explode(col("__cells")).as("__p"): _*)
      .select(queries.columns.map(col) :+ col("__p.rr").as("rr") :+
        col("__p.cc").as("cc"): _*)
    probes.join(sk, Seq("rr", "cc"), "left")
      .groupBy(queries.columns.map(col): _*)
      .agg(min(coalesce(col("n"), lit(0L))).cast("long").as("estimate"))
  }
}
