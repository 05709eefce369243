package graft.operators

import org.apache.spark.sql.DataFrame
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
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      one.select(lit(c).as("col_name"), col(s"__nn_$c").as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"), col(s"__mn_$c").as("min_v"),
        col(s"__mx_$c").as("max_v"))
    }.reduce(_.unionAll(_))
    stacked
  }
}
