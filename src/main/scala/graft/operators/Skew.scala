package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY "salting for skew").
  *
  * AQE's skew-join split handles most cases at runtime; explicit salting
  * remains the tool when a single key dominates beyond what partition
  * splitting fixes (e.g. a null-ish default key holding 30% of a 100 TB
  * fact table). Semantics are identical to a plain equi-join — only the
  * physical distribution changes — so results stay oracle-comparable.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salting the big side into
    * `nSalts` buckets and replicating the small side once per bucket.
    * The shuffle key becomes (key, salt): a hot key spreads over nSalts
    * reducers instead of one. `saltOf` must be deterministic per row
    * (e.g. `pmod(hash(unique_id), nSalts)` — never rand(), which breaks
    * retry idempotence).
    *
    * Only inner / left / left_semi / left_anti are legal: the small side
    * is replicated nSalts times, so any join type that emits UNMATCHED
    * small-side rows (right / full_outer) would duplicate each one per
    * salt — silently wrong results. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltOf: Column, nSalts: Int, joinType: String = "inner"): DataFrame = {
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")(jt),
      s"saltedJoin: join type '$joinType' would duplicate unmatched " +
        "replicated small-side rows; use inner/left/left_semi/left_anti")
    val saltedBig = big.withColumn("__salt", pmod(saltOf, lit(nSalts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    saltedBig.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
