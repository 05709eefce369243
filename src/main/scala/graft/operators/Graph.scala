package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Host-graph analytics for corpus curation: web-scale pretraining
  * pipelines weight documents by the authority of their source/linked
  * hosts (the CommonCrawl-curation practice behind harmonic-centrality
  * and PageRank host filters). The fixture graph comes from the url1
  * link extraction; the operator is generic over any (src, dst) edge
  * frame.
  *
  * Scale design: each iteration is one equi-join of the edge list
  * against the current rank vector (shuffle on src) plus one hash
  * aggregate on dst (map-side combined) — the standard distributed
  * PageRank shape. Edges and the out-degree join are persisted ONCE
  * across iterations ([[graft.CacheScope]]); rank vectors are O(hosts),
  * orders of magnitude smaller than the corpus. At 100 TB the edge list
  * would live bucketed-by-src so the per-iteration join never
  * reshuffles the big side, and each iteration's rank frame would be
  * checkpointed to cut lineage (here: iteration count is a small
  * constant, so plan depth stays bounded).
  */
object Graph {

  /** Integer-exact PageRank: ranks are BIGINT micro-units (Σ init =
    * `scale`), contributions use truncating integer division
    * (`r DIV deg`, then `damp·Σ DIV 1000`), so every value is exact
    * integer arithmetic — order-independent, reproducible bit-for-bit
    * by any engine (the determinism contract the float formulation
    * can't give: a distributed float Σ has no defined order).
    * Semantics, documented: dangling-node mass is dropped (no
    * redistribution) — the damping base keeps every node's rank
    * positive; duplicate edges collapse (DISTINCT); self-loops are
    * legal and contribute to their own node.
    *
    * Output: `(host, rank_micro)` for every node that appears as an
    * edge endpoint. */
  def pagerank(edges: DataFrame, iters: Int, scale: Long = 1000000000000L,
      dampPermille: Long = 850L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampPermille >= 0 && dampPermille <= 1000,
      s"dampPermille must be in [0, 1000], got $dampPermille")
    val e = edges.select(col("src"), col("dst")).distinct()
    val nodes = graft.CacheScope.persist(
      e.select(col("src").as("host"))
        .unionByName(e.select(col("dst").as("host"))).distinct())
    val n = nodes.count()
    require(n > 0, "pagerank needs a non-empty edge list")
    val init = scale / n
    val base = (1000L - dampPermille) * init / 1000L
    val ed = graft.CacheScope.persist(
      e.join(e.groupBy("src").agg(count(lit(1)).as("deg")), Seq("src")))
    var r = nodes.withColumn("r", lit(init))
    // At most two rank frames stay cached (ADVICE r9): each iteration
    // materializes the new frame (count() — O(hosts) rows, which the
    // next iteration's join would have paid anyway), then releases its
    // predecessor so high-iteration runs don't accumulate cached frames
    // and the lineage they pin. The final frame stays persisted for the
    // caller; CacheScope.releaseAll() frees it at pipeline end.
    var prevRank: DataFrame = null
    for (_ <- 1 to iters) {
      val contrib = ed.join(r.withColumnRenamed("host", "src"), Seq("src"))
        .select(col("dst").as("host"), expr("r DIV deg").as("c"))
        .groupBy("host").agg(sum(col("c")).as("cs"))
      r = graft.CacheScope.persist(
        nodes.join(contrib, Seq("host"), "left")
          .select(col("host"),
            expr(s"$base + ($dampPermille * coalesce(cs, 0L)) DIV 1000").as("r")))
      r.count()
      if (prevRank != null) prevRank.unpersist()
      prevRank = r
    }
    r.select(col("host"), col("r").as("rank_micro"))
  }
}
