package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    // Lineage/cache bound WITHOUT a per-iteration job: the loop builds
    // a lazy chain (plan depth grows linearly — fine for the small
    // constant iteration counts the catalog uses), and only every
    // `ckptEvery` iterations cuts it once with an eager persist+count,
    // releasing the previous cut. That keeps at most one O(hosts)
    // checkpoint frame cached for high-iteration runs (ADVICE r9)
    // while paying ZERO extra actions for iters < ckptEvery — the r10
    // per-iteration count() cost one full job per iteration and was
    // the suite's worst bench regression. The final frame is persisted
    // lazily; the caller's first action materializes it and
    // CacheScope.releaseAll() frees it at pipeline end.
    val ckptEvery = 8
    var prevCkpt: DataFrame = null
    for (i <- 1 to iters) {
      val contrib = ed.join(r.withColumnRenamed("host", "src"), Seq("src"))
        .select(col("dst").as("host"), expr("r DIV deg").as("c"))
        .groupBy("host").agg(sum(col("c")).as("cs"))
      r = nodes.join(contrib, Seq("host"), "left")
        .select(col("host"),
          expr(s"$base + ($dampPermille * coalesce(cs, 0L)) DIV 1000").as("r"))
      if (i % ckptEvery == 0 && i < iters) {
        r = graft.CacheScope.persist(r)
        r.count()
        if (prevCkpt != null) prevCkpt.unpersist()
        prevCkpt = r
      }
    }
    graft.CacheScope.persist(r.select(col("host"), col("r").as("rank_micro")))
  }

  /** Integer-exact PERSONALIZED PageRank (pr2, topic-sensitive PR):
    * teleport mass goes only to a SEED host set — the curation question
    * "how authoritative is this host relative to a trusted list"
    * (seed = known-good domains; high scores mark the quality
    * neighborhood, the Common-Crawl-curation complement to global
    * PageRank's popularity). Same integer semantics as [[pagerank]]
    * (BIGINT micro-units, truncating DIV, dangling mass dropped,
    * DISTINCT edges) with two changes: r₀ = scale/|S| on seeds and 0
    * elsewhere, and the damping base is paid only to seeds — so all
    * rank in the graph flows FROM the seed set. Seeds not present as
    * edge endpoints are ignored (semi-join), matching the oracle's
    * IN-list over graph nodes.
    *
    * Scale shape: identical to [[pagerank]] — per iteration one edge ⋈
    * rank equi-join plus one map-combined hash agg, lazy chain with
    * lineage cut every 8 iterations; the seed frame is O(|S|) and
    * joins as a broadcast flag onto the O(hosts) rank vector. */
  def personalizedPagerank(edges: DataFrame, seeds: DataFrame, iters: Int,
      scale: Long = 1000000000000L, dampPermille: Long = 850L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampPermille >= 0 && dampPermille <= 1000,
      s"dampPermille must be in [0, 1000], got $dampPermille")
    val e = edges.select(col("src"), col("dst")).distinct()
    val nodes = graft.CacheScope.persist(
      e.select(col("src").as("host"))
        .unionByName(e.select(col("dst").as("host"))).distinct())
    val sd = graft.CacheScope.persist(
      seeds.select(col("host")).distinct()
        .join(nodes, Seq("host"), "leftsemi"))
    val ns = sd.count()
    require(ns > 0, "personalizedPagerank needs at least one seed present in the graph")
    val init = scale / ns
    val base = (1000L - dampPermille) * init / 1000L
    val ed = graft.CacheScope.persist(
      e.join(e.groupBy("src").agg(count(lit(1)).as("deg")), Seq("src")))
    // every iteration re-reads the seed-flagged node vector (O(hosts))
    val flagged = graft.CacheScope.persist(
      nodes.join(broadcast(sd.withColumn("is_seed", lit(1L))),
        Seq("host"), "left"))
    var r = flagged.select(col("host"),
      when(col("is_seed").isNotNull, lit(init)).otherwise(lit(0L)).as("r"))
    val ckptEvery = 8
    var prevCkpt: DataFrame = null
    for (i <- 1 to iters) {
      val contrib = ed.join(r.withColumnRenamed("host", "src"), Seq("src"))
        .select(col("dst").as("host"), expr("r DIV deg").as("c"))
        .groupBy("host").agg(sum(col("c")).as("cs"))
      r = flagged.join(contrib, Seq("host"), "left")
        .select(col("host"),
          (when(col("is_seed").isNotNull, lit(base)).otherwise(lit(0L)) +
            expr(s"($dampPermille * coalesce(cs, 0L)) DIV 1000")).as("r"))
      if (i % ckptEvery == 0 && i < iters) {
        r = graft.CacheScope.persist(r)
        r.count()
        if (prevCkpt != null) prevCkpt.unpersist()
        prevCkpt = r
      }
    }
    graft.CacheScope.persist(r.select(col("host"), col("r").as("rank_micro")))
  }

  /** Integer-exact HITS (hits1): unnormalized hub/authority mutual
    * recursion over BIGINT counts — a_t(v) = Σ_{u→v} h_{t-1}(u),
    * h_t(u) = Σ_{u→v} a_t(v) — with h_0 = 1. Skipping the usual L2
    * normalization keeps every value an exact integer (pure sums, no
    * division anywhere), so the result is order-independent and
    * reproducible bit-for-bit by any engine; relative ordering, which
    * is what authority/hub filters consume, is unchanged by the
    * missing normalization. Unnormalized values grow by at most a
    * max-degree² factor per round, so iterations are capped at 4 (the
    * curation sweet spot is 2–3) to keep scores inside BIGINT on any
    * real host graph; past that, callers should rescale between rounds.
    *
    * Scale shape: per round, two equi-joins of the edge list against an
    * O(hosts) score vector plus two map-side-combined hash aggs — the
    * same distributed shape as [[pagerank]]. Edges persist once across
    * rounds; score vectors are O(hosts). Dangling semantics: a node
    * with no in-edges has authority 0; no out-edges → hub 0.
    *
    * Output: `(host, hub, authority)` for every edge endpoint. */
  def hits(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 4,
      s"iters must be in [1, 4] (unnormalized scores grow ~deg^2/round), got $iters")
    val e = graft.CacheScope.persist(
      edges.select(col("src"), col("dst")).distinct())
    // persisted (r19): the node list anchors both score vectors in
    // every round — five consumers re-ran the union+distinct before
    val nodes = graft.CacheScope.persist(
      e.select(col("src").as("host"))
        .unionByName(e.select(col("dst").as("host"))).distinct())
    var h = nodes.withColumn("s", lit(1L))
    var a: DataFrame = null
    for (_ <- 1 to iters) {
      a = nodes.join(
          e.join(h.withColumnRenamed("host", "src"), Seq("src"))
            .groupBy(col("dst").as("host")).agg(sum(col("s")).as("sa")),
          Seq("host"), "left")
        .select(col("host"), coalesce(col("sa"), lit(0L)).as("s"))
      h = nodes.join(
          e.join(a.withColumnRenamed("host", "dst"), Seq("dst"))
            .groupBy(col("src").as("host")).agg(sum(col("s")).as("sh")),
          Seq("host"), "left")
        .select(col("host"), coalesce(col("sh"), lit(0L)).as("s"))
    }
    h.select(col("host"), col("s").as("hub"))
      .join(a.select(col("host"), col("s").as("authority")), Seq("host"))
  }

  /** Degree-distribution card (g1): for each degree value, how many
    * nodes have it — out-degrees over edge sources, in-degrees over
    * destinations, stacked long-form under a `direction` label. The
    * sanity card read BEFORE pr1/hits1/url4 spend a shuffle per
    * iteration: a power-law tail here says "expect skew — salt or cap",
    * a spike at degree 1 says the extraction produced a star, and a
    * max-degree outlier is the future hot key by name.
    *
    * Shape: duplicate edges collapse once (DISTINCT), then two hash
    * aggs per direction — nodes-sized intermediate, degrees-sized
    * output. Nothing scales with raw corpus rows. */
  def degreeCard(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
    def hist(end: Column, dir: String) =
      e.groupBy(end.as("node")).agg(count(lit(1)).as("degree"))
        .groupBy("degree").agg(count(lit(1)).as("n_hosts"))
        .select(lit(dir).as("direction"), col("degree"), col("n_hosts"))
    hist(col("src"), "out").unionByName(hist(col("dst"), "in"))
  }

  /** g2 — connected components by alternating LARGE-STAR / SMALL-STAR
    * (Kiveris et al. 2014, "Connected Components in MapReduce and
    * Beyond" — the published at-scale alternative to
    * [[graft.operators.NearDup.dedupClusters]]'s min-label
    * propagation): label propagation pays one shuffle per unit of
    * component DIAMETER, while the star operations contract every
    * component toward its minimum node in O(log n) rounds regardless
    * of diameter — the difference between 6 and 60 shuffles on a
    * chain-shaped component (syndication chains, A-cites-B-cites-C,
    * are exactly that shape).
    *
    * One round: large-star — per node u over its full neighborhood
    * Γ(u), connect every STRICTLY LARGER neighbor to
    * m = min(Γ(u) ∪ {u}); small-star — per node u over its
    * smaller-or-equal neighbors Γ⁻(u), connect every one (and u) to
    * m = min(Γ⁻(u) ∪ {u}). Both preserve connectivity and strictly
    * shrink non-star components; the fixpoint is a star forest whose
    * centers are the component minima. Each operation is one hash
    * agg + one equi-join on node keys — the groupBy carries
    * collect-free columnar min, never a neighbor list.
    *
    * Output: (node, component) for every node appearing in `edges`
    * (callers union isolated nodes back — the dedupClustersSparse
    * convention). Fails loudly past `maxRounds` rather than returning
    * an approximate clustering. */
  def connectedComponentsStar(edges: DataFrame, maxRounds: Int = 30): DataFrame = {
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("u"), col("v"))
        .unionByName(e.select(col("v").as("u"), col("u").as("v"))).distinct()
      val m = sym.groupBy("u").agg(least(min("v"), first("u")).as("m"))
      sym.join(m, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val ordered = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v")).filter(col("u") =!= col("v"))
      val m = ordered.groupBy("u").agg(least(min("v"), first("u")).as("m"))
      ordered.join(m, Seq("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(m.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v")).distinct()
    }
    // Eager localCheckpoint per round, not persist: the loop re-derives
    // from `e` several times per round (two star ops + the fixpoint
    // check), and cache-plan matching proved unreliable across the
    // unpersist/repersist hand-over — measured at sf0.1, the persist
    // variant re-ran the upstream pair generation every round (15 s/
    // round on a 255-edge frame); the hard lineage cut makes each round
    // a concrete-RDD-to-concrete-RDD step (1.5 s/round, same fixpoint).
    // Same move as the sim11c layered-walk fix.
    var e = edges.select(col("src").as("u"), col("dst").as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint()
    var eCnt = e.count()
    var rounds = 0
    var done = false
    while (!done && rounds < maxRounds) {
      val next = smallStar(largeStar(e)).localCheckpoint()
      val cnt = next.count()
      // fixpoint: the edge SET is unchanged (both are canonical
      // (max, min) forms after smallStar, so except() is exact)
      done = cnt == eCnt && next.except(e).isEmpty
      e = next
      eCnt = cnt
      rounds += 1
    }
    if (!done)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge in $maxRounds rounds")
    // the fixpoint is a star forest: every edge (u, v) has v = the
    // component minimum; centers belong to their own component
    val members = e.select(col("u").as("node"), col("v").as("component"))
    val centers = e.select(col("v").as("node"), col("v").as("component")).distinct()
    // e is a checkpointed RDD; the ContextCleaner reclaims it once the
    // returned frame's lineage (rooted at that RDD) is unreachable
    members.unionByName(centers).distinct()
  }
}
