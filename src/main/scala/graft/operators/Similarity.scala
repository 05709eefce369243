package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.FloatDotProduct

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, an IVF-style
  * cell-restricted variant as the scale path, and cosine near-dup pairs.
  *
  * Numeric contract: dot products are a strict left fold in DOUBLE — the
  * codegen'd FloatDotProduct expression — so the DuckDB oracle
  * (list_reduce over double-cast lists) reproduces values bit-for-bit.
  *
  * Scale design:
  *  - Norms are computed ONCE per vector before the pair join (not per
  *    pair): O(N) instead of O(N·M) norm work.
  *  - Brute-force is O(Q×N) with the corpus side broadcast when small /
  *    block-nested when not; IVF restricts candidates to the query's
  *    coarse cell (`label` stands in for a learned coarse quantizer),
  *    turning the cross product into an equi-join on cell id.
  *  - Top-k is a windowed row_number; the shuffle sort does per-query
  *    partial top-k map-side.
  */
object Similarity {

  /** Codegen'd strict-left-fold double dot product (graft.plans). */
  def dot(a: Column, b: Column): Column = FloatDotProduct.dot(a, b)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  private def withNorm(df: DataFrame, id: String, v: String, n: String): DataFrame =
    df.withColumn(n, sqrt(dot(col(v), col(v))))

  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("cos").as("cosine"), col("rank").cast("long").as("rank"))
  }

  /** Exact top-k neighbors by cosine for the given query rows.
    * Ties broken by ascending neighbor id (deterministic).
    *
    * This is the exact BASELINE: the plan is a broadcast-nested-loop
    * O(Q×N) scoring pass, intentional only while the query side is
    * small. `maxQueries` bounds that contract — a query set past the
    * cap fails fast with a pointer at the IVF scale path instead of
    * silently materializing a Q×N cross product on the cluster. */
  def topK(queries: DataFrame, corpus: DataFrame, k: Int,
      maxQueries: Int = 10000): DataFrame = {
    val nq = queries.limit(maxQueries + 1).count()
    require(nq <= maxQueries,
      s"Similarity.topK is the exact O(Q*N) baseline and its query side " +
      s"exceeds maxQueries=$maxQueries; use topKIvf/topKMultiProbe for " +
      s"large query sets, or raise maxQueries deliberately")
    val q = withNorm(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qv")), "query_id", "qv", "qn")
    val c = withNorm(corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("cv")), "neighbor_id", "cv", "cn")
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
    rankTopK(scored, k)
  }

  /** IVF-style ANN: candidates restricted to the query's coarse cell. */
  def topKIvf(vectors: DataFrame, cellCol: String, k: Int): DataFrame = {
    val q = withNorm(vectors.select(col("vec_id").as("query_id"),
      col("embedding").as("qv"), col(cellCol).as("cell")), "query_id", "qv", "qn")
    val c = withNorm(vectors.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("cv"), col(cellCol).as("cell")), "neighbor_id", "cv", "cn")
    val scored = q.join(c, Seq("cell")).filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
    rankTopK(scored, k)
  }

  /** Asymmetric IVF top-k: queries score against a DIFFERENT corpus
    * representation than their own — the IVF-PQ search shape (sim5),
    * where the corpus side is PQ reconstructions
    * ([[Clustering.pqReconstruct]]) while queries stay full-precision.
    * Same equi-join-on-cell candidate generation as [[topKIvf]]; at
    * scale the reconstructed corpus is the compact artifact that
    * actually fits memory, queries arrive raw. Both frames need
    * (vec_id, embedding, cellCol). */
  def topKIvfAsym(queries: DataFrame, corpus: DataFrame, cellCol: String, k: Int): DataFrame = {
    val q = withNorm(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qv"), col(cellCol).as("cell")), "query_id", "qv", "qn")
    val c = withNorm(corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("cv"), col(cellCol).as("cell")), "neighbor_id", "cv", "cn")
    val scored = q.join(c, Seq("cell")).filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
    rankTopK(scored, k)
  }

  /** IVF multi-probe ANN: each query probes its own coarse cell plus
    * `nprobe - 1` ring-adjacent cells ((cell ± i) mod numCells) — the
    * recall lever real IVF indexes use when the nearest neighbor falls
    * just across a cell boundary. Candidate generation stays an
    * equi-join on cell id: the query side fans out ×nprobe (map-side
    * explode, no extra shuffle of the corpus), and because every
    * corpus vector lives in exactly one cell the probe union is
    * duplicate-free by construction. Recall ⊇ single-probe topKIvf at
    * ×nprobe candidate cost — still O(N·nprobe/numCells) per query,
    * never O(N). */
  def topKMultiProbe(vectors: DataFrame, cellCol: String, k: Int,
      numCells: Int, nprobe: Int): DataFrame = {
    require(nprobe >= 1 && nprobe <= numCells,
      s"nprobe must be in [1, numCells=$numCells], got $nprobe")
    // ring offsets 0, +1, -1, +2, -2, … taking the first nprobe
    val offsets = (0 until numCells)
      .flatMap(i => if (i == 0) Seq(0) else Seq(i, -i))
      .take(nprobe)
    val probes = array(offsets.map(o =>
      pmod(col(cellCol) + lit(o), lit(numCells))): _*)
    val q = withNorm(vectors.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"), explode(probes).as("cell")),
      "query_id", "qv", "qn")
    val c = withNorm(vectors.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("cv"), col(cellCol).as("cell")), "neighbor_id", "cv", "cn")
    val scored = q.join(c, Seq("cell")).filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
    rankTopK(scored, k)
  }

  /** Embedding-cosine near-duplicate pairs (a < b) with cosine ≥
    * threshold, blocked by coarse cell to avoid the full cross product. */
  def nearDupPairs(vectors: DataFrame, cellCol: String, threshold: Double): DataFrame = {
    val a = withNorm(vectors.select(col("vec_id").as("id_a"),
      col("embedding").as("va"), col(cellCol).as("cell")), "id_a", "va", "na")
    val b = withNorm(vectors.select(col("vec_id").as("id_b"),
      col("embedding").as("vb"), col(cellCol).as("cell")), "id_b", "vb", "nb")
    a.join(b, Seq("cell")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos").as("cosine"))
  }

  /** Semantic dedup (sem1, SemDeDup-style): drop every vector that has a
    * SMALLER-id within-cell neighbor at cosine ≥ threshold; survivors
    * keep their cell. The pruning rule is one pass and deterministic —
    * "drop x iff ∃ y < x in x's cell with cos(x,y) ≥ τ" — the same
    * min-id-survivor convention as the text dedup family (d1/d2), not a
    * transitive clustering (that's d6's job; compose with it if cluster
    * semantics are wanted). Blocked by the cell column, so the intended
    * composition is cells learned by [[graft.operators.Clustering.kmeansAssign]]:
    * cluster the corpus semantically, then prune redundancy inside each
    * cell — prunes O(Σ cell²) pairs instead of O(N²).
    *
    * Scale shape: [[nearDupPairs]]'s banded equi-join on the cell plus
    * one left-anti join — no cartesian node anywhere (ScaleSpec pins
    * it). */
  def semanticDedup(vectors: DataFrame, cellCol: String, threshold: Double): DataFrame = {
    val dropIds = nearDupPairs(vectors, cellCol, threshold)
      .select(col("id_b").as("vec_id")).distinct()
    vectors.join(dropIds, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col(cellCol))
  }
}
