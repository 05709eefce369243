package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic spherical k-means — the learned IVF coarse quantizer
  * that makes the ANN family (Similarity.topKIvf / topKMultiProbe /
  * nearDupPairs) self-contained for a user holding raw embeddings:
  * train here, partition the corpus on the learned cell ids, probe with
  * the same assignment. Fills the training-loop half of the reference's
  * data-prep surface that emb3 (the assignment step alone) left open.
  *
  * Determinism contract (the whole design): no RNG anywhere.
  *  - init: the k vectors with the SMALLEST ids seed the centroids
  *    (cid = seed vec_id), so two runs — and the DuckDB oracle — start
  *    identically.
  *  - assignment: cosine argmax with min-cid tie-break (emb3's
  *    max-struct fusion; codegen'd FloatDotProduct kernels).
  *  - update: each cell's new centroid is the per-dimension mean folded
  *    STRICTLY LEFT-TO-RIGHT over members sorted by vec_id, in DOUBLE,
  *    then rounded once to FLOAT — bit-identical on Spark and the
  *    oracle's list_reduce, independent of partitioning.
  *  - fixed iteration count (no convergence test): the oracle unrolls
  *    one CTE block per iteration.
  *
  * Scale design: centroids are MODEL STATE — k×dim floats, driver-held
  * and broadcast each round (the MLlib KMeans shape); only they ever
  * collect(), the corpus never does. Assignment is a pure broadcast map
  * over the vectors; the update is one hash shuffle per iteration. The
  * strict-fold update streams each cell's members through a sorted
  * collect_list, which bounds cell size by executor memory — that is
  * the price of bitwise reproducibility. For corpora where cells exceed
  * that (≫10⁷ members/cell), [[updateMeansFast]] is the same mean via
  * partial map-side aggregation: statistically identical, not bitwise
  * deterministic (float sums reassociate under partitioning), which is
  * why the verified default is the strict fold.
  */
object Clustering {

  /** One Lloyd assignment step: nearest centroid by cosine, min-cid
    * tie-break. `cents` must be (cid, cv: array<float>) and tiny — it
    * is broadcast; the corpus side is a pure map + one hash aggregate.
    * Output: (vec_id, cid, cos). */
  def assign(vectors: DataFrame, cents: DataFrame): DataFrame = {
    val scored = vectors.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        (Similarity.dot(col("embedding"), col("cv")) /
          (sqrt(Similarity.dot(col("embedding"), col("embedding"))) *
           sqrt(Similarity.dot(col("cv"), col("cv"))))).as("cos"))
    scored.groupBy(col("vec_id"))
      .agg(max(struct(col("cos"), (-col("cid")).as("neg"), col("cid"))).as("pick"))
      .select(col("vec_id"), col("pick.cid").as("cid"), col("pick.cos").as("cos"))
  }

  /** Top-`n` centroid routing (the IVF nprobe move): like [[assign]]
    * but keeping each vector's `n` best cells with their rank —
    * (vec_id, cid, cos, crn), crn 1..n by (cos DESC, cid ASC). Same
    * broadcast k-row scoring; the only extra cost over assign is the
    * per-vector rank, and the output is n rows per vector instead of
    * one. Multi-cell routing is what recovers the truth mass a single
    * coarse cell misses (measured at sf0.01: the routed cell holds
    * 13/50 of the exact top-5 truth, the top-2 cells 25/50). */
  def assignTop(vectors: DataFrame, cents: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val scored = vectors.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        (Similarity.dot(col("embedding"), col("cv")) /
          (sqrt(Similarity.dot(col("embedding"), col("embedding"))) *
           sqrt(Similarity.dot(col("cv"), col("cv"))))).as("cos"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("cid").asc)
    scored.withColumn("crn", row_number().over(w)).filter(col("crn") <= n)
  }

  /** Strict-fold per-cell means: members sorted by vec_id, summed
    * left-to-right in double per dimension, divided by the cell count,
    * rounded once to float. One shuffle; deterministic under any
    * partitioning. */
  private def updateMeansStrict(asg: DataFrame, vectors: DataFrame, dim: Int): DataFrame =
    asg.select(col("vec_id"), col("cid"))
      .join(vectors.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .groupBy(col("cid"))
      .agg(sort_array(collect_list(struct(col("vec_id"), col("embedding")))).as("ms"),
        count(lit(1)).as("n"))
      .select(col("cid"), expr(
        s"transform(sequence(1, $dim), i -> CAST(aggregate(ms, 0D, " +
          "(acc, m) -> acc + CAST(element_at(m.embedding, i) AS DOUBLE)) / n AS FLOAT))")
        .as("cv"))

  /** The at-scale update: the same per-cell mean via map-side partial
    * sums (posexplode → sum/count per (cid, dim)) — no per-cell list
    * ever materializes, so cell size is unbounded. Trades bitwise
    * determinism (double sums reassociate across partitions) for
    * unbounded cells; use when cells outgrow executor memory. */
  def updateMeansFast(asg: DataFrame, vectors: DataFrame): DataFrame =
    asg.select(col("vec_id"), col("cid"))
      .join(vectors.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .select(col("cid"), posexplode(col("embedding")))
      .groupBy(col("cid"), col("pos"))
      .agg((sum(col("col").cast("double")) / count(lit(1))).as("m"))
      .groupBy(col("cid"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("dims"))
      .select(col("cid"),
        expr("transform(dims, d -> CAST(d.m AS FLOAT))").as("cv"))

  /** Train the coarse quantizer: `iters` Lloyd rounds from the k
    * smallest-id seeds. Returns the final centroids (cid, cv) as a
    * local k-row DataFrame. Empty cells keep their previous centroid
    * (deterministic; the oracle's LEFT JOIN + coalesce twin).
    *
    * `strictMeans = true` (default) is the bitwise-reproducible fold —
    * the verified configuration, bounded by the largest cell fitting an
    * executor. `strictMeans = false` trains through [[updateMeansFast]]
    * instead: unbounded cell size, statistically identical centroids
    * (parity-tested within float tolerance in DataOpsSpec), NOT bitwise
    * stable across partitionings — the knob to flip when a 100 TB
    * corpus's cells outgrow the strict path. */
  def kmeans(vectors: DataFrame, k: Int, iters: Int, dim: Int = 64,
      strictMeans: Boolean = true): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    // model state: k×dim floats on the driver (the only collect — the
    // corpus itself never leaves the executors)
    var cents: Seq[(Long, Seq[Float])] = vectors
      .select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id")).limit(k)
      .as[(Long, Seq[Float])].collect().toSeq
    var it = 0
    while (it < iters) {
      val asg = assign(vectors, cents.toDF("cid", "cv"))
      val upd = (if (strictMeans) updateMeansStrict(asg, vectors, dim)
                 else updateMeansFast(asg, vectors))
        .as[(Long, Seq[Float])].collect().toMap
      cents = cents.map { case (c, old) => c -> upd.getOrElse(c, old) }
      it += 1
    }
    cents.toDF("cid", "cv")
  }

  /** Cell-quality report (emb6): per learned cell, member count and the
    * fixed-point sum of member-to-centroid cosines — the inertia-style
    * diagnostic that tells an ANN operator whether its quantizer is
    * balanced (skewed cells → skewed sim4/sim5 probe cost) and tight
    * (low mean cosine → recall loss). Per-row round to the 1e-6 grid,
    * then BIGINT sum (the lr1 trick): exact under any partitioning, no
    * float mean whose add-order could drift from the oracle. One
    * broadcast assign + one hash aggregate. */
  def cellReport(vectors: DataFrame, cents: DataFrame): DataFrame =
    assign(vectors, cents)
      .groupBy("cid")
      .agg(count(lit(1)).as("n_members"),
        sum(round(col("cos") * lit(1e6)).cast("long")).as("cos_sum_fp"))

  /** Train + final assignment: every vector's learned cell id — the
    * column to partition an ANN corpus on (feeds Similarity.topKIvf /
    * topKMultiProbe / nearDupPairs as their `cellCol`). */
  def kmeansAssign(vectors: DataFrame, k: Int, iters: Int, dim: Int = 64): DataFrame =
    assign(vectors, kmeans(vectors, k, iters, dim))

  /** Product-quantization codebook (emb5): an independent deterministic
    * spherical k-means per `m`-way subspace split of the embedding.
    * Returns (sub, cid, cv) — m×k sub-centroids, each of dim/m floats.
    * The IVF-PQ pairing: emb4's coarse cells route the search, PQ codes
    * shrink the in-cell residual scan — at m=8 over 64 float dims a
    * vector's scan representation drops from 256 B to 8 small ints
    * (32×), which is what lets a 100 TB corpus's index fit a cluster's
    * memory. Codebook training inherits kmeans' determinism contract
    * wholesale (smallest-id seeds per subspace, min-cid tie-breaks,
    * strict-fold means); cids are seed vec_ids, not 0..k-1. */
  def pqTrain(vectors: DataFrame, m: Int = 8, k: Int = 4, iters: Int = 2,
      dim: Int = 64): DataFrame = {
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    val sub = dim / m
    // the m codebooks are INDEPENDENT trainings — submit them as
    // concurrent Spark jobs (Lloyd rounds are inherently sequential
    // within one subspace, but nothing orders subspaces against each
    // other); results stay deterministic because each training is, and
    // the union is by explicit `sub` id, not completion order. Each
    // body blocks on Spark collects for its whole training, so it runs
    // under `blocking { }`: the global ForkJoinPool then spawns
    // compensation threads instead of letting m long-blocked tasks
    // saturate its cores-sized parallelism and serialize the intended
    // overlap (or starve other library code sharing the pool).
    import scala.concurrent.{Await, Future, blocking}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val trained = (0 until m).map { s =>
      Future {
        blocking {
          val sliced = vectors.select(col("vec_id"),
            slice(col("embedding"), s * sub + 1, sub).as("embedding"))
          kmeans(sliced, k, iters, sub)
            .select(lit(s.toLong).as("sub"), col("cid"), col("cv"))
        }
      }
    }
    trained.map(Await.result(_, Duration.Inf)).reduce(_.unionByName(_))
  }

  /** PQ code assignment: explode each vector into its m subvectors
    * map-side, broadcast the m×k codebook, cosine argmax per (vector,
    * subspace) with the min-cid tie-break. Output (vec_id, sub, code) —
    * a pure broadcast map + one hash aggregate, the same shape as
    * [[assign]]; the corpus never shuffles its float payload. */
  /** Reconstruct each vector from its PQ codes: per subspace, look the
    * code up in the broadcast codebook and concatenate the sub-centroids
    * in subspace order. The decode half of the PQ contract — an ANN
    * scorer works against these m×(dim/m)-float approximations instead
    * of the raw corpus (sim5). Pure broadcast map + one hash aggregate
    * per vector. */
  def pqReconstruct(codes: DataFrame, codebook: DataFrame): DataFrame =
    codes.alias("a")
      .join(broadcast(codebook.alias("b")),
        col("a.sub") === col("b.sub") && col("a.code") === col("b.cid"))
      .select(col("a.vec_id"), col("a.sub"), col("b.cv"))
      .groupBy("vec_id")
      .agg(sort_array(collect_list(struct(col("sub"), col("cv")))).as("parts"))
      .select(col("vec_id"),
        expr("flatten(transform(parts, p -> p.cv))").as("embedding"))

  def pqAssign(vectors: DataFrame, codebook: DataFrame, m: Int = 8,
      dim: Int = 64): DataFrame = {
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    val sub = dim / m
    val parts = vectors.select(col("vec_id"),
        explode(array((0 until m).map(s =>
          struct(lit(s.toLong).as("sub"),
            slice(col("embedding"), s * sub + 1, sub).as("sv"))): _*)).as("p"))
      .select(col("vec_id"), col("p.sub").as("sub"), col("p.sv").as("sv"))
    parts.join(broadcast(codebook), Seq("sub"))
      .select(col("vec_id"), col("sub"), col("cid"),
        (Similarity.dot(col("sv"), col("cv")) /
          (sqrt(Similarity.dot(col("sv"), col("sv"))) *
           sqrt(Similarity.dot(col("cv"), col("cv"))))).as("cos"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(max(struct(col("cos"), (-col("cid")).as("neg"), col("cid"))).as("pick"))
      .select(col("vec_id"), col("sub"), col("pick.cid").as("code"))
  }

  /** emb8 — embedding-space drift per stratum: cosine between each
    * stratum's centroid and the global centroid (the monitoring card
    * for "did this source's embedding distribution move"). Cosine is
    * scale-invariant, so it is computed between the per-dimension SUM
    * vectors — and those sums are EXACT: coordinates are fixed-pointed
    * to integers first (floor(x·1e6 + 0.5)), making the per-(stratum,
    * dim) aggregation order-independent integer arithmetic. Only the
    * final 64-element fold runs in DOUBLE, in ascending-dim order both
    * engines, so the card reproduces bit-for-bit. Shuffle profile: one
    * map-side-combined hash agg keyed by (stratum, dim) — dims ×
    * strata rows out, never the corpus. */
  def centroidDrift(vectors: DataFrame, labelCol: String,
      scale: Double = 1e6): DataFrame = {
    val fx = vectors
      .select(col(labelCol).as("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("label"), col("dim"),
        floor(col("x").cast("double") * scale + 0.5).cast("long").as("v"))
    val byLabel = fx.groupBy("label", "dim")
      .agg(sum("v").as("sl"), count(lit(1)).as("n"))
    val global = fx.groupBy("dim").agg(sum("v").as("sg"))
    byLabel.join(global, Seq("dim"))
      .groupBy("label")
      .agg(max("n").as("n_vecs"), // n is per-label constant across dims
        sort_array(collect_list(struct(col("dim"), col("sl"), col("sg")))).as("t"))
      .select(col("label").cast("long").as("label"),
        col("n_vecs").cast("long").as("n_vecs"),
        (expr("aggregate(t, 0D, (acc, x) -> acc + CAST(x.sl AS DOUBLE) * CAST(x.sg AS DOUBLE))") /
          (sqrt(expr("aggregate(t, 0D, (acc, x) -> acc + CAST(x.sl AS DOUBLE) * CAST(x.sl AS DOUBLE))")) *
           sqrt(expr("aggregate(t, 0D, (acc, x) -> acc + CAST(x.sg AS DOUBLE) * CAST(x.sg AS DOUBLE))"))))
          .as("drift_cos"))
  }
}
