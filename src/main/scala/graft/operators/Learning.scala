package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic distributed logistic-regression training (lr1/lr2) —
  * the in-engine "quality classifier" every curation pipeline ends up
  * wanting (fastText-style: label a small seed set, train a linear
  * model, gate the corpus on its score). Same design stance as
  * [[Clustering.kmeans]]: the model is DRIVER STATE (dim+1 doubles),
  * the corpus never collects, and every training step is reproducible
  * bit-for-bit on Spark AND the DuckDB oracle.
  *
  * Two tricks make distributed training deterministic (float sums
  * across a shuffle reassociate, so naive `sum(double)` differs run to
  * run — the same reason money aggregates here run on cents):
  *
  *  1. **Fixed-point gradients.** Each row's per-dimension gradient
  *     contribution is rounded once to a `scale`-resolution grid and
  *     summed as BIGINT — exact and order-independent, with map-side
  *     partial aggregation intact. One pass per iteration. `scale`
  *     trades resolution for headroom: contributions are O(|x|), so
  *     long overflow needs Σ|x|·scale ≈ 9.2e18 — at scale=1e9 that is
  *     ~1e9 unit-scale rows per dimension; drop to 1e6 for a
  *     trillion-row corpus.
  *  2. **Algebraic sigmoid.** σ̃(t) = 0.5 + 0.5·t/(1+|t|) (the "fast
  *     sigmoid") instead of 1/(1+e^-t): only +, ×, ÷, |·| — IEEE-exact
  *     everywhere — where libm `exp` is NOT correctly rounded and
  *     differs between the JVM and DuckDB's C runtime.
  *
  * The update rule is plain batch gradient descent on the σ̃-residual:
  * w ← w − lr · (Σᵢ xᵢ·(σ̃(w·xᵢ) − yᵢ)) / N, bias as feature 0, w₀ = 0.
  * Fixed iteration count, no early stop — the oracle unrolls one CTE
  * block per iteration (the kmeans convention).
  */
object Learning {

  /** Per-row score column: σ̃(w·x) with bias, x = features cast to
    * double. `w` is the dim+1-element model as a COLUMN (array<double>)
    * so the generated code is identical across training iterations —
    * literal weights would make every iteration's plan unique and pay
    * full whole-stage-codegen compilation per round. */
  private def sigScore(features: Column, w: Column): Column = {
    val x = concat(array(lit(1.0)), transform(features, _.cast("double")))
    val t = aggregate(zip_with(x, w, (a, b) => a * b), lit(0.0), (acc, v) => acc + v)
    lit(0.5) + lit(0.5) * t / (lit(1.0) + abs(t))
  }

  /** Train `iters` rounds of deterministic batch GD. `features` is an
    * array<float> column, `label` a 0/1 column. Returns the final
    * weights as driver state. */
  def logregTrain(df: DataFrame, features: Column, label: Column,
      dim: Int, iters: Int, lr: Double, scale: Double = 1e9): Seq[Double] = {
    require(iters >= 0 && dim > 0 && lr > 0 && scale > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(features.as("f"), label.cast("double").as("y"))
    val n = base.count().toDouble
    require(n > 0, "logregTrain needs a non-empty training frame")
    var w: Seq[Double] = Seq.fill(dim + 1)(0.0)
    var it = 0
    while (it < iters) {
      // weights ride in as a broadcast 1-row frame (not literals) and
      // x/residual materialize ONCE per row in a projection below the
      // aggregate: the plan — and its whole-stage codegen — is byte-
      // identical every round, and no gradient aggregate re-evaluates
      // the w·x fold (literal weights + unshared sig measured 16.5s at
      // sf0.1 for dim=64; this shape runs the same round in ~0.2s)
      val prepared = base
        .crossJoin(broadcast(Seq(Tuple1(w)).toDF("w")))
        .select(
          concat(array(lit(1.0)), transform(col("f"), _.cast("double"))).as("x"),
          (sigScore(col("f"), col("w")) - col("y")).as("r"))
      // dim+1 BIGINT sums in ONE aggregate pass: exact, order-free,
      // map-side combined — the whole iteration is a single job
      val grads = (0 to dim).map(j =>
        sum(round(element_at(col("x"), j + 1) * col("r") * lit(scale))
          .cast("long")).as(s"g$j"))
      val row = prepared.select(grads: _*).head()
      w = w.zipWithIndex.map { case (wj, j) =>
        wj - lr * (row.getLong(j).toDouble / scale / n)
      }
      it += 1
    }
    w
  }

  /** Train + emit the model as rows: (dim, w) with dim 0 = bias —
    * the hash-checkable surface of the training loop (lr1). */
  def logregWeights(df: DataFrame, features: Column, label: Column,
      dim: Int, iters: Int, lr: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    logregTrain(df, features, label, dim, iters, lr).zipWithIndex
      .map { case (wv, j) => (j.toLong, wv) }.toDF("dim", "w")
  }

  /** Score every row with a trained model and keep those at or above
    * `threshold` — the classifier gate (lr2). The model rides as
    * LITERALS here (a gate compiles once — the column-shaped weights
    * exist for the training loop where codegen reuse matters), so this
    * is a pure stateless projection + filter: the same plan runs batch
    * or Structured Streaming unchanged (stream≡batch pinned in
    * ScaleSpec). */
  def classifierGate(df: DataFrame, features: Column, id: Column,
      w: Seq[Double], threshold: Double): DataFrame =
    df.select(id.as("vec_id"), sigScore(features, array(w.map(lit): _*)).as("score"))
      .filter(col("score") >= threshold)

  /** Threshold yield sweep (lr4): for every decile threshold t/10, how
    * many documents and tokens a `score ≥ t/10` gate would keep — the
    * yield curve read before committing to a quality-filter threshold
    * (the corpus-budget counterpart of lr3's calibration card). Scores
    * land in decile bins (score 1.0 clamps into bin 9), and each
    * threshold's keep-set is the running total of bins ≥ t, so the
    * corpus is scanned ONCE into a ≤10-row bin frame; the sweep itself
    * is a ≤10×10 broadcast join over card-sized frames — nothing after
    * the first aggregation scales with the corpus. token_yield_permille
    * is exact integer arithmetic against the threshold-0 total.
    *
    * Output: (thr_decile 0..9, n_docs_kept, n_tokens_kept,
    * token_yield_permille). */
  def thresholdSweep(scored: DataFrame, score: Column, tokens: Column): DataFrame = {
    val bins = scored
      .select(least(floor(score * 10).cast("long"), lit(9L)).as("bin"),
        tokens.cast("long").as("tk"))
      .groupBy("bin").agg(count(lit(1)).as("n"), sum(col("tk")).as("t"))
    val spine = scored.sparkSession.range(0, 10)
      .select(col("id").as("thr_decile"))
    val swept = broadcast(spine).join(broadcast(bins),
        col("bin") >= col("thr_decile"), "left")
      .groupBy("thr_decile")
      .agg(coalesce(sum(col("n")), lit(0L)).as("n_docs_kept"),
        coalesce(sum(col("t")), lit(0L)).as("n_tokens_kept"))
    // the unpartitioned window runs over the 10-row card, never the corpus
    swept.select(col("thr_decile"), col("n_docs_kept"), col("n_tokens_kept"),
      expr("1000 * n_tokens_kept DIV max(n_tokens_kept) OVER ()")
        .as("token_yield_permille"))
  }
}
