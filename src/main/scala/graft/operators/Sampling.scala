package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation.
  *
  * Random sampling (`df.sample`) is irreproducible across runs, partition
  * layouts, and engines — useless for a 100 TB corpus where the sample
  * defines the dataset. These samplers key every keep/drop decision on a
  * content-stable md5 bucket of the row's key, so:
  *
  *  - the same row always lands on the same side (reruns, retries, and
  *    speculative tasks agree);
  *  - the decision is a pure map — no shuffle, no driver coordination,
  *    embarrassingly parallel at any scale;
  *  - the DuckDB oracle reproduces the sample bit-for-bit (md5-prefix
  *    bucketing, the engine-portable hash convention).
  *
  * The bucket is `md5(key) mod 1000` (permille); nested sampling is
  * monotone — `bernoulli(df, k, 100)` ⊂ `bernoulli(df, k, 200)` — which
  * is what makes sample-size sweeps consistent.
  */
object Sampling {

  /** The raw 60-bit md5-prefix priority — the content-stable per-row
    * rank that [[bucket]] reduces mod 1000 and [[weightedSample]] divides
    * by the stratum weight. Exposed for fixed-COUNT selections (smallest-k
    * by priority): the engine-portable twin of DuckDB's
    * `('0x' || substr(md5(k), 1, 15))::BIGINT`. */
  def hashPriority(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** 60-bit md5-prefix bucket in [0, 1000): the engine-portable twin of
    * DuckDB's `('0x' || substr(md5(k), 1, 15))::BIGINT % 1000`. */
  def bucket(key: Column): Column = pmod(hashPriority(key), lit(1000))

  /** Keep rows whose key-bucket falls below `permille` (‰ keep rate). */
  def bernoulli(df: DataFrame, key: Column, permille: Int): DataFrame = {
    require(permille >= 0 && permille <= 1000, s"permille in [0,1000], got $permille")
    df.filter(bucket(key) < permille)
  }

  /** Stratified sample: a per-stratum keep rate (‰), e.g. downsampling an
    * over-represented language while keeping the tails — the standard
    * corpus-rebalancing move. Strata absent from `rates` use
    * `defaultPermille`. Still a pure map: the stratum column rides the
    * row, so no shuffle and no per-stratum pass. */
  def stratified(df: DataFrame, key: Column, stratum: Column,
      rates: Map[String, Int], defaultPermille: Int = 1000): DataFrame = {
    require((defaultPermille +: rates.values.toSeq).forall(r => r >= 0 && r <= 1000),
      "all rates must be in [0,1000]")
    val rate = rates.foldLeft(lit(defaultPermille)) { case (acc, (k, r)) =>
      when(stratum === k, lit(r)).otherwise(acc)
    }
    df.filter(bucket(key) < rate)
  }

  /** Deterministic corpus mixing (mix1): sample each stratum so the kept
    * counts hit target proportions `weights` — the data-mixing step that
    * turns raw per-source availability into a training mixture (e.g.
    * 5:2:2:1 across languages). The bottleneck stratum (smallest n/w;
    * ties to the lexicographically smallest name) is kept whole and
    * every other stratum downsamples to match, so the mixture is the
    * LARGEST achievable at those proportions without upsampling.
    * Strata without a weight are dropped (unlisted data stays out of a
    * curated mixture by default).
    *
    * Rates are integer permille computed as `(1000·w_s·n_b) div
    * (w_b·n_s)` — pure integer truncation, bit-identical across
    * engines. Per-stratum counts are S rows of driver-side model state
    * (the kmeans-centroid stance); the filter itself stays a pure
    * [[bucket]] map, so two runs — and reruns at any partitioning —
    * keep exactly the same rows. */
  def mixture(df: DataFrame, key: Column, stratum: Column,
      weights: Map[String, Long]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0), "weights must be positive")
    val counts = df.groupBy(stratum.as("s")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = weights.filter { case (s, _) => counts.getOrElse(s, 0L) > 0 }
    require(present.nonEmpty, "no weighted stratum present in the data")
    val (bs, bw) = present.minBy { case (s, w) => (counts(s).toDouble / w, s) }
    val nb = counts(bs)
    val rates = present.map { case (s, w) => s -> (1000L * w * nb) / (bw * counts(s)) }
    val rate = rates.foldLeft(lit(-1L)) { case (acc, (s, r)) =>
      when(stratum === s, lit(r)).otherwise(acc)
    }
    df.filter(bucket(key) < rate)
  }

  /** Temperature-weighted mixture (mix3): rebalance strata toward the
    * flat distribution by sampling proportional to n^α — the standard
    * multilingual-corpus move (exponent-smoothed sampling à la XLM-R's
    * α-temperature: high-resource languages downsample, the tail keeps
    * its share). Same largest-achievable contract as [[mixture]]: the
    * bottleneck stratum (smallest n, ties to the smallest name — n^(1−α)
    * is monotone, so smallest-n IS the binding stratum) is kept whole
    * and every other stratum downsamples to match the n^α targets.
    *
    * α is restricted to 2^-halvings (0.5, 0.25, …) so n^α is computed by
    * REPEATED SQRT — the one power IEEE-754 defines exactly (sqrt is
    * correctly rounded; pow is not), which is what lets a DuckDB oracle
    * reproduce the permille rates bit-for-bit. Rate formula, evaluated
    * in this exact association order on both engines:
    * `floor((1000.0 · w_s) · n_b / (w_b · n_s))` with w = sqrt^halvings(n)
    * — every step (int→double widening, ·, /, floor) is exactly
    * specified by IEEE-754, so engines cannot disagree.
    *
    * Per-stratum counts are S rows of driver model state (the k-means
    * contract); the filter is the same pure [[bucket]] map as mix1. */
  def temperatureMixture(df: DataFrame, key: Column, stratum: Column,
      halvings: Int = 1): DataFrame = {
    require(halvings >= 1 && halvings <= 4,
      s"halvings in [1,4] (alpha = 0.5 .. 0.0625), got $halvings")
    val counts = df.groupBy(stratum.as("s")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      .filter { case (_, n) => n > 0 }
    require(counts.nonEmpty, "no non-empty stratum present in the data")
    def w(n: Long): Double = {
      var x = n.toDouble; var i = 0
      while (i < halvings) { x = Math.sqrt(x); i += 1 }
      x
    }
    val (bs, nb) = counts.minBy { case (s, n) => (n, s) }
    val wb = w(nb)
    // the bottleneck is pinned to 1000‰ explicitly: its float ratio is
    // ~1000 up to rounding, and a floor to 999 would silently drop 0.1%
    val rates = counts.map { case (s, n) =>
      s -> (if (s == bs) 1000L else Math.floor((1000.0 * w(n)) * nb / (wb * n)).toLong)
    }
    val rate = rates.foldLeft(lit(-1L)) { case (acc, (s, r)) =>
      when(stratum === s, lit(r)).otherwise(acc)
    }
    df.filter(bucket(key) < rate)
  }

  /** mix5 — token-budget mixture: mixtures are SPECIFIED in tokens, not
    * documents, so keep-rates derive from per-stratum TOKEN totals: the
    * budget splits across strata by weight (B_s = budget·w_s DIV Σw),
    * and each stratum keeps permille rate min(1000, 1000·B_s DIV T_s)
    * of its docs by the same content-stable md5 bucket as [[mixture]].
    * The sampled token total hits B_s in expectation (doc sampling
    * can't hit an exact token count without a serial scan; the permille
    * rate is the distributed contract). All integer arithmetic — the
    * oracle reproduces the selection bit-for-bit. Strata with no weight
    * drop; a stratum under budget keeps everything (rate 1000).
    * Scale: one map-side-combined token-total agg (S rows of driver
    * model state) + a pure-map filter. */
  def tokenBudgetMixture(df: DataFrame, key: Column, stratum: Column,
      tokens: Column, budget: Long, weights: Map[String, Long]): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(weights.nonEmpty && weights.values.forall(_ > 0), "weights must be positive")
    val wSum = weights.values.sum
    // Hardening (ADVICE r9): cast the stratum to string so a non-string
    // stratum column can't ClassCastException at collect, and coalesce
    // the token sum so an all-null stratum reads as 0 (dropped below)
    // instead of NPEing with an opaque error.
    val sStr = stratum.cast("string")
    val totals = df.groupBy(sStr.as("s"))
      .agg(coalesce(sum(tokens), lit(0L)).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = weights.filter { case (s, _) => totals.getOrElse(s, 0L) > 0 }
    require(present.nonEmpty, "no weighted stratum present in the data")
    val rates = present.map { case (s, w) =>
      s -> math.min(1000L, (1000L * (budget * w / wSum)) / totals(s))
    }
    val rate = rates.foldLeft(lit(-1L)) { case (acc, (s, r)) =>
      when(sStr === s, lit(r)).otherwise(acc)
    }
    df.filter(bucket(key) < rate)
  }

  /** smp6 — deterministic weighted sample: fixed-size k with selection
    * probability scaling in the stratum weight, and NO RNG state — each
    * row's priority is its content-stable 60-bit md5 hash DIV its
    * stratum weight (pure integer; a w× heavier stratum compresses its
    * priority range w×, so it wins proportionally more of the global
    * smallest-k), and the sample is the k smallest (priority, key)
    * rows. The batch-deterministic stand-in for weighted reservoir
    * sampling: reproducible across engines, reruns, and partitionings.
    * Unweighted strata drop (the [[mixture]] convention).
    * Scale: orderBy+limit plans as TakeOrderedAndProject — per-partition
    * local top-k, driver merges k·partitions rows, never a global sort. */
  def weightedSample(df: DataFrame, key: Column, stratum: Column,
      weights: Map[String, Long], k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(weights.nonEmpty && weights.values.forall(_ > 0), "weights must be positive")
    val w = weights.foldLeft(lit(null).cast("long")) { case (acc, (s, wt)) =>
      when(stratum === s, lit(wt)).otherwise(acc)
    }
    val h = conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")
    df.withColumn("__h", h).withColumn("__w", w)
      .filter(col("__w").isNotNull)
      .withColumn("priority", expr("__h DIV __w"))
      .drop("__h", "__w")
      .orderBy(col("priority"), key)
      .limit(k)
  }

  /** [[weightedSample]]'s data-derived-weight sibling (dp7): the weight
    * is a COLUMN the caller joined in (e.g. a host authority rank from
    * pagerank) instead of a static stratum map — same content-stable
    * integer priority (60-bit md5 DIV weight), same smallest-k contract,
    * same TakeOrderedAndProject plan (per-partition top-k, never a
    * global sort). Rows with null or non-positive weight drop (the
    * unweighted-stratum convention). */
  def weightedSampleBy(df: DataFrame, key: Column, weight: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val h = conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")
    df.withColumn("__h", h).withColumn("__w", weight.cast("long"))
      .filter(col("__w").isNotNull && col("__w") > 0)
      .withColumn("priority", expr("__h DIV __w"))
      .drop("__h", "__w")
      .orderBy(col("priority"), key)
      .limit(k)
  }

  /** Deterministic train/val/test split (smp4): every row gets a split
    * label from its key's md5 bucket — train = [0, 1000-val-test),
    * val = next `valPermille`, test = the top `testPermille`. The same
    * properties as [[bernoulli]] carry over: content-stable (a doc keeps
    * its split across reruns, engines, and corpus growth — rows are
    * never re-dealt when new data arrives, so yesterday's test set never
    * leaks into today's train set), pure map, zero shuffle, oracle-
    * reproducible. Partitions are disjoint and exhaustive by
    * construction. */
  def split(df: DataFrame, key: Column,
      valPermille: Int = 10, testPermille: Int = 10): DataFrame = {
    require(valPermille >= 0 && testPermille >= 0 &&
      valPermille + testPermille <= 1000,
      s"val+test permille must fit in [0,1000], got $valPermille+$testPermille")
    require(!df.columns.contains("split"),
      "input already has a 'split' column; withColumn would silently replace it")
    val trainLim = 1000 - valPermille - testPermille
    df.withColumn("split",
      when(bucket(key) < trainLim, lit("train"))
        .when(bucket(key) < trainLim + valPermille, lit("val"))
        .otherwise(lit("test")))
  }

  /** K-fold assignment + balance card (smp7): every row lands in fold
    * `md5-bucket(key) mod k` — content-stable like [[split]], so a doc
    * keeps its fold across reruns, engines, and corpus growth (the
    * no-refold guarantee cross-validation needs to stay leakage-free) —
    * and the card reports per-fold doc/size totals with an exact
    * integer share so fold imbalance is visible before training. Folds
    * are disjoint and exhaustive by construction. One map + one k-row
    * hash agg; the share window runs over the k-row card only.
    *
    * Output: (fold, n_docs, total_size, docs_share_permille). */
  def kfoldCard(df: DataFrame, key: Column, size: Column, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val hash60 = conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")
    df.select(pmod(hash60, lit(k.toLong)).as("fold"), size.cast("long").as("sz"))
      .groupBy("fold")
      .agg(count(lit(1)).as("n_docs"), sum(col("sz")).as("total_size"))
      .select(col("fold"), col("n_docs"), col("total_size"),
        expr("1000 * n_docs DIV sum(n_docs) OVER ()").as("docs_share_permille"))
  }

  /** Row-weighted deterministic sample (smp8): [[weightedSample]]'s
    * priority scheme with the weight coming from a COLUMN instead of a
    * stratum map — priority = content-stable 60-bit md5 DIV row
    * weight, sample = global smallest-k by (priority, key). This is
    * the dedup-aware downsampling shape: weight rows by inverse
    * near-dup-cluster size and boilerplate families stop dominating
    * the sample while unique content keeps full probability mass.
    * Rows with null/non-positive weight drop (the mixture convention).
    * Same plan as smp6: pure map + TakeOrderedAndProject, no RNG, no
    * global sort. Output: (key, weight, priority). */
  def weightedSampleByColumn(df: DataFrame, key: Column, weight: Column,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    df.select(key.as("key"), weight.cast("long").as("weight"),
        conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")
          .as("__h"))
      .filter(col("weight").isNotNull && col("weight") > 0)
      .withColumn("priority", expr("__h DIV weight"))
      .drop("__h")
      .orderBy(col("priority"), col("key"))
      .limit(k)
  }

  /** Cluster-balanced diversity cap (smp5): keep at most `k` rows per
    * cluster cell, chosen by content-stable md5 order (key tie-break) —
    * the diversity-sampling step that stops dense embedding clusters
    * from dominating a curated sample after sem1-style dedup. Selection
    * is layout-independent (same rows on any partitioning or rerun) and
    * oracle-reproducible; cost is [[topKPerGroup]]'s one shuffle on the
    * cell key with map-side partial top-k. */
  def diversityCap(df: DataFrame, key: Column, cell: Column, k: Int): DataFrame =
    topKPerGroup(df, Seq(cell), Seq(md5(key.cast("string")), key), k)

  /** Exact top-k per group by an explicit deterministic order — the
    * grouped sibling of the global ORDER BY + LIMIT (W2). The window
    * shuffles once on the group key and the sort does map-side partial
    * top-k, so no group ever materializes fully sorted on one node
    * beyond its k rows at the merge. Callers must pass a total order
    * (tie-break to a unique column) or the pick is nondeterministic. */
  def topKPerGroup(df: DataFrame, group: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = Window.partitionBy(group: _*).orderBy(order: _*)
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("rank", col("rank").cast("long"))
  }

  /** Epoch-based mixture (mix2): replicate OR subsample each stratum to
    * a target rate expressed as permille-of-copies — the per-source
    * "epoch count" mixing of LLM pre-training recipes, where an
    * under-represented domain is seen 2.5× per pass and an over-
    * represented one 0.4×. `rate = 2500` → every doc twice, plus a
    * content-stable 50% get a third copy; `rate = 400` → 40% keep, one
    * copy; unlisted strata → 0 (dropped). Integer arithmetic only:
    * `copies = rate DIV 1000 + (md5-bucket(key) < rate MOD 1000)`, so
    * the fractional epoch reuses [[bucket]]'s monotone selection (the
    * 2.5×-run's third-copy docs are exactly the 2.4×-run's plus more).
    *
    * Output = input columns + `epoch` (BIGINT, dense 0..copies-1 per
    * row). Pure map + explode, zero shuffle; the fan-out per row is the
    * copy count itself, so output size is the mixture's token budget —
    * never amplified beyond what the recipe asked for. Downstream
    * consumers keyed on (key, epoch) stay deterministic. */
  def epochs(df: DataFrame, key: Column, stratum: Column,
      rates: Map[String, Long]): DataFrame = {
    require(rates.nonEmpty && rates.values.forall(_ >= 0),
      "rates must be non-negative permille-of-copies")
    require(!df.columns.contains("epoch"),
      "input already has an 'epoch' column; the output would shadow it")
    require(!df.columns.contains("n_copies"),
      "input already has an 'n_copies' column; the internal counter would shadow it")
    val base = rates.foldLeft(lit(0L)) { case (acc, (s, r)) =>
      when(stratum === s, lit(r / 1000)).otherwise(acc)
    }
    val frac = rates.foldLeft(lit(0L)) { case (acc, (s, r)) =>
      when(stratum === s, lit(r % 1000)).otherwise(acc)
    }
    val nCopies = base + when(bucket(key) < frac, lit(1L)).otherwise(lit(0L))
    df.withColumn("n_copies", nCopies)
      .filter(col("n_copies") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("n_copies") - 1)))
      .drop("n_copies")
  }

  /** mix7 — mixture cooldown schedule: per (epoch, stratum), the
    * linearly interpolated weight between a start and an end mixture
    * and the planned document draw — the "anneal the data mix" recipe
    * (pretrain-heavy early, high-quality-heavy late; the cooldown
    * phase every modern pretraining run ends with) as an integer-exact
    * card the epoch fan-out executes. w_e = (w₀·(E−1−e) + w₁·e) DIV
    * (E−1) in permille; planned = n_s · w_e DIV 1000. Endpoints land
    * exactly on the start/end mixtures; integer interpolation is
    * monotone between them, reproducible anywhere.
    *
    * Shape: one stratum count agg (strata-sized) crossed with the
    * E-row epoch frame — two card frames, the documented allowed
    * cross shape; nothing scales with the corpus. */
  def cooldownSchedule(df: DataFrame, stratum: Column,
      startPermille: Map[String, Long], endPermille: Map[String, Long],
      epochs: Int): DataFrame = {
    require(epochs >= 2, s"need >= 2 epochs to interpolate, got $epochs")
    val strata = (startPermille.keySet ++ endPermille.keySet).toSeq.sorted
    require(strata.nonEmpty, "need at least one stratum weight")
    val spark = df.sparkSession
    import spark.implicits._
    val w = strata.map(s => (s, startPermille.getOrElse(s, 0L),
        endPermille.getOrElse(s, 0L)))
      .toDF("stratum", "w0", "w1")
    val counts = df.groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).cast("long").as("n_docs"))
    val ep = spark.range(0, epochs).select(col("id").as("epoch"))
    w.join(counts, Seq("stratum"), "left")
      .na.fill(0L, Seq("n_docs"))
      .crossJoin(ep)
      .select(col("epoch"), col("stratum"),
        expr(s"(w0 * (${epochs - 1} - epoch) + w1 * epoch) DIV ${epochs - 1}")
          .as("weight_permille"),
        col("n_docs"))
      .withColumn("planned_docs", expr("n_docs * weight_permille DIV 1000"))
  }

  /** mix6 — deterministic weighted interleave (weighted-fair-queuing
    * order): the final TRAINING ORDER of a mixed corpus, with strata
    * interleaved smoothly in proportion to their weights instead of
    * concatenated in blocks (block order makes the last training epoch
    * see one source only — the classic mixture bug interleaving fixes).
    * Each row gets a content-stable rank within its stratum (md5
    * priority, [[Ranking.groupRank]]'s per-(group, bucket) windows),
    * a virtual time rank·1000 DIV weight — a w× heavier stratum
    * advances its clock w× slower, so its rows appear w× as often —
    * and the global position is the exact rank of (vt, id) via
    * [[Ranking.globalRank]]'s two-level prefix count. Integer-exact,
    * RNG-free, reproducible on any engine; no global sort anywhere.
    * Unweighted strata get `defaultWeight`. Output: (stratum, id, vt,
    * position). */
  def interleavedOrder(df: DataFrame, stratum: Column, id: Column,
      weights: Map[String, Long], defaultWeight: Long = 1L): DataFrame = {
    require(weights.values.forall(_ > 0) && defaultWeight > 0,
      "weights must be positive")
    val prio = conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long")
    val ranked = Ranking.groupRank(
      df.select(stratum.as("grp"), id.as("id"), prio.as("prio")),
      col("grp"), col("id"), col("prio"))
    val w = weights.foldLeft(lit(defaultWeight)) { case (acc, (s, wt)) =>
      when(col("grp") === s, lit(wt)).otherwise(acc)
    }
    // Persisted (the d15/NearDup multi-consumer pattern): globalRank
    // reads withVt twice (its eager bounds action + the rank pass) and
    // the stratum join reads it a third time — without the persist the
    // whole two-level groupRank subtree recomputes per consumer.
    // Released by the pipeline's CacheScope.releaseAll().
    val withVt = graft.CacheScope.persist(ranked.withColumn("w", w)
      .select(col("grp").as("stratum"), col("id"),
        expr("(rank * 1000) DIV w").as("vt")))
    Ranking.globalRank(withVt, col("id"), col("vt"))
      .select(col("id"), col("score").as("vt"), col("rank").as("position"))
      .join(withVt.select(col("id"), col("stratum")), Seq("id"))
      .select(col("stratum"), col("id"), col("vt"), col("position"))
  }

  /** Largest-remainder (Hamilton) apportionment of an integer `budget`
    * across keys proportional to `weight` — the crawl-ops allocator
    * (url6): a fetch budget splits across hosts by authority such that
    * Σ quota == budget EXACTLY and every quota is within one unit of
    * its exact proportional share. Floor shares `(B·w) DIV T` first;
    * the `B − Σfloor` leftover units go one each to the keys with the
    * largest remainders `(B·w) MOD T`, ties broken by the portable
    * md5 key hash (then the key itself, keeping the order total even
    * under a hash collision) — all integer arithmetic, so a SQL
    * oracle replays the split bit-for-bit. Degenerate input: a zero
    * (or empty) total weight short-circuits every quota to 0 — there
    * is no proportional share to apportion — so Σ quota == budget
    * holds exactly whenever Σ weight > 0.
    *
    * Shape at 100 TB: weights arrive pre-aggregated (an O(keys)
    * frame); the remainder rank is [[Ranking.globalRank]]'s two-level
    * prefix-count rank — millions of hosts never funnel through a
    * single-partition window; the two scalars (total, leftover) ride
    * 1-row broadcast frames. */
  def apportionBudget(df: DataFrame, key: Column, weight: Column,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val base = df.select(key.as("key"), weight.cast("long").as("w"))
      .withColumn("hid", conv(substring(md5(col("key").cast("string")), 1, 15), 16, 10)
        .cast("long"))
    // t coalesced to 0 on an empty frame; a zero/NULL total short-
    // circuits every share to 0 (documented: Σ quota == budget only
    // when Σ weight > 0) instead of dividing by zero into NULL quotas
    val tot = base.agg(coalesce(sum("w"), lit(0L)).cast("long").as("t"))
    val scored = graft.CacheScope.persist(base.crossJoin(broadcast(tot))
      .withColumn("q", expr(s"IF(t <= 0, 0L, ($budget * w) DIV t)"))
      .withColumn("rem", expr(s"IF(t <= 0, 0L, ($budget * w) % t)")))
    val leftover = scored.agg(
      when(coalesce(max("t"), lit(0L)) <= 0L, lit(0L))
        .otherwise(lit(budget) - sum("q")).cast("long").as("leftover"))
    // rank carried IN the frame (rankRows keeps every column): the hid
    // hash is ordering state only — ties break (rem DESC, hid, key) —
    // so a 60-bit hash collision between two keys can no longer
    // duplicate rows through a join-back on hid
    val ranked = Ranking.rankRows(scored, -col("rem"), Seq(col("hid"), col("key")))
    ranked.crossJoin(broadcast(leftover))
      .select(col("key"), col("w").as("weight"),
        (col("q") + when(col("rank") <= col("leftover"), 1L).otherwise(0L))
          .cast("long").as("quota"))
  }

  /** mix8 — UniMax language-budget allocation (Chung et al. 2023,
    * "UniMax: Fairer and More Effective Language Sampling for
    * Large-Scale Multilingual Pretraining" — the published successor
    * to temperature sampling: instead of a temperature knob, give
    * every language an equal share of the token budget EXCEPT that no
    * language repeats more than `epochCap` epochs of its available
    * data; the freed budget redistributes equally among the rest).
    *
    * Water-filling, closed-form: languages sort ascending by their cap
    * (epochCap · available tokens, ties by language); scanning in that
    * order, language i is CAPPED iff its cap fits an equal split of
    * what remains assuming all smaller languages were capped
    * (cap_i · (n − i + 1) ≤ B − Σ_{j<i} cap_j) — with ascending caps
    * the capped set is a prefix, enforced by a prefix-min so a
    * non-monotone edge cannot split it. Uncapped languages share the
    * leftover equally (integer DIV; the ≤ n−1-token truncation remainder
    * stays unallocated and is visible in the card). The budget B is
    * stated as a permille of the corpus's own one-epoch token total
    * (`budgetPermille` = 1000 → train on exactly one epoch's worth) —
    * the self-normalizing parameterization.
    *
    * Output per language: available tokens, cap, allocated tokens,
    * epochs_permille (allocated·1000 DIV available — over 1000 means
    * repetition), and the capped flag. Every window here runs over the
    * LANGUAGE frame — model-sized at any corpus scale — and the only
    * corpus-sized work is the one map-combined token-total agg. */
  def unimaxAllocation(df: DataFrame, lang: Column, tokens: Column,
      epochCap: Int = 2, budgetPermille: Int = 1000): DataFrame = {
    require(epochCap >= 1, s"epochCap must be >= 1, got $epochCap")
    require(budgetPermille >= 1,
      s"budgetPermille must be >= 1, got $budgetPermille")
    val avail = df.groupBy(lang.as("lang"))
      .agg(sum(tokens).cast("long").as("avail"))
      .filter(col("avail") > 0)
    val tot = avail.agg(
      expr(s"sum(avail) * $budgetPermille DIV 1000").cast("long").as("budget"))
    val byCap = Window.orderBy(col("cap").asc, col("lang").asc)
    val whole = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val pre = avail.crossJoin(broadcast(tot))
      .withColumn("cap", col("avail") * epochCap)
      .withColumn("i", row_number().over(byCap).cast("long"))
      .withColumn("n", count(lit(1)).over(whole))
      .withColumn("p_prev", coalesce(
        sum("cap").over(byCap.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("cond",
        when(col("cap") * (col("n") - col("i") + 1) <=
          col("budget") - col("p_prev"), 1).otherwise(0))
      .withColumn("capped",
        min("cond").over(byCap.rowsBetween(Window.unboundedPreceding, 0)) === 1)
    val scalars = pre.groupBy().agg(
      sum(when(col("capped"), col("cap")).otherwise(0L)).as("p_t"),
      sum(when(col("capped"), 1L).otherwise(0L)).as("n_capped"),
      max("n").as("n_all"), max("budget").as("b"))
    pre.crossJoin(broadcast(scalars))
      .withColumn("share", when(col("n_all") > col("n_capped"),
        expr("(b - p_t) DIV (n_all - n_capped)")).otherwise(lit(0L)))
      .withColumn("allocated_tokens",
        when(col("capped"), col("cap")).otherwise(least(col("cap"), col("share")))
          .cast("long"))
      .select(col("lang"), col("avail").as("avail_tokens"),
        col("cap").as("cap_tokens"), col("allocated_tokens"),
        expr("allocated_tokens * 1000 DIV avail").as("epochs_permille"),
        col("capped"))
  }

  /** dsir1 — hashed-feature IMPORTANCE gate (the DSIR shape — Xie et
    * al. 2023, "Data Selection for Language Models via Importance
    * Resampling" — with its float log-likelihood ratios replaced by
    * exact integer micro-ratios, the lm4 stance): token features hash
    * into `buckets` cells (portable md5 bucket — both engines agree),
    * each cell's importance weight is the smoothed target/raw count
    * ratio in micros ((c_target+1)·10⁶ DIV (c_raw+1)), and a document
    * scores the MEAN weight of its token instances — "does this doc's
    * vocabulary look more like the target distribution than the raw
    * one". Score > 10⁶ (parity) means target-like; the gate keeps
    * those. This is the modern data-selection step between quality
    * heuristics (tx2/tx20) and a trained classifier (lr2): no labels,
    * no training loop, one pass over counts.
    *
    * Shape at 100 TB: two map-combined bucket-count aggs collapse the
    * corpus to `buckets` rows of model state, the weight frame
    * broadcasts into the scoring join, and the doc agg is the only
    * corpus-sized shuffle. Nothing driver-side scales with the data. */
  def importanceGate(df: DataFrame, id: Column, text: Column,
      isTarget: Column, buckets: Int = 64): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val toks = df.select(id.as("doc_id"), isTarget.as("is_t"),
        explode(graft.functions.F.tokens(lower(text))).as("w"))
      .withColumn("bkt",
        conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long") % buckets)
    val wts = toks.groupBy("bkt").agg(
        sum(col("is_t").cast("long")).as("c_target"),
        sum((!col("is_t")).cast("long")).as("c_raw"))
      .select(col("bkt"),
        expr("(c_target + 1) * 1000000 DIV (c_raw + 1)").as("w_micro"))
    val scored = toks.join(broadcast(wts), Seq("bkt"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_tokens"),
        sum("w_micro").as("sw"))
    df.select(id.as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        expr("CASE WHEN n_tokens IS NULL OR n_tokens = 0 THEN 0L " +
          "ELSE sw DIV n_tokens END").as("dsir_micro"))
      .withColumn("kept", col("dsir_micro") >= 1000000L)
  }
}
