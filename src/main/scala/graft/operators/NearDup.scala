package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.plans.{TextHashExprs, WordShingles}

/** Near-duplicate detection over document corpora: exact hash dedup,
  * MinHash+LSH, SimHash banding, and n-gram Jaccard verification.
  *
  * Scale design (the whole point of LSH): candidate generation NEVER
  * compares all pairs — MinHash signatures band-join on (band, signature)
  * and SimHash bands on byte slices, so the only shuffles are hash
  * shuffles on band keys, and verification runs only on candidates.
  * Signature computation is a pure map (one native per-row expression,
  * graft.plans.TextHashExprs — no per-shingle row explosion, no
  * interpreted lambdas); only candidate pairs and fixed-size signatures
  * ever move through a shuffle.
  *
  * All hashing is md5-derived (F.portableHash60 contract) so the DuckDB
  * oracle replicates results bit-for-bit.
  */
object NearDup {

  /** Exact dedup: canonical row per md5(text), keeping the smallest id —
    * the hash-groupBy analog of the reference's MIN(id)-per-key history
    * dedup (`ddb/src/members.rs:240-258`). Output: surviving (doc_id,
    * content_hash) pairs. */
  def exact(docs: DataFrame, id: Column, text: Column): DataFrame =
    Dedup.keepOneByKey(
      docs.select(id.as("doc_id"), md5(text).as("content_hash")),
      Seq(col("content_hash")), Seq(col("doc_id")))

  /** Paragraph-level exact dedup (d9, the CCNet/RefinedWeb pre-pass):
    * split each document on `sep`, keep only the FIRST instance of every
    * distinct paragraph corpus-wide (first = smallest (doc_id, position)
    * — deterministic), and reassemble each document from its surviving
    * paragraphs in original order. Boilerplate that repeats across a
    * crawl (headers, footers, license blocks) vanishes from every doc
    * but its first, which doc-level dedup (d1/d2) cannot do — documents
    * differing in one sentence share no md5 and may share no LSH band.
    * Documents whose every paragraph is seen earlier disappear from the
    * output (their empty husk is what a pipeline drops anyway).
    * Output: (doc_id, n_paras, clean_text).
    *
    * Scale shape: split+posexplode is a pure map; the first-instance
    * pick is ONE row_number window partitioned by md5(paragraph) — the
    * same one-hash-shuffle profile as [[exact]] (paragraph text rides
    * that shuffle exactly once, since reassembly needs it back; a
    * paragraph repeated 10⁶ times is one partition's sort — the skew
    * profile of any exact-dedup key); reassembly is one groupBy(doc_id)
    * whose collect_list is bounded by a single document's paragraph
    * count. */
  def paragraphDedup(docs: DataFrame, id: Column, text: Column,
      sep: String): DataFrame = {
    val paras = docs
      .select(id.as("doc_id"), posexplode(split(text, java.util.regex.Pattern.quote(sep))))
      .select(col("doc_id"), col("pos").cast("long").as("idx"), col("col").as("para"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("para"))).orderBy(col("doc_id"), col("idx"))
    paras.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_paras"),
        array_join(expr("transform(array_sort(collect_list(struct(idx, para))), x -> x.para)"),
          sep).as("clean_text"))
  }

  /** dsub1 — exact substring dedup, the Lee et al. 2022 ("Deduplicating
    * Training Data Makes Language Models Better") ExactSubstr operator:
    * find, per document, every maximal token span whose every position
    * is covered by a ≥`n`-token run that appears VERBATIM in at least
    * `minDocs` distinct documents. This is the family member [[exact]] /
    * [[paragraphDedup]] (d9) / cdc-chunk dedup (d10) cannot see: d1
    * needs the whole doc duplicated, d9 the whole paragraph, d10 the
    * whole content-defined chunk — a ≥n-token verbatim overlap that
    * straddles those boundary units and is embedded in otherwise-unique
    * text escapes all three. dsub1 is boundary-free by construction.
    *
    * Exactness without suffix arrays: a ≥n-token verbatim overlap exists
    * iff the docs share an aligned n-token window, so stride-1 window
    * hashes decide membership EXACTLY — the distributed replacement for
    * Lee et al.'s single-node suffix array. Windows whose hash occurs in
    * ≥minDocs distinct docs are duplicated coverage; merging them
    * (half-open ends, so touching windows fuse) yields the maximal
    * spans a trainer would mask or drop.
    *
    * Scale shape: one pure-map window expansion (~1 row per token — 8-16
    * bytes each, hash + position, never window text), ONE hash shuffle
    * on the window hash for the distinct-doc count, a semi-join of the
    * persisted window frame against the (small, duplicate-only) hash
    * set, and [[Temporal.mergeIntervals]]'s per-doc sort — all linear,
    * no pair join anywhere. A hash repeated 10⁶ times is one partition's
    * count, the exact-dedup skew profile. The md5-per-window map cost is
    * the oracle-parity choice; at 100 TB the same plan runs with the
    * rolling-hash kernel (graft.plans.TextHashExprs) making window
    * hashing O(1) per position instead of O(n).
    *
    * Output: (doc_id, span_start, span_end, span_tokens, n_windows) —
    * inclusive 0-based token positions, one row per maximal span. */
  /** Stride-1 n-token window hashes: (doc_id, w, h) — one row per token
    * position, 16 bytes each, never window text. The shared carrier of
    * the exact-substring family (dsub1 within-corpus, c7 vs benchmark).
    * Hashing runs in ONE native per-row call (TextHashExprs.WindowHashSigs
    * — direct md5-byte parse, no per-window hex-string round trip); docs
    * with < n tokens hash to null and posexplode drops them. */
  private[graft] def windowHashes(docs: DataFrame, id: Column, text: Column,
      n: Int): DataFrame =
    docs.select(id.as("doc_id"), TextHashExprs.windowHashes(text, n).as("ws"))
      .select(col("doc_id"), posexplode(col("ws")))
      .select(col("doc_id"), col("pos").cast("long").as("w"), col("col").as("h"))

  /** Fuse covered windows into maximal per-doc spans: half-open
    * [w, w+n), so touching windows (next start == prev end) merge. */
  private def windowsToSpans(hit: DataFrame, n: Int): DataFrame =
    Temporal.mergeIntervals(hit, col("doc_id"), col("w"), col("w") + n)
      .select(col("key").as("doc_id"), col("start").as("span_start"),
        (col("end") - 1).as("span_end"),
        (col("end") - col("start")).as("span_tokens"),
        col("n_merged").as("n_windows"))

  def exactSubstrSpans(docs: DataFrame, id: Column, text: Column,
      n: Int, minDocs: Int = 2): DataFrame = {
    require(n >= 2, s"window must be >= 2 tokens, got $n")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    // persisted: the window frame feeds BOTH the distinct-doc count and
    // the coverage semi-join
    val wins = graft.CacheScope.persist(windowHashes(docs, id, text, n))
    val dup = wins.groupBy("h")
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs).select("h")
    windowsToSpans(wins.join(dup, Seq("h"), "leftsemi"), n)
  }

  /** c7 — exact-substring CONTAMINATION scan (the Lee-2022 semantics
    * pointed across sets): per corpus document, every maximal token
    * span covered by a ≥`n`-token run appearing VERBATIM anywhere in
    * the benchmark. The complement to the shingle-overlap scan
    * (Contamination.flagged): c1 asks "how much of this eval item leaks
    * into this doc" (whole-doc score, pairwise), c7 asks "WHERE exactly
    * does benchmark text sit in the corpus" — span positions, so the
    * fix can be surgical ([[maskSpans]]) instead of dropping whole
    * documents that merely quote one benchmark sentence.
    *
    * Scale shape: corpus windows are the dsub1 map fan-out (once, no
    * persist — single consumer); the benchmark's distinct window-hash
    * set is benchmark-sized (eval suites are MBs against a 100 TB
    * corpus) and BROADCASTS, so the scan is one map-side semi-join —
    * the corpus never shuffles at all; only the per-doc interval merge
    * shuffles span-bearing (doc, window) rows on doc_id. */
  def benchSubstrSpans(corpus: DataFrame, bench: DataFrame, id: Column,
      text: Column, n: Int): DataFrame = {
    require(n >= 2, s"window must be >= 2 tokens, got $n")
    val bh = windowHashes(bench, id, text, n).select("h").distinct()
    val hit = windowHashes(corpus, id, text, n)
      .join(broadcast(bh), Seq("h"), "leftsemi")
    windowsToSpans(hit, n)
  }

  /** Broadcast the per-doc mask frame only up to this many span-bearing
    * docs. Each mask row is a doc_id plus a handful of (s, e) long pairs
    * (~100 bytes); 10M rows ≈ 1 GB — comfortably under Spark's 8 GB
    * broadcast hard limit with headroom for executor-side copies. Above
    * it the corpus is in the high-duplication regime (raw web crawls can
    * put spans in 10–20% of docs) where forcing a broadcast would OOM
    * the driver; a doc_id equi-join — text shuffling once on its
    * primary key — is the honest plan there. */
  private[graft] val MaskBroadcastMaxDocs = 10L * 1000 * 1000

  /** Apply a span frame `(doc_id, span_start, span_end, …)` to the
    * corpus as a token mask — the reusable action step behind
    * [[exactSubstrMask]] (dsub2, corpus-internal spans) and the
    * surgical decontamination entry (c8, [[benchSubstrSpans]] spans).
    * Output and scale shape as documented on [[exactSubstrMask]]:
    * masks aggregate per span-bearing doc and — when the frame is small
    * enough (`broadcastMaxDocs`, counted on the aggregated frame, one
    * row per span-bearing doc) — broadcast, so text never shuffles.
    * On a high-duplication corpus whose mask frame exceeds the cap, the
    * SAME plan degrades to one un-hinted doc_id equi-join: text shuffles
    * once on its primary key, still never a pair join, and the driver
    * never materializes an oversized broadcast. The count that picks the
    * strategy is one extra job over the persisted mask frame — noise
    * next to the window-hash pass that produced the spans. */
  def maskSpans(docs: DataFrame, id: Column, text: Column,
      spans: DataFrame,
      broadcastMaxDocs: Long = MaskBroadcastMaxDocs): DataFrame = {
    val masks = graft.CacheScope.persist(spans.groupBy("doc_id")
      .agg(collect_list(struct(col("span_start").as("s"),
        col("span_end").as("e"))).as("mask")))
    val maskSide =
      if (masks.count() <= broadcastMaxDocs) broadcast(masks) else masks
    docs.select(id.as("doc_id"), graft.functions.F.tokens(text).as("tk"))
      .join(maskSide, Seq("doc_id"), "left")
      .select(col("doc_id"), size(col("tk")).cast("long").as("n_tokens"),
        expr("filter(tk, (t, i) -> mask IS NULL OR " +
          "NOT exists(mask, m -> i >= m.s AND i <= m.e))").as("kept"))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - size(col("kept"))).cast("long").as("n_removed"),
        array_join(col("kept"), " ").as("clean_text"))
  }

  /** dsub2 — the ACTION step for [[exactSubstrSpans]] (Lee et al. 2022
    * cut the duplicated substring and train on the rest): drop every
    * token position covered by a duplicated span and reassemble the
    * survivors in original order. Output: (doc_id, n_tokens, n_removed,
    * clean_text), one row for EVERY input document — span-free docs pass
    * through with n_removed = 0, a fully-covered doc emits an empty
    * clean_text (the husk a downstream filter drops; kept here so the
    * receipt's token counts sum to the corpus).
    *
    * Scale shape: spans aggregate to ONE mask array per span-bearing doc
    * (span rows only — a small fraction of the corpus under any sane
    * duplication rate), the mask frame broadcasts to the document scan,
    * and token removal is a pure map over each doc's token array
    * (filter-with-index + exists over that doc's own ≤S spans). Document
    * TEXT never shuffles: the only shuffles in the whole plan are
    * dsub1's window-hash aggregate and the span aggregation, both
    * narrow hash/position frames (pinned in ScaleSpec). If a
    * high-duplication corpus pushes the mask frame past
    * [[maskSpans]]'s `broadcastMaxDocs` cap, the same plan falls back
    * to one un-hinted doc_id equi-join — text then shuffles once on its
    * primary key, still never a pair join (the guard is a real count on
    * the aggregated mask frame, pinned both ways in ScaleSpec). */
  def exactSubstrMask(docs: DataFrame, id: Column, text: Column,
      n: Int, minDocs: Int = 2): DataFrame =
    maskSpans(docs, id, text, exactSubstrSpans(docs, id, text, n, minDocs))

  /** Distinct word-`n`-gram shingles per doc, one row each: (doc_id, sh).
    * Used by tests and as the row-per-shingle surface; the LSH pipeline
    * itself uses per-doc shingle ARRAYS (no row explosion). */
  def shingles(docs: DataFrame, id: Column, text: Column, n: Int = 3): DataFrame =
    docs.select(id.as("doc_id"),
      explode(WordShingles.shingles(lower(text), n)).as("sh")).distinct()

  /** Per-doc shingle arrays (multiset, document order) — the map-only
    * carrier for candidate verification. */
  def shingleArrays(docs: DataFrame, id: Column, text: Column, n: Int = 3): DataFrame =
    docs.select(id.as("doc_id"), WordShingles.shingles(lower(text), n).as("sh_arr"))

  /** MinHash signatures as array<long>: a pure map over the corpus
    * (docs with fewer than n tokens drop out, as in the oracle). */
  def minhashSigs(docs: DataFrame, id: Column, text: Column,
      numHashes: Int = 16, n: Int = 3): DataFrame =
    docs.select(id.as("doc_id"),
        TextHashExprs.minhashSigs(lower(text), numHashes, n).as("sigs"))
      .filter(col("sigs").isNotNull)

  /** LSH banding: rowsPerBand consecutive minhashes concatenated into a
    * band signature; docs sharing any (band, sig) are candidates. */
  def bands(sigDf: DataFrame, numHashes: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val bandStructs = (0 until numHashes / rowsPerBand).map { b =>
      struct(lit(b).as("band"),
        concat_ws(",", (0 until rowsPerBand).map(r =>
          element_at(col("sigs"), b * rowsPerBand + r + 1)): _*).as("sig"))
    }
    sigDf.select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** Candidate pairs from band collisions (a < b, distinct). The join key
    * (band, sig) is high-cardinality → well-distributed shuffle. */
  def candidates(bandsDf: DataFrame): DataFrame = {
    val a = bandsDf.alias("a")
    val b = bandsDf.alias("b")
    a.join(b, col("a.band") === col("b.band") && col("a.sig") === col("b.sig")
        && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }

  /** Exact distinct-set Jaccard for given (id_a, id_b) pairs: joins the
    * per-doc shingle arrays to each side and evaluates in one native
    * expression per pair — cost scales with candidates, not corpus. */
  def jaccardPairs(pairs: DataFrame, shArr: DataFrame): DataFrame =
    pairs
      .join(shArr.select(col("doc_id").as("id_a"), col("sh_arr").as("sa")), "id_a")
      .join(shArr.select(col("doc_id").as("id_b"), col("sh_arr").as("sb")), "id_b")
      .select(col("id_a"), col("id_b"),
        TextHashExprs.arrayJaccard(col("sa"), col("sb")).as("jaccard"))

  /** Full MinHash-LSH near-dup pipeline: signatures (map) → bands →
    * band-join candidates → exact-Jaccard verify ≥ threshold.
    *
    * Signatures are persisted eagerly: they are tiny (16 longs per doc)
    * and the band self-join would otherwise derive the signature subtree
    * once per join side inside one action. Candidates flow straight into
    * verification — they are consumed exactly once, so a persist there
    * is a pure barrier cost. At cluster scale the persist becomes the
    * checkpoint-the-signatures pattern. The persist is registered with
    * CacheScope so the pipeline driver releases it after the consuming
    * action (a long-lived session must not accumulate cached RDDs). */
  def minhashLsh(docs: DataFrame, id: Column, text: Column, threshold: Double): DataFrame = {
    val sigs = graft.CacheScope.persist(minhashSigs(docs, id, text))
    sigs.count()
    jaccardPairs(candidates(bands(sigs)), shingleArrays(docs, id, text))
      .filter(col("jaccard") >= threshold)
  }

  /** Per-doc CHARACTER-shingle arrays (multiset, document order) — the
    * verification carrier for the char-level LSH. */
  def charShingleArrays(docs: DataFrame, id: Column, text: Column,
      n: Int = 4): DataFrame =
    docs.select(id.as("doc_id"), TextHashExprs.charShingles(lower(text), n).as("sh_arr"))

  /** d19 — char-n-gram MinHash-LSH near-dup pairs: d2's pipeline with
    * CHARACTER n-grams as the shingle unit — the variant space-free
    * scripts need (CJK text whitespace-tokenizes into whole clauses, so
    * word-shingle Jaccard reads any two different sentences as
    * disjoint and any shared clause as identical; char n-grams restore
    * the graded overlap signal). Same 16 affine-permuted md5 minhashes
    * and exact-Jaccard verify — the shingle unit changes, and the
    * BANDING narrows to (2 bands × 8 rows): char n-grams share
    * incidental interior grams across any same-language corpus (base
    * similarity ~0.3–0.5 where word shingles sit near 0), so d2's
    * (4 × 4) banding floods the candidate join at char level
    * (measured: 159k candidates on 1.5k docs); 8-row bands keep
    * P(collision) = J⁸ — negligible at base similarity, ~0.98 for the
    * ≥0.9-J re-encode/one-char-edit regime this variant hunts. Every
    * other scale property of d2 carries over (map-only signatures, one
    * band-key shuffle, candidates-only verification). */
  def minhashLshChar(docs: DataFrame, id: Column, text: Column,
      threshold: Double, n: Int = 4, rowsPerBand: Int = 8): DataFrame = {
    val sigs = graft.CacheScope.persist(
      docs.select(id.as("doc_id"),
          TextHashExprs.minhashCharSigs(lower(text), 16, n).as("sigs"))
        .filter(col("sigs").isNotNull))
    sigs.count()
    jaccardPairs(candidates(bands(sigs, 16, rowsPerBand)),
        charShingleArrays(docs, id, text, n))
      .filter(col("jaccard") >= threshold)
  }

  /** d21 — SCOPE-keyed MinHash LSH (the FineWeb finding, Penedo et al.
    * 2024 §3.3: deduplicating each CommonCrawl dump INDIVIDUALLY kept
    * model quality that global cross-dump dedup destroyed — cross-dump
    * repeats carry an upweighting signal): d2's pipeline with the scope
    * (dump id, snapshot, source) FOLDED INTO the band key, so candidate
    * generation never pairs documents across scopes. Scoped pairs are
    * provably global pairs ∩ same-scope (folding scope into the key
    * only removes collisions), which is what the d21 oracle states —
    * but the plan property is the point at 100 TB: each dump's band
    * join runs over its own key space, new dumps dedup incrementally
    * without touching old ones, and the join never grows with the
    * number of dumps retained. */
  def minhashLshScoped(docs: DataFrame, id: Column, text: Column,
      scope: Column, threshold: Double): DataFrame = {
    val base = docs.select(id.as("doc_id"), scope.cast("string").as("scope"),
      text.as("txt"))
    val sigs = graft.CacheScope.persist(
      base.select(col("doc_id"), col("scope"),
          TextHashExprs.minhashSigs(lower(col("txt")), 16, 3).as("sigs"))
        .filter(col("sigs").isNotNull))
    sigs.count()
    // bands() with the scope concatenated into each band signature —
    // same (band, sig) join key shape, scope-disjoint by construction
    val bandStructs = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        concat_ws("|", col("scope"), concat_ws(",", (0 until 4).map(r =>
          element_at(col("sigs"), b * 4 + r + 1)): _*)).as("sig"))
    }
    val scopedBands = sigs
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
    jaccardPairs(candidates(scopedBands),
        shingleArrays(base, col("doc_id"), col("txt")))
      .filter(col("jaccard") >= threshold)
  }

  /** d17 — containment pairs (asymmetric near-dup): for band-collision
    * candidates, the integer-permille CONTAINMENT in each direction —
    * |A∩B|·1000 DIV |A| and DIV |B| over distinct shingle sets — kept
    * when either side is ≥ `minPermille` contained. Symmetric Jaccard
    * misses the quote-plus-wrapper shape (a doc fully containing
    * another scores low when their sizes differ); containment names the
    * CONTAINED side, which is the copy a dedup pass should drop.
    *
    * Scope, honestly: candidates come from the same symmetric LSH band
    * join as d2, so a TINY doc inside a HUGE one (symmetric Jaccard
    * too low to band-collide) is out of reach here — that case belongs
    * to the window-hash route (dsub1/c7). This operator targets the
    * high-overlap asymmetric pairs LSH does surface.
    *
    * Shape: d2's machinery end-to-end (persisted 16-long sigs, banded
    * equi-join, candidates-only verification); the only new work is
    * two distinct-counts and one intersect per candidate. */
  def containmentPairs(docs: DataFrame, id: Column, text: Column,
      minPermille: Long = 800L): DataFrame = {
    require(minPermille >= 0 && minPermille <= 1000,
      s"minPermille must be in [0, 1000], got $minPermille")
    val sigs = graft.CacheScope.persist(minhashSigs(docs, id, text))
    sigs.count()
    val sh = shingleArrays(docs, id, text)
    candidates(bands(sigs))
      .join(sh.select(col("doc_id").as("id_a"), col("sh_arr").as("sa")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"), col("sh_arr").as("sb")), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("sa"), col("sb"))).cast("long").as("n_shared"),
        size(array_distinct(col("sa"))).cast("long").as("n_a"),
        size(array_distinct(col("sb"))).cast("long").as("n_b"))
      .withColumn("contain_a_permille", expr("n_shared * 1000 DIV n_a"))
      .withColumn("contain_b_permille", expr("n_shared * 1000 DIV n_b"))
      .filter(greatest(col("contain_a_permille"), col("contain_b_permille"))
        >= minPermille)
  }

  /** Cross-set candidate pairs: batch docs sharing any (band, sig) with
    * a corpus doc. Same high-cardinality equi-join as [[candidates]],
    * but between two frames — no ordering constraint, since sides are
    * disjoint sets with different roles. */
  def candidatesAcross(batchBands: DataFrame, corpusBands: DataFrame): DataFrame =
    batchBands.alias("a").join(corpusBands.alias("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()

  /** Incremental near-dedup (d8): admit only the batch documents that
    * are neither exact nor near (Jaccard ≥ threshold) duplicates of the
    * existing corpus, deduping the batch itself exactly first (min-id
    * survivor). THE corpus-update primitive: a crawl snapshot lands as
    * a batch, and only genuinely new content joins the corpus —
    * without re-deduping the corpus against itself.
    *
    * Scale shape: the corpus is touched by exactly two map-side passes
    * (content hashes; minhash signatures) and never self-joined — cost
    * is O(|corpus| + |batch| + candidates), vs O(full d2 re-run) for
    * re-deduping the union. All joins are hash equi-joins; the batch
    * side of every join is the small one, so AQE broadcasts it.
    * Output: surviving (doc_id, content_hash) — d1's contract. */
  def incremental(corpus: DataFrame, batch: DataFrame, id: Column, text: Column,
      threshold: Double): DataFrame = {
    val batchDocs = batch.select(id.as("doc_id"), text.as("text"))
    val corpusDocs = corpus.select(id.as("doc_id"), text.as("text"))
    // exact: min-id survivor within the batch, then drop content the
    // corpus already has
    val survivors0 = exact(batchDocs, col("doc_id"), col("text"))
      .join(corpusDocs.select(md5(col("text")).as("content_hash")).distinct(),
        Seq("content_hash"), "left_anti")
    val bsrc = batchDocs.join(survivors0.select("doc_id"), Seq("doc_id"), "left_semi")
    // near: batch signatures band-join corpus signatures; verify exact
    // Jaccard on candidates only. Candidates are persisted (they are a
    // small pair list consumed twice: the verify join AND the corpus-
    // side pruning semi-join below) so the band join runs once.
    val cand = graft.CacheScope.persist(candidatesAcross(
      bands(minhashSigs(bsrc, col("doc_id"), col("text"))),
      bands(minhashSigs(corpusDocs, col("doc_id"), col("text")))))
    // Shingle ONLY candidate corpus docs: without this semi-join the
    // verify step would tokenize+shingle the whole corpus a third time —
    // on the large-corpus/small-batch case this operator exists for,
    // that's ~50% extra corpus-side cost for arrays a tiny join then
    // discards.
    val candCorpus = corpusDocs.join(
      cand.select(col("id_b").as("doc_id")).distinct(), Seq("doc_id"), "left_semi")
    val nearDups = cand
      .join(shingleArrays(bsrc, col("doc_id"), col("text"))
        .select(col("doc_id").as("id_a"), col("sh_arr").as("sa")), "id_a")
      .join(shingleArrays(candCorpus, col("doc_id"), col("text"))
        .select(col("doc_id").as("id_b"), col("sh_arr").as("sb")), "id_b")
      .filter(TextHashExprs.arrayJaccard(col("sa"), col("sb")) >= threshold)
      .select(col("id_a").as("doc_id")).distinct()
    survivors0.join(nearDups, Seq("doc_id"), "left_anti")
      .select("doc_id", "content_hash")
  }

  /** 64-bit SimHash per doc — a pure map (one expression per row). All
    * 64 bits carry hash entropy (two 60-bit md5-prefix token hashes —
    * TextHash.simhash64Kernel), so every 16-bit band key draws from the
    * full 65,536-value space. */
  def simhash(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("doc_id"), TextHashExprs.simhashSig64(lower(text)).as("simhash"))

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist, found via
    * 16-bit banding (pigeonhole: dist ≤ 3 over 4 bands ⇒ ≥1 band equal) —
    * no all-pairs comparison. 65,536 keys per band keeps the within-bucket
    * self-join sub-quadratic at corpus scale: expected bucket size is
    * N/65,536 per band (vs N/256 for the old 8-bit bands, whose bucket
    * self-joins went quadratic at ~10⁹ docs). */
  def simhashPairs(sig: DataFrame, maxDist: Int = 3): DataFrame = {
    // Persist the banded signatures: both sides of the candidate
    // self-join read them, and without the barrier each side recomputes
    // every per-token signature. 4 small rows per doc — cache is cheap,
    // and CacheScope releases it at pipeline end.
    // shiftright is arithmetic, but the 0xFFFF mask drops the sign-
    // extension bits, so negative signatures band identically to the
    // oracle's logical extraction.
    val banded = graft.CacheScope.persist(
      sig.select(col("doc_id"), col("simhash"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("simhash"), b * 16).bitwiseAND(65535).as("key"))): _*)).as("bs"))
        .select(col("doc_id"), col("simhash"), col("bs.band"), col("bs.key")))
    banded.count()
    val a = banded.alias("a")
    val b = banded.alias("b")
    val cand = a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key")
        && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.simhash").as("sig_a"), col("b.simhash").as("sig_b"))
      .distinct()
    cand.withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
  }

  /** Connected-components clustering over near-dup pairs — the final
    * step of corpus dedup at scale: every document's cluster_id is the
    * MINIMUM doc_id reachable through the near-dup graph (the canonical-
    * survivor convention; reference analog is the min-id history dedup,
    * `ddb/src/members.rs:240-258`, lifted from key-equality to graph
    * reachability).
    *
    * Implementation is iterative min-label propagation: each round is
    * one hash shuffle (join edges⋈labels + groupBy), converging in
    * O(component diameter) rounds — the standard large-graph CC shape.
    * Near-dup components are short chains, so diameter is small; labels
    * are checkpointed every few rounds to keep lineage bounded. The
    * DuckDB oracle computes the identical fixpoint via a recursive
    * transitive closure + MIN — procedure differs, result is the same
    * well-defined function of the graph.
    *
    * Note on a measured dead-end: restricting iteration to the edge
    * subgraph (docs in pairs) and anti-join-unioning the singletons back
    * at the end looks like the obvious 100 TB win (rounds touch |dup
    * nodes|, not |corpus|), but measured at sf0.1 it was 2-40× SLOWER
    * and wildly unstable run-to-run — the lazy union defeated cache
    * pickup under AQE and broadcast builds recomputed the whole
    * candidate/verify pipeline on single-task stages. At real corpus
    * scale the right split is coarser: materialize `pairs` to storage
    * first (they are the expensive artifact), then run label propagation
    * as its own job over that table — not a fused lazy plan. */
  def dedupClusters(docs: DataFrame, id: Column, pairs: DataFrame,
      maxIters: Int = 50): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist()
    var labels = docs.select(id.as("doc_id"), id.as("label")).persist()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      val nbrMin = edges
        .join(labels.select(col("doc_id").as("src"), col("label").as("src_label")), Seq("src"))
        .groupBy(col("dst").as("doc_id"))
        .agg(min(col("src_label")).as("nbr_label"))
      var next = labels.join(nbrMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
      if (iter % 5 == 4) next = next.localCheckpoint(eager = false)
      next = next.persist()
      changed = next.alias("n")
        .join(labels.select(col("doc_id"), col("label").as("old")), Seq("doc_id"))
        .filter(col("label") =!= col("old")).count()
      labels.unpersist()
      labels = next
      iter += 1
    }
    edges.unpersist()
    // the converged labels stay cached (callers typically consume them
    // more than once); CacheScope releases them at pipeline end
    graft.CacheScope.persist(labels)
    // Silent non-convergence would hand callers wrong cluster_ids (and a
    // diverging d6 oracle) with no signal: a component whose diameter
    // exceeds maxIters must fail loudly, not approximately.
    if (changed > 0)
      throw new IllegalStateException(
        s"dedupClusters did not converge after $maxIters iterations " +
        s"($changed labels still changing) — raise maxIters (component diameter " +
        "exceeds the iteration budget)")
    labels.select(col("doc_id"), col("label").as("cluster_id"))
  }

  /** Connected components over the EDGE SUBGRAPH only: propagation
    * iterates over just the nodes that appear in `pairs` (the ~% of a
    * deduped corpus with any near-dup edge), and every other doc is its
    * own cluster via a single left join + coalesce at the end — rounds
    * touch |dup nodes|, not |corpus|.
    *
    * This is the shape the fused-plan experiment (the measured dead-end
    * documented on [[dedupClusters]]) could NOT reach: restricting the
    * subgraph inside one lazy plan recomputed the whole LSH pipeline
    * per round. It becomes the RIGHT shape exactly when `pairs` is a
    * materialized table (the two-phase curation runner,
    * graft.pipeline.Curation): the subgraph then derives from a cheap
    * parquet scan, each round's plan is three nodes deep, and the
    * final corpus-wide join is one broadcast (dup nodes are small). */
  def dedupClustersSparse(docs: DataFrame, id: Column, pairs: DataFrame,
      maxIters: Int = 50): DataFrame = {
    val nodes = pairs.select(col("id_a").as("doc_id"))
      .unionByName(pairs.select(col("id_b").as("doc_id"))).distinct()
    val sub = dedupClusters(nodes, col("doc_id"), pairs, maxIters)
      .withColumnRenamed("cluster_id", "sub_cluster")
    docs.select(id.as("doc_id")).join(sub, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("sub_cluster"), col("doc_id")).as("cluster_id"))
  }

  /** Exact n-gram Jaccard within blocking keys via exploded-shingle
    * co-group counting: intersections come from a self-join on
    * (shingle, block) followed by a pair-count aggregate, so the bytes
    * shuffled are one row per SHARED shingle — never a full pair
    * matrix, never a replicated shingle array per candidate (the
    * round-1 formulation; quadratic in block size). Pairs sharing zero
    * shingles can't reach any threshold > 0, so skipping them is exact.
    * Per-doc distinct-shingle rows and counts both come straight off
    * `array_distinct` of the per-doc shingle array — map-only, no
    * pre-join shuffle. At 100 TB the remaining scale lever is capping
    * shingle document-frequency (a stop-shingle filter) before the
    * self-join; the synthetic corpus doesn't need it. */
  def ngramJaccardBlocked(docs: DataFrame, id: Column, text: Column,
      blockCols: Seq[Column], threshold: Double, n: Int = 3,
      maxDocFreq: Option[Long] = None): DataFrame = {
    val blkNames = blockCols.indices.map(i => s"blk_$i")
    val base = docs.select(
      id.as("doc_id") +:
        array_distinct(WordShingles.shingles(lower(text), n)).as("sh_set") +:
        blockCols.zip(blkNames).map { case (c, nm) => c.as(nm) }: _*)
    val shAll = base.select(
      col("doc_id") +: explode(col("sh_set")).as("sh") +: blkNames.map(col): _*)
    // Stop-shingle cap — THE 100 TB lever for hot-shingle skew: shingles
    // appearing in more than maxDocFreq docs are dropped from the sets
    // entirely (similarity is then defined over the capped sets, same on
    // both engines), bounding the per-shingle join fan-out.
    val sh = maxDocFreq match {
      case None => shAll
      case Some(f) =>
        val keep = shAll.groupBy(col("sh"))
          .agg(count(lit(1)).as("df")).filter(col("df") <= f).select("sh")
        shAll.join(keep, Seq("sh"), "left_semi")
    }
    val cnt = maxDocFreq match {
      case None => base.select(col("doc_id"), size(col("sh_set")).cast("long").as("n_sh"))
      case Some(_) => sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    }
    val a = sh.alias("a")
    val b = sh.alias("b")
    val joinCond = blkNames.map(nm => col(s"a.$nm") === col(s"b.$nm"))
      .foldLeft(col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))(_ && _)
    val inter = a.join(b, joinCond)
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(cnt.select(col("doc_id").as("id_a"), col("n_sh").as("na")), "id_a")
      .join(cnt.select(col("doc_id").as("id_b"), col("n_sh").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("i").cast("double") / (col("na") + col("nb") - col("i"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
