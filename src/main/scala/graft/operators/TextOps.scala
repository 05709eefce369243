package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.F

/** Text-analysis operators for training-data curation over the `documents`
  * table: tokenization, token counting, quality scoring, language-ID
  * heuristic, and document fingerprinting. All are pure column expressions
  * (whole-stage codegen, no UDFs) so they run at full scan speed — at
  * 100 TB these are embarrassingly parallel map-side ops with zero shuffle.
  */
object TextOps {

  val StopWords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** Per-language marker words for the n-gram/heuristic language-ID op.
    * Deterministic precedence on ties: listed order. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and"),
    "es" -> Seq("el", "la", "de"),
    "de" -> Seq("der", "die", "und"),
    "fr" -> Seq("le", "la", "et"),
    "zh" -> Seq("的", "是", "了"))

  private def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit): _*)))

  /** Token counts: whitespace tokens plus a BPE-ish regex segmentation
    * (letter runs / digit runs / single punctuation). */
  def tokenCounts(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(
      id.as("doc_id"),
      size(F.tokens(text)).cast("long").as("ws_tokens"),
      size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
        .cast("long").as("bpe_tokens"))

  /** Quality scoring: length, word stats, stopword ratio, composite score.
    * Mirrors the length/punct/stopword-ratio heuristics used by public
    * pretraining-data pipelines (C4/Gopher-style rules). */
  def quality(df: DataFrame, id: Column, text: Column): DataFrame = {
    val (nChars, nWords, avgLen, stopRatio, score) = qualityCols(text)
    df.select(id.as("doc_id"), nChars.as("n_chars"), nWords.as("n_words"),
      avgLen.as("avg_word_len"), stopRatio.as("stopword_ratio"),
      score.as("quality_score"))
  }

  /** The quality metrics as bare columns — a pure projection, so callers
    * that already carry the row (e.g. a document stream) can append them
    * without a self-join. Ratios stay as raw doubles: int/int division
    * is bit-identical across engines, while round() diverges on
    * half-way boundary values. */
  def qualityCols(text: Column): (Column, Column, Column, Column, Column) = {
    val toks = F.tokens(text)
    val nChars = length(text).cast("long")
    val nWords = size(toks).cast("long")
    val stopRatio = countIn(toks, StopWords).cast("double") / nWords
    val avgLen = nChars.cast("double") / nWords
    val score =
      least(lit(1.0), nWords.cast("double") / 50) * lit(0.5) +
        least(lit(1.0), stopRatio * 5) * lit(0.3) +
        when(avgLen.between(3.0, 10.0), lit(0.2)).otherwise(lit(0.0))
    (nChars, nWords, avgLen, stopRatio, score)
  }

  /** Heuristic language ID: count per-language marker tokens, pick the
    * max with deterministic precedence (LangMarkers order); all-zero →
    * "und". */
  def langId(df: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = F.tokens(lower(text))
    val scores = LangMarkers.map { case (lang, ws) => lang -> countIn(toks, ws) }
    val maxScore = greatest(scores.map(_._2): _*)
    // foldRight gives the FIRST matching language precedence (en before es…)
    val first = scores.foldRight(lit("und")) { case ((lang, s), els) =>
      when(s === maxScore && maxScore > 0, lit(lang)).otherwise(els)
    }
    df.select(id.as("doc_id"), first.as("lang_pred"))
  }

  /** Context-length chunking (tx10): split each document into fixed
    * token-count windows with overlap — the step that turns variable-
    * length curated docs into model-context-sized pieces. Chunk starts
    * step by `chunkTokens - overlap`; the last chunk is short rather
    * than dropped (training pipelines pad it), and every chunk retains
    * provenance (`doc_id`, `chunk_id`).
    *
    * Pure map + explode: per-row fan-out is ceil(n/step), no shuffle,
    * no state — at 100 TB this runs at scan speed and the output stays
    * partition-local for a downstream [[Packing.pack]] or
    * [[Sharding.write]]. Whitespace tokens ([[F.tokens]]), rejoined
    * with single spaces. */
  def chunk(df: DataFrame, id: Column, text: Column,
      chunkTokens: Int = 128, overlap: Int = 16): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlap")
    val step = chunkTokens - overlap
    val toks = F.tokens(text)
    val n = size(toks)
    // Starts step by `step` but stop once the previous chunk already
    // reaches the end: a start s with s-step+chunkTokens >= n would
    // emit a chunk fully contained in its predecessor (pure duplication
    // — a property test caught exactly that). Last valid start is the
    // largest multiple of step below max(1, n - chunkTokens + step).
    // sequence() throws on start > stop; empty docs yield no chunks.
    val lastStart = greatest(lit(0), n - chunkTokens + step - 1)
    val starts = when(n > 0, sequence(lit(0), lastStart, lit(step)))
      .otherwise(array().cast("array<int>"))
    df.select(id.as("doc_id"), toks.as("tk"), explode(starts).as("start"))
      .select(col("doc_id"),
        (col("start") / step).cast("long").as("chunk_id"),
        slice(col("tk"), col("start") + 1, lit(chunkTokens)).as("ck"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("ck")).cast("long").as("n_tokens"),
        array_join(col("ck"), " ").as("chunk_text"))
  }

  /** Vocabulary-drift report (qc2): the tokens whose relative frequency
    * differs most between two corpus strata (side A vs side B) — the
    * distribution-shift probe run between snapshots, sources, or a
    * corpus and its curated output. The drift ordering is EXACT: instead
    * of comparing float ratios cnt_a/tot_a vs cnt_b/tot_b (whose
    * division rounds differently than any serial oracle), rows rank by
    * the cross-multiplied integer |cnt_a·tot_b − cnt_b·tot_a| in
    * DECIMAL(38) — both products fit (each factor ≤ 2⁶³), arithmetic is
    * exact, and the DuckDB twin is HUGEINT.
    *
    * Scale: one tokenize pass, one hash aggregate keyed by token with
    * map-side partial sums (the two sides are conditional sums, not a
    * second pass), a 1-row totals broadcast, and a global top-k. */
  def vocabDrift(df: DataFrame, text: Column, sideA: Column,
      topK: Int = 10): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    val dec = org.apache.spark.sql.types.DecimalType(19, 0)
    val t = df.select(sideA.as("a"), explode(F.tokens(lower(text))).as("token"))
    val cnt = t.groupBy("token").agg(
      sum(when(col("a"), 1L).otherwise(0L)).as("cnt_a"),
      sum(when(!col("a"), 1L).otherwise(0L)).as("cnt_b"))
    val tot = cnt.agg(sum("cnt_a").as("tot_a"), sum("cnt_b").as("tot_b"))
    cnt.crossJoin(broadcast(tot))
      .orderBy(abs(col("cnt_a").cast(dec) * col("tot_b").cast(dec) -
        col("cnt_b").cast(dec) * col("tot_a").cast(dec)).desc, col("token").asc)
      .limit(topK)
      .select(col("token"), col("cnt_a"), col("cnt_b"))
  }

  /** Content-defined chunking (cdc1): chunk boundaries fall where the
    * md5 bucket of the preceding token BIGRAM drops below `permille` —
    * so an insertion or deletion only moves boundaries inside its own
    * neighborhood, and every chunk downstream of an edit keeps its
    * content hash (the property fixed-width [[chunk]] windows lack,
    * and the reason CDC is the standard prelude to chunk-level dedup:
    * compose with [[NearDup.exact]] on `chunk_hash`). Expected chunk
    * length ≈ 1000/permille tokens; a boundary can never split the
    * first two tokens.
    *
    * Pure map + explode, like [[chunk]]: boundary candidates, slicing,
    * and joining all happen inside one array expression per row — no
    * token-level shuffle, no window, no state. The bigram hash is the
    * [[Sampling.bucket]] md5-prefix convention, so boundaries are
    * content-stable across reruns, layouts, and engines. */
  def cdcChunk(df: DataFrame, id: Column, text: Column,
      permille: Int = 125): DataFrame = {
    require(permille > 0 && permille <= 1000,
      s"permille must be in (0,1000], got $permille")
    df.select(id.as("doc_id"), F.tokens(lower(text)).as("tk"))
      .select(col("doc_id"), col("tk"), expr(
        // 0-based boundary starts: 0, every s>=2 whose preceding bigram
        // hashes under the threshold, and n as the terminator
        s"""concat(array(0),
             filter(sequence(0, size(tk) - 1), s -> s >= 2 AND
               pmod(CAST(conv(substring(md5(concat(tk[s-2], ' ', tk[s-1])), 1, 15), 16, 10) AS BIGINT), 1000) < $permille),
             array(size(tk)))""").as("bnd"))
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, size(bnd) - 2), j -> named_struct(
             'chunk_id', CAST(j AS BIGINT),
             'ck', slice(tk, bnd[j] + 1, bnd[j+1] - bnd[j])))""")).as("c"))
      .select(col("doc_id"), col("c.chunk_id").as("chunk_id"),
        size(col("c.ck")).cast("long").as("n_tokens"),
        array_join(col("c.ck"), " ").as("chunk_text"),
        md5(array_join(col("c.ck"), " ")).as("chunk_hash"))
  }

  /** PII patterns for [[scrubPii]] — deliberately RE2-compatible (no
    * backrefs, no lookaround) so the DuckDB oracle and any RE2-based
    * engine apply them identically. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}[- ]\\d{3,4}[- ]\\d{4}\\b"
  val IdRunRe = "\\d{9,}"

  /** PII scrubbing (tx11): redact emails, phone numbers, and long digit
    * runs (ids / account numbers) from document text — the privacy
    * filter every public-corpus pipeline runs before training. Applied
    * in a fixed order (emails → phones → digit runs) so the composition
    * is deterministic: phone digits can't be re-matched as id runs once
    * replaced. Pure map (three codegen'd regexp_replace passes + two
    * counters); zero shuffle at any scale.
    * Output: (doc_id, n_emails, n_phones, clean_text). */
  def scrubPii(df: DataFrame, id: Column, text: Column): DataFrame = {
    val t = text
    df.select(
      id.as("doc_id"),
      size(regexp_extract_all(t, lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(t, lit(PhoneRe), lit(0))).cast("long").as("n_phones"),
      regexp_replace(
        regexp_replace(
          regexp_replace(t, EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>"),
        IdRunRe, "<ID>").as("clean_text"))
  }

  /** Longest run of equal adjacent elements in a SORTED array — i.e. the
    * count of the most frequent element — computed as a left fold with a
    * (prev, run, best) accumulator. Pure per-row expression: the
    * shuffle-free way to get "top element count" without exploding the
    * corpus into a token-level groupBy. */
  private def maxRun(sorted: Column): Column =
    aggregate(
      sorted,
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x <=> acc.getField("prev"), acc.getField("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"), greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** Repetition quality metrics (tx12, Gopher-style): type-token ratio,
    * most-frequent-token fraction, and most-frequent-bigram fraction —
    * the "degenerate repetition" filters public pretraining pipelines
    * apply alongside the length/stopword heuristics in [[quality]]. A
    * document that loops the same phrase scores high top_*_frac and low
    * distinct_ratio and gets gated out.
    *
    * Scale shape: pure map, zero shuffle. The per-token counts that a
    * naive implementation gets from `explode + groupBy(doc, token)` (a
    * corpus-wide shuffle of every token occurrence) come instead from
    * sorting each doc's token array in place and folding the longest
    * equal-adjacent run ([[maxRun]]) — O(n log n) per row, all inside
    * the row's own partition. Bigrams are zip_with'd neighbor slices of
    * the same array, same fold. Ratios stay raw int/int doubles
    * (bit-identical across engines; round() diverges on halfway values).
    * Tokens are lowercased whitespace tokens (the shingle convention). */
  def repetition(df: DataFrame, id: Column, text: Column): DataFrame = {
    val tk = F.tokens(lower(text))
    val base = df.select(id.as("doc_id"), tk.as("tk"))
      .select(col("doc_id"),
        size(col("tk")).cast("long").as("n_tokens"),
        size(array_distinct(col("tk"))).cast("long").as("distinct_tokens"),
        maxRun(sort_array(col("tk"))).as("top_token_count"),
        maxRun(sort_array(zip_with(
          slice(col("tk"), lit(1), size(col("tk")) - 1),
          slice(col("tk"), lit(2), size(col("tk")) - 1),
          (a, b) => concat(a, lit(" "), b)))).as("top_bigram_count"))
    base.select(col("doc_id"), col("n_tokens"), col("distinct_tokens"),
      (col("distinct_tokens").cast("double") / col("n_tokens")).as("distinct_ratio"),
      col("top_token_count"),
      (col("top_token_count").cast("double") / col("n_tokens")).as("top_token_frac"),
      col("top_bigram_count"),
      when(col("n_tokens") > 1,
        col("top_bigram_count").cast("double") / (col("n_tokens") - 1))
        .otherwise(lit(0.0)).as("top_bigram_frac"))
  }

  /** Corpus report (qc1): the per-(stratum) "dataset card" a pipeline
    * emits before training — doc counts, token/char totals, mean doc
    * length, and the high-quality share (score ≥ threshold, reusing
    * [[qualityCols]]'s composite).
    *
    * Determinism across engines: every aggregate is an INTEGER sum or
    * count (one final int/int division for the mean), and the quality
    * gate is a per-row comparison on a value both engines compute
    * bit-identically — never a float SUM, whose partial-sum
    * reassociation under partitioning would drift from the oracle's
    * serial fold. Scale shape: one hash shuffle onto the (low-
    * cardinality) stratum keys with map-side partials. */
  /** Frequency-based boilerplate removal (tx14, CCNet-style): drop EVERY
    * instance of any paragraph that appears in `maxDocFreq`-or-more
    * DISTINCT documents (nav bars, cookie banners, license footers —
    * crawl boilerplate that near-dup DOCUMENT dedup never sees because
    * the surrounding text differs), then reassemble each doc's surviving
    * paragraphs in order. The complement of d9's paragraphDedup: d9
    * keeps the FIRST instance of a duplicated paragraph; this drops ALL
    * instances of corpus-frequent ones while a paragraph repeated only
    * WITHIN one doc (doc frequency 1) survives intact. Docs whose every
    * paragraph is boilerplate drop out entirely.
    *
    * Scale shape: paragraph doc-frequencies are a map-side-combined
    * count over md5(para) (hot boilerplate hashes partial-aggregate
    * before the exchange); the flagged set — DISTINCT paragraphs that
    * cross the threshold, a tiny fraction of any real corpus — comes
    * back as a broadcastable left-anti on the hash, so surviving
    * paragraph text only shuffles once, for the per-doc reassembly
    * (grouped by doc, bounded by document size). */
  def boilerplateFilter(docs: DataFrame, id: Column, text: Column,
      sep: String, maxDocFreq: Long): DataFrame = {
    require(maxDocFreq >= 2, s"maxDocFreq must be >= 2, got $maxDocFreq")
    val paras = docs
      .select(id.as("doc_id"), posexplode(split(text, java.util.regex.Pattern.quote(sep))))
      .select(col("doc_id"), col("pos").cast("long").as("idx"),
        col("col").as("para"), md5(col("col")).as("h"))
    val flagged = paras.groupBy("h")
      .agg(count_distinct(col("doc_id")).as("df"))
      .filter(col("df") >= maxDocFreq)
      .select("h")
    paras.join(flagged, Seq("h"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_paras"),
        array_join(expr("transform(array_sort(collect_list(struct(idx, para))), x -> x.para)"),
          sep).as("clean_text"))
  }

  /** Blocklist gate (tx15): per-doc count of blocklisted tokens and an
    * integer-permille keep decision — the C4-style term-filter stage
    * (C4 dropped any page with a "bad words" hit; Gopher/RefinedWeb use
    * ratio thresholds). `maxHitPermille = 0` is the C4 any-hit drop;
    * larger values tolerate incidental mentions. The comparison is the
    * exact integer cross-multiply `hits·1000 ≤ maxHitPermille·tokens` —
    * no float ratio, so engines cannot disagree at the boundary.
    *
    * Scale shape: the blocklist is a plan literal (driver model state)
    * and the gate is a PURE MAP over the tokens — zero shuffle, zero
    * joins, scan speed at any corpus size. Kept rows carry n_hits /
    * n_tokens so the audit card is free. */
  def blocklistGate(df: DataFrame, text: Column,
      blocklist: Seq[String], maxHitPermille: Long = 0L): DataFrame = {
    require(blocklist.nonEmpty, "blocklist must not be empty")
    require(maxHitPermille >= 0 && maxHitPermille <= 1000,
      s"maxHitPermille in [0,1000], got $maxHitPermille")
    val toks = F.tokens(lower(text))
    df.withColumn("n_hits", countIn(toks, blocklist).cast("long"))
      .withColumn("n_tokens", size(toks).cast("long"))
      .filter(col("n_hits") * 1000 <= lit(maxHitPermille) * col("n_tokens"))
  }

  /** Link-host statistics (url1): extract http(s) URLs from document
    * text, canonicalize the host (lowercase, strip one leading `www.`),
    * and aggregate per-host link and document counts — the host-level
    * frequency card that drives web-corpus curation (domain allowlists,
    * per-host caps à la C4/RefinedWeb). Pure map + explode on the
    * matches, then ONE hash agg on the host — no URL table, no join;
    * host cardinality bounds the agg output, not the corpus. */
  /** Drop boilerplate-sized blocks from block-structured text — the
    * length gate of the jusText/trafilatura family's paragraph
    * classifiers, and the natural consumer of the extraction kernel's
    * output (HtmlText emits paragraphs separated by single newlines):
    * blocks with fewer than `minTokens` whitespace tokens (nav bars,
    * footers, cookie banners, "Home About Contact") drop; surviving
    * blocks rejoin in order. A fully-boilerplate document becomes the
    * empty string — the caller's length floor (dp6's s2 stage) then
    * drops it, which is exactly the composition a curation pipeline
    * wants. Pure built-in composition (split → filter → array_join),
    * map-only, zero UDFs. */
  def dropShortBlocks(text: Column, minTokens: Int): Column = {
    require(minTokens >= 1, s"minTokens must be >= 1, got $minTokens")
    array_join(
      filter(split(text, "\n"),
        b => size(split(trim(b), "\\s+")) >= minTokens),
      "\n")
  }

  /** jusText-proper boilerplate gate over RAW HTML (tx19, r18 — the
    * classifier [[dropShortBlocks]]'s pure length floor approximates):
    * a block survives only if it has at least `minTokens` whitespace
    * tokens AND its LINK DENSITY — the fraction of visible codepoints
    * emitted inside `<a>` elements, from the blocksKernel walk — is at
    * most `maxLinkPermille`. This is the gate that actually kills nav
    * bars, footer link farms, and "related articles" rails, which are
    * often LONG (tx18 keeps them) but almost entirely anchor text.
    * Surviving blocks rejoin in document order with `\n` — byte-equal
    * to what htmlToText would have produced for just those blocks.
    * One codegen'd kernel pass + array HOFs: pure map, zero shuffle. */
  def dropLinkDenseBlocks(html: Column, minTokens: Int,
      maxLinkPermille: Int): Column = {
    require(minTokens >= 1, s"minTokens must be >= 1, got $minTokens")
    require(maxLinkPermille >= 0 && maxLinkPermille <= 1000,
      s"maxLinkPermille must be in [0, 1000], got $maxLinkPermille")
    val blocks = graft.plans.HtmlTextExpr.htmlBlocks(html)
    val kept = filter(blocks, b =>
      size(split(b.getField("btext"), " ")) >= minTokens &&
        b.getField("a_chars") * 1000 <= length(b.getField("btext")) * maxLinkPermille)
    array_join(transform(kept, b => b.getField("btext")), "\n")
  }

  /** Parse a sitemaps.org `urlset` document (the crawl-discovery
    * channel next to robots.txt: hosts PUBLISH their fetchable URLs,
    * and a crawler seeds its frontier from them instead of discovering
    * every page through links): one row per `<url>` entry with its
    * `<loc>` (required) and `<lastmod>` (optional, NULL when absent —
    * the field schedulers use for recrawl priority). Whitespace around
    * values is the spec's to ignore. Pure built-in composition
    * (regexp_extract_all over entries + explode + per-entry extracts)
    * — map + explode, entry cardinality bounds what moves; a sitemap
    * INDEX (`<sitemapindex>` of child sitemaps — the dominant
    * real-world shape) is one more hop of the same parse,
    * [[sitemapIndexEntries]] (r18).
    * Input: (key, xml) columns; output: (key, loc, lastmod). */
  def sitemapEntries(df: DataFrame, key: Column, xml: Column): DataFrame =
    df.select(key.as("key"),
      explode(regexp_extract_all(xml,
        lit("(?s)<url>(.*?)</url>"), lit(1))).as("e"))
      .select(col("key"),
        regexp_extract(col("e"), "<loc>\\s*([^<]+?)\\s*</loc>", 1).as("loc"),
        when(col("e").contains("<lastmod>"),
          regexp_extract(col("e"), "<lastmod>\\s*([^<]+?)\\s*</lastmod>", 1))
          .otherwise(lit(null).cast("string")).as("lastmod"))
      .filter(col("loc") =!= "")

  /** Parse a sitemaps.org `sitemapindex` document — the one-more-hop
    * [[sitemapEntries]] promised (r18): big sites publish an INDEX of
    * child sitemaps, each `<sitemap><loc>…</loc></sitemap>` naming one
    * urlset file (commonly `.xml.gz`). One row per child with its
    * `<loc>`; whitespace-tolerant like the urlset parse. The discovery
    * chain a crawler actually runs is robots.txt `Sitemap:` line
    * ([[graft.operators.Robots.parseSitemaps]]) → this index hop →
    * [[sitemapEntries]] per child (gunzipping `.xml.gz` children via
    * [[graft.plans.GzipExprs.gunzipText]]) — url8b composes all three.
    * Input: (key, xml); output: (key, loc). */
  def sitemapIndexEntries(df: DataFrame, key: Column, xml: Column): DataFrame =
    df.select(key.as("key"),
      explode(regexp_extract_all(xml,
        lit("(?s)<sitemap>(.*?)</sitemap>"), lit(1))).as("e"))
      .select(col("key"),
        regexp_extract(col("e"), "<loc>\\s*([^<]+?)\\s*</loc>", 1).as("loc"))
      .filter(col("loc") =!= "")

  /** Per-document extracted URLs, one row per link occurrence — the
    * shared extraction under [[docHosts]]/[[linkHosts]] (host stats,
    * pr1 edges) and [[urlDedup]]. Pure map + explode. */
  def docUrls(df: DataFrame, id: Column, text: Column): DataFrame = {
    val urls = regexp_extract_all(text, lit("https?://[^\\s]+"), lit(0))
    df.select(id.as("doc_id"), explode(urls).as("url"))
  }

  /** Per-document extracted link hosts (canonicalized: lowercase, one
    * leading `www.` stripped), one row per link occurrence. */
  def docHosts(df: DataFrame, id: Column, text: Column): DataFrame =
    docUrls(df, id, text)
      .select(col("doc_id"),
        regexp_replace(lower(regexp_extract(col("url"), "https?://([^/\\s?#]+)", 1)),
          "^www\\.", "").as("host"))

  /** url5 — registrable-domain rollup: hosts collapse to their last two
    * labels (the heuristic registrable domain — a production deployment
    * swaps in the Public Suffix List, which is a broadcast data file,
    * not a different plan) and the card counts distinct subdomains,
    * links, and docs per domain — the "who owns this traffic"
    * aggregation above url1's host stats (cdn.example.net and
    * www.example.net are one operator's inventory, and pr1/pr2's
    * authority signals aggregate naturally at this grain). Map-only
    * extraction + one hash agg onto domain keys. */
  def domainRollup(df: DataFrame, id: Column, text: Column): DataFrame =
    docHosts(df, id, text)
      .select(col("doc_id"), col("host"),
        regexp_extract(col("host"), "([^.]+\\.[^.]+)$", 1).as("domain"))
      .groupBy("domain")
      .agg(count_distinct(col("host")).as("n_hosts"),
        count(lit(1)).cast("long").as("n_links"),
        count_distinct(col("doc_id")).as("n_docs"))

  /** URL canonicalization (url2): the WET-pipeline normal form under
    * which crawl URLs are deduplicated — drop the fragment, lowercase
    * scheme+host and strip one leading `www.` (path/query case is
    * significant and kept), remove tracking parameters (utm_*, fbclid,
    * gclid) with separator repair, drop a trailing slash. Regex-only on
    * purpose: every step is a single anchored or globally-applied
    * pattern that evaluates identically in Spark and the DuckDB oracle.
    * Pure map — canonicalization adds zero shuffle on top of the
    * dedup's one hash aggregate. */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val lowered = concat(
      regexp_replace(lower(regexp_extract(noFrag, "^(https?://[^/?#]+)", 1)),
        "^(https?://)www\\.", "$1"),
      regexp_extract(noFrag, "^https?://[^/?#]+(.*)$", 1))
    // Anchored at a parameter boundary ([?&]) so a param whose name
    // merely ENDS in a tracked name (?myfbclid=1) is kept intact; the
    // (...)+ absorbs runs of consecutive tracking params in one match
    // (the separator the next run needs is restored by $1).
    val noTrack = regexp_replace(lowered,
      "([?&])((?:utm_[^&=]*|fbclid|gclid)=[^&]*&?)+", "$1")
    val noDangle = regexp_replace(
      regexp_replace(noTrack, "\\?&", "?"), "[?&]$", "")
    regexp_replace(noDangle, "([^/])/$", "$1")
  }

  /** url2 — canonical-URL dedup: group link occurrences by
    * [[canonicalUrl]], report occurrence/document counts and the
    * min-doc_id keeper (the same min-survivor convention as the text
    * dedup family). One explode + one hash aggregate keyed by the
    * canonical URL; output cardinality is the distinct-URL count, never
    * the corpus. */
  def urlDedup(df: DataFrame, id: Column, text: Column): DataFrame =
    docUrls(df, id, text)
      .select(col("doc_id"), canonicalUrl(col("url")).as("canonical_url"))
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_links"),
        count_distinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("keeper_doc"))

  /** Markdown link pattern: `[anchor](http…)`, the anchor and URL in
    * capture groups 1/2. The URL stops at `)` or whitespace. */
  private val MdLink = "\\[([^\\]]+)\\]\\((https?://[^)\\s]+)\\)"

  /** Anchor-text aggregation (url3): per canonical target host, the
    * most frequent anchor text pointing at it plus link/anchor counts.
    * The web-curation signal anchor text carries — what OTHER pages
    * call a host — feeds query generation, title repair, and authority
    * features (anchors are the classic external description of a page).
    * Ties break by ascending anchor text.
    *
    * Scale shape: pure map + explode to (host, anchor) pairs, one hash
    * agg keyed by (host, anchor), then windows over per-host ANCHOR
    * lists — cardinality is distinct anchors per host, never links or
    * corpus; everything after the first agg shuffles once on host. */
  def anchorTexts(df: DataFrame, id: Column, text: Column): DataFrame = {
    val pairs = df
      .select(id.as("doc_id"),
        explode(regexp_extract_all(text, lit(MdLink), lit(0))).as("m"))
      .select(
        regexp_replace(lower(regexp_extract(
            regexp_extract(col("m"), MdLink, 2), "https?://([^/\\s?#]+)", 1)),
          "^www\\.", "").as("host"),
        regexp_extract(col("m"), MdLink, 1).as("anchor"))
    val perAnchor = pairs.groupBy("host", "anchor").agg(count(lit(1)).as("n"))
    val byHost = Window.partitionBy("host")
    perAnchor
      .withColumn("rn", row_number().over(
        byHost.orderBy(col("n").desc, col("anchor").asc)))
      .withColumn("n_links", sum(col("n")).over(byHost))
      .withColumn("n_anchors", count(lit(1)).over(byHost))
      .where(col("rn") === 1)
      .select(col("host"), col("anchor").as("top_anchor"),
        col("n").as("top_anchor_links"), col("n_links"), col("n_anchors"))
  }

  def linkHosts(df: DataFrame, id: Column, text: Column): DataFrame =
    docHosts(df, id, text)
      .groupBy("host")
      .agg(count(lit(1)).as("n_links"),
        count_distinct(col("doc_id")).as("n_docs"))

  def corpusReport(df: DataFrame, strata: Seq[String], text: Column,
      qualityThreshold: Double = 0.8): DataFrame = {
    val (nChars, nWords, _, _, score) = qualityCols(text)
    df.select(strata.map(col) :+ nChars.as("nc") :+ nWords.as("nw") :+
        (score >= qualityThreshold).cast("long").as("hq"): _*)
      .groupBy(strata.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nw")).as("total_tokens"),
        sum(col("nc")).as("total_chars"),
        (sum(col("nw")).cast("double") / count(lit(1))).as("avg_doc_tokens"),
        sum(col("hq")).as("n_high_quality"))
  }

  /** Bigram-association card (tx16): the corpus's top-`k` adjacent
    * token pairs ranked by an INTEGER PMI proxy — assoc_micro =
    * scale·c_xy·N DIV (c_x·c_y), the cross-multiplied form of
    * p(xy)/(p(x)p(y)) with every term an exact BIGINT (log-PMI is
    * monotone in it, so the ranking is the PMI ranking). The corpus-
    * stats tool behind collocation mining / tokenizer-merge audits:
    * high-association pairs are the multi-word units a BPE vocab
    * should fuse. `minCount` guards the classic PMI pathology (hapax
    * pairs scoring highest).
    *
    * Scale shape: one explode + two hash aggs (map-side combined) build
    * the unigram and bigram tables; the score join shuffles on the word
    * keys (the unigram table is vocabulary-sized — NOT broadcast; at
    * corpus scale vocabularies run to many millions of rows); top-k is
    * TakeOrderedAndProject, never a global sort. N is a 1-row driver
    * scalar (model-state convention). BIGINT range: scale·c_xy·N ≤
    * scale·N², so the default micro scale is exact to ~3·10⁶ corpus
    * tokens; larger corpora pass a smaller `scale`.
    *
    * Output: (w1, w2, c_xy, c_x, c_y, assoc_micro), the k highest by
    * (assoc_micro desc, w1, w2) — a total order, bigrams are unique. */
  def bigramAssoc(df: DataFrame, text: Column, minCount: Long = 5L,
      k: Int = 50, scale: Long = 1000000L): DataFrame = {
    val toks = df.select(F.tokens(lower(text)).as("tk"))
    val uni = graft.CacheScope.persist(
      toks.select(explode(col("tk")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c")))
    // coalesce: an empty corpus sums to NULL — read 0, not an NPE
    val n = uni.agg(coalesce(sum(col("c")), lit(0L))).head.getLong(0)
    toks.where(size(col("tk")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(tk) - 1), i -> struct(tk[i-1] AS w1, tk[i] AS w2))"))
        .as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
      .where(col("c_xy") >= minCount)
      .join(uni.select(col("w").as("w1"), col("c").as("c_x")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c_y")), Seq("w2"))
      .select(col("w1"), col("w2"), col("c_xy"), col("c_x"), col("c_y"),
        expr(s"($scale" + s"L * c_xy * ${n}L) DIV (c_x * c_y)").as("assoc_micro"))
      .orderBy(col("assoc_micro").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Document fingerprint: position-weighted polynomial hash of tokens,
    * portable to the DuckDB oracle (sum over tokens of
    * (portableHash60(tok) mod 1000003) * position, as a long). Native
    * per-row expression — the HOF formulation interpreted an md5 call
    * per element. */
  def fingerprint(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc_id"),
      graft.plans.TextHashExprs.tokenFingerprint(text).as("fingerprint"))

  /** tx17 — word-frequency spectrum (Zipf) card: for corpus frequency
    * f ∈ 1..cap (and one `cap+1` bucket for everything beyond), how
    * many distinct words occur exactly f times and how many corpus
    * tokens they account for. The vocabulary-health card read before
    * tokenizer training and after every dedup pass: the hapax count
    * (bucket 1) is the OCR-garbage / boilerplate-explosion alarm, the
    * spectrum's decay is the Zipf sanity check (integer counts — the
    * log-log slope floats, its SHAPE doesn't), and a dedup run that
    * doesn't shrink the high-f tail didn't remove what it claimed.
    *
    * Shape: one tokenize pass → word-keyed count (map-side combined) →
    * a ≤cap+1-row aggregate. The word count table is vocabulary-sized,
    * the card constant. */
  def freqSpectrum(df: DataFrame, text: Column, cap: Int = 10): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    df.select(explode(F.tokens(lower(text))).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .groupBy(least(col("freq"), lit(cap.toLong + 1)).as("freq_bucket"))
      .agg(count(lit(1)).cast("long").as("n_words"),
        sum("freq").cast("long").as("n_tokens"))
  }

  /** tx20 — the Gopher quality-rule battery (Rae et al. 2021 §A.1.1,
    * the published per-document filter every big web corpus since has
    * reused): seven structural rules, each stated as EXACT integer
    * cross-multiplication (never a float ratio, so any partitioning
    * and the oracle agree bit-for-bit):
    *   1. 50 ≤ word count ≤ 100 000
    *   2. mean word length in [3, 10]   (3·n_words ≤ Σlen ≤ 10·n_words)
    *   3. ≤ 30% of lines end with an ellipsis
    *   4. < 90% of lines start with a bullet (-, *, •)
    *   5. symbol-to-word ratio ≤ 0.1    (symbols = '#' chars + '...' runs)
    *   6. ≥ 80% of words contain an alphabetic character
    *   7. ≥ 2 distinct Gopher stop words present
    * Output: doc_id, the driving counts, one boolean per rule, and
    * `kept` = all seven. Pure map over each doc (token/line HOFs, no
    * explode, no shuffle until the caller aggregates) — the cheapest
    * possible shape for a first-pass gate at crawl scale. */
  private val GopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
  def gopherRules(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc_id"), text.as("txt"))
      .withColumn("tk", F.tokens(lower(col("txt"))))
      .withColumn("ln", split(col("txt"), "\n"))
      .select(col("doc_id"),
        size(col("tk")).cast("long").as("n_words"),
        expr("aggregate(tk, 0L, (a, t) -> a + length(t))").as("n_wchars"),
        size(col("ln")).cast("long").as("n_lines"),
        expr("CAST(size(filter(ln, l -> endswith(rtrim(l), '...'))) AS BIGINT)")
          .as("n_ellipsis_lines"),
        expr("CAST(size(filter(ln, l -> startswith(ltrim(l), '-') OR " +
          "startswith(ltrim(l), '*') OR startswith(ltrim(l), '•'))) AS BIGINT)")
          .as("n_bullet_lines"),
        (length(col("txt")) - length(regexp_replace(col("txt"), "#", "")) +
          (length(col("txt")) - length(regexp_replace(col("txt"), "\\.\\.\\.", "")))
            / 3).cast("long").as("n_symbols"),
        expr("CAST(size(filter(tk, t -> t rlike '[a-z]')) AS BIGINT)")
          .as("n_alpha_words"),
        size(array_intersect(array_distinct(col("tk")),
          array(GopherStops.map(lit): _*))).cast("long").as("n_stop_distinct"))
      .withColumn("r_wordcount", col("n_words").between(50L, 100000L))
      .withColumn("r_meanlen", col("n_wchars") >= col("n_words") * 3 &&
        col("n_wchars") <= col("n_words") * 10)
      .withColumn("r_ellipsis", col("n_ellipsis_lines") * 10 <= col("n_lines") * 3)
      .withColumn("r_bullet", col("n_bullet_lines") * 10 < col("n_lines") * 9)
      .withColumn("r_symbol", col("n_symbols") * 10 <= col("n_words"))
      .withColumn("r_alpha", col("n_alpha_words") * 5 >= col("n_words") * 4)
      .withColumn("r_stop", col("n_stop_distinct") >= 2)
      .withColumn("kept", col("r_wordcount") && col("r_meanlen") &&
        col("r_ellipsis") && col("r_bullet") && col("r_symbol") &&
        col("r_alpha") && col("r_stop"))

  /** tx21 — the C4 cleaning battery (Raffel et al. 2020 §2.2 /
    * tensorflow_datasets c4_utils — the PUBLISHED line-level filter the
    * original C4 corpus shipped with, the line-rule complement to
    * tx20's Gopher document-structure rules):
    *   - a LINE is retained iff it ends in terminal punctuation
    *     (. ! ? ") after right-trim, carries ≥ 5 whitespace words, and
    *     does not contain 'javascript' (case-insensitive);
    *   - the PAGE drops if the RAW text contains 'lorem ipsum'
    *     (case-insensitive) or a '{' (c4_utils checks the raw page,
    *     not the cleaned text), or if the CLEANED text carries fewer
    *     than 3 sentences (terminal-punctuation count — the c4_utils
    *     sentence splitter's deterministic stand-in).
    * Output: per doc, line/sentence counters, one boolean per page
    * rule, `kept`, and md5 of the cleaned text — so the oracle gates
    * the exact line filter, not just the verdict. Pure map (line HOFs),
    * zero shuffle — the same first-pass-gate shape as tx20. */
  def c4Rules(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc_id"), text.as("txt"))
      .withColumn("ln", split(col("txt"), "\n"))
      .withColumn("kept_ln", expr(
        "filter(ln, l -> rtrim(l) rlike '[.!?\"]$' AND " +
          "size(split(trim(l), '\\\\s+')) >= 5 AND " +
          "NOT contains(lower(l), 'javascript'))"))
      .withColumn("cleaned", array_join(col("kept_ln"), "\n"))
      .select(col("doc_id"),
        size(col("ln")).cast("long").as("n_lines"),
        size(col("kept_ln")).cast("long").as("n_kept_lines"),
        size(regexp_extract_all(col("cleaned"), lit("[.!?]"), lit(0)))
          .cast("long").as("n_sentences"),
        (size(regexp_extract_all(col("cleaned"), lit("[.!?]"), lit(0))) >= 3)
          .as("r_min_sentences"),
        (!contains(lower(col("txt")), lit("lorem ipsum"))).as("r_no_lorem"),
        (!contains(col("txt"), lit("{"))).as("r_no_brace"),
        md5(col("cleaned").cast("binary")).as("cleaned_md5"))
      .withColumn("kept",
        col("r_min_sentences") && col("r_no_lorem") && col("r_no_brace"))

  /** qc22 — encoding-INTEGRITY card: the QC read a corpus owner runs
    * over DECODED text to find what the charset chain got wrong
    * upstream (the warc2 accounting says what was DECLARED; this says
    * what the text actually looks like). Three per-doc counters:
    *   - `n_replacement` — U+FFFD instances (a decoder already gave up:
    *     invalid bytes under the chosen charset);
    *   - `n_control`     — C0 control chars other than \t \n \r (binary
    *     bleed-through or charset garbling);
    *   - `n_moji`        — 'Ã' (U+00C3) instances, the signature char
    *     of UTF-8 bytes decoded as latin-1/cp1252 (every 2-byte
    *     sequence starting 0xC3 — é è ü and friends — becomes 'Ã'+x).
    * `verdict` classes the doc by priority replacement > double_encoded
    * > control > clean. `n_moji` is a HINT, not proof — legitimate text
    * (Portuguese 'São') carries the char too, which is why this is a
    * card to read, not a gate to drop on. Pure map, no shuffle. */
  def encodingIntegrity(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc_id"), text.as("t"))
      .select(col("doc_id"),
        (length(col("t")) - length(regexp_replace(col("t"), "\uFFFD", "")))
          .cast("long").as("n_replacement"),
        size(regexp_extract_all(col("t"),
          lit("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"), lit(0)))
          .cast("long").as("n_control"),
        (length(col("t")) - length(regexp_replace(col("t"), "\u00C3", "")))
          .cast("long").as("n_moji"))
      .select(col("doc_id"), col("n_replacement"), col("n_control"),
        col("n_moji"),
        when(col("n_replacement") > 0, "replacement")
          .when(col("n_moji") > 0, "double_encoded")
          .when(col("n_control") > 0, "control")
          .otherwise("clean").as("verdict"))
}
