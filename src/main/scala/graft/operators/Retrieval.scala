package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.F

/** Sparse (lexical) retrieval over the corpus — the BM25 complement to
  * the embedding ANN family (sim*): an inverted-index artifact and a
  * deterministic BM25 ranker, the tools a curation pipeline uses for
  * keyword contamination probes and retrieval-based corpus QA.
  *
  * Determinism stances (oracle parity):
  *  - idf is the RATIO idf `N/df` (the tx8 convention) — no libm log,
  *    whose rounding differs across engines.
  *  - per-(query, term, doc) BM25 contributions are computed in double
  *    (pure per-row arithmetic — bit-identical when the expression tree
  *    matches the oracle's), rounded ONCE to a fixed-point grid and
  *    summed as BIGINT (the lr1 gradient trick) — so the per-document
  *    score is exact under any partitioning and any add order.
  *
  * Scale design: the corpus text is tokenized EXACTLY ONCE — the
  * (doc_id, term, tf) table is persisted and every other statistic
  * derives from it (dl = Σ tf per doc, df = rows per term, total
  * length = Σ tf), so no aggregate re-reads the 100 TB text column.
  * Everything downstream is equi-joins on `term`/`doc_id`. The posting
  * lists are sharded into fixed doc-id blocks so a stopword's postings
  * never materialize on one node (the stop-shingle lesson);
  * corpus-level scalars (N, total length) are 1-row broadcasts.
  */
object Retrieval {

  private def toks(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc_id"), explode(F.tokens(lower(text))).as("term"))

  /** The persisted one-tokenize-pass term-frequency table — the single
    * corpus-derived artifact every retrieval statistic reads. */
  private def tfTable(df: DataFrame, id: Column, text: Column): DataFrame =
    graft.CacheScope.persist(
      toks(df, id, text).groupBy("doc_id", "term").agg(count(lit(1)).as("tf")))

  /** The corpus statistics bundle shared by the rankers: build it once
    * and pass it to both when fusing (ret2), so a hybrid query costs
    * ONE tokenize pass, not one per scorer. */
  final case class Stats(tf: DataFrame, dl: DataFrame, dft: DataFrame,
      nDocs: DataFrame)

  def stats(df: DataFrame, id: Column, text: Column): Stats = {
    val tf = tfTable(df, id, text)
    // dl/dft persist alongside tf (r19 opt): a multi-system consumer
    // (ret2's fusion, ret4's scorecard, PRF's two passes) re-aggregated
    // the doc-length and document-frequency tables once per ranking
    // pass; both are metadata-sized (docs / vocab rows).
    Stats(tf,
      graft.CacheScope.persist(
        tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))),
      graft.CacheScope.persist(
        tf.groupBy("term").agg(count(lit(1)).as("df"))),
      df.agg(count(lit(1)).as("n_docs")))
  }

  /** idx1 — block-sharded inverted index: for every (term, doc-id
    * block) a postings string `"doc:tf,doc:tf,…"` ordered by doc_id,
    * with the block's doc count and the term's corpus-wide df. Block
    * width bounds the per-group row count, so even a term appearing in
    * every document shuffles as many (term, block) groups of ≤ width
    * postings — no hot-key group ever exceeds `blockWidth` entries. */
  def postingsIndex(df: DataFrame, id: Column, text: Column,
      blockWidth: Int = 256): DataFrame =
    postingsIndexFromTf(tfTable(df, id, text), blockWidth)

  /** The one-tokenize-pass (doc_id, term, tf) table, persisted for the
    * query's lifetime — public so segmented builders (idx2's shape)
    * share ONE tokenize pass across their batch slices: filtering this
    * frame by a batch's doc-id range is row-identical to tokenizing
    * the filtered batch, and per-segment df still derives from the
    * slice (r19 opt, guide §1.2 — each segment build re-ran the full
    * corpus tokenize before). */
  def termFrequencies(df: DataFrame, id: Column, text: Column): DataFrame =
    tfTable(df, id, text)

  /** [[postingsIndex]] over a prebuilt [[termFrequencies]] frame (or a
    * doc-id slice of one). */
  def postingsIndexFromTf(tf: DataFrame, blockWidth: Int = 256): DataFrame = {
    require(blockWidth > 0, s"blockWidth must be positive, got $blockWidth")
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.withColumn("block", expr(s"doc_id div $blockWidth"))
      .groupBy("term", "block")
      .agg(count(lit(1)).as("n_docs_block"),
        array_join(
          transform(sort_array(collect_list(struct(col("doc_id"), col("tf")))),
            s => concat(s.getField("doc_id").cast("string"), lit(":"),
              s.getField("tf").cast("string"))), ",").as("postings"))
      .join(dft, Seq("term"))
  }

  /** idx2 — segment merge: combine per-batch index segments (the
    * Lucene model — each ingest batch builds its own [[postingsIndex]]
    * over only its documents, O(batch) work) into the global index
    * view. Because corpus ingest is append-only with increasing doc
    * ids, aligning batch boundaries to block boundaries makes segment
    * (term, block) groups disjoint, so the merge is a UNION plus a
    * per-term df re-sum (df = Σ n_docs_block over a term's rows — no
    * stored-df reconciliation). Never re-reads indexed text.
    *
    * Contract: segments must cover disjoint doc-id ranges aligned to
    * `blockWidth` (the out3 append contract); a colliding (term,
    * block) would silently double a group — so `validate` defaults ON
    * (one cheap LIMIT-1 aggregation over the union when merging more
    * than one segment). Opt out with `validate = false` only for huge
    * merges where the caller already guarantees disjointness upstream
    * (e.g. ranges allocated by the ingest scheduler). */
  def mergeSegments(segments: Seq[DataFrame],
      validate: Boolean = true): DataFrame = {
    require(segments.nonEmpty, "mergeSegments needs at least one segment")
    val u = segments.map(_.drop("df")).reduce(_.unionByName(_))
    if (validate && segments.size > 1) {
      // one aggregation over the union: any (term, block) contributed by
      // two segments means the append contract was broken
      val dup = u.groupBy("term", "block").count().filter(col("count") > 1).limit(1).collect()
      require(dup.isEmpty, s"segments overlap on (term, block) ${dup.headOption}: " +
        "batch doc-id ranges must be disjoint and aligned to blockWidth")
    }
    u.join(u.groupBy("term").agg(sum(col("n_docs_block")).as("df")), Seq("term"))
  }

  /** idx5 — postings DELETE maintenance: remove a doc-id set from a
    * standing [[postingsIndex]] WITHOUT re-reading any indexed text —
    * the other half of the idx2 append contract (a serving index also
    * retires documents: erasure requests, re-curation, takedowns).
    *
    *  1. only blocks that CONTAIN a deleted id are touched — the
    *     delete set maps to its block set (`id DIV blockWidth`,
    *     O(batch) rows) and every other (term, block) row passes
    *     through with its packed postings VERBATIM (block
    *     disjointness: a block without deleted docs cannot change);
    *  2. affected rows explode, drop deleted entries, and re-pack in
    *     the builder's exact (doc_id-sorted) format — empty groups
    *     vanish;
    *  3. df repairs by SUBTRACTION: the removed (term, deleted-doc)
    *     pairs come out of the affected postings themselves (never
    *     the raw corpus), and every surviving row of a hit term —
    *     untouched blocks included — adjusts by the same delta; terms
    *     whose df reaches 0 drop entirely.
    *
    * Work is O(affected blocks + one df-keyed join); equivalence to
    * the survivor rebuild is oracle-gated (idx5 grades against idx1's
    * rebuild SQL over the survivor corpus). */
  def deleteFromIndex(index: DataFrame, deleteIds: DataFrame,
      blockWidth: Int = 256): DataFrame = {
    require(blockWidth > 0, s"blockWidth must be positive, got $blockWidth")
    val del = deleteIds.select(deleteIds.columns.head)
      .toDF("del_id").select(col("del_id").cast("long").as("del_id"))
    val delBlocks = del.select(expr(s"del_id DIV $blockWidth").as("block")).distinct()
    val idx = graft.CacheScope.persist(index)
    val affected = idx.join(broadcast(delBlocks), Seq("block"), "left_semi")
    val untouched = idx.join(broadcast(delBlocks), Seq("block"), "left_anti")
    val exploded = affected.select(col("term"), col("block"),
      explode(split(col("postings"), ",")).as("p"))
      .select(col("term"), col("block"),
        split(col("p"), ":").getItem(0).cast("long").as("doc_id"),
        split(col("p"), ":").getItem(1).cast("long").as("tf"))
    val kept = exploded.join(del, col("doc_id") === col("del_id"), "left_anti")
    // removed (term, doc) pairs — read from the index itself, never
    // from raw text; tf rows are already distinct per (term, doc)
    val dfDelta = graft.CacheScope.persist(
      exploded.join(del, col("doc_id") === col("del_id"), "left_semi")
        .groupBy("term").agg(count(lit(1)).cast("long").as("removed_df")))
    val rebuilt = kept.groupBy("term", "block")
      .agg(count(lit(1)).cast("long").as("n_docs_block"),
        array_join(
          transform(sort_array(collect_list(struct(col("doc_id"), col("tf")))),
            s => concat(s.getField("doc_id").cast("string"), lit(":"),
              s.getField("tf").cast("string"))), ",").as("postings"))
      .join(affected.select("term", "df").distinct(), Seq("term"))
    Seq(untouched, rebuilt).map { part =>
      part.join(dfDelta, Seq("term"), "left")
        .select(col("term"), col("block"), col("n_docs_block"), col("postings"),
          (col("df") - coalesce(col("removed_df"), lit(0L))).cast("long").as("df"))
    }.reduce(_.unionByName(_)).filter(col("df") > 0)
  }

  /** [[mergeSegments]] over a segment TABLE — segments stacked in one
    * frame under a `segment_id` column, the on-disk shape the streaming
    * indexer ([[graft.streaming.DocStream.runIndexSegmentsAvailableNow]])
    * appends. Validation checks the same append contract ((term, block)
    * owned by exactly ONE segment) with one LIMIT-1 aggregation; the
    * merge drops per-segment df and re-sums corpus-wide. Reading the
    * table and merging never re-reads indexed text — the global index
    * view costs O(segments' postings), not O(corpus). */
  def mergeSegmentTable(segTable: DataFrame, validate: Boolean = true): DataFrame = {
    val u = segTable.drop("df")
    if (validate) {
      val dup = u.groupBy("term", "block")
        .agg(count_distinct(col("segment_id")).as("ns"))
        .filter(col("ns") > 1).limit(1).collect()
      require(dup.isEmpty, s"segments overlap on (term, block) ${dup.headOption}: " +
        "batch doc-id ranges must be disjoint and aligned to blockWidth")
    }
    val bare = u.drop("segment_id")
    bare.join(bare.groupBy("term").agg(sum(col("n_docs_block")).as("df")), Seq("term"))
  }

  /** idx4 — tiered compaction plan over a segment table (the Lucene
    * merge-policy decision as a card): segments group into size TIERS
    * by decimal digit count of their postings-row count (an integer,
    * engine-portable stand-in for log-bucketing), and a tier holding ≥
    * `minMerge` segments is planned for merge — the policy that keeps
    * segment count logarithmic in corpus size, so the incremental
    * indexer's per-batch appends never degrade the read path into
    * thousands of tiny segments. Same-size-class merging is what keeps
    * compaction write amplification O(log N) total (merging a tiny
    * segment into a huge one repeatedly is the quadratic anti-pattern).
    * Output: (tier, n_segments, n_rows, action) — the card a compaction
    * scheduler executes with [[mergeSegmentTable]] per merge group.
    *
    * Shape: one segment-keyed count (segments-sized, tiny) + a
    * tiers-sized agg. Never touches postings content. */
  /** The distinct (segment_id, term, block) rows a stack of
    * [[postingsIndex]] builds over block-aligned doc-id ranges would
    * contain — the segment-table SKELETON [[compactionPlan]] reads.
    * The planner only counts rows per segment (its scaladoc: "never
    * touches postings content"), so the packed postings strings and df
    * column of a full build are computed-and-dropped work when the
    * table exists only to be planned (guide §1.2 / §2.3 project
    * early): one tokenize pass over the union of ranges replaces one
    * full index build per range. Row-count-identical per segment to
    * the full builds because block-aligned ranges make (term, block)
    * groups disjoint across segments. */
  def segmentSkeleton(df: DataFrame, id: Column, text: Column,
      segId: Column, blockWidth: Int = 256): DataFrame = {
    require(blockWidth > 0, s"blockWidth must be positive, got $blockWidth")
    df.select(segId.as("segment_id"), id.as("doc_id"),
        explode(F.tokens(lower(text))).as("term"))
      .select(col("segment_id"), col("term"),
        expr(s"doc_id div $blockWidth").as("block"))
      .distinct()
  }

  def compactionPlan(segTable: DataFrame, minMerge: Int = 2): DataFrame = {
    require(minMerge >= 2, s"minMerge must be >= 2, got $minMerge")
    segTable.groupBy("segment_id").agg(count(lit(1)).as("seg_rows"))
      .groupBy(length(col("seg_rows").cast("string")).cast("long").as("tier"))
      .agg(count(lit(1)).cast("long").as("n_segments"),
        sum("seg_rows").cast("long").as("n_rows"))
      .withColumn("action",
        when(col("n_segments") >= minMerge, "merge").otherwise("keep"))
  }

  /** idx3 — positional phrase search: exact phrase occurrences via the
    * positional-index identity — a phrase matches doc d at anchor a iff
    * for EVERY query position q the doc has that term at a + q. One
    * term-equi-join of query tokens against the positional postings,
    * then a (query, doc, anchor) group requiring all query positions
    * present; counting surviving anchors gives per-doc occurrence
    * counts. Handles repeated phrase terms and overlapping matches by
    * construction; negative anchors self-eliminate (position 0's term
    * can't sit below 0).
    *
    * Scale: the positional explode is the positional-index artifact
    * (built once, persisted); the join touches only the QUERY terms'
    * postings, and the anchor group is per-document — a stopword query
    * term fans out by its tf, bounded per doc, never collected to one
    * node. */
  def phraseSearch(df: DataFrame, id: Column, text: Column,
      phrases: DataFrame): DataFrame = {
    val pos = graft.CacheScope.persist(
      df.select(id.as("doc_id"),
        posexplode(F.tokens(lower(text))).as(Seq("pos", "term"))))
    val qTok = phrases.select(col("q_id"),
      posexplode(F.tokens(lower(col("q_text")))).as(Seq("qpos", "term")))
    val qLen = phrases.select(col("q_id"),
      size(F.tokens(lower(col("q_text")))).cast("long").as("qlen"))
    val anchors = qTok.join(pos, Seq("term"))
      .groupBy(col("q_id"), col("doc_id"),
        (col("pos") - col("qpos")).as("anchor"))
      .agg(count_distinct(col("qpos")).as("nq"))
    anchors.join(qLen, Seq("q_id")).filter(col("nq") === col("qlen"))
      .groupBy("q_id", "doc_id")
      .agg(count(lit(1)).cast("long").as("n_occurrences"))
  }

  /** TF-IDF query ranker — the second scorer for hybrid fusion: score =
    * Σ_t (tf/dl)·(N/df) over shared terms, fixed-pointed and summed
    * exactly like [[bm25]]. Same candidate generation (query-term
    * postings), same determinism contract. */
  def tfidfRank(df: DataFrame, id: Column, text: Column, queries: DataFrame,
      topK: Int = 5, scale: Double = 1e6,
      shared: Option[Stats] = None): DataFrame = {
    val st = shared.getOrElse(stats(df, id, text))
    val qt = queries.select(col("q_id"),
      explode(F.tokens(lower(col("q_text")))).as("term")).distinct()
    val contrib = qt.join(st.tf, Seq("term")).join(st.dl, Seq("doc_id"))
      .join(st.dft, Seq("term")).crossJoin(broadcast(st.nDocs))
      .select(col("q_id"), col("doc_id"),
        round((col("tf").cast("double") / col("dl")) *
          (col("n_docs").cast("double") / col("df")) * lit(scale))
          .cast("long").as("c"))
    val scored = contrib.groupBy("q_id", "doc_id").agg(sum(col("c")).as("score"))
    Sampling.topKPerGroup(scored, Seq(col("q_id")),
      Seq(col("score").desc, col("doc_id").asc), topK)
  }

  /** ret2 — reciprocal-rank fusion of two rankings `(q_id, doc_id,
    * rank)`: fused score = Σ round(1e9 / (60 + rank)) over the systems
    * that ranked the pair — the standard hybrid-retrieval combiner
    * (lexical + dense, or two lexical scorers), integer-exact so the
    * fused ordering is engine-identical. A full-outer equi-join on
    * (q_id, doc_id) plus one top-k window; no corpus access at all. */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int = 60, topK: Int = 5): DataFrame = {
    def part(rank: Column): Column =
      coalesce(round(lit(1e9) / (lit(k) + rank)).cast("long"), lit(0L))
    val fused = a.select(col("q_id"), col("doc_id"), col("rank").as("rank_a"))
      .join(b.select(col("q_id"), col("doc_id"), col("rank").as("rank_b")),
        Seq("q_id", "doc_id"), "full_outer")
      .select(col("q_id"), col("doc_id"),
        (part(col("rank_a")) + part(col("rank_b"))).as("score"))
    Sampling.topKPerGroup(fused, Seq(col("q_id")),
      Seq(col("score").desc, col("doc_id").asc), topK)
  }

  /** ret1 — BM25 top-k retrieval of corpus documents for a query table
    * `(q_id, q_text)`: score = Σ_t ratio-idf(t) · tf-saturation(t, d),
    * k1/b the standard 1.2/0.75, contributions fixed-pointed at
    * `scale` and summed exactly. Output: (q_id, doc_id, score, rank) —
    * `score` is the BIGINT fixed-point sum. Only documents sharing a
    * term with the query are scored (sparse retrieval: the candidate
    * set is the union of the query terms' postings). */
  def bm25(df: DataFrame, id: Column, text: Column, queries: DataFrame,
      topK: Int = 5, scale: Double = 1e6,
      maxDfRatio: Option[Double] = None,
      shared: Option[Stats] = None): DataFrame = {
    val st = shared.getOrElse(stats(df, id, text))
    val tf = st.tf
    val dl = st.dl
    val dft = st.dft
    val statsRow = st.nDocs
      .crossJoin(broadcast(tf.agg(sum(col("tf")).as("total_len"))))
    val qtAll = queries.select(col("q_id"),
      explode(F.tokens(lower(col("q_text")))).as("term")).distinct()
    // stopword-query guard: a term in more than maxDfRatio of the corpus
    // fans its postings into the candidate join for near-zero idf gain —
    // cap it like d7 caps shingle document frequency. Exact integer
    // compare (df · 1000 vs ratio‰ · N), no float threshold drift.
    val qt = maxDfRatio match {
      case None => qtAll
      case Some(r) =>
        require(r > 0 && r <= 1, s"maxDfRatio in (0,1], got $r")
        val permille = math.round(r * 1000)
        qtAll.join(dft, Seq("term"), "left")
          .crossJoin(broadcast(st.nDocs.select(col("n_docs").as("nd"))))
          .filter(coalesce(col("df"), lit(0L)) * 1000 <= lit(permille) * col("nd"))
          .select("q_id", "term")
    }
    // expression tree mirrored exactly in the oracle SQL: (idf * tfc) * scale
    val avgdl = col("total_len").cast("double") / col("n_docs")
    val idf = col("n_docs").cast("double") / col("df")
    val tfc = (col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / avgdl))
    val contrib = qt.join(tf, Seq("term")).join(dl, Seq("doc_id"))
      .join(dft, Seq("term")).crossJoin(broadcast(statsRow))
      .select(col("q_id"), col("doc_id"),
        round(idf * tfc * lit(scale)).cast("long").as("c"))
    val scored = contrib.groupBy("q_id", "doc_id").agg(sum(col("c")).as("score"))
    Sampling.topKPerGroup(scored, Seq(col("q_id")),
      Seq(col("score").desc, col("doc_id").asc), topK)
  }

  /** BM25 scoring from an explicit `(q_id, term)` set — [[bm25]]'s
    * core with the query tokenization factored out, so [[bm25Prf]] can
    * re-score an EXPANDED term set through the identical expression
    * tree. */
  private def bm25FromTerms(st: Stats, qt: DataFrame, topK: Int,
      scale: Double): DataFrame = {
    val statsRow = st.nDocs
      .crossJoin(broadcast(st.tf.agg(sum(col("tf")).as("total_len"))))
    val avgdl = col("total_len").cast("double") / col("n_docs")
    val idf = col("n_docs").cast("double") / col("df")
    val tfc = (col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / avgdl))
    val contrib = qt.join(st.tf, Seq("term")).join(st.dl, Seq("doc_id"))
      .join(st.dft, Seq("term")).crossJoin(broadcast(statsRow))
      .select(col("q_id"), col("doc_id"),
        round(idf * tfc * lit(scale)).cast("long").as("c"))
    val scored = contrib.groupBy("q_id", "doc_id").agg(sum(col("c")).as("score"))
    Sampling.topKPerGroup(scored, Seq(col("q_id")),
      Seq(col("score").desc, col("doc_id").asc), topK)
  }

  /** ret3 — BM25 with pseudo-relevance feedback (RM3-lite): a first
    * BM25 pass retrieves `fbDocs` per query, the `fbTerms` highest
    * tf-idf-weighted NEW terms of those docs (original query terms
    * excluded, ties by term) expand the query, and the expanded term
    * set re-scores through the identical BM25 tree. The classic
    * recall-repair for vocabulary mismatch — the query says "table",
    * the relevant docs say "dataframe". Fully deterministic: fixed-
    * point weights, documented tie-breaks, no RNG.
    *
    * Scale shape: corpus stats build once (tf persisted — both passes
    * and the feedback weighting read it); every join afterwards is an
    * equi-join keyed on term or doc_id; feedback frames are
    * queries×fbDocs rows — corpus cost is the two candidate joins,
    * exactly two ret1 passes. */
  def bm25Prf(df: DataFrame, id: Column, text: Column, queries: DataFrame,
      topK: Int = 5, fbDocs: Int = 3, fbTerms: Int = 2,
      scale: Double = 1e6, shared: Option[Stats] = None): DataFrame = {
    // a shared Stats (ret4's three-arm scorecard) means ONE tokenize
    // pass feeds bm25, tfidf AND both PRF passes; tfTable already
    // persists tf, so no extra persist when sharing
    val st = shared.getOrElse(stats(df, id, text))
    val qt = queries.select(col("q_id"),
      explode(F.tokens(lower(col("q_text")))).as("term")).distinct()
    val first = bm25FromTerms(st, qt, fbDocs, scale)
    val fbWeight = first.select(col("q_id"), col("doc_id"))
      .join(st.tf, Seq("doc_id"))
      .join(st.dl, Seq("doc_id"))
      .join(st.dft, Seq("term"))
      .crossJoin(broadcast(st.nDocs))
      .select(col("q_id"), col("term"),
        round((col("tf").cast("double") / col("dl")) *
          (col("n_docs").cast("double") / col("df")) * lit(scale))
          .cast("long").as("w"))
      .groupBy("q_id", "term").agg(sum(col("w")).as("w"))
      .join(qt, Seq("q_id", "term"), "left_anti")
    val expansion = Sampling.topKPerGroup(fbWeight, Seq(col("q_id")),
        Seq(col("w").desc, col("term").asc), fbTerms)
      .select("q_id", "term")
    bm25FromTerms(st, qt.unionByName(expansion).distinct(), topK, scale)
  }
}
