package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Multimodal, NearDup, Packing, Sharding, Similarity, TextOps}

class DataOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again"),
    (1L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy cat again and again"), // near dup of 0
    (3L, "completely different words entirely unrelated content here now today"),
    (4L, "short text")
  ).toDF("doc_id", "text")

  test("exact dedup keeps min doc_id per content hash") {
    val got = NearDup.exact(docs, col("doc_id"), col("text"))
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(0L, 2L, 3L, 4L))
  }

  test("imageDHash: byte-decoded dims, edit locality, unrelated images far apart") {
    // identical dims + identical payload -> identical hash
    assert(Multimodal.dHash64(100, 80, 0) == Multimodal.dHash64(100, 80, 0))
    // a one-cell edit (tweak) flips at most the 2 bits touching cell (0,1)
    val d01 = java.lang.Long.bitCount(
      Multimodal.dHash64(100, 80, 0) ^ Multimodal.dHash64(100, 80, 1))
    assert(d01 <= 2, s"one-pixel edit must stay within Hamming 2, got $d01")
    // unrelated dims -> hashes ~32 bits apart (the md5-cell guarantee;
    // a ratio-staircase grid would land these within the band gate)
    val far = java.lang.Long.bitCount(
      Multimodal.dHash64(100, 80, 0) ^ Multimodal.dHash64(101, 80, 0))
    assert(far > 10, s"distinct images must not be near-collisions, got $far")
    // end-to-end: synthesized PNGs round-trip through the byte parser and
    // the banded join finds exactly the same-group pairs
    val docs = Seq.tabulate(6)(i => (i.toLong, "x")).toDF("doc_id", "text")
    val pairs = Multimodal.imageDupPairs(
      Multimodal.imageDHash(Multimodal.syntheticImages(docs)), 3)
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    // groups are doc_id % 251: all 6 ids distinct groups -> no pairs...
    // unless two group hashes collide, which md5 cells make untestably rare
    assert(pairs.isEmpty, s"distinct-dim images must yield no pairs, got ${pairs.toSeq}")
    val dup = Seq((0L, "x"), (251L, "x"), (502L, "x"), (1L, "x")).toDF("doc_id", "text")
    val got = Multimodal.imageDupPairs(
      Multimodal.imageDHash(Multimodal.syntheticImages(dup)), 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // 0, 251, 502 share group 0 (251 is the odd-tweak twin); 1 is alone
    assert(got == Set((0L, 251L), (0L, 502L), (251L, 502L)),
      s"same-group images must pair up, got $got")
    CacheScope.releaseAll()
  }

  test("exactSubstrSpans: boundary-straddling overlap, threshold, within-doc repeat") {
    val d = Seq(
      // A and B share the 5-token run "q1 q2 q3 q4 q5" embedded in
      // otherwise-unique text, straddling no shared paragraph/chunk —
      // the case d1/d9/d10 all miss
      (0L, "u1 u2 u3 q1 q2 q3 q4 q5 v1 v2"),
      (1L, "w1 w2 q1 q2 q3 q4 q5 x1 x2 x3"),
      // C and D share only a 4-token run — below the n=5 threshold
      (2L, "a1 a2 a3 r1 r2 r3 r4 b1 b2 b3"),
      (3L, "c1 c2 r1 r2 r3 r4 d1 d2 d3 d4"),
      // E repeats a 5-token run WITHIN itself only — not cross-doc
      (4L, "s1 s2 s3 s4 s5 e1 s1 s2 s3 s4 s5")
    ).toDF("doc_id", "text")
    val got = NearDup.exactSubstrSpans(d, col("doc_id"), col("text"), 5)
      .select("doc_id", "span_start", "span_end", "span_tokens")
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq((0L, 3L, 7L, 5L), (1L, 2L, 6L, 5L)),
      s"expected exactly the two 5-token spans, got ${got.toSeq}")
    CacheScope.releaseAll()
  }

  test("exactSubstrSpans: touching and overlapping windows fuse into one maximal span") {
    // docs share a 7-token run: with n=5 the three stride-1 windows
    // (starts 0,1,2 in doc 0) overlap and must merge to ONE [0,6] span
    val d = Seq(
      (0L, "q1 q2 q3 q4 q5 q6 q7 z1 z2"),
      (1L, "y1 y2 q1 q2 q3 q4 q5 q6 q7")
    ).toDF("doc_id", "text")
    val got = NearDup.exactSubstrSpans(d, col("doc_id"), col("text"), 5)
      .select("doc_id", "span_start", "span_end", "span_tokens", "n_windows")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((0L, 0L, 6L, 7L, 3L), (1L, 2L, 8L, 7L, 3L)),
      s"expected one merged maximal span per doc, got ${got.toSeq}")
    CacheScope.releaseAll()
  }

  test("benchSubstrSpans: benchmark runs located in corpus docs, corpus-internal dups ignored") {
    import graft.operators.NearDup
    val corpus = Seq(
      // embeds the benchmark's 5-token run mid-document
      (0L, "u1 u2 b1 b2 b3 b4 b5 u3 u4"),
      // repeats short runs internally and shares tokens with doc 0 but
      // no ≥5-token run with the BENCHMARK — must pass through clean
      (1L, "u1 u2 v1 v2 v3 w1 w2 u3 u4 u1 u2 w3 w4 w5 w6 u3"),
      // clean
      (2L, "x1 x2 x3 x4 x5 x6 x7")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "pre b1 b2 b3 b4 b5 post")).toDF("doc_id", "text")
    val got = NearDup.benchSubstrSpans(corpus, bench, col("doc_id"), col("text"), 5)
      .select("doc_id", "span_start", "span_end", "span_tokens")
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq((0L, 2L, 6L, 5L)),
      s"expected only the benchmark span in doc 0, got ${got.toSeq}")
    // the surgical mask removes exactly that span
    val masked = NearDup.maskSpans(corpus, col("doc_id"), col("text"),
      NearDup.benchSubstrSpans(corpus, bench, col("doc_id"), col("text"), 5))
      .select("doc_id", "n_removed", "clean_text")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(masked.toSeq == Seq((0L, 5L, "u1 u2 u3 u4"),
      (1L, 0L, "u1 u2 v1 v2 v3 w1 w2 u3 u4 u1 u2 w3 w4 w5 w6 u3"),
      (2L, 0L, "x1 x2 x3 x4 x5 x6 x7")),
      s"surgical mask mismatch: ${masked.toSeq}")
    CacheScope.releaseAll()
  }

  test("personalizedPagerank: rank flows only from seeds, deterministic, seeds semi-joined") {
    import graft.operators.Graph
    val e = Seq(("a", "b"), ("b", "c"), ("d", "c"), ("c", "a"))
      .toDF("src", "dst")
    val seeds = Seq("a", "zz-not-in-graph").toDF("host")
    def run() = Graph.personalizedPagerank(e, seeds, 3)
      .as[(String, Long)].collect().toMap
    val r = run()
    assert(r == run(), "integer-exact PPR must be bit-deterministic")
    // d has no in-edges and is not a seed: zero rank at every iteration
    assert(r("d") == 0L, s"unreachable non-seed must stay 0, got ${r("d")}")
    assert(r("a") > 0L && r("b") > 0L && r("c") > 0L,
      s"seed neighborhood must accumulate rank, got $r")
    // after 3 iterations on the a→b→c→a cycle the seed holds the most
    // mass (teleport base + the cycle's return flow): a > b > c exactly
    assert(r("a") > r("b") && r("b") > r("c"),
      s"seed neighborhood ordering broken: $r")
    CacheScope.releaseAll()
  }

  test("graphWalk: beam search reaches multi-hop neighbors, respects beam and hop limits") {
    import graft.operators.Similarity
    // unit vectors fanning out by 0.2 rad per node: cosine to node 0
    // strictly decreases with node id, so ranks are unambiguous
    def v(i: Int) = Array(math.cos(i * 0.2).toFloat, math.sin(i * 0.2).toFloat)
    val vecs = (0 to 4).map(i => (i.toLong, v(i))).toDF("vec_id", "embedding")
    val chain = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val q = vecs.filter(col("vec_id") === 0)
    val got = Similarity.graphWalk(vecs, chain, q, k = 3, beam = 2, hops = 3)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    // beam 2 keeps {0, 1} as frontier every hop, so node 2 (two hops
    // out) is reached but 3 and 4 are not: the walk returns exactly {1, 2}
    assert(got.toSeq == Seq((0L, 1L, 1L), (0L, 2L, 2L)),
      s"expected the two-hop beam frontier, got ${got.toSeq}")
    // wider beam lets the frontier advance: node 3 becomes reachable
    val wide = Similarity.graphWalk(vecs, chain, q, k = 4, beam = 3, hops = 3)
      .select("neighbor_id").as[Long].collect().toSet
    assert(wide == Set(1L, 2L, 3L), s"beam 3 must reach three hops, got $wide")
    CacheScope.releaseAll()
  }

  test("assignTop: n best cells per vector, ranked cos DESC with cid ASC ties") {
    import graft.operators.Clustering
    def v(i: Int) = Array(math.cos(i * 0.2).toFloat, math.sin(i * 0.2).toFloat)
    val vecs = (0 to 3).map(i => (i.toLong, v(i))).toDF("vec_id", "embedding")
    val cents = Seq((0L, v(0)), (1L, v(2)), (2L, v(4))).toDF("cid", "cv")
    val got = Clustering.assignTop(vecs, cents, 2)
      .select("vec_id", "cid", "crn").as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    // vector 1 (0.2 rad) sits between cent 0 (0.0) and cent 1 (0.4):
    // those are its two best (vector 3 at 0.6 is a float-rounded tie
    // between cents 1 and 2, so only membership is asserted there)
    assert(got(1L).toSet == Set(0L, 1L) && got(3L).toSet == Set(1L, 2L))
    assert(got(0L).head == 0L && got(2L).head == 1L,
      s"nearest cell must rank first, got $got")
    assert(got.values.forall(_.size == 2), "every vector gets exactly n cells")
    // rank-1 row must agree with assign's single pick
    val one = Clustering.assign(vecs, cents)
      .select("vec_id", "cid").as[(Long, Long)].collect().toMap
    assert(got.forall { case (id, cids) => cids.head == one(id) },
      "assignTop rank 1 must equal assign")
    CacheScope.releaseAll()
  }

  test("graphWalkLayered: layer edges bridge components the base graph cannot") {
    import graft.operators.{Clustering, Similarity}
    def v(i: Int) = Array(math.cos(i * 0.1).toFloat, math.sin(i * 0.1).toFloat)
    val vecs = (0 to 5).map(i => (i.toLong, v(i))).toDF("vec_id", "embedding")
    val cents = Seq((0L, v(2))).toDF("cid", "cv") // one cell: everything routes here
    val q = vecs.filter(col("vec_id") === 0)
    val noEdges = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    // with an EMPTY base graph the seeded walk can only ever see its
    // seeds — a beam cannot cross edges that don't exist
    val stranded = Similarity.graphWalkSeeded(vecs, noEdges, q,
        cents, k = 5, nSeeds = 2)
      .select("neighbor_id").as[Long].collect().toSet
    // the layered variant with everyone sampled (mid permille 1000,
    // topCount ≥ corpus) builds mid/top mutual-kNN edges itself and
    // reaches the rest
    val layered = Similarity.graphWalkLayered(vecs, noEdges, q,
        cents, k = 5, nProbe = 1, nEntry = 2,
        midPermille = 1000, topCount = 100, kUpper = 2)
      .select("neighbor_id").as[Long].collect().toSet
    assert(stranded.subsetOf(layered),
      s"layered walk must dominate the stranded one: $stranded vs $layered")
    assert(layered.size > stranded.size,
      s"layer edges must reach nodes the empty base graph cannot: $stranded vs $layered")
    CacheScope.releaseAll()
  }

  test("knnInsertMutual: incremental batch insert equals the full rebuild exactly") {
    import graft.operators.Similarity
    import graft.sources.Tables
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val base = e.filter(col("vec_id") % 10 =!= 0)
    val batch = e.filter(col("vec_id") % 10 === 0)
    def edges(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "cosine").as[(Long, Long, Double)].collect().toSet
    val incremental = edges(Similarity.knnInsertMutual(base, batch, "label", 5))
    val rebuild = edges(Similarity.mutualKnn(e, "label", 5))
    assert(incremental == rebuild,
      "merge-maintained graph must equal the full rebuild bit-for-bit")
    // non-vacuity: the batch must genuinely DISPLACE stored entries —
    // if the final graph equalled the base-only graph the merge path
    // would be untested
    val baseOnly = edges(Similarity.mutualKnn(base, "label", 5))
    assert(incremental != baseOnly,
      "fixture must exercise displacement: inserting the batch should change old edges")
    CacheScope.releaseAll()
  }

  test("knnDeleteMutual: incremental delete equals the survivor rebuild exactly") {
    import graft.operators.Similarity
    import graft.sources.Tables
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val del = e.filter(col("vec_id") % 10 === 0).select(col("vec_id"))
    def edges(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "cosine").as[(Long, Long, Double)].collect().toSet
    val incremental = edges(Similarity.knnDeleteMutual(e, del, "label", 5))
    val rebuild = edges(Similarity.mutualKnn(
      e.filter(col("vec_id") % 10 =!= 0), "label", 5))
    assert(incremental == rebuild,
      "delete-maintained graph must equal the survivor rebuild bit-for-bit")
    // non-vacuity 1: some survivor list must have referenced a deleted
    // neighbor (otherwise the rescore path never runs)
    val stored = Similarity.topKIvf(e, "label", 5)
    val affected = stored
      .filter(col("query_id") % 10 =!= 0 && col("neighbor_id") % 10 === 0)
      .count()
    assert(affected > 0, "fixture must exercise the rescore path")
    // non-vacuity 2: a REPLACEMENT neighbor must enter some rescored
    // list — dropping deleted edges alone must not reproduce the
    // rebuild (else the superset-domination proof is untested)
    val dropOnly = stored
      .filter(col("query_id") % 10 =!= 0 && col("neighbor_id") % 10 =!= 0)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val rebuiltLists = Similarity.topKIvf(e.filter(col("vec_id") % 10 =!= 0),
      "label", 5).select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(dropOnly != rebuiltLists,
      "fixture must exercise replacement: a slot must refill after delete")
    CacheScope.releaseAll()
  }

  test("filtered ANN: pre-filter fills k where post-filter under-fills; equals brute force") {
    import graft.operators.Similarity
    import graft.sources.Tables
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val allowed = e.filter(col("vec_id") % 3 === 0)
    val pre = Similarity.topKIvfAsym(e, allowed, "label", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    // exact-over-allowed equivalence is the entry's DuckDB oracle; here
    // pin the semantic content: only allowed neighbors ever return
    assert(pre.nonEmpty && pre.forall(_._2 % 3 == 0),
      "pre-filter must only return allowed neighbors")
    // post-filter loses results: filter the GLOBAL top-5 afterwards —
    // some query must end up with fewer hits than pre-filter found
    val post = Similarity.topKIvf(e, "label", 5)
      .filter(col("neighbor_id") % 3 === 0)
      .groupBy("query_id").agg(count(lit(1)).as("n"))
      .select("query_id", "n").as[(Long, Long)].collect().toMap
    val preN = pre.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    assert(preN.exists { case (q, n) => n > post.getOrElse(q, 0L) },
      "fixture must show post-filter under-fill vs pre-filter")
    // and pre-filter never returns fewer than post-filter anywhere
    assert(preN.forall { case (q, n) => n >= post.getOrElse(q, 0L) })
    CacheScope.releaseAll()
  }

  test("CountMin: estimate never undercounts, batch sketches merge by cell sum") {
    import graft.operators.CountMin
    import graft.sources.Tables
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(regexp_replace(col("text"), lit("(\\S+)"),
        concat(lit("$1~"), col("doc_id") % 97)).as("text"), col("doc_id"))
    val toks = docs.select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("term"))
    val (d, w) = (4, 256)
    val sk = CacheScope.persist(CountMin.sketch(toks, col("term"), d, w))
    val truth = toks.groupBy("term").agg(count(lit(1)).cast("long").as("true_count"))
    val est = CountMin.estimate(sk, truth, col("term"), d, w)
      .select("term", "true_count", "estimate")
      .as[(String, Long, Long)].collect()
    assert(est.nonEmpty)
    est.foreach { case (t, tc, e) =>
      assert(e >= tc, s"CMS must never undercount: $t true=$tc est=$e")
    }
    // collisions must be real at this vocab/width (else one-sidedness
    // is vacuously exact and the min-over-rows path is untested)
    assert(est.exists { case (_, tc, e) => e > tc },
      "fixture must produce at least one colliding overcount")
    // mergeability: sketch(A) + sketch(B) cell-wise == sketch(A ∪ B)
    val a = CountMin.sketch(toks.filter(col("doc_id") % 2 === 0), col("term"), d, w)
    val b = CountMin.sketch(toks.filter(col("doc_id") % 2 =!= 0), col("term"), d, w)
    val merged = a.unionByName(b).groupBy("rr", "cc")
      .agg(sum(col("n")).cast("long").as("n"))
      .as[(Long, Long, Long)].collect().toSet
    val whole = sk.as[(Long, Long, Long)].collect().toSet
    assert(merged == whole, "cell-wise sum of batch sketches must equal the full sketch")
    CacheScope.releaseAll()
  }

  test("deleteFromIndex: incremental delete equals the survivor rebuild exactly") {
    import graft.operators.Retrieval
    import graft.sources.Tables
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val del = docs.filter(col("doc_id") % 10 === 0).select(col("doc_id"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("term", "block", "n_docs_block", "postings", "df")
        .as[(String, Long, Long, String, Long)].collect().toSet
    val full = Retrieval.postingsIndex(docs, col("doc_id"), col("text"))
    val incremental = rows(Retrieval.deleteFromIndex(full, del))
    val rebuild = rows(Retrieval.postingsIndex(
      docs.filter(col("doc_id") % 10 =!= 0), col("doc_id"), col("text")))
    assert(incremental == rebuild,
      "delete-maintained index must equal the survivor rebuild bit-for-bit")
    // non-vacuity 1: some affected block must RETAIN other docs (the
    // re-pack path runs on mixed blocks, not just whole-block drops)
    val mixedBlocks = rebuild.exists { case (_, block, n, _, _) => block == 0L && n > 0 }
    assert(mixedBlocks, "fixture must exercise partial-block re-pack")
    // non-vacuity 2: some term's df must CHANGE while it keeps rows —
    // the subtraction path genuinely repairs denormalized df
    val fullDf = rows(full).groupBy(_._1).map { case (t, rs) => t -> rs.head._5 }
    val changed = rebuild.exists { case (t, _, _, _, df) =>
      fullDf.get(t).exists(old => old != df)
    }
    assert(changed, "fixture must exercise the df repair path")
    CacheScope.releaseAll()
  }

  test("apportionBudget: quotas sum to the budget exactly, each within one of its share") {
    import graft.operators.Sampling
    val w = Seq(("a", 7L), ("b", 13L), ("c", 1L), ("d", 29L), ("e", 3L))
    val df = w.toDF("k", "n")
    for (budget <- Seq(0L, 1L, 100L, 99999L)) {
      val out = Sampling.apportionBudget(df, col("k"), col("n"), budget)
        .select("key", "weight", "quota").as[(String, Long, Long)].collect()
      assert(out.map(_._3).sum == budget, s"budget $budget must apportion exactly")
      val t = w.map(_._2).sum
      out.foreach { case (k, wt, q) =>
        val lo = budget * wt / t
        assert(q == lo || q == lo + 1, s"$k at budget $budget: quota $q not in {$lo, ${lo + 1}}")
      }
    }
    // deterministic: same input twice = same quotas
    val a = Sampling.apportionBudget(df, col("k"), col("n"), 17L)
      .select("key", "quota").as[(String, Long)].collect().toSet
    CacheScope.releaseAll()
    val b = Sampling.apportionBudget(df, col("k"), col("n"), 17L)
      .select("key", "quota").as[(String, Long)].collect().toSet
    assert(a == b)
    CacheScope.releaseAll()
  }

  test("apportionBudget degenerate inputs: zero total weight and empty frame never yield NULLs") {
    import graft.operators.Sampling
    // all-zero weights: no proportional share exists — every quota is
    // exactly 0 (the documented short-circuit), never NULL
    val zeros = Seq(("a", 0L), ("b", 0L), ("c", 0L)).toDF("k", "n")
    val out = Sampling.apportionBudget(zeros, col("k"), col("n"), 10L)
      .select("key", "weight", "quota").collect()
    assert(out.length == 3)
    assert(out.forall(r => !r.isNullAt(2) && r.getLong(2) == 0L),
      s"zero-weight quotas must be 0, got ${out.mkString(", ")}")
    CacheScope.releaseAll()
    // empty frame: empty result, no divide-by-zero
    val empty = Seq.empty[(String, Long)].toDF("k", "n")
    assert(Sampling.apportionBudget(empty, col("k"), col("n"), 5L).count() == 0L)
    CacheScope.releaseAll()
  }

  test("kAnonymityRelease: no row under k, residual reconciles, suppressed counted") {
    import graft.operators.Profiling
    val df = Seq(
      ("a", 1L, 10L), ("a", 1L, 20L), ("a", 1L, 30L), // group (a,1): n=3 released at k=3
      ("b", 2L, 5L), ("b", 2L, 7L), //                   group (b,2): n=2 suppressed
      ("c", 3L, 100L) //                                 group (c,3): n=1 suppressed
    ).toDF("qi1", "qi2", "v")
    val out = Profiling.kAnonymityRelease(df, Seq(col("qi1"), col("qi2")), col("v"), 3)
      .collect().map(r => (Option(r.getString(0)), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(out == Set(
      (Some("a"), 3L, 60L, 0L), // released verbatim
      (None, 3L, 112L, 2L)), // residual: 2 groups, totals preserved
      s"got $out")
    // total reconciliation: released + residual = corpus
    val rel = Profiling.kAnonymityRelease(df, Seq(col("qi1"), col("qi2")), col("v"), 3)
    assert(rel.agg(sum("n_rows"), sum("metric_sum")).as[(Long, Long)].head() == ((6L, 172L)))
    // k=1 releases everything — no residual row appears
    assert(Profiling.kAnonymityRelease(df, Seq(col("qi1"), col("qi2")), col("v"), 1)
      .filter(col("qi1").isNull).count() == 0)
  }

  test("zValue interleaves bits; z-order layout prunes strictly more files than 1-D sort") {
    import graft.operators.Zorder
    import graft.sources.Tables
    // known interleaves: z(x=3, y=1) = x bits at 0,2 + y bit at 1 = 7;
    // z(0, 3) = y bits at 1,3 = 10; z(15, 0) = 1+4+16+64 = 85
    val probe = Seq((3L, 1L), (0L, 3L), (15L, 0L)).toDF("x", "y")
      .select(Zorder.zValue(col("x"), col("y"), 4).as("z")).as[Long].collect().toSeq
    assert(probe == Seq(7L, 10L, 85L), s"interleave broke: $probe")
    // the pruning claim the out5 card carries: for a 2-D rectangle
    // predicate, the z layout's file envelopes overlap strictly fewer
    // files than the 1-D control's (which clusters x but scatters y)
    val base = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id").as("id"),
        expr("least(CAST(15 AS BIGINT), CAST(length(text) AS BIGINT) DIV 64)").as("x"),
        (col("doc_id") % 11).as("y"))
    def touched(zorder: Boolean): Long = Zorder.withTouched(
      Zorder.assignFiles(base, col("id"), col("x"), col("y"), 32, 4, zorder)
        .groupBy("file_id")
        .agg(count(lit(1)).as("n_rows"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y")),
      2, 3, 2, 3).filter(col("touched")).count()
    val (zT, lT) = (touched(true), touched(false))
    assert(zT < lT, s"z-order must touch fewer files: zorder=$zT linear=$lT")
    CacheScope.releaseAll()
  }

  test("zone-map card (out5b): clustered dims prune, the non-clustered column does not") {
    import graft.operators.Zorder
    import graft.sources.Tables
    val base = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id").as("id"),
        expr("least(CAST(15 AS BIGINT), CAST(length(text) AS BIGINT) DIV 64)").as("x"),
        (col("doc_id") % 11).as("y"),
        (col("doc_id") % 13).as("w"))
    val card = Zorder.assignFilesWith(base, col("id"), col("x"), col("y"),
      Seq("w" -> col("w")), 32, 4, zorder = true)
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"),
        min(col("w")).as("min_w"), max(col("w")).as("max_w"))
    val xy = Zorder.withTouchedRange(card, "x", 2, 3, "tx")
      .withColumn("txy", col("tx") && col("max_y") >= 2 && col("min_y") <= 3)
    val nXy = xy.filter(col("txy")).count()
    val nW = Zorder.withTouchedRange(card, "w", 3, 4, "tw")
      .filter(col("tw")).count()
    val nFiles = card.count()
    // the inequality the card exists to show: the clustered rectangle
    // prunes most files, the non-clustered range prunes (almost) none
    assert(nXy * 2 < nFiles, s"xy rectangle must prune: touched $nXy of $nFiles")
    assert(nW * 10 >= nFiles * 9, s"w range must NOT prune: touched $nW of $nFiles")
    CacheScope.releaseAll()
  }

  test("exactSubstrMask: covered tokens drop, clean docs pass through, full coverage empties") {
    val d = Seq(
      // A and B share "q1 q2 q3 q4 q5" — those 5 tokens drop from both
      (0L, "u1 u2 u3 q1 q2 q3 q4 q5 v1 v2"),
      (1L, "w1 w2 q1 q2 q3 q4 q5 x1 x2 x3"),
      // C shares nothing ≥5 tokens — passes through untouched
      (2L, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"),
      // D and E are verbatim duplicates — fully covered, empty husks
      (3L, "z1 z2 z3 z4 z5 z6"),
      (4L, "z1 z2 z3 z4 z5 z6")
    ).toDF("doc_id", "text")
    val got = NearDup.exactSubstrMask(d, col("doc_id"), col("text"), 5)
      .select("doc_id", "n_tokens", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, 10L, 5L, "u1 u2 u3 v1 v2"),
      (1L, 10L, 5L, "w1 w2 x1 x2 x3"),
      (2L, 10L, 0L, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"),
      (3L, 6L, 6L, ""),
      (4L, 6L, 6L, "")),
      s"masked corpus mismatch: ${got.toSeq}")
    CacheScope.releaseAll()
  }

  test("minhashLsh finds exact and near dup pairs, skips unrelated") {
    val pairs = NearDup.minhashLsh(docs, col("doc_id"), col("text"), 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    // exact dup must have jaccard 1.0
    val j = NearDup.minhashLsh(docs, col("doc_id"), col("text"), 0.5)
      .filter(col("id_a") === 0 && col("id_b") === 1)
      .select("jaccard").as[Double].head()
    assert(j == 1.0)
  }

  test("simhash: identical docs → distance 0 pair; signatures stable") {
    val pairs = NearDup.simhashPairs(
      NearDup.simhash(docs, col("doc_id"), col("text")))
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L, 0L)))
  }

  test("dedupClusters: min-id label propagation over chains and singletons") {
    // graph: chain 10-11-12 (transitive near-dups), pair 20-21, singleton 30
    val nodes = Seq(10L, 11L, 12L, 20L, 21L, 30L).toDF("doc_id")
    val pairs = Seq((10L, 11L), (11L, 12L), (20L, 21L)).toDF("id_a", "id_b")
    val got = NearDup.dedupClusters(nodes, col("doc_id"), pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L))
  }

  test("shingles guard: docs shorter than n tokens yield none") {
    val sh = NearDup.shingles(Seq((9L, "one two")).toDF("doc_id", "text"),
      col("doc_id"), col("text"))
    assert(sh.count() == 0)
  }

  test("quality fields are consistent") {
    val row = TextOps.quality(docs, col("doc_id"), col("text"))
      .filter(col("doc_id") === 4).head()
    assert(row.getAs[Long]("n_words") == 2)
    assert(row.getAs[Long]("n_chars") == 10)
    assert(math.abs(row.getAs[Double]("avg_word_len") - 5.0) < 1e-12)
  }

  test("langId picks marker language deterministically") {
    val d = Seq((0L, "le chat et la maison"), (1L, "xyz qqq www")).toDF("doc_id", "text")
    val got = TextOps.langId(d, col("doc_id"), col("text"))
      .as[(Long, String)].collect().toMap
    assert(got(0L) == "fr" && got(1L) == "und")
  }

  test("cosine similarity: self-similarity is 1.0, topK ranks correctly") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f), 0), (3L, Array(0.9f, 0.1f), 0)
    ).toDF("vec_id", "embedding", "label")
    val top = Similarity.topK(vecs.filter(col("vec_id") === 0), vecs, 2)
      .select("neighbor_id", "rank").as[(Long, Long)].collect().toMap
    assert(top == Map(1L -> 1L, 3L -> 2L))
    val self = Similarity.nearDupPairs(vecs, "label", 0.9999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(self.contains((0L, 1L)))
  }

  test("topK guard: a query side past maxQueries fails fast toward the IVF path") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f), 0), (3L, Array(0.9f, 0.1f), 0)
    ).toDF("vec_id", "embedding", "label")
    val e = intercept[IllegalArgumentException] {
      Similarity.topK(vecs, vecs, 2, maxQueries = 2)
    }
    assert(e.getMessage.contains("topKIvf"))
    // at or under the cap the exact path still runs
    assert(Similarity.topK(vecs.limit(2), vecs, 2, maxQueries = 2).count() > 0)
  }

  test("multi-probe ANN: recall ⊇ single-probe, ≡ exact when probes cover all cells") {
    val vecs = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = hits(Similarity.topK(vecs, vecs, 3, maxQueries = 100000))
    val p1 = hits(Similarity.topKMultiProbe(vecs, "label", 3, 10, 1))
    val p3 = hits(Similarity.topKMultiProbe(vecs, "label", 3, 10, 3))
    val pAll = hits(Similarity.topKMultiProbe(vecs, "label", 3, 10, 10))
    // nprobe=1 ≡ the single-probe IVF operator
    assert(p1 == hits(Similarity.topKIvf(vecs, "label", 3)))
    // recall vs exact grows monotonically with nprobe, reaching 1.0 at full cover
    val r1 = (p1 & exact).size.toDouble / exact.size
    val r3 = (p3 & exact).size.toDouble / exact.size
    assert(r3 >= r1)
    assert(pAll == exact)
  }

  test("centroid-ranked multi-probe: recall ≥ id-ring at equal nprobe, ⊇ single-probe") {
    import graft.operators.Clustering
    import org.apache.spark.sql.expressions.Window
    val vecs = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = hits(Similarity.topK(vecs, vecs, 3, maxQueries = 100000))
    val cents = Clustering.kmeans(vecs, 10, 3)
    val ranked = hits(Similarity.topKMultiProbe(vecs, cents, 3, 3))
    // the id-ring variant on the SAME learned cells, densified to 0..9
    // (ring arithmetic needs contiguous ids; learned cids are seed vec_ids)
    val dense = Clustering.assign(vecs, cents)
      .select(col("vec_id"),
        (dense_rank().over(Window.orderBy("cid")) - 1).cast("long").as("cell"))
    val ring = hits(Similarity.topKMultiProbe(
      vecs.join(dense, Seq("vec_id")), "cell", 3, 10, 3))
    def recall(h: Set[(Long, Long)]) = (h & exact).size.toDouble / exact.size
    assert(recall(ranked) >= recall(ring),
      s"centroid-ranked recall ${recall(ranked)} < ring recall ${recall(ring)}")
    // nprobe=1 degenerates to single-probe IVF on the learned cells
    val cells = Clustering.assign(vecs, cents)
      .select(col("vec_id"), col("cid").as("cell"))
    val single = hits(Similarity.topKIvf(
      vecs.join(cells, Seq("vec_id")), "cell", 3))
    assert(hits(Similarity.topKMultiProbe(vecs, cents, 3, 1)) == single)
    // and more probes never lose TRUE hits (a displaced candidate is by
    // definition beaten by 3 better ones, so it wasn't in the exact top-3)
    assert((single & exact).subsetOf(ranked & exact))
  }

  test("kmeans: deterministic across runs; learned cells beat the fixture label on recall") {
    import graft.operators.Clustering
    val vecs = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // two independent trainings are bit-identical (no RNG anywhere)
    val c1 = Clustering.kmeans(vecs, 10, 3).as[(Long, Seq[Float])].collect().toMap
    val c2 = Clustering.kmeans(vecs, 10, 3).as[(Long, Seq[Float])].collect().toMap
    assert(c1 == c2)
    assert(c1.size == 10 && c1.values.forall(_.length == 64))
    // the learned quantizer must beat the fixture `label` partitioning
    // on IVF recall vs exact — the point of training it
    val exact = hits(Similarity.topK(vecs, vecs, 5, maxQueries = 100000))
    val cells = Clustering.kmeansAssign(vecs, 10, 3)
      .select(col("vec_id"), col("cid").as("cell"))
    val learned = vecs.join(cells, Seq("vec_id"))
      .select(col("vec_id"), col("embedding"), col("cell"))
    val rLearned = (hits(Similarity.topKIvf(learned, "cell", 5)) & exact).size.toDouble / exact.size
    val rLabel = (hits(Similarity.topKIvf(vecs, "label", 5)) & exact).size.toDouble / exact.size
    assert(rLearned >= rLabel,
      s"learned-cell recall $rLearned < fixture-label recall $rLabel")
  }

  test("kmeans updateMeansFast ≈ strict-fold means (scale path, same model)") {
    import graft.operators.Clustering
    val vecs = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Clustering.kmeans(vecs, 8, 1)
    val asg = Clustering.assign(vecs, cents)
    val fast = Clustering.updateMeansFast(asg, vecs)
      .as[(Long, Seq[Float])].collect().toMap
    // strict means = one more kmeans round from the same centroids; compare
    // via a second training round's centroids (empty cells keep previous,
    // so only compare cells present in the fast update)
    val strict = Clustering.kmeans(vecs, 8, 2).as[(Long, Seq[Float])].collect().toMap
    assert(fast.keySet.subsetOf(strict.keySet))
    fast.foreach { case (cid, v) =>
      v.zip(strict(cid)).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-4f, s"cell $cid: fast $a vs strict $b") }
    }
    // the trainer's 100 TB knob drives the same path end-to-end: a full
    // fast-means training lands within tolerance of the strict model
    val fastTrained = Clustering.kmeans(vecs, 8, 2, strictMeans = false)
      .as[(Long, Seq[Float])].collect().toMap
    assert(fastTrained.keySet == strict.keySet)
    fastTrained.foreach { case (cid, v) =>
      v.zip(strict(cid)).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-3f, s"cell $cid: fastTrained $a vs strict $b") }
    }
  }

  test("deterministic sampling: monotone nesting, stratified rates, stable across runs") {
    import graft.operators.Sampling
    val rows = (0L until 1000L).map(i => (i, if (i % 3 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val s100 = Sampling.bernoulli(rows, col("doc_id"), 100).select("doc_id").as[Long].collect().toSet
    val s300 = Sampling.bernoulli(rows, col("doc_id"), 300).select("doc_id").as[Long].collect().toSet
    assert(s100.subsetOf(s300)) // nested samples: same key-buckets, larger cut
    assert(s300.size > s100.size && s100.nonEmpty)
    // rerun is bit-identical (content-keyed, not RNG)
    assert(Sampling.bernoulli(rows, col("doc_id"), 100)
      .select("doc_id").as[Long].collect().toSet == s100)
    // stratified: rate 0 drops the stratum entirely, 1000 keeps all of it
    val st = Sampling.stratified(rows, col("doc_id"), col("lang"), Map("en" -> 0, "de" -> 1000))
      .select("lang").as[String].collect()
    assert(!st.contains("en") && st.count(_ == "de") == rows.filter(col("lang") === "de").count())
    intercept[IllegalArgumentException] {
      Sampling.bernoulli(rows, col("doc_id"), 1001)
    }
  }

  test("grouped top-k picks k best per group with deterministic ties") {
    import graft.operators.Sampling
    val df = Seq((1L, "a", 10L), (2L, "a", 30L), (3L, "a", 30L), (4L, "a", 5L),
      (5L, "b", 7L)).toDF("id", "g", "score")
    val got = Sampling.topKPerGroup(df, Seq(col("g")),
      Seq(col("score").desc, col("id").asc), 2)
      .select("id", "rank").as[(Long, Long)].collect().toMap
    assert(got == Map(2L -> 1L, 3L -> 2L, 5L -> 1L)) // id 2 beats 3 on the tie
  }

  test("contamination: full containment flags 1.0, disjoint sets produce nothing") {
    import graft.operators.Contamination
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"), // contains bench 1 fully
      (11L, "nothing shared with that benchmark document at all")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "totally distinct evaluation item right here")
    ).toDF("doc_id", "text")
    val got = Contamination.flagged(corpus, bench, col("doc_id"), col("text"), 0.5)
      .select("corpus_id", "bench_id", "overlap").as[(Long, Long, Double)].collect()
    assert(got.toSeq == Seq((10L, 1L, 1.0)))
  }

  test("contamination cap drops boilerplate shingles from the corpus side only") {
    import graft.operators.Contamination
    // "x y z" is boilerplate: present in 3 corpus docs; the real overlap
    // pair (40 ⊃ bench 5) shares distinctive shingles
    val corpus = Seq(
      (40L, "alpha beta gamma delta x y z"),
      (41L, "p q r s t x y z"),
      (42L, "u v w a b x y z")
    ).toDF("doc_id", "text")
    val bench = Seq((5L, "alpha beta gamma delta"), (6L, "x y z")).toDF("doc_id", "text")
    val uncapped = Contamination.flagged(corpus, bench, col("doc_id"), col("text"), 0.9)
      .select("corpus_id", "bench_id").as[(Long, Long)].collect().toSet
    // all three corpus docs fully cover bench 6 ("x y z" = its only shingle)
    assert(uncapped == Set((40L, 5L), (40L, 6L), (41L, 6L), (42L, 6L)))
    val capped = Contamination.flagged(corpus, bench, col("doc_id"), col("text"), 0.9,
      maxCorpusFreq = Some(2L))
      .select("corpus_id", "bench_id").as[(Long, Long)].collect().toSet
    // the boilerplate shingle (df=3 > 2) is dropped: its pairs vanish,
    // the distinctive containment survives
    assert(capped == Set((40L, 5L)))
  }

  test("decontaminate = corpus minus flagged docs, exactly") {
    import graft.operators.Contamination
    import graft.sources.Tables
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val bench = docs.filter(col("doc_id") % 5 === 0)
    val flagged = Contamination.flagged(corpus, bench, col("doc_id"), col("text"), 0.5)
      .select("corpus_id").as[Long].collect().toSet
    val kept = Contamination.decontaminate(corpus, bench, col("doc_id"), col("text"), 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.intersect(flagged).isEmpty)
    assert(kept.size + flagged.size == corpus.count())
  }

  test("bloom semi-join: result equals plain semi-join; bloom pass actually prunes") {
    import graft.plans.BloomJoin
    val probe = (0L until 2000L).map(i => (i, i % 7)).toDF("k", "v")
    val build = Seq(3L, 10L, 500L, 1999L).toDF("bk")
    val got = BloomJoin.semiJoin(probe, col("k"), build, col("bk"), fpp = 0.01)
      .select("k").as[Long].collect().toSet
    assert(got == Set(3L, 10L, 500L, 1999L)) // ≡ exact semi-join, no false positives survive
    // the bloom pre-filter alone keeps ~fpp of the non-matching rows, not all of them
    val bf = BloomJoin.buildFilter(build, col("bk"), 0.01)
    val kept = probe.filter(BloomJoin.mightContain(col("k"), bf)).count()
    assert(kept >= 4 && kept < 200, s"bloom pass kept $kept of 2000")
  }

  test("multimodal plumbing: schema, batching, deterministic stub features") {
    val media = Multimodal.asMedia(docs)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 5)
    val f0 = feats.find(_.doc_id == 0L).get
    val f1 = feats.find(_.doc_id == 1L).get
    assert(f0.n_bytes == f1.n_bytes && f0.feature.sameElements(f1.feature))
    assert(f0.feature.length == 8 && f0.width >= 16)
  }

  test("multimodal header parse: real PNG/JPEG/WAV bytes round-trip dims") {
    import graft.operators.Multimodal
    val media = Multimodal.syntheticMedia(docs.toDF()
      .withColumn("n_chars", length(col("text")))).collect()
    media.foreach { m =>
      val parsed = Multimodal.parseDims(m.payload)
      assert(parsed.isDefined, s"doc ${m.doc_id}: ${m.mime} payload did not parse")
      assert(parsed.get._1 == m.mime, s"doc ${m.doc_id}: sniffed ${parsed.get._1}")
    }
    // dims come from the HEADER BYTES, not the length heuristics
    val png = media.find(_.mime == "image/png").get
    val Some((_, w, h)) = Multimodal.parseDims(png.payload)
    assert(w == (1 + png.doc_id % 640) && h > 0)
    // malformed input never throws, just fails to parse
    assert(Multimodal.parseDims(Array[Byte]()) == None)
    assert(Multimodal.parseDims("RIFFxxxxWAVE".getBytes) == None)
    assert(Multimodal.parseDims(Array.fill[Byte](40)(0x42)) == None)
    val truncated = png.payload.take(20)
    assert(Multimodal.parseDims(truncated) == None)
    // JPEG with a lying segment length must abort, not scan off the end
    val evil = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte, 0x7f, 0x7f)
    assert(Multimodal.parseDims(evil) == None)
  }

  test("multimodal header parse: crafted chunk sizes / standalone markers never hang or throw") {
    import graft.operators.Multimodal
    // RIFF chunk whose u32 size wraps negative as Int (0xFFFFFFF8 = -8):
    // the walk must terminate with None, not loop forever or underflow
    val wavEvil = java.nio.ByteBuffer.allocate(32).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes).putInt(24).put("WAVE".getBytes)
      .put("junk".getBytes).putInt(0xFFFFFFF8) // size = 4294967288
      .put(Array.fill[Byte](8)(0)).array()
    assert(Multimodal.parseDims(wavEvil) == None)
    // size that walks exactly to 0 steps (size = -9 & align) must not stall
    val wavZero = java.nio.ByteBuffer.allocate(24).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes).putInt(16).put("WAVE".getBytes)
      .put("junk".getBytes).putInt(0xFFFFFFF7).array()
    assert(Multimodal.parseDims(wavZero) == None)
    // JPEG standalone markers (RST0, TEM) carry no length field — the
    // walk must hop them, then still find the SOF0 that follows
    val jpegRst = java.nio.ByteBuffer.allocate(2 + 2 + 2 + 2 + 9 + 2)
      .put(0xff.toByte).put(0xd8.toByte)             // SOI
      .put(0xff.toByte).put(0xd0.toByte)             // RST0 (standalone)
      .put(0xff.toByte).put(0x01.toByte)             // TEM  (standalone)
      .put(0xff.toByte).put(0xc0.toByte).putShort(9) // SOF0 len=9
      .put(8.toByte).putShort(77).putShort(33)       // precision, h=77, w=33
      .put(0.toByte).put(0.toByte)
      .array()
    assert(Multimodal.parseDims(jpegRst) == Some(("image/jpeg", 33, 77)))
    // 0xFF fill bytes before a marker are padding, not a parse failure
    val jpegFill = java.nio.ByteBuffer.allocate(2 + 3 + 2 + 9)
      .put(0xff.toByte).put(0xd8.toByte)              // SOI
      .put(0xff.toByte).put(0xff.toByte).put(0xff.toByte) // fill run
      .put(0xc0.toByte).putShort(9)                   // SOF0 after fill
      .put(8.toByte).putShort(12).putShort(34)
      .put(0.toByte).put(0.toByte)
      .array()
    assert(Multimodal.parseDims(jpegFill) == Some(("image/jpeg", 34, 12)))
  }

  test("wav pcm kernel: encode→decode energies equal the direct sum of squares; malformed degrades to None") {
    import graft.operators.Multimodal
    // known samples, 2 windows × 3 frames, stereo: energies computable by hand
    val samples = Array[Short](1, 2, 3, -4, 5, 6, 7, 8, -9, 10, 11, 12)
    val wav = Multimodal.wavBytesPcm(8000, 2, samples)
    val e = Multimodal.wavPcmEnergies(wav, 2).get
    assert(e(0) == (1 + 4 + 9 + 16 + 25 + 36).toLong)
    assert(e(1) == (49 + 64 + 81 + 100 + 121 + 144).toLong)
    // remainder frames shorter than a window are ignored (fixed grid)
    val e3 = Multimodal.wavPcmEnergies(wav, 4) // 6 frames / 4 → 1-frame windows
    assert(e3.get.length == 4 && e3.get(0) == (1 + 4).toLong)
    // negative samples round-trip as signed s16 (energy is sign-free)
    val neg = Multimodal.wavBytesPcm(8000, 1, Array[Short](-32768, 32767))
    assert(Multimodal.wavPcmEnergies(neg, 2).get.toSeq ==
      Seq(32768L * 32768L, 32767L * 32767L))
    // degrade paths: header-only (no data), truncated, non-PCM, too short
    assert(Multimodal.wavPcmEnergies(wav.take(44), 2) == None)
    assert(Multimodal.wavPcmEnergies(wav.take(20), 2) == None)
    assert(Multimodal.wavPcmEnergies(wav, 7) == None) // 6 frames < 7 windows
    val nonPcm = wav.clone(); nonPcm(20) = 3 // audioFormat = 3 (float)
    assert(Multimodal.wavPcmEnergies(nonPcm, 2) == None)
  }

  test("audio fingerprint: real-PCM fixture pairs are exactly the same-group set; header-only WAVs fall back to the stub") {
    import graft.operators.Multimodal
    val ids = spark.range(0, 300).select(col("id").as("doc_id"))
    val fps = Multimodal.audioFingerprint(Multimodal.syntheticAudio(ids))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps.size == 300, "every PCM WAV must fingerprint")
    // in-group even/odd differ by the halved window 1 ⇒ hamming ≤ 2
    // (bits 0 and 1 are the only comparisons touching e(1))
    for (g <- 0 until 97; if g + 194 < 300) {
      val d = java.lang.Long.bitCount(fps(g.toLong) ^ fps(g + 97L))
      assert(d <= 2, s"group $g even/odd hamming $d > 2")
      assert(fps(g.toLong) == fps(g + 194L), s"group $g same-parity fingerprints must match")
    }
    // cross-group iid noise sits far outside the gate
    val cross = for (g <- 0 until 96) yield
      java.lang.Long.bitCount(fps(g.toLong) ^ fps(g + 1L))
    assert(cross.forall(_ > 3), s"cross-group hamming must exceed the gate, min ${cross.min}")
    // a header-only WAV (no data chunk payload) still fingerprints via
    // the md5 stub keyed by header params — degrade, never drop
    import spark.implicits._
    val headerOnly = Multimodal.syntheticMedia(
      spark.range(1, 2).select(col("id").as("doc_id"), lit(40L).as("n_chars")))
      .filter(_.mime == "audio/wav")
    val stubFps = Multimodal.audioFingerprint(headerOnly).collect()
    assert(stubFps.length == 1)
    // precedence: a decodable PCM WAV also has parseable header params,
    // so BOTH fingerprint paths could run — pin that the real-PCM
    // energies win over the header-keyed stub (the fallback ORDER
    // audioFingerprint's scaladoc states)
    val clip0 = Multimodal.syntheticAudio(
      spark.range(0, 1).select(col("id").as("doc_id"))).collect()(0)
    val stub0 = Multimodal.audioFp64(8000, 1, clip0.payload(clip0.payload.length - 1) & 0xff)
    assert(fps(0L) != stub0,
      "real-PCM fingerprint must win over the header stub when both paths can run")
  }

  test("exif orientation: 8-way store/normalize inverse, II/MM parse, degrade-to-upright edges") {
    import graft.operators.{JpegCodec, Multimodal}
    // store∘normalize is the identity for every orientation on a
    // non-square raster (5-8 swap dims)
    val u = Array.tabulate(7 * 5)(identity)
    for (o <- 1 to 8) {
      val (sw, sh, s) = Multimodal.orientStore(7, 5, u, o)
      val (uw, uh, back) = Multimodal.orientNormalize(sw, sh, s, o)
      assert((uw, uh) == ((7, 5)) && back.sameElements(u), s"o=$o")
      if (o >= 5) assert((sw, sh) == ((5, 7)), s"o=$o must swap stored dims")
    }
    // APP1 parse in both byte orders; absence and corruption degrade to 1
    val jpeg = JpegCodec.encodeGray(16, 16, Array.fill(256)(128))
    for (o <- 1 to 8; be <- Seq(false, true)) {
      val tagged = Multimodal.withExifOrientation(jpeg, o, be)
      assert(Multimodal.exifOrientation(tagged) == o, s"o=$o be=$be")
      assert(JpegCodec.decodeGray(tagged).isDefined, "APP1 must not break decode")
    }
    assert(Multimodal.exifOrientation(jpeg) == 1, "no APP1 → upright")
    val t6 = Multimodal.withExifOrientation(jpeg, 6)
    assert(Multimodal.exifOrientation(t6.take(12)) == 1, "truncated APP1 → upright")
    val corrupt = t6.clone(); corrupt(10) = 'X' // break the TIFF byte-order mark
    assert(Multimodal.exifOrientation(corrupt) == 1, "corrupt TIFF → upright")

    // real-world APP1 shapes the fixture writer never emits: the
    // orientation tag NOT first in a multi-entry IFD0, and an APP0
    // (JFIF) segment preceding the APP1 — both byte orders
    for (be <- Seq(false, true)) {
      def p16(a: Array[Byte], at: Int, v: Int, asBe: Boolean): Unit =
        if (asBe) { a(at) = (v >> 8).toByte; a(at + 1) = v.toByte }
        else { a(at) = v.toByte; a(at + 1) = (v >> 8).toByte }
      val tiff = new Array[Byte](8 + 2 + 24 + 4) // 2-entry IFD0
      val mk = if (be) 'M' else 'I'
      tiff(0) = mk.toByte; tiff(1) = mk.toByte
      p16(tiff, 2, 42, be)
      if (be) p16(tiff, 6, 8, be) else p16(tiff, 4, 8, be) // IFD0 at 8
      p16(tiff, 8, 2, be) // two entries
      p16(tiff, 10, 0x0110, be); p16(tiff, 12, 2, be) // Model, ASCII
      if (be) p16(tiff, 16, 4, be) else p16(tiff, 14, 4, be)
      p16(tiff, 22, 0x0112, be); p16(tiff, 24, 3, be) // Orientation 2nd
      if (be) p16(tiff, 28, 1, be) else p16(tiff, 26, 1, be)
      p16(tiff, 30, 7, be)
      val app1 = Array[Byte](0xff.toByte, 0xe1.toByte, 0, 0) ++
        "Exif".getBytes ++ Array[Byte](0, 0) ++ tiff
      app1(2) = ((app1.length - 2) >> 8).toByte; app1(3) = (app1.length - 2).toByte
      val app0 = Array[Byte](0xff.toByte, 0xe0.toByte, 0, 7, 'J', 'F', 'I', 'F', 0)
      val shaped = jpeg.take(2) ++ app0 ++ app1 ++ jpeg.drop(2)
      assert(Multimodal.exifOrientation(shaped) == 7,
        s"be=$be: tag-not-first behind APP0 must parse")
      assert(JpegCodec.decodeGray(shaped).isDefined)
    }

    // end-to-end: a physically rotated copy with the flag set hashes
    // IDENTICAL to its upright twin through the oriented pipeline —
    // and ~32 bits away through the plain one (the real-world miss)
    val ids = spark.range(0, 16).select(col("id").as("doc_id"))
    val media = Multimodal.syntheticJpegExifImages(ids, _ % 4, _ / 4)
    val oriented = Multimodal.imageDHashOriented(media)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(oriented.size == 16, "every fixture payload must decode")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (g <- 0 until 4; m <- 1 until 4)
      assert(ham(oriented(g.toLong), oriented((g + 4 * m).toLong)) <= 2,
        s"group $g member $m must collide after normalization")
    val plain = Multimodal.imageDHash(media)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // member 1 of group 0 carries orientation 2 (mirror): plain hash far off
    assert(ham(plain(0L), plain(4L)) > 8,
      "without normalization the rotated twin must NOT collide (else the fixture proves nothing)")
  }

  test("exif coverage: raw classes separate ok/missing/malformed; progressive+EXIF composes; oversize SOF2 gets its own bucket") {
    import graft.operators.{JpegCodec, Multimodal}
    val jpeg = JpegCodec.encodeGray(16, 16, Array.fill(256)(128))
    // raw classifier: the three classes the m7c card counts
    assert(Multimodal.exifOrientationRaw(Multimodal.withExifOrientation(jpeg, 6)) == 6)
    assert(Multimodal.exifOrientationRaw(jpeg) == 0, "no APP1 → missing")
    val corrupt = Multimodal.withExifOrientation(jpeg, 6).clone()
    corrupt(14) = 0; corrupt(15) = 0 // zero the TIFF magic (both orders)
    assert(Multimodal.exifOrientationRaw(corrupt) == -1, "bad TIFF magic → malformed")
    assert(Multimodal.exifOrientation(corrupt) == 1, "…and the hint still degrades upright")

    // m4e composition: progressive members (id%3==1) re-encode SOF2
    // with the APP1 re-spliced — oriented hashes still collide in-group
    val ids = spark.range(0, 16).select(col("id").as("doc_id"))
    val mix = Multimodal.syntheticJpegExifProgressiveMix(ids, _ % 4, _ / 4)
    val byId = mix.collect().map(r => r.doc_id -> r.payload).toMap
    for (id <- byId.keys if id % 3 == 1) {
      assert(Multimodal.jpegSofClass(byId(id)) == "sof2_progressive", s"id=$id")
      assert(Multimodal.exifOrientation(byId(id)) == 1 + (id / 4) % 8,
        s"id=$id: APP1 must survive the progressive re-encode")
    }
    val oriented = Multimodal.imageDHashOriented(mix)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(oriented.size == 16, "every mixed payload must decode")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (g <- 0 until 4; m <- 1 until 4)
      assert(ham(oriented(g.toLong), oriented((g + 4 * m).toLong)) <= 2,
        s"group $g member $m must collide across baseline/progressive storage")

    // m7c card closed form on the coverage mix (group %4, member /4)
    val card = Multimodal.jpegOrientationCard(
        Multimodal.syntheticJpegExifCoverageMix(
          spark.range(0, 40).select(col("id").as("doc_id")), _ % 4, _ / 4))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)) -> r.getLong(3))
      .toMap
    val expect = (0L until 40L).groupBy { id =>
      val cls = (id % 5) match { case 3 => "missing"; case 4 => "malformed"; case _ => "ok" }
      val o = if (id % 5 == 3 || id % 5 == 4) 1L else 1L + (id / 4) % 8
      (cls, o, true)
    }.map { case (k, v) => k -> v.size.toLong }
    assert(card == expect, s"card=$card expect=$expect")

    // a conforming progressive frame past the coefficient-buffer cap
    // buckets as oversize (degraded for SIZE, not corruption)
    val big = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xc2.toByte,
      0, 11, 8, 0x10, 0x01, 0x10, 0, 1, 1, 0x11, 0) // 4097h × 4096w, 1 comp
    assert(Multimodal.jpegSofClass(big) == "sof2_progressive_oversize")
    assert(JpegCodec.decodeGray(big).isEmpty, "oversize progressive must degrade")
    assert(Multimodal.jpegSofClass(
      Multimodal.syntheticJpegSofMix(ids).filter(col("doc_id") === 1)
        .collect()(0).payload) == "sof2_progressive",
      "in-cap progressive keeps the plain bucket")
  }

  test("jpeg SOF coverage card: baseline and real-progressive payloads decode; re-marked payloads take the counted degrade path") {
    import graft.operators.{JpegCodec, Multimodal}
    val ids = spark.range(0, 140).select(col("id").as("doc_id"))
    val card = Multimodal.jpegSofCard(Multimodal.syntheticJpegSofMix(ids))
      .collect().map(r => (r.getString(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    // 140 docs: doc_id%7==1 → 20 REAL progressive (must decode),
    // %7==3 → 20 re-marked SOF2 over a baseline scan (corrupt — must
    // degrade), %7==5 → 20 re-marked arithmetic (must degrade),
    // 80 untouched baseline — decoded tracks conformance, not just
    // the SOF family
    assert(card == Map(
      ("sof0_baseline", true) -> 80L,
      ("sof2_progressive", true) -> 20L,
      ("sof2_progressive", false) -> 20L,
      ("sof_arithmetic", false) -> 20L), s"got $card")
    // classifier unit edges: fill bytes before the marker are legal
    // (B.1.1.2); a non-JPEG container and a scan-before-SOF are 'none'
    val base = JpegCodec.encodeGray(16, 16, Array.fill(256)(128))
    val padded = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++ base.drop(2)
    assert(Multimodal.jpegSofClass(base) == "sof0_baseline")
    assert(Multimodal.jpegSofClass(padded) == "sof0_baseline")
    assert(Multimodal.jpegSofClass(Multimodal.wavBytesPcm(8000, 1, Array.fill(8)(1.toShort))) == "none")
  }

  test("avi mjpeg container: frames round-trip byte-exact; malformed payloads degrade to None") {
    import graft.operators.{JpegCodec, Multimodal}
    val rnd = new java.util.Random(13L)
    val frames = (0 until 3).map { _ =>
      JpegCodec.encodeGray(16, 16, Array.fill(256)(rnd.nextInt(256)))
    }
    val avi = Multimodal.aviMjpegBytes(16, 16, frames)
    val back = Multimodal.aviMjpegFrames(avi).get
    assert(back.size == 3)
    back.zip(frames).foreach { case (a, b) =>
      assert(a.sameElements(b), "movi chunk payloads must round-trip byte-exact")
    }
    // every extracted frame is itself a decodable JPEG
    back.foreach(f => assert(JpegCodec.decodeGray(f).isDefined))
    // odd-length frame payloads exercise the word-alignment pad
    val odd = Multimodal.aviMjpegBytes(16, 16, Seq(Array[Byte](1, 2, 3)))
    assert(Multimodal.aviMjpegFrames(odd).get.head.sameElements(Array[Byte](1, 2, 3)))
    // degrade paths: WAV is RIFF but not AVI; truncated movi; no frames
    assert(Multimodal.aviMjpegFrames(Multimodal.wavBytesPcm(8000, 1,
      Array.fill(100)(5.toShort))).isEmpty)
    assert(Multimodal.aviMjpegFrames(avi.take(avi.length / 2)).isEmpty)
    assert(Multimodal.aviMjpegFrames(avi.take(20)).isEmpty)
    assert(Multimodal.aviMjpegFrames("RIFFxxxxAVI ".getBytes).isEmpty)
    // the container sniffer reads avih dims (and never confuses the
    // two RIFF forms)
    assert(Multimodal.parseDims(avi) == Some(("video/avi", 16, 16)))
    assert(Multimodal.parseDims(Multimodal.wavBytesPcm(8000, 2,
      Array.fill(10)(1.toShort))).get._1 == "audio/wav")
    // a crafted payload nesting LISTs thousands deep (sizes all
    // consistent, so the walk genuinely descends) must degrade — a
    // stack overflow would KILL the task, not degrade it
    def u32le(v: Int) = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()
    var nested = Array.empty[Byte]
    (0 until 4000).foreach { _ =>
      nested = "LIST".getBytes ++ u32le(4 + nested.length) ++
        "movi".getBytes ++ nested
    }
    val deep = "RIFF".getBytes ++ u32le(4 + nested.length) ++
      "AVI ".getBytes ++ nested
    assert(Multimodal.aviMjpegFrames(deep).isEmpty)
  }

  test("long clips sample 16 evenly-spaced frames: frame_idx stays under videoDupPairs' stride, no in-plan abort") {
    import graft.operators.{JpegCodec, Multimodal}
    // a 1-second real-world clip: 25 frames > the 16-frame cap that
    // previously pushed frame_idx past videoDupPairs' stride guard and
    // ABORTED the job (raise_error in-plan) — the degrade contract says
    // bounded sample, never kill
    val nF = 25
    def clip(seed: Long): Array[Byte] = {
      val frames = (0 until nF).map { fi =>
        val rnd = new java.util.Random(seed * 1000 + fi)
        JpegCodec.encodeGray(18, 16, Array.fill(18 * 16)(rnd.nextInt(256)))
      }
      Multimodal.aviMjpegBytes(18, 16, frames)
    }
    val media = Seq((0L, clip(7L), "video/avi"), (1L, clip(7L), "video/avi"),
      (2L, clip(8L), "video/avi"))
      .map { case (id, p, m) => Multimodal.MediaRow(id, p, m) }
      .toDS()
    val hashes = Multimodal.videoFrameHashesReal(media)
    val rows = hashes.as[(Long, Long, Long)].collect()
    assert(rows.count(_._1 == 0L) == 16, "a 25-frame clip must emit exactly 16 sampled frames")
    assert(rows.forall(_._2 < 16L), "sample indices must stay under the default stride")
    // offsets are frameSampleMeta's floor(i·n/k): identical clips sample
    // identical frames, so the pair survives with all 16 aligned
    val pairs = Multimodal.videoDupPairs(hashes, 3, 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L, 16L)),
      s"identical long clips must pair on all 16 sampled frames, got $pairs")
    // ≤ 16 frames keeps the old exact behavior (natural indices)
    val short = Seq(Multimodal.MediaRow(9L, Multimodal.aviMjpegBytes(18, 16,
      (0 until 4).map { fi =>
        val rnd = new java.util.Random(fi)
        JpegCodec.encodeGray(18, 16, Array.fill(18 * 16)(rnd.nextInt(256)))
      }), "video/avi")).toDS()
    assert(Multimodal.videoFrameHashesReal(short).as[(Long, Long, Long)]
      .collect().map(_._2).sorted.toSeq == Seq(0L, 1L, 2L, 3L))
    CacheScope.releaseAll()
  }

  test("multi-stream AVIs keep only stream 00; crafted ≥2³¹ avih dims degrade to None") {
    import graft.operators.Multimodal
    val f0 = Array[Byte](1, 2, 3, 4)
    val f1 = Array[Byte](5, 6, 7, 8)
    val avi = Multimodal.aviMjpegBytes(16, 16, Seq(f0, f1))
    // patch the SECOND frame chunk's id '00dc' -> '01dc' (a second
    // video stream): its frames must not interleave into stream 00's
    // frame_idx sequence
    def findChunk(b: Array[Byte], payload: Array[Byte]): Int =
      b.indices.find(i => i + 8 + payload.length <= b.length &&
        b(i) == '0' && b(i + 1) == '0' && b(i + 2) == 'd' && b(i + 3) == 'c' &&
        payload.indices.forall(j => b(i + 8 + j) == payload(j))).get
    val multi = avi.clone()
    multi(findChunk(multi, f1) + 1) = '1'
    val got = Multimodal.aviMjpegFrames(multi).get
    assert(got.size == 1 && got.head.sameElements(f0),
      "stream-01 chunks must be excluded from the frame sequence")
    // '00wb' (audio in stream 00) is likewise not a video frame chunk
    val audio = avi.clone()
    val at = findChunk(audio, f1)
    audio(at + 2) = 'w'; audio(at + 3) = 'b'
    val gotA = Multimodal.aviMjpegFrames(audio).get
    assert(gotA.size == 1 && gotA.head.sameElements(f0))
    // crafted avih dims ≥ 2³¹ (u32 on the wire) would go negative via
    // toInt and poison mediaDimsCard's orientation/extrema aggregates
    val huge = avi.clone()
    val avihAt = huge.indices.find(i => huge(i) == 'a' && huge(i + 1) == 'v' &&
      huge(i + 2) == 'i' && huge(i + 3) == 'h').get
    java.util.Arrays.fill(huge, avihAt + 8 + 32, avihAt + 8 + 36, 0xff.toByte)
    assert(Multimodal.parseDims(huge).isEmpty,
      "out-of-range dims must degrade (unknown), not flow negative into cards")
    CacheScope.releaseAll()
  }

  test("fft kernel: impulse, pure tone, and Parseval all check out") {
    import graft.operators.Multimodal
    val n = 256
    // impulse at 0 → flat spectrum (every bin re=1, im=0)
    val re = new Array[Double](n); val im = new Array[Double](n)
    re(0) = 1.0
    Multimodal.fft(re, im)
    assert(re.forall(v => math.abs(v - 1.0) < 1e-9) && im.forall(v => math.abs(v) < 1e-9))
    // cosine at bin 8 → energy only at bins 8 and n-8 (each N/2)
    val re2 = Array.tabulate(n)(i => math.cos(2 * math.Pi * 8 * i / n))
    val im2 = new Array[Double](n)
    Multimodal.fft(re2, im2)
    val mag = re2.indices.map(k => re2(k) * re2(k) + im2(k) * im2(k))
    assert(math.abs(mag(8) - n * n / 4.0) < 1e-6 && math.abs(mag(n - 8) - n * n / 4.0) < 1e-6)
    (0 until n).filter(k => k != 8 && k != n - 8)
      .foreach(k => assert(mag(k) < 1e-9, s"leakage at bin $k: ${mag(k)}"))
    // Parseval on noise: Σ|x|² = (1/N)·Σ|X|²
    val rnd = new java.util.Random(5L)
    val x = Array.fill(n)(rnd.nextDouble() * 2 - 1)
    val re3 = x.clone(); val im3 = new Array[Double](n)
    Multimodal.fft(re3, im3)
    val tEnergy = x.map(v => v * v).sum
    val fEnergy = re3.indices.map(k => re3(k) * re3(k) + im3(k) * im3(k)).sum / n
    assert(math.abs(tEnergy - fEnergy) < 1e-6 * tEnergy)
  }

  test("spectral audio fingerprint: in-group edits stay inside simhash band 0; cross-group spectra are far") {
    import graft.operators.Multimodal
    val ids = spark.range(0, 291).select(col("id").as("doc_id"))
    val fps = Multimodal.audioSpectralFingerprint(Multimodal.syntheticAudio(ids))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps.size == 291, "every 4160-frame PCM clip must fingerprint")
    for (g <- 0 until 97) {
      val x = fps(g.toLong) ^ fps(g + 97L)
      assert(java.lang.Long.bitCount(x) <= 4,
        s"group $g even/odd spectral hamming ${java.lang.Long.bitCount(x)} > 4")
      assert((x & ~0xfL) == 0L,
        s"group $g: the window-0 edit may only move bits 0..3, got ${x.toBinaryString}")
    }
    val cross = for (g <- 0 until 96) yield
      java.lang.Long.bitCount(fps(g.toLong) ^ fps(g + 1L))
    assert(cross.forall(_ > 4), s"cross-group spectral hamming min ${cross.min} must exceed the gate")
    // a clip shorter than 4096 frames yields no spectral row (m5's
    // time-energy path is the fallback fingerprint, not a stub)
    val short = Multimodal.wavBytesPcm(8000, 1, Array.fill(1000)(7.toShort))
    assert(Multimodal.wavPcmMono(short).flatMap(Multimodal.audioSpectralFp(_)).isEmpty)
  }

  test("frame sampling: k evenly-spaced offsets inside the decoded frame count") {
    val feats = Multimodal.extractFeatures(Multimodal.syntheticMedia(
      docs.withColumn("n_chars", length(col("text")).cast("long"))))
    val got = Multimodal.frameSampleMeta(feats, 4).collect()
    assert(got.length == 5 * 4) // k rows per media row
    got.foreach { r =>
      val nFrames = r.getAs[Long]("n_frames")
      val idx = r.getAs[Long]("frame_idx")
      val off = r.getAs[Long]("frame_offset")
      assert(off == math.floor(idx * nFrames / 4.0).toLong)
      assert(off >= 0 && off < math.max(nFrames, 1))
    }
  }

  test("fixed-size sample plans as TakeOrderedAndProject, not a global sort") {
    import graft.operators.Sampling
    val rows = (0L until 5000L).map(i => (i, s"r$i")).toDF("doc_id", "v")
    val df = rows.select(col("doc_id"), Sampling.bucket(col("doc_id")).as("bucket"))
      .orderBy(col("bucket"), col("doc_id")).limit(50)
    assert(df.count() == 50)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"fixed-size sample should be a partial top-K, got:\n${plan.take(500)}")
  }

  test("packing: two-level prefix sum equals the naive global running sum") {
    val rows = spark.range(0, 500)
      .select(col("id").as("doc_id"), (pmod(col("id") * 37 + 11, lit(90)) + 1).as("toks"))
    val got = Packing.pack(rows, col("doc_id"), col("toks"), budget = 256, buckets = 7)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // naive oracle on the driver: exclusive prefix sum / budget
    val toks = rows.orderBy("doc_id").as[(Long, Long)].collect()
    var run = 0L
    val want = toks.map { case (id, t) => val p = run / 256; run += t; (id, t, p) }
    assert(got.toSeq == want.toSeq)
    // bucket count must not affect the result (order-preserving decomposition)
    val one = Packing.pack(rows, col("doc_id"), col("toks"), budget = 256, buckets = 1)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(one.toSeq == got.toSeq)
  }

  test("packing: packs are consecutive-id runs and only the last doc straddles") {
    val rows = spark.range(0, 300)
      .select(col("id").as("doc_id"), (pmod(col("id") * 13 + 5, lit(40)) + 1).as("toks"))
    val got = Packing.pack(rows, col("doc_id"), col("toks"), budget = 100, buckets = 5)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._3).toSeq == got.map(_._3).sorted.toSeq) // nondecreasing in id order
    got.groupBy(_._3).foreach { case (_, ds) =>
      // pack total without its last (straddling) doc stays under budget
      assert(ds.map(_._2).sum - ds.last._2 < 100)
    }
  }

  test("sharding: manifest counts + hashes are partition-layout independent") {
    val df = docs
    val m1 = Sharding.manifest(df, col("doc_id"), col("text"), 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val m2 = Sharding.manifest(df.repartition(7), col("doc_id"), col("text"), 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(m1.toSeq == m2.toSeq)
    assert(m1.map(_._2).sum == df.count())
    m1.foreach { case (sid, _, h) =>
      assert(sid >= 0 && sid < 4); assert(h >= 0 && h < Sharding.HashMod)
    }
  }

  test("sharding: two write runs produce byte-identical manifests and one sorted file per shard") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards_").toString
    val big = spark.range(0, 1000)
      .select(col("id").as("doc_id"), concat(lit("doc "), col("id")).as("text"))
    Sharding.write(big, col("doc_id"), col("text"), 8, s"$dir/run1")
    Sharding.write(big.repartition(13), col("doc_id"), col("text"), 8, s"$dir/run2")
    val b1 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/run1/MANIFEST.json"))
    val b2 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/run2/MANIFEST.json"))
    assert(java.util.Arrays.equals(b1, b2), "manifests must be byte-identical across runs")
    // exactly one parquet file per shard directory, content sorted by key
    (0 until 8).foreach { sid =>
      val files = new java.io.File(s"$dir/run1/data/shard_id=$sid")
        .listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"shard $sid should be exactly one file")
      val ids = spark.read.parquet(files.head.getPath).select("doc_id").as[Long].collect()
      assert(ids.toSeq == ids.sorted.toSeq, s"shard $sid not sorted by key")
    }
    // shard contents round-trip: union of shards == input
    val back = spark.read.parquet(s"$dir/run1/data").select("doc_id").as[Long].collect()
    assert(back.sorted.toSeq == (0L until 1000L).toSeq)
  }

  test("product quantization: deterministic codebook, m codes per vector from seed ids") {
    import graft.operators.Clustering
    import graft.sources.Tables
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cb1 = Clustering.pqTrain(e, m = 8, k = 4, iters = 2)
    val cb2 = Clustering.pqTrain(e, m = 8, k = 4, iters = 2)
    val rows1 = cb1.orderBy("sub", "cid").collect().map(_.toString)
    assert(rows1.toSeq == cb2.orderBy("sub", "cid").collect().map(_.toString).toSeq,
      "codebook must be bit-identical across runs")
    assert(cb1.count() == 32) // 8 subspaces × 4 centroids

    val codes = Clustering.pqAssign(e, cb1)
    val n = e.count()
    assert(codes.count() == n * 8, "m codes per vector")
    // codes are the per-subspace seed cids (the 4 smallest vec_ids)
    val seedIds = e.select("vec_id").orderBy("vec_id").limit(4)
      .as[Long].collect().toSet
    val used = codes.select("code").distinct().as[Long].collect().toSet
    assert(used.subsetOf(seedIds))
  }

  test("pq reconstruction carries signal: self-cosine beats cross-cosine") {
    import graft.operators.{Clustering, Similarity}
    import graft.sources.Tables
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cb = Clustering.pqTrain(e)
    val rec = Clustering.pqReconstruct(Clustering.pqAssign(e, cb), cb)
    assert(rec.count() == e.count())
    assert(rec.select(size(col("embedding"))).distinct().as[Int].collect().toSeq == Seq(64))
    val joined = e.select(col("vec_id"), col("embedding").as("ov"))
      .join(rec.select(col("vec_id"), col("embedding").as("rv")), "vec_id")
    def cos(a: String, b: String) =
      Similarity.dot(col(a), col(b)) /
        (sqrt(Similarity.dot(col(a), col(a))) * sqrt(Similarity.dot(col(b), col(b))))
    val selfCos = joined.select(avg(cos("ov", "rv"))).as[Double].head()
    // cross pairing: each original vs the NEXT vector's reconstruction
    val crossCos = joined.alias("x").join(joined.alias("y"),
        col("x.vec_id") + 1 === col("y.vec_id"))
      .select(avg(Similarity.dot(col("x.ov"), col("y.rv")) /
        (sqrt(Similarity.dot(col("x.ov"), col("x.ov"))) *
         sqrt(Similarity.dot(col("y.rv"), col("y.rv")))))).as[Double].head()
    assert(selfCos > crossCos,
      s"reconstruction must resemble its own vector (self=$selfCos cross=$crossCos)")
  }

  test("ADC scoring ≡ scoring against reconstructions: same ranking, same math") {
    import graft.operators.{Clustering, Similarity}
    import graft.sources.Tables
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cells = Clustering.kmeansAssign(e, 4, 1)
      .select(col("vec_id"), col("cid").as("cell"))
    val cb = Clustering.pqTrain(e)
    val rec = Clustering.pqReconstruct(Clustering.pqAssign(e, cb), cb)
    val asym = Similarity.topKIvfAsym(
      e.join(cells, Seq("vec_id")), rec.join(cells, Seq("vec_id")), "cell", 3)
    val adc = Similarity.topKIvfPq(
      e.join(cells, Seq("vec_id")), Clustering.pqAssign(e, cb), cb, cells, 3)
    def triples(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)].collect().toSet
    assert(triples(adc) == triples(asym),
      "ADC must rank exactly as full-vector reconstruction scoring")
    // cosines agree to float-association tolerance (the subspace-ordered
    // fold vs the 64-term fold reassociate the same real-number sum)
    val maxDelta = adc.select(col("query_id"), col("neighbor_id"), col("cosine").as("a"))
      .join(asym.select(col("query_id"), col("neighbor_id"), col("cosine").as("b")),
        Seq("query_id", "neighbor_id"))
      .select(max(abs(col("a") - col("b")))).as[Double].head()
    assert(maxDelta < 1e-9, s"ADC vs reconstruct cosine drift: $maxDelta")
  }

  test("logistic regression: deterministic across runs, learns past the majority baseline") {
    import graft.operators.Learning
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val label = (col("label") < 5).cast("double")
    // bit-identical retrain (no RNG; fixed-point sums kill order effects)
    val w1 = Learning.logregTrain(e, col("embedding"), label, 64, 10, 2.0)
    val w2 = Learning.logregTrain(e, col("embedding"), label, 64, 10, 2.0)
    assert(w1 == w2 && w1.length == 65)
    // the gate separates: train accuracy comfortably above the majority
    // baseline (untrained w = all-zero scores 0.5 everywhere = baseline)
    val scored = Learning.classifierGate(e, col("embedding"), col("vec_id"), w1, 0.5)
      .select(col("vec_id")).as[Long].collect().toSet
    val truth = e.filter(col("label") < 5).select(col("vec_id")).as[Long].collect().toSet
    val all = e.select(col("vec_id")).as[Long].collect().toSet
    val correct = (scored & truth).size + ((all -- scored) & (all -- truth)).size
    val acc = correct.toDouble / all.size
    val base = math.max(truth.size, all.size - truth.size).toDouble / all.size
    assert(acc >= 0.6 && acc > base,
      s"classifier must beat the majority baseline: acc=$acc base=$base")
  }

  test("paragraph dedup: first instance wins, docs reassemble in order, empty docs vanish") {
    import graft.operators.NearDup
    val docs = Seq(
      (1L, "alpha|boiler|omega"),   // all first instances → intact
      (2L, "boiler|beta|boiler"),   // boiler seen in doc 1; within-doc dup too
      (3L, "alpha|omega"),          // nothing new → disappears entirely
      (4L, "beta|gamma|beta")       // beta seen in doc 2; gamma survives
    ).toDF("doc_id", "text")
    val got = NearDup.paragraphDedup(docs, col("doc_id"), col("text"), "|")
      .orderBy("doc_id")
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, "alpha|boiler|omega"),
      (2L, 1L, "beta"),
      (4L, 1L, "gamma")))
    // the separator is treated literally even when it's a regex metachar
    val rx = Seq((1L, "a.+b|x"), (2L, "a.+b|y")).toDF("doc_id", "text")
    val got2 = NearDup.paragraphDedup(rx, col("doc_id"), col("text"), "|")
      .orderBy("doc_id").as[(Long, Long, String)].collect().toSeq
    assert(got2 == Seq((1L, 2L, "a.+b|x"), (2L, 1L, "y")))
  }

  test("incremental dedup: batch admits only content new vs corpus and within-batch") {
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again"),
      (101L, "totally original corpus content nothing like the others at all")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (200L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup of corpus
      (201L, "the quick brown fox jumps over the lazy dog again and again today"), // near dup of corpus
      (202L, "entirely fresh new content about completely different things here"),
      (203L, "entirely fresh new content about completely different things here"), // exact dup within batch
      (204L, "short text")
    ).toDF("doc_id", "text")
    val got = graft.operators.NearDup.incremental(
      corpus, batch, col("doc_id"), col("text"), 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(202L, 204L))
  }

  test("mixture: kept counts track target proportions, bottleneck kept whole, unweighted dropped") {
    import graft.operators.Sampling
    import graft.sources.Tables
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val w = Map("en" -> 5L, "de" -> 2L, "fr" -> 2L, "zh" -> 1L)
    val kept = Sampling.mixture(docs, col("doc_id"), col("lang"), w)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(!kept.contains("es"), "unweighted stratum must be dropped")
    // bottleneck (smallest n/w) keeps every row
    val n = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val bottleneck = w.keys.minBy(s => (n(s).toDouble / w(s), s))
    assert(kept(bottleneck) == n(bottleneck))
    // achieved proportions within md5-bucket sampling noise of targets
    val unit = kept(bottleneck).toDouble / w(bottleneck)
    w.foreach { case (s, wt) =>
      val expect = unit * wt
      assert(math.abs(kept(s) - expect) <= math.max(5.0, expect * 0.25),
        s"$s kept=${kept(s)} want≈$expect")
    }
    // deterministic: same rows on rerun
    val again = Sampling.mixture(docs, col("doc_id"), col("lang"), w)
      .select("doc_id").as[Long].collect().toSet
    assert(again == Sampling.mixture(docs, col("doc_id"), col("lang"), w)
      .select("doc_id").as[Long].collect().toSet)
  }

  test("blocklistGate: exact boundary, any-hit mode, pure map") {
    import graft.operators.TextOps
    val df = Seq(
      (0L, "clean words only here"),                  // 0 hits / 4
      (1L, "bad one ok ok ok ok ok ok ok ok"),        // 1 hit / 10 = 100‰, boundary
      (2L, "bad bad bad ok"),                         // 750‰
      (3L, "ok bad ok ok ok ok ok ok ok ok ok")       // 1/11 < 100‰
    ).toDF("doc_id", "text")
    val kept100 = TextOps.blocklistGate(df, col("text"), Seq("bad"), 100L)
      .select("doc_id").as[Long].collect().toSet
    assert(kept100 == Set(0L, 1L, 3L), "1000·1 == 100·10 must KEEP (<=, not <)")
    val kept0 = TextOps.blocklistGate(df, col("text"), Seq("bad"), 0L)
      .select("doc_id").as[Long].collect().toSet
    assert(kept0 == Set(0L), "permille 0 = C4 any-hit drop")
    val plan = TextOps.blocklistGate(df, col("text"), Seq("bad"), 0L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "gate must be a pure map")
  }

  test("linkHosts: canonicalizes case/www, splits on path/query/fragment") {
    import graft.operators.TextOps
    val df = Seq(
      (0L, "x https://WWW.Foo.ORG/a?q=1 y http://foo.org#frag"),
      (1L, "see http://www.bar.net/p and https://bar.net/q plus https://sub.www.bar.net/")
    ).toDF("doc_id", "text")
    val got = TextOps.linkHosts(df, col("doc_id"), col("text"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("foo.org", 2L, 1L), ("bar.net", 2L, 1L), ("sub.www.bar.net", 1L, 1L)),
      s"got $got") // only a LEADING www. strips; inner labels survive
  }

  test("jlProject: shuffle-free pure map, deterministic signs, JL distance preservation") {
    import graft.operators.Projection
    import graft.sources.Tables
    val e = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val proj = Projection.jlProject(e, col("vec_id"), col("embedding"), 64, 16)
    // pure map + explode: no exchange anywhere in the physical plan
    val plan = proj.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
    // sign matrix is balanced-ish (md5 parity) and stable across calls
    val signs = for (i <- 0 until 64; j <- 0 until 16) yield Projection.sign(i, j)
    assert(math.abs(signs.sum) < 200, "signs should be near-balanced")
    assert(Projection.sign(3, 7) == Projection.sign(3, 7))
    // JL property: projected distances track original distances within
    // the sign-matrix tolerance for d_out=16 on a sample of pairs
    // (ratio = ||Rx - Ry||²/(d_out·||x - y||²) concentrates near 1)
    val rows = e.limit(20).select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val pm = proj.filter(col("vec_id").isin(rows.map(_._1): _*))
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getLong(1)).map(_.getLong(2).toDouble / 1e6)
      }
    val ratios = for (a <- rows.indices; b <- 0 until a) yield {
      val (ia, va) = rows(a); val (ib, vb) = rows(b)
      val d2 = va.zip(vb).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
      val p2 = pm(ia).zip(pm(ib)).map { case (x, y) => (x - y) * (x - y) }.sum
      p2 / (16.0 * d2)
    }
    val mean = ratios.sum / ratios.size
    assert(mean > 0.7 && mean < 1.3, s"JL mean distortion $mean out of range")
  }

  test("temperatureMixture: bottleneck whole, ratios compressed toward sqrt, monotone in n") {
    import graft.operators.Sampling
    import graft.sources.Tables
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val n = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val kept = Sampling.temperatureMixture(docs, col("doc_id"), col("lang"))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val bottleneck = n.keys.minBy(s => (n(s), s))
    assert(kept(bottleneck) == n(bottleneck), "smallest stratum must be kept whole")
    // every stratum's kept count tracks sqrt-proportional targets:
    // kept_s ≈ nb/sqrt(nb) * sqrt(n_s) within md5-bucket noise
    val unit = n(bottleneck) / math.sqrt(n(bottleneck))
    n.foreach { case (s, ns) =>
      val expect = unit * math.sqrt(ns)
      assert(math.abs(kept(s) - expect) <= math.max(5.0, expect * 0.25),
        s"$s kept=${kept(s)} want≈$expect")
      assert(kept(s) <= ns)
    }
    // the α < 1 compression property: kept shares are strictly flatter
    // than raw shares for the largest vs smallest stratum
    val big = n.keys.maxBy(s => (n(s), s))
    assert(kept(big).toDouble / kept(bottleneck) < n(big).toDouble / n(bottleneck))
  }

  test("epochs: copy counts hit the permille recipe, epochs dense from 0, monotone in rate") {
    import graft.operators.Sampling
    import graft.sources.Tables
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val rates = Map("en" -> 1300L, "de" -> 2500L, "fr" -> 700L, "zh" -> 2000L)
    val out = Sampling.epochs(docs.select("doc_id", "lang"), col("doc_id"), col("lang"), rates)
    val perDoc = out.groupBy("doc_id", "lang").count().as[(Long, String, Long)].collect()
    assert(perDoc.nonEmpty)
    // every doc's copy count is floor(rate/1000) or floor(rate/1000)+1
    perDoc.foreach { case (id, lang, n) =>
      val r = rates(lang)
      assert(n == r / 1000 || n == r / 1000 + 1, s"doc $id ($lang): $n copies under rate $r")
    }
    // aggregate copies track the recipe within md5-bucket noise
    val n0 = docs.filter(col("lang").isin(rates.keys.toSeq: _*))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val copies = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    rates.foreach { case (s, r) =>
      val expect = n0(s) * r / 1000.0
      assert(math.abs(copies(s) - expect) <= math.max(5.0, expect * 0.25),
        s"$s copies=${copies(s)} want≈$expect")
    }
    // unlisted stratum dropped; epochs dense 0..n-1 per doc
    assert(out.filter(col("lang") === "es").isEmpty)
    val maxE = out.groupBy("doc_id").agg(
      max("epoch").as("m"), count(lit(1)).as("n"))
      .filter(col("m") =!= col("n") - 1)
    assert(maxE.isEmpty, "epoch numbering must be dense from 0")
    // monotone fractional selection: the 1.3x run's second-copy docs are
    // a subset of the 1.5x run's (same md5 bucket, higher threshold)
    def extra(r: Long) = Sampling.epochs(docs.select("doc_id", "lang"),
        col("doc_id"), col("lang"), Map("zh" -> r))
      .filter(col("epoch") === 1).select("doc_id").as[Long].collect().toSet
    val (e13, e15) = (extra(1300L), extra(1500L))
    assert(e13.subsetOf(e15) && e13.size < e15.size,
      s"fractional-epoch selection must be monotone in rate (${e13.size} vs ${e15.size})")
  }

  test("boilerplateFilter: corpus-frequent paragraphs drop everywhere, within-doc repeats survive") {
    val df = Seq(
      (1L, "COOKIE BANNER|unique one|body body"),
      (2L, "COOKIE BANNER|unique two"),
      (3L, "COOKIE BANNER|body body|body body"),   // own repeat: df=2 but doc-freq 2 only via doc 1
      (4L, "COOKIE BANNER"),                       // all boilerplate → drops out
      (5L, "COOKIE BANNER|unique five")
    ).toDF("doc_id", "text")
    // banner df=5 ≥ 3 → dropped everywhere; "body body" df=2 < 3 → kept (both copies in doc 3)
    val got = TextOps.boilerplateFilter(df, col("doc_id"), col("text"), "|", 3)
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 2L, "unique one|body body"), (2L, 1L, "unique two"),
      (3L, 2L, "body body|body body"), (5L, 1L, "unique five")))
  }

  test("funnel: strict in-order progression, same-timestamp events don't double-count") {
    import graft.streaming.EventStream
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val ev = Seq(
      (1L, "view", ts(0)), (1L, "click", ts(5)), (1L, "purchase", ts(10)), // full funnel
      (2L, "view", ts(0)), (2L, "click", ts(5)),                           // stops at click
      (3L, "click", ts(0)), (3L, "view", ts(5)), (3L, "purchase", ts(10)), // click BEFORE view → no click stage
      (4L, "view", ts(0)), (4L, "click", ts(0)),                           // same ts: strict > excludes
      (5L, "purchase", ts(0))                                              // never viewed
    ).toDF("user_id", "event_type", "ts")
    val got = EventStream.funnel(ev, Seq("view", "click", "purchase"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    // view: users 1,2,3,4; click after view: 1,2; purchase after that click: 1
    assert(got.toSeq == Seq((1L, "view", 4L), (2L, "click", 2L), (3L, "purchase", 1L)))
  }

  test("annRecall: per-query hit counts against ground truth, misses count zero") {
    val truth = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L), (3L, 30L))
      .toDF("query_id", "neighbor_id")
    val approx = Seq((1L, 10L), (1L, 12L), (1L, 99L), (2L, 77L), (2L, 78L), (3L, 30L))
      .toDF("query_id", "neighbor_id")
    val got = Similarity.annRecall(truth, approx)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // query 1: 2/3 hit; query 2: 0/2 (approx returned wrong ids); query 3: 1/1
    assert(got.toSeq == Seq((1L, 3L, 2L), (2L, 2L, 0L), (3L, 1L, 1L)))
  }

  test("globalRank ≡ the naive single window, ties broken by id, percentiles exact") {
    import graft.operators.Ranking
    import org.apache.spark.sql.expressions.Window
    // heavy ties (score = id mod 7) exercise tie-break + bucket boundaries
    val rows = spark.range(0, 1000)
      .select(col("id"), pmod(col("id") * 13, lit(7)).as("score"))
    val got = Ranking.globalRank(rows, col("id"), col("score"), buckets = 16)
    val naive = rows.select(col("id"), col("score"),
      row_number().over(Window.orderBy("score", "id")).cast("long").as("rank"))
      .withColumn("pct_permille", expr("((rank - 1) * 1000) DIV 1000"))
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty,
      "two-level rank must be bit-identical to the single-window formulation")
    // dense 1..N, percentile bounds
    val n = got.count()
    assert(got.agg(min("rank"), max("rank"), countDistinct("rank")).as[(Long, Long, Long)]
      .head() == ((1L, n, n)))
    assert(got.agg(min("pct_permille"), max("pct_permille")).as[(Long, Long)].head()._2 < 1000L)
  }

  test("globalRank survives a score span wider than Long (overflow-safe bucketing)") {
    import graft.operators.Ranking
    // max - min overflows Long here; the raw-subtraction bucket formula
    // would mis-bucket and break the order-preserving property silently
    val rows = Seq(
      (1L, Long.MinValue + 10), (2L, -1000000L), (3L, 0L),
      (4L, 1000000L), (5L, Long.MaxValue - 10)).toDF("id", "score")
    val got = Ranking.globalRank(rows, col("id"), col("score"))
      .select("id", "rank").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L), (5L, 5L)))
  }

  test("rankRows keeps NULL-score rows with rank NULL (r18 advice fix)") {
    import graft.operators.Ranking
    val rows = Seq((1L, Some(30L)), (2L, None), (3L, Some(10L)), (4L, None),
      (5L, Some(20L))).toDF("id", "score")
    val got = Ranking.rankRows(rows, col("score"), Seq(col("id")))
      .select(col("id"), col("rank")).as[(Long, Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, Some(3L)), (2L, None), (3L, Some(1L)),
      (4L, None), (5L, Some(2L))),
      "NULL scores must stay as rows with rank NULL, not vanish; " +
        "non-null ranks count only non-null rows")
    // the all-NULL path keeps its historical shape: every row, rank NULL
    val allNull = Ranking.rankRows(
      Seq((1L, Option.empty[Long]), (2L, None)).toDF("id", "score"),
      col("score"), Seq(col("id")))
    assert(allNull.count() == 2 && allNull.filter(col("rank").isNull).count() == 2)
  }

  test("shard append rejects a numShards that disagrees with the export's record") {
    import graft.operators.Sharding
    val dir = java.nio.file.Files.createTempDirectory("shard_modulus").toString
    val big = spark.range(0, 100)
      .select(col("id").as("doc_id"), concat(lit("doc "), col("id")).as("text"))
    Sharding.write(big, col("doc_id"), col("text"), 4, dir)
    val e = intercept[IllegalArgumentException] {
      Sharding.append(big, col("doc_id"), col("text"), 8, dir)
    }
    assert(e.getMessage.contains("recorded"))
    // a bare data dir (no SHARDS.json) is rejected too — the modulus
    // cannot be validated, so appending to it is never safe
    new java.io.File(s"$dir/SHARDS.json").delete()
    val e2 = intercept[IllegalArgumentException] {
      Sharding.append(big, col("doc_id"), col("text"), 4, dir)
    }
    assert(e2.getMessage.contains("SHARDS.json"))
  }

  test("mergeSegments validates by default (overlap caught without opting in)") {
    import graft.operators.Retrieval
    val corpus = Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text")
    val seg = Retrieval.postingsIndex(corpus, col("doc_id"), col("text"))
    val e = intercept[IllegalArgumentException] {
      Retrieval.mergeSegments(Seq(seg, seg)).count()
    }
    assert(e.getMessage.contains("segments overlap"))
    CacheScope.releaseAll()
  }

  test("snapshotDiff: four statuses, null-safe content compare, carry coalesces new-over-old") {
    import graft.operators.Profiling
    val oldV = Seq(
      (1L, "same text", "web"),        // unchanged
      (2L, "old text", "web"),         // changed
      (3L, "gone", "books"),           // removed
      (5L, null.asInstanceOf[String], "web"),  // null → null: unchanged
      (6L, null.asInstanceOf[String], "web")   // null → text: changed
    ).toDF("doc_id", "text", "source")
    val newV = Seq(
      (1L, "same text", "web"),
      (2L, "new text", "wiki"),        // source moved too: carry picks new
      (4L, "fresh", "wiki"),           // added
      (5L, null.asInstanceOf[String], "web"),
      (6L, "now present", "web")
    ).toDF("doc_id", "text", "source")
    val got = Profiling.snapshotDiff(oldV, newV, "doc_id", "text", Seq("source"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, "unchanged", "web"), (2L, "changed", "wiki"), (3L, "removed", "books"),
      (4L, "added", "wiki"), (5L, "unchanged", "web"), (6L, "changed", "web")))
  }

  test("pii scrub: emails, phones, and id runs redacted in order; clean text stays clean") {
    val df = Seq(
      (1L, "reach me at jane.doe+spam@corp.example.org or 555-123-4567 thanks"),
      (2L, "account 12345678901 and card 9876543210987654 on file"),
      (3L, "nothing sensitive here just words"),
      (4L, "two mails a@b.co c.d@e.io and short digits 12345678")
    ).toDF("doc_id", "text")
    val got = TextOps.scrubPii(df, col("doc_id"), col("text"))
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 1L, 1L, "reach me at <EMAIL> or <PHONE> thanks")))
    assert(got(1) == ((2L, 0L, 0L, "account <ID> and card <ID> on file")))
    assert(got(2) == ((3L, 0L, 0L, "nothing sensitive here just words")))
    // 8-digit run is below the 9-digit id threshold — kept
    assert(got(3) == ((4L, 2L, 0L, "two mails <EMAIL> <EMAIL> and short digits 12345678")))
  }

  test("chunking: overlapped windows cover every token, short tail kept, provenance intact") {
    val text = (1 to 300).map(i => s"w$i").mkString(" ")
    val df = Seq((7L, text)).toDF("doc_id", "text")
    val got = TextOps.chunk(df, col("doc_id"), col("text"), chunkTokens = 128, overlap = 16)
      .as[(Long, Long, Long, String)].collect().sortBy(_._2)
    // starts at 0, 112, 224 → 3 chunks; last one is short (300-224=76)
    assert(got.map(_._2).toSeq == Seq(0L, 1L, 2L))
    assert(got.map(_._3).toSeq == Seq(128L, 128L, 76L))
    // consecutive chunks overlap by exactly 16 tokens
    val c0 = got(0)._4.split(" "); val c1 = got(1)._4.split(" ")
    assert(c0.takeRight(16).toSeq == c1.take(16).toSeq)
    // every token appears in some chunk
    assert(got.flatMap(_._4.split(" ")).toSet == text.split(" ").toSet)
    // empty doc yields no chunks rather than throwing
    assert(TextOps.chunk(Seq((8L, "one two")).toDF("doc_id", "text"), col("doc_id"), col("text"))
      .count() == 1)
  }

  test("shard append: incremental manifest ≡ full recompute; old files untouched; O(batch)") {
    import graft.operators.Sharding
    val dir = java.nio.file.Files.createTempDirectory("shard_append").toString
    val df = docs
    val first = df.filter(col("doc_id") % 10 =!= 0)
    val batch = df.filter(col("doc_id") % 10 === 0)
    Sharding.write(first, col("doc_id"), col("text"), 4, dir)
    val filesBefore = new java.io.File(s"$dir/data").listFiles()
      .filter(_.isDirectory).flatMap(_.listFiles()).map(f => f.getPath -> f.lastModified()).toMap
    val incr = Sharding.append(batch, col("doc_id"), col("text"), 4, dir)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // incremental arithmetic == writing the whole corpus at once
    val fullDir = java.nio.file.Files.createTempDirectory("shard_full").toString
    val full = Sharding.write(df, col("doc_id"), col("text"), 4, fullDir)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(incr == full)
    // the verifier agrees the manifest matches the appended bytes
    val status = Sharding.verify(spark, dir, col("doc_id"), col("text"))
    assert(status.filter(col("status") =!= "ok").count() == 0)
    // pre-existing shard files were neither rewritten nor deleted
    filesBefore.foreach { case (p, ts) =>
      val f = new java.io.File(p)
      assert(f.exists() && f.lastModified() == ts, s"old shard file touched: $p")
    }
  }

  test("shard verify: clean export is all ok; a rewritten shard is caught by hash, not count") {
    import graft.operators.Sharding
    val dir = java.nio.file.Files.createTempDirectory("graft_verify_").toString
    val big = spark.range(0, 400)
      .select(col("id").as("doc_id"), concat(lit("doc "), col("id")).as("text"))
    Sharding.write(big, col("doc_id"), col("text"), 4, dir)
    val ok = Sharding.verify(spark, dir, col("doc_id"), col("text"))
    assert(ok.filter(col("status") =!= "ok").count() == 0)
    // tamper: rewrite shard 2 with same ids but altered content
    val tampered = big.filter(Sharding.shardId(col("doc_id"), 4) === 2)
      .withColumn("text", concat(col("text"), lit("!")))
    tampered.coalesce(1).write.mode("overwrite").parquet(s"$dir/data/shard_id=2")
    val bad = Sharding.verify(spark, dir, col("doc_id"), col("text"))
      .filter(col("shard_id") === 2).select("status").as[String].collect()
    assert(bad.toSeq == Seq("hash_mismatch"))
  }

  test("repetition metrics: counts, ratios, and single-token edge") {
    val d = Seq((1L, "a a a b"), (2L, "x"), (3L, "p q p q p q")).toDF("doc_id", "text")
    val got = TextOps.repetition(d, col("doc_id"), col("text"))
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Long, Double, Long, Double)].collect()
    // doc 1: 4 tokens, 2 distinct, top token "a"×3, bigrams {a a, a a, a b} → top 2
    assert(got(0) == ((1L, 4L, 2L, 0.5, 3L, 0.75, 2L, 2.0 / 3)))
    // doc 2: single token → no bigrams, frac pinned to 0.0 (not null/NaN)
    assert(got(1) == ((2L, 1L, 1L, 1.0, 1L, 1.0, 0L, 0.0)))
    // doc 3: "p q" repeats 3× in 5 bigrams
    assert(got(2)._7 == 3L && got(2)._8 == 0.6)
  }

  test("split: disjoint+exhaustive labels, content-stable under corpus growth") {
    import graft.operators.Sampling
    val full = spark.range(0, 2000).select(col("id").as("doc_id"))
    val labeled = Sampling.split(full, col("doc_id"), 100, 100)
    val counts = labeled.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.values.sum == 2000)
    // md5 buckets are close to uniform: train ≈ 80%, val/test ≈ 10% each
    assert(counts("train") > 1500 && counts("val") > 100 && counts("test") > 100)
    // determinism + stability: a doc's split in a subset corpus equals its
    // split in the full corpus (labels are content-keyed, never re-dealt)
    val sub = Sampling.split(full.filter(col("doc_id") < 500), col("doc_id"), 100, 100)
    val joined = sub.as("a").join(labeled.as("b"), "doc_id")
      .filter(col("a.split") =!= col("b.split"))
    assert(joined.count() == 0)
    // re-splitting labeled data fails fast instead of silently replacing
    intercept[IllegalArgumentException] {
      Sampling.split(labeled, col("doc_id"), 100, 100)
    }
  }

  test("semanticDedup: drops any vector with a smaller within-cell neighbor") {
    val vs = Seq(
      (1L, Array(1.0f, 0.0f), 0L),   // survives (smallest in cell 0)
      (2L, Array(1.0f, 0.01f), 0L),  // cos(1,2)≈1 → dropped
      (3L, Array(0.0f, 1.0f), 0L),   // orthogonal to 1 and 2 → survives
      (4L, Array(1.0f, 0.02f), 1L),  // other cell: survives despite cos≈1 vs 1/2
      (5L, Array(1.0f, 0.03f), 1L)   // dropped by 4 (same cell)
    ).toDF("vec_id", "embedding", "cell")
    val got = Similarity.semanticDedup(vs, "cell", 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(got == Set(1L, 3L, 4L))
  }

  test("multimodal resize: aspect-preserving fit, never upscales") {
    val feats = Multimodal.extractFeatures(Multimodal.asMedia(docs))
    val out = Multimodal.resizeMeta(feats, 32)
      .as[(Long, String, Int, Int, Int, Int)].collect()
    out.foreach { case (_, _, w, h, ow, oh) =>
      assert(ow <= 32 && oh <= 32)
      assert(ow <= w && oh <= h) // never upscale
      // aspect preserved within floor rounding
      if (w >= h) assert(ow >= oh) else assert(oh >= ow)
    }
  }

  test("bm25 df cap drops stopword query terms; segment merge validation catches overlap") {
    import graft.operators.Retrieval
    val corpus = Seq(
      (0L, "stop apple"), (1L, "stop banana"), (2L, "stop cherry"), (3L, "stop date"))
      .toDF("doc_id", "text")
    val queries = Seq((1L, "stop apple")).toDF("q_id", "q_text")
    // "stop" is in 4/4 docs; capped at 50% only "apple" scores → 1 candidate
    val capped = Retrieval.bm25(corpus, col("doc_id"), col("text"), queries,
      maxDfRatio = Some(0.5))
    assert(capped.select("doc_id").as[Long].collect().toSeq == Seq(0L))
    val uncapped = Retrieval.bm25(corpus, col("doc_id"), col("text"), queries)
    assert(uncapped.count() == 4)
    // overlapping segments (same docs twice) must be rejected by validate
    val seg = Retrieval.postingsIndex(corpus, col("doc_id"), col("text"))
    val e = intercept[IllegalArgumentException] {
      Retrieval.mergeSegments(Seq(seg, seg), validate = true).count()
    }
    assert(e.getMessage.contains("segments overlap"))
    CacheScope.releaseAll()
  }

  test("rrf fusion: both-system hits beat single-system hits; ranks combine reciprocally") {
    import graft.operators.Retrieval
    val a = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("q_id", "doc_id", "rank")
    val b = Seq((1L, 11L, 1L), (1L, 12L, 2L)).toDF("q_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(a, b)
      .select("doc_id", "score", "rank").as[(Long, Long, Long)].collect()
      .sortBy(_._3)
    def p(r: Long) = math.round(1e9 / (60 + r))
    // doc 11 ranked by both (2nd + 1st) outranks doc 10 (1st in one only)
    assert(got.map(_._1).toSeq == Seq(11L, 10L, 12L))
    assert(got.map(_._2).toSeq == Seq(p(2) + p(1), p(1), p(2)))
  }

  test("table profile: null counts, exact distincts, native-order min/max") {
    import graft.operators.Profiling
    val df = Seq((1L, Option("b"), 10), (2L, None, 9), (3L, Option("a"), 100))
      .toDF("id", "s", "n")
    val p = Profiling.profile(df, Seq("s", "n"))
      .as[(String, Long, Long, String, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(p("s") == ((1L, 2L, "a", "b")))
    // native numeric order: max is 100, not the lexicographic "9"
    assert(p("n") == ((0L, 3L, "9", "100")))
  }

  test("cdc chunk dedup: shared boilerplate survives only in the first doc") {
    import org.apache.spark.sql.expressions.Window
    val boiler = (1 to 60).map(i => s"b${i % 13}q${i % 7}").mkString(" ")
    val corpus = Seq(
      (0L, boiler + " unique zero content"),
      (1L, boiler + " totally different tail")
    ).toDF("doc_id", "text")
    val ck = TextOps.cdcChunk(corpus, col("doc_id"), col("text"))
    val w = Window.partitionBy(col("chunk_hash")).orderBy(col("doc_id"), col("chunk_id"))
    val kept = ck.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    val counts = kept.groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    val orig = ck.groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    // doc 0 keeps everything; doc 1 loses its interior boilerplate chunks
    assert(counts(0L) == orig(0L))
    assert(counts(1L) < orig(1L))
  }

  test("vocab drift: exact cross-multiplied ranking matches a rational-arithmetic reference") {
    val corpus = Seq(
      (true, "x x x x y common common"),
      (true, "x y common common"),
      (false, "z z z y common common"),
      (false, "z y common common")
    ).toDF("a", "text")
    val got = TextOps.vocabDrift(corpus, col("text"), col("a"), topK = 2)
      .select("token").as[String].collect().toSet
    // reference: tot_a=11, tot_b=10; drifts ×(11·10): x |5·10-0|=50,
    // z |0-5·11|=55, y |2·10-2·11|=2, common |4·10-4·11|=4 → top2 {z, x}
    assert(got == Set("z", "x"))
  }

  test("cdc chunking: chunks reassemble the doc; an early edit leaves later chunk hashes intact") {
    val base = (1 to 200).map(i => s"w${i % 37}x${i % 11}").mkString(" ")
    val edited = "INSERTED " + base
    val both = Seq((0L, base), (1L, edited)).toDF("doc_id", "text")
    val chunks = TextOps.cdcChunk(both, col("doc_id"), col("text"))
      .select("doc_id", "chunk_id", "chunk_text", "chunk_hash")
      .as[(Long, Long, String, String)].collect()
    // chunks reassemble each document exactly (lowercased)
    val re = chunks.groupBy(_._1).map { case (d, cs) =>
      d -> cs.sortBy(_._2).map(_._3).mkString(" ")
    }
    assert(re(0L) == base.toLowerCase)
    assert(re(1L) == edited.toLowerCase)
    // content-defined boundaries: the tail of the edited doc re-finds
    // the original boundaries, so most original chunk hashes survive
    val h0 = chunks.filter(_._1 == 0L).map(_._4).toSet
    val h1 = chunks.filter(_._1 == 1L).map(_._4).toSet
    val survived = h0.intersect(h1).size.toDouble / h0.size
    assert(survived > 0.7,
      s"expected most chunk hashes to survive a 1-token prefix edit, got $survived")
  }

  test("bm25: scores match a serial reference; only query-term-sharing docs are candidates") {
    import graft.operators.Retrieval
    val corpus = Seq(
      (0L, "apple banana cherry"),
      (1L, "apple apple apple date"),
      (2L, "banana date elderberry fig grape"),
      (3L, "no shared terms here at all")
    ).toDF("doc_id", "text")
    val queries = Seq((1L, "apple banana")).toDF("q_id", "q_text")
    val got = Retrieval.bm25(corpus, col("doc_id"), col("text"), queries)
      .select("q_id", "doc_id", "score").as[(Long, Long, Long)].collect()
      .map(r => (r._2, r._3)).toMap
    assert(!got.contains(3L)) // shares no term → never scored
    // serial reference with the identical expression tree + fixed-point
    val docs = Map(0L -> Seq("apple", "banana", "cherry"),
      1L -> Seq("apple", "apple", "apple", "date"),
      2L -> Seq("banana", "date", "elderberry", "fig", "grape"),
      3L -> Seq("no", "shared", "terms", "here", "at", "all"))
    val nDocs = docs.size.toDouble
    val avgdl = docs.values.map(_.size).sum.toDouble / docs.size
    def dfOf(t: String) = docs.values.count(_.contains(t)).toDouble
    val expect = Seq(0L, 1L, 2L).map { d =>
      val tks = docs(d)
      d -> Seq("apple", "banana").flatMap { t =>
        val tf = tks.count(_ == t).toDouble
        if (tf == 0) None
        else Some(math.round(
          (nDocs / dfOf(t)) * ((tf * 2.2) /
            (tf + 1.2 * (0.25 + 0.75 * tks.size / avgdl))) * 1e6))
      }.sum
    }.toMap
    assert(got == expect)
  }

  test("inverted index: postings ordered and block-bounded, df is corpus-wide") {
    import graft.operators.Retrieval
    val corpus = (0L until 6L).map(i => (i, s"common unique$i")).toDF("doc_id", "text")
    val idx = Retrieval.postingsIndex(corpus, col("doc_id"), col("text"), blockWidth = 2)
      .as[(String, Long, Long, String, Long)].collect()
    val common = idx.filter(_._1 == "common").sortBy(_._2)
    // 6 docs over width-2 blocks → 3 groups of exactly 2: the skew bound
    assert(common.map(r => (r._2, r._3, r._4)).toSeq ==
      Seq((0L, 2L, "0:1,1:1"), (1L, 2L, "2:1,3:1"), (2L, 2L, "4:1,5:1")))
    assert(common.forall(_._5 == 6L)) // df is corpus-wide, not per-block
    assert(idx.filter(_._1 == "unique3").toSeq == Seq(("unique3", 1L, 1L, "3:1", 1L)))
  }

  test("segmented builds: tf-slice ≡ filtered-docs build; skeleton counts ≡ stacked index rows (r19)") {
    import graft.operators.Retrieval
    val corpus = (0L until 8L).map(i => (i, s"common w$i x${i % 3}")).toDF("doc_id", "text")
    // one tokenize pass, sliced per batch — must equal the per-batch build
    val tf = Retrieval.termFrequencies(corpus, col("doc_id"), col("text"))
    val viaSlice = Retrieval.postingsIndexFromTf(tf.filter(col("doc_id") < 4), 2)
      .as[(String, Long, Long, String, Long)].collect().toSet
    val viaFilter = Retrieval.postingsIndex(
      corpus.filter(col("doc_id") < 4), col("doc_id"), col("text"), 2)
      .as[(String, Long, Long, String, Long)].collect().toSet
    assert(viaSlice == viaFilter)
    // skeleton row counts per segment ≡ stacked full builds' row counts
    val segId = when(col("doc_id") < 4, 0L).otherwise(1L)
    val skel = Retrieval.segmentSkeleton(corpus, col("doc_id"), col("text"), segId, 2)
      .groupBy("segment_id").count().as[(Long, Long)].collect().toMap
    val stacked = Seq((0L, 0L, 4L), (1L, 4L, 8L)).map { case (sid, lo, hi) =>
      sid -> Retrieval.postingsIndex(
        corpus.filter(col("doc_id") >= lo && col("doc_id") < hi),
        col("doc_id"), col("text"), 2).count()
    }.toMap
    assert(skel == stacked)
    graft.CacheScope.releaseAll()
  }

  test("diversity cap: per-cell cap enforced, md5-order picks match a serial reference") {
    import graft.operators.Sampling
    val rows = (0L until 30L).map(i => (i, i % 3)).toDF("vec_id", "cell")
    val got = Sampling.diversityCap(rows, col("vec_id"), col("cell"), 4)
      .select("vec_id", "cell").as[(Long, Long)].collect().toSet
    assert(got.size == 12) // 3 cells × cap 4
    // serial reference: same md5-hex ordering per cell
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) = md.digest(s.getBytes).map("%02x".format(_)).mkString
    val expect = (0L until 30L).groupBy(_ % 3).flatMap { case (c, ids) =>
      ids.sortBy(i => (hex(i.toString), i)).take(4).map(i => (i, c))
    }.toSet
    assert(got == expect)
  }

  test("lm coverage gate: hits count reference-bigram instances; short docs pass vacuously") {
    import graft.operators.LmFilter
    val corpus = Seq(
      (0L, "the cat sat on the mat"),
      (1L, "the cat sat again"),
      (2L, "zq xv qqq"), // shares no bigram with the reference
      (3L, "single")     // no bigrams at all
    ).toDF("doc_id", "text")
    // hand-built reference: two bigrams
    val ref = Seq("the cat", "cat sat").toDF("bg")
    val got = LmFilter.coverageGate(corpus, col("doc_id"), col("text"), ref)
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got(0) == ((0L, 5L, 2L, false)))  // 2 of 5 covered → dropped
    assert(got(1) == ((1L, 3L, 2L, true)))   // 2 of 3 covered → kept
    assert(got(2) == ((2L, 2L, 0L, false)))
    assert(got(3) == ((3L, 0L, 0L, true)))   // vacuous pass, zero bigrams
    // refBigrams tie-break: count desc then lexicographic, stable top-V
    val r = LmFilter.refBigrams(corpus, col("doc_id"), col("text"), 3, minScore = 0.0)
      .as[String].collect().toSeq
    assert(r.size == 3)
    assert(r.contains("the cat")) // appears twice — must survive any top-3
  }

  test("bpe: learned merges match a serial reference implementation") {
    import graft.operators.Bpe
    val corpus = Seq(
      (0L, "low low low low low lower lower newest newest newest"),
      (1L, "newest newest newest widest widest widest low lowest")
    ).toDF("doc_id", "text")
    val (merges, fin) = Bpe.learn(Bpe.wordCounts(corpus, col("text")), 5)

    // independent serial reference: greedy left-to-right merge application
    def mergeOnce(syms: List[String], l: String, r: String): List[String] = {
      val b = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          b += (l + r); i += 2
        } else { b += syms(i); i += 1 }
      }
      b.toList
    }
    val words0: Map[String, Long] = corpus.as[(Long, String)].collect()
      .flatMap(_._2.toLowerCase.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    var vocab: Map[String, (List[String], Long)] =
      words0.map { case (w, f) => w -> (w.map(_.toString).toList, f) }
    val expect = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    for (_ <- 1 to 5) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((_, (syms, f)) <- vocab; Seq(a, b) <- syms.sliding(2) if syms.size >= 2)
        counts((a, b)) = counts.getOrElse((a, b), 0L) + f
      val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
      expect += ((l, r, c))
      vocab = vocab.map { case (w, (syms, f)) => w -> (mergeOnce(syms, l, r), f) }
    }
    assert(merges.map(m => (m.l, m.r, m.cnt)) == expect.toSeq)
    // token vocab totals: every word's frequency × its surviving symbol
    // count, summed — conservation of token mass
    val gotTotal = Bpe.tokenVocab(fin).agg(sum("freq")).as[Long].head()
    val expTotal = vocab.values.map { case (syms, f) => syms.length * f }.sum
    assert(gotTotal == expTotal)
    CacheScope.releaseAll()
  }

  test("bpe: checkpointed training (small interval) equals uncheckpointed merges") {
    import graft.operators.Bpe
    val corpus = Seq(
      (0L, "low low low lower lower newest newest newest widest widest"),
      (1L, "lowest newest low widest wider new")
    ).toDF("doc_id", "text")
    val wc = Bpe.wordCounts(corpus, col("text"))
    val (a, _) = Bpe.learn(wc, 12, checkpointEvery = 3)
    val (b, _) = Bpe.learn(wc, 12, checkpointEvery = 1000)
    assert(a == b, "lineage checkpointing must not change the learned merges")
    CacheScope.releaseAll()
  }

  test("bpe encoded lengths: zero merges = char counts, merges shorten sequences") {
    import graft.operators.Bpe
    val corpus = Seq((0L, "low low lower"), (1L, "low")).toDF("doc_id", "text")
    val wc = Bpe.wordCounts(corpus, col("text"))
    val (_, v0) = Bpe.learn(wc, 0)
    val raw = Bpe.encodedLengths(corpus, col("doc_id"), col("text"), v0)
      .select("doc_id", "n_bpe_tokens").as[(Long, Long)].collect().toMap
    assert(raw == Map(0L -> 11L, 1L -> 3L)) // low(3)+low(3)+lower(5); low(3)
    val (_, v4) = Bpe.learn(wc, 4)
    val enc = Bpe.encodedLengths(corpus, col("doc_id"), col("text"), v4)
      .select("doc_id", "n_bpe_tokens").as[(Long, Long)].collect().toMap
    assert(enc(0L) < raw(0L) && enc(1L) < raw(1L),
      "learned merges must shorten every doc containing merged words")
    CacheScope.releaseAll()
  }

  test("canonicalUrl: fragment, www, host case, tracking params, trailing slash") {
    val cases = Seq(
      // host lowered + www stripped, path case KEPT, utm + fragment gone
      "https://WWW.Example.ORG/Path/?utm_source=x&id=1#frag" ->
        "https://example.org/Path/?id=1",
      // bare trailing slash dropped; scheme's // untouched
      "http://example.com/" -> "http://example.com",
      // tracking-only query collapses entirely, then the slash drops
      "https://example.com/a/?utm_a=1" -> "https://example.com/a",
      // mid-query tracker removed with separator repair
      "https://example.com/p?x=2&utm_b=3" -> "https://example.com/p?x=2",
      "https://example.com/p?fbclid=abc&y=1" -> "https://example.com/p?y=1",
      // boundary-anchored (ADVICE r9): a param merely ENDING in a tracked
      // name is NOT a tracker and must survive intact
      "https://example.com/p?myfbclid=1&x=2" -> "https://example.com/p?myfbclid=1&x=2",
      // consecutive trackers collapse in one anchored match
      "https://example.com/p?utm_a=1&utm_b=2&x=3" -> "https://example.com/p?x=3",
      "https://example.com/p?x=1&utm_a=2&gclid=3" -> "https://example.com/p?x=1")
    val got = cases.map(_._1).toDF("url")
      .select(TextOps.canonicalUrl(col("url")).as("c")).as[String].collect()
    got.zip(cases).foreach { case (g, (in, want)) =>
      assert(g == want, s"canonicalUrl($in)") }
  }

  test("phraseSearch: exact alignment, overlapping matches, repeated terms") {
    import graft.operators.Retrieval
    val docs = Seq((0L, "a b a b a"), (1L, "a a a"), (2L, "b b"))
      .toDF("doc_id", "text")
    val qs = Seq((1L, "a b"), (2L, "a a")).toDF("q_id", "q_text")
    val r = Retrieval.phraseSearch(docs, col("doc_id"), col("text"), qs)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(r((1L, 0L)) == 2L, "'a b' occurs at anchors 0 and 2 in doc 0")
    assert(r((2L, 1L)) == 2L, "'a a' overlaps: anchors 0 and 1 in doc 1")
    assert(!r.contains((2L, 0L)), "doc 0 has no consecutive 'a a'")
    assert(!r.contains((1L, 2L)), "doc 2 has no 'a' at all")
    CacheScope.releaseAll()
  }

  test("pagerank: integer-exact, deterministic, in-link authority orders hosts") {
    import graft.operators.Graph
    // b has two in-links, a one (from b's whole rank), c none
    val e = Seq(("a", "b"), ("c", "b"), ("b", "a")).toDF("src", "dst")
    def run() = Graph.pagerank(e, 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val r = run()
    assert(r.keySet == Set("a", "b", "c"))
    assert(r("b") > r("a") && r("a") > r("c"),
      s"authority order violated: $r")
    // dangling c holds exactly the damping base — dropped mass, no noise
    assert(r("c") > 0L)
    // bit-for-bit repeatable: integer arithmetic has no ordering freedom
    assert(r == run())
    // duplicate edges must not double-count
    val dup = Seq(("a", "b"), ("a", "b"), ("c", "b"), ("b", "a")).toDF("src", "dst")
    assert(Graph.pagerank(dup, 3).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap == r)
    CacheScope.releaseAll()
  }

  test("hits: exact hub/authority on a hand-checked graph, dup edges collapse") {
    import graft.operators.Graph
    // star-ish graph: a→c, b→c, c→a. Hand-unrolled (h0 = 1):
    //   a1: c=2 (from a,b), a=1 (from c), b=0
    //   h1: a=a1(c)=2, b=a1(c)=2, c=a1(a)=1
    //   a2: c=h1(a)+h1(b)=4, a=h1(c)=1, b=0
    //   h2: a=a2(c)=4, b=a2(c)=4, c=a2(a)=1
    val e = Seq(("a", "c"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    def run() = Graph.hits(e, 2).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val r = run()
    assert(r == Map("a" -> (4L, 1L), "b" -> (4L, 0L), "c" -> (1L, 4L)), s"got $r")
    // bit-for-bit repeatable; duplicate edges must not double-count
    assert(r == run())
    val dup = Seq(("a", "c"), ("a", "c"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    assert(Graph.hits(dup, 2).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap == r)
    CacheScope.releaseAll()
  }

  test("groupRank matches the single-window formulation per stratum") {
    import graft.operators.Ranking
    import org.apache.spark.sql.expressions.Window
    // duplicate scores across 3 strata, small bucket count so bucket
    // boundaries and offsets are genuinely exercised
    val df = (0 until 200).map(i =>
      (s"g${i % 3}", i.toLong, ((i * 37) % 41).toLong)).toDF("g", "id", "sc")
    val got = Ranking.groupRank(df, col("g"), col("id"), col("sc"), buckets = 7)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(3), r.getLong(4))).toMap
    val w = Window.partitionBy("g").orderBy("sc", "id")
    val want = df
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
      .withColumn("pct", expr("((rank - 1) * 1000) DIV n"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(3), r.getLong(5))).toMap
    assert(got == want)
    CacheScope.releaseAll()
  }

  test("bpe: consecutive occurrences merge left-to-right non-overlapping") {
    import graft.operators.Bpe
    // "aaaa" with merge (a,a) must become "aa aa", not "aa a a" or "aaa a"
    val corpus = Seq((0L, "aaaa aaaa")).toDF("doc_id", "text")
    val (merges, fin) = Bpe.learn(Bpe.wordCounts(corpus, col("text")), 2)
    assert(merges.head.l == "a" && merges.head.r == "a")
    // after merge 1: a a a a -> aa aa (left-to-right, not aaa a);
    // merge 2 then joins the two "aa" symbols
    assert(merges(1).l == "aa" && merges(1).r == "aa")
    val syms = fin.select("sym").as[String].head()
    assert(syms == "aaaa")
    CacheScope.releaseAll()
  }

  test("familiarityTerciles: value-based cutoffs, ties share a bucket, tiny langs degrade to head") {
    import graft.operators.LmFilter
    // six 'aa' docs with a clean score ladder: ref slice = the even ids.
    // 'xx' has ONE doc: n=1, both cutoffs = its own score -> 'head'
    // (a language too small to split must not tail-bucket everything).
    val docs = Seq(
      (0L, "aa", "w w w w"), // ref, all common
      (1L, "aa", "w w w w"),
      (2L, "aa", "w w q q"), // ref
      (3L, "aa", "w q q q"),
      (4L, "aa", "q q q q"), // ref
      (5L, "aa", "z z z z"), // all OOV -> 0
      (6L, "xx", "w w")
    ).toDF("doc_id", "lang", "text")
    val out = LmFilter.familiarityTerciles(docs, col("doc_id"), col("text"),
      col("lang"), col("doc_id") % 2 === 0)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    // vocab = {w (ref cnt 6), q (ref cnt 6)} -> identical counts: deciles
    // by (cnt, md5-id); whatever the order, scores rank docs 0/1 (all
    // top-weight or all low) .. monotone in w-share iff w outranks q.
    // Assert structure, not absolute scores: same-score docs share a
    // bucket; buckets are monotone in score; lang 'xx' is head.
    val aa = out.collect { case (id, v) if id <= 5 => (id, v) }
    assert(aa(0L) == aa(1L), "identical docs must share score AND bucket")
    val byScore = aa.values.toSeq.distinct.sortBy(-_._1)
    val order = Map("head" -> 0, "middle" -> 1, "tail" -> 2)
    assert(byScore.map(v => order(v._2)) == byScore.map(v => order(v._2)).sorted,
      s"buckets must be monotone non-increasing in score: $byScore")
    assert(byScore.head._2 == "head" && byScore.last._2 == "tail")
    assert(out(6L)._2 == "head", "a single-doc language is its own head")
    CacheScope.releaseAll()
  }

  test("unimaxAllocation: water-filling caps, equal share, degenerate budgets") {
    import graft.operators.Sampling
    // langs with 10/20/70 tokens (one doc each, token count = word count)
    val docs = Seq(
      (0L, "aa", Seq.fill(10)("w").mkString(" ")),
      (1L, "bb", Seq.fill(20)("w").mkString(" ")),
      (2L, "cc", Seq.fill(70)("w").mkString(" "))
    ).toDF("doc_id", "lang", "text")
    def run(cap: Int, bpm: Int) =
      Sampling.unimaxAllocation(docs, col("lang"),
        size(split(trim(col("text")), "\\s+")), cap, bpm)
        .collect().map(r => r.getString(0) -> (r.getLong(3), r.getBoolean(5))).toMap
    // B = 100, cap 2x: aa capped at 20 (20*3 <= 100), bb capped at 40
    // (40*2 <= 80), cc shares the remaining 40 (< its 140 cap)
    val m = run(2, 1000)
    assert(m == Map("aa" -> (20L, true), "bb" -> (40L, true), "cc" -> (40L, false)))
    // budget above the cap sum: everyone capped, remainder unallocated
    val hi = run(2, 3000) // B = 300 > 200 = cap sum
    assert(hi.values.forall(_._2) && hi.values.map(_._1).sum == 200L)
    // tiny budget: nobody reaches a cap, equal integer shares
    val lo = run(2, 300) // B = 30 -> 10 each (aa's cap = 20 > 10)
    assert(lo == Map("aa" -> (10L, false), "bb" -> (10L, false), "cc" -> (10L, false)))
    CacheScope.releaseAll()
  }

  test("connectedComponentsStar: chains, triangles, pairs land on component minima") {
    import graft.operators.Graph
    // chain 1-2-3-4-5 (diameter 4), triangle 10-11-12, pair 20-21,
    // plus a duplicate and a reversed edge (must collapse)
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (12L, 10L),
      (21L, 20L), (20L, 21L), (21L, 20L)
    ).toDF("src", "dst")
    val out = Graph.connectedComponentsStar(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
    CacheScope.releaseAll()
  }
}
