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
    * checkpoint-the-signatures pattern. */
  def minhashLsh(docs: DataFrame, id: Column, text: Column, threshold: Double): DataFrame = {
    val sigs = minhashSigs(docs, id, text).persist()
    sigs.count()
    jaccardPairs(candidates(bands(sigs)), shingleArrays(docs, id, text))
      .filter(col("jaccard") >= threshold)
  }

  /** 32-bit SimHash per doc — a pure map (one expression per row). */
  def simhash(docs: DataFrame, id: Column, text: Column, bits: Int = 32): DataFrame =
    docs.select(id.as("doc_id"), TextHashExprs.simhashSig(lower(text), bits).as("simhash"))

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist, found via
    * byte-banding (pigeonhole: dist ≤ 3 over 4 bands ⇒ ≥1 band equal) —
    * no all-pairs comparison. */
  def simhashPairs(sig: DataFrame, maxDist: Int = 3): DataFrame = {
    // Persist the banded signatures: both sides of the candidate
    // self-join read them, and without the barrier each side recomputes
    // every per-token signature. 4 small rows per doc — cache is cheap.
    val banded = sig.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * 8).bitwiseAND(255).as("key"))): _*)).as("bs"))
      .select(col("doc_id"), col("simhash"), col("bs.band"), col("bs.key"))
      .persist()
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
      blockCols: Seq[Column], threshold: Double, n: Int = 3): DataFrame = {
    val blkNames = blockCols.indices.map(i => s"blk_$i")
    val base = docs.select(
      id.as("doc_id") +:
        array_distinct(WordShingles.shingles(lower(text), n)).as("sh_set") +:
        blockCols.zip(blkNames).map { case (c, nm) => c.as(nm) }: _*)
    val sh = base.select(
      col("doc_id") +: explode(col("sh_set")).as("sh") +: blkNames.map(col): _*)
    val cnt = base.select(col("doc_id"), size(col("sh_set")).cast("long").as("n_sh"))
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
