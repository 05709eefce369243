package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row native implementations of the token-hash pipelines (MinHash
  * signatures, SimHash, shingle-set Jaccard).
  *
  * The composable formulations (explode → md5 per shingle-row → groupBy
  * with 16/32 aggregates) are correct but shuffle one row per
  * token/shingle and interpret scalar lambdas per element; these
  * expressions do the whole per-document computation in one call with
  * zero shuffle, which is the shape that survives 100 TB: signatures are
  * a pure map over the corpus, and only candidate pairs (orders of
  * magnitude fewer) ever move.
  *
  * Each expression has real `doGenCode` (FloatDotProduct pattern): the
  * generated code calls the static per-row kernels below, so the
  * expressions stay inside WholeStageCodegen spans — no CodegenFallback
  * boxing or per-row virtual eval dispatch.
  *
  * Numeric contract shared with graft.functions.F.portableHash60 and the
  * DuckDB oracle: base(s) = first 15 hex chars of md5(s) as a 60-bit
  * long; minhash h = (aₕ·(base mod P) + bₕ) mod P with P = 2³¹-1.
  */
object TextHash {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 2^31-1 (Mersenne prime) — the modulus of the affine MinHash
    * permutations. Small enough that a·x+b stays < 2^62, so both JVM
    * longs and DuckDB BIGINTs evaluate it exactly (DuckDB errors on
    * 64-bit overflow, so the arithmetic must never approach it). */
  val MersenneP = 2147483647L

  /** Affine permutation parameters for minhash h: x ↦ (aₕ·x + bₕ) mod P.
    * aₕ is never 0 mod P: P is prime, 2654435761 ≢ 0 (mod P), and
    * 2h+1 < P. The same formulas are inlined in the DuckDB oracle SQL. */
  def permA(h: Int): Long = ((2L * h + 1L) * 2654435761L) % MersenneP
  def permB(h: Int): Long = (h * 40503L + 12345L) % MersenneP

  // Memoizes md5-prefix hashes per task thread. Token/shingle streams are
  // Zipfian, so most lookups hit; the cap bounds worst-case heap (the
  // big-heap G1 environment the bench runs in punishes allocation churn).
  private val cacheTL = new ThreadLocal[java.util.HashMap[String, java.lang.Long]] {
    override def initialValue(): java.util.HashMap[String, java.lang.Long] =
      new java.util.HashMap(1 << 14)
  }

  private def md5Prefix60(key: String): Long = {
    val d = md.get()
    d.reset()
    val bytes = d.digest(key.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
    v >>> 4
  }

  private def cachedHash(key: String): Long = {
    val m = cacheTL.get()
    val hit = m.get(key)
    if (hit != null) hit.longValue()
    else {
      val v = md5Prefix60(key)
      if (m.size >= (1 << 17)) m.clear()
      m.put(key, java.lang.Long.valueOf(v))
      v
    }
  }

  def hash60(seed: Int, s: String): Long = cachedHash(seed.toString + "|" + s)

  /** Seedless base hash: first 15 hex chars of md5(s) as a 60-bit long
    * (DuckDB twin: ('0x'||substr(md5(s),1,15))::BIGINT). One digest per
    * shingle; the per-permutation variety is derived arithmetically. */
  def baseHash60(s: String): Long = cachedHash(s)

  def tokens(text: String): Array[String] = text.trim.split("\\s+")

  /** Word n-gram shingles (multiset, in document order). */
  def shingles(text: String, n: Int): Array[String] = {
    val toks = tokens(text)
    if (toks.length < n) Array.empty
    else {
      val out = new Array[String](toks.length - n + 1)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i < out.length) {
        sb.setLength(0)
        var k = 0
        while (k < n) { if (k > 0) sb.append(' '); sb.append(toks(i + k)); k += 1 }
        out(i) = sb.toString
        i += 1
      }
      out
    }
  }

  /** Sliding CHARACTER n-grams by Unicode code point — the shingle unit
    * for space-free scripts (CJK), where whitespace word shingles
    * collapse whole clauses into one token and near-dups become
    * invisible. Code-point (not UTF-16 code-unit) stepping matches
    * DuckDB's substr character semantics for any plane. Fewer than n
    * code points → empty. */
  def charShingles(text: String, n: Int): Array[String] = {
    val cps = text.codePoints().toArray
    if (cps.length < n) Array.empty
    else {
      val out = new Array[String](cps.length - n + 1)
      var i = 0
      while (i < out.length) {
        out(i) = new String(cps, i, n)
        i += 1
      }
      out
    }
  }

  // ---- static per-row kernels, called from generated code ----

  /** Shingle array as Catalyst ArrayData (WordShingles kernel). */
  def shingleKernel(input: UTF8String, n: Int): ArrayData = {
    val sh = shingles(input.toString, n)
    val out = new Array[Any](sh.length)
    var i = 0
    while (i < sh.length) { out(i) = UTF8String.fromString(sh(i)); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** MinHash signature array, or null for docs with < n tokens (matching
    * the oracle, where such docs simply have no shingle rows). Min over
    * the shingle multiset equals min over the distinct set. One md5 per
    * shingle + numHashes affine permutations (the round-1 digest-per-
    * hash-function version was the dominant CPU cost of the bench). */
  def minhashKernel(input: UTF8String, numHashes: Int, n: Int): ArrayData = {
    val sh = shingles(input.toString, n)
    if (sh.isEmpty) null
    else {
      val p = MersenneP
      val mins = Array.fill(numHashes)(Long.MaxValue)
      var i = 0
      while (i < sh.length) {
        val x = baseHash60(sh(i)) % p
        var h = 0
        while (h < numHashes) {
          val v = (permA(h) * x + permB(h)) % p
          if (v < mins(h)) mins(h) = v
          h += 1
        }
        i += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(mins)
    }
  }

  /** Char-shingle array as Catalyst ArrayData (distinct NOT applied —
    * multiset in document order, the [[shingleKernel]] contract). */
  def charShingleKernel(input: UTF8String, n: Int): ArrayData = {
    val sh = charShingles(input.toString, n)
    val out = new Array[Any](sh.length)
    var i = 0
    while (i < sh.length) { out(i) = UTF8String.fromString(sh(i)); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** MinHash signature over CHARACTER n-grams — [[minhashKernel]] with
    * the char shingle unit; same affine permutations and md5 base, so
    * the DuckDB oracle formula carries over verbatim. Null for texts
    * with < n code points. */
  def minhashCharKernel(input: UTF8String, numHashes: Int, n: Int): ArrayData = {
    val sh = charShingles(input.toString, n)
    if (sh.isEmpty) null
    else {
      val p = MersenneP
      val mins = Array.fill(numHashes)(Long.MaxValue)
      var i = 0
      while (i < sh.length) {
        val x = baseHash60(sh(i)) % p
        var h = 0
        while (h < numHashes) {
          val v = (permA(h) * x + permB(h)) % p
          if (v < mins(h)) mins(h) = v
          h += 1
        }
        i += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(mins)
    }
  }

  /** Stride-1 n-token window hashes (the exact-substring family's
    * carrier: dsub1/dsub2/c7/c8): hash i = 60-bit md5 prefix of
    * tokens[i..i+n-1] joined by single spaces — bit-identical to the
    * oracle's ('0x'||substr(md5(...),1,15))::BIGINT — computed in ONE
    * per-row loop. The HOF formulation (slice + array_join + md5 +
    * substring + conv PER WINDOW) built a hex string and re-parsed it
    * for every position; this digests bytes directly (the dHash64
    * lesson). Deliberately UNCACHED: window strings are near-unique
    * (position-shifted), so the Zipfian token cache would only churn.
    * Docs with < n tokens → null (posexplode drops them, matching the
    * composed version's size filter). */
  def windowHashKernel(input: UTF8String, n: Int): ArrayData = {
    val sh = shingles(input.toString, n)
    if (sh.isEmpty) null
    else {
      val out = new Array[Long](sh.length)
      var i = 0
      while (i < sh.length) { out(i) = md5Prefix60(sh(i)); i += 1 }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
    }
  }

  /** SimHash: every token (with multiplicity) votes ±1 per bit position
    * of its hash; bit b of the result is 1 iff the vote sum is positive. */
  def simhashKernel(input: UTF8String, bits: Int, seed: Int): Long = {
    val toks = tokens(input.toString)
    val votes = new Array[Int](bits)
    var i = 0
    while (i < toks.length) {
      val h = hash60(seed, toks(i))
      var b = 0
      while (b < bits) { votes(b) += (((h >>> b) & 1L).toInt * 2) - 1; b += 1 }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** 64-bit SimHash: the md5-prefix token hash is 60 bits, so a full
    * 64-bit signature takes bits 0..59 from hash60(seedLo, tok) and bits
    * 60..63 from the low bits of hash60(seedHi, tok) — both replicable by
    * the DuckDB oracle with the same substr(md5(...)) contract. Every
    * signature bit is a real hash bit (a plain 64-bit vote over a 60-bit
    * hash would leave the top 4 bits always-zero, shrinking the top
    * band's key space 16×). */
  def simhash64Kernel(input: UTF8String, seedLo: Int, seedHi: Int): Long = {
    val toks = tokens(input.toString)
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h1 = hash60(seedLo, toks(i))
      val h2 = hash60(seedHi, toks(i))
      var b = 0
      while (b < 60) { votes(b) += (((h1 >>> b) & 1L).toInt * 2) - 1; b += 1 }
      while (b < 64) { votes(b) += (((h2 >>> (b - 60)) & 1L).toInt * 2) - 1; b += 1 }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** Position-weighted polynomial token fingerprint. */
  def fingerprintKernel(input: UTF8String): Long = {
    val toks = tokens(input.toString)
    var s = 0L
    var i = 0
    while (i < toks.length) {
      s += (hash60(7, toks(i)) % 1000003L) * (i + 1)
      i += 1
    }
    s
  }

  /** Exact distinct-set Jaccard of two shingle arrays; null (boxed) when
    * both sets are empty. */
  def jaccardKernel(a: ArrayData, b: ArrayData): java.lang.Double = {
    def distinct(arr: ArrayData): java.util.HashSet[UTF8String] = {
      val s = new java.util.HashSet[UTF8String](arr.numElements() * 2)
      var i = 0
      while (i < arr.numElements()) { s.add(arr.getUTF8String(i)); i += 1 }
      s
    }
    val sa = distinct(a)
    val sb = distinct(b)
    val na = sa.size
    val nb = sb.size
    if (na + nb == 0) null
    else {
      var inter = 0
      val it = sa.iterator()
      while (it.hasNext) { if (sb.contains(it.next())) inter += 1 }
      java.lang.Double.valueOf(inter.toDouble / (na + nb - inter))
    }
  }
}

/** array<long> of `numHashes` MinHash values over word-`n`-gram shingles;
  * NULL when the document has fewer than n tokens. */
case class MinHashSigs(child: Expression, numHashes: Int, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // < n tokens → null signature

  override protected def nullSafeEval(input: Any): Any =
    TextHash.minhashKernel(input.asInstanceOf[UTF8String], numHashes, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => s"""
       |${ev.value} = graft.plans.TextHash.minhashKernel($in, $numHashes, $n);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(c: Expression): MinHashSigs = copy(child = c)
}

/** 64-bit-packed SimHash signature over whitespace tokens. */
case class SimHashSig(child: Expression, bits: Int, seed: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      TextHash.simhashKernel(input.asInstanceOf[UTF8String], bits, seed))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.plans.TextHash.simhashKernel($in, $bits, $seed);")

  override protected def withNewChildInternal(c: Expression): SimHashSig = copy(child = c)
}

/** Full 64-bit SimHash signature (two 60-bit token hashes; see
  * TextHash.simhash64Kernel). All 64 bits carry hash entropy, so 16-bit
  * band keys draw from the full 65,536-value space. */
case class SimHashSig64(child: Expression, seedLo: Int, seedHi: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      TextHash.simhash64Kernel(input.asInstanceOf[UTF8String], seedLo, seedHi))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.plans.TextHash.simhash64Kernel($in, $seedLo, $seedHi);")

  override protected def withNewChildInternal(c: Expression): SimHashSig64 = copy(child = c)
}

/** Exact Jaccard similarity of two shingle arrays as distinct sets:
  * |A∩B| / (|A|+|B|-|A∩B|); NULL when both sets are empty. */
case class ArrayJaccard(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // both-empty → null

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHash.jaccardKernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("jac")
      s"""
         |java.lang.Double $boxed = graft.plans.TextHash.jaccardKernel($a, $b);
         |${ev.isNull} = $boxed == null;
         |${ev.value} = ${ev.isNull} ? -1.0 : $boxed.doubleValue();
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayJaccard =
    copy(left = l, right = r)
}

/** Position-weighted polynomial token fingerprint: sum over tokens of
  * (hash60(7, tok) mod 1000003) * position(1-based), as a long. */
case class TokenFingerprint(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(TextHash.fingerprintKernel(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.plans.TextHash.fingerprintKernel($in);")

  override protected def withNewChildInternal(c: Expression): TokenFingerprint = copy(child = c)
}

/** Character n-gram shingles by code point (see TextHash.charShingles). */
case class CharShingles(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    TextHash.charShingleKernel(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.plans.TextHash.charShingleKernel($in, $n);")

  override protected def withNewChildInternal(c: Expression): CharShingles = copy(child = c)
}

/** MinHash signature over character n-grams (space-free-script LSH). */
case class MinHashCharSigs(child: Expression, numHashes: Int, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // < n code points → null

  override protected def nullSafeEval(input: Any): Any =
    TextHash.minhashCharKernel(input.asInstanceOf[UTF8String], numHashes, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => s"""
       |${ev.value} = graft.plans.TextHash.minhashCharKernel($in, $numHashes, $n);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(c: Expression): MinHashCharSigs = copy(child = c)
}

/** Stride-1 n-token window hash array (see TextHash.windowHashKernel). */
case class WindowHashSigs(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // < n tokens → null

  override protected def nullSafeEval(input: Any): Any =
    TextHash.windowHashKernel(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => s"""
       |${ev.value} = graft.plans.TextHash.windowHashKernel($in, $n);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(c: Expression): WindowHashSigs = copy(child = c)
}

object TextHashExprs {
  def tokenFingerprint(text: Column): Column =
    ColumnBridge.column(TokenFingerprint(ColumnBridge.expression(text)))
  def windowHashes(text: Column, n: Int): Column =
    ColumnBridge.column(WindowHashSigs(ColumnBridge.expression(text), n))
  def charShingles(text: Column, n: Int): Column =
    ColumnBridge.column(CharShingles(ColumnBridge.expression(text), n))
  def minhashCharSigs(text: Column, numHashes: Int = 16, n: Int = 4): Column =
    ColumnBridge.column(MinHashCharSigs(ColumnBridge.expression(text), numHashes, n))
  def minhashSigs(text: Column, numHashes: Int = 16, n: Int = 3): Column =
    ColumnBridge.column(MinHashSigs(ColumnBridge.expression(text), numHashes, n))
  def simhashSig(text: Column, bits: Int = 32, seed: Int = 99): Column =
    ColumnBridge.column(SimHashSig(ColumnBridge.expression(text), bits, seed))
  def simhashSig64(text: Column, seedLo: Int = 99, seedHi: Int = 98): Column =
    ColumnBridge.column(SimHashSig64(ColumnBridge.expression(text), seedLo, seedHi))
  def arrayJaccard(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayJaccard(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
