package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.F
import graft.operators.NearDup
import graft.plans.TextHash

/** Parity between the native per-row expressions (graft.plans) and the
  * SQL-composable formulations they replaced — the contract that keeps
  * the DuckDB oracle valid. */
class ExprParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("TextHash.hash60 == F.portableHash60 (md5 15-hex-prefix contract)") {
    val samples = Seq("tok", "the quick", "", "ümlaut 漢字", "a|b")
    val viaSql = samples.toDF("s")
      .select((0 until 4).map(seed => F.portableHash60(col("s"), seed)): _*)
      .collect().map(_.toSeq)
    for ((s, i) <- samples.zipWithIndex; seed <- 0 until 4)
      assert(TextHash.hash60(seed, s) == viaSql(i)(seed),
        s"mismatch for '$s' seed $seed")
  }

  test("MinHashSigs == groupBy-min of affine-permuted base hash over shingle rows") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "one two three four five six"),
      (2L, "tiny")
    ).toDF("doc_id", "text")
    val native = NearDup.minhashSigs(docs, col("doc_id"), col("text"), 4)
      .as[(Long, Seq[Long])].collect().toMap
    val p = TextHash.MersenneP
    def perm(h: Int) = {
      val base = conv(substring(md5(col("sh")), 1, 15), 16, 10).cast("long") % p
      (lit(TextHash.permA(h)) * base + lit(TextHash.permB(h))) % p
    }
    val sh = NearDup.shingles(docs, col("doc_id"), col("text"))
    val sqlWay = sh.groupBy(col("doc_id"))
      .agg(min(perm(0)).as("m0"), (1 until 4).map(h => min(perm(h)).as(s"m$h")): _*)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> Seq(r._2, r._3, r._4, r._5)).toMap
    assert(native == sqlWay)
    assert(!native.contains(2L)) // <3 tokens → no signature
  }

  test("WindowHashSigs == composed slice/join/md5/conv per position") {
    val docs = Seq(
      (0L, "a b c d e f g"),
      (1L, "x y z"),
      (2L, "under"), // < n tokens → null
      (3L, "  padded   tokens  here  with   runs ")
    ).toDF("doc_id", "text")
    val native = docs.select(col("doc_id"),
        graft.plans.TextHashExprs.windowHashes(col("text"), 3).as("ws"))
      .as[(Long, Option[Seq[Long]])].collect().toMap
    val composed = docs
      .select(col("doc_id"), graft.functions.F.tokens(col("text")).as("tk"))
      .select(col("doc_id"),
        when(size(col("tk")) >= 3, expr(
          "transform(sequence(0, size(tk) - 3), i -> " +
            "CAST(conv(substring(md5(array_join(slice(tk, i + 1, 3), ' ')), 1, 15), 16, 10) AS LONG))"))
          .as("ws"))
      .as[(Long, Option[Seq[Long]])].collect().toMap
    assert(native == composed)
    assert(native(2L).isEmpty, "< n tokens must yield null")
    assert(native(0L).get.length == 5)
  }

  test("CharShingles: code-point stepping matches substring semantics incl. non-ASCII") {
    val docs = Seq((0L, "abcde"), (1L, "汉字测试文"), (2L, "xy")).toDF("doc_id", "text")
    val native = docs.select(col("doc_id"),
        graft.plans.TextHashExprs.charShingles(col("text"), 3).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(native(0L) == Seq("abc", "bcd", "cde"))
    assert(native(1L) == Seq("汉字测", "字测试", "测试文"))
    assert(native(2L) == Seq.empty, "< n code points must yield empty")
    // the composed substring formulation agrees (DuckDB substr twin)
    val composed = docs.filter(length(col("text")) >= 3)
      .select(col("doc_id"), expr(
        "transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))").as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(composed.forall { case (k, v) => native(k) == v })
  }

  test("MinHashCharSigs == groupBy-min of affine-permuted base hash over char shingles") {
    val docs = Seq((0L, "the quick brown"), (1L, "汉字测试文本内容")).toDF("doc_id", "text")
    val native = docs.select(col("doc_id"),
        graft.plans.TextHashExprs.minhashCharSigs(lower(col("text")), 4, 4).as("s"))
      .as[(Long, Seq[Long])].collect().toMap
    val p = TextHash.MersenneP
    def perm(h: Int) = {
      val base = conv(substring(md5(col("sh")), 1, 15), 16, 10).cast("long") % p
      (lit(TextHash.permA(h)) * base + lit(TextHash.permB(h))) % p
    }
    val sh = docs.select(col("doc_id"),
        explode(graft.plans.TextHashExprs.charShingles(lower(col("text")), 4)).as("sh"))
    val sqlWay = sh.groupBy(col("doc_id"))
      .agg(min(perm(0)).as("m0"), (1 until 4).map(h => min(perm(h)).as(s"m$h")): _*)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> Seq(r._2, r._3, r._4, r._5)).toMap
    assert(native == sqlWay)
  }

  test("NormalizeText: composed/decomposed unify, NFKC folds compatibility forms") {
    import graft.plans.TextNormExpr.normalize
    val composed = "caf\u00e9"    // \u00e9 precomposed
    val decomposed = "cafe\u0301"  // e + combining acute
    val rows = Seq((0L, composed), (1L, decomposed), (2L, "  A   B\tC  "),
      (3L, "\ufb01le"), (4L, null.asInstanceOf[String])).toDF("id", "s")
    val nfc = rows.select(col("id"), normalize(col("s")).as("n"))
      .as[(Long, String)].collect().toMap
    assert(nfc(0L) == nfc(1L) && nfc(0L) == composed) // both canonicalize to the composed bytes
    assert(nfc(2L) == "A B C")                        // ws runs collapse, ends trimmed
    assert(nfc(3L) == "\ufb01le")                     // NFC keeps the fi ligature
    assert(nfc(4L) == null)                           // null passes through
    val nfkc = rows.select(col("id"),
      normalize(col("s"), "NFKC", lower = true).as("n")).as[(Long, String)].collect().toMap
    assert(nfkc(3L) == "file")                        // NFKC folds the ligature, then lowers
    // ASCII fast path is byte-identical to the normalized slow path
    assert(nfc(2L) == "A B C" && nfkc(2L) == "a b c")
  }

  test("GraftExtensions: native expressions callable from plain SQL") {
    import graft.plans.GraftExtensions
    // a shared test JVM can't rebuild its SparkSession with
    // .withExtensions (getOrCreate returns the existing one), so drive
    // the same builders through the registry of an isolated session —
    // production injection is `spark.sql.extensions=graft.plans.GraftExtensions`
    val ext = spark.newSession()
    GraftExtensions.functions.foreach { case (id, info, b) =>
      ext.sessionState.functionRegistry.registerFunction(id, info, b)
    }
    import ext.implicits._
    Seq((0L, "the quick brown fox jumps high"),
      (1L, "the quick brown fox jumps high")).toDF("doc_id", "text")
      .createOrReplaceTempView("ext_docs")
    val row = ext.sql(
      """SELECT graft_simhash64(lower(text)) AS sh,
        |       graft_token_fingerprint(text) AS fp,
        |       size(graft_shingles(lower(text))) AS nsh,
        |       graft_normalize('  Café   x ', 'NFC', true, true) AS norm
        |FROM ext_docs WHERE doc_id = 0""".stripMargin).head()
    // SQL results ≡ the DataFrame-API expressions
    val viaDf = Seq((0L, "the quick brown fox jumps high")).toDF("doc_id", "text")
      .select(graft.plans.TextHashExprs.simhashSig64(lower(col("text"))).as("sh"),
        graft.plans.TextHashExprs.tokenFingerprint(col("text")).as("fp")).head()
    assert(row.getAs[Long]("sh") == viaDf.getAs[Long]("sh"))
    assert(row.getAs[Long]("fp") == viaDf.getAs[Long]("fp"))
    assert(row.getAs[Int]("nsh") == 4) // 6 tokens → 4 trigram shingles
    assert(row.getAs[String]("norm") == "café x")
    // non-literal where a literal is required → analysis-time error
    val e = intercept[Exception] {
      ext.sql("SELECT graft_minhash_sigs(text, doc_id + 1) FROM ext_docs").collect()
    }
    assert(e.getMessage.contains("integer literal") ||
      e.getCause != null && e.getCause.getMessage.contains("integer literal"))
  }

  test("GraftExtensions: custom AGGREGATES callable from plain SQL with GROUP BY") {
    import graft.plans.GraftExtensions
    val ext = spark.newSession()
    GraftExtensions.functions.foreach { case (id, info, b) =>
      ext.sessionState.functionRegistry.registerFunction(id, info, b)
    }
    ext.range(0, 5000, 1, 8)
      .selectExpr("id % 3 AS g", "id % 517 AS v", "CAST(id % 50 AS DOUBLE) AS x")
      .createOrReplaceTempView("ext_agg")
    val viaSql = ext.sql(
      """SELECT g, graft_bitmap_distinct(v, 1024) AS n,
        |       graft_hist_quantile(x, 0.0, 1.0, 64, 0.25, 0.5, 0.75) AS qs
        |FROM ext_agg GROUP BY g""".stripMargin)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Double](2)))).toMap
    // SQL-path results ≡ the DataFrame-path aggregates
    val viaDf = ext.range(0, 5000, 1, 8)
      .selectExpr("id % 3 AS g", "id % 517 AS v", "CAST(id % 50 AS DOUBLE) AS x")
      .groupBy("g")
      .agg(graft.plans.BitmapDistinct.distinctCount(col("v"), 1024).as("n"),
        graft.plans.Sketches.histQuantiles(col("x"), 0.0, 1.0, 64,
          Seq(0.25, 0.5, 0.75)).as("qs"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Double](2)))).toMap
    assert(viaSql == viaDf)
    assert(viaSql.keySet == Set(0L, 1L, 2L))
    // hll via SQL ≡ hll via the DataFrame path
    val hllSql = ext.sql(
      "SELECT g, graft_hll_estimate(md5(CAST(v AS STRING))) AS e FROM ext_agg GROUP BY g")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hllDf = ext.range(0, 5000, 1, 8)
      .selectExpr("id % 3 AS g", "id % 517 AS v")
      .groupBy("g").agg(graft.plans.HllSketch.estimate(md5(col("v").cast("string"))).as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hllSql == hllDf)
    // SQ8 ADC fold via SQL ≡ the DataFrame path ≡ hand math
    val cdSql = ext.sql(
      "SELECT graft_code_dot(array(0.5D, 2.0D), array(CAST(3 AS BIGINT), CAST(4 AS BIGINT))) AS d")
      .head().getAs[Double]("d")
    val cdDf = ext.range(1)
      .select(graft.plans.CodeDotProduct.dot(
        typedLit(Seq(0.5, 2.0)), typedLit(Seq(3L, 4L))).as("d"))
      .head().getAs[Double]("d")
    assert(cdSql == cdDf && cdSql == 0.5 * 3 + 2.0 * 4)
    // decimal-spelled probs (0.25 parses as DECIMAL in SQL) must work —
    // covered above; a non-literal bins argument must fail at analysis
    val e = intercept[Exception] {
      ext.sql("SELECT graft_hist_quantile(x, 0.0, 1.0, g, 0.5) FROM ext_agg GROUP BY g").collect()
    }
    assert(e.getMessage.contains("integer literal") ||
      e.getCause != null && e.getCause.getMessage.contains("integer literal"))
  }

  test("TokenFingerprint == aggregate/zip_with formulation") {
    val docs = Seq((0L, "alpha beta gamma delta"), (1L, "x")).toDF("doc_id", "text")
    val native = graft.operators.TextOps.fingerprint(docs, col("doc_id"), col("text"))
      .as[(Long, Long)].collect().toMap
    val hof = docs.select(col("doc_id"), aggregate(
      zip_with(F.tokens(col("text")), sequence(lit(1), size(F.tokens(col("text")))),
        (t, i) => (F.portableHash60(t, 7) % 1000003L) * i.cast("long")),
      lit(0L), (acc, v) => acc + v).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(native == hof)
  }

  test("ArrayJaccard matches set arithmetic") {
    val df = Seq((Seq("a b c", "b c d", "a b c"), Seq("b c d", "c d e")))
      .toDF("x", "y")
    val j = df.select(graft.plans.TextHashExprs.arrayJaccard(col("x"), col("y")))
      .as[Double].head()
    // distinct sets {abc,bcd} vs {bcd,cde}: inter 1, union 3
    assert(math.abs(j - 1.0 / 3.0) < 1e-15)
  }

  test("BitmapDistinct == count(DISTINCT) across many partitions; bound enforced") {
    import graft.plans.BitmapDistinct
    val df = spark.range(0, 10000, 1, 16) // 16 partitions → real merges
      .select((col("id") % 137).as("g"), (col("id") % 701).as("v"))
    val got = df.groupBy("g").agg(BitmapDistinct.distinctCount(col("v"), 1024).as("n"))
    val exact = df.groupBy("g").agg(countDistinct(col("v")).as("n"))
    assert(got.join(exact.withColumnRenamed("n", "m"), "g")
      .filter(col("n") =!= col("m")).count() == 0)
    // out-of-bound values must fail loudly, not corrupt the count
    intercept[Exception] {
      spark.range(1).select(lit(2048L).as("v"))
        .agg(BitmapDistinct.distinctCount(col("v"), 1024)).collect()
    }
  }

  test("FloatDotProduct == strict-left-fold HOF dot") {
    val vecs = Seq((Array(0.1f, 0.2f, 0.3f), Array(-0.5f, 0.25f, 1.5f))).toDF("a", "b")
    val native = vecs.select(graft.plans.FloatDotProduct.dot(col("a"), col("b")))
      .as[Double].head()
    val hof = vecs.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)).as[Double].head()
    assert(native == hof) // bit-identical, not approximately
  }

  test("HllSketch: partition-layout-independent, both paths accurate, merge = max") {
    import graft.plans.HllSketch
    // n = 5000 distinct (raw harmonic path) and n = 40 (linear counting)
    def est(n: Int, parts: Int): Long =
      spark.range(0, n, 1, parts)
        .agg(HllSketch.estimate(md5(col("id").cast("string")))).as[Long].head()
    val big = est(5000, 16)
    assert(big == est(5000, 1), "estimate must not depend on partitioning/merge order")
    assert(math.abs(big - 5000) < 5000 * 0.20, s"raw-path estimate $big off >20%")
    val small = est(40, 8)
    assert(small == est(40, 1))
    assert(math.abs(small - 40) < 12, s"lc-path estimate $small off") // ~m·ln accuracy
    // unit-level: estimator is the pure integer function of the registers,
    // and merging two sketches is the bytewise max of their registers
    val a = new Array[Byte](HllSketch.M); val b = new Array[Byte](HllSketch.M)
    a(3) = 7; b(3) = 4; b(9) = 2
    val merged = a.clone()
    b.indices.foreach(j => if (b(j) > merged(j)) merged(j) = b(j))
    assert(merged(3) == 7 && merged(9) == 2)
    assert(HllSketch.estimateFromRegisters(merged) ==
      HllSketch.estimateFromRegisters(merged.clone()))
  }
}
