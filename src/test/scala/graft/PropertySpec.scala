package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.F
import graft.operators.{Dedup, Merge}

/** Property-based invariants (SURVEY §5.2): dedup idempotence/priority,
  * upsert-then-retain key algebra, as-of monotonicity. Each property runs
  * on generated tables through the real Spark operators, with
  * deterministic seeds (no scalatestplus bridge in the offline cache).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 10 deterministic samples per generator. */
  private def forAll[A](gen: Gen[A])(body: A => Unit): Unit =
    (1 to 10).foreach { i =>
      gen.apply(Gen.Parameters.default.withSize(30), rng.Seed(i.toLong))
        .foreach(body)
    }
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(body: (A, B) => Unit): Unit =
    (1 to 10).foreach { i =>
      for {
        a <- ga.apply(Gen.Parameters.default.withSize(30), rng.Seed(i.toLong))
        b <- gb.apply(Gen.Parameters.default.withSize(30), rng.Seed(i.toLong + 100))
      } body(a, b)
    }
  private def whenever(c: Boolean)(body: => Unit): Unit = if (c) body

  private val rowsGen: Gen[List[(Int, Int, Int)]] =
    Gen.listOf(for {
      key <- Gen.choose(0, 8)
      prio <- Gen.choose(0, 2)
      id <- Gen.choose(0, 1000)
    } yield (key, prio, id))

  test("priorityMerge: idempotent, one row per key, lowest priority wins") {
    forAll(rowsGen) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("key", "prio", "id")
        val once = Dedup.priorityMerge(df, Seq(col("key")), col("prio"), Seq(col("id")))
        val twice = Dedup.priorityMerge(once, Seq(col("key")), col("prio"), Seq(col("id")))
        val got = once.as[(Int, Int, Int)].collect()
        // exactly one survivor per key
        assert(got.map(_._1).distinct.length == got.length)
        // survivor has the min (prio, id) of its group
        val best = rows.groupBy(_._1).view.mapValues(g => g.map(t => (t._2, t._3)).min).toMap
        got.foreach { case (k, p, i) => assert((p, i) == best(k)) }
        // idempotent
        assert(twice.as[(Int, Int, Int)].collect().sorted.sameElements(got.sorted))
      }
    }
  }

  test("upsert∘retain: target keys == source keys; applying twice is stable") {
    val tGen = Gen.listOf(Gen.choose(0, 20).map(k => (k, s"t$k")))
    val sGen = Gen.listOf(Gen.choose(0, 20).map(k => (k, s"s$k")))
    forAll(tGen, sGen) { (t, s) =>
      whenever(s.nonEmpty) {
        val target = t.distinctBy(_._1).toDF("id", "v")
        val source = s.distinctBy(_._1).toDF("id", "v")
        val synced = Merge.retain(Merge.upsert(target, source, Seq("id")), source, Seq("id"))
        val keys = synced.select("id").as[Int].collect().toSet
        assert(keys == s.map(_._1).toSet)
        // source rows win everywhere
        synced.as[(Int, String)].collect().foreach { case (k, v) => assert(v == s"s$k") }
        val again = Merge.retain(Merge.upsert(synced, source, Seq("id")), source, Seq("id"))
        assert(again.as[(Int, String)].collect().toSet ==
          synced.as[(Int, String)].collect().toSet)
      }
    }
  }

  test("as-of monotonicity: open-ended rows valid at d stay valid at later d'") {
    val ivGen = Gen.listOf(for {
      start <- Gen.choose(0, 365)
      openEnded <- Gen.oneOf(true, false)
      len <- Gen.choose(0, 200)
    } yield (start, if (openEnded) None else Some(start + len)))
    forAll(ivGen) { ivs =>
      whenever(ivs.nonEmpty) {
        val df = ivs.zipWithIndex.map { case ((s, e), i) =>
          (i.toLong, java.sql.Date.valueOf(java.time.LocalDate.of(2000, 1, 1).plusDays(s)),
            e.map(d => java.sql.Date.valueOf(java.time.LocalDate.of(2000, 1, 1).plusDays(d))).orNull)
        }.toDF("id", "s", "e")
        def validAt(d: String): Set[Long] =
          df.filter(F.validAsOf(col("s"), col("e"), lit(d).cast("date")))
            .select("id").as[Long].collect().toSet
        val early = validAt("2000-06-01")
        val late = validAt("2001-06-01")
        val openIds = ivs.zipWithIndex.collect { case (((_, None)), i) => i.toLong }.toSet
        // every open-ended interval valid early remains valid later
        assert((early & openIds).subsetOf(late))
      }
    }
  }

  test("sketch aggregates ≡ exact twins on sf0.001 (tx6 vs tx5, sk2 vs sk1)") {
    val sf = "/root/testdata/sf0.001"
    // count-min top-20 must equal the exact top-20 (values AND order)
    val toks = graft.sources.Tables.documents(spark, sf).select(
      explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
    val sketchTop = graft.plans.Sketches.cmTopTokens(toks, col("token"), 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val exactTop = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc).limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sketchTop == exactTop)

    // histogram quantiles must equal percentile() bit-for-bit on the
    // integer-valued fixture
    val li = graft.sources.Tables.lineitem(spark, sf)
    val hist = li.groupBy(col("l_returnflag"))
      .agg(graft.plans.Sketches.histQuantiles(col("l_quantity"),
        0.0, 1.0, 64, Seq(0.25, 0.5, 0.75)).as("qs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val exact = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, array(0.25, 0.5, 0.75))").as("qs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(hist.keySet == exact.keySet)
    hist.foreach { case (k, v) => assert(v == exact(k), s"flag $k: $v vs ${exact(k)}") }

    // mergeability: histogram partials merged in any order give the same
    // answer — repartition shuffles the merge order
    val reparted = li.repartition(13).groupBy(col("l_returnflag"))
      .agg(graft.plans.Sketches.histQuantiles(col("l_quantity"),
        0.0, 1.0, 64, Seq(0.25, 0.5, 0.75)).as("qs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(reparted == hist)
  }

  test("dedupClusters == union-find reachability on random graphs") {
    import graft.operators.NearDup
    val graphGen = for {
      n <- Gen.choose(1, 18)
      edges <- Gen.listOf(for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1)
      } yield (a.toLong, b.toLong))
    } yield (n, edges.filter(e => e._1 != e._2))
    forAll(graphGen) { case (n, edges) =>
      // driver-side reference: classic union-find with min-root convention
      val parent = Array.tabulate(n.toInt)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val expected = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
      val nodes = (0L until n).toList.toDF("doc_id")
      val pairs = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct.toDF("id_a", "id_b")
      val got = NearDup.dedupClusters(nodes, col("doc_id"), pairs)
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"n=$n edges=$edges")
    }
  }

  private val tokenRowsGen: Gen[List[(Long, Long)]] =
    Gen.listOf(for {
      id <- Gen.choose(0L, 5000L)
      toks <- Gen.choose(1L, 400L)
    } yield (id, toks)).map(_.distinctBy(_._1))

  test("packing == driver prefix sum for random sizes/budgets/buckets") {
    import graft.operators.Packing
    forAll(tokenRowsGen, Gen.choose(50L, 1000L)) { (rows, budget) =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("doc_id", "toks").repartition(5)
        Seq(1, 3, 17).foreach { buckets =>
          val got = Packing.pack(df, col("doc_id"), col("toks"), budget, buckets)
            .as[(Long, Long, Long)].collect().sortBy(_._1)
          var run = 0L
          val want = rows.sortBy(_._1).map { case (id, t) =>
            val p = run / budget; run += t; (id, t, p)
          }
          assert(got.toSeq == want, s"budget=$budget buckets=$buckets")
        }
      }
    }
  }

  test("shard manifest: counts sum to input, hashes stable under any layout") {
    import graft.operators.Sharding
    forAll(tokenRowsGen, Gen.choose(1, 16)) { (rows, shards) =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("doc_id", "v")
          .select(col("doc_id"), concat(lit("t"), col("v")).as("text"))
        val m1 = Sharding.manifest(df, col("doc_id"), col("text"), shards)
          .as[(Long, Long, Long)].collect().sortBy(_._1)
        val m2 = Sharding.manifest(df.repartition(7).sortWithinPartitions("text"),
            col("doc_id"), col("text"), shards)
          .as[(Long, Long, Long)].collect().sortBy(_._1)
        assert(m1.toSeq == m2.toSeq)
        assert(m1.map(_._2).sum == rows.length)
        assert(m1.forall { case (sid, n, h) =>
          sid >= 0 && sid < shards && n > 0 && h >= 0 && h < Sharding.HashMod })
      }
    }
  }

  private val docGen: Gen[(Long, String)] = for {
    id <- Gen.choose(0L, 100000L)
    n <- Gen.choose(0, 300)
    words <- Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "delta", "x9", "k"))
  } yield (id, words.mkString(" "))

  test("repetition metrics == driver-side token counting for random docs") {
    import graft.operators.TextOps
    forAll(Gen.listOf(docGen).map(_.distinctBy(_._1))) { docs =>
      whenever(docs.nonEmpty) {
        val got = TextOps.repetition(docs.toDF("doc_id", "text"),
            col("doc_id"), col("text"))
          .as[(Long, Long, Long, Double, Long, Double, Long, Double)]
          .collect().map(r => r._1 -> r).toMap
        docs.foreach { case (id, text) =>
          val tk = text.trim.toLowerCase.split("\\s+").toSeq
          val n = tk.length.toLong
          val topTok = tk.groupBy(identity).values.map(_.length).max.toLong
          val bigrams = tk.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
          val topBi = if (bigrams.isEmpty) 0L
            else bigrams.groupBy(identity).values.map(_.length).max.toLong
          val (gid, gn, gd, gdr, gt, gtf, gb, gbf) = got(id)
          assert((gn, gd, gt, gb) == ((n, tk.distinct.length.toLong, topTok, topBi)), s"doc $id")
          assert(gdr == tk.distinct.length.toDouble / n && gtf == topTok.toDouble / n)
          assert(gbf == (if (n > 1) topBi.toDouble / (n - 1) else 0.0))
        }
      }
    }
  }

  test("semanticDedup == brute-force within-cell pruning on random vectors") {
    import graft.operators.Similarity
    val vecGen = Gen.listOf(for {
      id <- Gen.choose(0L, 3000L)
      cell <- Gen.choose(0L, 3L)
      v <- Gen.listOfN(4, Gen.choose(-5, 5).map(_.toFloat))
    } yield (id, v.toArray, cell)).map(_.distinctBy(_._1))
      // zero vectors make cosine NaN — out of the operator's domain
      .map(_.filter(_._2.exists(_ != 0f)))
    forAll(vecGen) { vs =>
      whenever(vs.nonEmpty) {
        val df = vs.toDF("vec_id", "embedding", "cell").repartition(5)
        val got = Similarity.semanticDedup(df, "cell", 0.95)
          .select("vec_id").as[Long].collect().toSet
        def cos(a: Array[Float], b: Array[Float]): Double = {
          def d(x: Array[Float], y: Array[Float]) =
            x.zip(y).map { case (p, q) => p.toDouble * q }.sum
          d(a, b) / (math.sqrt(d(a, a)) * math.sqrt(d(b, b)))
        }
        val want = vs.filter { case (id, v, c) =>
          !vs.exists { case (id2, v2, c2) =>
            c2 == c && id2 < id && cos(v2, v) >= 0.95 }
        }.map(_._1).toSet
        assert(got == want)
      }
    }
  }

  test("chunking: full coverage, exact overlap, short-only-at-tail for random docs") {
    import graft.operators.TextOps
    forAll(Gen.listOf(docGen).map(_.distinctBy(_._1))) { docs =>
      whenever(docs.nonEmpty) {
        val df = docs.toDF("doc_id", "text")
        val got = TextOps.chunk(df, col("doc_id"), col("text"), 64, 8)
          .as[(Long, Long, Long, String)].collect()
          .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
        docs.foreach { case (id, text) =>
          val toks = text.trim.split("\\s+").toSeq
          val chunks = got.getOrElse(id, Array.empty)
          // reassembling chunks at stride 56 reproduces the token stream
          val rebuilt = chunks.zipWithIndex.flatMap { case ((_, _, _, ct), i) =>
            val t = ct.split(" ").toSeq
            if (i == 0) t else t.drop(8)
          }.toSeq
          assert(rebuilt == toks, s"doc $id")
          // every chunk except the last is exactly 64 tokens
          chunks.dropRight(1).foreach { c => assert(c._3 == 64L) }
        }
      }
    }
  }

  test("cdc chunking: chunks partition the token stream exactly for random docs") {
    import graft.operators.TextOps
    forAll(Gen.listOf(docGen).map(_.distinctBy(_._1))) { docs =>
      whenever(docs.nonEmpty) {
        val df = docs.toDF("doc_id", "text")
        val got = TextOps.cdcChunk(df, col("doc_id"), col("text"))
          .select("doc_id", "chunk_id", "n_tokens", "chunk_text")
          .as[(Long, Long, Long, String)].collect()
          .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
        docs.foreach { case (id, text) =>
          val toks = text.trim.toLowerCase.split("\\s+").toSeq
          val chunks = got.getOrElse(id, Array.empty)
          // concatenated chunks == the token stream, no gap, no overlap
          assert(chunks.flatMap(_._4.split(" ")).toSeq == toks, s"doc $id")
          // chunk ids dense from 0; sizes sum to n
          assert(chunks.map(_._2).toSeq == chunks.indices.map(_.toLong))
          assert(chunks.map(_._3).sum == toks.length.toLong)
        }
      }
    }
  }

  test("bpe: learned merges == serial reference on random corpora") {
    import graft.operators.Bpe
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
    forAll(Gen.listOf(docGen).map(_.distinctBy(_._1))) { docs =>
      whenever(docs.exists(_._2.trim.nonEmpty)) {
        val df = docs.toDF("doc_id", "text")
        val (merges, _) = Bpe.learn(Bpe.wordCounts(df, col("text")), 4)
        // serial reference over the same word counts
        val words = docs.flatMap(_._2.toLowerCase.split("\\s+")).filter(_.nonEmpty)
          .groupBy(identity).view.mapValues(_.length.toLong).toMap
        var vocab = words.map { case (w, f) => w -> (w.map(_.toString).toList, f) }
        val expect = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        var stop = false
        for (_ <- 1 to 4 if !stop) {
          val counts = scala.collection.mutable.Map.empty[(String, String), Long]
          for ((_, (syms, f)) <- vocab; Seq(a, b) <- syms.sliding(2) if syms.size >= 2)
            counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          if (counts.isEmpty) stop = true
          else {
            val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
            expect += ((l, r, c))
            vocab = vocab.map { case (w, (s, f)) => w -> (mergeOnce(s, l, r), f) }
          }
        }
        assert(merges.map(m => (m.l, m.r, m.cnt)) == expect.toSeq)
        CacheScope.releaseAll()
      }
    }
  }

  private val intervalsGen: Gen[List[(Int, Long, Long)]] =
    Gen.listOf(for {
      key <- Gen.choose(0, 4)
      s <- Gen.choose(0L, 200L)
      len <- Gen.choose(1L, 60L)
    } yield (key, s, s + len))

  test("intervalAudit ⟂ mergeIntervals: per key, gap_total == span − merged coverage") {
    import graft.operators.Temporal
    forAll(intervalsGen) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("key", "s", "e")
        val audit = Temporal.intervalAudit(df, col("key"), col("s"), col("e"))
          .as[(Int, Long, Long, Long)].collect()
          .map(r => r._1 -> (r._2, r._3, r._4)).toMap
        val islands = Temporal.mergeIntervals(df, col("key"), col("s"), col("e"))
          .as[(Int, Long, Long, Long)].collect().groupBy(_._1)
        val byKey = rows.groupBy(_._1)
        byKey.foreach { case (k, rs) =>
          val (nInt, nOv, gap) = audit(k)
          assert(nInt == rs.size)
          val span = rs.map(_._3).max - rs.map(_._2).min
          val coverage = islands(k).map(i => i._3 - i._2).sum
          assert(gap == span - coverage,
            s"key $k: gap $gap != span $span - coverage $coverage")
          assert(nOv >= 0 && nOv <= nInt - islands(k).size,
            s"key $k: overlap count $nOv out of range")
        }
        CacheScope.releaseAll()
      }
    }
  }

  private val smallDocsGen: Gen[List[(Long, String)]] =
    Gen.listOfN(8, for {
      n <- Gen.choose(3, 12)
      ws <- Gen.listOfN(n, Gen.choose(0, 5).map(i => s"w$i"))
    } yield ws.mkString(" ")).map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })

  test("containmentPairs: bounds hold — shared ≤ min side, permilles ≤ 1000, a < b") {
    import graft.operators.NearDup
    forAll(smallDocsGen) { rows =>
      whenever(rows.nonEmpty) {
        val got = NearDup.containmentPairs(rows.toDF("doc_id", "text"),
          col("doc_id"), col("text"), 0L)
          .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
        got.foreach { case (a, b, sh, na, nb, ca, cb) =>
          assert(a < b, s"pair order broken: $a, $b")
          assert(sh <= math.min(na, nb), s"shared $sh exceeds a side ($na, $nb)")
          assert(ca <= 1000 && cb <= 1000 && ca >= 0 && cb >= 0)
          assert(ca == sh * 1000 / na && cb == sh * 1000 / nb)
        }
        CacheScope.releaseAll()
      }
    }
  }

  test("cooldownSchedule: endpoints hit the start/end mixes exactly, plans bounded") {
    import graft.operators.Sampling
    val docs = (0 until 60).map(i => (i.toLong, s"l${i % 3}")).toDF("doc_id", "lang")
    val start = Map("l0" -> 900L, "l1" -> 100L, "l2" -> 0L)
    val end = Map("l0" -> 100L, "l1" -> 500L, "l2" -> 400L)
    val got = Sampling.cooldownSchedule(docs, col("lang"), start, end, 5)
      .as[(Long, String, Long, Long, Long)].collect()
    got.foreach { case (ep, st, w, n, planned) =>
      if (ep == 0) assert(w == start(st), s"epoch 0 $st: $w != ${start(st)}")
      if (ep == 4) assert(w == end(st), s"epoch 4 $st: $w != ${end(st)}")
      assert(w >= math.min(start(st), end(st)) && w <= math.max(start(st), end(st)),
        s"interpolated weight $w outside endpoints for $st")
      assert(planned == n * w / 1000 && planned <= n)
    }
    assert(got.length == 15, s"expected 5 epochs x 3 strata, got ${got.length}")
    CacheScope.releaseAll()
  }

  // ---- cross-batch LATE-DATA contracts for the stateful stream twins.
  // The stream ≡ batch pins in ScaleSpec cover in-order arrival; these
  // cases feed genuinely out-of-order micro-batches through a
  // checkpointed AvailableNow restart and assert the DOCUMENTED
  // degradation — not silence, not corruption.

  private def writeEvents(dir: String,
      rows: Seq[(Long, Long, Long, String)]): Unit =
    rows.map { case (eid, sec, uid, typ) =>
      (eid, new java.sql.Timestamp(sec * 1000L), uid, typ, 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(dir)

  /** Run one AvailableNow pass over `dir` with persistent state in
    * `ckpt`, draining the transform's output through foreachBatch into
    * the returned buffer of (batchId, row). A later call with the same
    * checkpoint resumes the state store and reads only NEW files —
    * a real cross-batch boundary, not an in-batch reorder. */
  private def drainStream(dir: String, ckpt: String)
      (xf: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : Seq[(Long, org.apache.spark.sql.Row)] = {
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(Long, org.apache.spark.sql.Row)]()
    val q = xf(graft.streaming.EventStream.streamSource(spark, dir))
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        df.collect().foreach(r => out.add((id, r))); ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    out.asScala.toSeq
  }

  test("funnelStream late data: a late predecessor never retro-qualifies an already-processed stage, and stages never un-reach") {
    import graft.streaming.EventStream
    val dir = java.nio.file.Files.createTempDirectory("late_funnel").toString
    val ckpt = java.nio.file.Files.createTempDirectory("late_funnel_ck").toString
    val stages = Seq("A", "B")
    // batch 1 — user 1: B alone (no A yet → reached 0);
    //           user 2: A@100 then B@200 (reached 2)
    writeEvents(dir, Seq((1L, 50L, 1L, "B"), (2L, 100L, 2L, "A"), (3L, 200L, 2L, "B")))
    val b1 = drainStream(dir, ckpt)(EventStream.funnelStream(_, stages))
    val r1 = b1.map { case (_, r) => r.getLong(0) -> r.getLong(1) }.toMap
    assert(r1 == Map(1L -> 0L, 2L -> 2L), s"in-order batch 1 must match batch semantics, got $r1")
    // batch 2 — user 1: the LATE stage-A event (t=10 < the processed
    // B@50). Batch recompute over all four events reaches stage 2 for
    // user 1; the stream's documented contract is weaker: the B event
    // is gone, so user 1 reaches exactly stage 1 — never 2, never 0.
    // user 2: a late B@150 lowers t(B) but must NOT lower the reached
    // stage.
    writeEvents(dir, Seq((4L, 10L, 1L, "A"), (5L, 150L, 2L, "B")))
    val b2 = drainStream(dir, ckpt)(EventStream.funnelStream(_, stages))
    val r2 = b2.map { case (_, r) => r.getLong(0) -> r.getLong(1) }.toMap
    assert(r2(1L) == 1L,
      s"late predecessor must count itself but not resurrect the lost B, got ${r2(1L)}")
    assert(r2(2L) == 2L, s"late stage event must never un-reach, got ${r2(2L)}")
    // monotonicity across batches: no user's reached stage decreased
    r2.foreach { case (u, s2) => assert(s2 >= r1(u),
      s"user $u regressed from ${r1(u)} to $s2 across batches") }
  }

  test("decayStream late data: gap clamps to zero and last-day is a running max (a late event cannot inflate the next gap)") {
    import graft.streaming.EventStream
    val dir = java.nio.file.Files.createTempDirectory("late_decay").toString
    val ckpt = java.nio.file.Files.createTempDirectory("late_decay_ck").toString
    val day = 86400L
    // batch 1 — user 7: day 0 then day 70 (10-week gap):
    // score = (10^6 >> 10) + 10^6 = 1000976, last day index 70
    writeEvents(dir, Seq((1L, 0L, 7L, "x"), (2L, 70 * day, 7L, "x")))
    val b1 = drainStream(dir, ckpt)(EventStream.decayStream(_))
    val r1 = b1.map(_._2).map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).head
    assert(r1 == ((2L, 70L, 1000976L)), s"in-order batch 1 state wrong: $r1")
    // batch 2 — a LATE day-7 event plus an in-order day-77 event in the
    // same micro-batch. Documented degradation: the late event decays
    // by 0 weeks (clamped gap) and must NOT rewind last-day, so the
    // day-77 event's gap is measured from 70 (1 week), not from 7
    // (10 weeks): score = ((1000976 + 10^6) >> 1) + 10^6 = 2000488.
    writeEvents(dir, Seq((3L, 7 * day, 7L, "x"), (4L, 77 * day, 7L, "x")))
    val b2 = drainStream(dir, ckpt)(EventStream.decayStream(_))
    val r2 = b2.map(_._2).map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).head
    assert(r2._1 == 4L, s"all four events counted, got ${r2._1}")
    assert(r2._2 == 77L,
      s"last day must be the running max (77), not the late event's day, got ${r2._2}")
    assert(r2._3 == 2000488L,
      s"late event must not inflate the next in-order gap: expected 2000488, got ${r2._3}")
  }

  // ---- extraction / URL kernels (pure, no Spark) ----------------------

  private val tokenGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(('a' to 'z') ++ ('0' to '9') ++ Seq('é', 'ü')))
      .map(_.mkString)
  private val tokensGen: Gen[List[String]] =
    Gen.choose(1, 40).flatMap(n => Gen.listOfN(n, tokenGen))

  test("extraction round trip holds for arbitrary token corpora across every entity slice") {
    import org.apache.spark.unsafe.types.UTF8String
    forAll(tokensGen, Gen.choose(0L, 99L)) { (toks, id) =>
      val text = toks.mkString(" ")
      val (b1, b2) = graft.sources.WarcSource.encodeBlocks(id, text)
      val html = s"<!DOCTYPE html><html><head><title>t</title>" +
        "<script>var d = \"</p>\";</script></head>" +
        s"<body><!-- c --><div><p> $b1 </p>\n<p>$b2</p></div></body></html>"
      val got = graft.plans.HtmlText
        .extractKernel(UTF8String.fromString(html)).toString
      val h = (toks.length + 1) / 2
      val f1 = (id % 5) match {
        case 0 => "\"" + toks.head + "\""
        case 1 => "<" + toks.head + ">"
        case 2 => toks.head + "é"
        case _ => toks.head
      }
      val expect = (f1 +: toks.slice(1, h)).mkString(" ") +
        (if (toks.length > h) "\n" + toks.slice(h, toks.length).mkString(" ") else "")
      assert(got == expect, s"id=$id toks=$toks")
    }
  }

  private val baseGen: Gen[String] = for {
    host <- Gen.oneOf("h.example.org", "x.example.net")
    segs <- Gen.choose(0, 3).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "cc", "d1")))
    q <- Gen.oneOf("", "?q=1")
  } yield s"https://$host" + segs.map("/" + _).mkString + q
  private val refGen: Gen[String] = Gen.oneOf(
    Gen.oneOf("x", "x/y", "../x", "../../x", "./x", "?p=2", "/abs/x", "//cdn.example.org/z",
      "https://other.example.com/q", "x/../y", "a/./b"),
    Gen.listOfN(2, Gen.oneOf("x", "..", ".", "yy")).map(_.mkString("/")))

  test("URL resolution: results are absolute, dot-free, and idempotent") {
    import org.apache.spark.unsafe.types.UTF8String
    def res(b: String, r: String): String = {
      val out = graft.plans.HtmlLinks.resolveKernel(
        UTF8String.fromString(b), UTF8String.fromString(r))
      if (out == null) null else out.toString
    }
    forAll(baseGen, refGen) { (base, ref) =>
      val out = res(base, ref)
      assert(out != null, s"base=$base ref=$ref must resolve")
      assert(out.matches("^[a-z][a-z0-9+.-]*://[^/?#]+.*"),
        s"resolved must be absolute: $out")
      val path = out.replaceFirst("^[a-z]+://[^/?#]*", "").takeWhile(_ != '?')
      assert(!path.contains("/../") && !path.contains("/./") &&
        !path.endsWith("/..") && !path.endsWith("/."),
        s"dot segments must be removed: base=$base ref=$ref -> $out")
      // resolving an absolute result against any base is the identity
      assert(res(base, out) == out, s"idempotence: $out")
    }
  }

  test("GIF round trip holds across arbitrary dims and both storage flags") {
    forAll(Gen.zip(Gen.choose(1, 60), Gen.choose(1, 40)),
      Gen.zip(Gen.oneOf(true, false), Gen.oneOf(true, false))) {
      case ((w, h), (il, lp)) =>
        val rnd = new java.util.Random(w * 1000L + h)
        val px = Array.fill(w * h)(rnd.nextInt(256))
        val out = graft.operators.GifCodec.decodeGray(
          graft.operators.GifCodec.encodeGray(w, h, px,
            interlaced = il, localPalette = lp))
        assert(out.exists(t => t._1 == w && t._2 == h &&
          java.util.Arrays.equals(t._3, px)), s"${w}x$h il=$il lp=$lp")
    }
  }
}
