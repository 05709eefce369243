package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints the official record {"metric":"total",...,"queries":{medians}}
  * as the LAST stdout line (compact — the driver tails stdout with a
  * byte bound). Each query is forced end-to-end (including sorts) with a
  * noop-format write — no collect, no driver materialization.
  *
  * Repetitions: the whole headline runs SPARK_GRAFT_REPS times (default
  * 3) inside one session, and each query reports its MEDIAN — this box
  * has noisy-neighbor variance that made single-shot records misstate a
  * round by multiple seconds (r5: four of five "regressions" vanished
  * on re-run). The per-query min/max spread prints on its own
  * {"metric":"spread",...} line just above the record so a reader can
  * tell a stable number from a lucky one without bloating the record. */
object Bench {
  val headline: Seq[String] = Seq(
    "mbr1_members_by_club", "mbr3_members_all", "mh1_membership_history",
    "j1_assembly_join", "j2_selfjoin_alias", "j7_argmax_latest",
    "j12_salted_join", "a1_minpick_dedup", "a6_priority_dedup",
    "a10_stats_agg", "s8_upsert_merge", "s10_retain_gc", "eav2_assembly",
    "d1_exact_dedup", "d2_minhash_lsh", "d3_simhash_pairs", "d4_ngram_jaccard",
    "d8_incremental_dedup", "d9_paragraph_dedup", "d11_cluster_sizes",
    "sim1_cosine_topk", "sim2_ivf_ann", "sim3_multiprobe_ann",
    "sim3b_centroid_multiprobe", "sim5_ivfpq_ann", "eval1_ann_recall",
    "emb4_kmeans", "sim4_learned_ivf",
    "tx2_quality_score", "tx4_fingerprint", "tx7_normalize", "tx8_tfidf_topterms",
    "tx9_seq_packing", "qc6_pack_efficiency", "tx10_chunking", "cdc1_content_chunks",
    "tx11_pii_scrub", "tx12_repetition", "tx14_boilerplate",
    "tx13_pack_examples",
    "sem1_semantic_dedup", "bpe1_merges", "bpe3_encoded_lengths",
    "d10_cdc_chunk_dedup", "qc2_vocab_drift", "qc3_table_profile",
    "qc4_snapshot_diff", "qc5_profile_drift", "rank1_curriculum",
    "ret2_rrf_fusion", "idx2_segment_merge", "dp4_crossmodal_dedup",
    "smp5_diversity_cap", "emb6_cell_report", "c5_contamination_card",
    "out1_shard_manifest", "mix1_corpus_mixture", "mix2_epoch_mixture",
    "c1_contamination", "c6_semantic_contamination",
    "smp2_stratified_sample", "bf1_bloom_semijoin",
    "lr2_classifier_gate", "lm1_coverage_gate",
    "idx1_inverted_index", "ret1_bm25_topk",
    "dp1_curation_pipeline", "dp2_curation_twophase", "dp5_pretrain_prep",
    "e1_event_window_agg", "e2_sessionize", "e3_sliding_window", "e5_funnel",
    "e6_retention",
    "t6_asof_join", "t8_interval_merge",
    "m1_multimodal_meta")

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    // Dev-only subset filter (comma-separated query names); the driver
    // harness doesn't set it, so the official record is always the full
    // headline.
    val subset = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/session init, not query work. The
    // flagship runs once at the BENCH scale factor — the rep loop is
    // rep-major, so the first headline query would otherwise be the only
    // one charged for sf-dir footer reads, scan codegen, and broadcast
    // machinery init (the r5 mbr1-vs-mbr3 "inversion" was exactly this
    // cold-first-query artifact, reproduced by ProfileMbr).
    spark.read.parquet(s"$sfDir/region.parquet").count()
    try SparkEntry.queries(headline.head)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"[bench] warmup: $e") }
    finally CacheScope.releaseAll()
    val qs = SparkEntry.queries
    val names = headline.filter(qs.contains)
      .filter(n => subset.forall(_.contains(n)))
    val errors = scala.collection.mutable.LinkedHashSet.empty[String]
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
    for (rep <- 1 to reps; name <- names if !errors.contains(name)) {
      val t0 = System.nanoTime()
      // elapsed is captured INSIDE the try, before the finally's cache
      // release — unpersist bookkeeping is session hygiene, not query
      // work, and must not be charged to the measurement.
      val elapsed =
        try {
          qs(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name (rep $rep): $e"); errors += name; None }
        finally CacheScope.releaseAll() // operator-internal persists end with the query
      elapsed.foreach(t => samples(name) = samples.getOrElse(name, Vector.empty) :+ t)
    }
    // A failed query must not read as "fast": it reports -1 in every
    // field so the gate can tell a crash from a quick pass — including
    // a query that succeeded in an earlier rep and failed later (its
    // partial samples would otherwise masquerade as a clean median).
    def fmt(f: Vector[Double] => Double) = names.map { n =>
      val v = samples.get(n).filter(_.nonEmpty)
        .filterNot(_ => errors.contains(n)).map(f).getOrElse(-1.0)
      f""""$n":$v%.3f"""
    }.mkString("{", ",", "}")
    val qj = fmt(median)
    val loJ = fmt(_.min)
    val hiJ = fmt(_.max)
    // A crash must never IMPROVE the headline: each failed query charges
    // a full timeout's worth of seconds into the total (the -1 marker in
    // `queries` still tells the reader which ones crashed).
    val failPenaltySec = 600.0
    val total = names.filterNot(errors.contains)
      .flatMap(samples.get).filter(_.nonEmpty).map(median).sum +
      errors.size * failPenaltySec
    val ej = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Stop Spark BEFORE printing the record so no stray log line can land
    // after it, then emit the official record as the LAST stdout line and
    // keep it SMALL (medians + errors only). The per-query min/max spread
    // goes on its own earlier line: the driver captures a bounded tail of
    // stdout, and rounds 5–6 lost the medians block because one huge line
    // (medians+lo+hi) was cut from the front by that tail capture.
    spark.stop()
    println(f"""{"metric":"spread","lo":$loJ,"hi":$hiJ}""")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qj,"reps":$reps,"errors":$ej,"sf":"$sfDir"}""")
    System.out.flush()
    if (errors.nonEmpty) {
      System.err.println(s"[bench] ${errors.size} queries FAILED: ${errors.mkString(", ")}")
      sys.exit(1)
    }
  }
}
