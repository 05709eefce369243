package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{...}}. Each query is
  * forced end-to-end (including sorts) with a noop-format write — no
  * collect, no driver materialization. */
object Bench {
  val headline: Seq[String] = Seq(
    "j1_assembly_join", "j2_selfjoin_alias", "j7_argmax_latest",
    "j12_salted_join", "a1_minpick_dedup", "a6_priority_dedup",
    "a10_stats_agg", "s8_upsert_merge", "s10_retain_gc", "eav2_assembly",
    "d1_exact_dedup", "d2_minhash_lsh", "d3_simhash_pairs", "d4_ngram_jaccard",
    "sim1_cosine_topk", "sim2_ivf_ann",
    "tx2_quality_score", "tx4_fingerprint",
    "e1_event_window_agg", "e2_sessionize", "e3_sliding_window",
    "m1_multimodal_meta")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/session init, not query work
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val qs = SparkEntry.queries
    val results = headline.filter(qs.contains).map { name =>
      val t0 = System.nanoTime()
      try qs(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qj = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qj,"sf":"$sfDir"}""")
    spark.stop()
  }
}
