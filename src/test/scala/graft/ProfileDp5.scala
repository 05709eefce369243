package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ranking, Sampling}

// scratch profiling harness (not a test): attribute dp5's bench cost
// stage by stage — curation semi-join, epoch mixture, packedChunks
// (scrub+chunk+pack), packStats, globalRank.
object ProfileDp5 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")

    def time[T](nm: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $nm%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // minimal cache sanity: does a persisted aggregate re-compute?
    val probe = graft.CacheScope.persist(
      spark.range(0, 200000000L).groupBy((col("id") % 1000).as("k")).count())
    time("probe agg first count") { probe.count() }
    time("probe agg second count") { probe.count() }

    val docs = graft.sources.Tables.documents(spark, d)
    val curatedIds = time("dp1Curated ids (count)") {
      val ids = graft.queries.DataCatalog.dp1Curated(spark, d).select("doc_id")
      ids.count(); ids
    }
    val curated = docs.join(curatedIds, Seq("doc_id"), "left_semi")
    val mixed = Sampling.epochs(curated.select(col("doc_id"), col("lang"), col("text")),
      col("doc_id"), col("lang"), Map("en" -> 1300L, "de" -> 2500L, "fr" -> 700L))
    val units = time("units localCheckpoint") {
      mixed.select((col("doc_id") * 4 + col("epoch")).as("doc_id"), col("text"))
        .localCheckpoint()
    }
    val chunks = time("packedChunks build (eager bounds)") {
      graft.pipeline.CorpusPrep.packedChunks(units)
    }
    time("packedChunks run (count)") { chunks.count() }
    val stats = time("packStats localCheckpoint") {
      graft.pipeline.CorpusPrep.packStats(chunks).localCheckpoint()
    }
    time("packStats (count)") { stats.count() }
    time("packStats (count AGAIN)") { stats.count() }
    val ranked = time("globalRank build (eager bounds)") {
      Ranking.globalRank(stats, col("pack_id"), col("n_tokens"))
    }
    time("rank run (count)") { ranked.count() }
    time("full ordered collect") {
      graft.queries.Catalog.ordered(ranked.select(col("id").as("pack_id"),
        col("score").as("n_tokens"), col("rank"), col("pct_permille"))).collect().length
    }
    CacheScope.releaseAll()
    spark.stop()
  }
}
