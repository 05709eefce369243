package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad hoc stage profiler for m6 (not a spec). */
object ProfileM6 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[m6prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = graft.sources.Tables.documents(spark, sf)
    time("docs count")(docs.count())
    val frames = graft.operators.Multimodal.videoFrameHashes(docs)
    time("frame hashes (count)")(frames.count())
    val frames2 = graft.CacheScope.persist(
      graft.operators.Multimodal.videoFrameHashes(docs))
    time("frame hashes (persist)")(frames2.count())
    time("pairs from cached frames")(
      graft.operators.Multimodal.videoDupPairs(frames2, 3, 3).count())
    time("full m6 (uncached)")(
      graft.operators.Multimodal.videoDupPairs(
        graft.operators.Multimodal.videoFrameHashes(docs), 3, 3).count())
    graft.CacheScope.releaseAll()
    spark.stop()
  }
}
