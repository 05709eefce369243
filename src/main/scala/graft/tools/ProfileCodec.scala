package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Multimodal

/** Dev utility (r18 opt round): stage-split timing for the codec-decode
  * bench family — how much of an m4* entry is fixture ENCODE (synthetic
  * payload muxing) vs DECODE+hash vs the banded pair join. */
object ProfileCodec {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[codec] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r }

    val docs = graft.sources.Tables.documents(spark, sfDir)
    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      val media = time("jpeg fixture encode (progressive mix)") {
        val m = Multimodal.syntheticJpegProgressiveMix(docs).persist()
        println("  payloads: " + m.count()); m }
      val hashes = time("jpeg decode + dHash") {
        val h = Multimodal.imageDHash(media).persist()
        println("  hashes: " + h.count()); h }
      time("banded pair join") {
        println("  pairs: " + Multimodal.imageDupPairs(hashes, 3).count()) }
      media.unpersist(); hashes.unpersist()
      graft.CacheScope.releaseAll()
    }
    spark.stop()
  }
}
