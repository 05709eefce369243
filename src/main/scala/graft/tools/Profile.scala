package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.NearDup
import graft.sources.Tables

/** Dev utility: stage-by-stage timing of the MinHash-LSH pipeline. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r }

    val docs = Tables.documents(spark, sfDir)
    val sigs = time("minhash sigs (map)") {
      val m = NearDup.minhashSigs(docs, col("doc_id"), col("text")).persist()
      println("  docs: " + m.count()); m }
    val cand = time("bands+candidates") {
      val c = NearDup.candidates(NearDup.bands(sigs)).persist()
      println("  cand pairs: " + c.count()); c }
    time("jaccard verify") {
      println("  verified: " + NearDup.jaccardPairs(cand,
        NearDup.shingleArrays(docs, col("doc_id"), col("text")))
        .filter(col("jaccard") >= 0.5).count()) }
    spark.stop()
  }
}
