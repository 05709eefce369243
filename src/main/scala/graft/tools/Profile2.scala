package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{NearDup, TextOps}
import graft.sources.Tables
object Profile2 {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r }
    val docs = Tables.documents(spark, sfDir)
    time("tx4 fingerprint noop") {
      TextOps.fingerprint(docs, col("doc_id"), col("text"))
        .write.format("noop").mode("overwrite").save() }
    time("tx4 ordered noop") {
      graft.queries.Catalog.ordered(TextOps.fingerprint(docs, col("doc_id"), col("text")))
        .write.format("noop").mode("overwrite").save() }
    val sig = time("d3 simhash sigs") {
      val s = NearDup.simhash(docs, col("doc_id"), col("text")).persist()
      println("  sigs: " + s.count()); s }
    time("d3 pairs from cached sigs") {
      println("  pairs: " + NearDup.simhashPairs(sig).count()) }
    time("d3 end-to-end uncached") {
      NearDup.simhashPairs(NearDup.simhash(docs, col("doc_id"), col("text")))
        .write.format("noop").mode("overwrite").save() }
    time("tx2 quality noop") {
      TextOps.quality(docs, col("doc_id"), col("text"))
        .write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
