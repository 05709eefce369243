package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage profiler for d19 (run manually; not a test). */
object ProfileD19 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val zh = graft.sources.Tables.documents(spark, d).filter(col("lang") === "zh")
      .select(col("doc_id"), regexp_replace(col("text"),
        lit("(\\S+)"), concat(lit("$1~"), col("doc_id") % 97)).as("text"))
    val twins = zh.select((col("doc_id") + 10000).as("doc_id"),
      concat(col("text"), lit("之")).as("text"))
    val corpus = zh.unionByName(twins)
    corpus.write.format("noop").mode("overwrite").save()
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $name%-18s ${(System.nanoTime()-t0)/1e9}%7.2f s")
      CacheScope.releaseAll()
    }
    t("sigs") {
      corpus.select(col("doc_id"),
        graft.plans.TextHashExprs.minhashCharSigs(lower(col("text")), 16, 4).as("sigs"))
        .write.format("noop").mode("overwrite").save()
    }
    t("shingleArrays") {
      graft.operators.NearDup.charShingleArrays(corpus, col("doc_id"), col("text"))
        .write.format("noop").mode("overwrite").save()
    }
    t("candidates") {
      val sigs = CacheScope.persist(corpus.select(col("doc_id"),
        graft.plans.TextHashExprs.minhashCharSigs(lower(col("text")), 16, 4).as("sigs"))
        .filter(col("sigs").isNotNull))
      sigs.count()
      val c = graft.operators.NearDup.candidates(graft.operators.NearDup.bands(sigs))
      println("[prof] n_candidates " + c.count())
    }
    t("full") {
      graft.operators.NearDup.minhashLshChar(corpus, col("doc_id"), col("text"), 0.6)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
