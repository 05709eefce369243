package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway per-round profiler for g2's star contraction (run
  * manually; not a test). */
object ProfileG2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val docs = graft.sources.Tables.documents(spark, d)
    val pairs = graft.operators.NearDup
      .minhashLsh(docs, col("doc_id"), col("text"), 0.5)
    val t0 = System.nanoTime()
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
    var e = edges.select(col("src").as("u"), col("dst").as("v"))
      .filter(col("u") =!= col("v")).distinct().persist()
    println(f"[g2] edges=${e.count()} prep ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    def largeStar(x: org.apache.spark.sql.DataFrame) = {
      val sym = x.select(col("u"), col("v"))
        .unionByName(x.select(col("v").as("u"), col("u").as("v"))).distinct()
      val m = sym.groupBy("u").agg(least(min("v"), first("u")).as("m"))
      sym.join(m, Seq("u")).filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
    }
    def smallStar(x: org.apache.spark.sql.DataFrame) = {
      val ordered = x.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v")).filter(col("u") =!= col("v"))
      val m = ordered.groupBy("u").agg(least(min("v"), first("u")).as("m"))
      ordered.join(m, Seq("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(m.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v")).distinct()
    }
    var rounds = 0
    var done = false
    val c0 = System.nanoTime()
    var ec = e.localCheckpoint() // hard cut: loop input is a concrete RDD
    var eCnt = ec.count()
    println(f"[g2] checkpoint prep ${(System.nanoTime() - c0) / 1e9}%6.2f s")
    while (!done && rounds < 30) {
      val r0 = System.nanoTime()
      val next = smallStar(largeStar(ec)).localCheckpoint()
      val cnt = next.count()
      val tCnt = (System.nanoTime() - r0) / 1e9
      val x0 = System.nanoTime()
      done = cnt == eCnt && next.except(ec).isEmpty
      val tChk = (System.nanoTime() - x0) / 1e9
      ec = next
      eCnt = cnt
      rounds += 1
      println(f"[g2] round $rounds%2d n=$cnt%6d compute $tCnt%6.2f s check $tChk%6.2f s")
    }
    println(f"[g2] total ${(System.nanoTime() - t0) / 1e9}%6.2f s rounds=$rounds")
    spark.stop()
  }
}
