package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Clustering, Similarity}

/** Config sweep for the sim11d recall/cost frontier: runs
  * graphWalkLayered over a grid of (kUpper, hops, nProbe, nEntry,
  * beam, topCount) and prints mean recall — the measurement behind the
  * sweep card's chosen configs. Dev tool, not a spec. */
object ProfileSim11d {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.sources.Tables.embeddings(spark, sf)
    val queries = e.filter(col("vec_id") % 50 === 0)
    val truth = graft.CacheScope.persist(Similarity.topK(queries, e, 5))
    truth.count()
    val grid = Seq(
      // (kUpper, hops, nProbe, nEntry, beam, topCount, midPermille)
      (12, 3, 6, 4, 24, 256, 400),
      (12, 4, 5, 4, 20, 256, 250),
      (12, 4, 6, 4, 24, 256, 400),
      (16, 4, 6, 4, 24, 256, 400),
      (16, 5, 6, 4, 24, 256, 400))
    for ((ku, hops, np, ne, beam, tc, mp) <- grid) {
      val t0 = System.nanoTime()
      val walk = Similarity.graphWalkLayered(e,
        Similarity.mutualKnn(e, "label", 10), queries,
        Clustering.kmeans(e, 10, 3), 5,
        beam = beam, hops = hops, nProbe = np, nEntry = ne,
        midPermille = mp, topCount = tc, kUpper = ku)
      val card = Similarity.annRecall(truth, walk)
        .agg(sum("n_hits").as("h"), sum("n_truth").as("t")).collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[sim11d] kU=$ku%2d hops=$hops np=$np ne=$ne beam=$beam%2d top=$tc%3d mid=$mp%3d " +
        f"recall=${card.getLong(0).toDouble / card.getLong(1)}%.3f  ${sec}%.1f s")
      CacheScope.releaseAll()
    }
    spark.stop()
  }
}
