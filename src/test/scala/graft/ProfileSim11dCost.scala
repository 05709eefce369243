package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Clustering, Similarity}

/** Per-stage cost attribution for the sim11d entry at the bench SF —
  * which of the three configs (and which phase) dominates. Dev tool. */
object ProfileSim11dCost {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cost] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val e = graft.sources.Tables.embeddings(spark, sf)
    val queries = e.filter(col("vec_id") % 50 === 0 && col("vec_id") < 500)
    val truth = graft.CacheScope.persist(Similarity.topK(queries, e, 5))
    t("truth")(truth.count())
    val base = Similarity.mutualKnn(e, "label", 10)
    t("base graph materialize")(base.count())
    val cents = t("kmeans")(Clustering.kmeans(e, 10, 3))
    // isolate: uncarded walk vs carded walk-only vs carded walk+dots
    t("a UNCARDED walk+recall") {
      Similarity.annRecall(truth, Similarity.graphWalkLayered(e, base, queries,
        cents, 5, beam = 8, hops = 3, nProbe = 2, nEntry = 4,
        midPermille = 250, topCount = 64, kUpper = 5))
        .agg(sum("n_truth"), sum("n_hits")).collect()
    }
    val (w1, d1) = Similarity.graphWalkLayeredCarded(e, base, queries,
      cents, 5, beam = 8, hops = 3, nProbe = 2, nEntry = 4,
      midPermille = 250, topCount = 64, kUpper = 5)
    t("a carded WALK only") {
      Similarity.annRecall(truth, w1).agg(sum("n_truth"), sum("n_hits")).collect()
    }
    t("a carded DOTS after walk")(d1.agg(sum("n_dots")).collect())
    spark.stop()
  }
}
