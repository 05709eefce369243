package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import graft.operators.{NearDup, Sampling, TextOps}

// scratch profiling harness (not a test): times each dp1 stage as its
// own action, with per-job wall-clock from a listener, to attribute
// where the fused flagship spends its seconds
object ProfileDp1 {
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

    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobTimes = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobStarts.put(js.jobId, js.time)
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = jobStarts.get(je.jobId)
        jobTimes.add((je.jobId, je.time - s))
      }
    })

    def time(nm: String)(f: => Long): Unit = {
      jobTimes.clear()
      val t0 = System.nanoTime()
      val n = f
      Thread.sleep(300) // let the listener bus drain (private API in 4.x)
      val jobs = {
        val it = jobTimes.iterator(); val b = Seq.newBuilder[(Int, Long)]
        while (it.hasNext) b += it.next(); b.result().sortBy(_._1)
      }
      println(f"PROFILE $nm%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n  " +
        s"jobs=${jobs.map { case (id, ms) => s"$id:${ms}ms" }.mkString(",")}")
    }

    // warmup
    spark.read.parquet(s"$d/documents.parquet").count()
    graft.queries.DataCatalog.dp1.build(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    CacheScope.releaseAll()

    // --- staged run (mirrors dp1's structure) ---
    val docs = graft.sources.Tables.documents(spark, d)
    time("0 full fused dp1") {
      graft.queries.DataCatalog.dp1.build(spark, d)
        .write.format("noop").mode("overwrite").save(); 0L
    }
    CacheScope.releaseAll()

    val exactSurv = CacheScope.persist(docs.join(
      NearDup.exact(docs, col("doc_id"), col("text")).select("doc_id"),
      Seq("doc_id"), "left_semi"))
    time("1 exact dedup+persist")(exactSurv.count())
    val pairs = NearDup.minhashLsh(exactSurv, col("doc_id"), col("text"), 0.5)
    val pairsP = CacheScope.persist(pairs)
    time("2 lsh pairs")(pairsP.count())
    var reps: org.apache.spark.sql.DataFrame = null
    time("3 cc loop") {
      reps = NearDup.dedupClusters(exactSurv, col("doc_id"), pairsP)
        .filter(col("doc_id") === col("cluster_id")).select("doc_id")
      reps.count()
    }
    val surviving = exactSurv.join(reps, Seq("doc_id"), "left_semi")
    val q = TextOps.quality(surviving, col("doc_id"), col("text"))
      .select(col("doc_id"), col("n_words"), col("quality_score"))
    val filtered = surviving.join(q, Seq("doc_id"))
      .filter(col("lang").isin("en", "de", "fr") &&
        col("quality_score") >= 0.6 && col("n_words") >= 20)
    time("4 gate+sample") {
      graft.queries.Catalog.ordered(Sampling.bernoulli(filtered, col("doc_id"), 800)
        .select(col("doc_id"), col("lang"), col("n_words"), col("quality_score")))
        .write.format("noop").mode("overwrite").save(); 0L
    }
    CacheScope.releaseAll()
    spark.stop()
  }
}
