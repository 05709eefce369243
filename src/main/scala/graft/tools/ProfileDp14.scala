package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility (r18 opt round): stage-split timing for dp14, the
  * crawl-scheduler flagship — which of fixture write / link extraction
  * / robots gate / bloom anti-join / pagerank / per-host cut owns the
  * entry's wall time. */
object ProfileDp14 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dp14] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r }

    val s = spark
    val d = sfDir
    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      val dir = "/tmp/graft_prof_warc_html_" + new java.io.File(d).getName
      val docs = graft.sources.Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("text"),
          concat(lit("https://example"), col("doc_id") % 7,
            lit(".org/doc/"), col("doc_id")).as("uri"))
      time("fixture write (ensure; rep1 pays)") {
        graft.sources.WarcSource.ensureHtmlResponses(docs, dir,
          s.sparkContext.defaultParallelism) }
      val links = graft.sources.WarcSource.readResponses(s, dir + "/warc-*.warc")
        .filter(col("warc_type") === "response")
        .select(col("target_uri"),
          explode(graft.plans.HtmlTextExpr.htmlHrefs(col("payload"))).as("href"))
        .select(graft.plans.HtmlTextExpr.resolveUrl(col("target_uri"), col("href"))
          .as("url"))
      time("links extraction (count)") { println("  links: " + links.count()) }
      val siteXml = docs
        .select((col("doc_id") % 7).as("k"),
          format_string("<url><loc>https://example%d.org/site/%d</loc></url>",
            col("doc_id") % 7, col("doc_id") % 23).as("entry"))
        .groupBy("k").agg(concat(lit("<urlset>"),
          array_join(array_sort(collect_list(col("entry"))), ""),
          lit("</urlset>")).as("xml"))
      val discovered = graft.operators.TextOps.sitemapEntries(siteXml, col("k"), col("xml"))
        .select(col("loc").as("url"))
      val cand = links.unionByName(discovered).distinct()
      time("candidates distinct (count)") { println("  cand: " + cand.count()) }
      val crawled = docs.select(col("uri").as("curl"))
      val frontier = graft.plans.BloomJoin.antiJoin(cand, col("url"), crawled, col("curl"))
      time("bloom anti-join (count)") { println("  frontier: " + frontier.count()) }
      graft.CacheScope.releaseAll()
    }
    spark.stop()
  }
}
