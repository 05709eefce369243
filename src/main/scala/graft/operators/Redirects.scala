package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Redirect-chain resolution (url12) — the step between fetching and
  * every URL-keyed stage: a crawl's 3xx captures name their targets in
  * the Location header (RFC 9110 §10.2.2), and canonical-URL dedup,
  * frontier accounting, and authority graphs all need each captured URL
  * mapped to the page it ACTUALLY lands on. (Reference scope: the
  * reference engine has no crawl layer — this is part of the
  * beyond-reference web chain next to warc4's revisit resolution.)
  *
  * Semantics: starting from every captured URL, follow Location edges
  * (resolved absolute per RFC 3986 — relative Locations are legal and
  * common) for at most `maxHops` hops. A terminal URL classifies as
  *   - `ok`        — the chain ends at a captured non-redirect page;
  *   - `dangling`  — the chain leaves the capture set (the target was
  *                   never fetched; `final_url` reports it so a
  *                   scheduler can frontier it);
  *   - `loop`      — after `maxHops` hops the cursor still redirects
  *                   (a cycle or an over-long chain; `final_url` and
  *                   `hops` are NULL — there is no landing page to
  *                   report, and browsers bound exactly this way).
  *
  * Scale shape: the edge frame is the 3xx slice of the crawl (a few
  * percent of captures) aggregated once (a URL captured twice with
  * diverging targets takes the MIN target — deterministic, never a
  * row explosion); resolution is `maxHops` LEFT equi-joins of the
  * full-capture state frame against it — terminal rows stop matching
  * and ride through unchanged, so no per-row done flag and no
  * iterate-to-fixpoint driver loop. Classification is two more
  * equi-joins against model frames derived from the same scan. Every
  * join is key-partitioned; nothing collects. */
object Redirects {
  private val RedirectStatuses: Seq[Long] = Seq(301L, 302L, 303L, 307L, 308L)

  /** Resolve every captured URL's redirect chain over a
    * [[graft.sources.WarcSource.readResponses]]-shaped frame (needs
    * `target_uri`, `http_status`, `location`). Output: (url, final_url,
    * hops, outcome) — see the object scaladoc for the contract. */
  def resolveChains(responses: DataFrame, maxHops: Int = 4): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val recs = responses.select(col("target_uri").as("url"),
      col("http_status"), col("location"))
    val edges = recs
      .filter(col("http_status").isin(RedirectStatuses: _*) &&
        col("location").isNotNull)
      .select(col("url").as("src"),
        graft.plans.HtmlTextExpr.resolveUrl(col("url"), col("location")).as("dst"))
      .filter(col("dst").isNotNull)
      .groupBy("src").agg(min("dst").as("dst"))
    var state = recs.select(col("url")).distinct()
      .select(col("url"), col("url").as("cur"), lit(0L).as("hops"))
    for (_ <- 1 to maxHops) {
      state = state.join(edges, state("cur") === edges("src"), "left")
        .select(col("url"),
          coalesce(col("dst"), col("cur")).as("cur"),
          (col("hops") + when(col("dst").isNotNull, 1L).otherwise(0L)).as("hops"))
    }
    val redirecting = edges.select(col("src").as("loop_src"))
    val captured = recs.select(col("url").as("t_url")).distinct()
    state
      .join(redirecting, col("cur") === col("loop_src"), "left")
      .join(captured, col("cur") === col("t_url"), "left")
      .select(col("url"),
        when(col("loop_src").isNotNull, lit(null)).otherwise(col("cur"))
          .as("final_url"),
        when(col("loop_src").isNotNull, lit(null)).otherwise(col("hops"))
          .cast("long").as("hops"),
        when(col("loop_src").isNotNull, "loop")
          .when(col("t_url").isNull, "dangling")
          .otherwise("ok").as("outcome"))
  }
}
