package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HTTP redirect resolution over a landed crawl — the third discovery
  * input next to page links and sitemaps: ~1 in 5 real fetches is a
  * 3xx, and a corpus that drops them silently loses every moved page.
  * Consumes the (url, status_code, location) columns
  * [[graft.sources.WarcSource.responseBodies]] lands and follows
  * Location hops to a fixed point.
  *
  * Location values absolutize like anchor hrefs (RFC 9110 permits
  * relative references): absolute http(s) kept, leading-`/` against
  * the redirecting URL's origin, anything else against its directory.
  *
  * SCALE: the redirect map (3xx rows only — a small fraction of the
  * corpus) is localCheckpoint-materialized once, and the loop is
  * PENDING-ONLY: rows that reach a non-redirect fixed point leave the
  * iteration immediately and only rows still sitting on a redirect
  * source join the next hop — after hop 1 that is the chained-redirect
  * sliver (a few percent of a real corpus), not the full response
  * state, so per-hop shuffle shrinks by the resolved fraction (the r19
  * full-state-per-hop watch-item). The loop exits as soon as nothing
  * is pending (chains in real crawls are 1-3 hops; `maxHops` caps
  * cycles). No driver-side state beyond the hop counter.
  */
object Redirects {

  /** Follows redirect chains. Input needs `urlCol` (unique per row),
    * `statusCol` (HTTP status code), `locationCol` (Location header,
    * '' when absent). Returns one row per input url:
    * (url, final_url, n_hops, resolved) — `resolved` false when the
    * chain still points at a redirect after `maxHops` (a cycle or an
    * over-long chain; final_url then holds the last hop reached). */
  def follow(responses: DataFrame, maxHops: Int = 8,
      urlCol: String = "url", statusCol: String = "status_code",
      locationCol: String = "location"): DataFrame = {
    val loc = col(locationCol)
    val origin = regexp_extract(col(urlCol), "^(https?://[^/?#]+)", 1)
    val baseDir = regexp_replace(
      regexp_replace(col(urlCol), "[?#].*$", ""), "[^/]*$", "")
    val target = when(loc.rlike("^https?://"), loc)
      .when(loc.startsWith("/"), concat(origin, loc))
      .otherwise(concat(baseDir, loc))
    val redirects = responses
      .where(col(statusCol).cast("int").between(300, 399) && loc =!= "")
      .select(col(urlCol).as("_from"), target.as("_to"))
      .localCheckpoint()
    val sources = redirects.select(col("_from").as("cur")).distinct()
      .localCheckpoint()
    // split the state on "cur sits on a redirect source": pending rows
    // iterate, settled rows leave the loop for good
    def split(state: DataFrame): (DataFrame, DataFrame) = {
      val marked = state
        .join(sources.withColumn("_p", lit(true)), Seq("cur"), "left")
        .localCheckpoint()
      (marked.where(col("_p")).drop("_p"),
        marked.where(col("_p").isNull).drop("_p"))
    }
    var (pending, settled) = split(responses
      .select(col(urlCol).as("url"), col(urlCol).as("cur"),
        lit(0L).as("n_hops")))
    var doneParts = List(settled.withColumn("resolved", lit(true)))
    var hop = 0
    while (hop < maxHops && pending.limit(1).count() > 0) {
      // inner join: by construction every pending cur IS a redirect source
      val stepped = pending
        .join(redirects, pending("cur") === redirects("_from"))
        .select(col("url"), col("_to").as("cur"),
          (col("n_hops") + 1L).as("n_hops"))
      val (p2, s2) = split(stepped)
      doneParts ::= s2.withColumn("resolved", lit(true))
      pending = p2
      hop += 1
    }
    // whatever still points at a redirect after maxHops is a cycle or an
    // over-long chain
    doneParts ::= pending.withColumn("resolved", lit(false))
    doneParts.reduce(_.union(_))
      .select(col("url"), col("cur").as("final_url"), col("n_hops"),
        col("resolved"))
  }
}
